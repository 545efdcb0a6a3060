"""Coordinate manager: neighbor-table construction for sparse U-Nets.

TPU-native replacement for MinkowskiEngine's C++ coordinate manager /
kernel-map machinery (reference call path ``model/resunet.py:207-280``,
``model/residual_block.py:57-73``). All tables are built on device with
static shapes, once per batch, and consumed by every conv in the forward
pass.

Table semantics: ``table[k, i]`` is the row index (into the *input* level's
feature array) of the neighbor of output voxel ``i`` under kernel offset
``k``, or ``input_capacity`` when the neighbor voxel is unoccupied — the
consumer gathers from a zero-padded feature array so misses contribute
nothing, exactly like sparse convolution.

Conventions (ME 0.5 parity):
* coordinates are kept in units of the stride-1 voxel grid; a level at
  stride ``t`` holds coordinates that are multiples of ``t``;
* kernel-3 offsets are dilated by the *input* tensor stride for forward
  convs and by the *output* tensor stride for transpose convs;
* offset enumeration is dim-0 fastest over (-1, 0, 1) per dimension;
* a stride-2 conv's output coordinate set is ``unique(floor(c/2t) * 2t)``;
* a stride-2 transpose conv's output coordinate set is the encoder level's
  coordinate set (skip-concat alignment, ``model/resunet.py:239-253``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from corsair_tpu.core.sparse import (
    SENTINEL,
    SparseGrid,
    lookup_sorted,
    unique_compact,
)

import os as _os

# Read once at import (trace-time constant; flipping mid-process would
# silently keep already-traced programs on the old variant).
_UP_JOIN_ENV = _os.environ.get("CORSAIR_UP_JOIN", "1") == "1"


def kernel_offsets(kernel_size: int = 3, ndim: int = 3) -> np.ndarray:
    """Integer kernel offsets, dim-0 fastest. ``[K, ndim]`` with K=k^ndim.

    Odd kernels are centered (offsets -k//2..k//2); even kernels span
    [0, k) from the output coordinate (ME pooling convention).
    """
    if kernel_size % 2 == 1:
        half = kernel_size // 2
        rng = np.arange(-half, half + 1, dtype=np.int32)
    else:
        rng = np.arange(0, kernel_size, dtype=np.int32)
    grids = np.meshgrid(*([rng] * ndim), indexing="ij")
    # dim-0 fastest: stack then reshape in Fortran order over dim 0.
    offs = np.stack([g.reshape(-1, order="F") for g in grids], axis=1)
    return offs.astype(np.int32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LevelMaps:
    """Coordinate set + neighbor tables for one U-Net level."""

    coords: jax.Array  # int32 [N_l, 3]
    batch: jax.Array   # int32 [N_l]
    valid: jax.Array   # bool  [N_l]
    self_table: jax.Array            # int32 [K, N_l] into this level
    down_table: Optional[jax.Array]  # int32 [K, N_l] into level l-1 (None at l=0)
    up_table: Optional[jax.Array]    # int32 [K, N_prev] into this level... see builder
    stride: int = dataclasses.field(default=1, metadata=dict(static=True))

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class UNetMaps:
    levels: Tuple[LevelMaps, ...]
    # [num_levels] bool: level capacity overflowed during dedup (voxels
    # dropped). Pipelines must check and fail loudly; see
    # ``pipeline.FeatureExtractor.extract_batch_np``.
    overflow: Optional[jax.Array] = None


def _keys(coords, batch, valid):
    b = jnp.where(valid, batch, SENTINEL)
    x = jnp.where(valid, coords[:, 0], SENTINEL)
    y = jnp.where(valid, coords[:, 1], SENTINEL)
    z = jnp.where(valid, coords[:, 2], SENTINEL)
    return (b, x, y, z)


def _offset_queries(coords, batch, valid, offsets, dilation: int):
    """Query keys for all kernel offsets: ``[K*N]`` key tuple."""
    k = offsets.shape[0]
    n = coords.shape[0]
    q = coords[None, :, :] + (offsets[:, None, :] * dilation)  # [K, N, 3]
    qb = jnp.broadcast_to(batch[None, :], (k, n))
    qv = jnp.broadcast_to(valid[None, :], (k, n))
    b = jnp.where(qv, qb, SENTINEL).reshape(-1)
    x = jnp.where(qv, q[:, :, 0], SENTINEL).reshape(-1)
    y = jnp.where(qv, q[:, :, 1], SENTINEL).reshape(-1)
    z = jnp.where(qv, q[:, :, 2], SENTINEL).reshape(-1)
    return (b, x, y, z)


def neighbor_table(
    table_coords, table_batch, table_valid,
    query_coords, query_batch, query_valid,
    offsets: np.ndarray, dilation: int,
) -> jax.Array:
    """``[K, M]`` table: neighbor row in the table level for each query voxel."""
    k = offsets.shape[0]
    m = query_coords.shape[0]
    tkeys = _keys(table_coords, table_batch, table_valid)
    qkeys = _offset_queries(
        query_coords, query_batch, query_valid, jnp.asarray(offsets), dilation
    )
    idx = lookup_sorted(tkeys, qkeys, table_coords.shape[0])
    return idx.reshape(k, m)


def adjoint_up_table(down_table: jax.Array, fine_capacity: int,
                     coarse_capacity: int) -> jax.Array:
    """Transpose-conv table from the forward table — no join needed.

    ``down_table[k, j]`` = fine row of the voxel at ``C_j + o_k * t``;
    the up table wants ``up[k, i]`` = coarse row of the voxel at
    ``F_i - o_k * t`` (same kernel index, adjoint pairing — see
    ``_build_generic``). These relations are inverse bijections per
    offset: ``up[k, down[k, j]] = j``. One scatter of ``[K, N_coarse]``
    entries replaces the round-1 sort-join over ``27 * N_fine`` query
    keys — the largest join of every level (VERDICT r1 item 3).

    Miss entries of ``down_table`` (value ``fine_capacity``) are routed
    to per-column dump slots so scatter indices stay unique.
    """
    k, n_coarse = down_table.shape
    j_idx = jnp.broadcast_to(
        jnp.arange(n_coarse, dtype=jnp.int32)[None, :], (k, n_coarse)
    )
    # hits -> their fine row; misses -> unique dump slot fine_cap + j
    target = jnp.where(
        down_table < fine_capacity, down_table, fine_capacity + j_idx
    )
    k_idx = jnp.broadcast_to(
        jnp.arange(k, dtype=jnp.int32)[:, None], (k, n_coarse)
    )
    up = jnp.full((k, fine_capacity + n_coarse), coarse_capacity,
                  jnp.int32)
    up = up.at[k_idx, target].set(j_idx, mode="drop",
                                  unique_indices=True)
    return up[:, :fine_capacity]


def downsample_coords(coords, batch, valid, stride: int, out_capacity: int,
                      factor: int = 2, compact: bool = False,
                      with_overflow: bool = False):
    """Coarsen a coordinate set by ``factor``:
    ``unique(floor(c / (factor*t)) * factor*t)``.

    Returns (coords, batch, valid) with ``out_capacity`` rows; the output
    rows are in packed-key order (the dedup's sort order). With
    ``with_overflow`` a fourth scalar bool reports whether the unique set
    exceeded ``out_capacity`` (voxels silently dropped) — consumers must
    surface it (SURVEY §7.3: an undersized level capacity has zero signal
    otherwise).
    """
    t2 = stride * factor
    coarse = jnp.where(
        valid[:, None], (jnp.floor_divide(coords, t2)) * t2, SENTINEL
    )
    keys = _keys(coarse, batch, valid)
    perm, kept = unique_compact(keys, coords.shape[0], compact=compact)
    out_coords = jnp.where(kept[:, None], coarse[perm], SENTINEL)[:out_capacity]
    out_batch = jnp.where(kept, batch[perm], SENTINEL)[:out_capacity]
    out_valid = kept[:out_capacity]
    if with_overflow:
        overflow = jnp.sum(kept) > out_capacity
        return out_coords, out_batch, out_valid, overflow
    return out_coords, out_batch, out_valid


def strided_conv_map(coords, batch, valid, stride_in: int, stride: int,
                     kernel_size: int, out_capacity: int):
    """Generic strided conv: output coordinate set + neighbor table.

    Returns ((out_coords, out_batch, out_valid, stride_out), table) where
    ``table`` is [K, out_capacity] into the input rows. ``stride == 1``
    reuses the input coordinate set.
    """
    offs = kernel_offsets(kernel_size)
    if stride == 1:
        table = neighbor_table(coords, batch, valid, coords, batch, valid,
                               offs, stride_in)
        return (coords, batch, valid, stride_in), table
    oc, ob, ov = downsample_coords(
        coords, batch, valid, stride_in, out_capacity, factor=stride
    )
    table = neighbor_table(coords, batch, valid, oc, ob, ov, offs,
                           stride_in)
    return (oc, ob, ov, stride_in * stride), table


def flatten_unet_maps(maps: UNetMaps, num_clouds: int) -> UNetMaps:
    """Collate per-cloud vmapped maps into one flat multi-batch UNetMaps.

    ``maps`` comes from ``jax.vmap(manager.build)`` over B single-cloud
    grids: every leaf carries a leading [B] axis. The flat layout places
    cloud b's level-l rows at ``b*N_l + i`` and remaps every table as
    ``flat[k, b*M + i] = b*N_in + t`` (miss ``t == N_in`` -> the single
    global zero row ``B*N_in`` that ``sparse_conv`` appends).

    Why: running the network forward UNDER vmap batches every conv
    gather into a [B, ...] gather HLO that executes ~4x slower on TPU
    than the same work as one flat gather (measured 59 vs 16 ms
    on-device for a level-0-shaped conv at cap 16384). Building maps
    stays vmapped (per-cloud sorts are cheaper); only the forward runs
    flat. The flat layout is exactly the collated multi-batch layout the
    forward already supports (``extract_batch_np``).
    """
    b = num_clouds

    def flat_table(t, n_in):
        if t is None:
            return None
        offs = (jnp.arange(b, dtype=t.dtype) * n_in)[:, None, None]
        flat = jnp.where(t < n_in, t + offs, b * n_in)
        return jnp.moveaxis(flat, 0, 1).reshape(t.shape[1], -1)

    levels = []
    for lvl, L in enumerate(maps.levels):
        n_l = L.coords.shape[1]
        n_prev = maps.levels[lvl - 1].coords.shape[1] if lvl else None
        batch_ids = jnp.where(
            L.valid, jnp.arange(b, dtype=jnp.int32)[:, None], b
        )
        levels.append(LevelMaps(
            coords=L.coords.reshape(b * n_l, 3),
            batch=batch_ids.reshape(-1),
            valid=L.valid.reshape(-1),
            self_table=flat_table(L.self_table, n_l),
            down_table=flat_table(L.down_table, n_prev),
            up_table=flat_table(L.up_table, n_l),
            stride=L.stride,
        ))
    overflow = None
    if maps.overflow is not None:
        overflow = jnp.any(maps.overflow, axis=0)
    return UNetMaps(levels=tuple(levels), overflow=overflow)


def build_unet_maps_host(coords: np.ndarray, batch: np.ndarray,
                         capacity: int, num_levels: int = 4,
                         level_cap_ratios=(1.0, 1.0, 1.0, 1.0),
                         kernel_size: int = 3,
                         n_threads: int = 8) -> "UNetMaps":
    """C++ host-side twin of ``CoordinateManager.build``.

    ``coords``/``batch``: the *valid* rows only (host arrays). Produces a
    ``UNetMaps`` with exactly the same shapes/semantics as the device
    builder (padding rows sentinel-filled, miss value == level capacity),
    so one compiled forward accepts maps from either path. Uses hash maps
    + threads instead of device sorts — the fast path for the host-driven
    eval pipeline.
    """
    import jax.numpy as jnp

    from corsair_tpu import runtime

    offs = kernel_offsets(kernel_size)
    caps = [max(8, int(capacity * r)) for r in level_cap_ratios][:num_levels]
    caps[0] = capacity

    def pad_coords(c, b, cap):
        if len(c) > cap:
            raise ValueError(
                f"level capacity overflow: {len(c)} voxels > cap {cap} "
                "(raise level_cap_ratios)"
            )
        out_c = np.full((cap, 3), SENTINEL, np.int32)
        out_b = np.full((cap,), 2**15 - 1, np.int32)
        n = len(c)
        out_c[:n] = c[:n]
        out_b[:n] = b[:n]
        valid = np.zeros(cap, bool)
        valid[:n] = True
        return out_c, out_b, valid

    per_level = [(np.asarray(coords, np.int32),
                  np.asarray(batch, np.int32), 1)]
    stride = 1
    for lvl in range(1, num_levels):
        pc, pb, _ = per_level[-1]
        oc, ob = runtime.downsample(pc, pb, stride * 2, caps[lvl])
        if len(oc) == caps[lvl]:
            # full-to-capacity is ambiguous with silent truncation in the
            # native dedup: recount exactly and fail loudly on overflow
            coarse = (pc // (stride * 2)) * (stride * 2)
            n_unique = len(np.unique(
                np.concatenate([pb[:, None], coarse], axis=1), axis=0
            ))
            if n_unique > caps[lvl]:
                raise ValueError(
                    f"level {lvl} capacity overflow: {n_unique} unique "
                    f"voxels > cap {caps[lvl]} (raise level_cap_ratios)"
                )
        stride *= 2
        per_level.append((oc, ob, stride))

    levels = []
    for lvl, (c, b, t) in enumerate(per_level):
        cap = caps[lvl]
        pc_pad, pb_pad, valid = pad_coords(c, b, cap)

        def table(tc, tb, t_cap, qc, qb, q_cap, offsets, dilation):
            raw = runtime.neighbor_table(
                tc, tb, qc, qb, offsets, dilation, t_cap,
                n_threads=n_threads,
            )  # [K, len(qc)]
            out = np.full((offsets.shape[0], q_cap), t_cap, np.int32)
            out[:, : raw.shape[1]] = raw
            return out

        self_table = table(c, b, cap, c, b, cap, offs, t)
        if lvl > 0:
            prev_c, prev_b, prev_t = per_level[lvl - 1]
            prev_cap = caps[lvl - 1]
            down = table(prev_c, prev_b, prev_cap, c, b, cap, offs, prev_t)
            up = table(c, b, cap, prev_c, prev_b, prev_cap, -offs, prev_t)
        else:
            down = None
            up = None
        levels.append(LevelMaps(
            coords=jnp.asarray(pc_pad),
            batch=jnp.asarray(pb_pad),
            valid=jnp.asarray(valid),
            self_table=jnp.asarray(self_table),
            down_table=None if down is None else jnp.asarray(down),
            up_table=None if up is None else jnp.asarray(up),
            stride=t,
        ))
    # host path raises on overflow above — flags are always clean here
    return UNetMaps(levels=tuple(levels),
                    overflow=jnp.zeros((num_levels,), bool))


def level_occupancy(maps: "UNetMaps"):
    """Valid-voxel count per level — host diagnostic for tuning
    ``level_cap_ratios``. A level whose count equals its capacity may have
    silently dropped voxels (capacity overflow)."""
    return [int(jnp.sum(lv.valid)) for lv in maps.levels]


class CoordinateManager:
    """Builds all level coordinate sets and neighbor tables for a U-Net.

    ``level_cap_ratios`` fixes the static capacity of each level relative
    to the input capacity. The safe default keeps full capacity at every
    level (a 2x-coarser level of a sparse cloud can retain nearly all
    voxels); dense inputs can shrink the ratios for speed after checking
    ``level_occupancy``.
    """

    def __init__(
        self,
        num_levels: int = 4,
        kernel_size: int = 3,
        level_cap_ratios: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
        compact_keys: bool = True,
        fast_merge: Optional[bool] = None,
        pallas_join: Optional[bool] = None,
        up_join: Optional[bool] = None,
    ):
        self.num_levels = num_levels
        self.kernel_size = kernel_size
        self.level_cap_ratios = tuple(level_cap_ratios)
        self.offsets = kernel_offsets(kernel_size)
        # Compact path: one packed uint32 key per voxel -> the sort-merge
        # join sorts 2 operands instead of 3 (searchsorted was tried and
        # is far slower on TPU — random-access binary search). Requires
        # num_batches <= 32 and coords within [-256, 255]; larger batches
        # fall back to the (hi, lo) path automatically.
        self.compact_keys = compact_keys
        # Merge path: each level's packed keys are sorted ONCE, and every
        # neighbor lookup becomes a bitonic MERGE of two pre-sorted
        # sequences (log n passes instead of a log^2 n bitonic sort per
        # table). Bit-identical to the generic path (test_merge_join.py).
        # On accelerators the merge runs as a Pallas kernel entirely in
        # VMEM (kernels/merge_join.py) — measured 2.2x faster than the
        # sort-join at bench shapes — so ``None`` resolves to True there.
        # The pure-jnp merge lowers poorly on CPU/XLA (reshape relayouts
        # per stage), so CPU resolves to False.
        # Requires the compact-key regime plus the interior guard band
        # |coord| <= COMPACT_SAFE_COORD (enforced loudly by the host
        # collate/pad helpers).
        self.fast_merge = fast_merge
        # Pallas merge-join kernel selection inside the merge path:
        # None = auto (accelerator backends only), True = force — on the
        # CPU backend the kernel then runs in Pallas INTERPRET mode, so
        # a virtual-mesh dryrun certifies the sharded program containing
        # the DEPLOYED kernel, not the jnp fallback (VERDICT r3 #4).
        self.pallas_join = pallas_join
        # Up-table construction inside the merge path. The XLA scatter of
        # ``adjoint_up_table`` was the r5 extraction profile's single
        # largest op (17.3 of 113.6 ms/step at [16 x 16384]; the three
        # level transitions total 25.7 ms — logs/extraction_roofline.
        # json). Because ``down_table[k, :]`` is the inverse of a
        # key-order-preserving shift, the up table is ITSELF a merge-
        # join: table = coarse keys, queries = fine keys - o_k*t — the
        # same Pallas merge kernel every other table uses, with
        # identical hit/miss semantics (miss = coarse capacity). None
        # resolves with the merge-join backend choice; False keeps the
        # scatter (CORSAIR_UP_JOIN=0 opts back).
        self.up_join = (_UP_JOIN_ENV if up_join is None else up_join)

    def build(self, grid: SparseGrid) -> UNetMaps:
        from corsair_tpu.core.sparse import COMPACT_MAX_BATCH

        use_compact = (
            self.compact_keys and grid.num_batches <= COMPACT_MAX_BATCH
        )
        fast_merge = self.fast_merge
        if fast_merge is None:
            try:
                fast_merge = jax.default_backend() != "cpu"
            except RuntimeError:
                fast_merge = False
            # forcing the Pallas join implies the merge path that hosts
            # it (dryrun-on-CPU certification of the deployed path)
            fast_merge = fast_merge or bool(self.pallas_join)
        if use_compact and fast_merge:
            # CORSAIR_EQ_JOIN=1 selects the sort-free brute-force
            # equality-join builder (kernels/eq_join.py). Measured A/B
            # on v5e (16 clouds x 8k voxels, 4 levels at equal caps):
            # merge 360 ms vs eq 473 ms build, extraction 986 vs
            # 1084 ms — the O(M*N) dense compare loses to sort+merge at
            # level-0 scale because level capacities do not shrink, so
            # the merge-join stays the default.
            import os

            if os.environ.get("CORSAIR_EQ_JOIN", "0") == "1":
                return self._build_eq(grid)
            return self._build_merge(grid)
        return self._build_generic(grid, use_compact)

    def _build_eq(self, grid: SparseGrid) -> UNetMaps:
        """Equality-join builder: every table is a dense compare-reduce
        against the (unsorted) level keys. Requires the compact-key
        regime + guard band (same contract as the merge path)."""
        from corsair_tpu.core.kernels.eq_join import equality_join_pallas
        from corsair_tpu.core.sparse import (
            pack_key_compact,
            pack_offset_deltas,
            shifted_query_keys,
        )

        caps = self._level_caps(grid.capacity)
        offs = self.offsets

        coords, batch, valid = grid.coords, grid.batch, grid.valid
        stride = grid.stride
        per_level = [dict(coords=coords, batch=batch, valid=valid,
                          stride=stride,
                          pk=pack_key_compact(_keys(coords, batch,
                                                    valid)))]
        overflows = [jnp.asarray(False)]
        for lvl in range(1, self.num_levels):
            coords, batch, valid, ovf = downsample_coords(
                coords, batch, valid, stride, caps[lvl], compact=True,
                with_overflow=True,
            )
            stride *= 2
            per_level.append(dict(
                coords=coords, batch=batch, valid=valid, stride=stride,
                pk=pack_key_compact(_keys(coords, batch, valid)),
            ))
            overflows.append(ovf)

        def join(table_lvl, query_lvl, offsets, dilation):
            tbl = per_level[table_lvl]
            qry = per_level[query_lvl]
            qk = shifted_query_keys(
                qry["pk"], pack_offset_deltas(offsets, dilation)
            )
            return equality_join_pallas(
                tbl["pk"], qk, tbl["pk"].shape[0]
            )

        levels = []
        for lvl, entry in enumerate(per_level):
            t = entry["stride"]
            self_table = join(lvl, lvl, offs, t)
            if lvl > 0:
                pt = per_level[lvl - 1]["stride"]
                down_table = join(lvl - 1, lvl, offs, pt)
                up_table = join(lvl, lvl - 1, -offs, pt)
            else:
                down_table = None
                up_table = None
            levels.append(LevelMaps(
                coords=entry["coords"], batch=entry["batch"],
                valid=entry["valid"],
                self_table=self_table, down_table=down_table,
                up_table=up_table, stride=t,
            ))
        return UNetMaps(levels=tuple(levels),
                        overflow=jnp.stack(overflows))

    def _level_caps(self, cap0: int):
        return [
            max(8, int(cap0 * r)) for r in self.level_cap_ratios
        ][: self.num_levels]

    def _build_merge(self, grid: SparseGrid) -> UNetMaps:
        """One sort per level + bitonic merge-joins for every table."""
        from corsair_tpu.core.sparse import (
            bitonic_merge_join,
            pack_key_compact,
            pack_offset_deltas,
            shifted_query_keys,
            sort_table_compact,
        )

        caps = self._level_caps(grid.capacity)
        offs = self.offsets

        # Per level: coords/batch/valid, stride, sorted keys, the original
        # row of each sorted slot (None = already key-sorted), and the
        # inverse permutation (original row -> sorted slot; None = id).
        coords, batch, valid = grid.coords, grid.batch, grid.valid
        stride = grid.stride
        sk0, srows0 = sort_table_compact(_keys(coords, batch, valid))
        inv0 = jnp.zeros((grid.capacity,), jnp.int32).at[srows0].set(
            jnp.arange(grid.capacity, dtype=jnp.int32)
        )
        per_level = [dict(coords=coords, batch=batch, valid=valid,
                          stride=stride, sk=sk0, srows=srows0, inv=inv0)]
        overflows = [jnp.asarray(False)]
        for lvl in range(1, self.num_levels):
            coords, batch, valid, ovf = downsample_coords(
                coords, batch, valid, stride, caps[lvl], compact=True,
                with_overflow=True,
            )
            stride *= 2
            # downsample output is in packed-key order already
            sk = pack_key_compact(_keys(coords, batch, valid))
            rows = jnp.arange(caps[lvl], dtype=jnp.int32)
            per_level.append(dict(coords=coords, batch=batch, valid=valid,
                                  stride=stride, sk=sk, srows=rows,
                                  inv=None))
            overflows.append(ovf)

        try:
            on_cpu = jax.default_backend() == "cpu"
        except RuntimeError:
            on_cpu = True
        use_pallas = (not on_cpu if self.pallas_join is None
                      else self.pallas_join)
        interpret = use_pallas and on_cpu  # forced on CPU -> interpret
        if use_pallas:
            from corsair_tpu.core.kernels.merge_join import (
                merge_join_pallas,
            )

        def join(table_lvl, query_lvl, offsets, dilation):
            tbl = per_level[table_lvl]
            qry = per_level[query_lvl]
            qk = shifted_query_keys(
                qry["sk"], pack_offset_deltas(offsets, dilation)
            )
            if use_pallas:
                # whole merge+join in VMEM (log-n roll stages); the jnp
                # fallback lowers each stage through HBM relayouts
                res = merge_join_pallas(
                    tbl["sk"], tbl["srows"], qk, tbl["sk"].shape[0],
                    interpret=interpret,
                )
            else:
                res = bitonic_merge_join(
                    tbl["sk"], tbl["srows"], qk, tbl["sk"].shape[0]
                )
            if qry["inv"] is not None:  # back to original column order
                res = res[:, qry["inv"]]
            return res

        levels = []
        for lvl, entry in enumerate(per_level):
            t = entry["stride"]
            self_table = join(lvl, lvl, offs, t)
            if lvl > 0:
                pt = per_level[lvl - 1]["stride"]
                # Stride-2 conv: coarse output y gathers fine y + o*t_fine;
                # transpose conv: fine output x gathers coarse x - o*t_fine
                # (adjoint pairing, same kernel index).
                down_table = join(lvl - 1, lvl, offs, pt)
                if self.up_join:
                    # The up table is a merge-join in its own right:
                    # table = this (coarse) level, queries = fine keys
                    # shifted by -o_k*t — same kernel index k, exact
                    # inverse of the down relation, identical miss value
                    # (coarse capacity). Replaces the adjoint scatter,
                    # the r5 profile's largest extraction op (17.3 ms of
                    # 113.6 at L0->L1; logs/extraction_roofline.json).
                    up_table = join(lvl, lvl - 1, -offs, pt)
                else:
                    up_table = adjoint_up_table(
                        down_table,
                        per_level[lvl - 1]["coords"].shape[0],
                        entry["coords"].shape[0],
                    )
            else:
                down_table = None
                up_table = None
            levels.append(LevelMaps(
                coords=entry["coords"], batch=entry["batch"],
                valid=entry["valid"],
                self_table=self_table, down_table=down_table,
                up_table=up_table, stride=t,
            ))
        return UNetMaps(levels=tuple(levels),
                        overflow=jnp.stack(overflows))

    def _build_generic(self, grid: SparseGrid, use_compact: bool
                       ) -> UNetMaps:
        from corsair_tpu.core.sparse import lookup_merge_compact

        caps = self._level_caps(grid.capacity)

        coords, batch, valid = grid.coords, grid.batch, grid.valid
        levels = []
        stride = grid.stride
        per_level = [(coords, batch, valid, stride)]
        overflows = [jnp.asarray(False)]
        for lvl in range(1, self.num_levels):
            coords, batch, valid, ovf = downsample_coords(
                coords, batch, valid, stride, caps[lvl],
                compact=use_compact, with_overflow=True,
            )
            stride *= 2
            per_level.append((coords, batch, valid, stride))
            overflows.append(ovf)

        if use_compact:
            def nt(lvl_table, qc, qb, qv, offsets, dilation):
                tc, tb, tv, _ = per_level[lvl_table]
                k = offsets.shape[0]
                m = qc.shape[0]
                qkeys = _offset_queries(
                    qc, qb, qv, jnp.asarray(offsets), dilation
                )
                idx = lookup_merge_compact(
                    _keys(tc, tb, tv), qkeys, tc.shape[0]
                )
                return idx.reshape(k, m)
        else:
            def nt(lvl_table, qc, qb, qv, offsets, dilation):
                tc, tb, tv, _ = per_level[lvl_table]
                return neighbor_table(
                    tc, tb, tv, qc, qb, qv, offsets, dilation
                )

        for lvl, (c, b, v, t) in enumerate(per_level):
            self_table = nt(lvl, c, b, v, self.offsets, t)
            if lvl > 0:
                pc, pb, pv, pt = per_level[lvl - 1]
                # Stride-2 conv: output voxel at coarse coord y gathers fine
                # inputs at y + o*t_fine.
                down_table = nt(lvl - 1, c, b, v, self.offsets, pt)
                # Transpose conv from this level back to the finer level:
                # fine output x gathers coarse inputs at x - o*t_fine
                # (adjoint of the forward pairing, same kernel index) —
                # the inverse relation of down_table, so a scatter
                # replaces the join.
                up_table = adjoint_up_table(
                    down_table, pc.shape[0], c.shape[0]
                )
            else:
                down_table = None
                up_table = None
            levels.append(
                LevelMaps(
                    coords=c, batch=b, valid=v,
                    self_table=self_table,
                    down_table=down_table,
                    up_table=up_table,
                    stride=t,
                )
            )
        return UNetMaps(levels=tuple(levels),
                        overflow=jnp.stack(overflows))
