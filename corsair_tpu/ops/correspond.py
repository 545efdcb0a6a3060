"""Feature-space correspondence building.

Parity with ``find_corr`` / ``find_kcorr`` (``utils/eval_pose.py:28-79``):
top-k feature-space neighbors; each source index is repeated k times. Adds
masked/sector-restricted variants used by the symmetry-aided path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from corsair_tpu.ops.knn import pairwise_sqdist, small_topk_min

_BIG = np.float32(1e30)  # np scalar: no device array at import


def find_kcorr(F0, F1, k: int, v0=None, v1=None, chunk: int = 1024):
    """Top-k matches of each F0 row in F1.

    Returns (idx0 [N0*k], idx1 [N0*k], valid [N0*k]) with idx0 repeated k
    times per source row (``utils/eval_pose.py:74-79``). On TPU this is
    the fused Pallas kernel with a single all-targets sector.
    """
    n0 = F0.shape[0]
    if _use_pallas_sector_knn(F1.shape[0]):
        from corsair_tpu.core import interpret_mode
        from corsair_tpu.core.kernels.sector_knn import sector_knn_pallas

        sector1 = jnp.zeros((F1.shape[0],), jnp.int32)
        idx, _ = sector_knn_pallas(F0, F1, sector1, 1, k, v1=v1,
                                   interpret=interpret_mode.interpret_flag())
        idx1 = idx[:, 0, :]                              # [N0, k]
    else:
        idx1 = _find_kcorr_xla(F0, F1, k, v1, chunk)
    idx0 = jnp.repeat(jnp.arange(n0, dtype=jnp.int32), k)
    valid = jnp.ones((n0,), bool) if v0 is None else v0
    return idx0, idx1.reshape(-1), jnp.repeat(valid, k)


@partial(jax.jit, static_argnames=("k", "chunk"))
def _find_kcorr_xla(F0, F1, k: int, v1=None, chunk: int = 1024):
    n0 = F0.shape[0]
    pad = (-n0) % chunk
    q = jnp.pad(F0, ((0, pad), (0, 0)))

    def body(qc):
        d2 = pairwise_sqdist(qc, F1, v1)
        idx, _ = small_topk_min(d2, k)
        return idx

    idx1 = jax.lax.map(body, q.reshape(-1, chunk, F0.shape[1]))
    return idx1.reshape(-1, k)[:n0]                      # [N0, k]


def find_corr(key, xyz0, xyz1, F0, F1, subsample_size: int = -1,
              v0=None, v1=None, chunk: int = 1024):
    """Top-1 matching point pairs (``find_corr``,
    ``utils/eval_pose.py:28-45``): returns (xyz0_sel, xyz1_matched).

    With ``subsample_size > 0`` both sides are randomly subsampled first
    (keyed, static shapes: a keyed permutation prefix).
    """
    if subsample_size > 0 and F0.shape[0] > subsample_size:
        k0, k1 = jax.random.split(key)
        inds0 = jax.random.permutation(k0, F0.shape[0])[:subsample_size]
        inds1 = jax.random.permutation(k1, F1.shape[0])[:subsample_size]
        xyz0, F0 = xyz0[inds0], F0[inds0]
        xyz1, F1 = xyz1[inds1], F1[inds1]
        v0 = None if v0 is None else v0[inds0]
        v1 = None if v1 is None else v1[inds1]
    idx0, idx1, _ = find_kcorr(F0, F1, 1, v0, v1, chunk=chunk)
    return xyz0[idx0], xyz1[idx1]


# kNN kernel-selection A/B knobs, read ONCE at import (advisor r3: a
# trace-time env read is baked into the jit cache; toggling mid-process
# silently keeps the previously traced variant for already-seen shapes
# and mislabels A/B measurements). Set them before process start
# (env CORSAIR_MERGED_KNN=1 python bench.py).
import os as _os

_SLAB_KNN_ENV = _os.environ.get("CORSAIR_SLAB_KNN", "1") == "1"
_SLAB_ALPHA_ENV = float(_os.environ.get("CORSAIR_SLAB_ALPHA", "1.5"))
_SLAB_TILE_ENV = int(_os.environ.get("CORSAIR_SLAB_TILE", "128"))
# Merged-global default ON (r4 session 3): the global top-k is merged
# from the sector-slab winners instead of re-scanning the full-width
# global span — once the corr-build and cut costs around it shrank, the
# isolated ~7% kernel win became visible at protocol scale too
# (register_s 2.68/2.72 vs 2.72/2.78 s / 128 across repeated A/Bs).
_MERGED_KNN_ENV = _os.environ.get("CORSAIR_MERGED_KNN", "1") == "1"
_SORTED_KNN_ENV = _os.environ.get("CORSAIR_SORTED_KNN", "0") == "1"
# Minimum target count for the slab layouts (measured: the slab win
# shows at protocol caps, not toy sizes). The multichip dryrun lowers
# this (module attribute, before its first trace) so the merged-global
# DEFAULT kernel is certified at CPU-tractable capacities.
_SLAB_MIN_N1 = int(_os.environ.get("CORSAIR_SLAB_MIN_N1", "4096"))


def _use_pallas_sector_knn(n1: int) -> bool:
    """Pallas fast path: accelerator backend (or interpret mode forced —
    the multichip dryrun certifying the deployed kernels on CPU) and a
    distance tile that fits VMEM."""
    from corsair_tpu.core import interpret_mode

    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    return (backend != "cpu" or interpret_mode.forced()) and n1 <= 16384


def find_kcorr_per_sector(F0, F1, sector1, num_sectors: int, k: int,
                          v1=None, chunk: int = 1024,
                          use_pallas=None, include_global: bool = False,
                          return_spill: bool = False):
    """Dispatcher: Pallas fused kernel on TPU, chunked XLA elsewhere.

    ``include_global=True`` returns ``[N0, S+1, k]`` with slot 0 holding
    the GLOBAL top-k over all valid targets (one shared distance pass;
    see ``sector_knn_pallas``).

    ``return_spill=True`` appends a scalar bool: True when a sector-slab
    layout dropped members of an oversized sector (slab kernel only —
    the other paths always return False). The global slot is exact
    either way; callers must treat spill like a failed symmetric cut
    (see ``slab_sector_knn_pallas``)."""
    from corsair_tpu.core import interpret_mode

    if use_pallas is None:
        use_pallas = _use_pallas_sector_knn(F1.shape[0])
    if use_pallas:
        interp = interpret_mode.interpret_flag()
        tile = 64 if F1.shape[0] <= 8192 else 32
        if (include_global and num_sectors > 1
                and F1.shape[0] >= _SLAB_MIN_N1
                and _SLAB_KNN_ENV):
            # Slab-layout kernel: full-width global region + equal-width
            # sector slabs. Measured on v5e at [8, 16384], K=4, k=5 with
            # packed-split dots: 108 ms vs 126 ms fused (alpha=1.5);
            # alpha=1.25 reaches 104 ms but spills on any sector >31%,
            # which a legitimately-accepted asymmetric-ratio cut can hit,
            # so 1.5 (spill at >37.5%) is the deployed default.
            from corsair_tpu.core.kernels.sector_knn import (
                slab_sector_knn_pallas,
            )

            alpha = _SLAB_ALPHA_ENV
            # per-span d2 + bit-packed extraction measured best at
            # tile=128 (99 vs 104 ms at [8, 16384] — the whole-layout
            # d2 form that forced tile=32 is gone)
            slab_tile = _SLAB_TILE_ENV
            if not return_spill:
                # A slab layout can DROP members of an oversized sector
                # (its top-k is then incomplete) and the spill flag is
                # the only signal. Today's sole include_global caller
                # (sym_pose) passes return_spill=True; refuse rather
                # than let a future caller silently consume spilled
                # sector results (advisor r3).
                raise ValueError(
                    "slab sector-kNN requires return_spill=True (the "
                    "spill flag marks incomplete sector top-k); pass "
                    "return_spill=True or use_pallas=False"
                )
            if _MERGED_KNN_ENV:
                from corsair_tpu.core.kernels.sector_knn import (
                    merged_slab_sector_knn_pallas,
                )

                idx, ok, spill = merged_slab_sector_knn_pallas(
                    F0, F1, sector1, num_sectors, k, v1=v1,
                    tile=slab_tile, alpha=alpha, interpret=interp,
                )
                return idx, ok, spill
            idx, ok, spill = slab_sector_knn_pallas(
                F0, F1, sector1, num_sectors, k, v1=v1, tile=slab_tile,
                alpha=alpha, interpret=interp,
            )
            return idx, ok, spill
        if (not include_global and num_sectors > 1
                and F1.shape[0] >= _SLAB_MIN_N1
                and _SORTED_KNN_ENV):
            # Sector-sorted chunk-skipping kernel (CORSAIR_SORTED_KNN=1,
            # measured LOSER): group targets by sector so each sector's
            # extraction scans ~N/K contiguous columns instead of N.
            # On v5e at [8, 16384] it ran 2x SLOWER than the full-width
            # kernel (1140 vs 549 ms): the 640 pl.when-guarded 512-wide
            # blocks pay per-block scratch/VMEM overhead that full-width
            # vector scans amortize away. Kept as the measured record +
            # starting point if Mosaic block overheads improve.
            from corsair_tpu.core.kernels.sector_knn import (
                sector_knn_sorted_pallas,
            )

            n1 = F1.shape[0]
            v1b = (jnp.ones((n1,), bool) if v1 is None else v1)
            key_sec = jnp.where(v1b, sector1, num_sectors)
            _, order = jax.lax.sort(
                (key_sec.astype(jnp.int32),
                 jnp.arange(n1, dtype=jnp.int32)),
                num_keys=1, is_stable=True,
            )
            idx_s, ok = sector_knn_sorted_pallas(
                F0, F1[order], key_sec[order], num_sectors, k,
                v1_sorted=v1b[order], tile=tile, interpret=interp,
            )
            if return_spill:
                return order[idx_s], ok, jnp.zeros((), bool)
            return order[idx_s], ok
        from corsair_tpu.core.kernels.sector_knn import sector_knn_pallas

        idx, ok = sector_knn_pallas(
            F0, F1, sector1, num_sectors, k, v1=v1, tile=tile,
            include_global=include_global, interpret=interp,
        )
    else:
        idx, ok = _find_kcorr_per_sector_xla(
            F0, F1, sector1, num_sectors, k, v1=v1, chunk=chunk,
            include_global=include_global,
        )
    if return_spill:
        return idx, ok, jnp.zeros((), bool)
    return idx, ok


@partial(jax.jit, static_argnames=("num_sectors", "k", "chunk",
                                   "include_global"))
def _find_kcorr_per_sector_xla(F0, F1, sector1, num_sectors: int, k: int,
                               v1=None, chunk: int = 1024,
                               include_global: bool = False):
    """For each source row, the top-k F1 neighbors *within every target
    sector*: ``idx [N0, S, k]``, ``ok [N0, S, k]`` (False when the sector has
    fewer than needed valid points).

    Computed in one chunked pass so that all cyclic sector shifts of the
    symmetry-aided registration (``utils/symmetry.py:303-356``) reuse the
    same distance computation.
    """
    n0 = F0.shape[0]
    pad = (-n0) % chunk
    q = jnp.pad(F0, ((0, pad), (0, 0)))
    sec_mask = (
        sector1[None, :] == jnp.arange(num_sectors)[:, None]
    )  # [S, N1]
    if v1 is not None:
        sec_mask = sec_mask & v1[None, :]
    if include_global:
        allrow = (jnp.ones((1, F1.shape[0]), bool) if v1 is None
                  else v1[None, :])
        sec_mask = jnp.concatenate([allrow, sec_mask], axis=0)
        num_sectors = num_sectors + 1

    def body(qc):
        d2 = pairwise_sqdist(qc, F1)  # [chunk, N1]

        def per_sector(mask):
            dm = jnp.where(mask[None, :], d2, _BIG)
            idx, vals = small_topk_min(dm, k)
            return idx, vals < _BIG / 2

        idxs, oks = jax.vmap(per_sector)(sec_mask)  # [S, chunk, k]
        return jnp.transpose(idxs, (1, 0, 2)), jnp.transpose(oks, (1, 0, 2))

    idxs, oks = jax.lax.map(body, q.reshape(-1, chunk, F0.shape[1]))
    idxs = idxs.reshape(-1, num_sectors, k)[:n0]
    oks = oks.reshape(-1, num_sectors, k)[:n0]
    return idxs, oks
