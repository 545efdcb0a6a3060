"""High-level jitted pipelines: voxel batch -> features -> descriptors.

This is the TPU equivalent of the reference's Phase A/B extraction loops
(``evaluation.py:207-269``): one jitted program per batch bucket computes
per-point features and the 256-D retrieval descriptor for every cloud in
the batch.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from corsair_tpu.core.coordmap import CoordinateManager
from corsair_tpu.core.sparse import SparseGrid
from corsair_tpu.core.voxelize import collate_to_grid
from corsair_tpu.nn import heads, resunet
from corsair_tpu.nn.layers import l2_normalize


@dataclasses.dataclass(frozen=True)
class ExtractorConfig:
    model_name: str = "ResUNetBN2C"
    in_channels: int = 1
    out_channels: int = 16
    bn_momentum: float = 0.05
    conv1_kernel_size: int = 3
    normalize_feature: bool = True
    embed_conv_channels: int = 1024
    embed_linear1: int = 512
    embed_linear2: int = 256
    normalize_descriptor: bool = True  # evaluation.py:231
    level_cap_ratios: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    # Measure actual coarse-level occupancy on host and shrink level
    # capacities (bucketed to eighths, 1.25x safety margin): smaller
    # sorts in the coordinate manager AND fewer wasted rows in every
    # coarse-level conv. Ratios are cached so recompiles stay bounded.
    auto_level_caps: bool = True
    # "bfloat16" halves conv gather/matmul bandwidth (accumulation stays
    # f32, preferred_element_type). None = full f32. Descriptor deltas
    # vs f32 are ~1e-2 relative on random weights; validate retrieval
    # metrics before enabling for a parity run.
    compute_dtype: Optional[str] = None
    # Banded one-hot MXU conv band width (core/kernels/banded_conv.py):
    # 2.5-3.7x faster than the gather conv AND f32-exact, with a
    # per-batch lax.cond fallback when layouts don't band (unsorted
    # inputs). None = auto: 512 on accelerator backends, off on CPU
    # (Mosaic kernels don't compile there). 0 = force off
    # (CORSAIR_BANDED=0 env overrides to off as well). Setting it
    # explicitly on the CPU backend runs the kernel in Pallas interpret
    # mode (used by the multichip dryrun to certify the deployed path).
    banded_band: Optional[int] = None
    # Pallas merge-join selection for the coordinate manager: None =
    # auto (accelerators only), True = force (interpret mode on CPU —
    # dryrun use). See core.coordmap.CoordinateManager.
    pallas_join: Optional[bool] = None
    # Banded selection precision. None = auto: single-plane bf16
    # selection + DEFAULT-precision recombine on accelerator backends
    # (EXACTLY the gather path's default-einsum precision class there,
    # since bf16(select(x)) == select(bf16(x)); measured r4 on chip:
    # extraction 1.28 -> 0.94 s / 128 queries, 12/12 contained compile
    # sweep clean), 3-plane f32-exact on CPU where the gather baseline
    # itself is f32-exact. True/False forces. Env overrides (resolved
    # once at construction): CORSAIR_BANDED_EXACT=1 forces exact,
    # CORSAIR_BANDED_FAST=1 forces single-plane.
    banded_exact: Optional[bool] = None


class FeatureExtractor:
    """Stateless wrapper owning configs + the jit cache."""

    def __init__(self, config: ExtractorConfig = ExtractorConfig()):
        import os

        self.config = config
        banded = config.banded_band
        if banded is None:
            # 384 measured best at protocol scale (bench extract 1.41 ->
            # 1.28 s/128: selection-matmul work scales with band width);
            # batches that don't band at 384 lax.cond to the gather path
            banded = 384 if jax.default_backend() != "cpu" else 0
        if os.environ.get("CORSAIR_BANDED", "1") == "0":
            banded = 0
        elif "CORSAIR_BANDED_BAND" in os.environ:  # A/B knob
            banded = int(os.environ["CORSAIR_BANDED_BAND"])
        cdtype = (None if config.compute_dtype is None
                  else jnp.dtype(config.compute_dtype))
        # Single-plane banded selection knobs, resolved ONCE here at
        # construction (never inside a trace — a trace-time env read is
        # baked into the jit cache and silently ignores mid-process
        # toggles; advisor r3). banded_exact is part of the static
        # model config, so a different value is a different trace.
        banded_exact = config.banded_exact
        if os.environ.get("CORSAIR_BANDED_EXACT", "0") == "1":
            banded_exact = True
        elif (os.environ.get("CORSAIR_BANDED_FAST", "0") == "1"
              or (cdtype == jnp.bfloat16
                  and os.environ.get("CORSAIR_BANDED_BF16", "0") == "1")):
            banded_exact = False
        if banded_exact is None:
            # Auto: single-plane on accelerators (precision-neutral vs
            # the gather path's default einsum there, 3.5x less MXU
            # work); exact on CPU, whose gather baseline is f32-exact.
            banded_exact = jax.default_backend() == "cpu"
        self.model_cfg = resunet.make_config(
            config.model_name,
            in_channels=config.in_channels,
            out_channels=config.out_channels,
            bn_momentum=config.bn_momentum,
            conv1_kernel_size=config.conv1_kernel_size,
            normalize_feature=config.normalize_feature,
            compute_dtype=cdtype,
            banded_band=banded,
            banded_exact=banded_exact,
        )
        self.manager = CoordinateManager(
            num_levels=4, level_cap_ratios=config.level_cap_ratios,
            pallas_join=config.pallas_join,
        )
        self._manager_cache = {config.level_cap_ratios: self.manager}

    def _manager_for(self, ratios: Tuple[float, ...]) -> CoordinateManager:
        if ratios not in self._manager_cache:
            self._manager_cache[ratios] = CoordinateManager(
                num_levels=4, level_cap_ratios=ratios,
                pallas_join=self.config.pallas_join,
            )
        return self._manager_cache[ratios]

    def _measure_ratios(self, coords_list, capacity: int
                        ) -> Tuple[float, ...]:
        """Bucketed per-level occupancy ratios with a 1.25x margin,
        counted per cloud (clouds overlap spatially)."""
        ratios = [1.0]
        for lvl in range(1, 4):
            step = 2 ** lvl
            cnt = sum(
                len(np.unique(g // step, axis=0)) for g in coords_list
            )
            r = min(1.0, float(np.ceil(cnt * 1.25 / capacity * 8) / 8))
            ratios.append(max(r, 0.125))
        return tuple(ratios)

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        model = resunet.init_params(k1, self.model_cfg)
        emb = heads.conv1_max_embedding_init(
            k2,
            conv_channels=self.config.embed_conv_channels,
            linear1_dim=self.config.embed_linear1,
            linear2_dim=self.config.embed_linear2,
            in_channels=self.model_cfg.channels[-1],
        )
        return {"model": model, "embedding": emb}

    @functools.partial(jax.jit, static_argnames=("self",))
    def extract(self, params, grid: SparseGrid):
        """Returns (point_feats [N, out_ch], descriptors [B, 256]).
        Coordinate maps are built on device (fully jittable path)."""
        maps = self.manager.build(grid)
        return self.extract_with_maps(params, grid, maps)

    @functools.partial(jax.jit, static_argnames=("self", "manager"))
    def extract_with_manager(self, params, grid: SparseGrid, manager):
        maps = manager.build(grid)
        return self.extract_with_maps(params, grid, maps)

    @functools.partial(jax.jit, static_argnames=("self",))
    def extract_with_maps(self, params, grid: SparseGrid, maps):
        """Forward + head with precomputed maps (device- or host-built)."""
        feats, bottleneck = resunet.forward(
            params["model"], grid, maps, self.model_cfg
        )
        l4 = maps.levels[3]
        desc = heads.conv1_max_embedding_apply(
            params["embedding"], bottleneck, l4.batch, l4.valid,
            grid.num_batches,
        )
        if self.config.normalize_descriptor:
            desc = l2_normalize(desc, axis=1)
        return feats, desc

    @functools.partial(jax.jit, static_argnames=("self", "manager"))
    def build_maps(self, grid: SparseGrid, manager=None):
        """Jitted coordinate-map build, exposed separately so host-driven
        pipelines can check ``maps.overflow`` before the forward."""
        return (manager or self.manager).build(grid)

    @functools.partial(jax.jit, static_argnames=("self", "manager"))
    def extract_padded(self, params, coords, valid, manager=None):
        """Per-cloud padded layout: ``coords`` int32 [B, cap, 3],
        ``valid`` bool [B, cap] -> (feats [B, cap, C], desc [B, D],
        overflow [B, num_levels] bool).

        Coordinate maps are built per cloud under vmap (per-cloud sorts:
        cap log^2 cap instead of one giant batch sort), then flattened
        into the collated multi-batch layout so the network forward runs
        UNVMAPPED — vmapped conv gathers lower to batched gather HLOs
        that run ~4x slower on TPU than the same flat gather (see
        ``flatten_unet_maps``). Any True in ``overflow`` means a level
        capacity dropped voxels — callers must fail, not ignore.
        """
        from corsair_tpu.core.coordmap import flatten_unet_maps
        from corsair_tpu.core.sparse import SENTINEL, pack_key_compact

        manager = manager or self.manager
        b, cap = valid.shape

        perms = None
        if self.model_cfg.banded_band:
            # Sort each cloud (x, y, z) — the manager's own level order —
            # so the level-0 layout is monotone per kernel offset and the
            # banded conv's coverage plan holds (core/kernels/
            # banded_conv.py). Outputs are scattered back to input order
            # below, so the caller contract is unchanged.
            def sort_one(coords_i, valid_i):
                key = pack_key_compact((
                    jnp.where(valid_i, 0, SENTINEL),
                    coords_i[:, 0], coords_i[:, 1], coords_i[:, 2],
                ))
                rows = jnp.arange(cap, dtype=jnp.int32)
                _, perm = jax.lax.sort((key, rows), num_keys=1,
                                       is_stable=True)
                return coords_i[perm], valid_i[perm], perm

            coords, valid, perms = jax.vmap(sort_one)(coords, valid)

        def build_one(coords_i, valid_i):
            grid = SparseGrid(
                coords=jnp.where(valid_i[:, None], coords_i, SENTINEL),
                batch=jnp.where(valid_i, 0, 1).astype(jnp.int32),
                feats=valid_i[:, None].astype(jnp.float32),
                valid=valid_i,
                stride=1,
                num_batches=1,
            )
            return manager.build(grid)

        maps_b = jax.vmap(build_one)(coords, valid)
        flat_maps = flatten_unet_maps(maps_b, b)
        l0 = flat_maps.levels[0]
        # Level-0 capacity must equal the input cap (ratio[0] == 1.0):
        # the flat grid's feats/miss-row indexing and the final reshape
        # both assume it. Fail loudly on a mismatched custom manager.
        if l0.coords.shape[0] != b * cap:
            raise ValueError(
                f"manager level-0 capacity {l0.coords.shape[0] // b} != "
                f"input cap {cap}; extract_padded requires "
                f"level_cap_ratios[0] == 1.0"
            )
        flat_grid = SparseGrid(
            coords=l0.coords,
            batch=l0.batch,
            feats=valid.reshape(-1, 1).astype(jnp.float32),
            valid=l0.valid,
            stride=1,
            num_batches=b,
        )
        feats, desc = self.extract_with_maps(params, flat_grid, flat_maps)
        feats = feats.reshape(b, cap, -1)
        if perms is not None:
            feats = jax.vmap(
                lambda f, p: jnp.zeros_like(f).at[p].set(f)
            )(feats, perms)
        return feats, desc, maps_b.overflow

    # Reference intermediate -> U-Net level (model/resunet.py:207-256).
    TAP_LEVELS = {
        "out_s1": 0, "out_s2": 1, "out_s4": 2, "out_s8": 3,
        "out_s4_tr": 2, "out_s2_tr": 1, "out_s1_tr": 0,
        "pre_normalize": 0, "final": 0,
    }

    @functools.partial(jax.jit, static_argnames=("self",))
    def _extract_with_taps(self, params, grid: SparseGrid, maps):
        taps = {}
        feats, bottleneck = resunet.forward(
            params["model"], grid, maps, self.model_cfg, taps_out=taps
        )
        l4 = maps.levels[3]
        desc = heads.conv1_max_embedding_apply(
            params["embedding"], bottleneck, l4.batch, l4.valid,
            grid.num_batches,
        )
        if self.config.normalize_descriptor:
            desc = l2_normalize(desc, axis=1)
        taps["final"] = feats
        taps["descriptor"] = desc
        return taps

    def extract_taps_np(self, params, coords: np.ndarray):
        """Single-cloud forward returning every reference intermediate
        (``model/resunet.py:207-256`` variables; see ``TAP_LEVELS``) as
        numpy, each restricted to valid rows, plus ``<name>_coords``
        [N, 3] voxel coordinates (stride multiples, ME convention) so a
        MinkowskiEngine activation dump can be aligned row-by-row
        regardless of either engine's internal voxel ordering."""
        capacity = _round_up_bucket(len(coords))
        grid = collate_to_grid(
            [coords], [np.ones((len(coords), 1), np.float32)], capacity
        )
        manager = (self._manager_for(
            self._measure_ratios([coords], capacity))
            if self.config.auto_level_caps else self.manager)
        maps = manager.build(grid)
        if np.asarray(maps.overflow).any():
            raise RuntimeError("level capacity overflow in taps forward")
        taps = self._extract_with_taps(params, grid, maps)
        out = {"descriptor": np.asarray(taps["descriptor"])}
        for name, lvl in self.TAP_LEVELS.items():
            L = maps.levels[lvl]
            valid = np.asarray(L.valid)
            out[name] = np.asarray(taps[name])[valid]
            out[name + "_coords"] = np.asarray(L.coords)[valid]
        return out

    def pad_clouds(self, coords_list: List[np.ndarray],
                   cap: Optional[int] = None):
        """[B, cap, 3] int32 + [B, cap] bool from a list of voxel grids.
        Fails loudly on per-cloud capacity overflow or out-of-range
        coordinates (both were silent truncations in round 1)."""
        from corsair_tpu.core.voxelize import assert_compact_range

        assert_compact_range(coords_list)
        if cap is None:
            cap = _round_up_bucket(max(len(c) for c in coords_list))
        b = len(coords_list)
        coords = np.zeros((b, cap, 3), np.int32)
        valid = np.zeros((b, cap), bool)
        for i, c in enumerate(coords_list):
            if len(c) > cap:
                raise ValueError(
                    f"cloud {i} has {len(c)} voxels > capacity {cap}"
                )
            n = len(c)
            coords[i, :n] = c[:n]
            valid[i, :n] = True
        return coords, valid

    def extract_batch_np(self, params, coords_list: List[np.ndarray],
                         capacity: Optional[int] = None,
                         host_maps: Optional[bool] = None):
        """Host convenience: list of per-cloud voxel coords -> numpy outputs
        split per cloud.

        ``host_maps`` selects the C++ hash-map coordinate-manager path —
        the jitted forward is shared with the device-built-maps path.
        Default off: with the compact-key device builder the on-device
        path avoids host->device table transfers (which dominate on
        tunneled TPU setups); enable when running against a local PCIe
        TPU where host CPU is plentiful.
        """
        perms = None
        if self.model_cfg.banded_band:
            # (x, y, z)-sort each cloud so level-0 layouts band (see
            # extract_padded); per-point outputs are unsorted back to
            # the caller's row order before returning.
            perms = [
                np.lexsort((c[:, 2], c[:, 1], c[:, 0]))
                for c in coords_list
            ]
            coords_list = [
                c[p] for c, p in zip(coords_list, perms)
            ]
        feats_list = [
            np.ones((len(c), 1), np.float32) for c in coords_list
        ]
        if capacity is None:
            total = sum(len(c) for c in coords_list)
            capacity = _round_up_bucket(total)
        grid = collate_to_grid(coords_list, feats_list, capacity)
        if host_maps is None:
            host_maps = False
        if host_maps:
            from corsair_tpu.core.coordmap import build_unet_maps_host

            coords_cat = np.concatenate(coords_list).astype(np.int32)
            batch_cat = np.concatenate([
                np.full(len(c), i, np.int32)
                for i, c in enumerate(coords_list)
            ])
            maps = build_unet_maps_host(
                coords_cat, batch_cat, capacity,
                num_levels=self.manager.num_levels,
                level_cap_ratios=self.config.level_cap_ratios,
            )
        else:
            if self.config.auto_level_caps:
                manager = self._manager_for(
                    self._measure_ratios(coords_list, capacity)
                )
            else:
                manager = self.manager
            maps = self.build_maps(grid, manager)
            overflow = np.asarray(maps.overflow)
            if overflow.any():
                lvls = np.nonzero(overflow)[0].tolist()
                raise RuntimeError(
                    f"coordinate-map capacity overflow at level(s) "
                    f"{lvls}: voxels were dropped — raise "
                    "level_cap_ratios (or disable auto_level_caps)"
                )
        feats, desc = self.extract_with_maps(params, grid, maps)
        feats = np.asarray(feats)
        desc = np.asarray(desc)
        # collate packs clouds contiguously in order: split by offsets
        counts = np.asarray([len(c) for c in coords_list])
        offsets = np.concatenate([[0], np.cumsum(counts)])
        per_cloud = [
            feats[offsets[i] : offsets[i + 1]]
            for i in range(len(coords_list))
        ]
        if perms is not None:
            for i, p in enumerate(perms):
                unsorted = np.empty_like(per_cloud[i])
                unsorted[p] = per_cloud[i]
                per_cloud[i] = unsorted
        return per_cloud, desc


def _round_up_bucket(n: int, buckets=(2048, 4096, 8192, 16384, 32768,
                                      65536, 131072, 262144)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return n
