"""Window-spread study: 3-group vs 9-group banded-conv coverage.

Builds REAL coordinate-manager tables on the CPU backend for
bench-shaped clouds (15k-point unit-sphere shells at voxel 0.03, the
bench.py workload) and reports, per (level, table, group count), the
max spread the banded plan must cover — i.e. the smallest band that
fully covers the layout. Informs the CORSAIR_BANDED_GROUPS /
CORSAIR_BANDED_BAND on-chip A/B without burning TPU compiles.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_cloud(rng, n_pts=15000, voxel=0.03):
    pts = rng.randn(n_pts, 3).astype(np.float32)
    pts /= np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-9)
    pts *= 0.9 * (1.0 + rng.randn(n_pts, 1).astype(np.float32) * 0.03)
    grid = np.floor(pts / voxel).astype(np.int32)
    _, first = np.unique(grid, axis=0, return_index=True)
    return grid[np.sort(first)]


def spread_for(table, n_in, ngroups, tile=128):
    """Max aligned window spread over (group, tile) cells (the quantity
    ``banded_plan`` compares against the band)."""
    from corsair_tpu.core.kernels.banded_conv import ALIGN, group_rows

    k, n_out = table.shape
    if k % ngroups:
        return None
    perm = group_rows(k, ngroups)
    n_tiles = n_out // tile
    t = table[perm, : n_tiles * tile].reshape(
        ngroups, k // ngroups, n_tiles, tile
    )
    valid = t < n_in
    big = np.where(valid, t, 2**30)
    small = np.where(valid, t, -1)
    lo = big.min(axis=(1, 3))
    hi = small.max(axis=(1, 3))
    has = valid.any(axis=(1, 3))
    starts = np.where(has, np.maximum(lo, 0) // ALIGN, 0)
    spread = np.where(has, hi - starts * ALIGN + 1, 0)
    return int(spread.max())


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor

    rng = np.random.RandomState(0)
    B, cap = 16, 16384
    clouds = [make_cloud(rng) for _ in range(B)]

    ex = FeatureExtractor(ExtractorConfig(banded_band=0))
    coords, valid = ex.pad_clouds(clouds, cap)
    ratios = ex._measure_ratios(clouds[:8], cap)
    manager = ex._manager_for(ratios)
    print(f"B={B} cap={cap} ratios={ratios}")

    # the deployed extract_padded path sorts each cloud (x, y, z) before
    # building maps; reproduce that here so the layouts band
    order = [np.lexsort((c[:, 2], c[:, 1], c[:, 0])) for c in clouds]
    coords, valid = ex.pad_clouds(
        [c[o] for c, o in zip(clouds, order)], cap
    )

    from corsair_tpu.core.coordmap import flatten_unet_maps
    from corsair_tpu.core.sparse import SENTINEL, SparseGrid

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

    maps_b = jax.vmap(build_one)(jnp.asarray(coords), jnp.asarray(valid))
    maps = flatten_unet_maps(maps_b, B)

    print(f"{'table':>12s} {'rows':>8s} " + " ".join(
        f"g={g:>1d}-spread" for g in (1, 3, 9)
    ))
    for lvl, Li in enumerate(maps.levels):
        n_l = Li.valid.shape[0]
        n_prev = maps.levels[lvl - 1].valid.shape[0] if lvl else 0
        for name, table, n_in in (
            ("self", Li.self_table, n_l),
            ("down", Li.down_table if lvl else None, n_prev),
            ("up", Li.up_table if lvl else None, n_l),
        ):
            if table is None:
                continue
            t = np.asarray(table)
            row = [spread_for(t, n_in, g) for g in (1, 3, 9)]
            print(f"L{lvl} {name:>9s} {t.shape[1]:>8d} "
                  + " ".join(f"{r if r is not None else -1:>10d}"
                             for r in row))


if __name__ == "__main__":
    main()
