"""Fast-merge coordinate manager: bitonic merge-join correctness.

The round-2 extraction-speed redesign (one sort per level + bitonic
merges; replaces per-table bitonic sorts) must be bit-identical to the
generic sort-join path on every table of every level.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corsair_tpu.core.coordmap import CoordinateManager
from corsair_tpu.core.sparse import (
    COMPACT_SAFE_COORD,
    SparseGrid,
    bitonic_merge_join,
    pack_key_compact,
    pack_offset_deltas,
    shifted_query_keys,
    sort_table_compact,
)
from corsair_tpu.core.voxelize import collate_to_grid


def _random_grid(rng, n_clouds=3, n_per=300, cap=2048, spread=60):
    coords_list = []
    for _ in range(n_clouds):
        c = rng.randint(-spread, spread, (n_per, 3)).astype(np.int32)
        c = np.unique(c, axis=0)
        coords_list.append(c)
    feats = [np.ones((len(c), 1), np.float32) for c in coords_list]
    return collate_to_grid(coords_list, feats, cap)


def test_merge_join_vs_bruteforce(rng):
    """Join result == a numpy dictionary lookup, misses included."""
    n, m, k = 500, 300, 5
    cap = 512
    keys = rng.choice(2**20, size=n, replace=False).astype(np.uint32)
    table = np.full(cap, 2**32 - 1, np.uint32)
    table[:n] = np.sort(keys)
    rows = np.arange(cap, dtype=np.int32)
    qk = np.sort(
        rng.choice(2**20, size=(k, m)).astype(np.uint32), axis=1
    )
    got = np.asarray(bitonic_merge_join(
        jnp.asarray(table), jnp.asarray(rows), jnp.asarray(qk), cap
    ))
    lut = {int(key): i for i, key in enumerate(table[:n])}
    want = np.vectorize(lambda q: lut.get(int(q), cap))(qk)
    np.testing.assert_array_equal(got, want)


def test_shifted_keys_stay_sorted(rng):
    coords = rng.randint(-COMPACT_SAFE_COORD, COMPACT_SAFE_COORD,
                         (400, 3)).astype(np.int32)
    coords = np.unique(coords, axis=0)
    n = len(coords)
    batch = np.zeros(n, np.int32)
    valid = np.ones(n, bool)
    keys = pack_key_compact((jnp.asarray(batch), jnp.asarray(coords[:, 0]),
                             jnp.asarray(coords[:, 1]),
                             jnp.asarray(coords[:, 2])))
    sk, _ = sort_table_compact((jnp.asarray(batch),
                                jnp.asarray(coords[:, 0]),
                                jnp.asarray(coords[:, 1]),
                                jnp.asarray(coords[:, 2])))
    offs = CoordinateManager().offsets
    for dil in (1, 2, 4, 8):
        qk = np.asarray(shifted_query_keys(
            sk, pack_offset_deltas(offs, dil)
        ))
        assert np.all(np.diff(qk.astype(np.int64), axis=1) >= 0)


@pytest.mark.parametrize("n_clouds,cap", [(1, 1024), (3, 2048), (8, 4096)])
def test_fast_merge_build_matches_generic(rng, n_clouds, cap):
    grid = _random_grid(rng, n_clouds=n_clouds, cap=cap)
    fast = CoordinateManager(fast_merge=True).build(grid)
    slow = CoordinateManager(fast_merge=False).build(grid)
    assert not np.asarray(fast.overflow).any()
    for lf, ls in zip(fast.levels, slow.levels):
        np.testing.assert_array_equal(np.asarray(lf.coords),
                                      np.asarray(ls.coords))
        np.testing.assert_array_equal(np.asarray(lf.valid),
                                      np.asarray(ls.valid))
        np.testing.assert_array_equal(np.asarray(lf.self_table),
                                      np.asarray(ls.self_table))
        if lf.down_table is not None:
            np.testing.assert_array_equal(np.asarray(lf.down_table),
                                          np.asarray(ls.down_table))
            np.testing.assert_array_equal(np.asarray(lf.up_table),
                                          np.asarray(ls.up_table))


@pytest.mark.parametrize("n_clouds,cap", [(1, 1024), (3, 2048)])
def test_eq_join_build_matches_generic(rng, n_clouds, cap):
    """The opt-in sort-free equality-join builder (CORSAIR_EQ_JOIN=1)
    is bit-identical to the generic sort-join path."""
    grid = _random_grid(rng, n_clouds=n_clouds, cap=cap)
    eq = CoordinateManager(fast_merge=True)._build_eq(grid)
    slow = CoordinateManager(fast_merge=False).build(grid)
    for lf, ls in zip(eq.levels, slow.levels):
        np.testing.assert_array_equal(np.asarray(lf.coords),
                                      np.asarray(ls.coords))
        np.testing.assert_array_equal(np.asarray(lf.valid),
                                      np.asarray(ls.valid))
        np.testing.assert_array_equal(np.asarray(lf.self_table),
                                      np.asarray(ls.self_table))
        if lf.down_table is not None:
            np.testing.assert_array_equal(np.asarray(lf.down_table),
                                          np.asarray(ls.down_table))
            np.testing.assert_array_equal(np.asarray(lf.up_table),
                                          np.asarray(ls.up_table))


def test_fast_merge_under_vmap(rng):
    """The per-cloud padded layout (bench/TPU hot path) vmaps the build."""
    B, cap = 4, 1024
    coords = np.zeros((B, cap, 3), np.int32)
    valid = np.zeros((B, cap), bool)
    for i in range(B):
        c = np.unique(
            rng.randint(-50, 50, (400, 3)).astype(np.int32), axis=0
        )
        coords[i, : len(c)] = c
        valid[i, : len(c)] = True

    from corsair_tpu.core.sparse import SENTINEL

    def build_tables(fast):
        manager = CoordinateManager(fast_merge=fast)

        def one(ci, vi):
            g = SparseGrid(
                coords=jnp.where(vi[:, None], ci, SENTINEL),
                batch=jnp.where(vi, 0, 1).astype(jnp.int32),
                feats=vi[:, None].astype(jnp.float32),
                valid=vi, stride=1, num_batches=1,
            )
            maps = manager.build(g)
            return (maps.levels[0].self_table, maps.levels[1].down_table,
                    maps.levels[1].up_table, maps.levels[3].self_table)

        return jax.vmap(one)(jnp.asarray(coords), jnp.asarray(valid))

    for a, b in zip(build_tables(True), build_tables(False)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_overflow_flag_and_loud_failure(rng):
    from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor

    grid = _random_grid(rng, n_clouds=2, n_per=600, cap=2048)
    # level-1 capacity of 32 voxels cannot hold ~1000 coarse voxels
    maps = CoordinateManager(
        level_cap_ratios=(1.0, 1.0 / 64, 1.0 / 64, 1.0 / 64)
    ).build(grid)
    assert np.asarray(maps.overflow)[1]

    extractor = FeatureExtractor(ExtractorConfig(
        level_cap_ratios=(1.0, 1.0 / 64, 1.0 / 64, 1.0 / 64),
        auto_level_caps=False,
    ))
    params = extractor.init_params(jax.random.PRNGKey(0))
    clouds = [np.unique(rng.randint(-60, 60, (600, 3)).astype(np.int32),
                        axis=0) for _ in range(2)]
    with pytest.raises(RuntimeError, match="capacity overflow"):
        extractor.extract_batch_np(params, clouds)


def test_out_of_range_coords_fail_loudly():
    from corsair_tpu.core.voxelize import sparse_collate_np

    bad = np.array([[0, 0, 300]], np.int32)
    with pytest.raises(ValueError, match="safe range"):
        sparse_collate_np([bad], [np.ones((1, 1), np.float32)], 8)

    from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor

    extractor = FeatureExtractor(ExtractorConfig())
    with pytest.raises(ValueError, match="safe range"):
        extractor.pad_clouds([bad])


def test_pallas_merge_join_matches_jnp(rng):
    """merge_join_pallas (interpret) is bit-identical to the jnp path
    across table sizes, dilations and sparse/dense occupancies."""
    from corsair_tpu.core.coordmap import kernel_offsets
    from corsair_tpu.core.kernels.merge_join import merge_join_pallas
    from corsair_tpu.core.sparse import SENTINEL

    offs = kernel_offsets(3)
    for cap, n_valid, dil in [(512, 400, 1), (1024, 1024, 2), (256, 7, 4)]:
        coords = np.unique(
            rng.randint(-50, 50, size=(n_valid, 3)).astype(np.int32),
            axis=0,
        )
        nv = len(coords)
        c = np.full((cap, 3), SENTINEL, np.int32)
        c[:nv] = coords
        v = np.zeros(cap, bool)
        v[:nv] = True
        b = np.where(v, 0, SENTINEL).astype(np.int32)
        keys = (jnp.asarray(b), jnp.asarray(np.where(v, c[:, 0], SENTINEL)),
                jnp.asarray(np.where(v, c[:, 1], SENTINEL)),
                jnp.asarray(np.where(v, c[:, 2], SENTINEL)))
        sk, srows = sort_table_compact(keys)
        qk = shifted_query_keys(sk, pack_offset_deltas(offs, dil))
        ref = bitonic_merge_join(sk, srows, qk, cap)
        out = merge_join_pallas(sk, srows, qk, cap, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_adjoint_up_table_matches_join(rng):
    """The two up-table constructions agree exactly on the deployed
    (compact merge-join) build path: the direct merge-join of the
    adjoint relation (up_join=True, the default since the r5 roofline
    named the scatter the largest extraction op) vs the scatter-derived
    inverse of the down table (up_join=False) — and both equal an
    independently computed neighbor_table of the adjoint pairing."""
    from corsair_tpu.core.coordmap import kernel_offsets, neighbor_table

    grid = _random_grid(rng, n_clouds=2, n_per=400, cap=1024)
    caps = (1.0, 1.0, 1.0, 1.0)
    maps = CoordinateManager(level_cap_ratios=caps, up_join=True).build(grid)
    maps_sc = CoordinateManager(level_cap_ratios=caps,
                                up_join=False).build(grid)
    offs = kernel_offsets(3)
    for lvl in range(1, 4):
        fine = maps.levels[lvl - 1]
        coarse = maps.levels[lvl]
        direct = neighbor_table(
            coarse.coords, coarse.batch, coarse.valid,
            fine.coords, fine.batch, fine.valid,
            -offs, fine.stride,
        )
        np.testing.assert_array_equal(
            np.asarray(coarse.up_table), np.asarray(direct),
            err_msg=f"level {lvl} (join vs neighbor_table)",
        )
        np.testing.assert_array_equal(
            np.asarray(maps_sc.levels[lvl].up_table), np.asarray(direct),
            err_msg=f"level {lvl} (scatter vs neighbor_table)",
        )
