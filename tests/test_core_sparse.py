"""Unit tests for SparseGrid key machinery, voxelization and neighbor tables."""

import jax.numpy as jnp
import numpy as np
import pytest

from corsair_tpu.core.sparse import (
    SENTINEL,
    lookup_sorted,
    unique_compact,
)
from corsair_tpu.core.voxelize import (
    collate_to_grid,
    sparse_collate_np,
    voxelize_jax,
    voxelize_np,
)
from corsair_tpu.core.coordmap import (
    CoordinateManager,
    downsample_coords,
    kernel_offsets,
    neighbor_table,
)


def _np_keyset(cols):
    return {tuple(int(v) for v in row) for row in np.stack(cols, axis=1)}


class TestLookupSorted:
    def test_random_keys(self, rng):
        n, m = 200, 300
        table = rng.randint(-50, 50, size=(n, 4)).astype(np.int32)
        # dedupe table keys so matches are unique
        table = np.unique(table, axis=0)
        n = len(table)
        queries = rng.randint(-50, 50, size=(m, 4)).astype(np.int32)
        # make half the queries actual hits
        hit_rows = rng.randint(0, n, size=m // 2)
        queries[: m // 2] = table[hit_rows]

        tkeys = tuple(jnp.asarray(table[:, i]) for i in range(4))
        qkeys = tuple(jnp.asarray(queries[:, i]) for i in range(4))
        out = np.asarray(lookup_sorted(tkeys, qkeys, n))

        lut = {tuple(row): i for i, row in enumerate(table)}
        for j in range(m):
            expect = lut.get(tuple(queries[j]), n)
            assert out[j] == expect, f"query {j}"

    def test_all_misses(self):
        tkeys = (jnp.array([0, 1, 2], jnp.int32),)
        qkeys = (jnp.array([5, 6], jnp.int32),)
        out = np.asarray(lookup_sorted(tkeys, qkeys, 3))
        assert (out == 3).all()


class TestUniqueCompact:
    def test_vs_numpy(self, rng):
        n = 500
        keys = rng.randint(0, 8, size=(n, 3)).astype(np.int32)
        jkeys = tuple(jnp.asarray(keys[:, i]) for i in range(3))
        perm, kept = unique_compact(jkeys, n)
        perm, kept = np.asarray(perm), np.asarray(kept)

        uniq = np.unique(keys, axis=0)
        assert kept.sum() == len(uniq)
        got = keys[perm[kept]]
        assert _np_keyset([got[:, i] for i in range(3)]) == _np_keyset(
            [uniq[:, i] for i in range(3)]
        )
        # first-occurrence: each kept row must be the minimal original index
        # among rows with the same key
        for row_idx in perm[kept]:
            key = keys[row_idx]
            first = np.nonzero((keys == key).all(1))[0][0]
            assert row_idx == first

    def test_sentinel_dropped(self):
        keys = (
            jnp.array([1, SENTINEL, 1, SENTINEL], jnp.int32),
            jnp.array([2, SENTINEL, 2, SENTINEL], jnp.int32),
        )
        perm, kept = unique_compact(keys, 4)
        assert int(kept.sum()) == 1


class TestVoxelize:
    def test_np_semantics(self, rng):
        pts = rng.randn(1000, 3).astype(np.float32)
        kept_pts, grid, kept_idx = voxelize_np(pts, 0.1)
        assert len(kept_pts) == len(np.unique(grid, axis=0))
        np.testing.assert_array_equal(
            grid, np.floor(pts[kept_idx] / 0.1).astype(np.int32)
        )
        # first-occurrence per voxel
        full_grid = np.floor(pts / 0.1).astype(np.int32)
        for i, g in zip(kept_idx, grid):
            first = np.nonzero((full_grid == g).all(1))[0][0]
            assert i == first

    def test_jax_matches_np(self, rng):
        pts = rng.randn(300, 3).astype(np.float32)
        valid = np.ones(300, bool)
        valid[250:] = False
        kept_pts_np, grid_np, _ = voxelize_np(pts[:250], 0.2)

        grid_j, kept_j, sel_j = voxelize_jax(
            jnp.asarray(pts), jnp.asarray(valid), 0.2
        )
        grid_j, kept_j = np.asarray(grid_j), np.asarray(kept_j)
        assert kept_j.sum() == len(grid_np)
        assert _np_keyset(
            [grid_j[kept_j][:, i] for i in range(3)]
        ) == _np_keyset([grid_np[:, i] for i in range(3)])


class TestCollate:
    def test_basic(self, rng):
        c0 = rng.randint(0, 10, size=(5, 3)).astype(np.int32)
        c1 = rng.randint(0, 10, size=(7, 3)).astype(np.int32)
        f0 = np.ones((5, 1), np.float32)
        f1 = np.ones((7, 1), np.float32)
        coords, batch, feats, valid = sparse_collate_np([c0, c1], [f0, f1], 16)
        assert valid.sum() == 12
        assert (batch[:5] == 0).all() and (batch[5:12] == 1).all()
        assert (batch[12:] == 2).all()
        assert (coords[12:] == SENTINEL).all()


class TestKernelOffsets:
    def test_shape_and_order(self):
        offs = kernel_offsets(3, 3)
        assert offs.shape == (27, 3)
        # dim-0 fastest: first three entries vary in dim 0
        np.testing.assert_array_equal(offs[0], [-1, -1, -1])
        np.testing.assert_array_equal(offs[1], [0, -1, -1])
        np.testing.assert_array_equal(offs[2], [1, -1, -1])
        np.testing.assert_array_equal(offs[13], [0, 0, 0])
        np.testing.assert_array_equal(offs[26], [1, 1, 1])

    def test_kernel1(self):
        offs = kernel_offsets(1, 3)
        assert offs.shape == (1, 3)
        np.testing.assert_array_equal(offs[0], [0, 0, 0])


def _brute_table(table_rows, query_rows, offsets, dilation, cap):
    lut = {tuple(r): i for i, r in enumerate(table_rows)}
    out = np.full((len(offsets), len(query_rows)), cap, np.int32)
    for k, o in enumerate(offsets):
        for j, q in enumerate(query_rows):
            key = (q[0], q[1] + o[0] * dilation, q[2] + o[1] * dilation,
                   q[3] + o[2] * dilation)
            out[k, j] = lut.get(key, cap)
    return out


class TestNeighborTable:
    def test_self_table_vs_brute(self, rng):
        n_real, cap = 60, 80
        coords = np.unique(
            rng.randint(-5, 5, size=(n_real, 3)).astype(np.int32), axis=0
        )
        n_real = len(coords)
        batch = np.zeros(n_real, np.int32)
        grid = collate_to_grid([coords], [np.ones((n_real, 1), np.float32)], cap)
        offs = kernel_offsets(3)
        table = np.asarray(
            neighbor_table(
                grid.coords, grid.batch, grid.valid,
                grid.coords, grid.batch, grid.valid,
                offs, 1,
            )
        )
        rows = np.concatenate([batch[:, None], coords], axis=1)
        expect = _brute_table(rows, rows, offs, 1, cap)
        np.testing.assert_array_equal(table[:, :n_real], expect)
        # padding queries must all miss
        assert (table[:, n_real:] == cap).all()

    def test_batch_isolation(self, rng):
        # identical coords in 2 batches must not cross-match
        coords = np.array([[0, 0, 0], [1, 0, 0]], np.int32)
        grid = collate_to_grid(
            [coords, coords],
            [np.ones((2, 1), np.float32)] * 2,
            8,
        )
        offs = kernel_offsets(3)
        table = np.asarray(
            neighbor_table(
                grid.coords, grid.batch, grid.valid,
                grid.coords, grid.batch, grid.valid,
                offs, 1,
            )
        )
        center = 13  # offset (0,0,0)
        np.testing.assert_array_equal(table[center, :4], [0, 1, 2, 3])
        # +x offset: k index for (1,0,0) is 14
        np.testing.assert_array_equal(table[14, :4], [1, 8, 3, 8])


class TestDownsample:
    def test_coarsen(self, rng):
        coords = rng.randint(0, 16, size=(100, 3)).astype(np.int32)
        coords = np.unique(coords, axis=0)
        n = len(coords)
        grid = collate_to_grid([coords], [np.ones((n, 1), np.float32)], 128)
        c, b, v = downsample_coords(
            grid.coords, grid.batch, grid.valid, 1, 128
        )
        c, v = np.asarray(c), np.asarray(v)
        expect = np.unique((coords // 2) * 2, axis=0)
        assert v.sum() == len(expect)
        got = c[v]
        assert _np_keyset([got[:, i] for i in range(3)]) == _np_keyset(
            [expect[:, i] for i in range(3)]
        )
        assert (got % 2 == 0).all()


class TestCoordinateManager:
    def test_unet_maps_shapes(self, rng):
        pts = rng.randn(500, 3).astype(np.float32)
        _, gridc, _ = voxelize_np(pts, 0.1)
        n = len(gridc)
        grid = collate_to_grid([gridc], [np.ones((n, 1), np.float32)], 512)
        mgr = CoordinateManager(num_levels=4)
        maps = mgr.build(grid)
        assert len(maps.levels) == 4
        strides = [lv.stride for lv in maps.levels]
        assert strides == [1, 2, 4, 8]
        for i, lv in enumerate(maps.levels):
            assert lv.self_table.shape[0] == 27
            if i > 0:
                prev = maps.levels[i - 1]
                assert lv.down_table.shape == (27, lv.capacity)
                assert lv.up_table.shape == (27, prev.capacity)
                # every valid coarse voxel must contain >= 1 fine voxel under
                # the center-ish offsets (it was created from one)
                dt = np.asarray(lv.down_table)
                vmask = np.asarray(lv.valid)
                hits = (dt < prev.capacity).any(axis=0)
                assert hits[vmask].all()

    def test_transpose_is_adjoint(self, rng):
        """up_table must be the exact transpose pairing of down_table."""
        pts = rng.randn(200, 3).astype(np.float32)
        _, gridc, _ = voxelize_np(pts, 0.15)
        n = len(gridc)
        grid = collate_to_grid([gridc], [np.ones((n, 1), np.float32)], 256)
        maps = CoordinateManager(num_levels=2).build(grid)
        fine, coarse = maps.levels
        down = np.asarray(coarse.down_table)  # [27, Nc] -> fine idx
        up = np.asarray(coarse.up_table)      # [27, Nf] -> coarse idx
        nc, nf = coarse.capacity, fine.capacity
        pairs_down = {
            (k, int(down[k, i]), i)
            for k in range(27)
            for i in range(nc)
            if down[k, i] < nf
        }
        pairs_up = {
            (k, j, int(up[k, j]))
            for k in range(27)
            for j in range(nf)
            if up[k, j] < nc
        }
        assert pairs_down == pairs_up


class TestCompactKeyBoundaries:
    """Compact single-word key path: boundary and out-of-range behavior."""

    def test_boundary_coords_roundtrip(self):
        from corsair_tpu.core.sparse import pack_key_compact
        import itertools

        vals = [-256, -255, -1, 0, 1, 254, 255]
        coords = np.array(list(itertools.product(vals, repeat=3))[:200],
                          np.int32)
        b = np.zeros(len(coords), np.int32)
        keys = (jnp.asarray(b), jnp.asarray(coords[:, 0]),
                jnp.asarray(coords[:, 1]), jnp.asarray(coords[:, 2]))
        packed = np.asarray(pack_key_compact(keys))
        # injective on in-range keys
        assert len(np.unique(packed)) == len(
            np.unique(coords, axis=0)
        )

    def test_out_of_range_degrades_to_isolated(self):
        """Host collate now REJECTS out-of-range coords loudly (round 2);
        on the device path (no host check possible) coords beyond +-256
        still degrade safely: they map to the sentinel and miss every
        lookup rather than corrupt other rows."""
        import jax.numpy as jnp
        import pytest

        from corsair_tpu.core.coordmap import CoordinateManager
        from corsair_tpu.core.sparse import SparseGrid
        from corsair_tpu.core.voxelize import collate_to_grid

        coords = np.array([
            [0, 0, 0], [1, 0, 0], [300, 300, 300], [-400, 0, 0],
        ], np.int32)
        with pytest.raises(ValueError, match="safe range"):
            collate_to_grid([coords], [np.ones((4, 1), np.float32)], 8)

        pad_c = np.full((8, 3), 2**30, np.int32)
        pad_c[:4] = coords
        grid = SparseGrid(
            coords=jnp.asarray(pad_c),
            batch=jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1], np.int32),
            feats=jnp.asarray(
                np.pad(np.ones((4, 1), np.float32), ((0, 4), (0, 0)))
            ),
            valid=jnp.asarray([True] * 4 + [False] * 4),
            stride=1, num_batches=1,
        )
        maps = CoordinateManager(
            num_levels=1, level_cap_ratios=(1.0,), compact_keys=True
        ).build(grid)
        t = np.asarray(maps.levels[0].self_table)
        # in-range rows see each other
        assert t[13, 0] == 0 and t[14, 0] == 1
        # out-of-range rows never matched by anyone
        assert not (t[:, :2] == 2).any()
        assert not (t[:, :2] == 3).any()
        # and their own queries all miss (center too: sentinel never hits)
        assert (t[:, 2] == 8).all() and (t[:, 3] == 8).all()

    def test_batch_33_falls_back(self, rng):
        """num_batches > 32 must fall back to the (hi, lo) path and stay
        correct."""
        from corsair_tpu.core.coordmap import CoordinateManager
        from corsair_tpu.core.voxelize import collate_to_grid

        clouds = [
            np.unique(rng.randint(-4, 4, (10, 3)).astype(np.int32),
                      axis=0)
            for _ in range(33)
        ]
        feats = [np.ones((len(c), 1), np.float32) for c in clouds]
        grid = collate_to_grid(clouds, feats, 512)
        maps = CoordinateManager(
            num_levels=1, level_cap_ratios=(1.0,), compact_keys=True
        ).build(grid)
        t = np.asarray(maps.levels[0].self_table)
        batch = np.asarray(grid.batch)
        valid = np.asarray(grid.valid)
        # every valid voxel matches itself at the center offset
        rows = np.nonzero(valid)[0]
        np.testing.assert_array_equal(t[13, rows], rows)
        # matches never cross batches
        for k in range(27):
            hits = t[k, rows]
            ok = hits < 512
            assert (batch[hits[ok]] == batch[rows[ok]]).all()
