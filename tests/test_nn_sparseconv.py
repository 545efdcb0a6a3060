"""Sparse conv correctness vs brute-force dense reference on tiny grids."""

import jax
import jax.numpy as jnp
import numpy as np

from corsair_tpu.core.coordmap import CoordinateManager, kernel_offsets
from corsair_tpu.core.voxelize import collate_to_grid
from corsair_tpu.nn.layers import sparse_conv


def _dense_sparse_conv(coords, feats, kernel, offsets, out_coords,
                       dilation=1):
    """Brute-force sparse conv: out[i] = sum_k W[k] @ x[at out_coords[i] +
    offsets[k]*dilation]."""
    lut = {tuple(c): i for i, c in enumerate(coords)}
    cout = kernel.shape[2]
    out = np.zeros((len(out_coords), cout), np.float32)
    for i, oc in enumerate(out_coords):
        for k, o in enumerate(offsets):
            key = tuple(oc + o * dilation)
            j = lut.get(key)
            if j is not None:
                out[i] += feats[j] @ kernel[k]
    return out


def _random_grid(rng, n=40, lo=-3, hi=4, cin=4, cap=64):
    coords = np.unique(
        rng.randint(lo, hi, size=(n, 3)).astype(np.int32), axis=0
    )
    n = len(coords)
    feats = rng.randn(n, cin).astype(np.float32)
    grid = collate_to_grid([coords], [feats], cap)
    return coords, feats, grid


class TestSparseConvS1:
    def test_vs_dense(self, rng):
        coords, feats, grid = _random_grid(rng)
        maps = CoordinateManager(num_levels=1, level_cap_ratios=(1.0,)).build(grid)
        offs = kernel_offsets(3)
        kernel = rng.randn(27, 4, 6).astype(np.float32) * 0.1

        out = np.asarray(
            sparse_conv({"kernel": jnp.asarray(kernel)}, grid.feats,
                        maps.levels[0].self_table)
        )
        expect = _dense_sparse_conv(coords, feats, kernel, offs, coords)
        n = len(coords)
        np.testing.assert_allclose(out[:n], expect, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(out[n:], 0, atol=1e-6)


class TestSparseConvStride2:
    def test_vs_dense(self, rng):
        coords, feats, grid = _random_grid(rng)
        maps = CoordinateManager(
            num_levels=2, level_cap_ratios=(1.0, 1.0)
        ).build(grid)
        lvl = maps.levels[1]
        offs = kernel_offsets(3)
        kernel = rng.randn(27, 4, 5).astype(np.float32) * 0.1

        out = np.asarray(
            sparse_conv({"kernel": jnp.asarray(kernel)}, grid.feats,
                        lvl.down_table)
        )
        v = np.asarray(lvl.valid)
        out_coords = np.asarray(lvl.coords)[v]
        expect = _dense_sparse_conv(coords, feats, kernel, offs, out_coords, 1)
        np.testing.assert_allclose(out[v], expect, rtol=1e-4, atol=1e-5)

    def test_transpose_vs_dense(self, rng):
        coords, feats, grid = _random_grid(rng)
        maps = CoordinateManager(
            num_levels=2, level_cap_ratios=(1.0, 1.0)
        ).build(grid)
        fine, coarse = maps.levels
        offs = kernel_offsets(3)
        cv = np.asarray(coarse.valid)
        coarse_coords = np.asarray(coarse.coords)[cv]
        nc = cv.sum()
        cfeats = rng.randn(coarse.capacity, 3).astype(np.float32)
        cfeats[~cv] = 0
        kernel = rng.randn(27, 3, 5).astype(np.float32) * 0.1

        out = np.asarray(
            sparse_conv({"kernel": jnp.asarray(kernel)},
                        jnp.asarray(cfeats), coarse.up_table)
        )
        # transpose conv: fine output x gathers coarse input at x - o*t_fine
        expect = _dense_sparse_conv(
            coarse_coords, cfeats[cv], kernel, -offs, coords, 1
        )
        n = len(coords)
        np.testing.assert_allclose(out[:n], expect, rtol=1e-4, atol=1e-5)

    def test_adjointness(self, rng):
        """<conv(x), y> == <x, conv_T(y)> when conv_T uses the mirrored
        kernel — the defining property of the transpose convolution."""
        coords, feats, grid = _random_grid(rng, cin=3)
        maps = CoordinateManager(
            num_levels=2, level_cap_ratios=(1.0, 1.0)
        ).build(grid)
        fine, coarse = maps.levels
        kernel = rng.randn(27, 3, 4).astype(np.float32)

        down = np.asarray(
            sparse_conv({"kernel": jnp.asarray(kernel)}, grid.feats,
                        coarse.down_table)
        )  # [Nc, 4]
        y = rng.randn(*down.shape).astype(np.float32)
        y[~np.asarray(coarse.valid)] = 0

        # up with kernel transposed on channel axes
        kt = np.transpose(kernel, (0, 2, 1))
        up = np.asarray(
            sparse_conv({"kernel": jnp.asarray(kt)}, jnp.asarray(y),
                        coarse.up_table)
        )  # [Nf, 3]
        lhs = float(np.sum(down * y))
        rhs = float(np.sum(np.asarray(grid.feats) * up))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-3)
