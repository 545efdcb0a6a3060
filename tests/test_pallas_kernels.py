"""Pallas kernel correctness (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from corsair_tpu.core.kernels.sector_knn import sector_knn_pallas
from corsair_tpu.ops.correspond import _find_kcorr_per_sector_xla


class TestSectorKnnKernel:
    def test_matches_xla(self, rng):
        F0 = rng.randn(300, 16).astype(np.float32)
        F1 = rng.randn(512, 16).astype(np.float32)
        sec = rng.randint(0, 4, 512).astype(np.int32)
        v1 = np.ones(512, bool)
        v1[480:] = False
        idx_p, ok_p = sector_knn_pallas(
            jnp.asarray(F0), jnp.asarray(F1), jnp.asarray(sec), 4, 5,
            v1=jnp.asarray(v1), tile=128, interpret=True,
        )
        idx_x, ok_x = _find_kcorr_per_sector_xla(
            jnp.asarray(F0), jnp.asarray(F1), jnp.asarray(sec), 4, 5,
            v1=jnp.asarray(v1), chunk=128,
        )
        np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
        np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_x))

    def test_k2_sectors(self, rng):
        F0 = rng.randn(100, 8).astype(np.float32)
        F1 = rng.randn(256, 8).astype(np.float32)
        sec = rng.randint(0, 2, 256).astype(np.int32)
        idx_p, ok_p = sector_knn_pallas(
            jnp.asarray(F0), jnp.asarray(F1), jnp.asarray(sec), 2, 5,
            tile=128, interpret=True,
        )
        idx_x, ok_x = _find_kcorr_per_sector_xla(
            jnp.asarray(F0), jnp.asarray(F1), jnp.asarray(sec), 2, 5,
            chunk=128,
        )
        np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))

    def test_empty_sector(self, rng):
        """A sector with no members must report ok=False everywhere."""
        F0 = rng.randn(64, 4).astype(np.float32)
        F1 = rng.randn(128, 4).astype(np.float32)
        sec = np.zeros(128, np.int32)  # everything in sector 0
        idx_p, ok_p = sector_knn_pallas(
            jnp.asarray(F0), jnp.asarray(F1), jnp.asarray(sec), 4, 3,
            tile=64, interpret=True,
        )
        ok_p = np.asarray(ok_p)
        assert ok_p[:, 0, :].all()
        assert not ok_p[:, 1:, :].any()


class TestMinDistKernel:
    def test_matches_reference(self, rng):
        from corsair_tpu.core.kernels.sector_knn import min_dist_pallas
        from scipy.spatial import KDTree

        p0 = rng.randn(300, 3).astype(np.float32)
        p1 = rng.randn(512, 3).astype(np.float32)
        v1 = np.ones(512, bool)
        v1[480:] = False
        d = np.asarray(min_dist_pallas(
            jnp.asarray(p0), jnp.asarray(p1), v1=jnp.asarray(v1),
            tile=128, interpret=True,
        ))
        ref, _ = KDTree(p1[:480]).query(p0, k=1)
        np.testing.assert_allclose(d, ref, rtol=1e-2, atol=1e-3)
