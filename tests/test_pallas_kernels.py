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

    def test_include_global_slot0(self, rng):
        """include_global=True: slot 0 must equal the direct global
        top-k (find_kcorr) and slots 1..S the plain per-sector result."""
        from corsair_tpu.ops.correspond import _find_kcorr_xla

        F0 = rng.randn(200, 16).astype(np.float32)
        F1 = rng.randn(384, 16).astype(np.float32)
        sec = rng.randint(0, 4, 384).astype(np.int32)
        v1 = np.ones(384, bool)
        v1[360:] = False
        idx_g, ok_g = sector_knn_pallas(
            jnp.asarray(F0), jnp.asarray(F1), jnp.asarray(sec), 4, 5,
            v1=jnp.asarray(v1), tile=128, interpret=True,
            include_global=True,
        )
        assert idx_g.shape == (200, 5, 5)
        # slot 0 == direct global top-k
        ref_global = _find_kcorr_xla(
            jnp.asarray(F0), jnp.asarray(F1), 5, jnp.asarray(v1),
            chunk=128,
        )
        np.testing.assert_array_equal(
            np.asarray(idx_g[:, 0]), np.asarray(ref_global)
        )
        assert np.asarray(ok_g)[:, 0].all()
        # slots 1.. == plain per-sector call
        idx_p, ok_p = sector_knn_pallas(
            jnp.asarray(F0), jnp.asarray(F1), jnp.asarray(sec), 4, 5,
            v1=jnp.asarray(v1), tile=128, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(idx_g[:, 1:]), np.asarray(idx_p)
        )
        np.testing.assert_array_equal(
            np.asarray(ok_g[:, 1:]), np.asarray(ok_p)
        )
        # XLA fallback path agrees too
        idx_x, ok_x = _find_kcorr_per_sector_xla(
            jnp.asarray(F0), jnp.asarray(F1), jnp.asarray(sec), 4, 5,
            v1=jnp.asarray(v1), chunk=128, include_global=True,
        )
        np.testing.assert_array_equal(np.asarray(idx_g), np.asarray(idx_x))

    def test_slab_matches_fused(self, rng):
        """Equal-width slab kernel == fused full-width kernel, global
        slot included (near-balanced sectors -> slab path)."""
        from corsair_tpu.core.kernels.sector_knn import (
            slab_sector_knn_pallas,
        )

        F0 = rng.randn(200, 16).astype(np.float32)
        F1 = rng.randn(512, 16).astype(np.float32)
        sec = rng.randint(0, 4, 512).astype(np.int32)
        v1 = np.ones(512, bool)
        v1[490:] = False
        idx_s, ok_s, spill = slab_sector_knn_pallas(
            jnp.asarray(F0), jnp.asarray(F1), jnp.asarray(sec), 4, 5,
            v1=jnp.asarray(v1), tile=128, interpret=True,
        )
        assert not bool(spill)
        idx_f, ok_f = sector_knn_pallas(
            jnp.asarray(F0), jnp.asarray(F1), jnp.asarray(sec), 4, 5,
            v1=jnp.asarray(v1), tile=128, interpret=True,
            include_global=True,
        )
        # The slab kernel's bit-packed extraction quantizes d2 to
        # bound/2^17 absolute before ranking (sector_knn.py
        # _kernel_slab): picks may swap ONLY between neighbors whose
        # true distances are within that tolerance — assert index
        # equality except where both picks are distance-equivalent.
        idx_s, ok_s = np.asarray(idx_s), np.asarray(ok_s)
        idx_f, ok_f = np.asarray(idx_f), np.asarray(ok_f)
        np.testing.assert_array_equal(ok_s, ok_f)
        d2 = ((F0[:, None, :] - F1[None, :, :]) ** 2).sum(-1)
        rows = np.arange(len(F0))[:, None, None]
        gap = np.abs(d2[rows, idx_s] - d2[rows, idx_f])
        bound = (np.linalg.norm(F0, axis=1).max()
                 + np.linalg.norm(F1, axis=1).max()) ** 2
        mism = idx_s != idx_f
        assert mism.mean() < 0.01, mism.mean()
        assert gap[mism].max() <= 2.5 * bound / 2**17 if mism.any() \
            else True

    def test_slab_overflow_sets_spill_global_exact(self, rng):
        """A sector larger than its slab: spill flag raised, the GLOBAL
        slot still exact (it scans the full-width region), and the
        non-overflowing sectors still match the fused kernel."""
        from corsair_tpu.core.kernels.sector_knn import (
            slab_sector_knn_pallas,
        )

        F0 = rng.randn(100, 8).astype(np.float32)
        F1 = rng.randn(512, 8).astype(np.float32)
        sec = np.zeros(512, np.int32)
        sec[:40] = rng.randint(1, 4, 40)  # sector 0 holds ~92%
        idx_s, ok_s, spill = slab_sector_knn_pallas(
            jnp.asarray(F0), jnp.asarray(F1), jnp.asarray(sec), 4, 3,
            tile=128, alpha=1.5, interpret=True,
        )
        assert bool(spill)
        idx_f, ok_f = sector_knn_pallas(
            jnp.asarray(F0), jnp.asarray(F1), jnp.asarray(sec), 4, 3,
            tile=128, interpret=True, include_global=True,
        )
        np.testing.assert_array_equal(
            np.asarray(idx_s[:, 0]), np.asarray(idx_f[:, 0])
        )
        # sectors 1..3 (small, fit their slabs) still exact
        np.testing.assert_array_equal(
            np.asarray(idx_s[:, 2:]), np.asarray(idx_f[:, 2:])
        )

    def test_merged_matches_fused(self, rng):
        """Merged-global slab kernel == fused kernel (all slots), up to
        bit-pack quantization ties (same tolerance as the slab test)."""
        from corsair_tpu.core.kernels.sector_knn import (
            merged_slab_sector_knn_pallas,
        )

        F0 = rng.randn(200, 16).astype(np.float32)
        F1 = rng.randn(512, 16).astype(np.float32)
        sec = rng.randint(0, 4, 512).astype(np.int32)
        v1 = np.ones(512, bool)
        v1[490:] = False
        idx_m, ok_m, spill = merged_slab_sector_knn_pallas(
            jnp.asarray(F0), jnp.asarray(F1), jnp.asarray(sec), 4, 5,
            v1=jnp.asarray(v1), tile=128, interpret=True,
        )
        assert not bool(spill)
        idx_f, ok_f = sector_knn_pallas(
            jnp.asarray(F0), jnp.asarray(F1), jnp.asarray(sec), 4, 5,
            v1=jnp.asarray(v1), tile=128, interpret=True,
            include_global=True,
        )
        idx_m, ok_m = np.asarray(idx_m), np.asarray(ok_m)
        idx_f, ok_f = np.asarray(idx_f), np.asarray(ok_f)
        np.testing.assert_array_equal(ok_m, ok_f)
        d2 = ((F0[:, None, :] - F1[None, :, :]) ** 2).sum(-1)
        rows = np.arange(len(F0))[:, None, None]
        gap = np.abs(d2[rows, idx_m] - d2[rows, idx_f])
        bound = (np.linalg.norm(F0, axis=1).max()
                 + np.linalg.norm(F1, axis=1).max()) ** 2
        mism = idx_m != idx_f
        assert mism.mean() < 0.02, mism.mean()
        if mism.any():
            assert gap[mism].max() <= 2.5 * bound / 2**17

    def test_merged_overflow_global_exact(self, rng):
        """On spill the merged kernel's GLOBAL slot must still cover
        every valid target (overflow slab scanned): neighbor distances
        match the fused kernel's global slot."""
        from corsair_tpu.core.kernels.sector_knn import (
            merged_slab_sector_knn_pallas,
        )

        F0 = rng.randn(100, 8).astype(np.float32)
        F1 = rng.randn(512, 8).astype(np.float32)
        sec = np.zeros(512, np.int32)
        sec[:40] = rng.randint(1, 4, 40)  # sector 0 holds ~92%
        idx_m, ok_m, spill = merged_slab_sector_knn_pallas(
            jnp.asarray(F0), jnp.asarray(F1), jnp.asarray(sec), 4, 3,
            tile=128, alpha=1.5, interpret=True,
        )
        assert bool(spill)
        idx_f, ok_f = sector_knn_pallas(
            jnp.asarray(F0), jnp.asarray(F1), jnp.asarray(sec), 4, 3,
            tile=128, interpret=True, include_global=True,
        )
        idx_m = np.asarray(idx_m)
        idx_f = np.asarray(idx_f)
        d2 = ((F0[:, None, :] - F1[None, :, :]) ** 2).sum(-1)
        rows = np.arange(len(F0))[:, None]
        gap = np.abs(d2[rows, idx_m[:, 0]] - d2[rows, idx_f[:, 0]])
        bound = (np.linalg.norm(F0, axis=1).max()
                 + np.linalg.norm(F1, axis=1).max()) ** 2
        assert gap.max() <= 2.5 * bound / 2**17

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

    def test_chunked_target_axis(self, rng):
        """n1 > chunk exercises the running-min loop AND a non-zero
        padded tail (the tail must be masked out, not matched). This is
        the protocol-scale regime (cap=16384 > one-chunk VMEM budget)."""
        from corsair_tpu.core.kernels.sector_knn import min_dist_pallas
        from scipy.spatial import KDTree

        p0 = rng.randn(100, 3).astype(np.float32)
        p1 = rng.randn(1000, 3).astype(np.float32)
        v1 = np.ones(1000, bool)
        v1[900:] = False
        d = np.asarray(min_dist_pallas(
            jnp.asarray(p0), jnp.asarray(p1), v1=jnp.asarray(v1),
            tile=128, chunk=384, interpret=True,
        ))
        ref, _ = KDTree(p1[:900]).query(p0, k=1)
        np.testing.assert_allclose(d, ref, rtol=1e-5, atol=1e-6)


class TestRansacScoreKernel:
    def test_matches_reference(self, rng):
        from corsair_tpu.core.kernels.ransac_score import ransac_score_pallas
        from corsair_tpu.ops.transforms import random_rotation

        m, h = 500, 96
        src = rng.randn(m, 3).astype(np.float32)
        valid = np.ones(m, bool)
        valid[450:] = False
        Ts = []
        for _ in range(h):
            _, T = random_rotation(np.zeros((1, 3)), rng)
            Ts.append(T)
        Ts = np.stack(Ts).astype(np.float32)
        dst = (src @ Ts[0][:3, :3].T + Ts[0][:3, 3]).astype(np.float32)
        dst += rng.randn(m, 3).astype(np.float32) * 0.05

        counts, sse = ransac_score_pallas(
            jnp.asarray(Ts), jnp.asarray(src), jnp.asarray(dst),
            jnp.asarray(valid), 0.2, tile=32, interpret=True,
        )
        counts, sse = np.asarray(counts), np.asarray(sse)
        # reference computation
        for i in (0, 1, h - 1):
            moved = src @ Ts[i][:3, :3].T + Ts[i][:3, 3]
            d2 = ((moved - dst) ** 2).sum(1)
            inl = (d2 <= 0.04) & valid
            assert counts[i] == inl.sum()
            np.testing.assert_allclose(sse[i], d2[inl].sum(), rtol=1e-4)
        # hypothesis 0 is the true pose: must dominate
        assert counts[0] == 450


class TestRansacScoreMulti:
    def test_matches_scalar_scorer(self, rng):
        """Folded multi-candidate scoring == per-pose reference scorer."""
        from corsair_tpu.core.kernels.ransac_score import (
            ransac_score_multi_pallas,
        )
        from corsair_tpu.ops.ransac import _score_all

        C, H, M = 4, 16, 700
        src = jnp.asarray(rng.randn(M, 3).astype(np.float32))
        dsts = jnp.asarray(rng.randn(C, M, 3).astype(np.float32))
        valids = jnp.asarray(rng.rand(C, M) > 0.3)
        keys = jax.random.split(jax.random.PRNGKey(0), C * H)
        Rm = jax.vmap(lambda k: jax.random.orthogonal(k, 3))(keys)
        Ts = jnp.tile(jnp.eye(4)[None], (C * H, 1, 1))
        Ts = Ts.at[:, :3, :3].set(Rm).reshape(C, H, 4, 4)
        cm, sm = ransac_score_multi_pallas(
            Ts, src, dsts, valids, 0.4, interpret=True
        )
        rc, rs = jax.vmap(
            lambda Tc, d, v: jax.vmap(
                lambda T: _score_all(T, src, d, v, jnp.float32(0.16))
            )(Tc)
        )(Ts, dsts, valids)
        np.testing.assert_array_equal(np.asarray(cm), np.asarray(rc))
        np.testing.assert_allclose(np.asarray(sm), np.asarray(rs),
                                   atol=1e-5)


class TestRansacMulti:
    def test_recovers_known_poses(self, rng):
        """Each folded candidate recovers its own ground-truth rigid
        transform despite 40% outliers + padding."""
        from corsair_tpu.ops.ransac import (
            RansacConfig,
            ransac_correspondences_multi,
        )
        from corsair_tpu.ops.transforms import random_rotation

        M, C = 600, 3
        src = rng.randn(M, 3).astype(np.float32)
        dsts, valids, Ts_true = [], [], []
        for ci in range(C):
            d, T = random_rotation(src, rng)
            d = np.asarray(d, np.float32)
            out = rng.rand(M) < 0.4
            d[out] += rng.randn(int(out.sum()), 3) * 2
            v = np.ones(M, bool)
            v[-60:] = False
            dsts.append(d)
            valids.append(v)
            Ts_true.append(T)
        cfg = RansacConfig(num_hypotheses=512, sample_size=10,
                           max_corr_dist=0.1)
        Ts, counts, rmses = ransac_correspondences_multi(
            jax.random.PRNGKey(3), jnp.asarray(src),
            jnp.asarray(np.stack(dsts)), jnp.asarray(np.stack(valids)),
            cfg,
        )
        for ci in range(C):
            np.testing.assert_allclose(
                np.asarray(Ts[ci]), Ts_true[ci], atol=2e-2,
                err_msg=f"candidate {ci}",
            )
            assert float(counts[ci]) > 250


class TestRansacScoreMatmul:
    def test_matches_scalar_scorer(self, rng):
        """MXU-matmul decomposition (|Rs+t-d|^2 = base + psi.phi) matches
        the direct scorer: counts exactly, SSE to f32 roundoff."""
        from corsair_tpu.core.kernels.ransac_score import (
            ransac_score_matmul_pallas,
        )
        from corsair_tpu.ops.ransac import _score_all

        C, H, M = 3, 16, 600
        src = jnp.asarray(rng.randn(M, 3).astype(np.float32))
        dsts = jnp.asarray(rng.randn(C, M, 3).astype(np.float32))
        valids = jnp.asarray(rng.rand(C, M) > 0.3)
        keys = jax.random.split(jax.random.PRNGKey(0), C * H)
        Rm = jax.vmap(lambda k: jax.random.orthogonal(k, 3))(keys)
        tv = jax.random.normal(jax.random.PRNGKey(1), (C * H, 3))
        Ts = jnp.tile(jnp.eye(4)[None], (C * H, 1, 1))
        Ts = Ts.at[:, :3, :3].set(Rm).at[:, :3, 3].set(tv)
        Ts = Ts.reshape(C, H, 4, 4)
        cm, sm = ransac_score_matmul_pallas(
            Ts, src, dsts, valids, 0.9, interpret=True
        )
        rc, rs = jax.vmap(
            lambda Tc, d, v: jax.vmap(
                lambda T: _score_all(T, src, d, v, jnp.float32(0.81))
            )(Tc)
        )(Ts, dsts, valids)
        assert np.abs(np.asarray(cm) - np.asarray(rc)).max() <= 1
        np.testing.assert_allclose(np.asarray(sm), np.asarray(rs),
                                   rtol=1e-4, atol=1e-4)


class TestSectorKnnSorted:
    def test_matches_xla_reference(self, rng, monkeypatch):
        """Chunk-skipping sector-sorted kernel (dispatched through
        find_kcorr_per_sector with use_pallas=True) matches the XLA
        path: indices equal where valid, ok flags equal everywhere."""
        from corsair_tpu.ops.correspond import (
            _find_kcorr_per_sector_xla,
            find_kcorr_per_sector,
        )

        N0, N1, D, S, K = 96, 4608, 8, 4, 5
        F0 = jnp.asarray(rng.randn(N0, D).astype(np.float32))
        F1 = jnp.asarray(rng.randn(N1, D).astype(np.float32))
        sec = rng.randint(0, S, N1).astype(np.int32)
        sec[rng.rand(N1) < 0.7] = 0        # unbalanced sectors
        sec[sec == 3] = 0                  # sector 3 empty
        v1 = rng.rand(N1) > 0.2
        secj, v1j = jnp.asarray(sec), jnp.asarray(v1)

        # knob is read once at import (advisor r3) -> patch the constant
        import corsair_tpu.ops.correspond as corr_mod

        monkeypatch.setattr(corr_mod, "_SORTED_KNN_ENV", True)
        idx_p, ok_p = find_kcorr_per_sector(
            F0, F1, secj, S, K, v1=v1j, use_pallas=True
        )
        idx_r, ok_r = _find_kcorr_per_sector_xla(
            F0, F1, secj, S, K, v1=v1j
        )
        ok_p, ok_r = np.asarray(ok_p), np.asarray(ok_r)
        np.testing.assert_array_equal(ok_p, ok_r)
        np.testing.assert_array_equal(
            np.asarray(idx_p)[ok_p], np.asarray(idx_r)[ok_r]
        )

    def test_small_sector_counts(self, rng, monkeypatch):
        """Sectors with fewer than k valid members: ok flags must mark
        exactly the first count extractions."""
        from corsair_tpu.ops.correspond import find_kcorr_per_sector

        N0, N1, D, S, K = 32, 4096, 8, 4, 5
        F0 = jnp.asarray(rng.randn(N0, D).astype(np.float32))
        F1 = jnp.asarray(rng.randn(N1, D).astype(np.float32))
        sec = np.zeros(N1, np.int32)
        sec[:3] = 1                        # sector 1 has exactly 3
        sec[3:5] = 2                       # sector 2 has exactly 2
        v1 = np.ones(N1, bool)
        import corsair_tpu.ops.correspond as corr_mod

        monkeypatch.setattr(corr_mod, "_SORTED_KNN_ENV", True)
        idx, ok = find_kcorr_per_sector(
            F0, F1, jnp.asarray(sec), S, K, v1=jnp.asarray(v1),
            use_pallas=True,
        )
        ok = np.asarray(ok)
        assert ok[:, 1, :3].all() and not ok[:, 1, 3:].any()
        assert ok[:, 2, :2].all() and not ok[:, 2, 2:].any()
        assert not ok[:, 3, :].any()


class TestSubkExtraction:
    """Sub-k-pass candidate extraction in the merged slab kernel
    (``_subk_topk``): bucketed top-2 candidates + count-verify with an
    in-kernel exact fallback."""

    def _check(self, rng, F0, F1, sec, v1, k=5):
        from corsair_tpu.core.kernels.sector_knn import (
            merged_slab_sector_knn_pallas,
        )

        args = (jnp.asarray(F0), jnp.asarray(F1), jnp.asarray(sec), 4, k)
        kw = dict(v1=jnp.asarray(v1), tile=128, interpret=True)
        idx_s, ok_s, sp_s = merged_slab_sector_knn_pallas(
            *args, **kw, subk=True
        )
        idx_e, ok_e, sp_e = merged_slab_sector_knn_pallas(
            *args, **kw, subk=False
        )
        np.testing.assert_array_equal(np.asarray(ok_s), np.asarray(ok_e))
        assert bool(sp_s) == bool(sp_e)
        # quantization-tolerant value parity (same class as the other
        # merged tests: quasi-ties may reorder within the bit-pack tol)
        d2 = ((F0[:, None, :] - F1[None, :, :]) ** 2).sum(-1)
        rows = np.arange(len(F0))[:, None, None]
        gap = np.abs(d2[rows, np.asarray(idx_s)]
                     - d2[rows, np.asarray(idx_e)])
        bound = (np.linalg.norm(F0, axis=1).max()
                 + np.linalg.norm(F1, axis=1).max()) ** 2
        ok = np.asarray(ok_e).astype(bool)
        assert gap[ok].max() <= 2.5 * bound / 2**17

    def test_subk_matches_exact(self, rng):
        F0 = rng.randn(200, 16).astype(np.float32)
        F1 = rng.randn(2048, 16).astype(np.float32)
        F0 /= np.linalg.norm(F0, axis=1, keepdims=True)
        F1 /= np.linalg.norm(F1, axis=1, keepdims=True)
        sec = rng.randint(0, 4, 2048).astype(np.int32)
        v1 = np.ones(2048, bool)
        v1[2000:] = False
        self._check(rng, F0, F1, sec, v1)

    def test_subk_clustered_ties_fallback(self, rng):
        """Tightly clustered features force quantized-key pileups (the
        count-verify must trip and the exact fallback take over)."""
        base = rng.randn(16).astype(np.float32)
        F0 = base[None] + 0.01 * rng.randn(128, 16).astype(np.float32)
        F1 = base[None] + 0.01 * rng.randn(1024, 16).astype(np.float32)
        F0 /= np.linalg.norm(F0, axis=1, keepdims=True)
        F1 /= np.linalg.norm(F1, axis=1, keepdims=True)
        sec = rng.randint(0, 4, 1024).astype(np.int32)
        self._check(rng, F0, F1, sec, np.ones(1024, bool))

    def test_subk_sparse_sector(self, rng):
        """A sector with fewer than k valid members trips the verify
        (its k-th candidate is the sentinel) -> exact fallback; ok
        flags unchanged."""
        F0 = rng.randn(64, 16).astype(np.float32)
        F1 = rng.randn(1024, 16).astype(np.float32)
        sec = np.zeros(1024, np.int32)
        sec[:3] = 1
        sec[3:300] = rng.randint(2, 4, 297)
        self._check(rng, F0, F1, sec, np.ones(1024, bool), k=5)
