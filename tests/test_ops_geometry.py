"""Tests for kNN, Chamfer, Kabsch, RANSAC, KMeans, pose metrics."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial import KDTree

from corsair_tpu.ops import (
    RansacConfig,
    apply_transform,
    chamfer_1direction,
    chamfer_bidirectional,
    chamfer_max,
    eval_pose,
    find_knn,
    find_nn,
    kabsch_umeyama,
    kmeans_lloyd,
    random_rotation,
    ransac_correspondences,
    to_T,
)
from corsair_tpu.ops.chamfer import chamfer_matrix
from corsair_tpu.ops.pose_metrics import eval_pose_batch
from corsair_tpu.ops.transforms import euler_xyz_mat


class TestKnn:
    def test_vs_kdtree(self, rng):
        f0 = rng.randn(300, 16).astype(np.float32)
        f1 = rng.randn(400, 16).astype(np.float32)
        tree = KDTree(f1)
        d_ref, i_ref = tree.query(f0, k=1)
        idx, dist = find_nn(jnp.asarray(f0), jnp.asarray(f1), chunk=128)
        np.testing.assert_array_equal(np.asarray(idx), i_ref)
        np.testing.assert_allclose(np.asarray(dist), d_ref, rtol=1e-2, atol=1e-2)

    def test_knn_vs_kdtree(self, rng):
        f0 = rng.randn(100, 8).astype(np.float32)
        f1 = rng.randn(150, 8).astype(np.float32)
        tree = KDTree(f1)
        d_ref, i_ref = tree.query(f0, k=5)
        idx, dist = find_knn(jnp.asarray(f0), jnp.asarray(f1), k=5, chunk=64)
        np.testing.assert_array_equal(np.asarray(idx), i_ref)
        np.testing.assert_allclose(np.asarray(dist), d_ref, rtol=1e-2, atol=1e-2)

    def test_masked_targets(self, rng):
        f0 = rng.randn(10, 4).astype(np.float32)
        f1 = rng.randn(20, 4).astype(np.float32)
        t_valid = np.zeros(20, bool)
        t_valid[:7] = True
        tree = KDTree(f1[:7])
        _, i_ref = tree.query(f0, k=1)
        idx, _ = find_nn(
            jnp.asarray(f0), jnp.asarray(f1), t_valid=jnp.asarray(t_valid),
            chunk=16,
        )
        np.testing.assert_array_equal(np.asarray(idx), i_ref)


class TestChamfer:
    def test_1direction_vs_kdtree(self, rng):
        p0 = rng.randn(200, 3).astype(np.float32)
        p1 = rng.randn(300, 3).astype(np.float32)
        tree = KDTree(p1)
        dd, _ = tree.query(p0, k=1)
        ref = dd.mean()
        got = float(chamfer_1direction(jnp.asarray(p0), jnp.asarray(p1),
                                       chunk=64))
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_bidirectional_symmetry(self, rng):
        p0 = rng.randn(50, 3).astype(np.float32)
        p1 = rng.randn(60, 3).astype(np.float32)
        a = float(chamfer_bidirectional(jnp.asarray(p0), jnp.asarray(p1)))
        b = float(chamfer_bidirectional(jnp.asarray(p1), jnp.asarray(p0)))
        np.testing.assert_allclose(a, b, rtol=1e-5)

    def test_chamfer_max(self, rng):
        p0 = rng.randn(40, 3).astype(np.float32)
        p1 = rng.randn(50, 3).astype(np.float32)
        t0, t1 = KDTree(p0), KDTree(p1)
        m0 = max(t1.query(p0[i], k=1)[0] for i in range(40))
        m1 = max(t0.query(p1[i], k=1)[0] for i in range(50))
        ref = max(m0, m1)
        got = float(chamfer_max(jnp.asarray(p0), jnp.asarray(p1)))
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_matrix(self, rng):
        pcs = rng.randn(4, 64, 3).astype(np.float32)
        mat = np.asarray(chamfer_matrix(jnp.asarray(pcs), chunk=64))
        assert mat.shape == (4, 4)
        np.testing.assert_allclose(mat, mat.T, rtol=1e-5)
        np.testing.assert_allclose(np.diag(mat), 0, atol=1e-6)
        ref01 = float(
            chamfer_bidirectional(jnp.asarray(pcs[0]), jnp.asarray(pcs[1]))
        )
        np.testing.assert_allclose(mat[0, 1], ref01, rtol=1e-5)


class TestKabsch:
    def test_exact_recovery(self, rng):
        src = rng.randn(50, 3).astype(np.float32)
        moved, T = random_rotation(src, rng)
        T_est = np.asarray(kabsch_umeyama(jnp.asarray(src), jnp.asarray(moved)))
        np.testing.assert_allclose(T_est, T, atol=1e-4)

    def test_weighted(self, rng):
        src = rng.randn(60, 3).astype(np.float32)
        moved, T = random_rotation(src, rng)
        # corrupt 20 points, zero their weights
        moved_bad = moved.copy()
        moved_bad[40:] += rng.randn(20, 3) * 5
        w = np.ones(60, np.float32)
        w[40:] = 0.0
        T_est = np.asarray(
            kabsch_umeyama(jnp.asarray(src), jnp.asarray(moved_bad),
                           jnp.asarray(w))
        )
        np.testing.assert_allclose(T_est, T, atol=1e-4)

    def test_det_positive_degenerate(self):
        src = jnp.zeros((10, 3))
        dst = jnp.zeros((10, 3))
        T = np.asarray(kabsch_umeyama(src, dst))
        assert np.linalg.det(T[:3, :3]) > 0

    def test_lanes_matches_vmapped_quaternion(self, rng):
        """The lane-major batched Horn solve (hypothesis batch in the
        minor dim, all-elementwise VPU ops) is the same math as the
        per-sample quaternion solve."""
        import jax

        from corsair_tpu.ops.kabsch import (
            kabsch_quaternion,
            kabsch_quaternion_lanes,
        )

        B, s = 193, 10
        src = jnp.asarray(rng.randn(B, s, 3).astype(np.float32))
        dst = jnp.asarray(rng.randn(B, s, 3).astype(np.float32))
        w = jnp.asarray((rng.rand(B, s) > 0.2).astype(np.float32))
        ref = jax.vmap(kabsch_quaternion)(src, dst, w)
        out = kabsch_quaternion_lanes(src, dst, w)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-6)


class TestRansac:
    def test_recovers_pose_with_outliers(self, rng):
        n = 500
        src = rng.randn(n, 3).astype(np.float32)
        moved, T = random_rotation(src, rng)
        dst = moved + rng.randn(n, 3).astype(np.float32) * 0.01
        # 40% outliers
        n_out = int(0.4 * n)
        dst[:n_out] = rng.randn(n_out, 3) * 2
        valid = np.ones(n, bool)

        cfg = RansacConfig(num_hypotheses=1024, sample_size=10,
                           max_corr_dist=0.1)
        T_est, count, rmse = ransac_correspondences(
            jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(dst),
            jnp.asarray(valid), cfg,
        )
        T_est = np.asarray(T_est)
        t_err, r_err = eval_pose(T_est, np.eye(4), T)
        assert r_err < np.deg2rad(3), f"rotation error {np.rad2deg(r_err)}"
        assert t_err < 0.05
        assert int(count) >= 0.5 * (n - n_out)

    def test_respects_padding(self, rng):
        n = 200
        src = rng.randn(n, 3).astype(np.float32)
        moved, T = random_rotation(src, rng)
        # padding rows contain garbage
        src_pad = np.concatenate([src, rng.randn(50, 3) * 100]).astype(
            np.float32
        )
        dst_pad = np.concatenate([moved, rng.randn(50, 3) * 100]).astype(
            np.float32
        )
        valid = np.zeros(n + 50, bool)
        valid[:n] = True
        cfg = RansacConfig(num_hypotheses=512, max_corr_dist=0.05)
        T_est, _, _ = ransac_correspondences(
            jax.random.PRNGKey(1), jnp.asarray(src_pad), jnp.asarray(dst_pad),
            jnp.asarray(valid), cfg,
        )
        t_err, r_err = eval_pose(np.asarray(T_est), np.eye(4), T)
        assert r_err < np.deg2rad(3)

    def test_deterministic(self, rng):
        src = rng.randn(100, 3).astype(np.float32)
        dst = rng.randn(100, 3).astype(np.float32)
        valid = jnp.ones(100, bool)
        cfg = RansacConfig(num_hypotheses=256)
        T1, _, _ = ransac_correspondences(
            jax.random.PRNGKey(7), jnp.asarray(src), jnp.asarray(dst), valid,
            cfg,
        )
        T2, _, _ = ransac_correspondences(
            jax.random.PRNGKey(7), jnp.asarray(src), jnp.asarray(dst), valid,
            cfg,
        )
        np.testing.assert_array_equal(np.asarray(T1), np.asarray(T2))


class TestKMeans:
    def test_separated_clusters(self, rng):
        c0 = rng.randn(50, 3) * 0.1 + np.array([5, 0, 0])
        c1 = rng.randn(50, 3) * 0.1 + np.array([-5, 0, 0])
        pts = np.concatenate([c0, c1]).astype(np.float32)
        valid = np.ones(100, bool)
        centers, labels, inertia = kmeans_lloyd(
            jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(valid), k=2,
        )
        labels = np.asarray(labels)
        assert len(np.unique(labels[:50])) == 1
        assert len(np.unique(labels[50:])) == 1
        assert labels[0] != labels[50]
        centers = np.asarray(centers)
        got = sorted(centers[:, 0].tolist())
        np.testing.assert_allclose(got, [-5, 5], atol=0.2)

    def test_padding_ignored(self, rng):
        pts = np.concatenate([
            rng.randn(30, 3) * 0.1 + 3,
            rng.randn(30, 3) * 0.1 - 3,
            np.full((40, 3), 1e6),  # padding garbage
        ]).astype(np.float32)
        valid = np.zeros(100, bool)
        valid[:60] = True
        centers, _, _ = kmeans_lloyd(
            jax.random.PRNGKey(1), jnp.asarray(pts), jnp.asarray(valid), k=2,
        )
        assert np.abs(np.asarray(centers)).max() < 10

    def test_lane_major_fits_match_vmapped(self, rng):
        """kmeans_lloyd_fits (the symmetric cut's lane-major batched
        Lloyd) reproduces vmap(kmeans_lloyd) per fit: same restart
        seeds, same argmin tie-breaking, reduction-order-only deltas."""
        from corsair_tpu.ops.kmeans import kmeans_lloyd_fits

        F, N, K = 23, 50, 4
        pts = jnp.asarray(rng.randn(F, N, 3).astype(np.float32))
        valid = jnp.asarray(rng.rand(F, N) > 0.2)
        keys = jax.random.split(jax.random.PRNGKey(3), F)
        c1, l1, i1 = jax.vmap(
            lambda k_, p, v: kmeans_lloyd(k_, p, v, K, iters=25,
                                          n_init=10)
        )(keys, pts, valid)
        c2, l2, i2 = kmeans_lloyd_fits(keys, pts, valid, K, iters=25,
                                       n_init=10)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(i1), np.asarray(i2),
                                   rtol=1e-5)
        assert (np.asarray(l1) == np.asarray(l2)).mean() > 0.999


class TestPoseMetrics:
    def test_identity(self):
        t, r = eval_pose(np.eye(4), np.eye(4), np.eye(4), 1)
        assert t == 0 and r == 0

    def test_symmetry_forgives_y_rotation(self):
        rot = np.eye(4)
        rot[:3, :3] = euler_xyz_mat(0.0, np.pi / 2, 0.0)
        # estimate off by a 90deg y-rotation: sym=4 forgives, sym=1 doesn't
        t4, r4 = eval_pose(rot, np.eye(4), np.eye(4), 4)
        t1, r1 = eval_pose(rot, np.eye(4), np.eye(4), 1)
        assert r4 < 1e-5
        assert abs(r1 - np.pi / 2) < 1e-5

    def test_batch_matches_scalar(self, rng):
        B = 8
        Ts_est, T0s, T1s, syms = [], [], [], []
        for i in range(B):
            _, Te = random_rotation(np.zeros((1, 3)), rng)
            _, T0 = random_rotation(np.zeros((1, 3)), rng)
            _, T1 = random_rotation(np.zeros((1, 3)), rng)
            Ts_est.append(Te), T0s.append(T0), T1s.append(T1)
            syms.append([1, 2, 4, 12][i % 4])
        t_b, r_b = eval_pose_batch(
            jnp.asarray(np.stack(Ts_est), jnp.float32),
            jnp.asarray(np.stack(T0s), jnp.float32),
            jnp.asarray(np.stack(T1s), jnp.float32),
            jnp.asarray(syms),
        )
        for i in range(B):
            t_s, r_s = eval_pose(Ts_est[i], T0s[i], T1s[i], syms[i])
            np.testing.assert_allclose(float(t_b[i]), t_s, atol=1e-4)
            np.testing.assert_allclose(float(r_b[i]), r_s, atol=1e-4)


class TestTransforms:
    def test_apply_transform_roundtrip(self, rng):
        pts = rng.randn(20, 3)
        moved, T = random_rotation(pts, rng)
        np.testing.assert_allclose(apply_transform(pts, T), moved, atol=1e-6)
        back = apply_transform(moved, np.linalg.inv(T))
        np.testing.assert_allclose(back, pts, atol=1e-6)

    def test_to_T_scale(self):
        T = to_T([1, 2, 3], [1, 0, 0, 0], [2, 2, 2])
        np.testing.assert_allclose(T[:3, :3], np.eye(3) * 2)
        np.testing.assert_allclose(T[:3, 3], [1, 2, 3])

    def test_to_T_vs_transforms3d(self, rng):
        transforms3d = __import__("pytest").importorskip("transforms3d")
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        trans = rng.randn(3)
        scale = rng.rand(3) + 0.5
        ref = np.eye(4)
        ref[:3, :3] = transforms3d.quaternions.quat2mat(q)
        ref[:3, 3] = trans
        S = np.diag(list(scale) + [1.0])
        ref = ref @ S
        np.testing.assert_allclose(to_T(trans, q, scale), ref, atol=1e-10)
