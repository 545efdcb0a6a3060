"""Tests for the symmetry-aided registration pipeline."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from corsair_tpu.ops.correspond import find_kcorr, find_kcorr_per_sector
from corsair_tpu.ops.pose_metrics import eval_pose
from corsair_tpu.ops.ransac import RansacConfig
from corsair_tpu.ops.symmetry import (
    SymPoseConfig,
    shift_permutations,
    _topk_smallest,
    sym_pose,
    symmetric_cut,
)
from corsair_tpu.ops.transforms import apply_transform, euler_y


def _two_sided_cloud(rng, n=300):
    """A cloud with two well-separated lobes + distinctive per-lobe
    features mirrored between the lobes (so a feature neighborhood spans
    both lobes, like symmetric geometry)."""
    half = n // 2
    left = rng.randn(half, 3) * 0.1 + np.array([-1.0, 0, 0])
    right = rng.randn(half, 3) * 0.1 + np.array([1.0, 0, 0])
    xyz = np.concatenate([left, right]).astype(np.float32)
    base = rng.randn(half, 8).astype(np.float32)
    feat = np.concatenate([base, base])  # mirror-symmetric features
    feat /= np.linalg.norm(feat, axis=1, keepdims=True)
    return xyz, feat


class TestShiftPermutations:
    def test_k2(self):
        p = shift_permutations(2)
        np.testing.assert_array_equal(p, [[0, 1], [1, 0]])

    def test_k4_matches_reference_rotation(self):
        p = shift_permutations(4)
        assert p.shape == (8, 4)
        # cyclic shifts
        np.testing.assert_array_equal(p[0], [0, 1, 2, 3])
        np.testing.assert_array_equal(p[1], [1, 2, 3, 0])
        np.testing.assert_array_equal(p[3], [3, 0, 1, 2])
        # reflected pass starts from [0, 3, 2, 1]
        np.testing.assert_array_equal(p[4], [0, 3, 2, 1])
        np.testing.assert_array_equal(p[5], [3, 2, 1, 0])


class TestFindKcorr:
    def test_identity_match(self, rng):
        f = rng.randn(50, 8).astype(np.float32)
        idx0, idx1, valid = find_kcorr(
            jnp.asarray(f), jnp.asarray(f), 1, chunk=32
        )
        np.testing.assert_array_equal(np.asarray(idx0), np.arange(50))
        np.testing.assert_array_equal(np.asarray(idx1), np.arange(50))

    def test_repeats_k(self, rng):
        f0 = rng.randn(10, 4).astype(np.float32)
        f1 = rng.randn(20, 4).astype(np.float32)
        idx0, idx1, valid = find_kcorr(
            jnp.asarray(f0), jnp.asarray(f1), 3, chunk=8
        )
        assert idx0.shape == (30,)
        np.testing.assert_array_equal(
            np.asarray(idx0), np.repeat(np.arange(10), 3)
        )

    def test_per_sector(self, rng):
        f0 = rng.randn(20, 4).astype(np.float32)
        f1 = rng.randn(40, 4).astype(np.float32)
        sector1 = (np.arange(40) % 2).astype(np.int32)
        idx, ok = find_kcorr_per_sector(
            jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(sector1), 2, 2,
            chunk=16,
        )
        idx, ok = np.asarray(idx), np.asarray(ok)
        assert idx.shape == (20, 2, 2)
        # neighbors assigned to sector s must actually be in sector s
        for s in range(2):
            assert (sector1[idx[:, s, :][ok[:, s, :]]] == s).all()
        # and must be the true within-sector top-k
        d2 = ((f0[:, None, :] - f1[None, :, :]) ** 2).sum(-1)
        for s in range(2):
            dm = d2[:, sector1 == s]
            ref = np.argsort(dm, axis=1)[:, :2]
            sec_rows = np.nonzero(sector1 == s)[0]
            np.testing.assert_array_equal(idx[:, s, :], sec_rows[ref])


class TestTopkSmallest:
    """The cut's two-stage exact top-k must return the single-stage
    set (chunked path triggers at n % 2048 == 0, n > 4096)."""

    def test_matches_direct_set(self, rng):
        import jax.numpy as jnp
        import jax

        d2 = jnp.asarray(rng.rand(7, 8192).astype(np.float32))
        idx2, val2 = _topk_smallest(d2, 50)
        _, idx1 = jax.lax.top_k(-d2, 50)
        val1 = jnp.take_along_axis(d2, idx1, axis=-1)
        np.testing.assert_array_equal(
            np.sort(np.asarray(idx2), axis=-1),
            np.sort(np.asarray(idx1), axis=-1),
        )
        np.testing.assert_array_equal(
            np.sort(np.asarray(val2), axis=-1),
            np.sort(np.asarray(val1), axis=-1),
        )

    def test_small_n_direct_path(self, rng):
        import jax.numpy as jnp

        d2 = jnp.asarray(rng.rand(3, 512).astype(np.float32))
        idx, val = _topk_smallest(d2, 5)
        ref = np.sort(np.asarray(d2), axis=-1)[:, :5]
        np.testing.assert_allclose(np.sort(np.asarray(val), -1), ref)


class TestSymmetricCut:
    def test_two_lobes(self, rng):
        xyz, feat = _two_sided_cloud(rng)
        valid = np.ones(len(xyz), bool)
        cfg = SymPoseConfig(num_sectors=2, max_sample=20,
                            kmeans_restarts=4, kmeans_iters=15)
        sector, ok = symmetric_cut(
            jax.random.PRNGKey(0), jnp.asarray(feat), jnp.asarray(xyz),
            jnp.asarray(valid), cfg,
        )
        assert bool(ok)
        sector = np.asarray(sector)
        half = len(xyz) // 2
        # each lobe lands in a single sector
        assert len(np.unique(sector[:half])) == 1
        assert len(np.unique(sector[half:])) == 1
        assert sector[0] != sector[-1]

    def test_rejects_blob(self, rng):
        # one tight blob: inter-center distance < 0.15 -> no accepted fit
        xyz = (rng.randn(100, 3) * 0.01).astype(np.float32)
        feat = rng.randn(100, 8).astype(np.float32)
        valid = np.ones(100, bool)
        cfg = SymPoseConfig(num_sectors=2, max_sample=10,
                            kmeans_restarts=2, kmeans_iters=10)
        _, ok = symmetric_cut(
            jax.random.PRNGKey(0), jnp.asarray(feat), jnp.asarray(xyz),
            jnp.asarray(valid), cfg,
        )
        assert not bool(ok)


def _blob_cloud(rng, K, radius, sigma, n=400):
    """K isotropic gaussian blobs (sigma) at ``radius`` around the y
    axis, equally spaced; features = one shared vector + small noise so
    every seed's rank-window is a uniform subsample spanning all blobs.

    Engineered so the symmetric-cut acceptance gates
    (``utils/symmetry.py:231``: ``dist.min() > 0.15 > max(error)``) are
    analytically predictable: min inter-center distance =
    ``2*radius*sin(pi/K)``; per-cluster mean distance-to-center of a 3-D
    gaussian = ``sigma * 2*sqrt(2/pi) * Gamma(2)/Gamma(1.5)`` ~= 1.596*sigma.
    """
    per = n // K
    pts = []
    for s in range(K):
        a = 2 * np.pi * s / K
        c = np.array([radius * np.cos(a), 0.0, radius * np.sin(a)])
        pts.append(c[None, :] + rng.randn(per, 3) * sigma)
    xyz = np.concatenate(pts).astype(np.float32)
    shared = rng.randn(8)
    feat = shared[None, :] + rng.randn(len(xyz), 8) * 0.05
    feat = (feat / np.linalg.norm(feat, axis=1, keepdims=True)
            ).astype(np.float32)
    return xyz, feat


def _reference_cut_accepts(feat, xyz, K, max_sample=40, seed=0):
    """The reference's acceptance decision (``utils/symmetry.py:196-236``),
    verbatim in numpy + sklearn: scan seed candidates, 50-NN feature
    window, sklearn KMeans(n_init=10), accept iff any candidate passes
    ``dist.min() > 0.15 > max(error)``."""
    from sklearn.cluster import KMeans

    rs = np.random.RandomState(seed)
    seeds = rs.choice(len(xyz), max_sample, replace=False)
    for idx in seeds:
        d = np.linalg.norm(feat[idx : idx + 1] - feat, axis=1)
        nns = xyz[np.argsort(d)[:50]]
        km = KMeans(n_clusters=K, random_state=0, n_init=10).fit(nns)
        centers = km.cluster_centers_
        dist = np.linalg.norm(centers[None] - centers[:, None], axis=2)
        dist[np.arange(K), np.arange(K)] = 100
        nn_label = km.predict(nns)
        err = [
            np.linalg.norm(nns[nn_label == l] - centers[l], axis=1).mean()
            for l in range(K)
        ]
        if dist.min() > 0.15 > max(err):
            return True
    return False


class TestSymmetricCutNearThreshold:
    """Reject-side coverage (VERDICT r3 weak #6): clouds straddling the
    0.15 center-distance and cluster-error gates at >=10% margins, the
    regime the round-3 budget study never exercised (its synthetic
    clouds essentially always accepted). Each fixture's decision is
    checked three ways: analytic expectation, the sklearn-faithful
    reference loop, and budget invariance (faithful 10x25 Lloyd vs the
    fast() preset's 4x10)."""

    # (K, radius, sigma, expect_accept): min center dist = 2R sin(pi/K),
    # cluster error ~= 1.6 sigma; both gates at 0.15.
    CASES = [
        (4, 0.080, 0.020, False),   # dist 0.113 < 0.15 -> reject
        (4, 0.095, 0.020, False),   # dist 0.134 (10% under) -> reject
        (4, 0.120, 0.020, True),    # dist 0.170 (13% over)  -> accept
        (4, 0.130, 0.020, True),    # dist 0.184, err 0.032  -> accept
        (4, 0.350, 0.180, False),   # err ~0.29 > 0.15 -> reject
        (4, 0.300, 0.060, True),    # err ~0.10 < 0.15 -> accept
        (2, 0.060, 0.015, False),   # K=2: dist 0.12 -> reject
        (2, 0.100, 0.015, True),    # K=2: dist 0.20 -> accept
    ]

    def _our_decision(self, feat, xyz, K, iters, restarts, key=0):
        cfg = SymPoseConfig(
            num_sectors=K, max_sample=40,
            kmeans_iters=iters, kmeans_restarts=restarts,
        )
        _, ok = symmetric_cut(
            jax.random.PRNGKey(key), jnp.asarray(feat), jnp.asarray(xyz),
            jnp.ones(len(xyz), bool), cfg,
        )
        return bool(ok)

    def test_gates_and_budget_invariance(self, rng):
        for K, radius, sigma, expect in self.CASES:
            xyz, feat = _blob_cloud(rng, K, radius, sigma)
            got_full = self._our_decision(feat, xyz, K, 25, 10)
            got_fast = self._our_decision(feat, xyz, K, 10, 4)
            assert got_full == expect, (
                f"K={K} R={radius} sigma={sigma}: faithful budget "
                f"decided {got_full}, analytic expectation {expect}"
            )
            assert got_fast == expect, (
                f"K={K} R={radius} sigma={sigma}: fast() budget "
                f"decided {got_fast}, expectation {expect} — the "
                f"reduced Lloyd budget changes near-threshold decisions"
            )

    def test_matches_reference_loop(self, rng):
        for K, radius, sigma, expect in self.CASES:
            xyz, feat = _blob_cloud(rng, K, radius, sigma)
            ref = _reference_cut_accepts(feat, xyz, K)
            assert ref == expect, (
                f"K={K} R={radius} sigma={sigma}: sklearn reference "
                f"loop decided {ref}, expectation {expect} — fixture "
                f"margins too tight"
            )
            got = self._our_decision(feat, xyz, K, 25, 10)
            assert got == ref

    def test_empty_cluster_rejected(self):
        """A window whose points can't fill K clusters must not be
        scored err=0 (reference: mean of empty slice = nan -> gate
        fails; ours: err = +inf)."""
        # two tight far-apart blobs, K=4: Lloyd leaves >=1 cluster
        # empty or degenerate-tight; either way this must reject or at
        # minimum never accept via an empty cluster's zero error.
        rng = np.random.RandomState(3)
        half = 100
        a = rng.randn(half, 3) * 1e-4 + np.array([0.0, 0, 0])
        b = rng.randn(half, 3) * 1e-4 + np.array([1.0, 0, 0])
        xyz = np.concatenate([a, b]).astype(np.float32)
        shared = rng.randn(8)
        feat = shared[None, :] + rng.randn(200, 8) * 0.05
        feat = (feat / np.linalg.norm(feat, axis=1, keepdims=True)
                ).astype(np.float32)
        cfg = SymPoseConfig(num_sectors=4, max_sample=20,
                            kmeans_iters=10, kmeans_restarts=4)
        _, ok = symmetric_cut(
            jax.random.PRNGKey(0), jnp.asarray(feat), jnp.asarray(xyz),
            jnp.ones(200, bool), cfg,
        )
        # 2 distinguishable positions for 4 centers: any fit has either
        # an empty/coincident cluster (dist gate or err=+inf) -> reject
        assert not bool(ok)


class TestSymPose:
    def _run(self, rng, sym_angle=None, num_sectors=2):
        """Cloud 1 = rotated copy of cloud 0 with matching features."""
        xyz0, feat = _two_sided_cloud(rng, n=200)
        if sym_angle is None:
            T = np.eye(4)
            T[:3, :3] = euler_y(np.float64(0.7))
            T[:3, 3] = [0.1, -0.2, 0.3]
        else:
            T = np.eye(4)
            T[:3, :3] = euler_y(np.float64(sym_angle))
        xyz1 = apply_transform(xyz0, T).astype(np.float32)
        valid = np.ones(len(xyz0), bool)
        cfg = SymPoseConfig(
            num_sectors=num_sectors, max_sample=16, kmeans_restarts=3,
            kmeans_iters=12, max_corr=0.2,
            ransac=RansacConfig(num_hypotheses=512, sample_size=10),
        )
        out = sym_pose(
            jax.random.PRNGKey(0),
            jnp.asarray(feat), jnp.asarray(xyz0), jnp.asarray(valid),
            jnp.asarray(feat), jnp.asarray(xyz1), jnp.asarray(valid),
            cfg, chunk=128,
        )
        return [np.asarray(x) for x in out], T

    def test_recovers_transform(self, rng):
        (T_best, cd_best, T_ransac, cd_ransac, ok), T = self._run(rng)
        t_err, r_err = eval_pose(T_best, np.eye(4), T, 1)
        assert r_err < np.deg2rad(5), np.rad2deg(r_err)
        assert t_err < 0.1
        assert cd_best <= cd_ransac + 1e-6

    def test_outputs_finite(self, rng):
        (T_best, cd_best, T_ransac, cd_ransac, ok), _ = self._run(
            rng, num_sectors=4
        )
        assert np.isfinite(T_best).all()
        assert np.isfinite(cd_best)
        assert np.isfinite(T_ransac).all()

    def test_prescore_matches_exact_all(self, rng):
        """Two-stage CD scoring (cd_prescore_sample/keep) must select
        the same transform and report the same (exact) CDs as the
        exact-all path on clean symmetric clouds (K=4, S=8)."""
        import dataclasses

        xyz0, feat = _two_sided_cloud(rng, n=400)
        T = np.eye(4)
        T[:3, :3] = euler_y(np.float64(0.7))
        T[:3, 3] = [0.1, -0.2, 0.3]
        xyz1 = apply_transform(xyz0, T).astype(np.float32)
        valid = np.ones(len(xyz0), bool)
        base = SymPoseConfig(
            num_sectors=4, max_sample=16, kmeans_restarts=3,
            kmeans_iters=12, max_corr=0.2,
            ransac=RansacConfig(num_hypotheses=512, sample_size=10),
            cd_prescore_sample=128, cd_prescore_keep=2,
        )
        exact = dataclasses.replace(base, cd_prescore_sample=0)
        args = (
            jax.random.PRNGKey(0),
            jnp.asarray(feat), jnp.asarray(xyz0), jnp.asarray(valid),
            jnp.asarray(feat), jnp.asarray(xyz1), jnp.asarray(valid),
        )
        out_p = [np.asarray(x) for x in sym_pose(*args, base, chunk=128)]
        out_e = [np.asarray(x) for x in sym_pose(*args, exact, chunk=128)]
        np.testing.assert_allclose(out_p[0], out_e[0], atol=1e-6)  # T_best
        np.testing.assert_allclose(out_p[1], out_e[1], atol=1e-6)  # cd_best
        np.testing.assert_allclose(out_p[3], out_e[3], atol=1e-6)  # cd_ransac
        assert out_p[4] == out_e[4]

    def test_unequal_capacities(self, rng):
        """The deployed register_pairs path pads the query and CAD
        sides to INDEPENDENT caps (eval/registration.py) — sym_pose must
        accept different row counts on the two sides (regression: a
        stacked symmetric-cut call was a trace-time shape error)."""
        xyz0, feat = _two_sided_cloud(rng, n=200)
        T = np.eye(4)
        T[:3, :3] = euler_y(np.float64(0.7))
        xyz1 = apply_transform(xyz0, T).astype(np.float32)
        # pad the CAD side to a larger capacity
        pad = 56
        xyz1p = np.concatenate([xyz1, np.zeros((pad, 3), np.float32)])
        featp = np.concatenate(
            [feat, np.zeros((pad, feat.shape[1]), np.float32)]
        )
        v0 = np.ones(len(xyz0), bool)
        v1 = np.concatenate([np.ones(len(xyz1), bool),
                             np.zeros(pad, bool)])
        cfg = SymPoseConfig(
            num_sectors=2, max_sample=16, kmeans_restarts=3,
            kmeans_iters=12, max_corr=0.2,
            ransac=RansacConfig(num_hypotheses=512, sample_size=10),
        )
        out = sym_pose(
            jax.random.PRNGKey(0),
            jnp.asarray(feat), jnp.asarray(xyz0), jnp.asarray(v0),
            jnp.asarray(featp), jnp.asarray(xyz1p), jnp.asarray(v1),
            cfg, chunk=128,
        )
        T_best = np.asarray(out[0])
        assert np.isfinite(T_best).all()
        t_err, r_err = eval_pose(T_best, np.eye(4), T, 1)
        assert r_err < np.deg2rad(5)
