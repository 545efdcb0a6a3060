"""Tests for retrieval metrics, RRE/RTE tables, caches, and the AP score."""

import numpy as np
import pytest

from corsair_tpu.eval.cache import RegistrationResults, load_results, save_results
from corsair_tpu.eval.metrics import compute_rre_table, compute_rte_table
from corsair_tpu.eval.retrieval import (
    average_precision,
    compute_mAP,
    get_rank,
    retrieval_eval,
    scan2cad_retrieval_eval,
)


class TestAveragePrecision:
    def test_vs_sklearn(self, rng):
        sklearn_metrics = pytest.importorskip("sklearn.metrics")
        for _ in range(20):
            n = rng.randint(5, 50)
            y = rng.rand(n) > 0.5
            if not y.any():
                y[0] = True
            s = rng.rand(n)
            ref = sklearn_metrics.average_precision_score(y, s)
            got = average_precision(y, s)
            np.testing.assert_allclose(got, ref, atol=1e-10)

    def test_no_positives(self):
        assert average_precision(np.zeros(5, bool), np.arange(5)) == 0.0


class TestRetrievalEval:
    def _setup(self, rng, n=40):
        desc = rng.randn(n, 16)
        table = rng.rand(n, n) * 0.5
        table = (table + table.T) / 2
        table[np.arange(n), np.arange(n)] = 200
        return desc, table

    def test_perfect_retrieval(self, rng):
        """Descriptors whose cosine distances equal the CD ranking give
        100% precision."""
        n = 30
        # build descriptors so that cosine distance == index distance
        angles = np.linspace(0, np.pi / 3, n)
        desc = np.stack([np.cos(angles), np.sin(angles)], 1)
        table = np.abs(np.subtract.outer(np.arange(n), np.arange(n))).astype(
            float
        )
        table[np.arange(n), np.arange(n)] = 200
        stat = retrieval_eval(desc, 0.2, table)
        assert stat["percision"] > 95

    def test_outputs_in_range(self, rng):
        desc, table = self._setup(rng)
        stat = retrieval_eval(desc, 0.1, table)
        assert 0 <= stat["percision"] <= 100
        assert 0 <= stat["mAP"] <= 100

    def test_scan2cad_eval(self, rng):
        n_scan, n_lib = 10, 40
        scan = rng.randn(n_scan, 16)
        lib = rng.randn(n_lib, 16)
        table = rng.rand(n_lib, n_lib)
        best = rng.randint(0, n_lib, n_scan)
        stat = scan2cad_retrieval_eval(scan, lib, best, table, 4)
        assert len(stat["top1_predict"]) == n_scan
        assert len(stat["gt"]) == n_scan
        # top1_predict is the argmin of L2 distances
        d = np.linalg.norm(scan[:, None] - lib[None], axis=2)
        np.testing.assert_array_equal(
            stat["top1_predict"], np.argmin(d, 1)
        )
        # gt is the argmin row of table[best]
        np.testing.assert_array_equal(
            stat["gt"], np.argmin(table[best], 1)
        )

    def test_compute_mAP(self, rng):
        desc = np.concatenate([
            rng.randn(10, 8) + 5, rng.randn(10, 8) - 5
        ])
        labels = np.array([0] * 10 + [1] * 10)
        inst, cls = compute_mAP(desc, labels)
        assert inst > 90
        assert len(cls) == 2

    def test_get_rank_excludes_self(self, rng):
        desc = rng.randn(12, 6)
        rank = get_rank(desc, top_n=5)
        assert rank.shape == (12, 5)
        for i in range(12):
            assert i not in rank[i]


class TestTables:
    def test_rte(self):
        t = [0.01, 0.04, 0.09, 0.2]
        tab = compute_rte_table(t)
        assert tab[0.02] == 0.25
        assert tab[0.05] == 0.5
        assert tab[0.10] == 0.75
        assert tab[0.15] == 0.75

    def test_rre(self):
        r = np.deg2rad([3, 10, 30, 100])
        tab = compute_rre_table(r)
        assert tab[5.0] == 0.25
        assert tab[15.0] == 0.5
        assert tab[45.0] == 0.75


class TestCache:
    def test_round_trip(self, rng, tmp_path):
        n = 5
        res = RegistrationResults(
            Ts_est_ransac=rng.randn(n, 4, 4).astype(np.float32),
            Ts_est_best=rng.randn(n, 4, 4).astype(np.float32),
            t_losses_ransac=rng.rand(n),
            t_losses_sym=rng.rand(n),
            r_losses_ransac=rng.rand(n),
            r_losses_sym=rng.rand(n),
            sym_ransac_success=rng.rand(n) > 0.5,
            chamfer_dist_ransac=rng.rand(n),
            chamfer_dist_sym=rng.rand(n),
        )
        save_results(str(tmp_path), "chair", True, res)
        # reference-compatible file names
        assert (tmp_path / "Ts_est_best_chair_top1.npy").exists()
        arr = np.load(tmp_path / "Ts_est_best_chair_top1.npy")
        assert arr.shape == (n, 16)  # flattened reference layout
        loaded = load_results(str(tmp_path), "chair", True)
        np.testing.assert_allclose(loaded.Ts_est_best, res.Ts_est_best)
        assert load_results(str(tmp_path), "chair", False) is None

    def test_reads_reference_goldens(self):
        """Our loader must read the reference's shipped golden caches."""
        import os
        golden = "/root/reference/data/cache_pose"
        if not os.path.isdir(golden):
            pytest.skip("golden cache not present")
        res = load_results(golden, "chair", "top1" == "top1")
        assert res is not None
        assert res.Ts_est_best.shape == (993, 4, 4)
        assert res.t_losses_sym.shape == (993,)
