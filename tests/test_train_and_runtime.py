"""Tests: training step, checkpoints, native runtime, datasets, misc ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corsair_tpu.core.voxelize import voxelize_np
from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor


class TestTrainStep:
    def test_loss_decreases(self, rng):
        from corsair_tpu.train.trainer import TrainConfig, Trainer

        ex = FeatureExtractor(ExtractorConfig())
        trainer = Trainer(ex, TrainConfig(learning_rate=0.05),
                          pair_cap=128)
        params, opt_state = trainer.init(jax.random.PRNGKey(0))

        # synthetic triplet batch: base ~ pos (same cloud), neg different
        def cloud(seed):
            r = np.random.RandomState(seed)
            pts = r.randn(200, 3).astype(np.float32)
            _, g, _ = voxelize_np(pts, 0.2)
            return g

        g_base, g_neg = cloud(0), cloud(1)
        nb, nn = len(g_base), len(g_neg)

        def role(grid_arr, cap=256):
            from corsair_tpu.core.voxelize import sparse_collate_np
            c, b, f, v = sparse_collate_np(
                [grid_arr], [np.ones((len(grid_arr), 1), np.float32)], cap
            )
            return c, b, f, v

        batch = {}
        for name, g in (("base", g_base), ("pos", g_base), ("neg", g_neg)):
            c, b, f, v = role(g)
            batch[f"{name}_coords"] = c
            batch[f"{name}_batch"] = b
            batch[f"{name}_feat"] = f
            batch[f"{name}_valid"] = v
            batch[f"{name}_T"] = np.eye(4)[None].astype(np.float32)
        # identity positive pairs; random negatives
        ident = np.stack([np.arange(nb), np.arange(nb)], 1)
        batch["PiP_pairs"] = ident.astype(np.int32)
        batch["PiN_pairs"] = np.stack([
            np.arange(nb), (np.arange(nb) + 7) % nb
        ], 1).astype(np.int32)
        batch["NiN_pairs"] = np.stack([
            np.arange(min(nb, nn)), np.arange(min(nb, nn))
        ], 1).astype(np.int32)

        losses = []
        for _ in range(3):
            params, opt_state, loss, aux = trainer.step(
                params, opt_state, batch, 256
            )
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestCheckpoints:
    def test_npz_round_trip(self, rng, tmp_path):
        from corsair_tpu.utils.ckpts import load_checkpoint, save_checkpoint

        ex = FeatureExtractor(ExtractorConfig())
        params = ex.init_params(jax.random.PRNGKey(3))
        path = save_checkpoint(
            params["model"], params["embedding"], None, 7,
            str(tmp_path), "test_ckpt",
        )
        model, emb, _, epoch = load_checkpoint(
            path, params["model"], params["embedding"]
        )
        assert epoch == 7
        np.testing.assert_allclose(
            np.asarray(model["conv1"]["kernel"]),
            np.asarray(params["model"]["conv1"]["kernel"]),
        )
        np.testing.assert_allclose(
            np.asarray(emb["fc2"]["bias"]),
            np.asarray(params["embedding"]["fc2"]["bias"]),
        )


class TestNativeRuntime:
    def test_voxelize_parity(self, rng):
        from corsair_tpu import runtime

        if not runtime.available():
            pytest.skip("native runtime unavailable")
        pts = rng.randn(2000, 3).astype(np.float32)
        _, g_native, k_native = runtime.voxelize(pts, 0.1)
        _, g_np, k_np = voxelize_np(pts, 0.1)
        assert sorted(map(tuple, g_native)) == sorted(map(tuple, g_np))
        np.testing.assert_array_equal(np.sort(k_native), np.sort(k_np))

    def test_collate_parity(self, rng):
        from corsair_tpu import runtime
        from corsair_tpu.core.sparse import SENTINEL
        from corsair_tpu.core.voxelize import sparse_collate_np

        if not runtime.available():
            pytest.skip("native runtime unavailable")
        g0 = rng.randint(0, 10, (5, 3)).astype(np.int32)
        g1 = rng.randint(0, 10, (7, 3)).astype(np.int32)
        c, b, v = runtime.collate([g0, g1], 16, int(SENTINEL))
        c2, b2, _, v2 = sparse_collate_np(
            [g0, g1],
            [np.ones((5, 1), np.float32), np.ones((7, 1), np.float32)], 16
        )
        np.testing.assert_array_equal(c, c2)
        np.testing.assert_array_equal(b, b2)
        np.testing.assert_array_equal(v, v2)


class TestIRLS:
    def test_recovers_small_pose(self, rng):
        from corsair_tpu.ops.irls import est_quad_linear_robust
        from corsair_tpu.ops.transforms import euler_xyz_mat

        src = rng.randn(200, 3).astype(np.float32)
        R = euler_xyz_mat(0.05, -0.08, 0.1)
        t = np.array([0.05, -0.02, 0.03])
        dst = (src @ R.T + t).astype(np.float32)
        T = np.asarray(est_quad_linear_robust(
            jnp.asarray(src), jnp.asarray(dst)
        ))
        np.testing.assert_allclose(T[:3, :3], R, atol=1e-3)
        np.testing.assert_allclose(T[:3, 3], t, atol=1e-3)


class TestSymmetryLabel:
    def test_symmetric_cylinder(self, rng):
        from corsair_tpu.ops.symmetry_label import get_symmetry_label

        n = 8000
        theta = rng.uniform(0, 2 * np.pi, n)
        pc = np.stack([
            np.cos(theta), rng.uniform(-1, 1, n), np.sin(theta)
        ], 1).astype(np.float32)
        label = get_symmetry_label(pc, cd_threshold=0.15)
        assert label == 12  # continuous symmetry passes the largest test

    def test_asymmetric(self, rng):
        from corsair_tpu.ops.symmetry_label import get_symmetry_label

        pc = rng.randn(500, 3).astype(np.float32)
        assert get_symmetry_label(pc, cd_threshold=0.05) == 1


class TestHardDataset:
    def test_multi_pos_neg(self, rng, tmp_path):
        import os

        from corsair_tpu.data.hard_dataset import HardCategoryDataset

        catid, split = "99999999", "train"
        d = tmp_path / catid / split
        os.makedirs(d)
        n = 12
        for i in range(n):
            np.save(d / f"m{i:03d}.npy", rng.randn(500, 3))
        table = rng.rand(n, n) * 0.1  # everything similar
        table = (table + table.T) / 2
        np.save(tmp_path / f"{catid}_{split}.npy", table)

        ds = HardCategoryDataset(
            str(tmp_path), split, catid, str(tmp_path),
            pos_ratio=0.5, neg_ratio=0.9, voxel_size=0.1,
        )
        base, pos, neg = ds[0]
        assert len(pos) == 1 and len(neg) == 4
        batch = ds.collate_pair_fn([ds[0], ds[1]])
        assert batch["pos_T"].shape[0] == 2
        assert batch["neg_T"].shape[0] == 8

    def test_collate_order_and_sampler_windows(self, rng, tmp_path):
        """Anchor-major flattening + reference sampler windows
        (datasets/HardCategoryDataset.py:96-115, 272-326): positives come
        from the CD<0.15 head of rank_a, negatives from the CD>0.2 head
        of rank_d excluding rank 0 (self), and the collate's batch ids
        follow the flattened anchor-major order."""
        import os

        from corsair_tpu.data.hard_dataset import HardCategoryDataset

        catid, split = "99999999", "train"
        d = tmp_path / catid / split
        os.makedirs(d)
        n = 16
        for i in range(n):
            np.save(d / f"m{i:03d}.npy", rng.randn(400, 3))
        # block-diagonal similarity: 0-7 mutually close, 8-15 far
        table = np.full((n, n), 0.5)
        table[:8, :8] = 0.05
        table[8:, 8:] = 0.05
        np.fill_diagonal(table, 0.0)
        np.save(tmp_path / f"{catid}_{split}.npy", table)

        ds = HardCategoryDataset(
            str(tmp_path), split, catid, str(tmp_path),
            pos_ratio=0.5, neg_ratio=0.9, voxel_size=0.1,
        )
        np.random.seed(0)
        for anchor in (0, 9):
            pos_idx = ds.generate_positive_inst(anchor)
            neg_idx = ds.generate_negative_inst(anchor)
            same_block = (anchor // 8 == pos_idx // 8)
            assert same_block.all(), (anchor, pos_idx)
            assert all(ds.table[anchor, j] > 0.2 for j in neg_idx)
            assert anchor not in neg_idx  # +1 skips self (rank_d head)

        batch = ds.collate_pair_fn([ds[2], ds[10]])
        # anchor-major: first n_pos entries belong to anchor 0, etc.
        assert batch["pos_idx"].shape == (2,)
        assert batch["neg_idx"].shape == (8,)
        assert (batch["neg_batch"][batch["neg_valid"]] ==
                np.repeat(np.arange(8), np.bincount(
                    batch["neg_batch"][batch["neg_valid"]],
                    minlength=8))).all()
        # per-anchor grouping: negatives 0-3 sampled for anchor 2
        assert all(ds.table[2, j] > 0.2 for j in batch["neg_idx"][:4])
        assert all(ds.table[10, j] > 0.2 for j in batch["neg_idx"][4:])
