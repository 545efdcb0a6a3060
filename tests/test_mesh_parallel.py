"""Multi-device tests on the 8-device virtual CPU mesh: shardings,
batched extraction, sharded registration, dry-run training step."""

import jax
import numpy as np
import pytest

from corsair_tpu.parallel.mesh import (
    batched_extract,
    make_mesh,
    shard_params,
)
from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


class TestMesh:
    def test_make_mesh_axes(self):
        mesh = make_mesh(n_data=4, n_model=2)
        assert mesh.axis_names == ("data", "model")
        assert mesh.devices.shape == (4, 2)

    def test_shard_params_embedding_tp(self):
        mesh = make_mesh(n_data=4, n_model=2)
        ex = FeatureExtractor(ExtractorConfig())
        params = ex.init_params(jax.random.PRNGKey(0))
        sharded = shard_params(params, mesh)
        # conv trunk replicated
        k = sharded["model"]["conv1"]["kernel"]
        assert k.sharding.is_fully_replicated
        # embedding final kernel split over model axis
        fk = sharded["embedding"]["final"]["kernel"]
        assert not fk.sharding.is_fully_replicated

    def test_batched_extract_sharded(self, rng):
        mesh = make_mesh(n_data=8, n_model=1)
        ex = FeatureExtractor(ExtractorConfig())
        params = ex.init_params(jax.random.PRNGKey(0))
        B, cap = 8, 128
        coords = rng.randint(-5, 5, (B, cap, 3)).astype(np.int32)
        valid = np.ones((B, cap), bool)
        valid[:, 100:] = False
        feats, desc, ovf = batched_extract(
            ex, params, np.asarray(coords), np.asarray(valid), mesh
        )
        assert feats.shape == (B, cap, 16)
        assert desc.shape == (B, 256)
        assert np.isfinite(np.asarray(desc)).all()
        assert not np.asarray(ovf).any()
        # the mesh program IS extract_padded shard_mapped per device:
        # descriptors must match the single-device program bitwise-close
        feats1, desc1, _ = ex.extract_padded(
            params, np.asarray(coords), np.asarray(valid)
        )
        np.testing.assert_allclose(
            np.asarray(desc), np.asarray(desc1), rtol=1e-6, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(feats), np.asarray(feats1), rtol=1e-5, atol=1e-6
        )

    def test_registration_mesh_matches_unsharded(self, rng):
        from corsair_tpu.eval.registration import register_pairs
        from corsair_tpu.ops.ransac import RansacConfig
        from corsair_tpu.ops.symmetry import SymPoseConfig

        n = 8
        feats = [rng.randn(80, 16).astype(np.float32) for _ in range(n)]
        xyz = [rng.randn(80, 3).astype(np.float32) for _ in range(n)]
        cfg = SymPoseConfig(
            num_sectors=2, max_sample=6, kmeans_restarts=2,
            kmeans_iters=5,
            ransac=RansacConfig(num_hypotheses=64, score_chunk=64),
        )
        kwargs = dict(batch_size=8, chunk=128)
        r0 = register_pairs(
            jax.random.PRNGKey(0), feats, xyz, feats, xyz,
            np.arange(n), np.ones(n), cfg, **kwargs,
        )
        mesh = make_mesh(n_data=8, n_model=1)
        r1 = register_pairs(
            jax.random.PRNGKey(0), feats, xyz, feats, xyz,
            np.arange(n), np.ones(n), cfg, mesh=mesh, **kwargs,
        )
        np.testing.assert_allclose(
            r0.Ts_est_best, r1.Ts_est_best, rtol=1e-4, atol=1e-5
        )

    @pytest.mark.slow
    def test_dryrun_train_step(self):
        from corsair_tpu.parallel.dryrun import dryrun_train_step

        loss = dryrun_train_step(8, cap=96, pair_cap=32)
        assert np.isfinite(loss)
