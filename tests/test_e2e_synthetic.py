"""End-to-end integration test on a synthetic Scan2CAD tree.

Exercises the full evaluation path: metadata parsing, CAD library,
ScannetDataset protocol (alignment, normalize-by-positive, fixed
rotations, voxelize), batched feature extraction, retrieval metrics,
batched symmetry-aided registration, result cache round-trip.
"""

import os

import numpy as np
import pytest

from tests.synthetic_data import CATID, build_tree


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthetic")
    return build_tree(str(root))


@pytest.fixture(scope="module")
def app(tree, tmp_path_factory):
    from corsair_tpu.cli.evaluation import App, Config

    cache_dir = str(tmp_path_factory.mktemp("cache"))
    config = Config(
        shapenet_pc15k_root=tree["shapenet_root"],
        scan2cad_pc_root=tree["scan_root"],
        scan2cad_annotation_root=tree["annotation_root"],
        category="chair",
        checkpoint="",  # random init
        cache_dir=cache_dir,
        voxel_size=0.05,
        batch_size=4,
        reg_batch_size=2,
        config_dir=tree["config_dir"],
    )
    app = App(config)
    app.extract_library()
    app.extract_scans()
    return app


class TestInfoAndData:
    def test_scan2cad_info(self, tree):
        from corsair_tpu.data.scan2cad_info import Scan2cadInfo

        info = Scan2cadInfo(
            cad_root=tree["shapenet_root"],
            scan_root=tree["scan_root"],
            catid=CATID,
            annotation_dir=tree["annotation_root"],
            config_dir=tree["config_dir"],
        )
        assert len(info.UsedObjId) == len(tree["model_ids"])
        # scenes 1..3 are the test split
        assert len(info.test_files) == 3
        # 90/10 split of a single train scene: int(0.9*1)=0 train, 1 val
        assert len(info.train_files) + len(info.val_files) == 1
        for f in info.test_files:
            assert info.BestMatchesDict[f] in tree["model_ids"]

    def test_cad_lib_items(self, tree):
        from corsair_tpu.data.cad_lib import CustomizeCADLib

        lib = CustomizeCADLib(
            root=tree["shapenet_root"], catid=CATID,
            ids=tree["model_ids"],
            table_path=os.path.join(tree["config_dir"],
                                    f"{CATID}_scan2cad.npy"),
            voxel_size=0.05, preload=False,
        )
        item = lib[0]
        assert item["coord"].shape[1] == 3
        assert len(item["coord"]) == len(item["origin"])
        # voxel dedup: unique grid coords
        assert len(np.unique(item["coord"], axis=0)) == len(item["coord"])
        batch = lib.collate_pair_fn([lib[0], lib[1]])
        assert batch["base_valid"].sum() == len(lib[0]["coord"]) + len(
            lib[1]["coord"]
        )


class TestEvaluationPhases:
    def test_features_extracted(self, app):
        assert app.lib_feats.shape == (6, 256)
        assert len(app.base_outputs) == 3
        assert app.base_feats.shape == (3, 256)
        for f in app.base_outputs:
            assert f.shape[1] == 16
            assert np.isfinite(f).all()

    def test_retrieval(self, app):
        stat = app.eval_retrieval()
        assert 0 <= stat["precision"] <= 100
        assert len(stat["top1_predict"]) == 3
        assert all(0 <= i < 6 for i in stat["top1_predict"])

    @pytest.mark.slow
    def test_registration_and_cache(self, app):
        app.eval_retrieval()
        results = app.eval_registration()
        n = 3
        assert results.Ts_est_best.shape == (n, 4, 4)
        assert np.isfinite(results.chamfer_dist_sym).all()
        results = app.results
        app.summarize()

        # cache round-trip: a second call loads identical arrays
        from corsair_tpu.eval.cache import load_results

        cached = load_results(app.config.cache_dir, "chair", True)
        assert cached is not None
        np.testing.assert_allclose(
            cached.Ts_est_best, results.Ts_est_best, rtol=1e-6
        )
        np.testing.assert_array_equal(
            cached.sym_ransac_success, results.sym_ransac_success
        )

    def test_registration_quality_gt(self, app):
        """With GT match + near-identical geometry the registration must
        recover the relative pose reasonably even with random features
        (correspondences are noisy, but RANSAC still aligns identical
        shapes)."""
        app.eval_retrieval()
        results = app.eval_registration()
        # chamfer of the aligned pair should be small for at least one query
        assert results.chamfer_dist_sym.min() < 0.5


class TestRegisterGtPath:
    def test_gt_target_and_cache_suffix(self, app, tmp_path_factory):
        """--register-gt selects the gt CAD targets and writes _gt caches
        (evaluation.py:400-441 suffix convention)."""
        import dataclasses as _dc
        import os

        from corsair_tpu.eval.cache import load_results

        app.eval_retrieval()
        cache_dir = str(tmp_path_factory.mktemp("gt_cache"))
        cfg = app.config
        old_top1, old_dir = cfg.register_top1, cfg.cache_dir
        cfg.register_top1, cfg.cache_dir = False, cache_dir
        try:
            res = app.eval_registration()
        finally:
            cfg.register_top1, cfg.cache_dir = old_top1, old_dir
        assert os.path.exists(
            os.path.join(cache_dir, "Ts_est_best_chair_gt.npy")
        )
        cached = load_results(cache_dir, "chair", False)
        assert cached is not None
        # gt registration on near-identical geometry: low chamfer
        assert res.chamfer_dist_sym.min() < 0.5


class TestDegenerateClouds:
    def test_extract_padded_all_invalid_cloud(self):
        """A batch containing an empty (all-padding) cloud must extract
        without NaNs and yield finite descriptors for the real clouds —
        the flat forward's miss-row indexing and segment pooling must
        tolerate a cloud with zero valid voxels."""
        import jax
        import jax.numpy as jnp

        from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor

        rng = np.random.RandomState(0)
        extractor = FeatureExtractor(ExtractorConfig())
        params = extractor.init_params(jax.random.PRNGKey(0))
        cap = 512
        coords = np.zeros((3, cap, 3), np.int32)
        valid = np.zeros((3, cap), bool)
        for i in range(2):  # cloud 2 stays empty
            g = np.unique(
                rng.randint(-40, 40, (300, 3)).astype(np.int32), axis=0
            )
            coords[i, : len(g)] = g
            valid[i, : len(g)] = True
        feats, desc, ovf = extractor.extract_padded(
            params, jnp.asarray(coords), jnp.asarray(valid)
        )
        assert not np.asarray(ovf).any()
        assert np.isfinite(np.asarray(desc)[:2]).all()
        assert np.isfinite(np.asarray(feats)[valid]).all()

    def test_extract_padded_matches_collated_path(self):
        """The per-cloud-maps + flattened forward (extract_padded) must
        agree with the directly-collated build (extract_batch_np) — the
        two paths build identical tables through different pipelines."""
        import jax
        import jax.numpy as jnp

        from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor

        rng = np.random.RandomState(1)
        extractor = FeatureExtractor(
            ExtractorConfig(auto_level_caps=False)
        )
        params = extractor.init_params(jax.random.PRNGKey(0))
        clouds = []
        for n in (260, 410):
            g = np.unique(
                rng.randint(-40, 40, (n, 3)).astype(np.int32), axis=0
            )
            clouds.append(g)
        cap = 512
        coords, valid = extractor.pad_clouds(clouds, cap)
        feats_p, desc_p, ovf = extractor.extract_padded(
            params, jnp.asarray(coords), jnp.asarray(valid)
        )
        assert not np.asarray(ovf).any()

        feats_c, desc_c = extractor.extract_batch_np(
            params, clouds, capacity=2 * cap
        )
        for i, c in enumerate(clouds):
            np.testing.assert_allclose(
                np.asarray(feats_p)[i, : len(c)], feats_c[i],
                rtol=2e-4, atol=2e-5,
            )
        np.testing.assert_allclose(np.asarray(desc_p), np.asarray(desc_c),
                                   rtol=2e-4, atol=2e-5)


class TestHeadlessGui:
    def test_save_result_figures(self, tmp_path, rng):
        """Headless six-view figure dump works from a minimal app state
        (the vedo browser shares the same data surface; cli/gui.py)."""
        import types

        from corsair_tpu.cli.gui import save_result_figures

        n_lib, n_pts, d = 3, 200, 16

        def cloud():
            return rng.randn(n_pts, 3).astype(np.float32)

        app = types.SimpleNamespace(
            base_outputs=[rng.randn(n_pts, d).astype(np.float32)],
            base_origins=[cloud()],
            base_Ts=[np.eye(4, dtype=np.float32)],
            base_feats=np.asarray(rng.randn(1, 256), np.float32),
            lib_feats=np.asarray(rng.randn(n_lib, 256), np.float32),
            lib_origins=[cloud() for _ in range(n_lib)],
            lib_outputs=[rng.randn(n_pts, d).astype(np.float32)
                         for _ in range(n_lib)],
            results=None,
        )
        paths = save_result_figures(app, str(tmp_path), indices=[0],
                                    max_points=100)
        assert len(paths) == 1
        assert os.path.getsize(paths[0]) > 5000
