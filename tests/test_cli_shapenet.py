"""End-to-end test of the ShapeNet synthetic-pose CLI on synthetic data."""

import os

import numpy as np
import pytest

from tests.synthetic_data import CATID, build_tree


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    return build_tree(str(tmp_path_factory.mktemp("shapenet_cli")))


class TestShapenetCLI:
    def test_run_and_resume(self, tree, tmp_path, monkeypatch, rng):
        from corsair_tpu.cli.evaluation_shapenet import App, Config
        from corsair_tpu.cli.compute_metrics_shapenet import metrics_row

        monkeypatch.chdir(tmp_path)
        config = Config(
            shapenet_root=tree["shapenet_root"],
            category="chair",
            n_models=2,
            n_poses_per_model=1,
            max_roll_deg=30, max_pitch_deg=30, max_yaw_deg=30,
            max_translation_x=0.2, max_translation_y=0.2,
            max_translation_z=0.2,
            model_ckpt="",
            random_seed=0,
            voxel_size=0.08,
            reg_batch_size=2,
        )
        app = App(config)
        df = app.run()
        assert len(df) == 2
        assert os.path.exists(app.csv_file)
        assert os.path.exists(app.npz_file)
        for col in ("rre_sym", "rte_sym", "rre_ransac", "rte_ransac",
                    "symmetry_label", "cd_sym"):
            assert col in df.columns
        assert np.isfinite(df["rre_sym"]).all()

        # identical shapes (same model under modest pose): registration
        # should align well even with random features
        assert (df["cd_ransac"] < 1.0).all()

        row = metrics_row(df, "chair")
        assert 0 <= row["rre_045_sym"] <= 1

        # resume path: second App must load, not recompute
        app2 = App(config)
        df2 = app2.run()
        np.testing.assert_allclose(
            df2["rre_sym"].to_numpy(), df["rre_sym"].to_numpy()
        )
