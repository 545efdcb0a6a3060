"""Training-convergence smoke: losses trend down and per-point features
become correspondence-discriminative on synthetic triplets."""

import numpy as np
import pytest

from tests.synthetic_data import CATID, build_tree


@pytest.mark.slow
class TestConvergence:
    def test_point_features_learn_correspondence(self, tmp_path_factory):
        import jax
        import os

        from corsair_tpu.data.cad_lib import CustomizeCADLib
        from corsair_tpu.data.scan2cad_info import Scan2cadInfo
        from corsair_tpu.data.scannet_dataset import ScannetDataset
        from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor
        from corsair_tpu.train.trainer import TrainConfig, Trainer

        root = str(tmp_path_factory.mktemp("conv"))
        tree = build_tree(root, n_scans=6)
        info = Scan2cadInfo(
            cad_root=tree["shapenet_root"], scan_root=tree["scan_root"],
            catid=CATID, annotation_dir=tree["annotation_root"],
            config_dir=tree["config_dir"],
        )
        lib = CustomizeCADLib(
            root=tree["shapenet_root"], catid=CATID,
            ids=tree["model_ids"],
            table_path=os.path.join(tree["config_dir"],
                                    f"{CATID}_scan2cad.npy"),
            voxel_size=0.05, preload=False,
        )
        ds = ScannetDataset(
            scan_root=tree["scan_root"], cad_root=tree["shapenet_root"],
            CADLib=lib, Scan2CadInfo=info, split="test", catid=CATID,
            pos_ratio=0.5, neg_ratio=0.5, voxel_size=0.05, preload=False,
            config_dir=tree["config_dir"],
        )

        ex = FeatureExtractor(ExtractorConfig())
        trainer = Trainer(ex, TrainConfig(learning_rate=0.03),
                          pair_cap=512)
        params, opt_state = trainer.init(jax.random.PRNGKey(0))

        np.random.seed(0)
        # one fixed batch, shapes stay static -> single compile
        batch = ds.collate_pair_fn([ds[0], ds[1]])
        cap = int(max(batch[f"{r}_valid"].sum()
                      for r in ("base", "pos", "neg"))) + 16
        losses = []
        for step in range(12):
            params, opt_state, loss, aux = trainer.step(
                params, opt_state, batch, cap
            )
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        # optimization makes progress on the fixed batch
        assert np.mean(losses[-3:]) < np.mean(losses[:3]) * 0.8, losses
