"""ScannetDataset triplet/training path on the synthetic tree."""

import numpy as np
import pytest

from tests.synthetic_data import CATID, build_tree


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import os

    root = str(tmp_path_factory.mktemp("scannet_train"))
    tree = build_tree(root, n_scans=6)
    from corsair_tpu.data.cad_lib import CustomizeCADLib
    from corsair_tpu.data.scan2cad_info import Scan2cadInfo
    from corsair_tpu.data.scannet_dataset import ScannetDataset

    info = Scan2cadInfo(
        cad_root=tree["shapenet_root"], scan_root=tree["scan_root"],
        catid=CATID, annotation_dir=tree["annotation_root"],
        config_dir=tree["config_dir"],
    )
    lib = CustomizeCADLib(
        root=tree["shapenet_root"], catid=CATID, ids=tree["model_ids"],
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
    return tree, info, lib, ds


class TestTripletPath:
    def test_getitem_produces_pairs(self, setup):
        _, _, _, ds = setup
        np.random.seed(0)
        base, pos, neg, pip, pin, nin = ds[0]
        for role in (base, pos, neg):
            assert role["coord"].shape[1] == 3
            assert len(role["coord"]) == len(role["origin"])
        assert pip.shape[1] == 2 and len(pip) > 0
        assert pin.shape[1] == 2
        assert nin.shape[1] == 2
        # positive pairs index valid rows
        assert pip[:, 0].max() < len(base["coord"])
        assert pip[:, 1].max() < len(pos["coord"])

    def test_collate_offsets(self, setup):
        _, _, _, ds = setup
        np.random.seed(1)
        batch = ds.collate_pair_fn([ds[0], ds[1]])
        n_base0 = None
        # PiP pairs of sample 1 must be offset beyond sample 0's rows
        assert batch["PiP_pairs"].ndim == 2
        assert batch["base_valid"].sum() > 0
        assert batch["pos_sym"].shape == (2,)

    @pytest.mark.slow
    def test_train_step_on_real_batch(self, setup):
        import jax

        from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor
        from corsair_tpu.train.trainer import TrainConfig, Trainer

        _, _, _, ds = setup
        np.random.seed(2)
        batch = ds.collate_pair_fn([ds[0], ds[1]])
        cap = max(int(batch[f"{r}_valid"].sum()) for r in
                  ("base", "pos", "neg")) + 8
        ex = FeatureExtractor(ExtractorConfig())
        trainer = Trainer(ex, TrainConfig(learning_rate=0.01),
                          pair_cap=256)
        params, opt_state = trainer.init(jax.random.PRNGKey(0))
        # collate produced arrays at exact total size; recollate to cap
        batch = ds.collate_pair_fn([ds[0], ds[1]], capacity=None)
        params, opt_state, loss, aux = trainer.step(
            params, opt_state, batch, cap
        )
        assert np.isfinite(float(loss))


class TestTrainCli:
    @pytest.mark.slow
    def test_main_one_epoch(self, setup, tmp_path, monkeypatch):
        """The finetune CLI end-to-end: one epoch over the synthetic
        tree, checkpoint written, loss logged (cli/train.py parity with
        the reference's training loop entry)."""
        import os

        tree, _, _, _ = setup
        from corsair_tpu.cli.train import main

        monkeypatch.chdir(tmp_path)
        main([
            "--shapenet-pc15k-root", tree["shapenet_root"],
            "--scan2cad-pc-root", tree["scan_root"],
            "--scan2cad-annotation-root", tree["annotation_root"],
            "--config-dir", tree["config_dir"],
            "--category", "chair",
            "--voxel-size", "0.05",
            "--batch-size", "2",
            "--epochs", "1",
            "--save-dir", str(tmp_path / "ckpts"),
        ])
        ckpts = os.listdir(tmp_path / "ckpts")
        assert any(f.endswith(".npz") or "finetune" in f for f in ckpts)
