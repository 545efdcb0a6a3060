"""Replay the reference's shipped golden result caches through our metric
pipeline and check the published README tables are reproduced.

This validates the npy cache loader + RRE/RTE metric computations
bit-for-bit against the reference's own outputs (``data/cache_pose*``,
``README.md:173-249`` / BASELINE.md).
"""

import os

import numpy as np
import pytest

from corsair_tpu.eval.cache import load_results
from corsair_tpu.eval.metrics import compute_rre_table, compute_rte_table

GOLDEN = "/root/reference/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(GOLDEN, "cache_pose")),
    reason="reference golden caches not present",
)

# (cache_dir, category, register_top1, sym?) -> expected README numbers
CASES = [
    # scannet_pose_chair (BASELINE.md): Top1 Y: 39.85deg, 9.77/59.82/79.56
    ("cache_pose", "chair", True, "sym",
     dict(mean_rre=39.85, rre=(9.77, 59.82, 79.56),
          mean_rte=0.27, rte002=0.30)),
    ("cache_pose", "chair", True, "ransac",
     dict(mean_rre=38.84, rre=(8.06, 54.98, 79.46),
          mean_rte=0.28, rte002=0.30)),
    ("cache_pose", "chair", False, "sym",
     dict(mean_rre=21.00, rre=(19.54, 79.15, 91.84),
          mean_rte=0.15, rte002=1.61)),
    ("cache_pose_best", "chair", False, "sym",
     dict(mean_rre=21.25, rre=(20.24, 80.87, 91.54),
          mean_rte=0.15, rte002=1.61)),
    ("cache_pose_best", "table", True, "sym",
     dict(mean_rre=54.99, rre=(22.33, 50.52, 61.51),
          mean_rte=0.34, rte002=1.37)),
]


@pytest.mark.parametrize("cdir,cat,top1,kind,expect", CASES)
def test_golden_matches_readme(cdir, cat, top1, kind, expect):
    r = load_results(os.path.join(GOLDEN, cdir), cat, top1)
    assert r is not None
    r_losses = r.r_losses_sym if kind == "sym" else r.r_losses_ransac
    t_losses = r.t_losses_sym if kind == "sym" else r.t_losses_ransac
    rre = compute_rre_table(r_losses)
    rte = compute_rte_table(t_losses)
    assert abs(np.rad2deg(np.mean(r_losses)) - expect["mean_rre"]) < 0.1
    for got, want in zip(
        (rre[5.0] * 100, rre[15.0] * 100, rre[45.0] * 100), expect["rre"]
    ):
        assert abs(got - want) < 0.05, (got, want)
    assert abs(np.mean(t_losses) - expect["mean_rte"]) < 0.01
    assert abs(rte[0.02] * 100 - expect["rte002"]) < 0.05
