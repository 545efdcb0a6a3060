"""Measure the reference's host-side registration wall-clock on THIS host.

Grounds bench.py's ``vs_baseline`` (VERDICT r4 missing #3): the
reference's deployed registration path is host code that runs here
unmodified — ``find_kcorr`` is a scipy KDTree (``utils/eval_pose.py:
48-79`` -> ``utils/find_nn.py:43-49``), the symmetric cut is a
100-iteration sklearn-KMeans loop (``utils/symmetry.py:182-259``), the
per-candidate Chamfer is a KDTree query (``utils/preprocess.py:67-70``),
and ``split_corr`` re-runs per-sector KDTree kNN for every cyclic shift
(``utils/symmetry.py:145-179``, call sites ``:303-356``). This script
imports those functions FROM THE REFERENCE TREE and times them at
protocol scale per query.

Deliberately zero-costed (each one makes the derived reference
throughput an OVERESTIMATE, so ``vs_baseline`` is a lower bound):

* the 9 Open3D RANSAC invocations per query (1 vanilla + 4 shifts + 4
  reflected; C++/OpenMP, ransac_n=10, max_iteration=100k w/ early exit,
  ``utils/eval_pose.py:82-100``) — Open3D is not installed here;
* MinkowskiEngine feature extraction (GPU, per query + library);
* retrieval (cdist + argsort).

Writes logs/reference_baseline.json; BASELINE.json's
``reference_host_measured`` block is updated from it by hand (values
are also printed).
"""

import json
import os
import sys
import time
import types

import numpy as np

# The timed functions never touch open3d/transforms3d/matplotlib at
# call time, but the reference modules import them at module level —
# stub what this env lacks so the reference's own code loads.
for _name in ("open3d", "transforms3d", "matplotlib", "matplotlib.cm"):
    if _name not in sys.modules:
        try:
            __import__(_name)
        except ImportError:
            mod = types.ModuleType(_name)
            if _name == "open3d":
                mod.utility = types.SimpleNamespace(random=None)
                mod.pipelines = types.SimpleNamespace(registration=None)
                mod.geometry = types.SimpleNamespace()
            sys.modules[_name] = mod

sys.path.insert(0, "/root/reference")

from utils.eval_pose import find_kcorr                      # noqa: E402
from utils.preprocess import (                              # noqa: E402
    apply_transform, chamfer_kdtree_1direction,
)
from utils.symmetry import split_corr, symmetric_cut4      # noqa: E402


def make_query(rng, n, folds):
    """A protocol-scale (cloud, feature) pair: unit-sphere surface
    points + L2-normalized 16-D features INVARIANT under ``folds``-fold
    rotation about y. Mirrors what the cut consumes on real data: a
    point's 50 feature-NNs are its symmetric copies' neighborhoods, so
    the acceptance KMeans sees ``folds`` spatially-separated tight
    clusters (``utils/symmetry.py:198-236`` accepts center distance
    > 0.15, cluster error < 0.15)."""
    pts = rng.randn(n, 3).astype(np.float32)
    pts /= np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-9)
    theta = np.arctan2(pts[:, 2], pts[:, 0])
    q = np.stack([
        3.0 * pts[:, 1],
        np.cos(folds * theta), np.sin(folds * theta),
    ], axis=1).astype(np.float32)
    W = rng.randn(3, 16).astype(np.float32)
    feat = q @ W + 0.02 * rng.randn(n, 16).astype(np.float32)
    feat /= np.maximum(np.linalg.norm(feat, axis=1, keepdims=True), 1e-9)
    return pts, feat


def time_one_query(rng, n, K):
    """Per-query wall of the reference host path at symmetry group K
    (K=4 when sym>=2: 2 cuts, 8 split_corr+chamfer rounds; K=2: 2 cuts,
    2 rounds — ``utils/symmetry.py:262-358``)."""
    xyz0, F0 = make_query(rng, n, K)
    xyz1, F1 = make_query(rng, n, K)
    out = {}

    t0 = time.perf_counter()
    idx0, idx1 = find_kcorr(F0, F1, k=5, subsample_size=-1)
    out["find_kcorr_s"] = time.perf_counter() - t0

    def cut(F, xyz):
        # On rejection of all 100 fits the reference raises from inside
        # (``utils/symmetry.py:238`` on curr_model=None; sym_pose's
        # try/except then falls back) — the 100-fit loop has already run
        # so the timing stands either way; substitute masks so the
        # split_corr/chamfer stages below still get realistic shapes.
        try:
            return list(symmetric_cut4(F, xyz, K, max_sample=100)), True
        except AttributeError:
            from sklearn.cluster import KMeans

            lab = KMeans(n_clusters=K, random_state=0,
                         n_init=10).fit_predict(xyz)
            return [lab == i for i in range(K)], False

    t0 = time.perf_counter()
    base_masks, acc0 = cut(F0, xyz0)
    pos_masks, acc1 = cut(F1, xyz1)
    out["symmetric_cut_x2_s"] = time.perf_counter() - t0
    out["cut_accepted"] = bool(acc0 and acc1)

    n_shifts = 2 * K if K == 4 else K  # + reflected pass when sym>=2
    T_id = np.eye(4, dtype=np.float32)
    t_split = 0.0
    t_chamfer = 0.0
    for _ in range(n_shifts):
        t0 = time.perf_counter()
        pcsA = [xyz0[m] for m in base_masks]
        pcsB = [xyz1[m] for m in pos_masks]
        featsA = [F0[m] for m in base_masks]
        featsB = [F1[m] for m in pos_masks]
        xyzA_corrs, xyzB_corrs = split_corr(
            pcsA, pcsB, featsA, featsB, 5, subsample_size=-1
        )
        t_split += time.perf_counter() - t0
        t0 = time.perf_counter()
        chamfer_kdtree_1direction(apply_transform(xyz0, T_id), xyz1)
        t_chamfer += time.perf_counter() - t0
        pos_masks.append(pos_masks.pop(0))
    # + the vanilla candidate's chamfer (``utils/symmetry.py:283``)
    t0 = time.perf_counter()
    chamfer_kdtree_1direction(apply_transform(xyz0, T_id), xyz1)
    t_chamfer += time.perf_counter() - t0

    out["split_corr_s"] = t_split
    out["chamfer_s"] = t_chamfer
    out["n_ransac_zero_costed"] = n_shifts + 1
    out["total_s"] = (out["find_kcorr_s"] + out["symmetric_cut_x2_s"]
                      + t_split + t_chamfer)
    return out


def derive_denominator(agg, cores: int = 64) -> float:
    """Generous multi-core model of the reference on a big host.

    This host has 1 CPU core (``nproc``), so the KDTree stages
    (``workers=-1``) could not parallelize; the reference's original
    machine could. Grant it ``cores``-fold perfect scaling on every
    KDTree stage (find_kcorr, split_corr, chamfer) and 2x on the
    symmetric-cut loop (the 100 KMeans fits are an inherently
    sequential Python loop over 50-point fits — n_init threading gains
    little, but grant margin), with the 9 RANSACs + feature extraction
    + retrieval still free. Every term errs in the reference's favor,
    so the derived pclouds/sec is an UPPER bound on the reference and
    any vs_baseline built on it a LOWER bound."""
    t = (agg["find_kcorr_s"] / cores + agg["symmetric_cut_x2_s"] / 2
         + agg["split_corr_s"] / cores + agg["chamfer_s"] / cores)
    return 1.0 / t


def main():
    rng = np.random.RandomState(0)
    results = {"host": os.uname().nodename, "host_cores": os.cpu_count(),
               "n_queries_timed": 4}
    best = 0.0
    for K, n in ((4, 15000), (4, 10000), (2, 15000)):
        runs = [time_one_query(rng, n, K) for _ in range(4)]
        agg = {k: float(np.median([r[k] for r in runs]))
               for k in runs[0] if k.endswith("_s")}
        agg["cut_accept_frac"] = float(
            np.mean([r["cut_accepted"] for r in runs])
        )
        agg["n_ransac_zero_costed"] = runs[0]["n_ransac_zero_costed"]
        agg["pclouds_per_sec_upper_bound"] = 1.0 / agg["total_s"]
        agg["pclouds_per_sec_64core_model"] = derive_denominator(agg)
        best = max(best, agg["pclouds_per_sec_64core_model"])
        results[f"K{K}_n{n}"] = agg
        print(f"K={K} n={n}: {json.dumps(agg)}", flush=True)
    # the single number bench.py divides by: the reference's FASTEST
    # measured config under the most generous parallelism model
    results["derived_denominator_pclouds_per_sec"] = best
    os.makedirs(os.path.join(os.path.dirname(__file__), "..", "logs"),
                exist_ok=True)
    with open(os.path.join(os.path.dirname(__file__), "..", "logs",
                           "reference_baseline.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
