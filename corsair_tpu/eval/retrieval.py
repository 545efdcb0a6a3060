"""Retrieval metrics: Precision@M, Top1-CD, mAP.

Protocol-faithful ports of ``utils/retrieval.py``; every rank-window quirk
is kept:

* self-retrieval (``retrieval_eval`` ``:82-126``) excludes the query itself
  via ``rank[1 : accept_range + 1]``;
* scan2cad retrieval (``scan2cad_retrieval_eval_dist`` ``:139-167``) does
  NOT exclude (scans are not in the library): ``rank[:pos_n]``;
* ground-truth ranking uses the Chamfer table whose diagonal is 200
  (``configs/*_scan2cad.npy`` convention);
* Top1-CD reads ``table[pred_top1, gt_top1]`` and maps the 200 sentinel to 0
  in the self-retrieval variant.

Descriptor distances: cosine for self-retrieval (scipy ``pdist`` parity),
L2 for scan2cad (``cdist`` default, ``utils/retrieval.py:175``).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def average_precision(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """Pure-numpy ``sklearn.metrics.average_precision_score`` for binary
    labels: AP = sum_n (R_n - R_{n-1}) * P_n over the score-descending
    ranking."""
    y_true = np.asarray(y_true).astype(bool)
    y_score = np.asarray(y_score, dtype=np.float64)
    n_pos = y_true.sum()
    if n_pos == 0:
        return 0.0
    # sort by descending score; average precision over distinct thresholds
    order = np.argsort(-y_score, kind="mergesort")
    y_sorted = y_true[order]
    s_sorted = y_score[order]
    tp = np.cumsum(y_sorted)
    fp = np.cumsum(~y_sorted)
    # group ties: only evaluate at the last index of each distinct score
    distinct = np.r_[np.nonzero(np.diff(s_sorted))[0], len(s_sorted) - 1]
    tp_d = tp[distinct]
    fp_d = fp[distinct]
    precision = tp_d / (tp_d + fp_d)
    recall = tp_d / n_pos
    recall_prev = np.r_[0.0, recall[:-1]]
    return float(np.sum((recall - recall_prev) * precision))


def _cosine_pdist(descriptors: np.ndarray) -> np.ndarray:
    d = descriptors / np.maximum(
        np.linalg.norm(descriptors, axis=1, keepdims=True), 1e-12
    )
    return np.clip(1.0 - d @ d.T, 0.0, None)


def compute_mAP(descriptors: np.ndarray, gt_labels: np.ndarray):
    """Label-based instance/class mAP (``utils/retrieval.py:23-43``)."""
    dists = _cosine_pdist(descriptors)
    inst_scores: List[float] = []
    cls_scores: Dict = {}
    for d, c in zip(dists, gt_labels):
        positive = gt_labels == c
        score = 100.0 * average_precision(positive, 2 - d)
        inst_scores.append(score)
        cls_scores.setdefault(c, []).append(score)
    mAP_cls = [float(np.mean(v)) for v in cls_scores.values()]
    return float(np.mean(inst_scores)), mAP_cls


def _topk_membership(pred_topk: np.ndarray, gt_topk: np.ndarray,
                     n_items: int) -> np.ndarray:
    """``out[i, j] = pred_topk[i, j] in gt_topk[i]`` for per-row top-k
    windows, via one scattered membership table instead of per-row
    ``isin`` scans."""
    rows = np.arange(len(gt_topk))[:, None]
    member = np.zeros((len(gt_topk), n_items), bool)
    member[rows, gt_topk] = True
    return member[rows, pred_topk]


def retrieval_dist(dists: np.ndarray, threshold: float, table: np.ndarray):
    """Self-retrieval metrics from a precomputed distance matrix.

    Protocol per ``utils/retrieval.py:46-79``: the predicted window skips
    rank 0 (the query itself is in the library); the ground-truth window
    starts at rank 0 because the CD table's diagonal is the 200 sentinel
    (which also sorts the self-match last); a predicted/GT top-1 pair that
    hits the sentinel counts as zero Top1-CD error.
    """
    accept_range = int(len(dists) * threshold)
    rows = np.arange(len(dists))
    pred = np.argsort(dists, axis=1)[:, 1 : accept_range + 1]
    gt = np.argsort(table, axis=1)[:, :accept_range]
    positive = _topk_membership(pred, gt, table.shape[1])

    top1_cd = table[pred[:, 0], gt[:, 0]]
    top1_cd = np.where(top1_cd == 200, 0.0, top1_cd)

    hits = positive.sum(axis=1)
    ap = np.zeros(len(dists))
    for i in rows[hits > 0]:
        ap[i] = 100.0 * average_precision(
            positive[i].astype(np.int32), 2 - dists[i, pred[i]]
        )
    return {
        "mAP": float(np.mean(ap)),
        "percision": float(  # sic — reference result key
            np.mean(100.0 * hits / accept_range)
        ),
        "top1_error": float(np.mean(top1_cd)),
    }


def retrieval_eval(descriptors: np.ndarray, threshold: float,
                   table: np.ndarray):
    """Self-retrieval from descriptors (cosine), ``utils/retrieval.py:82-126``."""
    return retrieval_dist(_cosine_pdist(descriptors), threshold, table)


def get_rank(descriptors: np.ndarray, top_n: int = 10):
    dists = _cosine_pdist(descriptors)
    return np.argsort(dists, 1)[:, 1 : top_n + 1]


def scan2cad_retrieval_eval_dist(dists: np.ndarray, table: np.ndarray,
                                 best_match: np.ndarray, pos_n: int):
    """Scan2CAD retrieval metrics.

    Protocol per ``utils/retrieval.py:139-167``: scans are NOT in the CAD
    library, so (unlike ``retrieval_dist``) the predicted window starts at
    rank 0; ground truth is the Chamfer ranking of each scan's annotated
    best-match row. Returns the per-scan top-1 predictions/GT reused as
    registration targets (``evaluation.py:301``).
    """
    pred = np.argsort(dists, axis=1)
    gt = np.argsort(table[best_match, :], axis=1)
    positive = _topk_membership(pred[:, :pos_n], gt[:, :pos_n],
                                table.shape[1])
    return {
        "precision": float(
            np.mean(100.0 * positive.sum(axis=1) / pos_n)
        ),
        "top1_error": float(np.mean(table[pred[:, 0], gt[:, 0]])),
        "top1_predict": [int(i) for i in pred[:, 0]],
        "gt": [int(i) for i in gt[:, 0]],
    }


def scan2cad_retrieval_eval(scan_feats: np.ndarray, lib_feats: np.ndarray,
                            best_match: np.ndarray, table: np.ndarray,
                            pos_n: int):
    """L2 descriptor distances -> scan2cad metrics
    (``utils/retrieval.py:170-177``)."""
    a2 = np.sum(scan_feats**2, axis=1, keepdims=True)
    b2 = np.sum(lib_feats**2, axis=1, keepdims=True)
    d2 = np.clip(a2 + b2.T - 2.0 * scan_feats @ lib_feats.T, 0, None)
    dists = np.sqrt(d2)
    return scan2cad_retrieval_eval_dist(dists, table, best_match, pos_n)
