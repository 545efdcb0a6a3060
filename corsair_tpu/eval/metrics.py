"""RRE/RTE threshold tables (``evaluation.py:334-346``,
``compute_metrics_shapenet.py:52-65``)."""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

RTE_THRESHOLDS = (0.02, 0.05, 0.10, 0.15)
RRE_THRESHOLDS_DEG = (5.0, 15.0, 45.0)


def compute_rte_table(t_losses: Sequence[float],
                      thresholds=RTE_THRESHOLDS) -> Dict[float, float]:
    t = np.asarray(t_losses, dtype=np.float64)
    return {thr: float(np.sum(t <= thr) / len(t)) for thr in thresholds}


def compute_rre_table(r_losses_rad: Sequence[float],
                      thresholds_deg=RRE_THRESHOLDS_DEG) -> Dict[float, float]:
    r = np.rad2deg(np.asarray(r_losses_rad, dtype=np.float64))
    return {thr: float(np.sum(r <= thr) / len(r)) for thr in thresholds_deg}


def summarize_registration(t_losses, r_losses, label="") -> str:
    rte = compute_rte_table(t_losses)
    rre = compute_rre_table(r_losses)
    lines = [
        f"{label}:",
        f"translation error: {np.mean(t_losses)}",
        ", ".join(f"rte {k:.2f}: {v:.4f}" for k, v in rte.items()),
        f"rotation error: {np.mean(r_losses)}",
        ", ".join(f"rre {int(k)}: {v:.4f}" for k, v in rre.items()),
    ]
    return "\n".join(lines)
