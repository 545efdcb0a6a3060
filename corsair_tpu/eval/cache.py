"""Registration result cache, npy-compatible with the reference.

Parity with ``evaluation.py:390-441``: per (category, top1|gt) suffix, save
and reload the nine result arrays so a rerun reproduces the tables without
recomputing. File names and layouts match the shipped golden caches
(``data/cache_pose{,_best}/``), so our runs can be diffed directly against
the reference's goldens.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

_FIELDS = (
    "Ts_est_ransac",
    "Ts_est_best",
    "t_losses_ransac",
    "t_losses_sym",
    "r_losses_ransac",
    "r_losses_sym",
    "sym_ransac_success",
    "chamfer_dist_ransac",
    "chamfer_dist_sym",
)


@dataclasses.dataclass
class RegistrationResults:
    Ts_est_ransac: np.ndarray        # [N, 4, 4]
    Ts_est_best: np.ndarray          # [N, 4, 4]
    t_losses_ransac: np.ndarray
    t_losses_sym: np.ndarray
    r_losses_ransac: np.ndarray
    r_losses_sym: np.ndarray
    sym_ransac_success: np.ndarray
    chamfer_dist_ransac: np.ndarray
    chamfer_dist_sym: np.ndarray


def _suffix(category: str, register_top1: bool) -> str:
    return f"_{category}_top1.npy" if register_top1 else f"_{category}_gt.npy"


def save_results(cache_dir: str, category: str, register_top1: bool,
                 results: RegistrationResults) -> None:
    os.makedirs(cache_dir, exist_ok=True)
    sfx = _suffix(category, register_top1)
    for name in _FIELDS:
        arr = np.asarray(getattr(results, name))
        if name.startswith("Ts_"):
            arr = arr.reshape(len(arr), -1)  # flattened 4x4, reference layout
        np.save(os.path.join(cache_dir, name + sfx), arr)


def load_results(cache_dir: str, category: str,
                 register_top1: bool) -> Optional[RegistrationResults]:
    sfx = _suffix(category, register_top1)
    vals = {}
    for name in _FIELDS:
        path = os.path.join(cache_dir, name + sfx)
        if not os.path.exists(path):
            return None
        arr = np.load(path)
        if name.startswith("Ts_"):
            arr = arr.reshape(len(arr), 4, 4)
        vals[name] = arr
    return RegistrationResults(**vals)
