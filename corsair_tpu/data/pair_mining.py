"""Training-pair mining for the triplet datasets.

Parity with ``utils/preprocess.py:207-259``: radius-search positive point
pairs (scipy KDTree replaces Open3D KDTreeFlann) and hashed random
negative pairs.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
from scipy.spatial import cKDTree


def get_matching_indices(source_pcd: np.ndarray, target_pcd: np.ndarray,
                         search_voxel_size: float,
                         K: Optional[int] = None) -> List[Tuple[int, int]]:
    tree = cKDTree(target_pcd)
    pairs: List[Tuple[int, int]] = []
    neighbors = tree.query_ball_point(source_pcd, search_voxel_size)
    for i, idxs in enumerate(neighbors):
        if K is not None:
            idxs = idxs[:K]
        pairs.extend((i, j) for j in idxs)
    return pairs


def _hash(arr, M: int) -> np.ndarray:
    if isinstance(arr, np.ndarray):
        n, d = arr.shape
    else:
        n, d = len(arr[0]), len(arr)
    hash_vec = np.zeros(n, dtype=np.int64)
    for k in range(d):
        if isinstance(arr, np.ndarray):
            hash_vec += arr[:, k] * M**k
        else:
            hash_vec += arr[k] * M**k
    return hash_vec


def generate_rand_negative_pairs(positive_pairs, hash_seed: int, N0: int,
                                 N1: int, N_neg: int = 0,
                                 rng=None) -> np.ndarray:
    if rng is None:
        rng = np.random
    if not isinstance(positive_pairs, np.ndarray):
        positive_pairs = np.array(positive_pairs, dtype=np.int64)
    if N_neg < 1:
        N_neg = positive_pairs.shape[0] * 2
    pos_keys = _hash(positive_pairs, hash_seed)
    neg_pairs = np.floor(
        rng.rand(int(N_neg), 2) * np.array([[N0, N1]])
    ).astype(np.int64)
    neg_keys = _hash(neg_pairs, hash_seed)
    mask = np.isin(neg_keys, pos_keys, assume_unique=False)
    return neg_pairs[np.logical_not(mask)]
