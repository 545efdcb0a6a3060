"""Triplet datasets over ShapeNet categories.

``TripletDatasetBase`` mirrors ``datasets/ChairDataset.py:31-237``
(pos/neg samplers, local-pair mining, collate) and ``CategoryDataset``
mirrors ``datasets/CategoryDataset.py:33-302`` (CD-matrix driven sampling,
fixed eval rotations, ``filter_data`` pruning). Torch-free; collate
produces padded batch arrays for the TPU pipeline.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from corsair_tpu.core.voxelize import sparse_collate_np, voxelize_host
from corsair_tpu.data.pair_mining import (
    generate_rand_negative_pairs,
    get_matching_indices,
)
from corsair_tpu.data.readers import Reader
from corsair_tpu.ops.transforms import apply_transform, random_rotation

_CONFIG_DIR = os.path.join(
    os.path.dirname(__file__), "..", "..", "configs"
)


class TripletDatasetBase:
    """Base triplet machinery (pos/neg instance sampling, local pairs,
    collate). Subclasses provide ``_getpc``/``_getlabel``/``_getidx``."""

    voxel_size: float = 0.03

    def generate_positive_inst(self, idx):
        topn = self.pos_n
        dist_rank = np.argsort(self.table[idx, :])
        select_idx = np.random.choice(np.arange(topn))
        return dist_rank[select_idx]

    def generate_negative_inst(self, idx):
        topn = self.neg_n
        dist_rank = np.argsort(-self.table[idx, :])
        select_idx = np.random.choice(np.arange(topn)) + 1
        return dist_rank[select_idx]

    def generate_local_pair(self, base, pos, neg, sample=1024, radius=0.03):
        """PiP / PiN / NiN pair mining
        (``datasets/CategoryDataset.py:121-151``)."""
        N0, N1, N2 = base.shape[0], pos.shape[0], neg.shape[0]
        pip = np.array(get_matching_indices(base, pos, radius))
        if pip.shape[0] < 0.1 * min(N0, N1):
            return None, None, None
        pin = generate_rand_negative_pairs(
            pip, max(N0, N1), N0, N1, N_neg=int(len(pip))
        )
        nin = generate_rand_negative_pairs(
            [[0, 0]], max(N0, N2), N0, N2, N_neg=int(len(pip))
        )
        dist_pin = np.linalg.norm(base[pin[:, 0]] - pos[pin[:, 1]], 2, 1)
        dist_nin = np.linalg.norm(base[nin[:, 0]] - neg[nin[:, 1]], 2, 1)
        pin = pin[dist_pin > 0.1]
        nin = nin[dist_nin > 0.1]
        np.random.shuffle(pip)
        np.random.shuffle(pin)
        np.random.shuffle(nin)
        return pip[:sample, :], pin[:sample, :], nin[:sample, :]

    def quant(self, rot_coords, coords):
        """Dedup on floor(rot/voxel) keys
        (``datasets/CategoryDataset.py:179-197``)."""
        _, grid, kept = voxelize_host(rot_coords, self.voxel_size)
        return rot_coords[kept], grid, coords[kept]

    def _getlabel(self, idx):
        return 0

    def _getidx(self, index):
        return index

    def collate_pair_fn(self, list_data, capacity: Optional[int] = None):
        """Batch triplets; pair index lists get per-sample offsets
        (``datasets/ChairDataset.py:130-237``)."""
        (base_d, pos_d, neg_d, pip_l, pin_l, nin_l) = zip(*list_data)

        def collate_role(dicts):
            coords = [d["coord"] for d in dicts]
            feats = [d["feat"].astype(np.float32) for d in dicts]
            c, b, f, v = sparse_collate_np(coords, feats, capacity)
            return {
                "coords": c, "batch": b, "feat": f, "valid": v,
                "origin": np.concatenate(
                    [d["origin"] for d in dicts], 0
                ).astype(np.float32),
                "T": np.stack([d["T"] for d in dicts]).astype(np.float32),
                "idx": np.asarray([d["idx"] for d in dicts], np.int32),
                "sym": np.asarray([d["sym"] for d in dicts], np.int32),
            }

        data = {}
        for role, dicts in (("base", base_d), ("pos", pos_d), ("neg", neg_d)):
            r = collate_role(dicts)
            for k, val in r.items():
                data[f"{role}_{k}"] = val

        pip_off, pin_off, nin_off = [], [], []
        pos_curr = np.zeros(2, np.int64)
        neg_curr = np.zeros(2, np.int64)
        for i in range(len(base_d)):
            nb = base_d[i]["coord"].shape[0]
            np_ = pos_d[i]["coord"].shape[0]
            nn = neg_d[i]["coord"].shape[0]
            pip_off.append(np.asarray(pip_l[i]) + pos_curr)
            pin_off.append(np.asarray(pin_l[i]) + pos_curr)
            nin_off.append(np.asarray(nin_l[i]) + neg_curr)
            pos_curr = pos_curr + np.array([nb, np_])
            neg_curr = neg_curr + np.array([nb, nn])
        data["PiP_pairs"] = np.concatenate(pip_off, 0).astype(np.int32)
        data["PiN_pairs"] = np.concatenate(pin_off, 0).astype(np.int32)
        data["NiN_pairs"] = np.concatenate(nin_off, 0).astype(np.int32)
        return data

    def __len__(self):
        return len(self.pcs)


class CategoryDataset(TripletDatasetBase):
    """ShapeNet-category triplet dataset with precomputed CD matrix."""

    def __init__(self, root, split, catid, dist_mat_root, pos_ratio,
                 neg_ratio, voxel_size, config_dir: str = None,
                 sym_ref: Optional[List[int]] = None):
        self.root, self.split, self.catid = root, split, catid
        self.voxel_size = voxel_size
        self.pos_ratio, self.neg_ratio = pos_ratio, neg_ratio
        cfg_dir = config_dir or _CONFIG_DIR
        self.fix_trans = np.load(os.path.join(cfg_dir, "fix_trans.npy"))

        dist_mat_ref = np.load(
            os.path.join(dist_mat_root, f"{catid}_{split}.npy")
        )
        reader = Reader(root, catid, split, 10000)
        pcs_ref = [reader[i] for i in range(len(reader))]

        self.dist_mat, self.pcs, self.sym_label = self.filter_data(
            dist_mat_ref, pcs_ref, sym_ref
        )
        self.table = self.dist_mat
        self.rank_a = np.argsort(self.dist_mat, 1)
        self.rank_d = np.argsort(-1 * self.dist_mat, 1)
        self.pos_n = int(len(self) * pos_ratio)
        self.neg_n = int(len(self) * neg_ratio)

    def filter_data(self, dist_mat_ref, pcs_ref, sym_ref, thres=0.15,
                    num=3):
        """Drop objects with < num neighbors at CD <= thres, iterating to
        a fixed point (``datasets/CategoryDataset.py:92-119``)."""
        while True:
            z = np.array([(t <= thres).sum() for t in dist_mat_ref])
            mask = (z >= num).nonzero()[0]
            if len(mask) == len(dist_mat_ref):
                break
            dist_mat_ref = dist_mat_ref[mask][:, mask].copy()
            pcs_ref = [pcs_ref[i] for i in mask]
            if sym_ref is not None:
                sym_ref = [sym_ref[i] for i in mask]
        return dist_mat_ref, pcs_ref, sym_ref

    def generate_positive_inst(self, idx):
        """Linearly-decaying sampling over the top-pos_n CD ranks, valid
        means CD < 0.15 (``datasets/CategoryDataset.py:153-164``)."""
        topn = self.pos_n
        dist_rank = np.argsort(self.dist_mat[idx, :])
        valid = (self.dist_mat[idx, :] < 0.15).nonzero()[0]
        topn = max(min(topn, len(valid)), 1)
        prob = 2 * (np.arange(topn) + 1) / ((1 + topn) * topn)
        prob = np.flip(prob)
        select_idx = np.random.choice(np.arange(topn), p=prob)
        return dist_rank[select_idx]

    def generate_negative_inst(self, idx):
        topn = self.neg_n
        dist_rank = np.argsort(-self.dist_mat[idx, :])
        valid = (self.dist_mat[idx, :] > 0.2).nonzero()[0]
        topn = max(min(topn, len(valid) - 1), 1)
        prob = 2 * (np.arange(topn) + 1) / ((1 + topn) * topn)
        prob = np.flip(prob)
        select_idx = np.random.choice(np.arange(topn), p=prob) + 1
        return dist_rank[select_idx]

    def _get_sym(self, idx):
        if self.sym_label is None:
            return 1
        return self.sym_label[idx]

    def _getpc(self, idx):
        return self.pcs[idx]

    def __getitem__(self, index):
        idx = self._getidx(index)
        pip = pin = nin = None
        while not (isinstance(pip, np.ndarray)
                   and isinstance(pin, np.ndarray)
                   and isinstance(nin, np.ndarray)):
            positive_idx = self.generate_positive_inst(index)
            negative_idx = self.generate_negative_inst(index)

            base_coords = self._getpc(idx)
            pos_coords = self._getpc(positive_idx)
            neg_coords = self._getpc(negative_idx)

            base_sym = self._get_sym(idx)
            pos_sym = self._get_sym(positive_idx)
            neg_sym = self._get_sym(negative_idx)

            if self.split == "train":
                rot_base, base_T = random_rotation(base_coords)
                rot_pos, pos_T = random_rotation(pos_coords)
                rot_neg, neg_T = random_rotation(neg_coords)
            else:
                base_T = self.fix_trans[index, 0]
                pos_T = self.fix_trans[index, 1]
                neg_T = self.fix_trans[index, 2]
                rot_base = apply_transform(base_coords, base_T)
                rot_pos = apply_transform(pos_coords, pos_T)
                rot_neg = apply_transform(neg_coords, neg_T)

            rot_base, base_grid, base_coords = self.quant(rot_base,
                                                          base_coords)
            rot_pos, pos_grid, pos_coords = self.quant(rot_pos, pos_coords)
            rot_neg, neg_grid, neg_coords = self.quant(rot_neg, neg_coords)

            pip, pin, nin = self.generate_local_pair(
                base_coords, pos_coords, neg_coords
            )

        def role(grid, rot, T, idx_, sym):
            return {
                "coord": grid,
                "origin": rot,
                "feat": np.ones([len(rot), 1]),
                "T": T,
                "idx": idx_,
                "sym": sym,
            }

        return (
            role(base_grid, rot_base, base_T, idx, base_sym),
            role(pos_grid, rot_pos, pos_T, positive_idx, pos_sym),
            role(neg_grid, rot_neg, neg_T, negative_idx, neg_sym),
            pip, pin, nin,
        )
