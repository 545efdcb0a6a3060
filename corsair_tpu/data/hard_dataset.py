"""Hard-mining triplet dataset: 1 positive / 4 negatives per anchor.

Parity with ``datasets/HardCategoryDataset.py:32-326``: CD-table driven
sampling without replacement (1 positive among CD<0.15, 4 negatives among
CD>0.2), all clouds independently random-rotated and quantized; collate
batches the base plus the flattened multi-positive/negative lists.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from corsair_tpu.core.voxelize import sparse_collate_np, voxelize_host
from corsair_tpu.data.readers import load_norm_pc
from corsair_tpu.ops.transforms import random_rotation


class HardCategoryDataset:
    def __init__(self, root, split, catid, table_root, pos_ratio,
                 neg_ratio, voxel_size, n_pos: int = 1, n_neg: int = 4):
        self.root, self.split, self.catid = root, split, catid
        self.voxel_size = voxel_size
        self.n_pos, self.n_neg = n_pos, n_neg

        files = sorted(
            os.listdir(os.path.join(root, catid, split))
        )
        pcs_ref = [os.path.join(root, catid, split, f) for f in files]
        table_ref = np.load(
            os.path.join(table_root, f"{catid}_{split}.npy")
        )
        self.table, self.pcs = self.filter_data(table_ref, pcs_ref)
        self.rank_a = np.argsort(self.table, 1)
        self.rank_d = np.argsort(-self.table, 1)
        self.pos_n = int(len(self) * pos_ratio)
        self.neg_n = int(len(self) * neg_ratio)

    def filter_data(self, table_ref, pcs_ref, thres=0.15, num=3):
        while True:
            z = np.array([(t <= thres).sum() for t in table_ref])
            mask = (z >= num).nonzero()[0]
            if len(mask) == len(table_ref):
                break
            table_ref = table_ref[mask][:, mask].copy()
            pcs_ref = [pcs_ref[i] for i in mask]
        return table_ref, pcs_ref

    def generate_positive_inst(self, idx):
        topn = min(self.pos_n, int((self.table[idx, :] < 0.15).sum()))
        topn = max(topn, self.n_pos)
        sel = np.random.choice(np.arange(topn), self.n_pos, replace=False)
        return self.rank_a[idx, sel]

    def generate_negative_inst(self, idx):
        topn = min(self.neg_n, int((self.table[idx, :] > 0.2).sum()) - 1)
        topn = max(topn, self.n_neg)
        sel = np.random.choice(np.arange(topn), self.n_neg,
                               replace=False) + 1
        return self.rank_d[idx, sel]

    def _getpc(self, idx):
        return load_norm_pc(self.pcs[idx], 10000)

    def quant(self, rot_coords, coords):
        _, grid, kept = voxelize_host(rot_coords, self.voxel_size)
        return rot_coords[kept], grid, coords[kept]

    def __len__(self):
        return len(self.pcs)

    def __getitem__(self, index):
        positive_idx = self.generate_positive_inst(index)
        negative_idx = self.generate_negative_inst(index)

        def prep(idx):
            coords = self._getpc(idx)
            rot, T = random_rotation(coords)
            rot, grid, coords = self.quant(rot, coords)
            return {
                "coord": grid,
                "origin": rot,
                "feat": np.ones([len(rot), 1]),
                "T": T,
                "idx": idx,
            }

        base = prep(index)
        pos = [prep(int(i)) for i in positive_idx]
        neg = [prep(int(i)) for i in negative_idx]
        return base, pos, neg

    def collate_pair_fn(self, list_data, capacity: Optional[int] = None):
        base_d, pos_l, neg_l = zip(*list_data)
        pos_d = [p for sub in pos_l for p in sub]
        neg_d = [n for sub in neg_l for n in sub]

        def collate_role(dicts):
            c, b, f, v = sparse_collate_np(
                [d["coord"] for d in dicts],
                [d["feat"].astype(np.float32) for d in dicts],
                capacity,
            )
            return {
                "coords": c, "batch": b, "feat": f, "valid": v,
                "origin": np.concatenate(
                    [d["origin"] for d in dicts], 0
                ).astype(np.float32),
                "T": np.stack([d["T"] for d in dicts]).astype(np.float32),
                "idx": np.asarray([d["idx"] for d in dicts], np.int32),
            }

        data = {}
        for role, dicts in (("base", base_d), ("pos", pos_d),
                            ("neg", neg_d)):
            for k, v in collate_role(dicts).items():
                data[f"{role}_{k}"] = v
        data["n_pos_per_anchor"] = self.n_pos
        data["n_neg_per_anchor"] = self.n_neg
        return data
