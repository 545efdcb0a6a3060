"""Test-time (inference) datasets — no triplet mining, no random rotation
for the library side.

Parity targets:
* ``CategoryTestTimeDataset`` (``datasets/CategoryTestTimeDataset.py:33-100``):
  CAD database as-is, quantized, collate without poses;
* ``Scan2cadTestTimeDataset`` (``datasets/Scan2cadTestTimeDataset.py:23-44``):
  same over the Scan2CAD-used CAD subset from ``unique_cads.csv``;
* ``ScannetTestTimeDataset`` (``datasets/ScannetTestTimeDataset.py:34-165``):
  (scan, best-match CAD) pairs, scan aligned into the CAD frame, each
  centered on its own mean, scaled by the CAD radius, scan randomly
  rotated.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from corsair_tpu.core.voxelize import sparse_collate_np, voxelize_host
from corsair_tpu.data.readers import (
    Reader,
    Scan2cadLibReader,
    ScannetReader,
    load_raw_pc,
    path_dict,
)
from corsair_tpu.data.scan2cad_info import load_csv
from corsair_tpu.ops.transforms import apply_transform, random_rotation, to_T


class CategoryTestTimeDataset:
    """Test-time CAD database (no random rotation)."""

    def __init__(self, root, split, catid, voxel_size):
        self.root, self.split, self.catid = root, split, catid
        self.voxel_size = voxel_size
        reader = Reader(root, catid, split, 10000)
        self.pcs = [reader[i] for i in range(len(reader))]

    def _getpc(self, idx):
        return self.pcs[idx]

    def quant(self, rot_coords, coords):
        _, grid, kept = voxelize_host(rot_coords, self.voxel_size)
        return rot_coords[kept], grid, coords[kept]

    def __len__(self):
        return len(self.pcs)

    def __getitem__(self, idx):
        base_coords = self._getpc(idx)
        rot, grid, base_coords = self.quant(base_coords, base_coords)
        return {
            "coord": grid,
            "origin": rot,
            "feat": np.ones([len(rot), 1]),
            "idx": idx,
        }

    def collate_pair_fn(self, list_data, capacity: Optional[int] = None):
        coords = [d["coord"] for d in list_data]
        feats = [d["feat"].astype(np.float32) for d in list_data]
        c, b, f, v = sparse_collate_np(coords, feats, capacity)
        return {
            "base_coords": c,
            "base_batch": b,
            "base_feat": f,
            "base_valid": v,
            "base_origin": np.concatenate(
                [d["origin"] for d in list_data], 0
            ).astype(np.float32),
            "base_idx": np.asarray(
                [d["idx"] for d in list_data], np.int32
            ),
        }


class Scan2cadTestTimeDataset(CategoryTestTimeDataset):
    """Scan2CAD-used CAD subset from unique_cads.csv."""

    def __init__(self, root, catid, scan2cad_dict, voxel_size):
        self.root, self.catid = root, catid
        self.voxel_size = voxel_size
        self.id2path = path_dict(root)
        self.ids = [
            obj_id for cat_id, obj_id in load_csv(scan2cad_dict)
            if cat_id == catid
        ]
        reader = Scan2cadLibReader(root, catid, self.ids, self.id2path,
                                   10000)
        self.pcs = [reader[i] for i in range(len(reader))]


class ScannetTestTimeDataset:
    """(scan, best-match CAD) pairs for test-time registration."""

    def __init__(self, scan_root, cad_root, CADLib, Scan2CadInfo, split,
                 catid, voxel_size, preload=True):
        self.scan_root = scan_root
        self.cad_root = cad_root
        self.catid = catid
        self.split = split
        self.voxel_size = voxel_size
        self.preload = preload
        self.CADLib = CADLib
        self.table = self.CADLib.table
        r = np.arange(len(self.table))
        self.table[r, r] = 0
        self.id2idx = self.CADLib.id2idx
        (self.files, self.BestMatches, self.CadPoses,
         self.ScanPoses) = Scan2CadInfo.get_split(split)
        if preload:
            reader = ScannetReader(scan_root, self.files, 10000)
            self.pcs = [reader[i] for i in range(len(reader))]
        else:
            self.pcs = [os.path.join(scan_root, f) for f in self.files]

    def _getscan(self, idx):
        if self.preload:
            return self.pcs[idx]
        return load_raw_pc(self.pcs[idx], 10000)

    def _getcad(self, idx):
        if self.preload:
            return self.CADLib.CadPcs[idx]
        return load_raw_pc(self.CADLib.CadPcs[idx], 10000)

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx):
        positive_idx = self.id2idx[self.BestMatches[idx]]
        base_coords = self._getscan(idx)
        pos_coords = self._getcad(positive_idx)

        T_base = to_T(
            self.ScanPoses[idx]["translation"],
            self.ScanPoses[idx]["rotation"],
            self.ScanPoses[idx]["scale"],
        )
        T_pos = to_T(
            self.CadPoses[idx]["translation"],
            self.CadPoses[idx]["rotation"],
            self.CadPoses[idx]["scale"],
        )
        base_coords = apply_transform(
            base_coords, np.linalg.inv(T_pos) @ T_base
        )
        # each centered on its own mean (reference :132-134 quirk)
        base_coords = base_coords - base_coords.mean(0)
        pos_coords = pos_coords - pos_coords.mean(0)
        r = np.max(np.linalg.norm(pos_coords, 2, 1))
        base_coords = base_coords / r
        pos_coords = pos_coords / r

        rot_base, base_T = random_rotation(base_coords)
        base = {
            "coord": rot_base,
            "origin": rot_base,
            "feat": np.ones([len(rot_base), 1]),
            "T": base_T,
            "idx": idx,
        }
        pos = {
            "coord": pos_coords,
            "origin": pos_coords,
            "feat": np.ones([len(pos_coords), 1]),
            "T": np.eye(4),
            "idx": positive_idx,
        }
        return base, pos
