"""Point-cloud readers for the ShapeNetCore.v2.PC15k / Scan2CAD npy layout.

Parity with ``datasets/Reader.py`` and ``utils/preprocess.py:27-36``:
npy files of [P, 3] points; ``load_norm_pc`` takes the first N points,
centers them and scales to the unit sphere. Torch-free: plain indexable
sequences (map-style datasets).
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import numpy as np


def load_raw_pc(path: str, samples: int) -> np.ndarray:
    return np.load(path)[:samples, :]


def load_norm_pc(path: str, samples: int) -> np.ndarray:
    pc = np.load(path)[:samples, :].astype(np.float64)
    pc -= pc.mean(0)
    pc = pc / np.max(np.linalg.norm(pc, 2, 1))
    return pc


def path_dict(root: str) -> Dict[str, str]:
    """modelId -> npy path over catid/{train,val,test}/modelid.npy
    (``utils/preprocess.py:262-275``)."""
    id2path = {}
    for catid in os.listdir(root):
        if catid == ".DS_Store":
            continue
        for split in ("train", "val", "test"):
            split_dir = os.path.join(root, catid, split)
            if not os.path.isdir(split_dir):
                continue
            for f in os.listdir(split_dir):
                id2path[f.split(".")[0]] = os.path.join(split_dir, f)
    return id2path


class Reader:
    """All models of one category split, normalized."""

    def __init__(self, root, catid, split, npoint):
        self.root, self.catid, self.split = root, catid, split
        self.npoints = npoint
        self.files = sorted(os.listdir(os.path.join(root, catid, split)))

    def __len__(self):
        return len(self.files)

    def __getitem__(self, index):
        return load_norm_pc(
            os.path.join(self.root, self.catid, self.split,
                         self.files[index]),
            self.npoints,
        )


class ScannetReader(Reader):
    """Raw scan objects by explicit file list."""

    def __init__(self, root, files: Sequence[str], npoints):
        self.root = root
        self.files = list(files)
        self.npoints = npoints

    def __getitem__(self, index):
        return load_raw_pc(
            os.path.join(self.root, self.files[index]), self.npoints
        )


class CategoryLibReader(Reader):
    """All splits of one category; raw or normalized."""

    def __init__(self, root, catid, splits, npoint, normal=False):
        self.root, self.catid = root, catid
        self.npoints = npoint
        self.normal = normal
        self.Id2Index: Dict[str, int] = {}
        self.files: List[str] = []
        for split in splits:
            for f in sorted(os.listdir(os.path.join(root, catid, split))):
                self.Id2Index[f.split(".")[0]] = len(self.files)
                self.files.append(os.path.join(root, catid, split, f))

    def __getitem__(self, index):
        loader = load_norm_pc if self.normal else load_raw_pc
        return loader(self.files[index], self.npoints)


class ReaderWithPath(Reader):
    def __init__(self, files: Sequence[str], npoints, normal=False):
        self.files = list(files)
        self.npoints = npoints
        self.normal = normal

    def __getitem__(self, index):
        loader = load_norm_pc if self.normal else load_raw_pc
        return loader(self.files[index], self.npoints)


class Scan2cadLibReader(Reader):
    def __init__(self, root, catid, ids, id2path, npoint):
        self.root, self.catid = root, catid
        self.npoints = npoint
        self.files = [id2path[i] for i in ids]

    def __getitem__(self, idx):
        return load_norm_pc(self.files[idx], self.npoints)
