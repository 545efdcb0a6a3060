"""Scan2CAD metadata index.

Parity with ``utils/Info/Scan2cadInfo.py``: parses
``full_annotations.json`` + ``unique_cads.csv``, filters one category,
maps each scan-object file (``SceneID.NumModel.CatId.ModelId.npy``) to its
best-match CAD id and the CAD/scan TRS poses, and splits scenes into
train(90% of scannet_train)/val(10%)/test(scannet_val), honoring the
``scannet_omit.txt`` blacklist.
"""

from __future__ import annotations

import csv
import json
import os
from typing import Dict, List

from corsair_tpu.data.readers import path_dict

_CONFIG_DIR = os.path.join(
    os.path.dirname(__file__), "..", "..", "configs"
)


def load_json(path):
    with open(path) as f:
        return json.load(f)


def load_csv(path):
    with open(path, newline="") as f:
        return [row for row in csv.reader(f)]


class Scan2cadInfo:
    def __init__(self, cad_root: str, scan_root: str, catid: str,
                 annotation_dir: str, config_dir: str = None):
        self.scan_root = scan_root
        self.cad_root = cad_root
        self.catid = catid
        self.config_dir = config_dir or _CONFIG_DIR

        self.annotation = load_json(
            os.path.join(annotation_dir, "full_annotations.json")
        )
        self.all_cad = load_csv(
            os.path.join(annotation_dir, "unique_cads.csv")
        )

        self.id2path = path_dict(self.cad_root)
        self.UsedObjId, self.UsedObjPath = self.filter_cad()

        self.scan2pose = self.read_scan2pose()
        (
            self.ScanObjPathes,
            self.BestMatchesDict,
            self.CadPosesDict,
            self.ScanPosesDict,
        ) = self.read_scans()
        self.ScanObjPathes.sort()

        self.train_and_val_scans, self.test_scans = self.read_scannet_split(
            os.path.join(self.config_dir, "scannet_train.txt"),
            os.path.join(self.config_dir, "scannet_val.txt"),
        )
        self.scene_dict = self.get_scene_dict(self.ScanObjPathes)
        self.train_keys, self.val_keys, self.test_keys = self.filter_scan()

        (self.train_files, self.TrainBestMatches, self.TrainCadPoses,
         self.TrainScanPoses) = self.keys_to_label(self.train_keys)
        (self.val_files, self.ValBestMatches, self.ValCadPoses,
         self.ValScanPoses) = self.keys_to_label(self.val_keys)
        (self.test_files, self.TestBestMatches, self.TestCadPoses,
         self.TestScanPoses) = self.keys_to_label(self.test_keys)

    def get_split(self, split: str):
        if split == "train":
            return (self.train_files, self.TrainBestMatches,
                    self.TrainCadPoses, self.TrainScanPoses)
        if split == "val":
            return (self.val_files, self.ValBestMatches,
                    self.ValCadPoses, self.ValScanPoses)
        if split == "test":
            return (self.test_files, self.TestBestMatches,
                    self.TestCadPoses, self.TestScanPoses)
        raise ValueError("No such split")

    def filter_cad(self):
        used_id, used_path = [], []
        for cat_id, obj_id in self.all_cad:
            if cat_id == self.catid:
                used_id.append(obj_id)
                used_path.append(self.id2path[obj_id])
        return used_id, used_path

    def get_scene_dict(self, files: List[str]):
        scene_dict: Dict[str, List[str]] = {}
        for file in files:
            scene_dict.setdefault(file[:12], []).append(file)
        return scene_dict

    def filter_scan(self):
        keys = sorted(self.scene_dict.keys())
        train_and_val = [k for k in keys if k in self.train_and_val_scans]
        test_keys = [k for k in keys if k in self.test_scans]
        n_train = int(0.9 * len(train_and_val))
        return train_and_val[:n_train], train_and_val[n_train:], test_keys

    def keys_to_label(self, keys):
        files: List[str] = []
        for key in keys:
            files += self.scene_dict[key]
        return (
            files,
            [self.BestMatchesDict[f] for f in files],
            [self.CadPosesDict[f] for f in files],
            [self.ScanPosesDict[f] for f in files],
        )

    def read_scannet_split(self, path_train, path_test):
        with open(path_train) as f:
            train_and_val = [line.strip("\n") for line in f]
        with open(path_test) as f:
            test = [line.strip("\n") for line in f]
        return train_and_val, test

    def read_scans(self):
        omit_path = os.path.join(self.config_dir, "scannet_omit.txt")
        omits = set()
        if os.path.exists(omit_path):
            with open(omit_path) as f:
                omits = {line.strip("\n") for line in f}

        pcs = []
        best, cad_poses, scan_poses = {}, {}, {}
        for file in os.listdir(self.scan_root):
            if not file.endswith(".npy"):
                continue
            scene_id, num_model, cat_id, model_id, _ = file.split(".")
            if file not in omits and cat_id == self.catid:
                pcs.append(file)
                best[file] = model_id
                cad_poses[file] = self.scan2pose[scene_id][
                    "aligned_models"][int(num_model)]["trs"]
                scan_poses[file] = self.scan2pose[scene_id]["trs"]
        return pcs, best, cad_poses, scan_poses

    def read_scan2pose(self):
        return {
            scan["id_scan"]: {
                "aligned_models": scan["aligned_models"],
                "trs": scan["trs"],
            }
            for scan in self.annotation
        }

    def print_stats(self):
        print(f"CADs:\n\tnumber of CADs: {len(self.UsedObjPath)}")
        print(
            "Scans:\n\tnumber of scenes train: {}, val: {}, test: {}".format(
                len(self.train_keys), len(self.val_keys), len(self.test_keys)
            )
        )
        print(
            "\tnumber of objects train: {}, val: {}, test: {}".format(
                len(self.train_files), len(self.val_files),
                len(self.test_files)
            )
        )
