"""Label/metadata file readers for the ShapeNet training pipelines.

Parity with ``utils/preprocess.py:95-204``: match/mismatch maps, category
name tables, label files (``catid/split/modelid.npy catid subcatid``
lines), plain lists, and the ShapeNet split CSV.
"""

from __future__ import annotations

import csv
from typing import Dict, List, Tuple


def read_match(path_match: str, path_mismatch: str):
    with open(path_match) as f:
        lines = f.readlines()
    file_list = lines[0].strip(",").split(",")
    match_map = [ln.strip("\n").strip(" ").split(" ") for ln in lines[1:]]
    with open(path_mismatch) as f:
        lines = f.readlines()
    mismatch_map = [
        ln.strip("\n").strip(" ").split(" ") for ln in lines[1:]
    ]
    return file_list, match_map, mismatch_map


def read_catname(path: str) -> Tuple[Dict[str, str], Dict[str, str]]:
    """catid <-> category-name maps from ``CatName.txt`` lines."""
    name2id, id2name = {}, {}
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            catid, name = line.strip("\n").strip(" ").split(" ")
            name2id[name] = catid
            id2name[catid] = name
    return id2name, name2id


def read_label(path: str):
    """Label file: ``catid/split/modelid.npy catid subcatid`` per line.

    Returns (file_list, label2data, data2label) with
    ``label2data[catid][subcatid] = [[paths], [indices]]``.
    """
    file_list: List[str] = []
    label2data: Dict = {}
    data2label: Dict[str, List[str]] = {}
    with open(path) as f:
        lines = f.readlines()
    for idx, line in enumerate(lines):
        if not line.strip("\n"):
            continue
        file_path, catid, subcatid = line.strip("\n").split(" ")
        file_list.append(file_path)
        data2label[file_path] = [catid, subcatid]
        cat = label2data.setdefault(catid, {})
        if subcatid not in cat:
            cat[subcatid] = [[file_path], [idx]]
        else:
            cat[subcatid][0].append(file_path)
            cat[subcatid][1].append(idx)
    return file_list, label2data, data2label


def read_file(path: str) -> List[str]:
    with open(path) as f:
        return [ln.strip("\n") for ln in f if ln.strip("\n")]


def read_split(path: str):
    """ShapeNet split CSV: ``id, CatId, SubcatId, modelId, split``."""
    cat2id: Dict = {"train": {}, "test": {}, "val": {}}
    id2cat: Dict = {}
    with open(path, newline="") as f:
        lines = list(csv.reader(f))[1:]
    for _, catid, subcatid, modelid, split in lines:
        id2cat[modelid] = {
            "CatId": catid, "SubcatId": subcatid, "split": split,
        }
        cat2id[split].setdefault(catid, {}).setdefault(
            subcatid, []
        ).append(modelid)
    return cat2id, id2cat


def print_stat(cat2id, id2cat, split, catid):
    stat = {}
    print(split)
    for key in cat2id[split][catid]:
        n = len(cat2id[split][catid][key])
        print(f"SubcatId:{key}, count:{n}")
        stat[key] = n
    return stat


def convert_tri(tri, indices):
    """Re-index triangle vertex ids after a vertex subset selection
    (``utils/read_json.py:106-117``)."""
    import numpy as np

    lut = {int(v): i for i, v in enumerate(indices)}
    out = np.asarray(tri).copy()
    for i in range(out.shape[0]):
        for j in range(3):
            out[i][j] = lut[int(out[i][j])]
    return out
