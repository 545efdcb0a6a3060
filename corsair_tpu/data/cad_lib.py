"""CAD library datasets.

* ``CustomizeCADLib`` — parity with ``utils/Info/CADLib.py:42-178``: a
  fixed collection of CAD models (by id), normalized, voxelized, with the
  pairwise Chamfer table; ``collate_pair_fn`` produces the padded batch
  arrays consumed by the TPU pipeline.
* ``GaussianSplatLib`` — parity with ``:180-219``: RaDe-GS ``recon.ply``
  mesh reconstructions, uniformly surface-sampled (own PLY reader +
  area-weighted triangle sampling instead of Open3D).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from corsair_tpu.core.voxelize import sparse_collate_np, voxelize_host
from corsair_tpu.data.readers import load_norm_pc, load_raw_pc, path_dict
from corsair_tpu.ops.transforms import apply_transform


class CatCADLib:
    """Whole-category CAD store with the pairwise CD table
    (``utils/Info/CADLib.py:12-39``)."""

    def __init__(self, root: str, catid: str, table_path: str,
                 preload: bool = True):
        from corsair_tpu.data.readers import CategoryLibReader

        self.root, self.catid = root, catid
        self.preload = preload
        self.table = np.load(table_path)
        reader = CategoryLibReader(
            root, catid, ["train", "test", "val"], 10000, normal=False
        )
        if preload:
            self.CadPcs = [reader[i] for i in range(len(reader))]
        else:
            self.CadPcs = reader.files
        self.id2idx = reader.Id2Index


class CustomizeCADLib:
    def __init__(self, root: str, catid: str, ids: List[str],
                 table_path: str, voxel_size: float, preload: bool = True):
        self.root = root
        self.catid = catid
        self.voxel_size = voxel_size
        self.ids = list(ids)
        self.preload = preload
        self.id2path = path_dict(root)
        self.id2idx: Dict[str, int] = {}
        self.table = np.load(table_path)
        self.scale = 1e-3
        self.pathes: List[str] = []
        for idx, model_id in enumerate(self.ids):
            self.pathes.append(self.id2path[model_id])
            self.id2idx[model_id] = idx
        if preload:
            self.CadPcs = [load_norm_pc(p, 10000) for p in self.pathes]
        else:
            self.CadPcs = self.pathes

    def _getpc(self, idx: int) -> np.ndarray:
        if self.preload:
            return self.CadPcs[idx]
        return load_norm_pc(self.CadPcs[idx], 10000)

    def _getpc_raw(self, idx: int) -> np.ndarray:
        if self.preload:
            return self.CadPcs[idx]
        return self.scale * load_raw_pc(self.CadPcs[idx], 15000)

    def _getpc_raw_id(self, model_id: str) -> np.ndarray:
        return self._getpc_raw(self.id2idx[model_id])

    def quant(self, rot_coords: np.ndarray, coords: np.ndarray):
        """Voxel dedup keyed on floor(rot_coords/voxel)
        (``utils/Info/CADLib.py:106-121``)."""
        _, grid, kept = voxelize_host(rot_coords, self.voxel_size)
        return rot_coords[kept], grid, coords[kept]

    def __len__(self):
        return len(self.CadPcs)

    def __getitem__(self, idx: int):
        base_coords = self._getpc(idx)
        rot, grid, base_coords = self.quant(base_coords, base_coords)
        return {
            "coord": grid,
            "origin": rot,
            "feat": np.ones([len(rot), 1]),
            "T": np.eye(4),
            "idx": idx,
        }

    def collate_pair_fn(self, list_data, capacity: Optional[int] = None):
        coords = [d["coord"] for d in list_data]
        feats = [d["feat"].astype(np.float32) for d in list_data]
        bcoords, bbatch, bfeats, bvalid = sparse_collate_np(
            coords, feats, capacity
        )
        origins = np.concatenate([d["origin"] for d in list_data], 0)
        return {
            "base_coords": bcoords,
            "base_batch": bbatch,
            "base_feat": bfeats,
            "base_valid": bvalid,
            "base_origin": origins.astype(np.float32),
            "base_idx": np.asarray([d["idx"] for d in list_data], np.int32),
            "base_T": np.stack([d["T"] for d in list_data]).astype(
                np.float32
            ),
        }


def read_ply_mesh(path: str):
    """Minimal PLY triangle-mesh reader (ascii + binary_little_endian).

    Covers the RaDe-GS ``recon.ply`` files read via Open3D in the
    reference (``utils/Info/CADLib.py:196-203``).
    """
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        counts = {}
        props: Dict[str, list] = {}
        current = None
        for line in header:
            parts = line.split()
            if parts[0] == "element":
                current = parts[1]
                counts[current] = int(parts[2])
                props[current] = []
            elif parts[0] == "property" and current is not None:
                props[current].append(parts[1:])

        nv = counts.get("vertex", 0)
        nf = counts.get("face", 0)
        vprops = props.get("vertex", [])
        _np_types = {
            "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
            "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
            "short": "i2", "ushort": "u2", "int": "i4", "int32": "i4",
            "uint": "u4", "uint32": "u4",
        }
        if fmt == "ascii":
            verts = np.loadtxt(
                [f.readline() for _ in range(nv)], dtype=np.float64
            ).reshape(nv, -1)
            xyz_cols = [i for i, p in enumerate(vprops)
                        if p[-1] in ("x", "y", "z")]
            vertices = verts[:, xyz_cols[:3]]
            faces = []
            for _ in range(nf):
                vals = f.readline().split()
                k = int(vals[0])
                faces.append([int(v) for v in vals[1 : 1 + k]][:3])
            faces = np.asarray(faces, np.int64)
        else:
            endian = "<" if "little" in fmt else ">"
            vdt = np.dtype([
                (p[-1], endian + _np_types[p[0]]) for p in vprops
            ])
            vdata = np.frombuffer(f.read(vdt.itemsize * nv), dtype=vdt)
            vertices = np.stack(
                [vdata["x"], vdata["y"], vdata["z"]], axis=1
            ).astype(np.float64)
            faces = np.empty((nf, 3), np.int64)
            fprops = props.get("face", [])
            cnt_t = endian + _np_types[fprops[0][1]]
            idx_t = endian + _np_types[fprops[0][2]]
            cnt_size = np.dtype(cnt_t).itemsize
            idx_size = np.dtype(idx_t).itemsize
            for i in range(nf):
                k = int(np.frombuffer(f.read(cnt_size), cnt_t)[0])
                idxs = np.frombuffer(f.read(idx_size * k), idx_t)
                faces[i] = idxs[:3]
        return vertices, faces


def sample_mesh_uniform(vertices: np.ndarray, faces: np.ndarray,
                        number_of_points: int,
                        rng: Optional[np.random.RandomState] = None):
    """Area-weighted uniform surface sampling (replaces
    ``o3d.geometry.TriangleMesh.sample_points_uniformly``)."""
    if rng is None:
        rng = np.random.RandomState(0)
    tri = vertices[faces]  # [F, 3, 3]
    cross = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    areas = 0.5 * np.linalg.norm(cross, axis=1)
    p = areas / areas.sum()
    choice = rng.choice(len(faces), number_of_points, p=p)
    t = tri[choice]
    r1 = np.sqrt(rng.rand(number_of_points, 1))
    r2 = rng.rand(number_of_points, 1)
    return (
        (1 - r1) * t[:, 0] + r1 * (1 - r2) * t[:, 1] + r1 * r2 * t[:, 2]
    )


class GaussianSplatLib:
    FIXED_TRANSFORM = np.array([
        [1, 0, 0, 0],
        [0, 0, 1, 0],
        [0, -1, 0, 0],
        [0, 0, 0, 1],
    ], dtype=np.float64)  # gsplat frame -> shapenet frame

    def __init__(self, shapenet_radegs_root: str, catid: str):
        self.catid = catid
        self.shapenet_radegs_root = shapenet_radegs_root
        self.scale = 1e-3

    def _recon_path(self, model_id: str) -> str:
        return os.path.join(
            self.shapenet_radegs_root, self.catid, model_id, "recon.ply"
        )

    def get_recon_mesh_by_id(self, model_id: str):
        return read_ply_mesh(self._recon_path(model_id))

    def get_recon_pc_by_id(self, model_id: str, number_of_points=15000):
        v, fc = self.get_recon_mesh_by_id(model_id)
        return sample_mesh_uniform(v, fc, number_of_points)

    def get_recon_pc_by_id_transformed(self, model_id: str,
                                       number_of_points=15000):
        pc = self.get_recon_pc_by_id(model_id, number_of_points)
        return self.scale * apply_transform(pc, self.FIXED_TRANSFORM)
