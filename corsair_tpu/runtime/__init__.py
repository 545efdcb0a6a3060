"""ctypes bindings for the native host runtime (with numpy fallback).

Builds lazily with ``make`` on first use if the shared library is
missing; all entry points transparently fall back to the numpy
implementations in ``core.voxelize`` when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libcorsair_runtime.so")
_lib = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _DIR], check=True, capture_output=True
            )
        except Exception:
            _lib_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _lib_failed = True
        return None

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    lib.corsair_voxelize.restype = ctypes.c_int
    lib.corsair_voxelize.argtypes = [
        f32p, ctypes.c_int, ctypes.c_float, i32p, i32p,
    ]
    lib.corsair_voxelize_batch.restype = None
    lib.corsair_voxelize_batch.argtypes = [
        f32p, i32p, ctypes.c_int, ctypes.c_float, i32p, i32p, i32p,
        ctypes.c_int,
    ]
    lib.corsair_collate.restype = ctypes.c_int
    lib.corsair_collate.argtypes = [
        i32p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int32, i32p,
        i32p, u8p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def voxelize(points: np.ndarray, voxel_size: float):
    """Native-path equivalent of ``core.voxelize.voxelize_np``."""
    lib = _load()
    if lib is None:
        from corsair_tpu.core.voxelize import voxelize_np

        return voxelize_np(points, voxel_size)
    pts = np.ascontiguousarray(points[:, :3], np.float32)
    n = len(pts)
    grid = np.empty((n, 3), np.int32)
    kept = np.empty(n, np.int32)
    k = lib.corsair_voxelize(pts, n, voxel_size, grid, kept)
    kept = kept[:k].copy()
    return points[kept], grid[:k].copy(), kept


def voxelize_batch(clouds: List[np.ndarray], voxel_size: float,
                   n_threads: int = 8):
    """Quantize many clouds with host-thread parallelism. Returns a list
    of (kept_points, grid, kept_idx)."""
    lib = _load()
    if lib is None:
        return [voxelize(c, voxel_size) for c in clouds]
    lengths = np.asarray([len(c) for c in clouds], np.int32)
    pts = np.ascontiguousarray(
        np.concatenate([c[:, :3] for c in clouds]), np.float32
    )
    total = int(lengths.sum())
    grid = np.empty((total, 3), np.int32)
    kept = np.empty(total, np.int32)
    counts = np.empty(len(clouds), np.int32)
    lib.corsair_voxelize_batch(
        pts, lengths, len(clouds), voxel_size, grid, kept, counts,
        n_threads,
    )
    out = []
    off = 0
    for c, ln, k in zip(clouds, lengths, counts):
        g = grid[off : off + k].copy()
        ki = kept[off : off + k].copy()
        out.append((c[ki], g, ki))
        off += int(ln)
    return out


def collate(grids: List[np.ndarray], capacity: int,
            sentinel: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = _load()
    if lib is None:
        from corsair_tpu.core.voxelize import sparse_collate_np

        feats = [np.ones((len(g), 1), np.float32) for g in grids]
        c, b, _, v = sparse_collate_np(grids, feats, capacity)
        return c, b, v
    lengths = np.asarray([len(g) for g in grids], np.int32)
    flat = np.ascontiguousarray(np.concatenate(grids), np.int32)
    coords = np.empty((capacity, 3), np.int32)
    batch = np.empty(capacity, np.int32)
    valid = np.empty(capacity, np.uint8)
    r = lib.corsair_collate(
        flat, lengths, len(grids), capacity, sentinel, coords, batch,
        valid,
    )
    if r < 0:
        raise ValueError("capacity overflow in collate")
    return coords, batch, valid.astype(bool)


def _bind_kernel_maps(lib):
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    if not hasattr(lib.corsair_downsample, "_bound"):
        lib.corsair_downsample.restype = ctypes.c_int
        lib.corsair_downsample.argtypes = [
            i32p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p,
            i32p,
        ]
        lib.corsair_neighbor_table.restype = None
        lib.corsair_neighbor_table.argtypes = [
            i32p, i32p, ctypes.c_int, i32p, i32p, ctypes.c_int, i32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int,
        ]
        lib.corsair_downsample._bound = True


def downsample(coords: np.ndarray, batch: np.ndarray, step: int,
               capacity: int):
    """unique(floor(c/step)*step) per batch, first-occurrence order."""
    lib = _load()
    assert lib is not None
    _bind_kernel_maps(lib)
    n = len(coords)
    out_c = np.empty((capacity, 3), np.int32)
    out_b = np.empty(capacity, np.int32)
    k = lib.corsair_downsample(
        np.ascontiguousarray(coords, np.int32),
        np.ascontiguousarray(batch, np.int32), n, step, capacity, out_c,
        out_b,
    )
    return out_c[:k], out_b[:k]


def neighbor_table(tcoords, tbatch, qcoords, qbatch, offsets,
                   dilation: int, miss_value: int, n_threads: int = 8):
    lib = _load()
    assert lib is not None
    _bind_kernel_maps(lib)
    nt, nq, K = len(tcoords), len(qcoords), len(offsets)
    out = np.empty((K, nq), np.int32)
    lib.corsair_neighbor_table(
        np.ascontiguousarray(tcoords, np.int32),
        np.ascontiguousarray(tbatch, np.int32), nt,
        np.ascontiguousarray(qcoords, np.int32),
        np.ascontiguousarray(qbatch, np.int32), nq,
        np.ascontiguousarray(offsets, np.int32), K, dilation, miss_value,
        out, n_threads,
    )
    return out
