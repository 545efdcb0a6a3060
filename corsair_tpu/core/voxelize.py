"""Voxelization: floor-quantize + dedup, host (numpy) and device (JAX) paths.

Reference semantics (``datasets/CategoryDataset.py:179-197`` ``quant``):
``grid = floor(points / voxel_size)``; keep one point per occupied voxel
(first occurrence); return both the surviving continuous points and their
integer grid coordinates.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from corsair_tpu.core.sparse import (
    COMPACT_SAFE_COORD,
    SENTINEL,
    SparseGrid,
    unique_compact,
)


def assert_compact_range(coords_list) -> None:
    """Fail loudly when voxel coordinates leave the compact-key safe
    interior ``[-COMPACT_SAFE_COORD, COMPACT_SAFE_COORD]`` that the
    fast-merge coordinate manager requires (a unit-normalized cloud at
    voxel 0.03 spans ~±80, so this only fires on mis-scaled inputs —
    which previously would have been *silently dropped* as padding by the
    compact key packing)."""
    for c in coords_list:
        if len(c) == 0:
            continue
        lo, hi = int(np.min(c)), int(np.max(c))
        if lo < -COMPACT_SAFE_COORD or hi > COMPACT_SAFE_COORD:
            raise ValueError(
                f"voxel coords span [{lo}, {hi}] outside the compact-key "
                f"safe range ±{COMPACT_SAFE_COORD}; check voxel_size / "
                "input normalization"
            )


def voxelize_np(points: np.ndarray, voxel_size: float):
    """Host-side quantization. Returns (kept_points, grid_coords, kept_idx).

    ``kept_idx`` indexes into the original ``points`` (first occurrence per
    voxel, in order of first appearance) — parity with
    ``ME.utils.sparse_quantize(..., return_index=True)`` as used by the
    reference's ``quant`` methods.
    """
    grid = np.floor(points / voxel_size).astype(np.int32)
    # Unique by row; keep first occurrence in original order.
    _, first_idx = np.unique(grid, axis=0, return_index=True)
    kept_idx = np.sort(first_idx)
    return points[kept_idx], grid[kept_idx], kept_idx


def voxelize_host(points: np.ndarray, voxel_size: float):
    """Host quantization, preferring the native C++ runtime (~10x faster
    than numpy); identical first-occurrence semantics."""
    try:
        from corsair_tpu import runtime

        if runtime.available():
            return runtime.voxelize(points, voxel_size)
    except ImportError:
        pass
    return voxelize_np(points, voxel_size)


def sparse_collate_np(
    coords_list: List[np.ndarray],
    feats_list: List[np.ndarray],
    capacity: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Batch per-sample voxel grids into padded arrays.

    Replaces ``ME.utils.sparse_collate`` (``datasets/ChairDataset.py:204-208``)
    but produces the padded static-capacity layout ``(coords, batch, feats,
    valid)`` instead of a ragged batch-prefixed coordinate matrix.
    """
    total = sum(len(c) for c in coords_list)
    if capacity is None:
        capacity = total
    if total > capacity:
        raise ValueError(f"batch has {total} voxels > capacity {capacity}")
    assert_compact_range(coords_list)
    nch = feats_list[0].shape[1] if feats_list else 1
    coords = np.full((capacity, 3), SENTINEL, dtype=np.int32)
    batch = np.full((capacity,), len(coords_list), dtype=np.int32)
    feats = np.zeros((capacity, nch), dtype=np.float32)
    valid = np.zeros((capacity,), dtype=bool)
    row = 0
    for i, (c, f) in enumerate(zip(coords_list, feats_list)):
        n = len(c)
        coords[row : row + n] = c
        batch[row : row + n] = i
        feats[row : row + n] = f
        valid[row : row + n] = True
        row += n
    return coords, batch, feats, valid


def collate_to_grid(
    coords_list: List[np.ndarray],
    feats_list: List[np.ndarray],
    capacity: Optional[int] = None,
) -> SparseGrid:
    coords, batch, feats, valid = sparse_collate_np(
        coords_list, feats_list, capacity
    )
    return SparseGrid(
        coords=jnp.asarray(coords),
        batch=jnp.asarray(batch),
        feats=jnp.asarray(feats),
        valid=jnp.asarray(valid),
        stride=1,
        num_batches=len(coords_list),
    )


def voxelize_jax(points, valid, voxel_size: float):
    """Device-side quantization of one padded point set ``[N, 3]``.

    Returns (grid_coords [N,3] int32, kept_valid [N] bool, sel [N] int32):
    row i of the output holds the i-th unique voxel (first occurrence order
    by voxel key), ``sel`` maps output rows to input rows (for carrying the
    continuous "origin" coordinates along, as the reference's ``quant`` does).
    """
    grid = jnp.floor(points / voxel_size).astype(jnp.int32)
    gx = jnp.where(valid, grid[:, 0], SENTINEL)
    gy = jnp.where(valid, grid[:, 1], SENTINEL)
    gz = jnp.where(valid, grid[:, 2], SENTINEL)
    perm, kept = unique_compact((gx, gy, gz), grid.shape[0])
    out_grid = jnp.where(kept[:, None], grid[perm], SENTINEL)
    return out_grid, kept, perm
