"""Pallas TPU kernel: fused pairwise-distance + per-sector top-k.

The symmetry-aided registration needs, for every query feature, the
top-k nearest target features *within each of K sectors*
(``ops/correspond.find_kcorr_per_sector``). The XLA path materializes the
[chunk, N] distance tile in HBM and re-reads it for every (sector,
extraction) pass — 1 + K*k passes of HBM traffic. This kernel computes
the distance tile on the MXU into VMEM and runs all K*k masked argmin
extractions in VMEM, writing only the [tile, K, k] index/validity
outputs.

VMEM budget per grid step: the target operands are stored transposed
[D, N] (dense lane packing — see _kernel), so the budget is set by the
~3 live [tile, N] temporaries (d2, masked copy, column iota); tile=64
fits N=8192, tile=32 fits N=16384.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30  # plain float: pallas kernels must not capture traced constants


def _kernel(num_sectors, k, f0_ref, f1t_ref, f1sq_ref, secmask_ref,
            idx_ref, ok_ref):
    """One query tile: d2 in VMEM -> K x k masked argmin extractions.

    The target features arrive TRANSPOSED [D, N]: an [N, D] block
    lane-pads D (16-32) to 128 lanes — 8 MB at N=16k, half the scoped
    VMEM — while [D, N] packs densely (~D*N*4 bytes) and is already the
    right operand orientation for the MXU. HIGHEST matmul precision:
    TPU f32 dots default to bf16 passes and the ~1e-3 d2 noise can
    reorder near-tied neighbors; these matmuls are tiny next to the
    K x k argmin extractions."""
    f0 = f0_ref[:]                      # [T, D]
    f1t = f1t_ref[:]                    # [D, N]
    n = f1t.shape[1]
    t = f0.shape[0]

    f0sq = jnp.sum(f0 * f0, axis=1, keepdims=True)        # [T, 1]
    d2 = f0sq + f1sq_ref[0, :].reshape(1, n) - 2.0 * jnp.dot(
        f0, f1t, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                      # [T, N]

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (t, n), 1)

    for s in range(num_sectors):
        mask = secmask_ref[s, :].reshape(1, n)             # [1, N] f32
        ds = jnp.where(mask > 0.5, d2, _BIG)
        # The j-th extraction is valid iff the sector holds > j valid
        # targets — a per-sector SCALAR (every query row shares the
        # target mask), so the per-extraction min pass over [T, N] that
        # previously backed `ok` is unnecessary (argmin + mask-update
        # remain: 2 full passes per extraction instead of 3).
        cnt = jnp.sum(mask)
        for j in range(k):
            idx = jnp.argmin(ds, axis=1).astype(jnp.int32)
            idx_ref[:, s, j] = idx
            ok_ref[:, s, j] = jnp.broadcast_to(
                (cnt > j).astype(jnp.int32), (t,)
            )
            ds = jnp.where(col_ids == idx[:, None], _BIG, ds)


def _min_kernel(chunk, x0_ref, x1t_ref, v1_ref, out_ref):
    """Min squared distance per query row, chunked running min in VMEM.

    d2 by DIRECT per-axis differences, not the matmul identity: TPU f32
    matmuls run as bf16 passes (~1e-3 absolute d2 noise), which inflated
    Chamfer NN distances by ~0.01; with only 3 coordinate axes the MXU
    buys nothing here anyway.

    The target operand arrives TRANSPOSED [D, N]: a [N, 3] block
    lane-pads every row to 128 lanes (8 MB at N=16k — half the scoped
    VMEM budget) while [3, N] packs into ~N/32 KB. The N axis is
    consumed in ``chunk``-wide slices with a running min so the live
    distance tile is [T, chunk] regardless of N (cap=16384 blew the
    16 MB scoped-vmem limit with a full [T, N] tile)."""
    x0 = x0_ref[:]                       # [T, D]
    t = x0.shape[0]
    n = x1t_ref.shape[1]
    acc = jnp.full((t,), _BIG, jnp.float32)
    for c in range(0, n, chunk):
        d2 = jnp.zeros((t, chunk), jnp.float32)
        for a in range(x0.shape[1]):
            r = x0[:, a : a + 1] - x1t_ref[a, c : c + chunk].reshape(
                1, chunk
            )
            d2 = d2 + r * r
        d2 = jnp.where(
            v1_ref[0, c : c + chunk].reshape(1, chunk) > 0.5, d2, _BIG
        )
        acc = jnp.minimum(acc, jnp.min(d2, axis=1))
    out_ref[:, 0] = acc


@partial(jax.jit, static_argnames=("tile", "chunk", "interpret"))
def min_dist_pallas(X0, X1, v1=None, tile: int = 256, chunk: int = 2048,
                    interpret: bool = False):
    """Per-row nearest-neighbor distance (not index): the Chamfer inner
    loop, fused so the distance tile never leaves VMEM. Returns [N0]."""
    n0, d = X0.shape
    n1 = X1.shape[0]
    pad0 = (-n0) % tile
    x0 = jnp.pad(X0.astype(jnp.float32), ((0, pad0), (0, 0)))
    chunk = min(chunk, n1)
    pad1 = (-n1) % chunk
    x1t = jnp.pad(X1.astype(jnp.float32), ((0, pad1), (0, 0))).T
    v1f = (jnp.ones((n1,), jnp.float32) if v1 is None
           else v1.astype(jnp.float32))
    v1f = jnp.pad(v1f, (0, pad1))[None, :]  # padded tail masked out
    n_tiles = (n0 + pad0) // tile
    out = pl.pallas_call(
        partial(_min_kernel, chunk),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, n1 + pad1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1 + pad1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n0 + pad0, 1), jnp.float32),
        interpret=interpret,
    )(x0, x1t, v1f)
    return jnp.sqrt(jnp.maximum(out[:n0, 0], 0.0))


@partial(jax.jit, static_argnames=("num_sectors", "k", "tile",
                                   "interpret", "include_global"))
def sector_knn_pallas(F0, F1, sector1, num_sectors: int, k: int,
                      v1=None, tile: int = 64, interpret: bool = False,
                      include_global: bool = False):
    """Per-sector top-k neighbors. Returns (idx [N0, S, k], ok [N0, S, k]).

    Drop-in replacement for the XLA path of ``find_kcorr_per_sector``.

    ``include_global=True`` prepends an extra "sector" spanning ALL valid
    targets, so slot 0 of the output is the global top-k — the d2 tile is
    computed once and reused for global + per-sector extraction (the
    symmetry-aided path previously paid a second full-distance kernel for
    the global correspondences, ``utils/eval_pose.py:48-79``).
    """
    n0, d = F0.shape
    n1 = F1.shape[0]
    pad0 = (-n0) % tile
    f0 = jnp.pad(F0.astype(jnp.float32), ((0, pad0), (0, 0)))
    f1t = F1.astype(jnp.float32).T                 # [D, N]: see _kernel
    f1sq = jnp.sum(f1t * f1t, axis=0)[None, :]  # 2-D: 1-D operands break
    # pallas vmap batching (batch dim becomes an illegal block dim)
    secmask = (
        sector1[None, :] == jnp.arange(num_sectors)[:, None]
    )
    if v1 is not None:
        secmask = secmask & v1[None, :]
    if include_global:
        allrow = (jnp.ones((1, n1), bool) if v1 is None
                  else v1[None, :])
        secmask = jnp.concatenate([allrow, secmask], axis=0)
        num_sectors = num_sectors + 1
    secmask = secmask.astype(jnp.float32)

    n_tiles = (n0 + pad0) // tile
    # ~3 live [tile, N] f32 temporaries + transposed operands + IO
    # double-buffering; the 16 MB default scoped limit is marginal at
    # tile=64, N=8192 (measured 16.5 MB) — raise it when close.
    need = (8 * tile + 32) * n1 * 4
    params = None
    if need > 14 * 1024 * 1024:
        params = pltpu.CompilerParams(
            vmem_limit_bytes=min(2 * need, 100 * 1024 * 1024)
        )
    idx, ok = pl.pallas_call(
        partial(_kernel, num_sectors, k),
        compiler_params=params,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, n1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_sectors, n1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, num_sectors, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, num_sectors, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n0 + pad0, num_sectors, k), jnp.int32),
            jax.ShapeDtypeStruct((n0 + pad0, num_sectors, k), jnp.int32),
        ),
        interpret=interpret,
    )(f0, f1t, f1sq, secmask)
    return idx[:n0], ok[:n0].astype(bool)


def _kernel_chunked(num_sectors, k, chunk, f0_ref, f1t_ref, f1sq_ref,
                    secmask_ref, bitmap_ref, idx_ref, ok_ref,
                    minv_ref, mini_ref):
    """Chunk-skipping variant for SECTOR-SORTED targets.

    With target rows grouped by sector, each sector occupies a
    contiguous ~N/K span of columns; the per-(sector, extraction) scans
    visit only the chunks the occupancy bitmap marks, cutting the
    dominant VPU extraction cost ~K-fold. Winner exclusion re-checks
    prior winners inline (j compares per visited chunk) instead of
    mutating a [T, N] copy. Running (min, argmin) carried in VMEM
    scratch under ``pl.when`` guards; strict < updates in ascending
    chunk order preserve first-index tie-break semantics."""
    f0 = f0_ref[:]                      # [T, D]
    f1t = f1t_ref[:]                    # [D, N]
    n = f1t.shape[1]
    t = f0.shape[0]

    f0sq = jnp.sum(f0 * f0, axis=1, keepdims=True)
    d2 = f0sq + f1sq_ref[0, :].reshape(1, n) - 2.0 * jnp.dot(
        f0, f1t, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                   # [T, N]

    n_chunks = n // chunk
    for s in range(num_sectors):
        cnt = jnp.sum(secmask_ref[s, :])
        for j in range(k):
            minv_ref[:, 0] = jnp.full((t,), _BIG, jnp.float32)
            mini_ref[:, 0] = jnp.zeros((t,), jnp.int32)
            for c in range(n_chunks):
                @pl.when(bitmap_ref[s, c] > 0.5)
                def _(s=s, j=j, c=c):
                    sl = slice(c * chunk, (c + 1) * chunk)
                    m = secmask_ref[s, sl].reshape(1, chunk)
                    dc = jnp.where(m > 0.5, d2[:, sl], _BIG)
                    col = jax.lax.broadcasted_iota(
                        jnp.int32, (t, chunk), 1
                    ) + c * chunk
                    for p in range(j):
                        prev = idx_ref[:, s, p]
                        dc = jnp.where(col == prev[:, None], _BIG, dc)
                    v = jnp.min(dc, axis=1)
                    i = jnp.argmin(dc, axis=1).astype(jnp.int32) \
                        + c * chunk
                    upd = v < minv_ref[:, 0]
                    minv_ref[:, 0] = jnp.where(upd, v, minv_ref[:, 0])
                    mini_ref[:, 0] = jnp.where(upd, i, mini_ref[:, 0])
            idx_ref[:, s, j] = mini_ref[:, 0]
            ok_ref[:, s, j] = jnp.broadcast_to(
                (cnt > j).astype(jnp.int32), (t,)
            )


@partial(jax.jit, static_argnames=("num_sectors", "k", "tile", "chunk",
                                   "interpret"))
def sector_knn_sorted_pallas(F0, F1_sorted, sector_sorted,
                             num_sectors: int, k: int, v1_sorted=None,
                             tile: int = 32, chunk: int = 512,
                             interpret: bool = False):
    """Per-sector top-k against a SECTOR-SORTED target set.

    Same contract as ``sector_knn_pallas`` except the caller must
    pre-sort targets by sector (invalid rows last) so the occupancy
    bitmap makes chunk skipping effective; returned indices address the
    SORTED row space (caller remaps through its sort order)."""
    try:
        interpret = interpret or jax.default_backend() == "cpu"
    except RuntimeError:
        interpret = True

    n0, d = F0.shape
    n1 = F1_sorted.shape[0]
    chunk = min(chunk, n1)
    pad1 = (-n1) % chunk
    if pad1:
        F1_sorted = jnp.pad(F1_sorted, ((0, pad1), (0, 0)))
        sector_sorted = jnp.pad(
            sector_sorted, (0, pad1), constant_values=num_sectors
        )
        if v1_sorted is not None:
            v1_sorted = jnp.pad(v1_sorted, (0, pad1))
        n1 += pad1
    pad0 = (-n0) % tile
    f0 = jnp.pad(F0.astype(jnp.float32), ((0, pad0), (0, 0)))
    f1t = F1_sorted.astype(jnp.float32).T
    f1sq = jnp.sum(f1t * f1t, axis=0)[None, :]
    secmask = sector_sorted[None, :] == jnp.arange(num_sectors)[:, None]
    if v1_sorted is not None:
        secmask = secmask & v1_sorted[None, :]
    secmask = secmask.astype(jnp.float32)
    n_chunks = n1 // chunk
    bitmap = (
        secmask.reshape(num_sectors, n_chunks, chunk).max(axis=2)
    )                                    # [S, n_chunks] occupancy

    n_tiles = (n0 + pad0) // tile
    need = (8 * tile + 32) * n1 * 4
    params = None
    if need > 14 * 1024 * 1024:
        params = pltpu.CompilerParams(
            vmem_limit_bytes=min(2 * need, 100 * 1024 * 1024)
        )
    idx, ok = pl.pallas_call(
        partial(_kernel_chunked, num_sectors, k, chunk),
        compiler_params=params,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, n1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_sectors, n1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_sectors, n_chunks), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, num_sectors, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, num_sectors, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n0 + pad0, num_sectors, k), jnp.int32),
            jax.ShapeDtypeStruct((n0 + pad0, num_sectors, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, 1), jnp.float32),
            pltpu.VMEM((tile, 1), jnp.int32),
        ],
        interpret=interpret,
    )(f0, f1t, f1sq, secmask, bitmap)
    return idx[:n0], ok[:n0].astype(bool)


def _kernel_slab(num_sectors, k, wp, f0_ref, f1t_ref, f1sq_ref,
                 vmask_ref, idx_ref, ok_ref, val_ref):
    """Equal-width sector slabs: extraction scans [T, wp] per sector.

    The targets arrive pre-scattered into ``num_sectors`` slabs of
    static width ``wp`` (columns [s*wp, (s+1)*wp) hold sector s's
    members; ``vmask`` marks occupied slots). Each of the K*k argmin
    extractions then scans wp columns instead of N — the win over
    ``_kernel`` whose every pass is full-width. Unlike the chunk-
    skipping variant (measured 2x slower: 512-wide ``pl.when`` blocks),
    slabs are STATIC full-vector slices with zero per-block control
    overhead. Winner VALUES are emitted (one extra [T, wp] pass each)
    so the caller can derive the exact global top-k by merging the
    K*k per-sector candidates — sectors partition the valid targets."""
    f0 = f0_ref[:]                      # [T, D]
    f1t = f1t_ref[:]                    # [D, S*wp]
    n = f1t.shape[1]
    t = f0.shape[0]

    f0sq = jnp.sum(f0 * f0, axis=1, keepdims=True)
    d2 = f0sq + f1sq_ref[0, :].reshape(1, n) - 2.0 * jnp.dot(
        f0, f1t, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                   # [T, S*wp]

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (t, wp), 1)
    for s in range(num_sectors):
        sl = slice(s * wp, (s + 1) * wp)
        m = vmask_ref[0, sl].reshape(1, wp)
        ds = jnp.where(m > 0.5, d2[:, sl], _BIG)
        cnt = jnp.sum(m)
        for j in range(k):
            v = jnp.min(ds, axis=1)
            idx = jnp.argmin(ds, axis=1).astype(jnp.int32)
            idx_ref[:, s, j] = idx + s * wp
            val_ref[:, s, j] = v
            ok_ref[:, s, j] = jnp.broadcast_to(
                (cnt > j).astype(jnp.int32), (t,)
            )
            ds = jnp.where(col_ids == idx[:, None], _BIG, ds)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("num_sectors", "k", "tile", "alpha",
                                   "interpret"))
def slab_sector_knn_pallas(F0, F1, sector1, num_sectors: int, k: int,
                           v1=None, tile: int = 64, alpha: float = 1.5,
                           interpret: bool = False):
    """Per-sector + global top-k via equal-width sector slabs.

    Returns ``(idx [N0, S+1, k], ok [N0, S+1, k])`` — slot 0 is the
    GLOBAL top-k (merged exactly from the per-sector candidates), slots
    1..S per-sector — the ``include_global`` contract of
    ``sector_knn_pallas``, at ~alpha/ (S+1) of its extraction-pass cost.

    Targets are scattered into S slabs of width ``round_up(alpha*N/S)``.
    A sector larger than its slab cannot fit: ``lax.cond`` falls back to
    the full-width fused kernel (bit-identical contract), so results
    are exact for every input. KMeans sector cuts accepted by the
    ratio-variance criterion are near-balanced, so the slab path is the
    one that runs in practice.
    """
    n0, d = F0.shape
    n1 = F1.shape[0]
    S = num_sectors
    wp = _round_up(max(int(alpha * n1 / S), 128), 128)
    v1b = jnp.ones((n1,), bool) if v1 is None else v1
    key_sec = jnp.where(v1b, sector1.astype(jnp.int32), S)
    _, order = jax.lax.sort(
        (key_sec, jnp.arange(n1, dtype=jnp.int32)),
        num_keys=1, is_stable=True,
    )
    sec_sorted = key_sec[order]
    counts = jnp.sum(
        key_sec[None, :] == jnp.arange(S)[:, None], axis=1
    )                                            # [S]
    starts = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]]
    )
    rank = jnp.arange(n1, dtype=jnp.int32)
    in_slab = sec_sorted < S
    pos = rank - jnp.where(in_slab, starts[jnp.minimum(sec_sorted, S - 1)],
                           0)
    overflow = jnp.any(counts > wp)
    # invalid rows and (harmless under the cond fallback) overflow rows
    # land on a trash row past the slabs
    dest = jnp.where(
        in_slab & (pos < wp), sec_sorted * wp + jnp.minimum(pos, wp - 1),
        S * wp,
    )
    F1_slab = jnp.zeros((S * wp + 1, d), F1.dtype).at[dest].set(F1[order])
    vmask = jnp.zeros((S * wp + 1,), jnp.float32).at[dest].set(
        in_slab.astype(jnp.float32)
    )
    back = jnp.zeros((S * wp + 1,), jnp.int32).at[dest].set(order)
    F1_slab, vmask, back = F1_slab[:-1], vmask[:-1], back[:-1]

    def slab_path(_):
        pad0 = (-n0) % tile
        f0 = jnp.pad(F0.astype(jnp.float32), ((0, pad0), (0, 0)))
        f1t = F1_slab.astype(jnp.float32).T
        f1sq = jnp.sum(f1t * f1t, axis=0)[None, :]
        n_tiles = (n0 + pad0) // tile
        need = (8 * tile + 32) * S * wp * 4
        params = None
        if need > 14 * 1024 * 1024:
            params = pltpu.CompilerParams(
                vmem_limit_bytes=min(2 * need, 100 * 1024 * 1024)
            )
        idx_s, ok_s, val_s = pl.pallas_call(
            partial(_kernel_slab, S, k, wp),
            compiler_params=params,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((tile, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, S * wp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S * wp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S * wp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((tile, S, k), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, S, k), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, S, k), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n0 + pad0, S, k), jnp.int32),
                jax.ShapeDtypeStruct((n0 + pad0, S, k), jnp.int32),
                jax.ShapeDtypeStruct((n0 + pad0, S, k), jnp.float32),
            ),
            interpret=interpret,
        )(f0, f1t, f1sq, vmask[None, :])
        idx_s, ok_s, val_s = idx_s[:n0], ok_s[:n0], val_s[:n0]
        sec_idx = back[idx_s]                    # original row ids
        # exact global top-k: merge the S*k per-sector candidates
        # (sectors partition the valid targets, so the global top-k is
        # a subset of them)
        flat_val = jnp.where(ok_s > 0, val_s, _BIG).reshape(n0, S * k)
        flat_idx = sec_idx.reshape(n0, S * k)
        from corsair_tpu.ops.knn import small_topk_min

        posk, valk = small_topk_min(flat_val, k)
        g_idx = jnp.take_along_axis(flat_idx, posk, axis=1)
        g_ok = valk < _BIG / 2
        idx_all = jnp.concatenate([g_idx[:, None, :], sec_idx], axis=1)
        ok_all = jnp.concatenate(
            [g_ok[:, None, :].astype(jnp.int32), ok_s], axis=1
        )
        return idx_all, ok_all

    def full_path(_):
        idx_f, ok_f = sector_knn_pallas(
            F0, F1, sector1, num_sectors, k, v1=v1,
            tile=tile, interpret=interpret, include_global=True,
        )
        return idx_f, ok_f.astype(jnp.int32)

    idx, ok = jax.lax.cond(overflow, full_path, slab_path, operand=None)
    return idx, ok.astype(bool)
