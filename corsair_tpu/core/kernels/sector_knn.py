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

# Read once at import — see _feat_matmul_precision docstring.
import os as _os
_KNN_PRECISION_ENV = _os.environ.get("CORSAIR_KNN_PRECISION", "packed")
_KNN_BITPACK_ENV = _os.environ.get("CORSAIR_KNN_BITPACK", "1") == "1"
# Sub-k-pass top-k extraction in the merged slab kernel (see
# _subk_topk). Read once at import like the other CORSAIR_KNN_* knobs.
_SUBK_ENV = _os.environ.get("CORSAIR_SUBK_KNN", "0") == "1"
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30  # plain float: pallas kernels must not capture traced constants


def _feat_matmul_precision():
    """Precision of the un-packed feature-distance matmuls.

    Features are unit-norm 16-dim, so ``d2 = |a|^2+|b|^2-2ab`` has no
    catastrophic cancellation; what precision buys is stable ordering of
    near-tied neighbors. The deployed kernels use the packed-split
    single-pass dot (see ``_split3`` below) instead; this env knob keeps
    the plain-precision variant reachable for A/B runs
    (scripts/bench_knn_kernels.py). All CORSAIR_KNN_* knobs are read
    ONCE at module import (advisor r3: a trace-time env read is baked
    into the jit cache — toggling mid-process silently keeps the
    previously traced variant and mislabels A/B runs); set them before
    process start."""
    name = _KNN_PRECISION_ENV.upper()
    if name == "PACKED":   # callers without a packed layout (sorted
        name = "HIGHEST"   # kernel) fall back to the 6-pass dot
    return getattr(jax.lax.Precision, name)


def _split3(x, axis):
    """3-way bf16 significance split of an f32 array: x ~ hi + mid + lo
    with each term bf16-representable (8 mantissa bits x 3 = f32's 24)."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    r = x - hi
    mid = r.astype(jnp.bfloat16).astype(jnp.float32)
    lo = r - mid
    return hi, mid, lo


def _pack_queries(f0):
    """[T, D] f32 -> [T, 6D] bf16: rows pack (hi,hi,hi,mid,mid,lo)."""
    h, m, l = _split3(f0, 1)
    return jnp.concatenate([h, h, h, m, m, l], axis=1).astype(
        jnp.bfloat16
    )


def _pack_targets(f1t):
    """[D, N] f32 -> [6D, N] bf16: rows pack (hi,mid,lo,hi,mid,hi), the
    pairing that makes a SINGLE default-precision bf16 dot against
    ``_pack_queries`` accumulate exactly HIGHEST's six significant
    cross-terms (hi*hi, hi*mid, hi*lo, mid*hi, mid*mid, lo*hi).

    Why: the MXU contracts 128 lanes per pass whether D is 16 or 128,
    and Precision.HIGHEST on an f32 dot issues SIX bf16 passes. With
    D=16 features the 3-way-split cross-terms fit in 6*16 = 96 <= 128
    contraction lanes, so one packed bf16 pass buys HIGHEST's accuracy
    at a sixth of its MXU cost (measured on v5e at [8, 16384] — see
    ARCHITECTURE.md round-3 log)."""
    h, m, l = _split3(f1t, 0)
    return jnp.concatenate([h, m, l, h, m, h], axis=0).astype(
        jnp.bfloat16
    )


def _use_packed() -> bool:
    return _KNN_PRECISION_ENV == "packed"


def _distance_tile(f0, f1t_ref, f1sq_ref, packed):
    """d2 [T, N] from a query tile and the (possibly packed) targets."""
    n = f1t_ref.shape[1]
    f0sq = jnp.sum(f0 * f0, axis=1, keepdims=True)        # [T, 1]
    if packed:
        dot = jnp.dot(_pack_queries(f0), f1t_ref[:],
                      preferred_element_type=jnp.float32)
    else:
        dot = jnp.dot(f0, f1t_ref[:],
                      preferred_element_type=jnp.float32,
                      precision=_feat_matmul_precision())
    return f0sq + f1sq_ref[0, :].reshape(1, n) - 2.0 * dot


def _kernel(num_sectors, k, packed, f0_ref, f1t_ref, f1sq_ref,
            secmask_ref, idx_ref, ok_ref):
    """One query tile: d2 in VMEM -> K x k masked argmin extractions.

    The target features arrive TRANSPOSED [D, N]: an [N, D] block
    lane-pads D (16-32) to 128 lanes — 8 MB at N=16k, half the scoped
    VMEM — while [D, N] packs densely (~D*N*4 bytes) and is already the
    right operand orientation for the MXU. ``packed`` targets carry the
    single-pass split-bf16 layout (see ``_pack_targets``): HIGHEST-
    equivalent d2 accuracy so near-tied neighbors stay stably ordered."""
    f0 = f0_ref[:]                      # [T, D]
    n = f1t_ref.shape[1]
    t = f0.shape[0]

    d2 = _distance_tile(f0, f1t_ref, f1sq_ref, packed)     # [T, N]

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
    packed = _use_packed()
    if packed:
        f1t = _pack_targets(f1t)                   # [6D, N] bf16
    d_in = f1t.shape[0]
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
        partial(_kernel, num_sectors, k, packed),
        compiler_params=params,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, n1), lambda i: (0, 0),
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
        precision=_feat_matmul_precision(),
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


def _kernel_slab(num_sectors, k, n_global, wp, packed, f0_ref, f1t_ref,
                 f1sq_ref, vmask_ref, scale_ref, idx_ref, ok_ref):
    """Global full-width slot + equal-width sector slabs.

    Column layout: [0, n_global) holds ALL targets in original order
    (the global top-k scans it — always exact); columns
    [n_global + s*wp, n_global + (s+1)*wp) hold sector s's members,
    pre-scattered by the wrapper. Each sector extraction scans wp
    columns instead of n_global — with wp ~ 1.5*N/K the K*k sector
    extractions cost ~1.5/K of the fused kernel's full-width passes.
    Static slices only: the chunk-skipping variant's pl.when blocks
    (measured 2x slower) and the vmap-of-cond fallback (measured: vmap
    turns lax.cond into BOTH branches) are both avoided.

    d2 is computed PER SPAN (one [T, span] dot per slot) instead of one
    [T, n_lay] pass over the whole duplicated layout: the live distance
    tile shrinks from n_lay (~2.5N) to one span, which unlocks T=128+
    tiles — at T=32 a [32, .] operand wastes 3/4 of the MXU's 128-row
    systolic tile, and the matmul was half the kernel's time.

    Top-k extraction is a BIT-PACKED min-reduce: key_i32 =
    (fixed_point_17bit(d2) << 14) | column. min(key) yields the
    quantized min distance AND its column in one cheap i32 reduce
    (argmin's index-tracking reduce costs ~2x), and the removal mask is
    an exact equality (column bits make keys unique — exactly one
    element removed per step). The fixed-point scale is
    (2^17-2) / max_d2_bound with the bound computed by the wrapper from
    the operands ((|f0|_max + |f1|_max)^2), so quantization is
    max_d2_bound / 2^17 ABSOLUTE — 3e-5 for unit-normalized features:
    ties closer than that break by column order instead of
    exact-value order; such neighbors are interchangeable for
    correspondence mining (the d2 VALUES are never consumed downstream
    — ops/symmetry.py uses indices only). Quantization only reorders
    WITHIN a row's extraction, so the data-dependent scale never leaks
    across rows or tiles."""
    f0 = f0_ref[:]                      # [T, D]
    t = f0.shape[0]
    f0q = _pack_queries(f0) if packed else f0
    f0sq = jnp.sum(f0 * f0, axis=1, keepdims=True)        # [T, 1]
    scale = scale_ref[0, 0]

    spans = [(0, n_global)] + [
        (n_global + s * wp, n_global + (s + 1) * wp)
        for s in range(num_sectors)
    ]
    bitpack = _KNN_BITPACK_ENV
    imax = jnp.int32(2**31 - 1)
    for slot, (lo, hi) in enumerate(spans):
        w = hi - lo
        if packed:
            dot = jnp.dot(f0q, f1t_ref[:, lo:hi],
                          preferred_element_type=jnp.float32)
        else:
            dot = jnp.dot(f0q, f1t_ref[:, lo:hi],
                          preferred_element_type=jnp.float32,
                          precision=_feat_matmul_precision())
        d2 = f0sq + f1sq_ref[0, lo:hi].reshape(1, w) - 2.0 * dot
        m = vmask_ref[0, lo:hi].reshape(1, w)
        cnt = jnp.sum(m)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (t, w), 1)
        if bitpack and w <= 1 << 14:
            q = jnp.minimum(
                jnp.maximum(d2, 0.0) * scale, float(2**17 - 2)
            ).astype(jnp.int32)
            key = jnp.where(
                m > 0.5,
                (q << 14) | col_ids,
                imax,
            )
            for j in range(k):
                mk = jnp.min(key, axis=1)                  # [T] i32
                # clamp: an all-invalid span's min is imax whose low
                # bits (16383) may exceed the span; ok=0 masks it
                idx_ref[:, slot, j] = (
                    jnp.minimum(mk & 0x3FFF, w - 1) + lo
                )
                ok_ref[:, slot, j] = jnp.broadcast_to(
                    (cnt > j).astype(jnp.int32), (t,)
                )
                key = jnp.where(key == mk[:, None], imax, key)
        else:
            # spans wider than the 14 index bits: exact argmin loop
            ds = jnp.where(m > 0.5, d2, _BIG)
            for j in range(k):
                idx = jnp.argmin(ds, axis=1).astype(jnp.int32)
                idx_ref[:, slot, j] = idx + lo
                ok_ref[:, slot, j] = jnp.broadcast_to(
                    (cnt > j).astype(jnp.int32), (t,)
                )
                ds = jnp.where(col_ids == idx[:, None], _BIG, ds)


def _subk_topk(key, k, t, imax):
    """Sub-k-pass top-k of a packed-key span (NOTES r4s4 lever).

    The exact extraction pays 2k full-width VPU passes (k min + k
    mask-update). Here: (1) one sweep builds per-bucket minima over
    ~w/16-wide strided buckets (nb lanes, c sublane steps), (2) a second
    sweep takes each bucket's SECOND minimum, (3) the 2k extraction
    passes run on the [T, 2*nb] candidates (1/8th the width), (4) ONE
    full-width count pass verifies exactness per row: with unique keys,
    rank(k-th candidate) == k iff the candidates contain the true top-k
    (a bucket holding >=3 of the top-k — P ~ C(k,3)/nb^2 per row — makes
    the k-th candidate rank deeper, which the count catches). Returns
    (winners list [k] of [T], all_exact scalar bool); on a failed
    verify the CALLER must overwrite with the exact loop (pl.when).
    ~5.5 full-pass equivalents instead of 2k."""
    w = key.shape[1]
    nb = _round_up(max(w // 16, 128), 128)
    c = (w + nb - 1) // nb
    if c * nb != w:
        key_p = jnp.concatenate(
            [key, jnp.full((t, c * nb - w), imax, jnp.int32)], axis=1
        )
    else:
        key_p = key
    kr = key_p.reshape(t, c, nb)
    b1 = jnp.min(kr, axis=1)                               # [T, nb]
    b2 = jnp.min(jnp.where(kr == b1[:, None, :], imax, kr), axis=1)
    cand = jnp.concatenate([b1, b2], axis=1)               # [T, 2nb]
    winners = []
    for _ in range(k):
        mk = jnp.min(cand, axis=1)
        winners.append(mk)
        cand = jnp.where(cand == mk[:, None], imax, cand)
    n_below = jnp.sum(
        (key <= winners[-1][:, None]).astype(jnp.int32), axis=1
    )
    return winners, jnp.all(n_below == k)


def _kernel_slab_merged(num_sectors, k, wp, wo, packed, subk,
                        f0_ref, f1t_ref, f1sq_ref, vmask_ref, scale_ref,
                        flag_ref, idx_ref, ok_ref, ovk_ref, ovi_ref,
                        entk_ref=None, enti_ref=None):
    """Sector slabs + guarded overflow slab; global top-k BY MERGE.

    The full-width global scan was ~40% of `_kernel_slab`'s extraction
    passes and its d2 matmul columns. The sector slabs (plus an
    overflow slab holding any members that exceeded their sector's
    width) PARTITION the valid targets, so the global top-k equals the
    top-k of the (S+1)*k slab winners — a [T, (S+1)*k] merge instead of
    a [T, N] scan. The overflow slab is empty unless a sector spilled;
    its d2 + extraction sit behind a pl.when on a per-cloud scalar, so
    the common case never pays for it (and on spill the GLOBAL slot
    stays exact — only sector slots are incomplete, and the spill flag
    already voids those downstream).

    Merge keys reuse the bit-packed layout with entry ids in the low 14
    bits; valid value bits max out at (2^17-2)<<14 < the imax sentinel's
    value bits, so exhausted slots sort last. Ties across slabs break
    by (slot, j) order within the same 17-bit quantization class as the
    in-slab extraction."""
    f0 = f0_ref[:]                      # [T, D]
    t = f0.shape[0]
    f0q = _pack_queries(f0) if packed else f0
    f0sq = jnp.sum(f0 * f0, axis=1, keepdims=True)
    scale = scale_ref[0, 0]
    imax = jnp.int32(2**31 - 1)
    S = num_sectors

    def span_d2(lo, w):
        if packed:
            dot = jnp.dot(f0q, f1t_ref[:, lo:lo + w],
                          preferred_element_type=jnp.float32)
        else:
            dot = jnp.dot(f0q, f1t_ref[:, lo:lo + w],
                          preferred_element_type=jnp.float32,
                          precision=_feat_matmul_precision())
        d2 = f0sq + f1sq_ref[0, lo:lo + w].reshape(1, w) - 2.0 * dot
        m = vmask_ref[0, lo:lo + w].reshape(1, w)
        col = jax.lax.broadcasted_iota(jnp.int32, (t, w), 1)
        q = jnp.minimum(
            jnp.maximum(d2, 0.0) * scale, float(2**17 - 2)
        ).astype(jnp.int32)
        key = jnp.where(m > 0.5, (q << 14) | col, imax)
        return key, jnp.sum(m)

    ent_key, ent_idx = [], []           # per entry: [T] i32
    for s in range(S):
        lo = s * wp
        key, cnt = span_d2(lo, wp)
        if subk:
            # Candidate extraction with a count-verify; the rare failed
            # tile (quantized near-tie pileups, or a span with < k valid
            # targets) overwrites with the exact loop under pl.when.
            winners, exact = _subk_topk(key, k, t, imax)
            for j in range(k):
                entk_ref[:, s * k + j] = winners[j]
                enti_ref[:, s * k + j] = (
                    jnp.minimum(winners[j] & 0x3FFF, wp - 1) + lo
                )

            @pl.when(jnp.logical_not(exact))
            def _(key=key, s=s, lo=lo):
                kk = key
                for j in range(k):
                    mk = jnp.min(kk, axis=1)
                    entk_ref[:, s * k + j] = mk
                    enti_ref[:, s * k + j] = (
                        jnp.minimum(mk & 0x3FFF, wp - 1) + lo
                    )
                    kk = jnp.where(kk == mk[:, None], imax, kk)

            for j in range(k):
                ent_key.append(entk_ref[:, s * k + j])
                ent_idx.append(enti_ref[:, s * k + j])
                idx_ref[:, 1 + s, j] = ent_idx[-1]
                ok_ref[:, 1 + s, j] = jnp.broadcast_to(
                    (cnt > j).astype(jnp.int32), (t,)
                )
        else:
            for j in range(k):
                mk = jnp.min(key, axis=1)
                ent_key.append(mk)
                ent_idx.append(jnp.minimum(mk & 0x3FFF, wp - 1) + lo)
                idx_ref[:, 1 + s, j] = ent_idx[-1]
                ok_ref[:, 1 + s, j] = jnp.broadcast_to(
                    (cnt > j).astype(jnp.int32), (t,)
                )
                key = jnp.where(key == mk[:, None], imax, key)

    # overflow slab: runs only when a sector spilled (per-cloud scalar)
    ovk_ref[:] = jnp.full((t, k), imax, jnp.int32)
    ovi_ref[:] = jnp.full((t, k), S * wp, jnp.int32)

    @pl.when(flag_ref[0, 0] > 0)
    def _():
        key, _cnt = span_d2(S * wp, wo)
        kk = key
        for j in range(k):
            mk = jnp.min(kk, axis=1)
            ovk_ref[:, j] = mk
            ovi_ref[:, j] = jnp.minimum(mk & 0x3FFF, wo - 1) + S * wp
            kk = jnp.where(kk == mk[:, None], imax, kk)

    for j in range(k):
        ent_key.append(ovk_ref[:, j])
        ent_idx.append(ovi_ref[:, j])

    # global slot = merge of the (S+1)*k entries
    ent = len(ent_key)                              # <= 2**14
    allk = jnp.stack(
        [(kk & jnp.int32(~0x3FFF)) | jnp.int32(e)
         for e, kk in enumerate(ent_key)], axis=1
    )                                               # [T, ENT]
    alli = jnp.stack(ent_idx, axis=1)               # [T, ENT]
    eid = jax.lax.broadcasted_iota(jnp.int32, (t, ent), 1)
    cnt_total = jnp.sum(vmask_ref[0, :])
    for j in range(k):
        mg = jnp.min(allk, axis=1)                  # [T]
        e = mg & 0x3FFF
        gidx = jnp.sum(
            jnp.where(eid == e[:, None], alli, 0), axis=1
        )
        idx_ref[:, 0, j] = gidx
        ok_ref[:, 0, j] = jnp.broadcast_to(
            (cnt_total > j).astype(jnp.int32), (t,)
        )
        allk = jnp.where(allk == mg[:, None], imax, allk)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("num_sectors", "k", "tile", "alpha",
                                   "interpret", "subk"))
def merged_slab_sector_knn_pallas(F0, F1, sector1, num_sectors: int,
                                  k: int, v1=None, tile: int = 128,
                                  alpha: float = 1.5,
                                  interpret: bool = False,
                                  subk=None):
    """`slab_sector_knn_pallas` contract with the global slot computed
    by MERGING the sector/overflow slab winners instead of a full-width
    scan (see `_kernel_slab_merged`). Valid targets that exceed their
    sector's slab go to an overflow slab (runtime-guarded: free when
    empty), so the GLOBAL slot is exact even on spill; sector slots are
    incomplete on spill exactly like the base kernel (flag semantics
    unchanged). Falls back to the base kernel when a slab span exceeds
    the 14 index bits of the bit-packed extraction."""
    n0, d = F0.shape
    n1 = F1.shape[0]
    S = num_sectors
    wp = _round_up(max(int(alpha * n1 / S), 128), 128)
    wo = _round_up(max(n1 - wp, 128), 128)
    if max(wp, wo) > 1 << 14:
        return slab_sector_knn_pallas(F0, F1, sector1, num_sectors, k,
                                      v1=v1, tile=tile, alpha=alpha,
                                      interpret=interpret)
    v1b = jnp.ones((n1,), bool) if v1 is None else v1
    key_sec = jnp.where(v1b, sector1.astype(jnp.int32), S)
    _, order = jax.lax.sort(
        (key_sec, jnp.arange(n1, dtype=jnp.int32)),
        num_keys=1, is_stable=True,
    )
    sec_sorted = key_sec[order]
    counts = jnp.sum(
        key_sec[None, :] == jnp.arange(S)[:, None], axis=1
    )
    starts = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]]
    )
    rank = jnp.arange(n1, dtype=jnp.int32)
    in_slab = sec_sorted < S
    pos = rank - jnp.where(
        in_slab, starts[jnp.minimum(sec_sorted, S - 1)], 0
    )
    fits = in_slab & (pos < wp)
    spilled = in_slab & ~fits
    ov_pos = jnp.cumsum(spilled.astype(jnp.int32)) - 1
    spill = jnp.any(counts > wp)
    n_lay = S * wp + wo
    dest = jnp.where(
        fits, sec_sorted * wp + jnp.minimum(pos, wp - 1),
        jnp.where(spilled, S * wp + jnp.minimum(ov_pos, wo - 1), n_lay),
    )
    slab_f = jnp.zeros((n_lay + 1, d), F1.dtype).at[dest].set(F1[order])
    slab_v = jnp.zeros((n_lay + 1,), jnp.float32).at[dest].set(
        (fits | spilled).astype(jnp.float32)
    )
    back = jnp.zeros((n_lay + 1,), jnp.int32).at[dest].set(order)
    F1_lay, vmask, back = slab_f[:-1], slab_v[:-1], back[:-1]

    pad0 = (-n0) % tile
    f0 = jnp.pad(F0.astype(jnp.float32), ((0, pad0), (0, 0)))
    f1t = F1_lay.astype(jnp.float32).T
    f1sq = jnp.sum(f1t * f1t, axis=0)[None, :]
    bound = (
        jnp.sqrt(jnp.max(jnp.sum(f0 * f0, axis=1)))
        + jnp.sqrt(jnp.max(f1sq))
    ) ** 2
    scale = (float(2**17 - 2) / jnp.maximum(bound, 1e-12)).astype(
        jnp.float32
    ).reshape(1, 1)
    flag = spill.astype(jnp.int32).reshape(1, 1)
    packed = _use_packed()
    if packed:
        f1t = _pack_targets(f1t)
    d_in = f1t.shape[0]
    n_tiles = (n0 + pad0) // tile
    need = d_in * n_lay * f1t.dtype.itemsize \
        + 6 * tile * max(wp, wo) * 4
    params = None
    if need > 14 * 1024 * 1024:
        params = pltpu.CompilerParams(
            vmem_limit_bytes=min(2 * need, 120 * 1024 * 1024)
        )
    if subk is None:
        subk = _SUBK_ENV
    scratch = [
        pltpu.VMEM((tile, k), jnp.int32),
        pltpu.VMEM((tile, k), jnp.int32),
    ]
    if subk:
        scratch += [
            pltpu.VMEM((tile, S * k), jnp.int32),
            pltpu.VMEM((tile, S * k), jnp.int32),
        ]
    idx, ok = pl.pallas_call(
        partial(_kernel_slab_merged, S, k, wp, wo, packed, subk),
        compiler_params=params,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, n_lay), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_lay), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_lay), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, S + 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, S + 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n0 + pad0, S + 1, k), jnp.int32),
            jax.ShapeDtypeStruct((n0 + pad0, S + 1, k), jnp.int32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(f0, f1t, f1sq, vmask[None, :], scale, flag)
    idx, ok = idx[:n0], ok[:n0]
    return back[idx], ok, spill


@partial(jax.jit, static_argnames=("num_sectors", "k", "tile", "alpha",
                                   "interpret"))
def slab_sector_knn_pallas(F0, F1, sector1, num_sectors: int, k: int,
                           v1=None, tile: int = 32, alpha: float = 1.5,
                           interpret: bool = False):
    """Global + per-sector top-k via a full-width global region plus
    equal-width sector slabs.

    Returns ``(idx [N0, S+1, k], ok [N0, S+1, k], spill bool)`` — the
    ``include_global`` contract of ``sector_knn_pallas`` plus a spill
    flag. Slot 0 (global) is ALWAYS exact: it scans every target in
    original column order, so tie-breaking matches the fused kernel
    bit for bit. Sector slots are exact whenever every sector fits its
    ``round_up(alpha*N/S)``-wide slab; a larger sector sets ``spill``
    (its excess members are dropped from that sector's slab only).
    Callers must treat ``spill`` like a failed symmetric cut
    (``sym_ok=False`` -> vanilla-RANSAC fallback): accepted KMeans cuts
    are near-balanced (ratio-variance winner), so spill on the deployed
    path means the cut was rejected and the sector results are unused
    anyway.
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
    )
    starts = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]]
    )
    rank = jnp.arange(n1, dtype=jnp.int32)
    in_slab = sec_sorted < S
    pos = rank - jnp.where(
        in_slab, starts[jnp.minimum(sec_sorted, S - 1)], 0
    )
    spill = jnp.any(counts > wp)
    fits = in_slab & (pos < wp)
    dest = jnp.where(fits, sec_sorted * wp + jnp.minimum(pos, wp - 1),
                     S * wp)
    slab_f = jnp.zeros((S * wp + 1, d), F1.dtype).at[dest].set(F1[order])
    slab_v = jnp.zeros((S * wp + 1,), jnp.float32).at[dest].set(
        fits.astype(jnp.float32)
    )
    back = jnp.zeros((S * wp + 1,), jnp.int32).at[dest].set(order)
    slab_f, slab_v, back = slab_f[:-1], slab_v[:-1], back[:-1]

    F1_lay = jnp.concatenate([F1, slab_f], axis=0)
    vmask = jnp.concatenate([v1b.astype(jnp.float32), slab_v])

    pad0 = (-n0) % tile
    f0 = jnp.pad(F0.astype(jnp.float32), ((0, pad0), (0, 0)))
    f1t = F1_lay.astype(jnp.float32).T
    f1sq = jnp.sum(f1t * f1t, axis=0)[None, :]
    # fixed-point scale for the bit-packed extraction (see _kernel_slab)
    bound = (
        jnp.sqrt(jnp.max(jnp.sum(f0 * f0, axis=1)))
        + jnp.sqrt(jnp.max(f1sq))
    ) ** 2
    scale = (float(2**17 - 2) / jnp.maximum(bound, 1e-12)).astype(
        jnp.float32
    ).reshape(1, 1)
    packed = _use_packed()
    if packed:
        f1t = _pack_targets(f1t)                   # [6D, n_lay] bf16
    d_in = f1t.shape[0]
    n_lay = n1 + S * wp
    n_tiles = (n0 + pad0) // tile
    # live VMEM: the resident packed-target block + ~6 [tile, span]
    # f32 temporaries of the widest span (d2 is per-span now)
    need = d_in * n_lay * f1t.dtype.itemsize \
        + 6 * tile * max(n1, wp) * 4
    params = None
    if need > 14 * 1024 * 1024:
        params = pltpu.CompilerParams(
            vmem_limit_bytes=min(2 * need, 120 * 1024 * 1024)
        )
    idx, ok = pl.pallas_call(
        partial(_kernel_slab, S, k, n1, wp, packed),
        compiler_params=params,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, n_lay), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_lay), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_lay), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, S + 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, S + 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n0 + pad0, S + 1, k), jnp.int32),
            jax.ShapeDtypeStruct((n0 + pad0, S + 1, k), jnp.int32),
        ),
        interpret=interpret,
    )(f0, f1t, f1sq, vmask[None, :], scale)
    idx, ok = idx[:n0], ok[:n0]
    # slot 0 already original indices; sector slots map through `back`
    sec_idx = back[jnp.maximum(idx[:, 1:] - n1, 0)]
    idx = jnp.concatenate([idx[:, :1], sec_idx], axis=1)
    return idx, ok.astype(bool), spill
