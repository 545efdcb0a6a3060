"""Pallas TPU kernel: fused RANSAC hypothesis scoring.

For a tile of hypotheses, applies each rigid transform to the
correspondence sources, computes residuals to the targets, and reduces to
(inlier count, inlier SSE) — entirely in VMEM. The XLA path materializes
[H, M, 3] moved-point and [H, M] distance temporaries in HBM.

Layout note: the transform enters as a [H, 12] row-major (R | t) matrix
so blocks stay 2-D and vmap-friendly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(max_d2, rt_ref, src_ref, dst_ref, valid_ref, count_ref,
            sse_ref):
    rt = rt_ref[:]                       # [T, 12]
    src = src_ref[:]                     # [M, 3]
    dst = dst_ref[:]                     # [M, 3]
    valid = valid_ref[0, :]              # [M]

    # moved[h, m, c] = sum_j R[h, c, j] * src[m, j] + t[h, c].
    # rt columns are addressed directly: Mosaic cannot reshape
    # [T, 9] -> [T, 3, 3] in-kernel.
    sx, sy, sz = src[:, 0], src[:, 1], src[:, 2]
    dx, dy, dz = dst[:, 0], dst[:, 1], dst[:, 2]

    # residual per axis: [T, M]
    resx = (rt[:, 0:1] * sx[None, :] + rt[:, 1:2] * sy[None, :]
            + rt[:, 2:3] * sz[None, :] + rt[:, 9:10]) - dx[None, :]
    resy = (rt[:, 3:4] * sx[None, :] + rt[:, 4:5] * sy[None, :]
            + rt[:, 5:6] * sz[None, :] + rt[:, 10:11]) - dy[None, :]
    resz = (rt[:, 6:7] * sx[None, :] + rt[:, 7:8] * sy[None, :]
            + rt[:, 8:9] * sz[None, :] + rt[:, 11:12]) - dz[None, :]
    d2 = resx * resx + resy * resy + resz * resz
    inl = (d2 <= max_d2) & (valid[None, :] > 0.5)
    count_ref[:, 0] = jnp.sum(inl.astype(jnp.float32), axis=1)
    sse_ref[:, 0] = jnp.sum(jnp.where(inl, d2, 0.0), axis=1)


def _kernel_multi(max_d2, rt_ref, src_ref, dst_ref, valid_ref,
                  count_ref, sse_ref):
    """Per-candidate variant: dst/valid blocks carry a leading singleton
    candidate dim selected by the grid's first axis."""
    rt = rt_ref[:]                       # [T, 12]
    src = src_ref[:]                     # [M, 3]
    dst = dst_ref[0]                     # [M, 3] (this candidate's)
    valid = valid_ref[0, 0, :]           # [M]

    sx, sy, sz = src[:, 0], src[:, 1], src[:, 2]
    dx, dy, dz = dst[:, 0], dst[:, 1], dst[:, 2]
    resx = (rt[:, 0:1] * sx[None, :] + rt[:, 1:2] * sy[None, :]
            + rt[:, 2:3] * sz[None, :] + rt[:, 9:10]) - dx[None, :]
    resy = (rt[:, 3:4] * sx[None, :] + rt[:, 4:5] * sy[None, :]
            + rt[:, 5:6] * sz[None, :] + rt[:, 10:11]) - dy[None, :]
    resz = (rt[:, 6:7] * sx[None, :] + rt[:, 7:8] * sy[None, :]
            + rt[:, 8:9] * sz[None, :] + rt[:, 11:12]) - dz[None, :]
    d2 = resx * resx + resy * resy + resz * resz
    inl = (d2 <= max_d2) & (valid[None, :] > 0.5)
    count_ref[:, 0] = jnp.sum(inl.astype(jnp.float32), axis=1)
    sse_ref[:, 0] = jnp.sum(jnp.where(inl, d2, 0.0), axis=1)


@partial(jax.jit, static_argnames=("max_corr_dist", "tile", "interpret"))
def ransac_score_multi_pallas(Ts, src, dsts, valids, max_corr_dist,
                              tile: int = 64, interpret: bool = False):
    """Score C candidate RANSACs' hypotheses in ONE kernel stream.

    ``Ts`` [C, H, 4, 4] poses; ``src`` [M, 3] shared source side; ``dsts``
    [C, M, 3] per-candidate targets; ``valids`` [C, M]. Returns
    (counts [C, H], sse [C, H]). The candidate axis is folded into the
    grid so all C*H hypotheses share one scoring stream (VERDICT r1 #4 —
    replaces the serial ``lax.map`` over ``sym_pose``'s 9 candidates).
    """
    c, h = Ts.shape[:2]
    m = src.shape[0]
    rt = jnp.concatenate(
        [Ts[..., :3, :3].reshape(c, h, 9), Ts[..., :3, 3]], axis=-1
    ).astype(jnp.float32)                # [C, H, 12]
    pad = (-h) % tile
    rt = jnp.pad(rt, ((0, 0), (0, pad), (0, 0))).reshape(-1, 12)
    # [C, 1, M] so the block's last two dims equal the array's (Mosaic
    # requires last-two block dims divisible by (8, 128) or full).
    vf = valids.astype(jnp.float32)[:, None, :]
    max_d2 = float(max_corr_dist) ** 2

    n_tiles = (h + pad) // tile
    counts, sse = pl.pallas_call(
        partial(_kernel_multi, max_d2),
        grid=(c, n_tiles),
        in_specs=[
            pl.BlockSpec((tile, 12), lambda ci, ti: (ci * n_tiles + ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 3), lambda ci, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 3), lambda ci, ti: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda ci, ti: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, 1), lambda ci, ti: (ci * n_tiles + ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda ci, ti: (ci * n_tiles + ti, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c * (h + pad), 1), jnp.float32),
            jax.ShapeDtypeStruct((c * (h + pad), 1), jnp.float32),
        ),
        interpret=interpret,
    )(rt, src.astype(jnp.float32), dsts.astype(jnp.float32), vf)
    counts = counts.reshape(c, h + pad)[:, :h]
    sse = sse.reshape(c, h + pad)[:, :h]
    return counts, sse


@partial(jax.jit, static_argnames=("max_corr_dist", "tile", "interpret"))
def ransac_score_pallas(Ts, src, dst, valid, max_corr_dist,
                        tile: int = 64, interpret: bool = False):
    """(counts [H], sse [H]) for hypotheses ``Ts`` [H, 4, 4] over
    correspondences src/dst [M, 3] with ``valid`` [M]."""
    h = Ts.shape[0]
    m = src.shape[0]
    rt = jnp.concatenate(
        [Ts[:, :3, :3].reshape(h, 9), Ts[:, :3, 3]], axis=1
    ).astype(jnp.float32)                # [H, 12]
    pad = (-h) % tile
    rt = jnp.pad(rt, ((0, pad), (0, 0)))
    vf = valid[None, :].astype(jnp.float32)
    max_d2 = float(max_corr_dist) ** 2

    n_tiles = (h + pad) // tile
    counts, sse = pl.pallas_call(
        partial(_kernel, max_d2),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, 12), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((h + pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((h + pad, 1), jnp.float32),
        ),
        interpret=interpret,
    )(rt, src.astype(jnp.float32), dst.astype(jnp.float32), vf)
    return counts[:h, 0], sse[:h, 0]


def _kernel_matmul(max_d2, psi_ref, phi_ref, base_ref, count_ref,
                   sse_ref):
    """d2[h, m] = base[m] + psi[h] . phi[m] -> one MXU matmul per tile,
    then threshold-count/SSE in VMEM."""
    psi = psi_ref[:]                     # [T, 16]
    phi = phi_ref[0]                     # [16, M]
    base = base_ref[0, 0, :]             # [M] (|s|^2+|d|^2, BIG if invalid)
    # HIGHEST: TPU f32 matmuls default to bf16 passes (~1e-3 absolute
    # noise on d2 — 2.5% of the 0.04 inlier threshold); the full-f32
    # passes keep stage-1 counts honest and the matmul is cheap.
    d2 = base[None, :] + jnp.dot(
        psi, phi, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                    # [T, M]
    inl = d2 <= max_d2
    count_ref[:, 0] = jnp.sum(inl.astype(jnp.float32), axis=1)
    sse_ref[:, 0] = jnp.sum(jnp.where(inl, d2, 0.0), axis=1)


@partial(jax.jit, static_argnames=("max_corr_dist", "tile", "interpret"))
def ransac_score_matmul_pallas(Ts, src, dsts, valids, max_corr_dist,
                               tile: int = 256, interpret: bool = False):
    """Stage-1 RANSAC scoring as an MXU matmul.

    For a rigid pose (R orthogonal), the residual decomposes exactly:
    |R s + t - d|^2 = (|s|^2 + |d|^2) + psi(R, t) . phi(s, d) with
    psi = [|t|^2, 2 R^T t, -2 t, -2 vec(R)] and
    phi = [1, s, d, vec(d s^T)] in R^16 — so scoring C*H hypotheses
    against M correspondences is a [C*H, 16] x [16, M] matmul instead of
    VPU elementwise transforms (the measured stage-1 bottleneck).
    Counts are exact (d2 agrees with the direct form to ~1e-6, far from
    the 0.04 threshold scale); finalists are exactly rescored by the
    caller anyway.

    ``Ts`` [C, H, 4, 4], ``src`` [M, 3] shared, ``dsts`` [C, M, 3],
    ``valids`` [C, M]. Returns (counts [C, H], sse [C, H]).
    """
    c, h = Ts.shape[:2]
    m = src.shape[0]
    R = Ts[..., :3, :3].astype(jnp.float32)          # [C, H, 3, 3]
    t = Ts[..., :3, 3].astype(jnp.float32)           # [C, H, 3]
    psi = jnp.concatenate([
        jnp.sum(t * t, -1, keepdims=True),
        2.0 * jnp.einsum("chij,chi->chj", R, t),
        -2.0 * t,
        -2.0 * R.reshape(c, h, 9),
    ], axis=-1)                                      # [C, H, 16]

    s = src.astype(jnp.float32)
    d = dsts.astype(jnp.float32)
    phi = jnp.concatenate([
        jnp.ones((c, m, 1), jnp.float32),
        jnp.broadcast_to(s[None], (c, m, 3)),
        d,
        jnp.einsum("cmi,mj->cmij", d, s).reshape(c, m, 9),
    ], axis=-1)                                      # [C, M, 16]
    phi_t = jnp.swapaxes(phi, 1, 2)                  # [C, 16, M]
    base = (jnp.sum(s * s, -1)[None, :] + jnp.sum(d * d, -1))
    base = jnp.where(valids, base, 1e30)[:, None, :]  # [C, 1, M]

    pad = (-h) % tile
    psi = jnp.pad(psi, ((0, 0), (0, pad), (0, 0))).reshape(-1, 16)
    n_tiles = (h + pad) // tile
    max_d2 = float(max_corr_dist) ** 2

    counts, sse = pl.pallas_call(
        partial(_kernel_matmul, max_d2),
        grid=(c, n_tiles),
        in_specs=[
            pl.BlockSpec((tile, 16), lambda ci, ti: (ci * n_tiles + ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, m), lambda ci, ti: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda ci, ti: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, 1), lambda ci, ti: (ci * n_tiles + ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda ci, ti: (ci * n_tiles + ti, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c * (h + pad), 1), jnp.float32),
            jax.ShapeDtypeStruct((c * (h + pad), 1), jnp.float32),
        ),
        interpret=interpret,
    )(psi, phi_t, base)
    counts = counts.reshape(c, h + pad)[:, :h]
    sse = sse.reshape(c, h + pad)[:, :h]
    return counts, sse
