"""Functional sparse NN layers over SparseGrid feature arrays.

Every layer is a pure function ``(params, feats, ...) -> feats`` consuming
the neighbor tables built by ``core.coordmap.CoordinateManager``. The
sparse convolution is a gather feeding a single MXU einsum — the TPU
equivalent of MinkowskiEngine's gather-GEMM-scatter kernels.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

EPS_BN = 1e-5  # torch BatchNorm default
EPS_IN = 1e-5


# Conv formulation A/B switch, read ONCE at import (env knobs read at
# trace time get baked into the jit cache — toggling mid-process would
# silently keep the previously traced variant for already-seen shapes
# and mislabel A/B runs; advisor r3). Folding the offset axis into one
# [N, K*Cin] @ [K*Cin, Cout] matmul looks MXU-friendlier but measured
# 9% SLOWER end-to-end (1077 vs 987 ms / 16 clouds on v5e): the
# [N, K]-layout gather interleaves offsets per output row, while the
# [K, N] gather streams one offset's (mostly key-ordered) rows at a
# time. The per-offset einsum stays the default; CORSAIR_CONV_FOLD=1
# (set before process start) selects the folded form for
# re-measurement on other topologies.
import os as _os

_CONV_FOLD = _os.environ.get("CORSAIR_CONV_FOLD", "0") == "1"
# A/B experiment knob (read once at import, like the resunet plan
# knobs): skip the lax.cond banded/gather wrapper and call the banded
# kernel directly. The post-up_join roofline attributes 41.7 ms/step
# (30.9% of extraction device time) to the cond wrappers' data
# movement (logs/extraction_roofline.json); this knob measures how
# much of that an unconditional dispatch recovers. NOT a deployment
# mode: if a batch's coverage check fails the output is NaN-poisoned
# (loudly wrong) instead of falling back to the exact gather path.
_BANDED_NOCOND = _os.environ.get("CORSAIR_BANDED_NOCOND", "0") == "1"


def sparse_conv(params, feats, table, compute_dtype=None, plan=None):
    """Table-based sparse conv: ``out[i] = sum_k W[k] @ x[table[k, i]]``.

    ``params['kernel']``: [K, Cin, Cout]; ``feats``: [N_in, Cin];
    ``table``: [K, N_out] with miss value == N_in (gathers the zero row).
    Optional ``params['bias']``: [Cout]. ``compute_dtype=jnp.bfloat16``
    halves gather/matmul bandwidth on the MXU; accumulation stays f32.

    ``plan`` (``(starts, any_valid, ok, band, exact)`` from
    ``nn.resunet.make_banded_plans``) routes through the banded one-hot
    MXU kernel — 2.5-3.7x faster than the gather formulation and
    f32-exact (core/kernels/banded_conv.py) — with a ``lax.cond``
    fallback to the gather path when the per-batch coverage check
    failed (unsorted layouts, oversized windows).

    The plan's ``exact=False`` selects single-plane bf16 selection (3x
    cheaper selection + DEFAULT-precision recombine, 1/6 the passes) —
    exactly the precision class of the TPU gather path's default einsum
    (bf16(select(x)) == select(bf16(x))). Callers resolve the flag at
    CONSTRUCTION time (pipeline.FeatureExtractor reads the
    CORSAIR_BANDED_EXACT / CORSAIR_BANDED_FAST / CORSAIR_BANDED_BF16
    env knobs once there) — an env read here, inside the traced
    function, would be baked into the jit cache and silently ignore
    mid-process toggles (advisor r3). Single-plane is the accelerator
    DEFAULT since r4: the round-3 tpu_compile_helper SIGABRT ([1, W]
    sub-sublane bf16 operand) is fixed by the in-kernel sublane pad,
    validated by a 12/12 contained compile sweep on chip, and measured
    at extraction 1.28 -> 0.94 s / 128 queries (logs/on_chip_r4.log).
    """
    kernel = params["kernel"]
    if plan is not None:
        from corsair_tpu.core.kernels.banded_conv import (
            banded_conv_pallas,
        )

        starts, anyv, ok, band, exact = plan

        def banded(f):
            return banded_conv_pallas(
                f, table, kernel, starts, anyv, band=band, exact=exact
            )

        def gather(f):
            return sparse_conv(
                {"kernel": kernel}, f, table, compute_dtype
            )

        if _BANDED_NOCOND:
            out = banded(feats)
            # Scalar poison: fuses into the epilogue (no extra pass);
            # a failed coverage check surfaces as NaN, never as a
            # silently-wrong feature map.
            out = out * jnp.where(ok, 1.0, jnp.nan).astype(out.dtype)
        else:
            out = jax.lax.cond(ok, banded, gather, feats)
        if "bias" in params:
            out = out + params["bias"]
        return out
    if compute_dtype is not None:
        feats = feats.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    k, cin, cout = kernel.shape
    x_pad = jnp.concatenate(
        [feats, jnp.zeros((1, feats.shape[1]), feats.dtype)], axis=0
    )
    if _CONV_FOLD:
        # Fold the offset axis into the contraction: one [N, K*Cin] @
        # [K*Cin, Cout] matmul instead of K matmuls with a C-sized
        # (32-64) contraction (the MXU wants contractions >= 128; 864
        # for k=3^3, C=32). The gather emits [N, K, Cin] directly so
        # the reshape is free.
        gathered = x_pad[table.T]  # [N_out, K, Cin]
        out = jnp.dot(
            gathered.reshape(-1, k * cin), kernel.reshape(k * cin, cout),
            preferred_element_type=jnp.float32,
        )
    else:
        gathered = x_pad[table]  # [K, N_out, Cin]
        out = jnp.einsum(
            "knc,kcd->nd", gathered, kernel,
            preferred_element_type=jnp.float32,
        )
    if "bias" in params:
        out = out + params["bias"]
    return out


def sparse_conv1x1(params, feats):
    """Pointwise conv (kernel_size=1): a plain matmul."""
    out = jnp.dot(
        feats, params["kernel"][0], preferred_element_type=jnp.float32
    )
    if "bias" in params:
        out = out + params["bias"]
    return out


def masked_batch_stats(feats, valid):
    """Masked per-channel (mean, var) over valid rows only."""
    w = valid.astype(feats.dtype)[:, None]
    cnt = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(feats * w, axis=0) / cnt
    var = jnp.sum(((feats - mean) ** 2) * w, axis=0) / cnt
    return mean, var


def batch_norm(params, feats, valid, training: bool = False,
               stats_out=None, stats_key=None):
    """BatchNorm over all valid voxels in the batch (ME MinkowskiBatchNorm /
    torch BatchNorm1d semantics, ``model/common.py:20-26``).

    Eval mode uses running stats; training mode normalizes with masked
    batch stats (padding rows excluded). When ``stats_out`` (a dict) is
    provided in training mode, the batch stats are recorded under
    ``stats_key`` so the trainer can EMA-update the running stats.
    """
    if training:
        mean, var = masked_batch_stats(feats, valid)
        if stats_out is not None:
            stats_out[stats_key] = (mean, var)
    else:
        mean, var = params["mean"], params["var"]
    inv = jax.lax.rsqrt(var + EPS_BN)
    return (feats - mean) * inv * params["scale"] + params["bias"]


def instance_norm(params, feats, batch, valid, num_batches: int):
    """Per-sample normalization over each cloud's voxels
    (ME MinkowskiInstanceNorm)."""
    seg = jnp.where(valid, batch, num_batches)
    w = valid.astype(feats.dtype)[:, None]
    cnt = jax.ops.segment_sum(
        w, seg, num_segments=num_batches + 1
    )  # [B+1, 1]
    cnt = jnp.maximum(cnt, 1.0)
    mean = jax.ops.segment_sum(
        feats * w, seg, num_segments=num_batches + 1
    ) / cnt
    centered = feats - mean[seg]
    var = jax.ops.segment_sum(
        (centered**2) * w, seg, num_segments=num_batches + 1
    ) / cnt
    inv = jax.lax.rsqrt(var + EPS_IN)
    out = centered * inv[seg]
    if "scale" in params:
        out = out * params["scale"] + params["bias"]
    return out


def apply_norm(norm_type: str, params, feats, batch, valid,
               num_batches: int, training: bool = False,
               stats_out=None, stats_key=None):
    if norm_type == "BN":
        return batch_norm(params, feats, valid, training=training,
                          stats_out=stats_out, stats_key=stats_key)
    elif norm_type == "IN":
        return instance_norm(params, feats, batch, valid, num_batches)
    raise ValueError(f"norm type {norm_type} not defined")


def relu(feats):
    return jnp.maximum(feats, 0.0)


def segment_max_pool(feats, batch, valid, num_batches: int):
    """Per-sample max over voxels -> [B, C]. Replaces the python loop in
    ``model/fc.py:39-46`` with one segment reduction."""
    seg = jnp.where(valid, batch, num_batches)
    big_neg = jnp.asarray(-1e30, feats.dtype)
    masked = jnp.where(valid[:, None], feats, big_neg)
    pooled = jax.ops.segment_max(
        masked, seg, num_segments=num_batches + 1
    )
    return pooled[:num_batches]


def l2_normalize(feats, axis=-1, eps=1e-12):
    # rsqrt of clamped squared-norm: finite gradient at exactly-zero rows
    # (padding), unlike jnp.linalg.norm whose grad is NaN at 0.
    sq = jnp.sum(feats * feats, axis=axis, keepdims=True)
    return feats * jax.lax.rsqrt(jnp.maximum(sq, eps * eps))


def linear(params, x):
    return jnp.dot(x, params["weight"], preferred_element_type=jnp.float32) \
        + params["bias"]


def dense_batch_norm(params, x, training: bool = False,
                     stats_out=None, stats_key=None):
    """torch nn.BatchNorm1d on dense [B, C] activations (embedding head)."""
    if training:
        mean = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0)
        if stats_out is not None:
            stats_out[stats_key] = (mean, var)
    else:
        mean, var = params["mean"], params["var"]
    inv = jax.lax.rsqrt(var + EPS_BN)
    return (x - mean) * inv * params["scale"] + params["bias"]
