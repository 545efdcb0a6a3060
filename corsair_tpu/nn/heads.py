"""Embedding heads: bottleneck tensor -> global 256-D retrieval descriptor.

Parity with ``model/fc.py``: the deployed head is ``conv1_max_embedding``
(1x1 sparse conv 256->1024 on the stride-8 bottleneck, per-sample max-pool
over voxels, FC 1024->512 (BN+ReLU) -> 256; ``model/fc.py:114-128``,
instantiated ``fc.conv1_max_embedding(1024, 512, 256)``,
``evaluation.py:192``). The registry also exposes the alternative heads
(FC, max_embedding, NetVLAD, NetVLADLoupe, GatingContext, identity).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from corsair_tpu.nn.layers import (
    dense_batch_norm,
    l2_normalize,
    linear,
    relu,
    segment_max_pool,
    sparse_conv1x1,
)


def _linear_init(key, cin, cout, dtype=jnp.float32):
    bound = (1.0 / cin) ** 0.5
    k1, k2 = jax.random.split(key)
    return {
        "weight": jax.random.uniform(k1, (cin, cout), dtype, -bound, bound),
        "bias": jax.random.uniform(k2, (cout,), dtype, -bound, bound),
    }


def _bn_init(c, dtype=jnp.float32):
    return {
        "scale": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }


# ---------------------------------------------------------------- conv1_max
def conv1_max_embedding_init(key, conv_channels=1024, linear1_dim=512,
                             linear2_dim=256, in_channels=256,
                             dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    bound = (1.0 / in_channels) ** 0.5
    return {
        "final": {
            "kernel": jax.random.uniform(
                k1, (1, in_channels, conv_channels), dtype, -bound, bound
            ),
            "bias": jnp.zeros((conv_channels,), dtype),
        },
        "fc1": _linear_init(k2, conv_channels, linear1_dim, dtype),
        "bn1": _bn_init(linear1_dim, dtype),
        "fc2": _linear_init(k3, linear1_dim, linear2_dim, dtype),
    }


def conv1_max_embedding_apply(params, feats, batch, valid, num_batches: int,
                              training: bool = False, stats_out=None):
    """bottleneck [N4, 256] -> descriptors [B, 256]."""
    x = sparse_conv1x1(params["final"], feats)           # [N4, 1024]
    pooled = segment_max_pool(x, batch, valid, num_batches)  # [B, 1024]
    h = linear(params["fc1"], pooled)
    h = dense_batch_norm(params["bn1"], h, training=training,
                         stats_out=stats_out, stats_key="bn1")
    h = relu(h)
    return linear(params["fc2"], h)


# ---------------------------------------------------------------- max_embed
def max_embedding_init(key, feat_dim=256, linear1_dim=512, linear2_dim=256,
                       dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": _linear_init(k1, feat_dim, linear1_dim, dtype),
        "bn1": _bn_init(256, dtype),  # quirk kept: BN dim hard-coded to 256
        "fc2": _linear_init(k2, linear1_dim, linear2_dim, dtype),
    }


def max_embedding_apply(params, feats, batch, valid, num_batches: int):
    pooled = segment_max_pool(feats, batch, valid, num_batches)
    h = linear(params["fc1"], pooled)
    h = dense_batch_norm(params["bn1"], h, training=False)
    h = relu(h)
    return linear(params["fc2"], h)


# ---------------------------------------------------------------------- FC
def fc_head_init(key, dims: Tuple[int, ...], dtype=jnp.float32):
    keys = jax.random.split(key, len(dims) - 1)
    return {
        f"fc{i}": _linear_init(keys[i], dims[i], dims[i + 1], dtype)
        for i in range(len(dims) - 1)
    }


def fc_head_apply(params, feats, batch, valid, num_batches: int):
    x = segment_max_pool(feats, batch, valid, num_batches)
    for i in range(len(params)):
        x = linear(params[f"fc{i}"], x)
    return x


# ------------------------------------------------------------------ NetVLAD
def netvlad_init(key, num_clusters=32, dim=256, alpha=100.0,
                 dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    centroids = jax.random.uniform(k1, (num_clusters, dim), dtype)
    return {
        "centroids": centroids,
        "conv_weight": 2.0 * alpha * centroids,        # [K, D]
        "conv_bias": -alpha * jnp.linalg.norm(centroids, axis=1),
        "fc": _linear_init(k2, num_clusters * dim, 1024, dtype),
    }


def netvlad_apply(params, feats, batch, valid, num_batches: int,
                  normalize_input: bool = True):
    """Soft-assignment VLAD pooling (``model/fc.py:139-213``), batched with
    segment reductions instead of the reference's per-sample python loop."""
    x = feats
    if normalize_input:
        x = l2_normalize(x, axis=1)
    k = params["centroids"].shape[0]
    logits = x @ params["conv_weight"].T + params["conv_bias"]  # [N, K]
    # per-sample softmax is row-wise: independent of batching
    soft = jax.nn.softmax(logits, axis=1) * valid[:, None]
    # residual aggregation: vlad[b, k, d] = sum_i soft[i,k] * (x[i,d] - c[k,d])
    seg = jnp.where(valid, batch, num_batches)
    sx = jax.ops.segment_sum(
        soft[:, :, None] * x[:, None, :], seg, num_segments=num_batches + 1
    )[:num_batches]  # [B, K, D]
    ssum = jax.ops.segment_sum(
        soft, seg, num_segments=num_batches + 1
    )[:num_batches]  # [B, K]
    vlad = sx - ssum[:, :, None] * params["centroids"][None]
    vlad = l2_normalize(vlad, axis=2)            # intra-normalization
    vlad = vlad.reshape(num_batches, -1)
    out = linear(params["fc"], vlad)
    return l2_normalize(out, axis=1)


# ------------------------------------------------------------ NetVLADLoupe
def netvlad_loupe_init(key, feature_size=256, cluster_size=64,
                       output_dim=1024, gating=False, add_batch_norm=True,
                       dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    inv_sqrt = 1.0 / (feature_size ** 0.5)
    p = {
        "cluster_weights": jax.random.normal(
            ks[0], (feature_size, cluster_size), dtype) * inv_sqrt,
        "cluster_weights2": jax.random.normal(
            ks[1], (1, feature_size, cluster_size), dtype) * inv_sqrt,
        "hidden1_weights": jax.random.normal(
            ks[2], (cluster_size * feature_size, output_dim), dtype
        ) * inv_sqrt,
        "bn2": _bn_init(output_dim, dtype),
    }
    if add_batch_norm:
        p["bn1"] = _bn_init(cluster_size, dtype)
    else:
        p["cluster_biases"] = jax.random.normal(
            ks[3], (cluster_size,), dtype) * inv_sqrt
    if gating:
        p["gating"] = gating_context_init(ks[4], output_dim, add_batch_norm,
                                          dtype)
    return p


def netvlad_loupe_apply(params, feats, batch, valid, num_batches: int):
    k = params["cluster_weights"].shape[1]
    d = feats.shape[1]
    act = feats @ params["cluster_weights"]  # [N, K]
    if "bn1" in params:
        act = dense_batch_norm(params["bn1"], act, training=False)
    else:
        act = act + params["cluster_biases"]
    act = jax.nn.softmax(act, axis=1) * valid[:, None]
    seg = jnp.where(valid, batch, num_batches)
    a_sum = jax.ops.segment_sum(
        act, seg, num_segments=num_batches + 1
    )[:num_batches]  # [B, K]
    a = a_sum[:, None, :] * params["cluster_weights2"]      # [B, D, K]
    vlad = jax.ops.segment_sum(
        act[:, :, None] * feats[:, None, :], seg,
        num_segments=num_batches + 1,
    )[:num_batches]  # [B, K, D]
    vlad = jnp.transpose(vlad, (0, 2, 1)) - a               # [B, D, K]
    vlad = l2_normalize(vlad, axis=1)
    vlad = vlad.reshape(num_batches, k * d)
    vlad = l2_normalize(vlad, axis=1)
    out = vlad @ params["hidden1_weights"]
    out = dense_batch_norm(params["bn2"], out, training=False)
    if "gating" in params:
        out = gating_context_apply(params["gating"], out)
    return out


def gating_context_init(key, dim, add_batch_norm=True, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    p = {"gating_weights": jax.random.normal(k1, (dim, dim), dtype)
         / (dim ** 0.5)}
    if add_batch_norm:
        p["bn1"] = _bn_init(dim, dtype)
    else:
        p["gating_biases"] = jax.random.normal(k2, (dim,), dtype) / (dim**0.5)
    return p


def gating_context_apply(params, x):
    gates = x @ params["gating_weights"]
    if "bn1" in params:
        gates = dense_batch_norm(params["bn1"], gates, training=False)
    else:
        gates = gates + params["gating_biases"]
    return x * jax.nn.sigmoid(gates)


def identity_apply(params, feats, *args, **kwargs):
    return feats
