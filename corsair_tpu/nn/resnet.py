"""Sparse ResNet classifiers (ResNet14/18/34/50*/101*).

Parity with ``model/resnet.py:25-157``: conv1(k5,s2) -> BN -> ReLU ->
avg-pool(k2,s2) -> 4 residual stages (stride 2 each, 1x1-conv downsample
on the skip) -> conv5(k3,s3) -> BN -> ReLU -> global max pool -> linear.
The reference never registers these in its model registry
(``model/__init__.py:21`` imports but never calls ``add_models``); they
are provided here for completeness with basic-block stages (the
bottleneck-block ResNet50/101 variants fall back to basic blocks, as the
reference's ``BasicBlock``-only import makes them equivalent).

Coordinate maps are built dynamically with ``strided_conv_map`` because
the stage strides (2, 2, 2, 2, then 3) do not fit the fixed U-Net
manager.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from corsair_tpu.core.coordmap import (
    kernel_offsets,
    neighbor_table,
    strided_conv_map,
)
from corsair_tpu.core.sparse import SparseGrid
from corsair_tpu.nn.layers import (
    batch_norm,
    linear,
    relu,
    segment_max_pool,
    sparse_conv,
    sparse_conv1x1,
)


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    name: str = "ResNet14"
    in_channels: int = 1
    out_channels: int = 40
    layers: Tuple[int, ...] = (1, 1, 1, 1)
    init_dim: int = 64
    planes: Tuple[int, ...] = (64, 128, 256, 512)
    dtype: jnp.dtype = jnp.float32


VARIANTS = {
    "ResNet14": (1, 1, 1, 1),
    "ResNet18": (2, 2, 2, 2),
    "ResNet34": (3, 4, 6, 3),
    "ResNet50": (3, 4, 6, 3),
    "ResNet101": (3, 4, 23, 3),
}


def make_config(name: str, **kwargs) -> ResNetConfig:
    return ResNetConfig(name=name, layers=VARIANTS[name], **kwargs)


def _conv_init(key, k, cin, cout, dtype):
    # kaiming normal fan-out (model/resnet.py:73-77)
    std = (2.0 / (k * cout)) ** 0.5
    return jax.random.normal(key, (k, cin, cout), dtype) * std


def _norm_init(c, dtype):
    return {
        "scale": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }


def init_params(key, cfg: ResNetConfig):
    keys = iter(jax.random.split(key, 256))
    p = {
        "conv1": {"kernel": _conv_init(next(keys), 125, cfg.in_channels,
                                       cfg.init_dim, cfg.dtype)},
        "bn1": _norm_init(cfg.init_dim, cfg.dtype),
    }
    inplanes = cfg.init_dim
    for stage, (blocks, planes) in enumerate(
        zip(cfg.layers, cfg.planes), start=1
    ):
        stage_p = []
        for b in range(blocks):
            block = {
                "conv1": {"kernel": _conv_init(next(keys), 27, inplanes,
                                               planes, cfg.dtype)},
                "norm1": _norm_init(planes, cfg.dtype),
                "conv2": {"kernel": _conv_init(next(keys), 27, planes,
                                               planes, cfg.dtype)},
                "norm2": _norm_init(planes, cfg.dtype),
            }
            if b == 0 and inplanes != planes:
                block["downsample_conv"] = {
                    "kernel": _conv_init(next(keys), 1, inplanes, planes,
                                         cfg.dtype)
                }
                block["downsample_norm"] = _norm_init(planes, cfg.dtype)
            elif b == 0:
                # stride-2 skip still needs a projection map; identity
                # weights keep parity with torch's downsample-on-stride
                block["downsample_conv"] = {
                    "kernel": jnp.eye(inplanes, dtype=cfg.dtype)[None]
                }
                block["downsample_norm"] = _norm_init(planes, cfg.dtype)
            stage_p.append(block)
            inplanes = planes
        p[f"layer{stage}"] = stage_p
    p["conv5"] = {"kernel": _conv_init(next(keys), 27, inplanes, inplanes,
                                       cfg.dtype)}
    p["bn5"] = _norm_init(inplanes, cfg.dtype)
    p["final"] = {
        "weight": jax.random.normal(
            next(keys), (inplanes, cfg.out_channels), cfg.dtype
        ) * (1.0 / inplanes) ** 0.5,
        "bias": jnp.zeros((cfg.out_channels,), cfg.dtype),
    }
    return p


def forward(params, grid: SparseGrid, cfg: ResNetConfig):
    """Returns logits [B, out_channels]."""
    nb = grid.num_batches
    cap = grid.capacity

    state = (grid.coords, grid.batch, grid.valid, grid.stride)
    feats = grid.feats

    def conv_block(pname, state, feats, stride, kernel_size):
        c, b, v, t = state
        new_state, table = strided_conv_map(
            c, b, v, t, stride, kernel_size, cap
        )
        out = sparse_conv(params[pname], feats, table)
        return new_state, out

    # conv1 k5 s2
    state, x = conv_block("conv1", state, feats, 2, 5)
    x = batch_norm(params["bn1"], x, state[2])
    x = relu(x)

    # avg pool k2 s2
    c, b, v, t = state
    (oc, ob, ov, ot), pool_table = strided_conv_map(c, b, v, t, 2, 2, cap)
    x_pad = jnp.concatenate([x, jnp.zeros((1, x.shape[1]))], 0)
    gathered = x_pad[pool_table]                       # [K, N, C]
    hit = (pool_table < x.shape[0]).astype(jnp.float32)[:, :, None]
    x = jnp.sum(gathered * hit, 0) / jnp.maximum(jnp.sum(hit, 0), 1.0)
    state = (oc, ob, ov, ot)

    # residual stages
    offs3 = kernel_offsets(3)
    for stage in range(1, 5):
        blocks = params[f"layer{stage}"]
        for bi, bp in enumerate(blocks):
            stride = 2 if bi == 0 else 1
            c, b, v, t = state
            if stride == 2:
                new_state, table_in = strided_conv_map(c, b, v, t, 2, 3,
                                                       cap)
                # 1x1 stride-2 projection for the skip: center offset only
                center = kernel_offsets(1)
                skip_table = neighbor_table(
                    c, b, v, new_state[0], new_state[1], new_state[2],
                    center, t,
                )
                x_skip = sparse_conv(bp["downsample_conv"], x, skip_table)
                x_skip = batch_norm(bp["downsample_norm"], x_skip,
                                    new_state[2])
                state = new_state
            else:
                table_in = neighbor_table(c, b, v, c, b, v, offs3, t)
                new_state = state
                x_skip = x
                if "downsample_conv" in bp:
                    x_skip = sparse_conv1x1(bp["downsample_conv"], x)
                    x_skip = batch_norm(bp["downsample_norm"], x_skip,
                                        new_state[2])
            out = sparse_conv(bp["conv1"], x, table_in)
            out = batch_norm(bp["norm1"], out, state[2])
            out = relu(out)
            c2, b2, v2, t2 = state
            self_table = neighbor_table(c2, b2, v2, c2, b2, v2, offs3, t2)
            out = sparse_conv(bp["conv2"], out, self_table)
            out = batch_norm(bp["norm2"], out, state[2])
            x = relu(out + x_skip)

    # conv5 k3 s3
    state, x = conv_block("conv5", state, x, 3, 3)
    x = batch_norm(params["bn5"], x, state[2])
    x = relu(x)

    pooled = segment_max_pool(x, state[1], state[2], nb)
    return linear(params["final"], pooled)
