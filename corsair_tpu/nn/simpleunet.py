"""SimpleNet family: non-residual sparse U-Nets (legacy, registry-visible).

Parity with ``model/simpleunet.py``: SimpleNet (3 levels), SimpleNet2
(4 levels), SimpleNet3 (5 levels) and their BN/IN/B-E channel variants.
Pattern per level: conv(k3, s2 except level 0) -> norm -> relu; decoder:
transpose conv(k3, s2) -> norm -> relu -> concat skip; closing
conv1_tr(k3, s1) -> norm -> relu -> final(k1, +bias); optional L2-normalize.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from corsair_tpu.core.coordmap import UNetMaps
from corsair_tpu.core.sparse import SparseGrid
from corsair_tpu.nn.layers import (
    apply_norm,
    l2_normalize,
    relu,
    sparse_conv,
    sparse_conv1x1,
)


@dataclasses.dataclass(frozen=True)
class SimpleNetConfig:
    name: str = "SimpleNetBN2"
    in_channels: int = 1
    out_channels: int = 32
    channels: Tuple[int, ...] = (32, 64, 128, 256)
    tr_channels: Tuple[int, ...] = (32, 32, 64, 64)
    norm_type: str = "BN"
    conv1_kernel_size: int = 3
    bn_momentum: float = 0.1
    normalize_feature: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def num_levels(self) -> int:
        return len(self.channels)


VARIANTS = {
    # model/simpleunet.py:23-181 (3 levels)
    "SimpleNetBN":   dict(channels=(32, 64, 128), tr=(32, 32, 64), norm="BN"),
    "SimpleNetIN":   dict(channels=(32, 64, 128), tr=(32, 32, 64), norm="IN"),
    "SimpleNetBNE":  dict(channels=(16, 32, 32), tr=(16, 16, 32), norm="BN"),
    "SimpleNetINE":  dict(channels=(16, 32, 32), tr=(16, 16, 32), norm="IN"),
    # :183-389 (4 levels)
    "SimpleNetBN2":  dict(channels=(32, 64, 128, 256), tr=(32, 32, 64, 64), norm="BN"),
    "SimpleNetIN2":  dict(channels=(32, 64, 128, 256), tr=(32, 32, 64, 64), norm="IN"),
    "SimpleNetBN2B": dict(channels=(32, 64, 128, 256), tr=(64, 64, 64, 64), norm="BN"),
    "SimpleNetBN2C": dict(channels=(32, 64, 128, 256), tr=(32, 64, 64, 128), norm="BN"),
    "SimpleNetBN2D": dict(channels=(32, 64, 128, 256), tr=(32, 64, 64, 128), norm="BN"),
    "SimpleNetBN2E": dict(channels=(16, 32, 64, 128), tr=(16, 32, 32, 64), norm="BN"),
    "SimpleNetIN2E": dict(channels=(16, 32, 64, 128), tr=(16, 32, 32, 64), norm="IN"),
    # :391-613 (5 levels)
    "SimpleNetBN3":  dict(channels=(32, 64, 128, 256, 512), tr=(32, 32, 64, 64, 128), norm="BN"),
    "SimpleNetIN3":  dict(channels=(32, 64, 128, 256, 512), tr=(32, 32, 64, 64, 128), norm="IN"),
}


def make_config(name: str, **kwargs) -> SimpleNetConfig:
    v = VARIANTS[name]
    return SimpleNetConfig(
        name=name, channels=v["channels"], tr_channels=v["tr"],
        norm_type=v["norm"], **kwargs,
    )


def _conv_init(key, k, cin, cout, dtype):
    fan_in = k * cin
    bound = (6.0 / fan_in) ** 0.5
    return jax.random.uniform(key, (k, cin, cout), dtype, -bound, bound)


def _norm_init(c, dtype):
    return {
        "scale": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }


def init_params(key, cfg: SimpleNetConfig):
    ch, tr = cfg.channels, cfg.tr_channels
    L = cfg.num_levels
    keys = jax.random.split(key, 2 * L + 2)
    p = {}
    prev = cfg.in_channels
    k0 = cfg.conv1_kernel_size ** 3
    for i in range(L):
        kk = k0 if i == 0 else 27
        p[f"conv{i + 1}"] = {"kernel": _conv_init(keys[i], kk, prev, ch[i], cfg.dtype)}
        p[f"norm{i + 1}"] = _norm_init(ch[i], cfg.dtype)
        prev = ch[i]
    # decoder transpose convs from level L-1 down to level 1
    prev = ch[L - 1]
    for i in range(L - 1, 0, -1):
        p[f"conv{i + 1}_tr"] = {
            "kernel": _conv_init(keys[L + i], 27, prev, tr[i], cfg.dtype)
        }
        p[f"norm{i + 1}_tr"] = _norm_init(tr[i], cfg.dtype)
        prev = ch[i - 1] + tr[i]
    p["conv1_tr"] = {"kernel": _conv_init(keys[-2], 27, prev, tr[0], cfg.dtype)}
    p["norm1_tr"] = _norm_init(tr[0], cfg.dtype)
    p["final"] = {
        "kernel": _conv_init(keys[-1], 1, tr[0], cfg.out_channels, cfg.dtype),
        "bias": jnp.zeros((cfg.out_channels,), cfg.dtype),
    }
    return p


def forward(params, grid: SparseGrid, maps: UNetMaps, cfg: SimpleNetConfig,
            training: bool = False):
    L = maps.levels
    nlev = cfg.num_levels
    nb = grid.num_batches

    def norm(pname, feats, lvl):
        return apply_norm(cfg.norm_type, params[pname], feats, L[lvl].batch,
                          L[lvl].valid, nb, training=False)

    skips = []
    out = grid.feats
    for i in range(nlev):
        table = L[i].self_table if i == 0 else L[i].down_table
        out_si = sparse_conv(params[f"conv{i + 1}"], out, table)
        out_si = norm(f"norm{i + 1}", out_si, i)
        skips.append(out_si)
        out = relu(out_si)

    for i in range(nlev - 1, 0, -1):
        out = sparse_conv(params[f"conv{i + 1}_tr"], out, L[i].up_table)
        out = norm(f"norm{i + 1}_tr", out, i - 1)
        out = relu(out)
        out = jnp.concatenate([out, skips[i - 1]], axis=1)

    out = sparse_conv(params["conv1_tr"], out, L[0].self_table)
    out = norm("norm1_tr", out, 0)
    out = relu(out)
    out = sparse_conv1x1(params["final"], out)

    if cfg.normalize_feature:
        out = l2_normalize(out, axis=1)
    out = jnp.where(L[0].valid[:, None], out, 0.0)
    return out
