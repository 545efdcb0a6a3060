"""ResUNet2 family: the FCGF-style sparse residual U-Net, TPU-native.

Architecture parity with ``model/resunet.py`` (ResUNet2 + BN/IN variants;
deployed config ``ResUNetBN2C(in=1, out=16, bn_momentum=0.05,
normalize_feature=True, conv1_kernel_size=3, D=3)``, ``evaluation.py:181-188``):

encoder:  conv1(k3,s1)->norm->block1->relu          (32 ch)
          conv2(k3,s2)->norm->block2->relu          (64 ch, stride 2)
          conv3(k3,s2)->norm->block3->relu          (128 ch, stride 4)
          conv4(k3,s2)->norm->block4->relu          (256 ch, stride 8)
bottleneck: the stride-8 tensor is returned raw for the embedding head
decoder:  conv4_tr(s2)->norm->block->relu; concat skip(s4)
          conv3_tr(s2)->...; concat skip(s2)
          conv2_tr(s2)->...; concat skip(s1)
          conv1_tr(k1)->relu->final(k1,+bias)       (-> out_channels)
output:   L2-normalized per-voxel features + bottleneck tensor

Implementation is purely functional: ``init_params`` builds the parameter
pytree, ``forward(params, grid, maps, cfg)`` consumes the neighbor tables
from ``CoordinateManager``.
"""

from __future__ import annotations

import dataclasses
import os
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
class ResUNetConfig:
    name: str = "ResUNetBN2C"
    in_channels: int = 1
    out_channels: int = 16
    channels: Tuple[int, ...] = (32, 64, 128, 256)
    tr_channels: Tuple[int, ...] = (64, 64, 64, 128)  # BN2C
    norm_type: str = "BN"
    block_norm_type: str = "BN"
    conv1_kernel_size: int = 3
    bn_momentum: float = 0.05
    normalize_feature: bool = True
    dtype: jnp.dtype = jnp.float32
    # bf16 conv compute (f32 accumulation + f32 norms/outputs): halves
    # conv gather/matmul bandwidth for production inference. None = f32.
    compute_dtype: object = None
    # Banded one-hot MXU conv (core/kernels/banded_conv.py): base band
    # width for self/up tables (down tables use 2x — their fine-level
    # source windows are wider). 0 disables; nonzero routes every
    # 27-offset conv through the banded kernel with a per-batch
    # lax.cond fallback to the gather path when coverage fails.
    banded_band: int = 0
    # False = single-plane bf16 selection (see layers.sparse_conv) —
    # resolved at CONSTRUCTION time by pipeline.FeatureExtractor
    # (accelerator default since r4; CORSAIR_BANDED_EXACT/FAST/BF16
    # env overrides), never inside a trace.
    banded_exact: bool = True


# CHANNELS / TR_CHANNELS per variant (model/resunet.py:283-333).
_VARIANTS = {
    "ResUNetBN2":  dict(channels=(32, 64, 128, 256), tr=(32, 64, 64, 128), norm="BN", block="BN"),
    "ResUNetBN2B": dict(channels=(32, 64, 128, 256), tr=(64, 64, 64, 64), norm="BN", block="BN"),
    "ResUNetBN2C": dict(channels=(32, 64, 128, 256), tr=(64, 64, 64, 128), norm="BN", block="BN"),
    "ResUNetBN2D": dict(channels=(32, 64, 128, 256), tr=(64, 64, 128, 128), norm="BN", block="BN"),
    "ResUNetBN2E": dict(channels=(128, 128, 128, 256), tr=(64, 128, 128, 128), norm="BN", block="BN"),
    "ResUNetIN2":  dict(channels=(32, 64, 128, 256), tr=(32, 64, 64, 128), norm="BN", block="IN"),
    "ResUNetIN2B": dict(channels=(32, 64, 128, 256), tr=(64, 64, 64, 64), norm="BN", block="IN"),
    "ResUNetIN2C": dict(channels=(32, 64, 128, 256), tr=(64, 64, 64, 128), norm="BN", block="IN"),
    "ResUNetIN2D": dict(channels=(32, 64, 128, 256), tr=(64, 64, 128, 128), norm="BN", block="IN"),
    "ResUNetIN2E": dict(channels=(128, 128, 128, 256), tr=(64, 128, 128, 128), norm="BN", block="IN"),
}


def make_config(name: str, **kwargs) -> ResUNetConfig:
    v = _VARIANTS[name]
    return ResUNetConfig(
        name=name,
        channels=v["channels"],
        tr_channels=v["tr"],
        norm_type=v["norm"],
        block_norm_type=v["block"],
        **kwargs,
    )


def _conv_init(key, k, cin, cout, dtype):
    # Kaiming-uniform fan-in (torch default for ME convolutions).
    fan_in = k * cin
    bound = (6.0 / fan_in) ** 0.5
    return jax.random.uniform(
        key, (k, cin, cout), dtype, minval=-bound, maxval=bound
    )


def _norm_init(c, dtype):
    return {
        "scale": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }


def _block_init(key, c, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": {"kernel": _conv_init(k1, 27, c, c, dtype)},
        "norm1": _norm_init(c, dtype),
        "conv2": {"kernel": _conv_init(k2, 27, c, c, dtype)},
        "norm2": _norm_init(c, dtype),
    }


def init_params(key, cfg: ResUNetConfig):
    ch = cfg.channels
    tr = cfg.tr_channels
    keys = jax.random.split(key, 16)
    k27_1 = cfg.conv1_kernel_size ** 3
    p = {
        "conv1": {"kernel": _conv_init(keys[0], k27_1, cfg.in_channels, ch[0], cfg.dtype)},
        "norm1": _norm_init(ch[0], cfg.dtype),
        "block1": _block_init(keys[1], ch[0], cfg.dtype),
        "conv2": {"kernel": _conv_init(keys[2], 27, ch[0], ch[1], cfg.dtype)},
        "norm2": _norm_init(ch[1], cfg.dtype),
        "block2": _block_init(keys[3], ch[1], cfg.dtype),
        "conv3": {"kernel": _conv_init(keys[4], 27, ch[1], ch[2], cfg.dtype)},
        "norm3": _norm_init(ch[2], cfg.dtype),
        "block3": _block_init(keys[5], ch[2], cfg.dtype),
        "conv4": {"kernel": _conv_init(keys[6], 27, ch[2], ch[3], cfg.dtype)},
        "norm4": _norm_init(ch[3], cfg.dtype),
        "block4": _block_init(keys[7], ch[3], cfg.dtype),
        "conv4_tr": {"kernel": _conv_init(keys[8], 27, ch[3], tr[3], cfg.dtype)},
        "norm4_tr": _norm_init(tr[3], cfg.dtype),
        "block4_tr": _block_init(keys[9], tr[3], cfg.dtype),
        "conv3_tr": {"kernel": _conv_init(keys[10], 27, ch[2] + tr[3], tr[2], cfg.dtype)},
        "norm3_tr": _norm_init(tr[2], cfg.dtype),
        "block3_tr": _block_init(keys[11], tr[2], cfg.dtype),
        "conv2_tr": {"kernel": _conv_init(keys[12], 27, ch[1] + tr[2], tr[1], cfg.dtype)},
        "norm2_tr": _norm_init(tr[1], cfg.dtype),
        "block2_tr": _block_init(keys[13], tr[1], cfg.dtype),
        "conv1_tr": {"kernel": _conv_init(keys[14], 1, ch[0] + tr[1], tr[0], cfg.dtype)},
        "final": {
            "kernel": _conv_init(keys[15], 1, tr[0], cfg.out_channels, cfg.dtype),
            "bias": jnp.zeros((cfg.out_channels,), cfg.dtype),
        },
    }
    return p


# A/B knobs for make_banded_plans, read ONCE at import (a trace-time
# env read is baked into the jit cache; toggling mid-process would
# silently keep the old variant — advisor r3). Both are only meant to
# be set before process start (env X=.. python bench.py).
_BANDED_GROUPS_ENV = int(os.environ.get("CORSAIR_BANDED_GROUPS", "0"))
_BANDED_DOWN_BAND_ENV = int(
    os.environ.get("CORSAIR_BANDED_DOWN_BAND", "0"))


def make_banded_plans(maps: UNetMaps, band: int, ngroups: int = 0,
                      exact: bool = True):
    """Per-table banded-conv plans for ``forward`` (None entries =
    gather path). Runs inside the forward jit — cheap reductions over
    the tables — so coverage is re-checked per batch; ``sparse_conv``
    falls back via ``lax.cond`` when a batch's layout doesn't band.

    ``ngroups``: kernel-offset grouping granularity (0 = env knob
    ``CORSAIR_BANDED_GROUPS`` read at import, default 3). 3 groups
    offsets by their dim-0 (x) component; 9 groups by (x, y) — each
    group's source window then jumps only with z-steps (<~60 rows at
    bench scale), so the covering band (and with it the
    selection-matmul work, linear in band width) shrinks to ~tile +
    jitter + alignment. The per-group band DMA count rises 3 -> 9;
    selection FLOPs fall with the band.

    ``exact``: threaded into each plan tuple; False = single-plane
    bf16 selection (layers.sparse_conv docstring).
    """
    from corsair_tpu.core.kernels.banded_conv import (
        NGROUPS,
        TILE,
        banded_plan,
    )

    if ngroups <= 0:
        ngroups = _BANDED_GROUPS_ENV or NGROUPS
    # Down tables need a wider band than self/up tables: a stride-2
    # output tile maps to ~2x the fine-row span. 2*band (768 at the
    # deployed 384) leaves the L2 down spread (~812 measured at bench
    # shapes, scripts/study_band_groups.py) uncovered — that conv then
    # silently lax.conds to the gather path every batch — while
    # 896 = round_up(812, 128) recovers it onto the MXU path.
    band_down = _BANDED_DOWN_BAND_ENV or max(2 * band, 896)

    def mk(table, n_in, b):
        if table is None or b <= 0:
            return None
        k, n_out = table.shape
        if n_out % TILE or k % ngroups or k < ngroups:
            return None
        starts, anyv, ok = banded_plan(table, n_in, b, ngroups=ngroups)
        return (starts, anyv, ok, b, exact)

    L = maps.levels
    plans = []
    for lvl, Li in enumerate(L):
        n_l = Li.valid.shape[0]
        plans.append({
            "self": mk(Li.self_table, n_l, band),
            "down": (mk(Li.down_table, L[lvl - 1].valid.shape[0],
                        band_down) if lvl else None),
            "up": mk(Li.up_table, n_l, band) if lvl else None,
        })
    return plans


def _residual_block(params, feats, table, batch, valid, nb, norm_type,
                    training, stats_out=None, key_prefix="",
                    compute_dtype=None, plan=None):
    """conv(k3)->norm->relu->conv(k3)->norm->(+residual)->relu
    (``model/residual_block.py:57-73``)."""
    residual = feats
    out = sparse_conv(params["conv1"], feats, table, compute_dtype,
                      plan)
    out = apply_norm(norm_type, params["norm1"], out, batch, valid, nb,
                     training=training, stats_out=stats_out,
                     stats_key=key_prefix + ".norm1")
    out = relu(out)
    out = sparse_conv(params["conv2"], out, table, compute_dtype, plan)
    out = apply_norm(norm_type, params["norm2"], out, batch, valid, nb,
                     training=training, stats_out=stats_out,
                     stats_key=key_prefix + ".norm2")
    out = out + residual
    return relu(out)


def forward(params, grid: SparseGrid, maps: UNetMaps, cfg: ResUNetConfig,
            training: bool = False, stats_out=None, taps_out=None):
    """Returns (point_feats [N,out_ch], bottleneck_feats [N4, ch4]).

    Point features are L2-normalized when ``cfg.normalize_feature``
    (``model/resunet.py:258-268``); the bottleneck tensor is returned raw.
    Both come with their level's (batch, valid) available from ``maps``.

    ``training=True`` normalizes with masked batch statistics (torch BN
    train mode); pass a dict as ``stats_out`` to collect the per-layer
    batch stats for running-stat EMA updates.

    Pass a dict as ``taps_out`` to collect the named intermediate
    tensors of the reference forward (``model/resunet.py:207-256``):
    encoder ``out_s1/out_s2/out_s4/out_s8`` (post residual block, the
    variables ME dumps carry), decoder ``out_s4_tr/out_s2_tr/out_s1_tr``
    (post block + relu), and ``pre_normalize`` (after the final 1x1
    conv, before L2 normalization). Used by the checkpoint verifier to
    compare a MinkowskiEngine activation dump layer by layer.
    """
    L = maps.levels
    nb = grid.num_batches
    nt, bt = cfg.norm_type, cfg.block_norm_type
    if cfg.banded_band:
        P = make_banded_plans(maps, cfg.banded_band,
                              exact=cfg.banded_exact)
    else:
        P = [{"self": None, "down": None, "up": None} for _ in L]

    def norm(pname, feats, lvl):
        return apply_norm(nt, params[pname], feats, L[lvl].batch,
                          L[lvl].valid, nb, training=training,
                          stats_out=stats_out, stats_key=pname)

    # ---- encoder
    out_s1 = sparse_conv(params["conv1"], grid.feats, L[0].self_table, cfg.compute_dtype, P[0]["self"])
    out_s1 = norm("norm1", out_s1, 0)
    out_s1 = _residual_block(params["block1"], out_s1, L[0].self_table,
                             L[0].batch, L[0].valid, nb, bt, training,
                             stats_out, "block1", cfg.compute_dtype,
                             P[0]["self"])
    out = relu(out_s1)

    out_s2 = sparse_conv(params["conv2"], out, L[1].down_table, cfg.compute_dtype, P[1]["down"])
    out_s2 = norm("norm2", out_s2, 1)
    out_s2 = _residual_block(params["block2"], out_s2, L[1].self_table,
                             L[1].batch, L[1].valid, nb, bt, training,
                             stats_out, "block2", cfg.compute_dtype,
                             P[1]["self"])
    out = relu(out_s2)

    out_s4 = sparse_conv(params["conv3"], out, L[2].down_table, cfg.compute_dtype, P[2]["down"])
    out_s4 = norm("norm3", out_s4, 2)
    out_s4 = _residual_block(params["block3"], out_s4, L[2].self_table,
                             L[2].batch, L[2].valid, nb, bt, training,
                             stats_out, "block3", cfg.compute_dtype,
                             P[2]["self"])
    out = relu(out_s4)

    out_s8 = sparse_conv(params["conv4"], out, L[3].down_table, cfg.compute_dtype, P[3]["down"])
    out_s8 = norm("norm4", out_s8, 3)
    out_s8 = _residual_block(params["block4"], out_s8, L[3].self_table,
                             L[3].batch, L[3].valid, nb, bt, training,
                             stats_out, "block4", cfg.compute_dtype,
                             P[3]["self"])
    out = relu(out_s8)

    bottleneck = out_s8  # returned raw (model/resunet.py:230)

    if taps_out is not None:
        taps_out["out_s1"] = out_s1
        taps_out["out_s2"] = out_s2
        taps_out["out_s4"] = out_s4
        taps_out["out_s8"] = out_s8

    # ---- decoder
    out = sparse_conv(params["conv4_tr"], out, L[3].up_table, cfg.compute_dtype, P[3]["up"])
    out = norm("norm4_tr", out, 2)
    out = _residual_block(params["block4_tr"], out, L[2].self_table,
                          L[2].batch, L[2].valid, nb, bt, training,
                          stats_out, "block4_tr", cfg.compute_dtype,
                             P[2]["self"])
    out = relu(out)
    if taps_out is not None:
        taps_out["out_s4_tr"] = out
    out = jnp.concatenate([out, out_s4], axis=1)  # ME.cat skip

    out = sparse_conv(params["conv3_tr"], out, L[2].up_table, cfg.compute_dtype, P[2]["up"])
    out = norm("norm3_tr", out, 1)
    out = _residual_block(params["block3_tr"], out, L[1].self_table,
                          L[1].batch, L[1].valid, nb, bt, training,
                          stats_out, "block3_tr", cfg.compute_dtype,
                             P[1]["self"])
    out = relu(out)
    if taps_out is not None:
        taps_out["out_s2_tr"] = out
    out = jnp.concatenate([out, out_s2], axis=1)

    out = sparse_conv(params["conv2_tr"], out, L[1].up_table, cfg.compute_dtype, P[1]["up"])
    out = norm("norm2_tr", out, 0)
    out = _residual_block(params["block2_tr"], out, L[0].self_table,
                          L[0].batch, L[0].valid, nb, bt, training,
                          stats_out, "block2_tr", cfg.compute_dtype,
                             P[0]["self"])
    out = relu(out)
    if taps_out is not None:
        taps_out["out_s1_tr"] = out
    out = jnp.concatenate([out, out_s1], axis=1)

    out = sparse_conv1x1(params["conv1_tr"], out)
    out = relu(out)
    out = sparse_conv1x1(params["final"], out)
    if taps_out is not None:
        taps_out["pre_normalize"] = jnp.where(
            L[0].valid[:, None], out, 0.0
        )

    if cfg.normalize_feature:
        out = l2_normalize(out, axis=1)
    out = jnp.where(L[0].valid[:, None], out, 0.0)
    bottleneck = jnp.where(L[3].valid[:, None], bottleneck, 0.0)
    return out, bottleneck
