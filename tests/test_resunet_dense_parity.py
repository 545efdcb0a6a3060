"""Full-network parity: sparse ResUNetBN2C forward vs a brute-force dense
reference implementing MinkowskiEngine semantics with the same weights.

This is the checkpoint-free equivalent of validating against dumped ME
activations: every conv/norm/block/skip of the deployed architecture is
reproduced with dict-based sparse convolutions in pure numpy and compared
layer-for-layer against the TPU implementation's output.
"""

import jax
import numpy as np

from corsair_tpu.core.coordmap import CoordinateManager, kernel_offsets
from corsair_tpu.core.voxelize import collate_to_grid, voxelize_np
from corsair_tpu.nn import resunet


def np_sparse_conv(in_coords, in_feats, out_coords, kernel, offsets,
                   dilation, bias=None):
    lut = {tuple(c): i for i, c in enumerate(in_coords)}
    out = np.zeros((len(out_coords), kernel.shape[2]), np.float32)
    for i, oc in enumerate(out_coords):
        for k, o in enumerate(offsets):
            j = lut.get(tuple(oc + o * dilation))
            if j is not None:
                out[i] += in_feats[j] @ kernel[k]
    if bias is not None:
        out += bias
    return out


def np_bn(p, x):
    return (x - np.asarray(p["mean"])) / np.sqrt(
        np.asarray(p["var"]) + 1e-5
    ) * np.asarray(p["scale"]) + np.asarray(p["bias"])


def np_block(p, coords, feats, offsets):
    residual = feats
    out = np_sparse_conv(coords, feats, coords,
                         np.asarray(p["conv1"]["kernel"]), offsets, 1)
    out = np.maximum(np_bn(p["norm1"], out), 0)
    out = np_sparse_conv(coords, out, coords,
                         np.asarray(p["conv2"]["kernel"]), offsets, 1)
    out = np_bn(p["norm2"], out)
    return np.maximum(out + residual, 0)


def dense_reference_forward(params, coords, feats):
    """ME-semantics ResUNetBN2C forward in pure numpy dicts."""
    offs = kernel_offsets(3)

    def down(coords, t):
        return np.unique((coords // (2 * t)) * (2 * t), axis=0)

    p = params
    c1 = coords
    # encoder level 1 (stride 1)
    s1 = np_sparse_conv(c1, feats, c1, np.asarray(p["conv1"]["kernel"]),
                        offs, 1)
    s1 = np_bn(p["norm1"], s1)
    s1 = np_block(p["block1"], c1, s1, offs)
    out = np.maximum(s1, 0)

    # encoder levels 2-4
    skips = {1: (c1, s1)}
    cur_c, cur_t = c1, 1
    cur = out
    for lvl in (2, 3, 4):
        nc = down(cur_c, cur_t)
        x = np_sparse_conv(
            cur_c, cur, nc, np.asarray(p[f"conv{lvl}"]["kernel"]), offs,
            cur_t,
        )
        x = np_bn(p[f"norm{lvl}"], x)
        x = np_block(p[f"block{lvl}"], nc, x, offs * (cur_t * 2))
        skips[lvl] = (nc, x)
        cur_c, cur_t = nc, cur_t * 2
        cur = np.maximum(x, 0)

    bottleneck = skips[4][1]

    # decoder: transpose convs back up with skip concat
    for lvl in (4, 3, 2):
        fine_c, fine_x = skips[lvl - 1]
        fine_t = 2 ** (lvl - 2)
        x = np_sparse_conv(
            cur_c, cur, fine_c, np.asarray(p[f"conv{lvl}_tr"]["kernel"]),
            -offs, fine_t,
        )
        x = np_bn(p[f"norm{lvl}_tr"], x)
        x = np_block(p[f"block{lvl}_tr"], fine_c, x, offs * fine_t)
        x = np.maximum(x, 0)
        cur = np.concatenate([x, fine_x], axis=1)
        cur_c, cur_t = fine_c, fine_t

    cur = cur @ np.asarray(p["conv1_tr"]["kernel"])[0]
    cur = np.maximum(cur, 0)
    cur = cur @ np.asarray(p["final"]["kernel"])[0] + np.asarray(
        p["final"]["bias"]
    )
    cur = cur / np.maximum(
        np.linalg.norm(cur, axis=1, keepdims=True), 1e-12
    )
    return cur, bottleneck, skips[4][0]


class TestFullNetworkParity:
    def test_resunet_matches_dense_reference(self, rng):
        pts = rng.randn(250, 3).astype(np.float32)
        _, gridc, _ = voxelize_np(pts, 0.25)
        n = len(gridc)
        grid = collate_to_grid(
            [gridc], [np.ones((n, 1), np.float32)], n + 13
        )
        cfg = resunet.make_config("ResUNetBN2C", in_channels=1,
                                  out_channels=16, normalize_feature=True)
        params = resunet.init_params(jax.random.PRNGKey(5), cfg)
        # randomize BN stats so norm layers actually transform
        def jitter(p):
            for k in list(p.keys()):
                if isinstance(p[k], dict):
                    jitter(p[k])
                elif k in ("mean", "bias"):
                    p[k] = p[k] + 0.05 * rng.randn(*p[k].shape).astype(
                        np.float32
                    )
                elif k in ("var", "scale"):
                    p[k] = p[k] * (1 + 0.1 * rng.rand(
                        *p[k].shape
                    ).astype(np.float32))
        jitter(params)

        maps = CoordinateManager(num_levels=4).build(grid)
        out, bottleneck = resunet.forward(params, grid, maps, cfg)
        out = np.asarray(out)[:n]

        ref_out, ref_bottleneck, ref_c4 = dense_reference_forward(
            params, gridc, np.ones((n, 1), np.float32)
        )

        np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=1e-4)

        # bottleneck rows match after aligning coordinate order
        l4 = maps.levels[3]
        v4 = np.asarray(l4.valid)
        c4 = np.asarray(l4.coords)[v4]
        bt = np.asarray(bottleneck)[v4]
        ref_lut = {tuple(c): i for i, c in enumerate(ref_c4)}
        assert len(c4) == len(ref_c4)
        for row, c in enumerate(c4):
            j = ref_lut[tuple(c)]
            np.testing.assert_allclose(
                bt[row], ref_bottleneck[j], rtol=1e-3, atol=1e-4,
                err_msg=f"bottleneck row {row}",
            )
