"""Checkpoint-conversion self-check: offset-permutation detection.

A real released checkpoint is not available in this environment, so these
tests fabricate one: a random-init net whose BN running stats are set to
the exact batch statistics its convs produce on the probe clouds (what
training convergence yields). The detector must recover the enumeration
the state_dict was written in.
"""

import numpy as np
import pytest

from corsair_tpu.nn import resunet
from corsair_tpu.nn.ckpt_verify import (
    _probe_clouds,
    bn_consistency_score,
    detect_offset_permutation,
)
from corsair_tpu.nn.torch_convert import (
    convert_resunet,
    offset_permutation_candidates,
)


def test_permutation_candidates_are_valid():
    from corsair_tpu.core.coordmap import kernel_offsets

    ours = kernel_offsets(3, 3)
    cands = offset_permutation_candidates()
    assert set(cands) == {"identity", "reverse", "c_order",
                          "c_order_reverse"}
    np.testing.assert_array_equal(cands["identity"], np.arange(27))
    # negating the centered dim-0-fastest grid reverses the enumeration
    np.testing.assert_array_equal(cands["reverse"], np.arange(27)[::-1])
    for name, perm in cands.items():
        assert sorted(perm) == list(range(27)), name
    assert not np.array_equal(cands["c_order"], np.arange(27))
    # c_order maps our offset k to the same geometric offset in C order
    half_c = np.stack(np.meshgrid(*([np.arange(-1, 2)] * 3),
                                  indexing="ij"),
                      axis=-1).reshape(-1, 3)
    np.testing.assert_array_equal(half_c[cands["c_order"]], ours)


def _fabricate_state_dict(params, stats):
    """Torch-layout state_dict from our param tree + measured BN stats,
    written under the IDENTITY enumeration."""
    sd = {}

    def put_conv(prefix, p):
        kernel = np.asarray(p["kernel"])
        sd[f"{prefix}.kernel"] = kernel[0] if kernel.shape[0] == 1 \
            else kernel
        if "bias" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["bias"])[None, :]

    def put_bn(prefix, p, key):
        mean, var = stats[key]
        sd[f"{prefix}.bn.weight"] = np.asarray(p["scale"])
        sd[f"{prefix}.bn.bias"] = np.asarray(p["bias"])
        sd[f"{prefix}.bn.running_mean"] = np.asarray(mean)
        sd[f"{prefix}.bn.running_var"] = np.asarray(var)

    def put_block(prefix, p, key):
        put_conv(f"{prefix}.conv1", p["conv1"])
        put_bn(f"{prefix}.norm1", p["norm1"], f"{key}.norm1")
        put_conv(f"{prefix}.conv2", p["conv2"])
        put_bn(f"{prefix}.norm2", p["norm2"], f"{key}.norm2")

    for i in (1, 2, 3, 4):
        put_conv(f"conv{i}", params[f"conv{i}"])
        put_bn(f"norm{i}", params[f"norm{i}"], f"norm{i}")
        put_block(f"block{i}", params[f"block{i}"], f"block{i}")
    for i in (2, 3, 4):
        put_conv(f"conv{i}_tr", params[f"conv{i}_tr"])
        put_bn(f"norm{i}_tr", params[f"norm{i}_tr"], f"norm{i}_tr")
        put_block(f"block{i}_tr", params[f"block{i}_tr"], f"block{i}_tr")
    put_conv("conv1_tr", params["conv1_tr"])
    put_conv("final", params["final"])
    return sd


@pytest.fixture(scope="module")
def fabricated():
    import jax

    from corsair_tpu.core.coordmap import CoordinateManager
    from corsair_tpu.core.voxelize import collate_to_grid

    cfg = resunet.make_config("ResUNetBN2C")
    params = resunet.init_params(jax.random.PRNGKey(3), cfg)
    clouds = _probe_clouds(n_clouds=2, n_points=1024)

    feats = [np.ones((len(c), 1), np.float32) for c in clouds]
    cap = int(2 ** np.ceil(np.log2(sum(len(c) for c in clouds))))
    grid = collate_to_grid(clouds, feats, cap)
    maps = CoordinateManager(num_levels=4).build(grid)
    stats = {}
    resunet.forward(params, grid, maps, cfg, training=True,
                    stats_out=stats)
    stats = {k: (np.asarray(m), np.asarray(v))
             for k, (m, v) in stats.items()}

    # a "trained" net: running stats == the stats its convs produce
    for key, (mean, var) in stats.items():
        node = params
        for part in key.split("."):
            node = node[part]
        node["mean"] = mean
        node["var"] = var

    return _fabricate_state_dict(params, stats), clouds


def test_identity_scores_zero(fabricated):
    sd, clouds = fabricated
    params = convert_resunet(sd, "identity")
    score = bn_consistency_score(params, clouds)
    assert score < 1e-6


def test_detector_recovers_identity(fabricated):
    sd, clouds = fabricated
    scores = detect_offset_permutation(sd, clouds)
    best = min(scores, key=scores.get)
    assert best == "identity", scores
    # wrong enumerations diverge by orders of magnitude
    for name, s in scores.items():
        if name != "identity":
            assert s > 100 * (scores["identity"] + 1e-9), scores


def test_detector_recovers_c_order(fabricated):
    """If the weights had been written z-fastest, the detector says so."""
    sd, clouds = fabricated
    perm = offset_permutation_candidates()["c_order"]
    inv = np.argsort(perm)
    sd_c = {
        k: (np.asarray(v)[inv] if k.endswith(".kernel")
            and np.asarray(v).ndim == 3 else v)
        for k, v in sd.items()
    }
    scores = detect_offset_permutation(sd_c, clouds)
    assert min(scores, key=scores.get) == "c_order", scores
