"""Checkpoint parity verification: ME kernel-offset self-detection.

The released CORSAIR checkpoints were trained with MinkowskiEngine, whose
C++ kernel-region iterator fixes the enumeration order of the 27 kernel
offsets (reference: every ``MinkowskiConvolution`` in
``model/resunet.py:49-193``). That order cannot be re-verified in this
environment (no ME build, no released weights), so the converter's
``offset_permutation`` is, a priori, an assumption.

This module de-risks it with a measurable signal: each conv in the
deployed net is immediately followed by a BatchNorm whose checkpoint
carries *running statistics of the conv's training-time outputs*. Under
the correct kernel-axis permutation, the conv outputs on plausible input
clouds have batch statistics close to those running stats; under a wrong
permutation the 27 weight slices are applied to the wrong geometric
neighbors and the statistics diverge — increasingly so with depth. We
score every candidate permutation by the aggregate mean/variance
divergence across all BN layers and pick the argmin.

This is a *statistical* self-check (synthetic probe clouds are not the
training distribution); ``scripts/verify_checkpoint.py`` additionally
reports end-metric deltas (Precision@10% / Top1-CD vs README.md:160) per
candidate whenever real data is available.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def _probe_clouds(n_clouds: int = 4, n_points: int = 2048,
                  voxel: float = 0.03, seed: int = 0) -> List[np.ndarray]:
    """Surface-like unit-scale clouds voxelized at the protocol's 0.03 —
    roughly the voxel-count/occupancy regime of normalized ShapeNet
    models."""
    rng = np.random.RandomState(seed)
    clouds = []
    for i in range(n_clouds):
        pts = rng.randn(n_points, 3)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        pts *= 0.4 + 0.6 * rng.rand(n_points, 1)  # filled-ish shell
        pts[:, 1] *= 0.5 + 0.5 * rng.rand()       # squashed: anisotropic
        grid = np.floor(pts / voxel).astype(np.int32)
        _, first = np.unique(grid, axis=0, return_index=True)
        clouds.append(grid[np.sort(first)])
    return clouds


def bn_consistency_score(model_params, clouds: List[np.ndarray],
                         model_name: str = "ResUNetBN2C") -> float:
    """Aggregate divergence between probe-batch BN statistics and the
    checkpoint's running stats, across every BN layer of the net.

    Runs on CPU (tiny clouds; keeps TPU compile out of checkpoint load).
    Lower is better.
    """
    import jax
    import jax.numpy as jnp

    from corsair_tpu.core.voxelize import collate_to_grid
    from corsair_tpu.core.coordmap import CoordinateManager
    from corsair_tpu.nn import resunet

    cfg = resunet.make_config(model_name)
    manager = CoordinateManager(num_levels=4)
    feats = [np.ones((len(c), 1), np.float32) for c in clouds]
    cap = int(2 ** np.ceil(np.log2(sum(len(c) for c in clouds))))
    grid = collate_to_grid(clouds, feats, cap)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = jax.device_put(model_params, cpu)
        grid = jax.device_put(grid, cpu)
        maps = manager.build(grid)
        stats: Dict = {}
        resunet.forward(params, grid, maps, cfg, training=True,
                        stats_out=stats)

        def layer_params(key: str):
            node = params
            for part in key.split("."):
                node = node[part]
            return node

        total, n = 0.0, 0
        for key, (mean_b, var_b) in stats.items():
            p = layer_params(key)
            mu, var = p["mean"], p["var"]
            inv = 1.0 / (jnp.asarray(var) + 1e-5)
            d_mean = jnp.mean((mean_b - mu) ** 2 * inv)
            d_var = jnp.mean(jnp.log((var_b + 1e-5) * inv) ** 2)
            total += float(d_mean + d_var)
            n += 1
    return total / max(n, 1)


def detect_offset_permutation(state_dict,
                              clouds: Optional[List[np.ndarray]] = None,
                              model_name: str = "ResUNetBN2C"
                              ) -> Dict[str, float]:
    """Score every candidate ME kernel-offset enumeration for a torch
    ``state_dict``. Returns {candidate_name: score}; lower wins."""
    from corsair_tpu.nn.torch_convert import (
        convert_resunet,
        offset_permutation_candidates,
    )

    if clouds is None:
        clouds = _probe_clouds()
    scores = {}
    for name in offset_permutation_candidates():
        params = convert_resunet(state_dict, name)
        scores[name] = bn_consistency_score(params, clouds, model_name)
    return scores
