"""Training-step benchmark at realistic triplet scale.

Times one full jitted ``train_step`` (three collated forwards + point
contrastive and descriptor triplet losses + Adam update + EMA BN) on the
current accelerator — the TPU counterpart of the reference's
single-GPU training loop (``train.py`` / ``datasets/ChairDataset.py``).
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/corsair_jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_cloud(rng, n_pts=10000, voxel=0.05):
    pts = rng.randn(n_pts, 3).astype(np.float32)
    pts /= np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-9)
    pts *= 0.9
    g = np.floor(pts / voxel).astype(np.int32)
    _, first = np.unique(g, axis=0, return_index=True)
    return g[np.sort(first)]


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from corsair_tpu.core.voxelize import collate_to_grid
    from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor
    from corsair_tpu.train.trainer import TrainConfig, pad_pairs, train_step

    rng = np.random.RandomState(0)
    B = 8                    # triplets per step
    CAP = 65536              # collated row capacity per role

    extractor = FeatureExtractor(ExtractorConfig())
    params = extractor.init_params(jax.random.PRNGKey(0))
    cfg = TrainConfig()
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def role_grid():
        clouds = [make_cloud(rng) for _ in range(B)]
        feats = [np.ones((len(c), 1), np.float32) for c in clouds]
        return collate_to_grid(clouds, feats, CAP), clouds

    base, base_clouds = role_grid()
    pos, _ = role_grid()
    neg, _ = role_grid()
    n0 = len(base_clouds[0])
    pip, pipv = pad_pairs(
        np.stack([np.arange(512) % n0, np.arange(512) % n0], 1), 1024
    )
    pin, pinv = pad_pairs(
        rng.randint(0, n0, (512, 2)).astype(np.int32), 1024
    )
    nin, ninv = pad_pairs(
        rng.randint(0, n0, (512, 2)).astype(np.int32), 1024
    )
    pip, pipv = jnp.asarray(pip), jnp.asarray(pipv)
    pin, pinv = jnp.asarray(pin), jnp.asarray(pinv)
    nin, ninv = jnp.asarray(nin), jnp.asarray(ninv)

    args = (params, opt_state, base, pos, neg, pip, pipv, pin, pinv,
            nin, ninv, extractor.model_cfg, extractor.manager, cfg, opt)
    t0 = time.perf_counter()
    params2, opt_state2, loss, aux = train_step(*args)
    jax.block_until_ready(loss)
    compile_s = time.perf_counter() - t0

    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _, _, loss, _ = train_step(*args)
        jax.block_until_ready(loss)
        ts.append(time.perf_counter() - t0)
    step_s = sorted(ts)[len(ts) // 2]
    print(f"train_step B={B} triplets (3x{CAP} rows): "
          f"{step_s*1000:.0f} ms/step ({B/step_s:.1f} triplets/s), "
          f"compile {compile_s:.0f}s, loss={float(loss):.4f}")


if __name__ == "__main__":
    main()
