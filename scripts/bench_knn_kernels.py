"""A/B: fused full-width sector-kNN kernel vs equal-width slab kernel.

Bench shapes: batch 8 clouds, cap 16384, K=4 sectors + global, k=5.
Outputs are reduced to scalars inside the jit (axon-tunnel measurement
pitfalls, NOTES.md) so each fetch is one RTT.
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/corsair_jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from corsair_tpu.core.kernels.sector_knn import (
        sector_knn_pallas,
        slab_sector_knn_pallas,
    )

    rng = np.random.RandomState(0)
    B, cap, K, k = 8, 16384, 4, 5

    def cloud():
        f = rng.randn(cap, 16).astype(np.float32)
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        sec = rng.randint(0, K, cap).astype(np.int32)
        v = np.ones(cap, bool)
        v[-200:] = False
        return f, sec, v

    q = jnp.asarray(np.stack(
        [cloud()[0] for _ in range(B)]
    ))
    tgt = [cloud() for _ in range(B)]
    F1 = jnp.asarray(np.stack([t[0] for t in tgt]))
    SEC = jnp.asarray(np.stack([t[1] for t in tgt]))
    V1 = jnp.asarray(np.stack([t[2] for t in tgt]))

    def reduced(fn):
        @jax.jit
        def f(q, F1, SEC, V1):
            out = jax.vmap(
                lambda a, b, s, v: fn(a, b, s, v)
            )(q, F1, SEC, V1)
            idx, ok = out[0], out[1]
            return (jnp.sum(idx.astype(jnp.float32))
                    + jnp.sum(ok.astype(jnp.float32)))

        return f

    fused = reduced(lambda a, b, s, v: sector_knn_pallas(
        a, b, s, K, k, v1=v, tile=32, include_global=True))
    slab = reduced(lambda a, b, s, v: slab_sector_knn_pallas(
        a, b, s, K, k, v1=v, tile=32, alpha=1.5))
    slab125 = reduced(lambda a, b, s, v: slab_sector_knn_pallas(
        a, b, s, K, k, v1=v, tile=32, alpha=1.25))

    # parity check at full shape on the real chip first
    ia, oa = jax.vmap(lambda a, b, s, v: sector_knn_pallas(
        a, b, s, K, k, v1=v, tile=32, include_global=True)
    )(q, F1, SEC, V1)
    ib, ob, spill = jax.vmap(lambda a, b, s, v: slab_sector_knn_pallas(
        a, b, s, K, k, v1=v, tile=32, alpha=1.5))(q, F1, SEC, V1)
    same = float(jnp.mean((ia == ib).astype(jnp.float32)))
    print(f"idx parity fused vs slab: {same:.6f} "
          f"(spill: {np.asarray(spill).any()})")

    slab64 = reduced(lambda a, b, s, v: slab_sector_knn_pallas(
        a, b, s, K, k, v1=v, tile=64, alpha=1.25))
    fused64 = reduced(lambda a, b, s, v: sector_knn_pallas(
        a, b, s, K, k, v1=v, tile=64, include_global=True))

    from corsair_tpu.core.kernels.sector_knn import (
        merged_slab_sector_knn_pallas,
    )

    slab128 = reduced(lambda a, b, s, v: slab_sector_knn_pallas(
        a, b, s, K, k, v1=v, tile=128, alpha=1.5))
    merged128 = reduced(lambda a, b, s, v: merged_slab_sector_knn_pallas(
        a, b, s, K, k, v1=v, tile=128, alpha=1.5))
    merged128a = reduced(
        lambda a, b, s, v: merged_slab_sector_knn_pallas(
            a, b, s, K, k, v1=v, tile=128, alpha=1.25))

    # merged-kernel parity at full shape (global slot must match the
    # always-exact slab global; sector slots identical when no spill)
    im, om, spill_m = jax.vmap(
        lambda a, b, s, v: merged_slab_sector_knn_pallas(
            a, b, s, K, k, v1=v, tile=128, alpha=1.5)
    )(q, F1, SEC, V1)
    same_m = float(jnp.mean((ia == im).astype(jnp.float32)))
    print(f"idx parity fused vs merged: {same_m:.6f} "
          f"(spill: {np.asarray(spill_m).any()})")

    for name, f in [("fused full-width", fused),
                    ("fused tile=64", fused64),
                    ("slab alpha=1.5", slab),
                    ("slab alpha=1.25", slab125),
                    ("slab a=1.25 t=64", slab64),
                    ("slab a=1.5 t=128", slab128),
                    ("merged a=1.5 t=128", merged128),
                    ("merged a=1.25 t=128", merged128a)]:
        np.asarray(f(q, F1, SEC, V1))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(q, F1, SEC, V1))
            ts.append(time.perf_counter() - t0)
        print(f"{name:20s} {sorted(ts)[2]*1000:8.1f} ms / {B}-batch")


if __name__ == "__main__":
    main()
