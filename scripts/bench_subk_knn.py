"""A/B of the sub-k-pass extraction in the merged slab sector-kNN.

The CORSAIR_SUBK_KNN knob is read at kernel-module import (trace-time
constant), so the A and B arms are separate process invocations:

    CORSAIR_SUBK_KNN=0 python scripts/bench_subk_knn.py   # baseline
    CORSAIR_SUBK_KNN=1 python scripts/bench_subk_knn.py   # sub-k-pass

Bench shapes: 8 clouds x cap 16384, K=4 sectors + global, k=5 (the
protocol registration shape). Also checks quantization-tolerant parity
against the full-width fused kernel on chip.
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
        _SUBK_ENV,
        merged_slab_sector_knn_pallas,
        sector_knn_pallas,
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

    q = jnp.asarray(np.stack([cloud()[0] for _ in range(B)]))
    tgt = [cloud() for _ in range(B)]
    F1 = jnp.asarray(np.stack([t[0] for t in tgt]))
    SEC = jnp.asarray(np.stack([t[1] for t in tgt]))
    V1 = jnp.asarray(np.stack([t[2] for t in tgt]))

    im, om, spill = jax.vmap(
        lambda a, b, s, v: merged_slab_sector_knn_pallas(
            a, b, s, K, k, v1=v, tile=128, alpha=1.5)
    )(q, F1, SEC, V1)
    ia, oa = jax.vmap(lambda a, b, s, v: sector_knn_pallas(
        a, b, s, K, k, v1=v, tile=32, include_global=True)
    )(q, F1, SEC, V1)
    same = float(jnp.mean((ia == im).astype(jnp.float32)))
    print(f"subk={_SUBK_ENV}: idx parity vs fused {same:.6f} "
          f"(spill: {np.asarray(spill).any()})")

    @jax.jit
    def reduced(q, F1, SEC, V1):
        idx, ok, sp = jax.vmap(
            lambda a, b, s, v: merged_slab_sector_knn_pallas(
                a, b, s, K, k, v1=v, tile=128, alpha=1.5)
        )(q, F1, SEC, V1)
        return (jnp.sum(idx.astype(jnp.float32))
                + jnp.sum(ok.astype(jnp.float32)))

    np.asarray(reduced(q, F1, SEC, V1))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(reduced(q, F1, SEC, V1))
        ts.append(time.perf_counter() - t0)
    print(f"merged a=1.5 t=128 subk={int(_SUBK_ENV)}: "
          f"{sorted(ts)[3]*1000:.1f} ms / {B}-batch")


if __name__ == "__main__":
    main()
