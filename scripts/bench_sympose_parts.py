"""Per-stage timing of the symmetry-aided registration pipeline.

Times each component of ``sym_pose`` separately at bench shapes (batch 8,
cap 8192, K=4) so optimization effort goes where the time is:
global 5-NN, symmetric cuts (2x 100-candidate KMeans), per-sector kNN,
folded 9-candidate RANSAC, batched Chamfer scoring.
"""

import argparse
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/corsair_jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _reduced(fn):
    """Wrap fn so it returns one f32 scalar (sum of all outputs).

    Two axon-tunnel measurement pitfalls (NOTES.md): block_until_ready
    returns early, and np.asarray on multi-MB outputs measures the
    ~200 KB/s tunnel, not the device. Reducing inside the jit makes the
    host fetch a single scalar (~40 ms RTT, constant across stages)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def wrapped(*args):
        out = fn(*args)
        return sum(
            jnp.sum(leaf.astype(jnp.float32))
            for leaf in jax.tree_util.tree_leaves(out)
        )

    return wrapped


def timeit(fn, *args, iters=3):
    fn = _reduced(fn)
    np.asarray(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--cap", type=int, default=8192)
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from corsair_tpu.ops.chamfer import _min_nn_dists
    from corsair_tpu.ops.correspond import (
        find_kcorr,
        find_kcorr_per_sector,
    )
    from corsair_tpu.ops.ransac import (
        RansacConfig,
        ransac_correspondences_multi,
    )
    from corsair_tpu.ops.symmetry import (
        SymPoseConfig,
        shift_permutations,
        symmetric_cut,
    )

    rng = np.random.RandomState(0)
    B, cap = args.batch, args.cap
    cfg = SymPoseConfig(num_sectors=4)

    def cloud():
        x = rng.randn(cap, 3).astype(np.float32) * 0.5
        f = rng.randn(cap, 16).astype(np.float32)
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        v = np.ones(cap, bool)
        v[-200:] = False
        return x, f, v

    xs, fs, vs = zip(*[cloud() for _ in range(B)])
    x0, f0, v0 = map(jnp.asarray, (np.stack(xs), np.stack(fs),
                                   np.stack(vs)))
    xs, fs, vs = zip(*[cloud() for _ in range(B)])
    x1, f1, v1 = map(jnp.asarray, (np.stack(xs), np.stack(fs),
                                   np.stack(vs)))
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    chunk = 512
    k_nn = cfg.k_nn

    @jax.jit
    def t_kcorr(f0, f1, v0, v1):
        return jax.vmap(
            lambda a, b, va, vb: find_kcorr(a, b, k_nn, va, vb,
                                            chunk=chunk)
        )(f0, f1, v0, v1)

    @jax.jit
    def t_cut(keys, f, x, v):
        return jax.vmap(
            lambda k, a, b, c: symmetric_cut(k, a, b, c, cfg)
        )(keys, f, x, v)

    sec1, _ = t_cut(keys, f1, x1, v1)

    @jax.jit
    def t_sector(f0, f1, sec1, v1):
        return jax.vmap(
            lambda a, b, s, vb: find_kcorr_per_sector(
                a, b, s, 4, k_nn, v1=vb, chunk=chunk)
        )(f0, f1, sec1, v1)

    idx0, idx1, cval = t_kcorr(f0, f1, v0, v1)
    S = cfg.num_shifts
    rcfg = dataclasses.replace(cfg.ransac, max_corr_dist=cfg.max_corr)

    @jax.jit
    def t_ransac(keys, x0, x1, idx1, cval):
        def one(k, a, b, i1, cv):
            src = jnp.repeat(a, k_nn, axis=0)
            dst = b[i1]
            dsts = jnp.broadcast_to(dst[None], (S + 1,) + dst.shape)
            vals = jnp.broadcast_to(cv[None], (S + 1,) + cv.shape)
            return ransac_correspondences_multi(k, src, dsts, vals, rcfg)

        return jax.vmap(one)(keys, x0, x1, idx1, cval)

    Ts, _, _ = t_ransac(keys, x0, x1, idx1, cval)

    @jax.jit
    def t_chamfer(Ts, x0, x1, v0, v1):
        def one(Tc, a, b, va, vb):
            def cd(T):
                moved = a @ T[:3, :3].T + T[:3, 3]
                dmin = _min_nn_dists(moved, b, va, vb, chunk)
                return jnp.sum(dmin) / jnp.maximum(jnp.sum(va), 1)

            return jax.vmap(cd)(Tc)

        return jax.vmap(one)(Ts, x0, x1, v0, v1)

    print(f"batch {B}, cap {cap}, K=4 (S+1=9 candidates)")
    t = timeit(t_kcorr, f0, f1, v0, v1)
    print(f"global {k_nn}-NN correspondences      {t*1000:8.1f} ms")
    t = timeit(t_cut, keys, f0, x0, v0)
    print(f"symmetric_cut (100 cands, 1 cloud)  {t*1000:8.1f} ms  (x2 in sym_pose)")
    t = timeit(t_sector, f0, f1, sec1, v1)
    print(f"per-sector kNN                      {t*1000:8.1f} ms")
    t = timeit(t_ransac, keys, x0, x1, idx1, cval)
    print(f"folded 9-candidate RANSAC           {t*1000:8.1f} ms")
    t = timeit(t_chamfer, Ts, x0, x1, v0, v1)
    print(f"9-candidate Chamfer scoring         {t*1000:8.1f} ms")


if __name__ == "__main__":
    main()
