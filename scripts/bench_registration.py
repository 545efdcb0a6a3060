"""Registration micro-benchmark: serial vs overlapped RANSAC candidates.

VERDICT item 4: ``sym_pose`` runs its S+1 candidate RANSACs (1 vanilla +
8 sector shifts for K=4) through ``lax.map`` — sequential dispatches.
This sweep measures the vmapped-candidates variant at several score-chunk
sizes on the current accelerator so the default can be set from data.

Usage: python scripts/bench_registration.py [--batch 8] [--cap 8192]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/corsair_jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--cap", type=int, default=8192)
    p.add_argument("--n-pts", type=int, default=8000)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from corsair_tpu.eval.registration import _sym_pose_batch
    from corsair_tpu.ops.ransac import RansacConfig
    from corsair_tpu.ops.symmetry import SymPoseConfig

    rng = np.random.RandomState(0)
    B, cap = args.batch, args.cap

    def cloud():
        pts = rng.randn(args.n_pts, 3).astype(np.float32) * 0.5
        grid = np.floor(pts / 0.03).astype(np.int32)
        _, first = np.unique(grid, axis=0, return_index=True)
        pts = pts[np.sort(first)][:cap]
        out = np.zeros((cap, 3), np.float32)
        out[: len(pts)] = pts
        v = np.zeros(cap, bool)
        v[: len(pts)] = True
        f = np.zeros((cap, 16), np.float32)
        f[: len(pts)] = rng.randn(len(pts), 16)
        f /= np.maximum(np.linalg.norm(f, axis=1, keepdims=True), 1e-9)
        return out, f, v

    xs, fs, vs = zip(*[cloud() for _ in range(B)])
    x0 = jnp.asarray(np.stack(xs)); f0 = jnp.asarray(np.stack(fs))
    v0 = jnp.asarray(np.stack(vs))
    xs, fs, vs = zip(*[cloud() for _ in range(B)])
    x1 = jnp.asarray(np.stack(xs)); f1 = jnp.asarray(np.stack(fs))
    v1 = jnp.asarray(np.stack(vs))
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    def run(cfg, label):
        out = _sym_pose_batch(keys, f0, x0, v0, f1, x1, v1, cfg, 512)
        jax.block_until_ready(out[0])
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = _sym_pose_batch(keys, f0, x0, v0, f1, x1, v1, cfg, 512)
            jax.block_until_ready(out[0])
            times.append(time.perf_counter() - t0)
        t = sorted(times)[len(times) // 2]
        print(f"{label:42s} {t*1000:8.1f} ms  "
              f"({B / t:6.2f} queries/s)", flush=True)
        return out, t

    base = SymPoseConfig(
        k_nn=5, max_corr=0.2, num_sectors=4,
        ransac=RansacConfig(num_hypotheses=4096, sample_size=10,
                            max_corr_dist=0.2),
    )
    serial = dataclasses.replace(base, fold_candidates=False)
    ref, t_serial = run(serial, "serial candidates (lax.map), chunk 4096")
    out, t = run(base, "folded candidates (one scoring stream)")
    # winners may differ only through the sampling-key restructure
    d = np.abs(np.asarray(out[1]) - np.asarray(ref[1]))
    print(f"    max |cd_best - ref| = {d.max():.2e}")


if __name__ == "__main__":
    main()
