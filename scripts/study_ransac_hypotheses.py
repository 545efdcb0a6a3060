"""RANSAC hypothesis-count parity margin study (VERDICT r3 #6).

The reference registers with Open3D RANSAC at max_iterations=100k and a
0.999-confidence early exit (``utils/eval_pose.py:95-97``, Open3D
defaults); ours runs a fixed keyed hypothesis batch (4096 by default)
plus an inlier refit. This study quantifies the margin: RRE/RTE bucket
rates vs ``num_hypotheses`` in {4096, 16384, 65536} with/without refit
on synthetic correspondence sets with reference-like outlier ratios,
PLUS a 131072-hypothesis asymptote standing in for the reference's
100k-with-early-exit budget (early exit only saves wall-clock, not
quality — the confidence bound is computed FROM the same best-so-far
model, so a fixed budget >= the exit point is quality-equivalent).

Correspondence model: the protocol feeds RANSAC feature-space k-NN
pairs (``find_kcorr`` k=5, ``utils/eval_pose.py:48-79``). An inlier
pair is (x, T x + eps), eps ~ N(0, (0.01)^2); an outlier maps x to a
uniformly wrong target point. The inlier fraction w sweeps 0.2-0.7 —
FCGF-style k=5 correspondences on real Scan2CAD pairs sit in this
range (k-repeats dilute the top-1 inlier rate). With sample_size=10
(ransac_n=10, the reference's), P(clean draw) = w^10: at w=0.5 that is
~1e-3 (4 expected clean draws in 4096), at w=0.3 ~6e-6 — the regime
where the hypothesis count actually separates.

Usage:
  python scripts/study_ransac_hypotheses.py            # on-chip scale
  python scripts/study_ransac_hypotheses.py --cpu --trials 12 --m 1024
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/corsair_jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_trial(rng, m, w, noise=0.01):
    """One synthetic correspondence set: returns (src, dst, T_gt)."""
    # unit-sphere-normalized cloud like load_norm_pc
    src = rng.randn(m, 3).astype(np.float32)
    src /= np.max(np.linalg.norm(src, axis=1))
    # random full rotation + translation (evaluation-shapenet.py
    # generate_random_pose scale)
    a = rng.randn(3)
    a /= np.linalg.norm(a)
    th = rng.rand() * np.pi
    K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
    t = rng.randn(3) * 0.3
    T = np.eye(4, dtype=np.float32)
    T[:3, :3], T[:3, 3] = R, t

    dst = src @ R.T + t + rng.randn(m, 3) * noise
    n_out = int(round((1 - w) * m))
    out_rows = rng.choice(m, n_out, replace=False)
    # outlier: the target point of a DIFFERENT (random) source — wrong
    # but on the target surface, like a wrong feature match
    dst[out_rows] = dst[rng.randint(0, m, n_out)] + \
        rng.randn(n_out, 3).astype(np.float32) * 0.05
    return src.astype(np.float32), dst.astype(np.float32), T


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--trials", type=int, default=32)
    p.add_argument("--m", type=int, default=4096,
                   help="correspondence pairs per trial")
    p.add_argument("--ws", default="0.2,0.3,0.5,0.7")
    p.add_argument("--hyps", default="4096,16384,65536,131072")
    p.add_argument("--max-corr", type=float, default=0.2)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from corsair_tpu.ops.pose_metrics import eval_pose
    from corsair_tpu.ops.ransac import RansacConfig, ransac_correspondences

    ws = [float(x) for x in args.ws.split(",")]
    hyps = [int(x) for x in args.hyps.split(",")]
    rng = np.random.RandomState(0)

    trials = {w: [make_trial(rng, args.m, w) for _ in range(args.trials)]
              for w in ws}
    keys = jax.random.split(jax.random.PRNGKey(3), args.trials)

    def run_cfg(cfg, w):
        srcs = jnp.asarray(np.stack([t[0] for t in trials[w]]))
        dsts = jnp.asarray(np.stack([t[1] for t in trials[w]]))
        vs = jnp.ones((args.trials, args.m), bool)
        fn = jax.jit(jax.vmap(
            lambda k, s, d, v: ransac_correspondences(k, s, d, v, cfg)[0]
        ))
        t0 = time.perf_counter()
        Ts = np.asarray(fn(keys, srcs, dsts, vs))
        dt = time.perf_counter() - t0
        rres, rtes = [], []
        for i, (_, _, Tgt) in enumerate(trials[w]):
            t_err, r_err = eval_pose(Ts[i], np.eye(4), Tgt, 1)
            rres.append(np.rad2deg(r_err))
            rtes.append(t_err)
        rres, rtes = np.asarray(rres), np.asarray(rtes)
        return {
            "rre5": float(np.mean(rres <= 5)),
            "rre15": float(np.mean(rres <= 15)),
            "rre45": float(np.mean(rres <= 45)),
            "rte02": float(np.mean(rtes <= 0.02)),
            "rte05": float(np.mean(rtes <= 0.05)),
            "rte15": float(np.mean(rtes <= 0.15)),
            "med_rre": float(np.median(rres)),
            "s": round(dt, 2),
        }

    print(f"m={args.m} trials={args.trials} max_corr={args.max_corr} "
          f"sample_size=10 (ransac_n parity)")
    results = {}
    for w in ws:
        for h in hyps:
            for refit in (2, 0):
                cfg = RansacConfig(
                    num_hypotheses=h, sample_size=10,
                    max_corr_dist=args.max_corr, refine_iters=refit,
                    score_chunk=min(h, 4096),
                    prescore_subset=min(args.m, 4096),
                )
                r = run_cfg(cfg, w)
                tag = f"w={w} H={h:6d} refit={refit}"
                results[tag] = r
                print(f"{tag}: rre5 {r['rre5']:.2f} rre15 {r['rre15']:.2f} "
                      f"rre45 {r['rre45']:.2f} | rte02 {r['rte02']:.2f} "
                      f"rte05 {r['rte05']:.2f} rte15 {r['rte15']:.2f} | "
                      f"med_rre {r['med_rre']:.1f} ({r['s']}s)", flush=True)

    out = os.path.join("logs", "ransac_hypotheses_study.json")
    os.makedirs("logs", exist_ok=True)
    with open(out, "w") as f:
        json.dump({"m": args.m, "trials": args.trials,
                   "results": results}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
