"""One command between "released weights arrive" and "parity number".

Given a released CORSAIR torch checkpoint (``utils/ckpts.py:21-63``;
consumed ``evaluation.py:195-198``), this script prints, in order of
increasing cost / increasing authority:

1. **BN-consistency scores** for every candidate ME kernel-offset
   enumeration (``nn.ckpt_verify``): a data-free statistical self-check
   of the converter's ``offset_permutation``; runs on CPU probe clouds.
2. **Per-layer activation deltas** vs a reference activation dump, when
   ``--activations-npz`` points at a dict of layer-name -> array saved
   from a MinkowskiEngine run of the same cloud (``--probe-npy``).
3. **End metrics** — Precision@10% and Top1-CD on the real Scan2CAD
   protocol per candidate permutation, with deltas vs the README table
   (``README.md:153-167``) — when the real data roots are given.

Usage:
  python scripts/verify_checkpoint.py --checkpoint ckpts/scannet_ret_chair \\
      [--shapenet-pc15k-root ... --scan2cad-pc-root ... \\
       --scan2cad-annotation-root ... --category chair] \\
      [--activations-npz dump.npz --probe-npy cloud.npy]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# README.md:153-167 — published Precision@10% / Top1-CD per checkpoint.
PUBLISHED = {
    "scannet_pose_chair_best": (22.55, 0.17, "chair"),
    "scannet_pose_chair": (22.71, 0.17, "chair"),
    "scannet_ret_chair_best": (31.27, 0.15, "chair"),
    "scannet_ret_chair": (31.30, 0.15, "chair"),
    "scannet_pose_table_best": (31.89, 0.22, "table"),
    "scannet_pose_table": (31.70, 0.22, "table"),
    "scannet_ret_table_best": (41.13, 0.19, "table"),
    "scannet_ret_table": (41.05, 0.19, "table"),
}


def bn_scores(state_dict):
    from corsair_tpu.nn.ckpt_verify import detect_offset_permutation

    scores = detect_offset_permutation(state_dict)
    print("\n== 1. BN-consistency per offset permutation (lower = better)")
    for name, s in sorted(scores.items(), key=lambda kv: kv[1]):
        print(f"  {name:18s} {s:10.4f}")
    ranked = sorted(scores.values())
    best = min(scores, key=scores.get)
    print(f"  -> auto-detected: {best}")
    if ranked[1] < 1.2 * ranked[0]:
        print("  WARNING: weak separation between the top candidates "
              "(<1.2x) — BN statistics are permutation-insensitive for "
              "untrained/near-random kernels; trust the end-metric phase "
              "(pass the data roots) over this signal.")
    return best, scores


def activation_deltas(ckpt, perm, probe_npy, activations_npz):
    """Layer-by-layer comparison against a dumped ME forward.

    The dump is an npz whose keys name the reference tensors (any subset
    of: out_s1, out_s2, out_s4, out_s8/bottleneck, final) with rows in
    the voxel order of ``ME.utils.sparse_quantize`` on the probe cloud —
    the same first-occurrence order our voxelizer produces.
    """
    import jax.numpy as jnp  # noqa: F401  (device init)

    from corsair_tpu.core.voxelize import voxelize_np
    from corsair_tpu.nn.torch_convert import (
        convert_conv1_max_embedding, convert_resunet,
    )
    from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor

    pts = np.load(probe_npy)[:10000].astype(np.float64)
    pts -= pts.mean(0)
    pts /= np.max(np.linalg.norm(pts, 2, 1))
    _, grid, _ = voxelize_np(pts, 0.03)

    extractor = FeatureExtractor(ExtractorConfig(auto_level_caps=False))
    params = {
        "model": convert_resunet(ckpt["state_dict"], perm),
        "embedding": convert_conv1_max_embedding(
            ckpt["embedding_state_dict"]
        ),
    }
    per_cloud, desc = extractor.extract_batch_np(params, [grid])
    ours = {"final": per_cloud[0], "descriptor": np.asarray(desc[0])}

    ref = np.load(activations_npz)
    print("\n== 2. Activation deltas vs reference dump")
    for key in ref.files:
        if key not in ours:
            print(f"  {key:12s} (no counterpart computed — skipped)")
            continue
        a, b = ours[key], ref[key]
        if a.shape != b.shape:
            print(f"  {key:12s} SHAPE MISMATCH ours={a.shape} ref={b.shape}")
            continue
        d = np.abs(a - b)
        print(f"  {key:12s} max|Δ|={d.max():.3e}  mean|Δ|={d.mean():.3e}")


def end_metrics(args, candidates):
    from corsair_tpu.cli.evaluation import App, Config
    from corsair_tpu.nn.torch_convert import (
        convert_conv1_max_embedding, convert_resunet,
    )
    from corsair_tpu.utils.logger import Logger

    name = os.path.basename(args.checkpoint)
    pub_p, pub_cd, category = PUBLISHED.get(
        name, (None, None, args.category)
    )

    print("\n== 3. End metrics per offset permutation "
          "(real Scan2CAD protocol)")
    import torch

    ckpt = torch.load(args.checkpoint, map_location="cpu",
                      weights_only=False)
    results = {}
    app = None
    for perm in candidates:
        config = Config(
            shapenet_pc15k_root=args.shapenet_pc15k_root,
            scan2cad_pc_root=args.scan2cad_pc_root,
            scan2cad_annotation_root=args.scan2cad_annotation_root,
            category=category,
            checkpoint="",  # params injected below
            config_dir=args.config_dir,
            cache_dir="",
            limit_scans=args.limit_scans,
        )
        if app is None:
            app = App(config, logger=Logger())
        app.params = {
            "model": convert_resunet(ckpt["state_dict"], perm),
            "embedding": convert_conv1_max_embedding(
                ckpt["embedding_state_dict"]
            ),
        }
        app.extract_library()
        app.extract_scans()
        stat = app.eval_retrieval()
        results[perm] = (stat["precision"], stat["top1_error"])
        line = (f"  {perm:18s} Precision@10%={stat['precision']:6.2f}%  "
                f"Top1-CD={stat['top1_error']:.4f}")
        if pub_p is not None:
            line += (f"   (README: {pub_p:.2f}% / {pub_cd:.2f} -> "
                     f"Δ={stat['precision'] - pub_p:+.2f}pp / "
                     f"{stat['top1_error'] - pub_cd:+.3f})")
        print(line)
    best = max(results, key=lambda k: results[k][0])
    print(f"  -> best permutation by Precision@10%: {best}")
    return results


def main():
    p = argparse.ArgumentParser(
        description="Verify a released CORSAIR checkpoint against the "
                    "TPU conversion.")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--shapenet-pc15k-root", default=None)
    p.add_argument("--scan2cad-pc-root", default=None)
    p.add_argument("--scan2cad-annotation-root", default=None)
    p.add_argument("--category", default="chair",
                   choices=["chair", "table"])
    p.add_argument("--config-dir", default=os.path.join(
        os.path.dirname(__file__), "..", "configs"))
    p.add_argument("--limit-scans", type=int, default=0)
    p.add_argument("--activations-npz", default=None)
    p.add_argument("--probe-npy", default=None)
    args = p.parse_args()

    import torch

    ckpt = torch.load(args.checkpoint, map_location="cpu",
                      weights_only=False)
    print(f"checkpoint: {args.checkpoint} (epoch {ckpt.get('epoch')})")

    best, scores = bn_scores(ckpt["state_dict"])

    if args.activations_npz and args.probe_npy:
        activation_deltas(ckpt, best, args.probe_npy,
                          args.activations_npz)

    if args.shapenet_pc15k_root and args.scan2cad_pc_root:
        metrics = end_metrics(args, list(scores.keys()))
        out = {
            "bn_scores": scores,
            "metrics": {k: list(v) for k, v in metrics.items()},
        }
        print("\n" + json.dumps(out))
    else:
        print("\n(no data roots given — end-metric phase skipped; rerun "
              "with --shapenet-pc15k-root/--scan2cad-pc-root for "
              "Precision@10%/Top1-CD parity)")


if __name__ == "__main__":
    main()
