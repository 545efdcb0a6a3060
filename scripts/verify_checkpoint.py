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


_TAP_ALIASES = {"bottleneck": "out_s8", "feat": "out_s8"}


def _align_rows(ref_coords, our_arr, our_coords):
    """Reorder our rows to the reference dump's voxel order by matching
    coordinates. ME's per-level voxel order differs from our merge-sort
    order at strides > 1, so per-layer comparison MUST align by
    coordinate, not position. ``ref_coords`` may carry a leading batch
    column (``tensor.C``); single-cloud dumps let us drop it."""
    rc = np.asarray(ref_coords)
    if rc.shape[1] == 4:  # [b, x, y, z] ME convention
        rc = rc[:, 1:]
    ours = {tuple(c): i for i, c in enumerate(np.asarray(our_coords))}
    sel = np.full(len(rc), -1, np.int64)
    for r, c in enumerate(rc):
        sel[r] = ours.get(tuple(c), -1)
    missing = int((sel < 0).sum())
    matched = our_arr[np.maximum(sel, 0)]
    return matched, sel >= 0, missing


def activation_deltas(ckpt, perms, probe_npy, activations_npz):
    """Layer-by-layer comparison against a dumped ME forward, for every
    candidate offset permutation.

    The dump is an npz whose keys name the reference forward's tensors
    (``model/resunet.py:207-256``): any subset of out_s1, out_s2,
    out_s4, out_s8 (alias: bottleneck/feat), out_s4_tr, out_s2_tr,
    out_s1_tr, pre_normalize, final, descriptor — each optionally
    accompanied by ``<key>_coords`` = the ME tensor's ``.C`` (with or
    without the batch column) for row alignment. Without a _coords key
    the rows are assumed to be in ``ME.utils.sparse_quantize``
    first-occurrence order (true for stride-1 tensors; coarser levels
    need coords).
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

    extractor = FeatureExtractor(ExtractorConfig())
    ref = np.load(activations_npz)
    emb = convert_conv1_max_embedding(ckpt["embedding_state_dict"])

    print("\n== 2. Activation deltas vs reference dump "
          f"({len(perms)} candidate permutations)")
    summary = {}
    for perm in perms:
        params = {
            "model": convert_resunet(ckpt["state_dict"], perm),
            "embedding": emb,
        }
        ours = extractor.extract_taps_np(params, grid)
        print(f"  -- permutation {perm}")
        worst = 0.0
        for key in ref.files:
            if key.endswith("_coords"):
                continue
            name = _TAP_ALIASES.get(key, key)
            if name not in ours:
                print(f"  {key:14s} (not a known tap — skipped)")
                continue
            a, b = ours[name], np.asarray(ref[key])
            if key + "_coords" in ref.files:
                a, okm, miss = _align_rows(
                    np.asarray(ref[key + "_coords"]), a,
                    ours[name + "_coords"],
                )
            else:
                okm = np.ones(len(b), bool)
                miss = 0
            if a.shape != b.shape:
                print(f"  {key:14s} SHAPE MISMATCH ours={a.shape} "
                      f"ref={b.shape}")
                continue
            d = np.abs(a - b)[okm]
            tag = f" ({miss} unmatched rows)" if miss else ""
            print(f"  {key:14s} max|Δ|={d.max():.3e}  "
                  f"mean|Δ|={d.mean():.3e}{tag}")
            worst = max(worst, float(d.max()))
        summary[perm] = worst
    best = min(summary, key=summary.get)
    print(f"  -> best permutation by worst-layer max|Δ|: {best} "
          f"({summary[best]:.3e})")
    return summary


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
        activation_deltas(ckpt, list(scores.keys()), args.probe_npy,
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
