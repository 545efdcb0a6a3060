"""Produce the MinkowskiEngine activation dump `verify_checkpoint.py` eats.

RUN THIS INSIDE THE REFERENCE'S ENVIRONMENT (the CORSAIR docker image
that builds MinkowskiEngine — `docker/Dockerfile` in the reference
repo), with the reference repo root on PYTHONPATH. It deliberately has
zero corsair_tpu dependencies; it is the producer half of the per-layer
parity check, `scripts/verify_checkpoint.py --activations-npz` is the
consumer half (see PARITY.md for the full runbook).

What it does: loads a released checkpoint (`utils/ckpts.py:21-63`
format), runs one probe cloud through the deployed ResUNetBN2C +
conv1_max_embedding stack stage by stage (the same module calls as
`model/resunet.py:207-256` / `evaluation.py:181-231`), and saves every
intermediate the verifier knows how to align:

  out_s1, out_s2, out_s4, out_s8          encoder (post residual block)
  out_s4_tr, out_s2_tr, out_s1_tr         decoder (post block + relu)
  pre_normalize                           after the final 1x1 conv
  final                                   L2-normalized per-point feats
  descriptor                              L2-normalized 256-D embedding

plus `<key>_coords` (the ME tensor's `.C` without the batch column) so
rows align regardless of either engine's internal voxel order.

Usage (inside the reference env):
  python dump_reference_activations.py \
      --checkpoint ckpts/scannet_ret_chair \
      [--cloud-npy some_points.npy] \
      --out-npz dump.npz --out-cloud cloud.npy

Then, back in corsair_tpu:
  python scripts/verify_checkpoint.py --checkpoint ckpts/scannet_ret_chair \
      --activations-npz dump.npz --probe-npy cloud.npy
"""

import argparse

import numpy as np
import torch


def make_probe_cloud(n: int = 10000, seed: int = 0) -> np.ndarray:
    """Deterministic surface-like probe (unit-sphere shell + radial
    noise) when no real scan is at hand. Any real `.npy` point cloud is
    a better probe — pass it via --cloud-npy."""
    rng = np.random.RandomState(seed)
    pts = rng.randn(n, 3)
    pts /= np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-9)
    pts *= 0.9 * (1.0 + rng.randn(n, 1) * 0.03)
    return pts


def preprocess(pts: np.ndarray) -> np.ndarray:
    """EXACTLY the verifier's probe preprocessing
    (scripts/verify_checkpoint.py activation_deltas): first 10k points,
    center, scale to the unit sphere. Both sides must voxelize the same
    physical cloud or the coordinate sets cannot match."""
    pts = np.asarray(pts, np.float64)[:10000]
    pts = pts - pts.mean(0)
    pts = pts / np.max(np.linalg.norm(pts, ord=2, axis=1))
    return pts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--cloud-npy", default=None,
                    help="optional [N,3] probe points; default synthetic")
    ap.add_argument("--voxel-size", type=float, default=0.03)
    ap.add_argument("--out-npz", default="dump.npz")
    ap.add_argument("--out-cloud", default="cloud.npy",
                    help="the RAW probe points, for --probe-npy")
    ap.add_argument("--device", default="cuda"
                    if torch.cuda.is_available() else "cpu")
    args = ap.parse_args()

    import MinkowskiEngine as ME
    import MinkowskiEngine.MinkowskiFunctional as MEF
    from model import load_model
    from model import fc

    raw = (np.load(args.cloud_npy) if args.cloud_npy
           else make_probe_cloud())
    np.save(args.out_cloud, raw)
    pts = preprocess(raw)

    grid = np.floor(pts / args.voxel_size).astype(np.int32)
    coords = ME.utils.sparse_quantize(grid)
    coords = torch.as_tensor(np.asarray(coords, np.int32))
    feats = torch.ones((len(coords), 1), dtype=torch.float32)
    x = ME.SparseTensor(
        feats.to(args.device),
        ME.utils.batched_coordinates([coords]).to(args.device),
    )

    # The deployed eval config (evaluation.py:181-192).
    model = load_model("ResUNetBN2C")(
        in_channels=1, out_channels=16, bn_momentum=0.05,
        normalize_feature=True, conv1_kernel_size=3, D=3,
    ).to(args.device)
    embedding = fc.conv1_max_embedding(1024, 512, 256).to(args.device)
    ckpt = torch.load(args.checkpoint, map_location=args.device)
    model.load_state_dict(ckpt["state_dict"])
    embedding.load_state_dict(ckpt["embedding_state_dict"])
    model.eval()
    embedding.eval()

    taps = {}

    def tap(name, tensor):
        taps[name] = tensor.F.detach().cpu().numpy()
        taps[name + "_coords"] = (
            tensor.C.detach().cpu().numpy()[:, 1:]
        )

    with torch.no_grad():
        # Encoder stages: the same module sequence as the reference
        # forward (model/resunet.py:207-232), tapped at the variables
        # the verifier names.
        out_s1 = model.block1(model.norm1(model.conv1(x)))
        tap("out_s1", out_s1)
        out = MEF.relu(out_s1)
        out_s2 = model.block2(model.norm2(model.conv2(out)))
        tap("out_s2", out_s2)
        out = MEF.relu(out_s2)
        out_s4 = model.block3(model.norm3(model.conv3(out)))
        tap("out_s4", out_s4)
        out = MEF.relu(out_s4)
        out_s8 = model.block4(model.norm4(model.conv4(out)))
        tap("out_s8", out_s8)
        feat = out_s8
        out = MEF.relu(out_s8)

        # Decoder (model/resunet.py:234-256).
        out_s4_tr = MEF.relu(
            model.block4_tr(model.norm4_tr(model.conv4_tr(out)))
        )
        tap("out_s4_tr", out_s4_tr)
        out = ME.cat(out_s4_tr, out_s4)
        out_s2_tr = MEF.relu(
            model.block3_tr(model.norm3_tr(model.conv3_tr(out)))
        )
        tap("out_s2_tr", out_s2_tr)
        out = ME.cat(out_s2_tr, out_s2)
        out_s1_tr = MEF.relu(
            model.block2_tr(model.norm2_tr(model.conv2_tr(out)))
        )
        tap("out_s1_tr", out_s1_tr)
        out = ME.cat(out_s1_tr, out_s1)
        pre_normalize = model.final(MEF.relu(model.conv1_tr(out)))
        tap("pre_normalize", pre_normalize)
        taps["final"] = (
            pre_normalize.F
            / torch.norm(pre_normalize.F, p=2, dim=1, keepdim=True)
        ).detach().cpu().numpy()
        taps["final_coords"] = taps["pre_normalize_coords"]

        # Descriptor, normalized as evaluation.py:231 does.
        desc = embedding(feat)
        desc = torch.nn.functional.normalize(desc, p=2, dim=1)
        taps["descriptor"] = desc.detach().cpu().numpy()

    # Cross-check: the staged forward must reproduce model.forward.
    ref_final, ref_feat = model(x)
    d_final = float(
        np.abs(ref_final.F.detach().cpu().numpy() - taps["final"]).max()
    )
    d_feat = float(
        np.abs(ref_feat.F.detach().cpu().numpy() - taps["out_s8"]).max()
    )
    print(f"staged-vs-forward max|delta|: final {d_final:.2e}, "
          f"bottleneck {d_feat:.2e}")
    assert d_final < 1e-5 and d_feat < 1e-5, \
        "staged forward diverged from model.forward — do not use dump"

    np.savez_compressed(args.out_npz, **taps)
    print(f"saved {len(taps)} arrays -> {args.out_npz}; "
          f"probe cloud ({len(raw)} pts) -> {args.out_cloud}")
    for k in sorted(taps):
        if not k.endswith("_coords"):
            print(f"  {k:16s} {taps[k].shape}")


if __name__ == "__main__":
    main()
