"""Precompute CLIs: pairwise Chamfer matrices + splat CD lists.

Replaces the reference's threaded host builders:
* ``utils/pc_dist.py:61-125`` (8-thread per-row CD matrix over a ShapeNet
  split) -> one batched device program (``ops.chamfer.chamfer_matrix``);
* ``utils/precompute_chamfer_splats.py`` (32-worker thread_map GT-CAD x
  RaDe-GS splat CD matrix -> ``chamfer_dist_list.csv``).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def compute_category_cd_matrix(root: str, catid: str, split: str,
                               out_dir: str, n_points: int = 2000,
                               batch: int = 64) -> str:
    """Pairwise bidirectional Chamfer matrix for a category split,
    ``diag = 200`` convention preserved (``configs/*_scan2cad.npy``)."""
    import jax.numpy as jnp

    from corsair_tpu.data.readers import Reader
    from corsair_tpu.ops.chamfer import chamfer_matrix

    reader = Reader(root, catid, split, n_points)
    pcs = np.stack([
        _pad_points(reader[i], n_points) for i in range(len(reader))
    ])
    valid = np.stack([
        _valid_mask(reader[i], n_points) for i in range(len(reader))
    ])
    table = np.asarray(
        chamfer_matrix(jnp.asarray(pcs, jnp.float32), jnp.asarray(valid))
    ).astype(np.float64)
    np.fill_diagonal(table, 200.0)
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{catid}_{split}.npy")
    np.save(out, table)
    return out


def _pad_points(pc, n):
    out = np.zeros((n, 3), np.float32)
    m = min(len(pc), n)
    out[:m] = pc[:m]
    return out


def _valid_mask(pc, n):
    v = np.zeros(n, bool)
    v[: min(len(pc), n)] = True
    return v


def compute_splat_cd_list(shapenet_root: str, radegs_root: str,
                          catid: str, ids, out_csv: str,
                          n_points: int = 15000) -> str:
    """GT-CAD x splat-reconstruction CD matrix -> chamfer_dist_list.csv
    (row-major flattened, ``chamfer_dist`` column)."""
    import jax.numpy as jnp

    from corsair_tpu.data.cad_lib import GaussianSplatLib
    from corsair_tpu.ops.chamfer import chamfer_bidirectional
    from corsair_tpu.data.readers import load_raw_pc, path_dict

    id2path = path_dict(shapenet_root)
    gsplat = GaussianSplatLib(radegs_root, catid)
    scale = 1e-3

    rows = []
    splat_pcs = {
        mid: gsplat.get_recon_pc_by_id_transformed(mid, n_points)
        for mid in ids
    }
    for gt_id in ids:
        gt_pc = scale * load_raw_pc(id2path[gt_id], n_points)
        for ret_id in ids:
            cd = float(chamfer_bidirectional(
                jnp.asarray(gt_pc, jnp.float32),
                jnp.asarray(splat_pcs[ret_id], jnp.float32),
            ))
            rows.append(cd)
    with open(out_csv, "w") as f:
        f.write("chamfer_dist\n")
        for cd in rows:
            f.write(f"{cd}\n")
    return out_csv


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    m = sub.add_parser("cd-matrix")
    m.add_argument("--root", required=True)
    m.add_argument("--catid", required=True)
    m.add_argument("--splits", nargs="+", default=["train", "val", "test"])
    m.add_argument("--out-dir", required=True)
    m.add_argument("--n-points", type=int, default=2000)
    s = sub.add_parser("splat-cd")
    s.add_argument("--shapenet-root", required=True)
    s.add_argument("--radegs-root", required=True)
    s.add_argument("--catid", required=True)
    s.add_argument("--unique-cads-csv", required=True)
    s.add_argument("--out-csv", required=True)
    args = p.parse_args(argv)

    if args.cmd == "cd-matrix":
        for split in args.splits:
            out = compute_category_cd_matrix(
                args.root, args.catid, split, args.out_dir, args.n_points
            )
            print("wrote", out)
    else:
        from corsair_tpu.data.scan2cad_info import load_csv

        ids = [obj for cat, obj in load_csv(args.unique_cads_csv)
               if cat == args.catid]
        out = compute_splat_cd_list(
            args.shapenet_root, args.radegs_root, args.catid, ids,
            args.out_csv,
        )
        print("wrote", out)


if __name__ == "__main__":
    main()
