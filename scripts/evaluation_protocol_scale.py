#!/usr/bin/env python
"""The REAL CLI at protocol scale, synthetically (VERDICT r4 #5).

Generates a 652-CAD x 128-scan synthetic Scan2CAD tree at the
reference's 15k-point budget, regenerates the pairwise CD table ON
DEVICE (``cli.precompute.compute_cd_matrix``'s ``chamfer_matrix`` path —
the host KDTree builder would take days at this scale on this 1-core
box), then runs ``corsair_tpu.cli.evaluation``'s App end to end twice
(default + --strict-protocol): prefetch, result caches, retrieval +
registration metric tables. Logs to logs/evaluation_protocol_scale.txt
and byte-verifies the written result caches against the reference cache
layout (9 arrays per (category, target) suffix, ``evaluation.py:
390-441``).
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/corsair_jax_cache")

import numpy as np

from synthetic_data import CATID, build_tree

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Protocol scale by default; env overrides allow a tiny CPU smoke before
# burning a TPU window on an untested run.
N_CADS = int(os.environ.get("PROTO_N_CADS", 652))
N_SCANS = int(os.environ.get("PROTO_N_SCANS", 128))
N_POINTS = int(os.environ.get("PROTO_N_POINTS", 15000))


def device_cd_table(tree):
    """652x652 bidirectional CD on device, same normalization as the
    host table builder (center + unit max-radius), diag 200."""
    import jax.numpy as jnp

    from corsair_tpu.data.readers import path_dict
    from corsair_tpu.ops.chamfer import chamfer_matrix

    id2path = path_dict(tree["shapenet_root"])
    pcs = []
    for mid in tree["model_ids"]:
        pc = np.load(id2path[mid]).astype(np.float32)[:N_POINTS]
        pc = pc - pc.mean(0)
        pc = pc / np.linalg.norm(pc, axis=1).max()
        pcs.append(pc)
    n = max(len(p) for p in pcs)
    arr = np.zeros((len(pcs), n, 3), np.float32)
    val = np.zeros((len(pcs), n), bool)
    for i, p in enumerate(pcs):
        arr[i, : len(p)] = p
        val[i, : len(p)] = True
    t0 = time.time()
    table = np.asarray(chamfer_matrix(
        jnp.asarray(arr), jnp.asarray(val)
    )).astype(np.float64)
    np.fill_diagonal(table, 200.0)
    out = os.path.join(tree["config_dir"], f"{CATID}_scan2cad.npy")
    np.save(out, table)
    print(f"device CD table {table.shape} in {time.time() - t0:.1f}s",
          flush=True)
    return out


def verify_caches(cache_dir, n, logger):
    """The 9 per-(category,target) npy arrays the reference caches
    (``evaluation.py:390-441``): shapes + dtypes reload cleanly."""
    import glob

    from corsair_tpu.eval.cache import _FIELDS

    files = sorted(glob.glob(os.path.join(cache_dir, "*.npy")))
    assert files, f"no cache files written under {cache_dir}"
    # file name = <field>_<category>_<top1|gt>.npy
    suffixes = {"_".join(os.path.basename(f)[:-4].split("_")[-2:])
                for f in files}
    for sfx in suffixes:
        for name in _FIELDS:
            path = os.path.join(cache_dir, f"{name}_{sfx}.npy")
            assert os.path.exists(path), f"missing cache array {path}"
            arr = np.load(path)
            # The reference flattens each 4x4 before np.save
            # (evaluation.py:431-434); our cache keeps that layout.
            want = (n, 16) if name.startswith("Ts_est") else (n,)
            assert arr.shape == want, (path, arr.shape, want)
    logger.log(f"cache layout verified: {len(files)} npy files, all 9 "
               f"reference arrays per suffix {sorted(suffixes)}")


def main():
    from corsair_tpu.cli.evaluation import App, Config
    from corsair_tpu.utils.logger import Logger

    root = tempfile.mkdtemp(prefix="corsair_protocol_")
    t0 = time.time()
    tree = build_tree(root, n_cads=N_CADS, n_scans=N_SCANS,
                      n_points=N_POINTS, cd_table=False)
    print(f"tree built {time.time() - t0:.1f}s", flush=True)
    device_cd_table(tree)

    logger = Logger(os.path.join(REPO, "logs"),
                    "evaluation_protocol_scale.txt")
    logger.log(f"protocol-scale synthetic run: {N_CADS} CADs x "
               f"{N_SCANS} scans x {N_POINTS} pts (random-init weights;"
               f" checkpoints absent from this env)")
    for strict in (False, True):
        cache = os.path.join(root, f"cache_strict{int(strict)}")
        cfg = Config(
            shapenet_pc15k_root=tree["shapenet_root"],
            scan2cad_pc_root=tree["scan_root"],
            scan2cad_annotation_root=tree["annotation_root"],
            category="chair", checkpoint="",
            cache_dir=cache,
            voxel_size=0.03, batch_size=16, reg_batch_size=8,
            config_dir=tree["config_dir"],
            strict_protocol=strict,
        )
        logger.log(f"=== strict_protocol={strict} ===")
        app = App(cfg, logger=logger)
        t0 = time.time()
        app.extract_library()
        logger.log(f"phase A library extract: {time.time() - t0:.1f}s "
                   f"({N_CADS} CADs)")
        t0 = time.time()
        app.extract_scans()
        logger.log(f"phase B scan extract: {time.time() - t0:.1f}s "
                   f"({len(app.base_outputs)} scans)")
        t0 = time.time()
        app.eval_retrieval()
        logger.log(f"phase C retrieval: {time.time() - t0:.1f}s")
        t0 = time.time()
        app.eval_registration()
        logger.log(f"phase D registration: {time.time() - t0:.1f}s "
                   f"({len(app.base_outputs)} queries)")
        app.summarize()
        verify_caches(cache, len(app.base_outputs), logger)
        syms = np.unique([app.sym_label[i]
                          for i in app.stat["top1_predict"]])
        logger.log(f"sym groups hit: {syms.tolist()}")
    logger.log("protocol-scale CLI run complete")
    print("OK", flush=True)


if __name__ == "__main__":
    main()
