"""Synthetic Scan2CAD/ShapeNet data tree for integration tests.

Builds the exact on-disk schema the reference consumes: the
ShapeNetCore.v2.PC15k layout, Scan2CAD_pc object files named
``SceneID.NumModel.CatId.ModelId.npy``, ``full_annotations.json`` +
``unique_cads.csv``, and the config artifacts (CD table with diag 200,
sym labels, fix_trans.npy, scene split lists).
"""

import json
import os

import numpy as np

CATID = "03001627"


def make_shape(rng, kind, n=400):
    """Distinct shapes so retrieval has signal."""
    if kind == 0:  # box shell
        pts = rng.uniform(-1, 1, (n, 3))
        axis = rng.randint(0, 3, n)
        sign = rng.choice([-1.0, 1.0], n)
        pts[np.arange(n), axis] = sign
    elif kind == 1:  # sphere
        pts = rng.randn(n, 3)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    elif kind == 2:  # cylinder
        theta = rng.uniform(0, 2 * np.pi, n)
        pts = np.stack(
            [np.cos(theta), rng.uniform(-1, 1, n), np.sin(theta)], 1
        )
    else:  # two lobes
        half = n // 2
        pts = np.concatenate([
            rng.randn(half, 3) * 0.2 + [0.8, 0, 0],
            rng.randn(n - half, 3) * 0.2 + [-0.8, 0, 0],
        ])
    return (pts + rng.randn(n, 3) * 0.01).astype(np.float64)


def build_tree(root, n_cads=6, n_scans=4, n_points=400, seed=0,
               cd_table=True):
    """Returns dict of paths: shapenet_root, scan_root, annotation_root,
    config_dir.

    ``cd_table=False`` skips the host KDTree pairwise-CD table (O(n^2)
    host work — days at 652 CADs x 15k points on this 1-core box);
    the caller regenerates it on device via ``cli.precompute``'s
    ``chamfer_matrix`` path (scripts/evaluation_protocol_scale.py)."""
    rng = np.random.RandomState(seed)
    shapenet = os.path.join(root, "ShapeNetCore.v2.PC15k")
    scans = os.path.join(root, "Scan2CAD_pc")
    annos = os.path.join(root, "Scan2CAD_annotations")
    configs = os.path.join(root, "configs")
    for d in (scans, annos, configs):
        os.makedirs(d, exist_ok=True)

    model_ids = [f"model{i:04d}" for i in range(n_cads)]
    cad_pcs = {}
    for i, mid in enumerate(model_ids):
        split = ["train", "val", "test"][i % 3]
        d = os.path.join(shapenet, CATID, split)
        os.makedirs(d, exist_ok=True)
        pc = make_shape(rng, i % 4, n_points)
        cad_pcs[mid] = pc
        np.save(os.path.join(d, f"{mid}.npy"), pc)
    # every split dir must exist for path_dict
    for split in ("train", "val", "test"):
        os.makedirs(os.path.join(shapenet, CATID, split), exist_ok=True)

    # scan objects: a transformed copy of a CAD model + noise
    annotations = []
    scan_files = []
    scene_ids = []
    for s in range(n_scans):
        scene = f"scene{s:04d}_00"
        scene_ids.append(scene)
        mid = model_ids[s % n_cads]
        base = cad_pcs[mid]
        # scan pose and cad pose (quaternion w,x,y,z)
        t_scan = rng.uniform(-0.2, 0.2, 3).tolist()
        t_cad = rng.uniform(-0.2, 0.2, 3).tolist()
        trs_scan = {"translation": t_scan, "rotation": [1, 0, 0, 0],
                    "scale": [1, 1, 1]}
        trs_cad = {"translation": t_cad, "rotation": [1, 0, 0, 0],
                   "scale": [1, 1, 1]}
        fname = f"{scene}.0.{CATID}.{mid}.npy"
        scan_files.append(fname)
        # store the scan so that inv(T_pos) @ T_base aligns it onto the
        # CAD (the eval protocol's assumption, datasets/ScannetDataset
        # :231): scan = inv(T_base) @ T_pos @ (cad + noise)
        from corsair_tpu.ops.transforms import apply_transform, to_T

        T_base = to_T(t_scan, [1, 0, 0, 0], [1, 1, 1])
        T_pos = to_T(t_cad, [1, 0, 0, 0], [1, 1, 1])
        noisy = base + rng.randn(*base.shape) * 0.01
        scan_pc = apply_transform(
            noisy, np.linalg.inv(T_base) @ T_pos
        )
        np.save(os.path.join(scans, fname), scan_pc)
        annotations.append({
            "id_scan": scene,
            "trs": trs_scan,
            "aligned_models": [{"trs": trs_cad}],
        })
    with open(os.path.join(annos, "full_annotations.json"), "w") as f:
        json.dump(annotations, f)
    with open(os.path.join(annos, "unique_cads.csv"), "w") as f:
        for mid in model_ids:
            f.write(f"{CATID},{mid}\n")

    # configs: scene splits — first scene goes to train, rest to val(test)
    with open(os.path.join(configs, "scannet_train.txt"), "w") as f:
        f.write(scene_ids[0] + "\n")
    with open(os.path.join(configs, "scannet_val.txt"), "w") as f:
        f.write("\n".join(scene_ids[1:]) + "\n")
    with open(os.path.join(configs, "scannet_omit.txt"), "w") as f:
        f.write("")

    if cd_table:
        # CD table with diag 200 (configs convention): true bidirectional
        # Chamfer between the normalized models, so positive/negative
        # sampling behaves like the real pipeline
        from scipy.spatial import cKDTree

        def norm(pc):
            pc = pc - pc.mean(0)
            return pc / np.linalg.norm(pc, axis=1).max()

        npc = {m: norm(cad_pcs[m]) for m in model_ids}
        table = np.zeros((n_cads, n_cads))
        for i, mi in enumerate(model_ids):
            for j, mj in enumerate(model_ids):
                if i == j:
                    table[i, j] = 200.0
                    continue
                a, b = npc[mi], npc[mj]
                da, _ = cKDTree(b).query(a, k=1)
                db, _ = cKDTree(a).query(b, k=1)
                table[i, j] = da.mean() + db.mean()
        np.save(os.path.join(configs, f"{CATID}_scan2cad.npy"), table)

    # sym labels
    with open(os.path.join(configs,
                           f"{CATID}_scan2cad_rot_sym_label.txt"), "w") as f:
        for i, mid in enumerate(model_ids):
            f.write(f"{mid} {[1, 2, 4, 1][i % 4]}\n")

    # fixed eval rotations [N, 3, 4, 4]
    from corsair_tpu.ops.transforms import random_rotation
    fix = np.zeros((2000, 3, 4, 4))
    r2 = np.random.RandomState(7)
    for i in range(50):
        for j in range(3):
            _, T = random_rotation(np.zeros((1, 3)), r2)
            fix[i, j] = T
    fix[50:] = np.eye(4)
    np.save(os.path.join(configs, "fix_trans.npy"), fix)

    return {
        "shapenet_root": shapenet,
        "scan_root": scans,
        "annotation_root": annos,
        "config_dir": configs,
        "model_ids": model_ids,
        "scan_files": scan_files,
    }


def parse_sym_label_paths(sym_label_path):
    """The vendored sym-label file lists, per library index, the original
    CAD npy path (``.../<catid>/<split>/<id>.npy``) and the symmetry
    label. Returns [(split, model_id, sym), ...] in library order."""
    entries = []
    with open(sym_label_path) as f:
        for line in f:
            path, sym = line.strip("\n").split(" ")
            parts = path.split("/")
            entries.append((parts[-2], parts[-1].split(".")[0], int(sym)))
    return entries


def build_tree_real_configs(root, config_dir, catid=CATID,
                            n_test_scenes=3, n_train_scenes=2,
                            scans_per_scene=2, n_points=256, seed=0):
    """Synthetic point clouds around the REAL vendored config artifacts.

    The CAD library is the real one (all 652 chair model ids, in the real
    library order, each split into its original train/val/test subdir) so
    the real 652x652 CD table, sym labels, ``fix_trans.npy`` and scene
    split lists load unmodified; only the point clouds themselves (absent
    from this environment) are synthesized. Scan scenes are drawn from the
    real split lists so the scene-level split logic runs for real.
    """
    rng = np.random.RandomState(seed)
    shapenet = os.path.join(root, "ShapeNetCore.v2.PC15k")
    scans = os.path.join(root, "Scan2CAD_pc")
    annos = os.path.join(root, "Scan2CAD_annotations")
    os.makedirs(scans, exist_ok=True)
    os.makedirs(annos, exist_ok=True)

    entries = parse_sym_label_paths(
        os.path.join(config_dir, f"{catid}_scan2cad_rot_sym_label.txt")
    )
    for split in ("train", "val", "test"):
        os.makedirs(os.path.join(shapenet, catid, split), exist_ok=True)

    cad_pcs = {}
    for i, (split, mid, _sym) in enumerate(entries):
        pc = make_shape(rng, i % 4, n_points)
        cad_pcs[mid] = pc
        np.save(os.path.join(shapenet, catid, split, f"{mid}.npy"), pc)

    with open(os.path.join(annos, "unique_cads.csv"), "w") as f:
        for _split, mid, _sym in entries:
            f.write(f"{catid},{mid}\n")

    with open(os.path.join(config_dir, "scannet_val.txt")) as f:
        test_scenes = [line.strip("\n") for line in f][:n_test_scenes]
    with open(os.path.join(config_dir, "scannet_train.txt")) as f:
        train_scenes = [line.strip("\n") for line in f][:n_train_scenes]
    with open(os.path.join(config_dir, "scannet_omit.txt")) as f:
        omits = {line.strip("\n") for line in f}

    from corsair_tpu.ops.transforms import apply_transform, to_T

    def rand_trs():
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        return {
            "translation": rng.uniform(-0.3, 0.3, 3).tolist(),
            "rotation": q.tolist(),
            "scale": [1.0, 1.0, 1.0],
        }

    annotations = []
    scan_files = []
    for scene in test_scenes + train_scenes:
        trs_scan = rand_trs()
        T_base = to_T(trs_scan["translation"], trs_scan["rotation"],
                      trs_scan["scale"])
        models = []
        for j in range(scans_per_scene):
            cad_i = int(rng.randint(0, len(entries)))
            mid = entries[cad_i][1]
            fname = f"{scene}.{j}.{catid}.{mid}.npy"
            trs_cad = rand_trs()
            models.append({"trs": trs_cad})
            if fname in omits:
                continue
            T_pos = to_T(trs_cad["translation"], trs_cad["rotation"],
                         trs_cad["scale"])
            noisy = cad_pcs[mid] + rng.randn(n_points, 3) * 0.01
            scan_pc = apply_transform(noisy, np.linalg.inv(T_base) @ T_pos)
            np.save(os.path.join(scans, fname), scan_pc)
            scan_files.append(fname)
        annotations.append({
            "id_scan": scene,
            "trs": trs_scan,
            "aligned_models": models,
        })
    with open(os.path.join(annos, "full_annotations.json"), "w") as f:
        json.dump(annotations, f)

    return {
        "shapenet_root": shapenet,
        "scan_root": scans,
        "annotation_root": annos,
        "config_dir": config_dir,
        "model_ids": [e[1] for e in entries],
        "scan_files": scan_files,
    }
