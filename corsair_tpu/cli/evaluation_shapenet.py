"""ShapeNet synthetic-pose registration benchmark CLI.

Flag-compatible with the reference's ``evaluation-shapenet.py``: sample
n_models test clouds, apply random SE(3) poses, extract features for
(original, transformed) pairs, infer the symmetry label online, run the
symmetry-aided registration, and write results CSV + poses NPZ with the
same schema (resume supported).

The reference fans registration out over joblib processes fed by a GPU
producer (``:277-343``); here the producer and all registrations are
batched device programs.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional

import numpy as np

from corsair_tpu.eval.registration import register_pairs
from corsair_tpu.ops.pose_metrics import eval_pose
from corsair_tpu.ops.ransac import RansacConfig
from corsair_tpu.ops.symmetry import SymPoseConfig
from corsair_tpu.ops.symmetry_label import get_symmetry_label
from corsair_tpu.ops.transforms import random_pose_limits
from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor

CATIDS = {"table": "04379243", "chair": "03001627"}


@dataclasses.dataclass
class Config:
    shapenet_root: str
    category: str
    n_models: int = 1
    n_poses_per_model: int = 10
    max_roll_deg: float = 360
    max_pitch_deg: float = 360
    max_yaw_deg: float = 360
    max_translation_x: float = 1.0
    max_translation_y: float = 1.0
    max_translation_z: float = 1.0
    model_ckpt: str = ""
    random_seed: int = 0
    category_id: Optional[str] = None
    voxel_size: float = 0.03
    k_nn: int = 5
    max_corr: float = 0.4
    reg_batch_size: int = 8

    def __post_init__(self):
        if self.category not in CATIDS:
            raise ValueError(f"Unsupported category: {self.category}")
        self.category_id = CATIDS[self.category]
        assert self.n_poses_per_model > 0


def load_pc(path):
    pc = np.load(path)
    pc = pc - pc.mean(axis=0, keepdims=True)
    pc = pc / np.linalg.norm(pc, axis=1).max()
    return pc


class App:
    def __init__(self, config: Config):
        self.config = config
        np.random.seed(config.random_seed)

        cat_dir = os.path.join(
            config.shapenet_root, config.category_id, "test"
        )
        files = sorted(os.listdir(cat_dir))
        files = [os.path.join(cat_dir, f) for f in files]
        n = config.n_models if config.n_models > 0 else len(files)
        n = min(n, len(files))
        if n < len(files):
            files = list(np.random.choice(files, n, replace=False))
        self.pc_files = sorted(files)
        self.config.n_models = n

        postfix = (
            f"shapenet-seed{config.random_seed}-{config.category}-"
            f"{config.n_models}-{config.n_poses_per_model}"
        )
        self.csv_file = f"results-{postfix}.csv"
        self.npz_file = f"poses-{postfix}.npz"

        self.extractor = FeatureExtractor(ExtractorConfig())
        import jax
        if config.model_ckpt and os.path.exists(config.model_ckpt):
            from corsair_tpu.nn.torch_convert import (
                load_corsair_checkpoint,
            )
            model_p, emb_p, _ = load_corsair_checkpoint(config.model_ckpt)
            if emb_p is None:
                emb_p = self.extractor.init_params(
                    jax.random.PRNGKey(0))["embedding"]
            self.params = {"model": model_p, "embedding": emb_p}
        else:
            self.params = self.extractor.init_params(
                jax.random.PRNGKey(config.random_seed)
            )

    def run(self):
        import jax
        import pandas as pd

        # resume from a previous run's CSV + NPZ
        # (evaluation-shapenet.py:215-224)
        if os.path.exists(self.csv_file) and os.path.exists(self.npz_file):
            self.df = pd.read_csv(self.csv_file)
            with open(self.npz_file, "rb") as f:
                data = np.load(f)
                self.poses_gt = data["poses_gt"]
                self.poses_pred_sym = data["poses_pred_sym"]
                self.poses_pred_ransac = data["poses_pred_ransac"]
            self.print_stats()
            return self.df

        cfg = self.config
        rng = np.random.RandomState(cfg.random_seed)
        rows = []
        poses_gt, poses_sym, poses_ransac = [], [], []

        # produce all (pc, transformed pc, pose) test cases
        cases = []
        for pc_file in self.pc_files:
            pc = load_pc(pc_file)
            for _ in range(cfg.n_poses_per_model):
                pose = random_pose_limits(
                    rng,
                    (cfg.max_roll_deg, cfg.max_pitch_deg, cfg.max_yaw_deg),
                    (cfg.max_translation_x, cfg.max_translation_y,
                     cfg.max_translation_z),
                )
                pc_t = pc @ pose[:3, :3].T + pose[:3, 3]
                cases.append((pc_file, pc, pc_t, pose))

        # voxelize + features: batch pairs (pc, pc_t)
        from corsair_tpu.core.voxelize import voxelize_np

        quant, quant_t, grids, grids_t = [], [], [], []
        for _, pc, pc_t, _ in cases:
            q, g, _ = voxelize_np(pc.astype(np.float32), cfg.voxel_size)
            qt, gt_, _ = voxelize_np(
                pc_t.astype(np.float32), cfg.voxel_size
            )
            quant.append(q.astype(np.float32))
            quant_t.append(qt.astype(np.float32))
            grids.append(g)
            grids_t.append(gt_)

        feats, feats_t = [], []
        bs = 8
        for s in range(0, len(cases), bs):
            f, _ = self.extractor.extract_batch_np(
                self.params, grids[s : s + bs]
            )
            ft, _ = self.extractor.extract_batch_np(
                self.params, grids_t[s : s + bs]
            )
            feats.extend(f)
            feats_t.extend(ft)

        # symmetry labels from the original (normalized) clouds
        sym_labels = [
            get_symmetry_label(pc.astype(np.float32), cd_threshold=0.1)
            for _, pc, _, _ in cases
        ]

        sym_cfg = SymPoseConfig(
            k_nn=cfg.k_nn, max_corr=cfg.max_corr,
            ransac=RansacConfig(max_corr_dist=cfg.max_corr),
        )
        results = register_pairs(
            jax.random.PRNGKey(cfg.random_seed),
            feats, quant, feats_t, quant_t,
            np.arange(len(cases)),
            sym_labels,
            sym_cfg,
            batch_size=cfg.reg_batch_size,
        )

        for i, (pc_file, _, _, pose_gt) in enumerate(cases):
            sym = int(sym_labels[i])
            rte_sym, rre_sym = eval_pose(
                results.Ts_est_best[i], np.eye(4), pose_gt, sym
            )
            rte_r, rre_r = eval_pose(
                results.Ts_est_ransac[i], np.eye(4), pose_gt, sym
            )
            poses_gt.append(pose_gt)
            poses_sym.append(results.Ts_est_best[i])
            poses_ransac.append(results.Ts_est_ransac[i])
            rows.append({
                "model": os.path.basename(pc_file),
                "pose_idx": i % cfg.n_poses_per_model,
                "symmetry_label": sym,
                "sym_success": bool(results.sym_ransac_success[i]),
                "rte_sym": rte_sym,
                "rre_sym": rre_sym,
                "cd_sym": results.chamfer_dist_sym[i],
                "rte_ransac": rte_r,
                "rre_ransac": rre_r,
                "cd_ransac": results.chamfer_dist_ransac[i],
            })

        self.df = pd.DataFrame(rows)
        self.df.to_csv(self.csv_file, index=False)
        with open(self.npz_file, "wb") as f:
            np.savez(
                f, poses_gt=np.stack(poses_gt),
                poses_pred_sym=np.stack(poses_sym),
                poses_pred_ransac=np.stack(poses_ransac),
            )
        self.print_stats()
        return self.df

    def print_stats(self):
        df = self.df
        n = len(df)
        print(f"RTE <= 0.02: sym: {(df['rte_sym'] <= 0.02).sum() / n:.4f}, "
              f"ransac: {(df['rte_ransac'] <= 0.02).sum() / n:.4f}")
        print(f"RRE <= 5 deg: sym: "
              f"{(df['rre_sym'] <= np.deg2rad(5)).sum() / n:.4f}, ransac: "
              f"{(df['rre_ransac'] <= np.deg2rad(5)).sum() / n:.4f}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--shapenet-root", type=str, required=True)
    p.add_argument("--category", type=str, required=True)
    p.add_argument("--n-models", type=int, default=1)
    p.add_argument("--n-poses-per-model", type=int, default=10)
    p.add_argument("--max-roll-deg", type=float, default=360)
    p.add_argument("--max-pitch-deg", type=float, default=360)
    p.add_argument("--max-yaw-deg", type=float, default=360)
    p.add_argument("--max-translation-x", type=float, default=1.0)
    p.add_argument("--max-translation-y", type=float, default=1.0)
    p.add_argument("--max-translation-z", type=float, default=1.0)
    p.add_argument("--model-ckpt", type=str, default="")
    p.add_argument("--random-seed", type=int, default=0)
    args = p.parse_args(argv)
    App(Config(**vars(args))).run()


if __name__ == "__main__":
    main()
