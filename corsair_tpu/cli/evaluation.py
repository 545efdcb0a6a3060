"""Scan2CAD retrieval + registration evaluation CLI.

Flag-compatible with the reference's ``evaluation.py`` (same defaults:
voxel 0.03, k_nn 5, max_corr 0.2, seed 31, batch 32, Precision@10%).
Phases:
  A. CAD-library feature extraction (batched, jitted)
  B. scan feature extraction
  C. retrieval eval (Precision@M, Top1-CD)
  D. registration (batched symmetry-aided RANSAC on device)
  E. RRE/RTE tables
GUI (reference phase F) is provided by ``corsair_tpu.cli.gui`` when a
display is available.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional

import numpy as np

from corsair_tpu.data.cad_lib import CustomizeCADLib
from corsair_tpu.data.scan2cad_info import Scan2cadInfo
from corsair_tpu.data.scannet_dataset import ScannetDataset
from corsair_tpu.eval import scan2cad_retrieval_eval
from corsair_tpu.eval.cache import load_results, save_results
from corsair_tpu.eval.metrics import summarize_registration
from corsair_tpu.eval.registration import fill_pose_losses, register_pairs
from corsair_tpu.ops.ransac import RansacConfig
from corsair_tpu.ops.symmetry import SymPoseConfig
from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor
from corsair_tpu.utils.logger import Logger

CATIDS = {"table": "04379243", "chair": "03001627"}


@dataclasses.dataclass
class Config:
    shapenet_pc15k_root: str
    scan2cad_pc_root: str
    scan2cad_annotation_root: str
    category: str
    checkpoint: str
    catid: Optional[str] = None
    voxel_size: float = 0.03
    k_nn: int = 5
    max_corr: float = 0.2
    distance: str = "l2"
    random_seed: int = 31
    cache_dir: str = ""
    register_top1: bool = True
    ignore_cache: bool = False
    batch_size: int = 32
    reg_batch_size: int = 8
    config_dir: Optional[str] = None
    # smoke runs: evaluate only the first N scan objects (0 = all)
    limit_scans: int = 0
    # reproduce the reference's exact eval path (triplet mining with
    # bad-scan substitution) instead of the mining-free eval items
    strict_protocol: bool = False
    # host prefetch threads preparing the NEXT item batch while the
    # device extracts the current one (the reference's
    # DataLoader(num_workers=…), evaluation.py:161-174). Strict-protocol
    # runs force 1 ordered worker: mining consumes the global np.random
    # stream, and serial order is part of the protocol.
    prefetch_workers: int = 2
    # opt-in SymPoseConfig.fast() preset (reduced Lloyd budget +
    # subsampled ratio/CD prescores): decision-identical on the budget
    # studies incl. near-threshold reject-side fixtures, ~10% faster
    # registration. Defaults stay reference-faithful.
    fast_sympose: bool = False

    def __post_init__(self):
        if self.category not in CATIDS:
            raise ValueError("Invalid category")
        self.catid = CATIDS[self.category]


def build_parser(script_dir: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Evaluate CORSAIR (TPU)")
    p.add_argument("--shapenet-pc15k-root", type=str,
                   default=os.path.join(script_dir, "data",
                                        "ShapeNetCore.v2.PC15k"))
    p.add_argument("--scan2cad-pc-root", type=str,
                   default=os.path.join(script_dir, "data", "Scan2CAD_pc"))
    p.add_argument("--scan2cad-annotation-root", type=str,
                   default=os.path.join(script_dir, "data",
                                        "Scan2CAD_annotations"))
    p.add_argument("--category", type=str, default="table",
                   choices=["table", "chair"])
    p.add_argument("--checkpoint", type=str,
                   default=os.path.join(script_dir, "ckpts",
                                        "scannet_ret_table_best"))
    p.add_argument("--cache-dir", type=str,
                   default=os.path.join(script_dir, "data"))
    p.add_argument("--register-gt", action="store_false",
                   dest="register_top1")
    p.add_argument("--ignore-cache", action="store_true")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--reg-batch-size", type=int, default=8)
    p.add_argument("--config-dir", type=str, default=None)
    p.add_argument("--limit-scans", type=int, default=0)
    p.add_argument("--strict-protocol", action="store_true")
    p.add_argument("--prefetch-workers", type=int, default=2)
    p.add_argument("--fast-sympose", action="store_true")
    return p


class App:
    def __init__(self, config: Config, logger: Optional[Logger] = None,
                 extractor_config: Optional[ExtractorConfig] = None):
        self.config = config
        self.logger = logger or Logger("./logs", "evaluation.txt")
        self.logger.log(f"category: {config.category}")

        self.scan2cad_info = Scan2cadInfo(
            cad_root=config.shapenet_pc15k_root,
            scan_root=config.scan2cad_pc_root,
            catid=config.catid,
            annotation_dir=config.scan2cad_annotation_root,
            config_dir=config.config_dir,
        )
        cfg_dir = config.config_dir or os.path.join(
            os.path.dirname(__file__), "..", "..", "configs"
        )
        self.cad_lib = CustomizeCADLib(
            root=config.shapenet_pc15k_root,
            catid=config.catid,
            ids=self.scan2cad_info.UsedObjId,
            table_path=os.path.join(cfg_dir,
                                    f"{config.catid}_scan2cad.npy"),
            voxel_size=config.voxel_size,
            preload=False,
        )
        self.dataset = ScannetDataset(
            scan_root=config.scan2cad_pc_root,
            cad_root=config.shapenet_pc15k_root,
            CADLib=self.cad_lib,
            Scan2CadInfo=self.scan2cad_info,
            split="test",
            catid=config.catid,
            pos_ratio=0.1,
            neg_ratio=0.5,
            voxel_size=config.voxel_size,
            preload=False,
            config_dir=config.config_dir,
        )
        self.dataset.pos_n = 1  # GT best match during evaluation
        self.dataset.strict_protocol = config.strict_protocol
        if config.limit_scans:
            self.dataset.limit(config.limit_scans)
        sym_file = os.path.join(
            cfg_dir, f"{config.catid}_scan2cad_rot_sym_label.txt"
        )
        with open(sym_file) as f:
            self.sym_label = [
                int(line.strip("\n").split(" ")[1]) for line in f
            ]

        np.random.seed(config.random_seed)
        import jax
        self.key = jax.random.PRNGKey(config.random_seed)

        self.extractor = FeatureExtractor(
            extractor_config or ExtractorConfig()
        )
        if config.checkpoint and os.path.exists(config.checkpoint):
            from corsair_tpu.nn.torch_convert import load_corsair_checkpoint
            model_p, emb_p, epoch = load_corsair_checkpoint(
                config.checkpoint
            )
            self.params = {"model": model_p, "embedding": emb_p}
            self.logger.log(f"Checkpoint epoch: {epoch}")
        else:
            self.params = self.extractor.init_params(self.key)
            self.logger.log(
                "WARNING: checkpoint missing — using random init"
            )

    # ---------------------------------------------------------------- A/B
    def extract_library(self):
        from corsair_tpu.data.prefetch import prefetch_item_batches

        self.logger.log("Updating global feature in the CAD library")
        lib_outputs, lib_origins, lib_feats, lib_Ts = [], [], [], []
        bs = self.config.batch_size
        n_lib = len(self.cad_lib)
        batches = [range(s, min(s + bs, n_lib))
                   for s in range(0, n_lib, bs)]
        for items in prefetch_item_batches(
            self.cad_lib.__getitem__, batches,
            workers=self.config.prefetch_workers,
        ):
            coords = [it["coord"].astype(np.int32) for it in items]
            per_cloud, desc = self.extractor.extract_batch_np(
                self.params, coords
            )
            lib_outputs.extend(per_cloud)
            lib_origins.extend(
                [it["origin"].astype(np.float32) for it in items]
            )
            lib_feats.append(desc)
            lib_Ts.extend([it["T"] for it in items])
        self.lib_outputs = lib_outputs
        self.lib_origins = lib_origins
        self.lib_feats = np.concatenate(lib_feats, 0)
        self.lib_Ts = np.stack(lib_Ts).astype(np.float32)

    def extract_scans(self):
        from corsair_tpu.data.prefetch import prefetch_item_batches

        self.logger.log("Updating global feature in the Scan2CAD dataset")
        outputs, origins, feats, Ts, best_idx, best_sym = [], [], [], [], [], []
        bs = self.config.batch_size
        n = len(self.dataset)
        batches = [range(s, min(s + bs, n)) for s in range(0, n, bs)]
        # strict mining consumes the global np.random stream: one
        # ordered worker keeps it bit-identical to the serial run.
        # INVARIANT (advisor r3): bit-identity additionally requires
        # that NOTHING on the main thread consumes np.random between
        # item batches — the worker's draws must interleave exactly as
        # the serial loop's would. The extraction/registration code
        # below is fully keyed jax.random (grep-verified: no np.random
        # use outside data mining), so the only global-stream consumer
        # is the dataset itself; keep it that way, or give the dataset
        # its own RandomState before adding np.random anywhere in this
        # loop.
        workers = (1 if self.config.strict_protocol
                   else self.config.prefetch_workers)
        for items in prefetch_item_batches(
            self.dataset.eval_item, batches, workers=workers,
        ):
            coords = [it["coord"].astype(np.int32) for it in items]
            per_cloud, desc = self.extractor.extract_batch_np(
                self.params, coords
            )
            outputs.extend(per_cloud)
            origins.extend(
                [it["origin"].astype(np.float32) for it in items]
            )
            feats.append(desc)
            Ts.extend([it["T"] for it in items])
            best_idx.extend([it["pos_idx"] for it in items])
            best_sym.extend([it["pos_sym"] for it in items])
        self.base_outputs = outputs
        self.base_origins = origins
        self.base_feats = np.concatenate(feats, 0)
        self.base_Ts = np.stack(Ts).astype(np.float32)
        self.best_match_idx = np.asarray(best_idx)
        self.best_match_syms = np.asarray(best_sym)

    # ------------------------------------------------------------------ C
    def eval_retrieval(self):
        self.stat = scan2cad_retrieval_eval(
            self.base_feats,
            self.lib_feats,
            self.best_match_idx,
            self.dataset.table,
            max(1, int(0.1 * self.dataset.table.shape[1])),
        )
        self.logger.log(f"top1_error: {self.stat['top1_error']}")
        self.logger.log(f"precision: {self.stat['precision']}")
        return self.stat

    # ------------------------------------------------------------------ D
    def eval_registration(self):
        cached = None
        if not self.config.ignore_cache and self.config.cache_dir:
            cached = load_results(
                self.config.cache_dir, self.config.category,
                self.config.register_top1,
            )
        if cached is not None:
            self.results = cached
            self.logger.log("Loaded registration results from cache")
            return cached

        target_key = "top1_predict" if self.config.register_top1 else "gt"
        cad_idx = np.asarray(self.stat[target_key])
        syms = np.asarray([self.sym_label[i] for i in cad_idx])

        import jax
        results = register_pairs(
            jax.random.PRNGKey(self.config.random_seed),
            self.base_outputs,
            self.base_origins,
            self.lib_outputs,
            self.lib_origins,
            cad_idx,
            syms,
            (lambda c: c.fast() if self.config.fast_sympose else c)(
                SymPoseConfig(
                    k_nn=self.config.k_nn,
                    max_corr=self.config.max_corr,
                    ransac=RansacConfig(
                        max_corr_dist=self.config.max_corr),
                )
            ),
            batch_size=self.config.reg_batch_size,
            progress=lambda done, total, k: self.logger.log(
                f"registration K={k}: {done}/{total}"
            ),
        )
        T1s = self.lib_Ts[cad_idx]
        results = fill_pose_losses(results, self.base_Ts, T1s, syms)
        self.results = results
        if self.config.cache_dir:
            save_results(
                self.config.cache_dir, self.config.category,
                self.config.register_top1, results,
            )
        return results

    # ------------------------------------------------------------------ E
    def summarize(self):
        r = self.results
        self.logger.log(summarize_registration(
            r.t_losses_ransac, r.r_losses_ransac, "vanilla ransac"
        ))
        self.logger.log(
            f"chamfer distance: {np.mean(r.chamfer_dist_ransac)}"
        )
        self.logger.log(summarize_registration(
            r.t_losses_sym, r.r_losses_sym, "sym ransac"
        ))
        self.logger.log(
            f"chamfer distance: {np.mean(r.chamfer_dist_sym)}"
        )
        self.logger.log(
            f"sym success rate: {np.mean(r.sym_ransac_success)}"
        )

    def run(self):
        self.extract_library()
        self.extract_scans()
        self.eval_retrieval()
        self.eval_registration()
        self.summarize()
        return self


def main(argv=None):
    script_dir = os.getcwd()
    args = build_parser(script_dir).parse_args(argv)
    config = Config(**vars(args))
    App(config).run()


if __name__ == "__main__":
    main()
