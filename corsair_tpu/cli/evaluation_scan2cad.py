"""Scan2CAD retrieval with Gaussian-splat-reconstruction re-ranking.

Flag-compatible with the reference's ``evaluation-scan2cad.py``: phases
A-C of the main evaluation (feature extraction + retrieval), then instead
of registration, re-rank the top ``use_best`` feature matches by the
cached GT-CADxsplat Chamfer matrix and report the mean Chamfer distance
between each query's GT CAD and the retrieved RaDe-GS reconstruction.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

from corsair_tpu.cli.evaluation import App as BaseApp, Config as BaseConfig
from corsair_tpu.data.cad_lib import GaussianSplatLib
from corsair_tpu.ops.chamfer import chamfer_bidirectional
from corsair_tpu.utils.logger import Logger


@dataclasses.dataclass
class Config(BaseConfig):
    shapenet_radegs_root: str = ""
    use_best: int = 30


class App(BaseApp):
    def __init__(self, config: Config):
        super().__init__(
            config,
            logger=Logger("./logs",
                          "evaluation_scan2cad_gsplat_recon.txt"),
        )
        self.gsplat_lib = GaussianSplatLib(
            config.shapenet_radegs_root, config.catid
        )

    def rerank_and_eval(self, chamfer_cache_csv: Optional[str] = None):
        """Re-rank top-N feature matches by cached CD, then score
        retrieved splat reconstructions against GT CADs."""
        import pandas as pd
        import jax.numpy as jnp

        cfg_dir = self.config.config_dir or os.path.join(
            os.path.dirname(__file__), "..", "..", "configs"
        )
        csv_path = chamfer_cache_csv or os.path.join(
            cfg_dir, "chamfer_dist_list.csv"
        )
        n_lib = len(self.scan2cad_info.UsedObjId)
        cache = pd.read_csv(csv_path)["chamfer_dist"].to_numpy().reshape(
            (n_lib, n_lib)
        )
        best_matches_idx = np.fromiter(
            (self.cad_lib.id2idx[i] for i in self.dataset.BestMatches),
            dtype=np.int64,
        )
        a2 = np.sum(self.base_feats**2, 1, keepdims=True)
        b2 = np.sum(self.lib_feats**2, 1, keepdims=True)
        feature_dist = np.sqrt(np.clip(
            a2 + b2.T - 2 * self.base_feats @ self.lib_feats.T, 0, None
        ))
        topN = np.argsort(feature_dist, axis=-1)
        use_best = self.config.use_best
        retrieved = np.array([
            topN[i, np.argmin(
                cache[best_matches_idx[i], topN[i, :use_best].flatten()]
            )]
            for i in range(len(best_matches_idx))
        ])
        self.retrieved_object_idx = retrieved

        cds = []
        for gt_id, ret_idx in zip(self.dataset.BestMatches, retrieved):
            ret_id = self.cad_lib.ids[int(ret_idx)]
            gt_pc = self.cad_lib._getpc_raw_id(gt_id)
            splat_pc = self.gsplat_lib.get_recon_pc_by_id_transformed(
                ret_id
            )
            cd = float(chamfer_bidirectional(
                jnp.asarray(gt_pc, jnp.float32),
                jnp.asarray(splat_pc, jnp.float32),
            ))
            cds.append(cd)
        self.chamfer_dist_list = cds
        self.logger.log(
            "average chamfer distance (GT CAD vs RaDe-GS reconstructed "
            f"PCD): {np.mean(cds)}"
        )
        return cds

    def write_results(self, path: str = "results"):
        """Per-file result rows (parity: evaluation-scan2cad.py tail)."""
        best_matches_idx = np.fromiter(
            (self.cad_lib.id2idx[i] for i in self.dataset.BestMatches),
            dtype=np.int64,
        )
        with open(path, "w") as f:
            for file, cd, best, retrieved in zip(
                self.dataset.files, self.chamfer_dist_list,
                best_matches_idx, self.retrieved_object_idx,
            ):
                f.write(f"{file},{cd},{best},{retrieved}\n")

    def run(self):
        self.extract_library()
        self.extract_scans()
        self.eval_retrieval()
        self.rerank_and_eval()
        self.write_results()
        return self


def main(argv=None):
    script_dir = os.getcwd()
    from corsair_tpu.cli.evaluation import build_parser

    p = build_parser(script_dir)
    p.add_argument("--shapenet-radegs-root", type=str,
                   default="/mnt/data/RaDe-GS")
    p.add_argument("--use-best", type=int, default=30)
    args = p.parse_args(argv)
    App(Config(**vars(args))).run()


if __name__ == "__main__":
    main()
