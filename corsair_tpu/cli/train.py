"""Finetuning CLI: triplet training on Scan2CAD/ShapeNet datasets.

The reference ships only inference (its checkpoints contain optimizer/
scheduler state, ``utils/ckpts.py``, but the loop is absent upstream).
This CLI completes the training side: ScannetDataset (or
CategoryDataset) triplets -> point-contrastive + descriptor-triplet
losses -> SGD with exponential decay -> npz checkpoints.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from corsair_tpu.utils.logger import Logger

CATIDS = {"table": "04379243", "chair": "03001627"}


def main(argv=None):
    p = argparse.ArgumentParser(description="Finetune CORSAIR-TPU")
    p.add_argument("--shapenet-pc15k-root", type=str, required=True)
    p.add_argument("--scan2cad-pc-root", type=str, required=True)
    p.add_argument("--scan2cad-annotation-root", type=str, required=True)
    p.add_argument("--category", type=str, default="chair",
                   choices=list(CATIDS))
    p.add_argument("--voxel-size", type=float, default=0.03)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-1)
    p.add_argument("--pos-ratio", type=float, default=0.1)
    p.add_argument("--neg-ratio", type=float, default=0.5)
    p.add_argument("--save-dir", type=str, default="./ckpts_tpu")
    p.add_argument("--save-name", type=str, default="scannet_finetune")
    p.add_argument("--resume", type=str, default="")
    p.add_argument("--init-checkpoint", type=str, default="",
                   help="torch checkpoint to start from (converted)")
    p.add_argument("--config-dir", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    from corsair_tpu.data.cad_lib import CustomizeCADLib
    from corsair_tpu.data.scan2cad_info import Scan2cadInfo
    from corsair_tpu.data.scannet_dataset import ScannetDataset
    from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor
    from corsair_tpu.train.trainer import TrainConfig, Trainer
    from corsair_tpu.utils.ckpts import save_checkpoint

    logger = Logger("./logs", "train.txt")
    catid = CATIDS[args.category]
    np.random.seed(args.seed)

    cfg_dir = args.config_dir or os.path.join(
        os.path.dirname(__file__), "..", "..", "configs"
    )
    info = Scan2cadInfo(
        cad_root=args.shapenet_pc15k_root,
        scan_root=args.scan2cad_pc_root,
        catid=catid,
        annotation_dir=args.scan2cad_annotation_root,
        config_dir=args.config_dir,
    )
    cad_lib = CustomizeCADLib(
        root=args.shapenet_pc15k_root, catid=catid, ids=info.UsedObjId,
        table_path=os.path.join(cfg_dir, f"{catid}_scan2cad.npy"),
        voxel_size=args.voxel_size, preload=False,
    )
    dataset = ScannetDataset(
        scan_root=args.scan2cad_pc_root,
        cad_root=args.shapenet_pc15k_root,
        CADLib=cad_lib, Scan2CadInfo=info, split="train", catid=catid,
        pos_ratio=args.pos_ratio, neg_ratio=args.neg_ratio,
        voxel_size=args.voxel_size, preload=False,
        config_dir=args.config_dir,
    )

    extractor = FeatureExtractor(ExtractorConfig())
    trainer = Trainer(extractor, TrainConfig(learning_rate=args.lr))
    params, opt_state = trainer.init(jax.random.PRNGKey(args.seed))
    if args.init_checkpoint and os.path.exists(args.init_checkpoint):
        from corsair_tpu.nn.torch_convert import load_corsair_checkpoint

        model_p, emb_p, epoch = load_corsair_checkpoint(
            args.init_checkpoint
        )
        params = {"model": model_p, "embedding": emb_p or
                  params["embedding"]}
        opt_state = trainer.opt.init(params)
        logger.log(f"initialized from torch checkpoint (epoch {epoch})")

    order = np.arange(len(dataset))
    step = 0
    for epoch in range(args.epochs):
        np.random.shuffle(order)
        epoch_losses = []
        for s in range(0, len(order), args.batch_size):
            idxs = order[s : s + args.batch_size]
            items = [dataset[int(i)] for i in idxs]
            batch = dataset.collate_pair_fn(items)
            cap = max(
                int(batch[f"{r}_valid"].sum())
                for r in ("base", "pos", "neg")
            )
            params, opt_state, loss, aux = trainer.step(
                params, opt_state, batch, cap
            )
            epoch_losses.append(float(loss))
            step += 1
            if step % 20 == 0:
                logger.log(
                    f"epoch {epoch} step {step} loss {float(loss):.4f} "
                    + " ".join(
                        f"{k}={float(v):.4f}" for k, v in aux.items()
                    )
                )
        logger.log(
            f"epoch {epoch}: mean loss {np.mean(epoch_losses):.4f}"
        )
        path = save_checkpoint(
            params["model"], params["embedding"], opt_state, epoch,
            args.save_dir, args.save_name,
        )
        logger.log(f"saved {path}")


if __name__ == "__main__":
    main()
