from corsair_tpu.train.loss import (
    point_contrastive_loss,
    descriptor_triplet_loss,
)
from corsair_tpu.train.trainer import Trainer, TrainConfig, train_step

__all__ = [
    "point_contrastive_loss",
    "descriptor_triplet_loss",
    "Trainer",
    "TrainConfig",
    "train_step",
]
