from corsair_tpu.ops.knn import pairwise_sqdist, find_nn, find_knn
from corsair_tpu.ops.chamfer import (
    chamfer_1direction,
    chamfer_bidirectional,
    chamfer_max,
)
from corsair_tpu.ops.transforms import (
    apply_transform,
    random_rotation,
    to_T,
    euler_y,
)
from corsair_tpu.ops.kabsch import kabsch_umeyama
from corsair_tpu.ops.ransac import ransac_correspondences, RansacConfig
from corsair_tpu.ops.kmeans import kmeans_lloyd, kmeans_lloyd_fits
from corsair_tpu.ops.pose_metrics import eval_pose

__all__ = [
    "pairwise_sqdist",
    "find_nn",
    "find_knn",
    "chamfer_1direction",
    "chamfer_bidirectional",
    "chamfer_max",
    "apply_transform",
    "random_rotation",
    "to_T",
    "euler_y",
    "kabsch_umeyama",
    "ransac_correspondences",
    "RansacConfig",
    "kmeans_lloyd",
    "kmeans_lloyd_fits",
    "eval_pose",
]
