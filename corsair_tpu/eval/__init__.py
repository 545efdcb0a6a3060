from corsair_tpu.eval.retrieval import (
    average_precision,
    compute_mAP,
    retrieval_eval,
    retrieval_dist,
    get_rank,
    scan2cad_retrieval_eval,
    scan2cad_retrieval_eval_dist,
)
from corsair_tpu.eval.metrics import compute_rte_table, compute_rre_table

__all__ = [
    "average_precision",
    "compute_mAP",
    "retrieval_eval",
    "retrieval_dist",
    "get_rank",
    "scan2cad_retrieval_eval",
    "scan2cad_retrieval_eval_dist",
    "compute_rte_table",
    "compute_rre_table",
]
