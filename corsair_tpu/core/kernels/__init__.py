from corsair_tpu.core.kernels.sector_knn import sector_knn_pallas

__all__ = ["sector_knn_pallas"]
