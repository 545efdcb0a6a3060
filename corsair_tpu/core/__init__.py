from corsair_tpu.core.sparse import SparseGrid, lexsort_keys, lookup_sorted
from corsair_tpu.core.voxelize import voxelize_np, voxelize_jax, sparse_collate_np
from corsair_tpu.core.coordmap import CoordinateManager, UNetMaps

__all__ = [
    "SparseGrid",
    "lexsort_keys",
    "lookup_sorted",
    "voxelize_np",
    "voxelize_jax",
    "sparse_collate_np",
    "CoordinateManager",
    "UNetMaps",
]
