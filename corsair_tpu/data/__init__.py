from corsair_tpu.data.readers import (
    load_raw_pc,
    load_norm_pc,
    Reader,
    ScannetReader,
    CategoryLibReader,
    ReaderWithPath,
    Scan2cadLibReader,
    path_dict,
)
from corsair_tpu.data.scan2cad_info import Scan2cadInfo
from corsair_tpu.data.cad_lib import CustomizeCADLib, GaussianSplatLib
from corsair_tpu.data.scannet_dataset import ScannetDataset

__all__ = [
    "load_raw_pc",
    "load_norm_pc",
    "Reader",
    "ScannetReader",
    "CategoryLibReader",
    "ReaderWithPath",
    "Scan2cadLibReader",
    "path_dict",
    "Scan2cadInfo",
    "CustomizeCADLib",
    "GaussianSplatLib",
    "ScannetDataset",
]
