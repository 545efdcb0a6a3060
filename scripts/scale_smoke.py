#!/usr/bin/env python
"""Production-scale CLI smoke: synthetic 24-CAD x 20-scan Scan2CAD tree
through the full evaluation pipeline on the current accelerator. Covers
multi-batch extraction, retrieval, and BOTH symmetry groups (K=4 and
K=2) of the registration driver — the K=2 group once exposed an XLA TPU
compiler crash that the unit tests (CPU) could not see.
"""
import sys, os, time, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/corsair_jax_cache")
import numpy as np
from synthetic_data import build_tree, CATID

root = tempfile.mkdtemp()
t0 = time.time()
tree = build_tree(root, n_cads=24, n_scans=20, n_points=3000)
print(f"tree built {time.time()-t0:.1f}s", flush=True)

from corsair_tpu.cli.evaluation import App, Config
config = Config(
    shapenet_pc15k_root=tree["shapenet_root"],
    scan2cad_pc_root=tree["scan_root"],
    scan2cad_annotation_root=tree["annotation_root"],
    category="chair", checkpoint="",
    cache_dir=os.path.join(root, "cache"),
    voxel_size=0.03, batch_size=8, reg_batch_size=8,
    config_dir=tree["config_dir"],
)
t0=time.time()
app = App(config)
app.extract_library(); print(f"library extracted {time.time()-t0:.1f}s", flush=True)
t0=time.time(); app.extract_scans(); print(f"scans extracted {time.time()-t0:.1f}s ({len(app.base_outputs)} scans)", flush=True)
t0=time.time(); stat = app.eval_retrieval(); print(f"retrieval {time.time()-t0:.1f}s precision={stat['precision']:.1f}", flush=True)
t0=time.time(); res = app.eval_registration(); print(f"registration {time.time()-t0:.1f}s", flush=True)
app.summarize()
import numpy as np
print("sym groups used:", np.unique([app.sym_label[i] for i in app.stat['top1_predict']]), flush=True)
print("OK", flush=True)
