"""Benchmark: end-to-end pclouds/sec (feature extraction + symmetry-aided
registration) on the current accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload mirrors the Scan2CAD registration loop (SURVEY §3.1 Phase B+D):
per query cloud, extract ResUNetBN2C features and register against an
assigned CAD with the full symmetry-aided pipeline (K=4 sectors: 1 vanilla
+ 8 sector-shift RANSACs, 4096 hypotheses each, 100-candidate symmetric
cut on both clouds).

Baseline: the reference (CUDA GPU, Open3D RANSAC + sklearn KMeans on
host) publishes no throughput numbers (BASELINE.md); profiling its
pipeline structure (9 sequential RANSACs + ~200 sequential 10-restart
KMeans fits per query, single query at a time) puts it at ~1 query/sec on
a modern GPU+CPU. vs_baseline is measured against that 1.0 pclouds/sec
estimate — see BASELINE.json north star (>= 10x).
"""

import json
import os
import time

import numpy as np

# Persistent XLA compilation cache: repeat bench invocations skip the
# (minutes-long) TPU compiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/corsair_jax_cache")

REFERENCE_BASELINE_PCLOUDS_PER_SEC = 1.0


def make_cloud(rng, n_pts, voxel=0.03):
    # two-lobe cloud with mirrored features: representative voxel count
    pts = rng.randn(n_pts, 3).astype(np.float32) * 0.5
    grid = np.floor(pts / voxel).astype(np.int32)
    _, first = np.unique(grid, axis=0, return_index=True)
    keep = np.sort(first)
    return grid[keep], pts[keep]


def main():
    import jax
    import jax.numpy as jnp

    from corsair_tpu.eval.registration import register_pairs
    from corsair_tpu.ops.ransac import RansacConfig
    from corsair_tpu.ops.symmetry import SymPoseConfig
    from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor

    rng = np.random.RandomState(0)
    n_queries = 16
    n_lib = 16
    n_pts = 8000
    reg_batch = 8

    extractor = FeatureExtractor(ExtractorConfig())
    params = extractor.init_params(jax.random.PRNGKey(0))

    lib = [make_cloud(rng, n_pts) for _ in range(n_lib)]
    queries = [make_cloud(rng, n_pts) for _ in range(n_queries)]

    sym_cfg = SymPoseConfig(
        k_nn=5, max_corr=0.2, num_sectors=4,
        ransac=RansacConfig(num_hypotheses=4096, sample_size=10,
                            max_corr_dist=0.2),
    )
    cad_idx = np.arange(n_queries) % n_lib
    syms = np.full(n_queries, 4)

    def run_once():
        lib_feats, _ = extractor.extract_batch_np(
            params, [c for c, _ in lib]
        )
        q_feats, _ = extractor.extract_batch_np(
            params, [c for c, _ in queries]
        )
        lib_xyz = [x.astype(np.float32) for _, x in lib]
        q_xyz = [x.astype(np.float32) for _, x in queries]
        results = register_pairs(
            jax.random.PRNGKey(1),
            q_feats, q_xyz, lib_feats, lib_xyz, cad_idx, syms,
            sym_cfg, batch_size=reg_batch,
        )
        return results

    # warmup (compile)
    run_once()

    t0 = time.perf_counter()
    run_once()
    elapsed = time.perf_counter() - t0

    value = n_queries / elapsed
    print(json.dumps({
        "metric": "pclouds/sec (feat+sym-RANSAC registration)",
        "value": round(value, 3),
        "unit": "pclouds/sec",
        "vs_baseline": round(
            value / REFERENCE_BASELINE_PCLOUDS_PER_SEC, 3
        ),
    }))


if __name__ == "__main__":
    main()
