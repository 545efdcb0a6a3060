"""A/B: banded one-hot MXU conv vs the XLA gather-GEMM sparse conv.

Builds the deployed manager's flat tables for a bench-like 16-cloud
batch of SORTED synthetic surface clouds (per-cloud (x, y, z) lexsort
makes every level layout monotone per kernel offset — the property the
banded kernel needs; see core/kernels/banded_conv.py), reports the
band-coverage plan per table, then times both conv formulations on
level-0/1-shaped layers of ResUNetBN2C and checks parity.

Usage: python scripts/bench_banded_conv.py [--cap 16384 --batch 16]
"""

import argparse
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/corsair_jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_cloud(rng, n_pts=15000, voxel=0.03):
    pts = rng.randn(n_pts, 3).astype(np.float32)
    pts /= np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-9)
    pts *= 0.9 * (1.0 + rng.randn(n_pts, 1).astype(np.float32) * 0.03)
    grid = np.floor(pts / voxel).astype(np.int32)
    _, first = np.unique(grid, axis=0, return_index=True)
    g = grid[np.sort(first)]
    order = np.lexsort((g[:, 2], g[:, 1], g[:, 0]))
    return g[order]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--cap", type=int, default=16384)
    p.add_argument("--bands", type=int, nargs="+",
                   default=[512, 640, 1024])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from corsair_tpu.core.coordmap import flatten_unet_maps
    from corsair_tpu.core.kernels.banded_conv import (
        banded_conv_pallas,
        banded_plan,
    )
    from corsair_tpu.core.sparse import SENTINEL, SparseGrid
    from corsair_tpu.nn.layers import sparse_conv
    from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor

    rng = np.random.RandomState(0)
    B, CAP = args.batch, args.cap
    clouds = [make_cloud(rng) for _ in range(B)]
    ex = FeatureExtractor(ExtractorConfig())
    coords, valid = ex.pad_clouds(clouds, CAP)
    coords, valid = jnp.asarray(coords), jnp.asarray(valid)
    manager = ex.manager

    @jax.jit
    def build(coords, valid):
        def build_one(ci, vi):
            g = SparseGrid(
                coords=jnp.where(vi[:, None], ci, SENTINEL),
                batch=jnp.where(vi, 0, 1).astype(jnp.int32),
                feats=vi[:, None].astype(jnp.float32),
                valid=vi, stride=1, num_batches=1,
            )
            return manager.build(g)
        return flatten_unet_maps(jax.vmap(build_one)(coords, valid), B)

    maps = build(coords, valid)

    INNER = 20   # amortize the ~30 ms tunnel RTT per dispatch

    def timeit(fn, *a, iters=5):
        # input perturbed per step so XLA can't CSE the repeats
        def run(*args):
            def body(i, acc):
                return acc + jnp.sum(
                    fn(args[0] + i * 1e-12, *args[1:])
                )
            return jax.lax.fori_loop(0, INNER, body, 0.0)

        red = jax.jit(run)
        np.asarray(red(*a))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            np.asarray(red(*a))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2] * 1000 / INNER

    # level-0-shaped (Cin=32 block conv) and level-1-shaped (Cin=64)
    cases = [
        ("L0 self 32->32", maps.levels[0].self_table, 32, 32),
        ("L1 down 32->64", maps.levels[1].down_table, 32, 64),
        ("L1 self 64->64", maps.levels[1].self_table, 64, 64),
        ("L1 up 64->64  ", maps.levels[1].up_table, 64, 64),
    ]
    for name, table, cin, cout in cases:
        n_in = int(np.asarray(table).max())
        k = table.shape[0]
        feats = jnp.asarray(
            rng.randn(n_in, cin).astype(np.float32)
        )
        kernel = jnp.asarray(
            (rng.randn(k, cin, cout) * 0.1).astype(np.float32)
        )
        band = None
        for b in args.bands:
            starts, anyv, ok = banded_plan(table, n_in, b)
            if bool(ok):
                band = b
                break
        if band is None:
            print(f"{name}: no band in {args.bands} covers — fallback")
            continue
        valid_tiles = int(np.asarray(anyv.max(axis=0)).sum())
        n_tiles = anyv.shape[1]
        print(f"{name}: band={band} "
              f"valid tiles {valid_tiles}/{n_tiles}")
        out_g = sparse_conv({"kernel": kernel}, feats, table)
        t_g = timeit(
            lambda f: sparse_conv({"kernel": kernel}, f, table), feats
        )
        for exact in (True, False):
            out_b = banded_conv_pallas(feats, table, kernel, starts,
                                       anyv, band=band, exact=exact)
            d = float(jnp.max(jnp.abs(out_g - out_b)))
            scale = float(jnp.max(jnp.abs(out_g)))
            t_b = timeit(
                lambda f: banded_conv_pallas(
                    f, table, kernel, starts, anyv, band=band,
                    exact=exact),
                feats,
            )
            tag = "exact" if exact else "bf16 "
            print(f"  gather {t_g:7.1f} ms   banded[{tag}] "
                  f"{t_b:7.1f} ms   delta {d:.2e} "
                  f"(rel {d / max(scale, 1e-9):.2e})")


if __name__ == "__main__":
    main()
