"""Coordinate-manager micro-benchmark: fast-merge vs generic sort-join.

Times (a) the full extraction, (b) maps-build only, (c) a single
merge-join vs sort-join primitive, on the current accelerator.
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/corsair_jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp

    from corsair_tpu.core.coordmap import CoordinateManager
    from corsair_tpu.core.sparse import (
        SENTINEL,
        SparseGrid,
        bitonic_merge_join,
        lookup_merge_compact,
        pack_offset_deltas,
        shifted_query_keys,
        sort_table_compact,
    )
    from corsair_tpu.pipeline import ExtractorConfig, FeatureExtractor

    rng = np.random.RandomState(0)
    B, cap = 16, 8192

    extractor = FeatureExtractor(ExtractorConfig())
    params = extractor.init_params(jax.random.PRNGKey(0))
    clouds = []
    for _ in range(B):
        pts = rng.randn(8000, 3).astype(np.float32) * 0.5
        g = np.floor(pts / 0.03).astype(np.int32)
        _, first = np.unique(g, axis=0, return_index=True)
        clouds.append(g[np.sort(first)])
    coords, valid = extractor.pad_clouds(clouds, cap)
    coords, valid = jnp.asarray(coords), jnp.asarray(valid)

    for fast in (False, True):
        manager = CoordinateManager(fast_merge=fast)

        @jax.jit
        def build_only(coords, valid):
            def one(ci, vi):
                g = SparseGrid(
                    coords=jnp.where(vi[:, None], ci, SENTINEL),
                    batch=jnp.where(vi, 0, 1).astype(jnp.int32),
                    feats=vi[:, None].astype(jnp.float32),
                    valid=vi, stride=1, num_batches=1,
                )
                m = manager.build(g)
                return [lv.self_table[0, :8] for lv in m.levels]

            return jax.vmap(one)(coords, valid)

        t_build = timeit(build_only, coords, valid)
        t_full = timeit(
            lambda c, v: extractor.extract_padded(params, c, v, manager),
            coords, valid,
        )
        print(f"fast_merge={fast}: build={t_build*1000:7.1f} ms  "
              f"extract={t_full*1000:7.1f} ms", flush=True)

    # primitive-level: one level-0 self-table join, batched over clouds
    keys_list = []
    for i in range(B):
        g = SparseGrid(
            coords=coords[i], batch=jnp.zeros(cap, jnp.int32),
            feats=valid[i][:, None].astype(jnp.float32),
            valid=valid[i], stride=1, num_batches=1,
        )
        keys_list.append(g.keys())
    kb = [jnp.stack([k[i] for k in keys_list]) for i in range(4)]
    offs = CoordinateManager().offsets
    deltas = pack_offset_deltas(offs, 1)

    @jax.jit
    def join_merge(kb0, kb1, kb2, kb3):
        def one(b, x, y, z):
            sk, srows = sort_table_compact((b, x, y, z))
            qk = shifted_query_keys(sk, deltas)
            return bitonic_merge_join(sk, srows, qk, cap)

        return jax.vmap(one)(kb0, kb1, kb2, kb3)

    t_m = timeit(join_merge, *kb)
    print(f"merge-join level0 (27 offsets x {B} clouds): "
          f"{t_m*1000:7.1f} ms", flush=True)

    from corsair_tpu.core.kernels.merge_join import merge_join_pallas

    @jax.jit
    def join_merge_pallas(kb0, kb1, kb2, kb3):
        def one(b, x, y, z):
            sk, srows = sort_table_compact((b, x, y, z))
            qk = shifted_query_keys(sk, deltas)
            return merge_join_pallas(sk, srows, qk, cap)

        return jax.vmap(one)(kb0, kb1, kb2, kb3)

    t_p = timeit(join_merge_pallas, *kb)
    print(f"pallas merge-join level0 (27 x {B}):          "
          f"{t_p*1000:7.1f} ms", flush=True)
    same = np.array_equal(np.asarray(join_merge_pallas(*kb)),
                          np.asarray(join_merge(*kb)))
    print(f"    pallas == jnp merge: {same}", flush=True)

    # old-path equivalent: lookup_merge_compact with 27N queries
    from corsair_tpu.core.coordmap import _keys, _offset_queries

    @jax.jit
    def join_old(kb0, kb1, kb2, kb3):
        def one(b, x, y, z):
            coords_i = jnp.stack([x, y, z], 1).astype(jnp.int32)
            v = b != SENTINEL
            qkeys = _offset_queries(coords_i, b.astype(jnp.int32), v,
                                    jnp.asarray(offs), 1)
            return lookup_merge_compact((b, x, y, z), qkeys, cap).reshape(
                27, cap
            )

        return jax.vmap(one)(kb0, kb1, kb2, kb3)

    t_o = timeit(join_old, *kb)
    print(f"sort-join  level0 (27 offsets x {B} clouds): "
          f"{t_o*1000:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
