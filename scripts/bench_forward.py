"""Forward-pass micro-benchmark: where does extraction time go?

Times, on the current accelerator, the three candidate costs of the
sparse U-Net forward at bench shapes (16 clouds x 8192 voxels):
gather+einsum sparse convs (per level), the coordinate-map build, and a
gather-free einsum control, plus f32 vs bf16 compute.
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/corsair_jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=5):
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

    from corsair_tpu.nn.layers import sparse_conv

    rng = np.random.RandomState(0)
    B, N, K = 16, 8192, 27

    def bench_conv(cin, cout, n, label, dtype=None):
        feats = jnp.asarray(rng.randn(B, n, cin).astype(np.float32))
        table = jnp.asarray(
            rng.randint(0, n + 1, (B, K, n)).astype(np.int32)
        )
        kernel = jnp.asarray(
            rng.randn(K, cin, cout).astype(np.float32) * 0.1
        )

        @jax.jit
        def run(feats, table):
            return jax.vmap(
                lambda f, t: sparse_conv({"kernel": kernel}, f, t, dtype)
            )(feats, table)

        t = timeit(run, feats, table)
        gb = B * K * n * cin * 4 / 1e9
        print(f"{label:34s} {t*1000:8.2f} ms   gather {gb:5.2f} GB "
              f"-> {gb/t:6.1f} GB/s", flush=True)
        return t

    # the net's actual conv shapes (x = per-level voxel count at bench)
    total = 0.0
    total += bench_conv(1, 32, N, "conv1    1->32   @8192")
    total += 2 * bench_conv(32, 32, N, "block1 conv 32->32 @8192 (x2)")
    total += bench_conv(32, 64, N // 2, "conv2   32->64   @4096")
    total += 2 * bench_conv(64, 64, N // 2, "block2 conv 64x64 @4096 (x2)")
    total += bench_conv(64, 128, N // 8, "conv3   64->128  @1024")
    total += 2 * bench_conv(128, 128, N // 8, "block3 128x128  @1024 (x2)")
    total += bench_conv(128, 256, N // 32, "conv4  128->256  @256")
    total += 2 * bench_conv(256, 256, N // 32, "block4 256x256  @256 (x2)")
    # decoder approx: transpose convs + blocks at rising resolution
    total += bench_conv(256, 128, N // 8, "conv4_tr 256->128 @1024")
    total += 2 * bench_conv(128, 128, N // 8, "block4_tr (x2)")
    total += bench_conv(256, 64, N // 2, "conv3_tr 256->64 @4096")
    total += 2 * bench_conv(64, 64, N // 2, "block3_tr (x2)")
    total += bench_conv(128, 64, N, "conv2_tr 128->64 @8192")
    total += 2 * bench_conv(64, 64, N, "block2_tr (x2)")
    print(f"{'SUM of conv layers':34s} {total*1000:8.2f} ms")

    print("\nbf16 compute:")
    bench_conv(32, 32, N, "block1 conv bf16", jnp.bfloat16)
    bench_conv(64, 64, N // 2, "block2 conv bf16", jnp.bfloat16)

    # control: einsum without gather (is it the gather or the matmul?)
    feats_g = jnp.asarray(rng.randn(B, K, N, 32).astype(np.float32))
    kernel = jnp.asarray(rng.randn(K, 32, 32).astype(np.float32))

    @jax.jit
    def eins(feats_g):
        return jnp.einsum("bknc,kcd->bnd", feats_g,
                          kernel, preferred_element_type=jnp.float32)

    t = timeit(eins, feats_g)
    print(f"{'einsum only (pre-gathered) 32x32':34s} {t*1000:8.2f} ms")


if __name__ == "__main__":
    main()
