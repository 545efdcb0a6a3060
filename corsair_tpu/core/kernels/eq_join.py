"""Pallas TPU kernel: brute-force equality join for coordinate maps.

``out[j] = i where table_keys[i] == query_keys[j]`` (miss -> capacity),
computed as dense compare-reduce sums entirely in VMEM:

    hit_j = sum_i 1[K_i == q_j]        (keys are unique post-dedup)
    idx_j = sum_i 1[K_i == q_j] * i

An alternative to the sort -> bitonic-merge -> cummax -> scatter-back
pipeline of the coordinate manager: O(M*N) dense VPU work, no sorted
table, no inverse permutations, original row indices come out directly.

Measured on v5e (16 clouds x 8k voxels, 4 levels at equal caps) it
LOSES to the Pallas merge-join builder: build 473 vs 360 ms, extraction
1084 vs 986 ms — level-0 self-join scale (27 x 8192 queries x 8192 keys
x 16 clouds ~ 29 G compares) exceeds what the scatter-free structure
saves. Kept as the opt-in `CORSAIR_EQ_JOIN=1` path: it is the simpler
primitive, robust to unsorted/duplicate-free inputs of any order, and
the right building block if level capacities ever shrink per level.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SENT = 0xFFFFFFFF


def _eq_join_kernel(n: int, capacity: int, chunk: int,
                    tk_ref, q_ref, out_ref):
    q = q_ref[:]                          # [T, 1] uint32
    acc_idx = jnp.zeros(q.shape, jnp.float32)
    acc_hit = jnp.zeros(q.shape, jnp.float32)
    for c in range(0, n, chunk):
        tk = tk_ref[0, c : c + chunk].reshape(1, chunk)     # [1, chunk]
        eq = ((q == tk) & (tk != jnp.uint32(_SENT))).astype(jnp.float32)
        # tpu.iota must be integer-typed; cast after
        ids = jax.lax.broadcasted_iota(
            jnp.int32, (1, chunk), 1
        ).astype(jnp.float32) + jnp.float32(c)
        acc_idx = acc_idx + jnp.sum(eq * ids, axis=1, keepdims=True)
        acc_hit = acc_hit + jnp.sum(eq, axis=1, keepdims=True)
    out_ref[:] = jnp.where(
        acc_hit > 0.5, acc_idx, jnp.float32(capacity)
    ).astype(jnp.int32)


@partial(jax.jit, static_argnames=("table_capacity", "tile", "chunk",
                                   "interpret"))
def equality_join_pallas(table_keys, query_keys, table_capacity: int,
                         tile: int = 512, chunk: int = 2048,
                         interpret: bool = False):
    """``table_keys`` uint32 [N] (ANY order, unique except sentinel
    padding); ``query_keys`` uint32 [K, M] (any order; sentinel rows
    miss). Returns int32 [K, M]: the matching ORIGINAL table row per
    query, ``table_capacity`` on miss."""
    try:
        interpret = interpret or jax.default_backend() == "cpu"
    except RuntimeError:
        interpret = True

    k, m = query_keys.shape
    n = table_keys.shape[0]
    chunk = min(chunk, n)
    npad = (-n) % chunk
    if npad:  # sentinel-padded tail never matches
        table_keys = jnp.pad(table_keys, (0, npad),
                             constant_values=np.uint32(_SENT))
        n += npad

    flat = query_keys.reshape(-1, 1)                  # [K*M, 1]
    pad = (-(k * m)) % tile
    flat = jnp.pad(flat, ((0, pad), (0, 0)),
                   constant_values=np.uint32(_SENT))
    n_tiles = (k * m + pad) // tile

    out = pl.pallas_call(
        partial(_eq_join_kernel, n, table_capacity, chunk),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * m + pad, 1), jnp.int32),
        interpret=interpret,
    )(table_keys.reshape(1, n), flat)
    return out[: k * m, 0].reshape(k, m)
