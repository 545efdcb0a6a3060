"""Pallas TPU kernel: bitonic merge-join for coordinate-map tables.

The coordinate manager's fast path (``CoordinateManager(fast_merge=)``)
sorts each level's packed keys ONCE and resolves every kernel-offset
lookup as a merge of two already-sorted sequences (a level shifted by a
constant key delta stays sorted — ``core/sparse.pack_offset_deltas``).
The pure-jnp ``bitonic_merge_join`` is bit-exact but lowers poorly on
TPU: every compare-exchange stage reshapes through HBM. This kernel runs
the whole merge + join for one offset in VMEM:

* bitonic merge of [table ascending | sentinel pad | queries reversed]
  (a bitonic sequence): log2(n) compare-exchange stages, each built from
  two static ``pltpu.roll``s and selects — no reshapes, no HBM traffic;
* nearest-preceding-table propagation as a log-step inclusive max-scan
  that carries (position, key, row) triples — replacing ``lax.cummax`` +
  the data-dependent gather, which Mosaic cannot do;
* compacts the query results to the front IN-KERNEL (bit-decomposed
  log-shift stream compaction) so the output is already in original
  query order — the XLA scatter-back this replaces cost 33-69 ms per
  table at cap 16384 and dominated the coordinate-map build.

Replaces MinkowskiEngine's C++ kernel-map hash lookups
(``model/resunet.py:207-280`` call path) at VMEM speed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SENTINEL_VAL = 0xFFFFFFFF
_QBIT_VAL = 1 << 31


def _merge_join_kernel(n: int, capacity: int, m: int,
                       keys_ref, payload_ref, res_ref):
    keys = keys_ref[:]          # [R, n] uint32, R independent bitonic rows
    payload = payload_ref[:]    # [R, n] uint32: row | (QBIT + query col)
    iota = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)

    # ---- bitonic merge (ascending; ties break by payload so table rows
    # land ahead of their matching queries).
    s = n // 2
    while s >= 1:
        pk_lo = pltpu.roll(keys, n - s, 1)   # = roll by -s
        pk_hi = pltpu.roll(keys, s, 1)
        pp_lo = pltpu.roll(payload, n - s, 1)
        pp_hi = pltpu.roll(payload, s, 1)
        is_low = (iota & s) == 0
        pk = jnp.where(is_low, pk_lo, pk_hi)
        pp = jnp.where(is_low, pp_lo, pp_hi)
        self_gt = (keys > pk) | ((keys == pk) & (payload > pp))
        # (key, payload) pairs are distinct, so partner_gt == ~self_gt;
        # logical blend, not jnp.where: Mosaic cannot select between
        # i1 vectors (lowers via an unsupported i8->i1 truncation)
        take = ~(is_low ^ self_gt)
        keys = jnp.where(take, pk, keys)
        payload = jnp.where(take, pp, payload)
        s //= 2

    # ---- propagate the nearest preceding table element (pos, key, row)
    # with a log-step inclusive max-scan on position.
    qbit = jnp.uint32(_QBIT_VAL)
    is_query = payload >= qbit
    tpos = jnp.where(is_query, -1, iota)
    tkey = jnp.where(is_query, jnp.uint32(0), keys)
    trow = jnp.where(is_query, jnp.uint32(capacity), payload)
    d = 1
    while d < n:
        sp = pltpu.roll(tpos, d, 1)
        sk = pltpu.roll(tkey, d, 1)
        sr = pltpu.roll(trow, d, 1)
        ok = (iota >= d) & (sp > tpos)
        tpos = jnp.where(ok, sp, tpos)
        tkey = jnp.where(ok, sk, tkey)
        trow = jnp.where(ok, sr, trow)
        d *= 2

    match = (tpos >= 0) & (tkey == keys) & (keys != jnp.uint32(_SENTINEL_VAL))
    res = jnp.where(match, trow, jnp.uint32(capacity)).astype(jnp.int32)

    # ---- in-VMEM stream compaction: move query slots to the front in
    # position order (== original query order, since shifted query keys
    # are ascending and merge ties put lower payloads first). Replaces
    # the XLA scatter-back that dominated the coordinate-map build
    # (~33-69 ms per table at cap 16384 vs <1 ms here).
    # Standard SIMD bit-decomposed compaction: each valid item's target
    # is its query rank i; left-shift distance d = pos - i is decomposed
    # into powers of two, LSB first (collision-free because targets are
    # strictly increasing — validated exhaustively in tests).
    qi = jnp.where(is_query, 1, 0)
    cnt = qi
    d = 1
    while d < n:
        sh = pltpu.roll(cnt, d, 1)
        cnt = jnp.where(iota >= d, cnt + sh, cnt)
        d *= 2
    dist = iota - (cnt - qi)       # pos - exclusive_cumsum(is_query)
    valid = qi
    b = 1
    while b < n:
        sv = pltpu.roll(res, n - b, 1)       # roll by -b
        sd = pltpu.roll(dist, n - b, 1)
        sm = pltpu.roll(valid, n - b, 1)
        incoming = (sm != 0) & ((sd & b) != 0) & (iota < n - b)
        keeps = (valid != 0) & ((dist & b) == 0)
        res = jnp.where(incoming, sv, res)
        dist = jnp.where(incoming, sd - b, dist)
        valid = (incoming | keeps).astype(jnp.int32)
        b *= 2
    res_ref[:] = res


@partial(jax.jit,
         static_argnames=("table_capacity", "interpret"))
def merge_join_pallas(sorted_keys, sorted_rows, query_keys,
                      table_capacity: int, interpret: bool = False):
    """Merge-join pre-sorted queries against a pre-sorted table.

    Same contract as ``core.sparse.bitonic_merge_join``: ``sorted_keys``
    uint32 [N] ascending (sentinel padding at the tail), ``sorted_rows``
    int32 [N], ``query_keys`` uint32 [K, M] each row ascending. Returns
    int32 [K, M]: matching table row per query (original query-column
    order), ``table_capacity`` on miss.
    """
    k, m = query_keys.shape
    n_table = sorted_keys.shape[0]
    total = n_table + m
    n = 1 << int(np.ceil(np.log2(total)))
    pad = n - total

    keys = jnp.concatenate([
        jnp.broadcast_to(sorted_keys[None], (k, n_table)),
        jnp.full((k, pad), jnp.uint32(_SENTINEL_VAL)),
        query_keys[:, ::-1],
    ], axis=1)
    qpos = jnp.uint32(_QBIT_VAL) + jnp.arange(m, dtype=jnp.uint32)
    payload = jnp.concatenate([
        jnp.broadcast_to(sorted_rows.astype(jnp.uint32)[None],
                         (k, n_table)),
        jnp.full((k, pad), jnp.uint32(_QBIT_VAL + m)),  # pads -> drop slot
        jnp.broadcast_to(qpos[None, ::-1], (k, m)),
    ], axis=1)

    # Mosaic wants the second-to-last block dim divisible by 8 (or full):
    # pad the offset axis and run 8 independent merges per program (the
    # merge is row-wise — rolls act along axis 1 only).
    row_tile = 8
    kpad = (-k) % row_tile
    if kpad:
        keys = jnp.concatenate([
            keys, jnp.full((kpad, n), jnp.uint32(_SENTINEL_VAL))
        ])
        payload = jnp.concatenate([
            payload, jnp.full((kpad, n), jnp.uint32(_QBIT_VAL + m))
        ])
    kp = k + kpad

    # Live set during the merge/scan loops + double-buffered block IO is
    # ~20 [row_tile, n] u32 arrays (measured 20.8MB at n=32768); raise
    # the scoped VMEM limit above the 16MB default when needed
    # (level-0 joins at cap 16384).
    need = 24 * row_tile * n * 4
    params = None
    if need > 16 * 1024 * 1024:
        params = pltpu.CompilerParams(
            vmem_limit_bytes=min(need, 100 * 1024 * 1024)
        )
    res = pl.pallas_call(
        partial(_merge_join_kernel, n, table_capacity, m),
        compiler_params=params,
        grid=(kp // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kp, n), jnp.int32),
        interpret=interpret,
    )(keys, payload)
    # The kernel compacts query results to the front in original query
    # order — no scatter-back needed, just the slice.
    return res[:k, :m]
