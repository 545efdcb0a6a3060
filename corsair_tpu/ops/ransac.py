"""Massively parallel correspondence-RANSAC.

TPU-native replacement for Open3D's
``registration_ransac_based_on_correspondence`` (C++/OpenMP,
``utils/eval_pose.py:82-100``). Instead of a sequential hypothesis loop,
all hypotheses are drawn, solved (batched quaternion Kabsch) and scored
in one program; the winner is chosen by (inlier count, -rmse), mirroring
Open3D's (fitness, -inlier_rmse) ranking. A final refit on the winner's
inliers sharpens the pose.

Scoring is two-stage to stay HBM-bandwidth-friendly:
1. every hypothesis is scored on a strided subsample of the
   correspondences (``prescore_subset``), chunked over hypotheses;
2. the top ``finalists`` hypotheses per chunk are exactly rescored on the
   full correspondence set.
With 4096+ subsampled pairs the stage-1 inlier-fraction estimate is
within ~1.5% absolute, so the true winner survives to stage 2 with
near-certainty while stage-1 traffic drops ~10x.

Fully deterministic under a ``jax.random`` key.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from corsair_tpu.ops.kabsch import (
    kabsch_quaternion_lanes,
    kabsch_umeyama,
)
from corsair_tpu.ops.knn import small_topk_min


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    num_hypotheses: int = 4096
    sample_size: int = 10          # ransac_n=10, utils/eval_pose.py:96
    max_corr_dist: float = 0.2     # evaluation.py Config.max_corr
    refine_iters: int = 2          # refits on inliers of the winner
    # One chunk covering all hypotheses: the Pallas scoring kernel tiles
    # internally, so chunking only added sequential dispatch steps.
    score_chunk: int = 4096        # hypotheses pre-scored per step
    prescore_subset: int = 4096    # correspondences used in stage 1
    finalists_per_chunk: int = 64  # stage-2 candidates per chunk


def _score_all(T, src, dst, valid, max_dist2):
    """Inlier count + sum of squared inlier residuals for one pose."""
    moved = src @ T[:3, :3].T + T[:3, 3]
    d2 = jnp.sum((moved - dst) ** 2, axis=1)
    inl = (d2 <= max_dist2) & valid
    count = jnp.sum(inl)
    sse = jnp.sum(jnp.where(inl, d2, 0.0))
    return count, sse


def _pack_score(count, sse):
    """(count, -rmse) ranking packed into one float."""
    rmse = jnp.sqrt(sse / jnp.maximum(count, 1))
    return count.astype(jnp.float32) - rmse / (rmse + 1.0)


@partial(jax.jit, static_argnames=("config",))
def ransac_correspondences(key, src, dst, valid, config: RansacConfig):
    """RANSAC over an explicit correspondence set.

    ``src``/``dst``: [M, 3] matched point pairs (identity correspondence
    list, as the reference builds via ``find_kcorr``); ``valid``: [M] mask
    for padding. Returns (T [4,4], inlier_count, rmse).
    """
    m = src.shape[0]
    h = config.num_hypotheses
    s = config.sample_size
    chunk = min(config.score_chunk, h)
    n_chunks = -(-h // chunk)
    h_padded = n_chunks * chunk
    max_d2 = jnp.float32(config.max_corr_dist**2)

    # Sample uniformly over ALL rows; invalid picks get zero weight in
    # the Kabsch solve. This avoids sorting the validity mask per call
    # (a 40k bitonic argsort x 9 candidates dominated the RANSAC cost);
    # with the high valid fractions of real correspondence sets the
    # effective hypothesis size is essentially unchanged.
    raw = jax.random.randint(key, (h_padded, s), 0, 2**31 - 1)
    samp = raw % m                                   # [h_padded, s]

    # Stage-1 scoring subset: strided rows, invalid ones masked in score.
    msub = min(config.prescore_subset, m)
    sub_idx = (jnp.arange(msub) * m) // msub
    src_sub = src[sub_idx]
    dst_sub = dst[sub_idx]
    valid_sub = valid[sub_idx]

    n_final = min(config.finalists_per_chunk, chunk)

    from corsair_tpu.core import interpret_mode

    try:
        use_pallas = (jax.default_backend() != "cpu"
                      or interpret_mode.forced())
    except RuntimeError:
        use_pallas = False
    interp = interpret_mode.interpret_flag() if use_pallas else False

    # One wide-row gather (src|dst|valid packed, 28-byte rows) instead
    # of three 12/4-byte row gathers — see ransac_correspondences_multi.
    packed = jnp.concatenate([
        src.astype(jnp.float32), dst.astype(jnp.float32),
        valid.astype(jnp.float32)[:, None],
    ], axis=1)                                       # [M, 7]

    def chunk_step(samp_chunk):
        g = packed[samp_chunk]                       # [chunk, s, 7]
        src_h = g[..., :3]
        dst_h = g[..., 3:6]
        w_h = g[..., 6]                              # zero-out invalid
        Ts = kabsch_quaternion_lanes(src_h, dst_h, w_h)
        if use_pallas:
            from corsair_tpu.core.kernels.ransac_score import (
                ransac_score_pallas,
            )

            counts, sses = ransac_score_pallas(
                Ts, src_sub, dst_sub, valid_sub, config.max_corr_dist,
                interpret=interp,
            )
        else:
            counts, sses = jax.vmap(
                lambda T: _score_all(T, src_sub, dst_sub, valid_sub,
                                     max_d2)
            )(Ts)
        score = _pack_score(counts, sses)
        # top finalists of this chunk
        idx, vals = small_topk_min(-score[None, :], n_final)
        return Ts[idx[0]], -vals[0]

    Ts_fin, scores_fin = jax.lax.map(
        chunk_step, samp.reshape(n_chunks, chunk, s)
    )  # [n_chunks, n_final, 4, 4]
    Ts_fin = Ts_fin.reshape(-1, 4, 4)

    # Stage 2: exact rescoring of all finalists on the full set.
    counts2, sses2 = jax.vmap(
        lambda T: _score_all(T, src, dst, valid, max_d2)
    )(Ts_fin)
    best = jnp.argmax(_pack_score(counts2, sses2))
    T_best = Ts_fin[best]

    # Refinement: refit on the winner's inliers (hard weights), repeat.
    def refine(T, _):
        moved = src @ T[:3, :3].T + T[:3, 3]
        d2 = jnp.sum((moved - dst) ** 2, axis=1)
        w = ((d2 <= max_d2) & valid).astype(jnp.float32)
        T_new = kabsch_umeyama(src, dst, w)
        # Keep refit only if it does not lose inliers.
        c_old, _ = _score_all(T, src, dst, valid, max_d2)
        c_new, _ = _score_all(T_new, src, dst, valid, max_d2)
        return jnp.where(c_new >= c_old, T_new, T), None

    T_final, _ = jax.lax.scan(
        refine, T_best, None, length=config.refine_iters
    )
    c_fin, sse_fin = _score_all(T_final, src, dst, valid, max_d2)
    rmse_fin = jnp.sqrt(sse_fin / jnp.maximum(c_fin, 1))
    return T_final, c_fin, rmse_fin


@partial(jax.jit, static_argnames=("config",))
def ransac_correspondences_multi(key, src, dsts, valids,
                                 config: RansacConfig):
    """C candidate RANSACs sharing one hypothesis/scoring stream.

    ``src``: [M, 3] source side shared by every candidate (``sym_pose``'s
    repeated-source correspondence layout, ``utils/eval_pose.py:74-79``);
    ``dsts``: [C, M, 3] per-candidate targets; ``valids``: [C, M].
    Returns (Ts [C, 4, 4], counts [C], rmses [C]).

    Semantically C independent ``ransac_correspondences`` runs, but the
    candidate axis is folded into the hypothesis stream: one sampling
    draw, one batched Kabsch over C*H hypotheses, one Pallas scoring
    kernel over a (C, H/tile) grid, per-candidate finalists/refit. This
    keeps the chip saturated where ``lax.map`` serialized 9 dispatches
    (VERDICT r1 item 4).
    """
    c, m = valids.shape
    h = config.num_hypotheses
    s = config.sample_size
    max_d2 = jnp.float32(config.max_corr_dist**2)

    # One [H, s] index draw SHARED by all candidates (indices are
    # data-independent, so sharing loses nothing statistically), and one
    # wide-row gather: src + every candidate's dst + valids packed into
    # [M, 3+4C] rows (~160 B at C=9) instead of 2C+1 separate 12-byte
    # row gathers. Tiny-row random gathers ran at <1 GB/s effective and
    # were the profiled cost center of the whole RANSAC (73 of 146 ms);
    # DMA efficiency scales with row width.
    raw = jax.random.randint(key, (h, s), 0, 2**31 - 1)
    samp = raw % m                                    # [H, s]

    packed = jnp.concatenate([
        src.astype(jnp.float32),
        jnp.moveaxis(dsts, 0, 1).reshape(m, 3 * c),
        valids.T.astype(jnp.float32),
    ], axis=1)                                        # [M, 3+4C]
    g = packed[samp]                                  # [H, s, 3+4C]
    src_h = g[..., :3]                                # [H, s, 3]
    dst_h = jnp.moveaxis(
        g[..., 3 : 3 + 3 * c].reshape(h, s, c, 3), 2, 0
    )                                                 # [C, H, s, 3]
    w_h = jnp.moveaxis(g[..., 3 + 3 * c :], 2, 0)     # [C, H, s]
    src_hc = jnp.broadcast_to(src_h[None], (c, h, s, 3))
    Ts = kabsch_quaternion_lanes(
        src_hc.reshape(c * h, s, 3), dst_h.reshape(c * h, s, 3),
        w_h.reshape(c * h, s),
    ).reshape(c, h, 4, 4)

    # Stage 1: strided-subsample scoring, all candidates in one stream.
    msub = min(config.prescore_subset, m)
    sub_idx = (jnp.arange(msub) * m) // msub
    src_sub = src[sub_idx]
    dst_subs = dsts[:, sub_idx]
    valid_subs = valids[:, sub_idx]

    from corsair_tpu.core import interpret_mode

    try:
        use_pallas = (jax.default_backend() != "cpu"
                      or interpret_mode.forced())
    except RuntimeError:
        use_pallas = False
    if use_pallas:
        from corsair_tpu.core.kernels.ransac_score import (
            ransac_score_matmul_pallas,
        )

        counts, sses = ransac_score_matmul_pallas(
            Ts, src_sub, dst_subs, valid_subs, config.max_corr_dist,
            interpret=interpret_mode.interpret_flag(),
        )
    else:
        counts, sses = jax.vmap(
            lambda Tc, d, v: jax.vmap(
                lambda T: _score_all(T, src_sub, d, v, max_d2)
            )(Tc)
        )(Ts, dst_subs, valid_subs)
    score = _pack_score(counts, sses)                 # [C, H]

    # Per-candidate finalists, exact rescore on the full set.
    n_final = min(config.finalists_per_chunk, h)
    fin_idx, _ = small_topk_min(-score, n_final)      # [C, F]
    Ts_fin = jnp.take_along_axis(
        Ts, fin_idx[:, :, None, None], axis=1
    )                                                 # [C, F, 4, 4]
    counts2, sses2 = jax.vmap(
        lambda Tc, d, v: jax.vmap(
            lambda T: _score_all(T, src, d, v, max_d2)
        )(Tc)
    )(Ts_fin, dsts, valids)
    best = jnp.argmax(_pack_score(counts2, sses2), axis=1)  # [C]
    T_best = jnp.take_along_axis(
        Ts_fin, best[:, None, None, None], axis=1
    )[:, 0]                                           # [C, 4, 4]

    # Per-candidate inlier refit (same rule as the single path).
    def refine_c(T, dst, valid):
        def refine(Tc, _):
            moved = src @ Tc[:3, :3].T + Tc[:3, 3]
            d2 = jnp.sum((moved - dst) ** 2, axis=1)
            w = ((d2 <= max_d2) & valid).astype(jnp.float32)
            T_new = kabsch_umeyama(src, dst, w)
            c_old, _ = _score_all(Tc, src, dst, valid, max_d2)
            c_new, _ = _score_all(T_new, src, dst, valid, max_d2)
            return jnp.where(c_new >= c_old, T_new, Tc), None

        T_fin, _ = jax.lax.scan(refine, T, None,
                                length=config.refine_iters)
        cnt, sse = _score_all(T_fin, src, dst, valid, max_d2)
        return T_fin, cnt, jnp.sqrt(sse / jnp.maximum(cnt, 1))

    return jax.vmap(refine_c)(T_best, dsts, valids)
