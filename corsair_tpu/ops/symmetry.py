"""Symmetry-aided registration: sector cut + cyclic-shift RANSAC search.

TPU-native re-design of ``utils/symmetry.py`` (``symmetric_cut4``
``:182-259``, ``sym_pose`` ``:262-358``). The reference's data-dependent
rejection loops and try/except fallback become masked fixed-iteration
computation:

* ``symmetric_cut``: all ``max_sample`` candidate KMeans fits run as one
  vmap; acceptance (inter-center distance > 0.15 > max cluster error) is a
  mask; the winner minimizes the ratio-variance among accepted fits; zero
  accepted fits -> ``ok=False`` (the reference's exception path).
* ``sym_pose``: 1 vanilla RANSAC + S sector-shift RANSACs (S = 8 for K=4
  including the reflected pass, S = 2 for K=2) all run as one vmapped
  RANSAC batch; Chamfer scores select the winner; ``ok=False`` falls back
  to the vanilla result.

The number of sectors K is static per call: callers partition queries into
sym>=2 (K=4) and sym<2 (K=2) groups (``utils/symmetry.py:292-298``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from corsair_tpu.ops.chamfer import _min_nn_dists
from corsair_tpu.ops.correspond import find_kcorr_per_sector
from corsair_tpu.ops.kmeans import kmeans_lloyd, kmeans_predict
from corsair_tpu.ops.ransac import (
    RansacConfig,
    ransac_correspondences,
    ransac_correspondences_multi,
)

_BIG = jnp.float32(1e30)


@dataclasses.dataclass(frozen=True)
class SymPoseConfig:
    k_nn: int = 5                   # evaluation.py Config.k_nn
    max_corr: float = 0.2           # evaluation.py Config.max_corr
    num_sectors: int = 4            # 4 if sym >= 2 else 2
    max_sample: int = 100           # symmetric_cut4 candidate fits
    rank_window: int = 50           # local_rank < 50, utils/symmetry.py:214
    center_dist_thresh: float = 0.15
    cluster_err_thresh: float = 0.15
    kmeans_iters: int = 25
    kmeans_restarts: int = 10
    ransac: RansacConfig = RansacConfig(num_hypotheses=4096, sample_size=10)
    # Fold the S+1 candidate RANSACs into one hypothesis/scoring stream
    # (ransac_correspondences_multi): one sampling draw, one batched
    # Kabsch, one Pallas scoring grid over (candidates, hypothesis
    # tiles). False falls back to a serial lax.map (one dispatch chain
    # per candidate) — kept for A/B measurement.
    fold_candidates: bool = True

    @property
    def num_shifts(self) -> int:
        # 4 cyclic + 4 reflected-cyclic for K=4; 2 cyclic for K=2
        return 2 * self.num_sectors if self.num_sectors == 4 else 2


def shift_permutations(num_sectors: int) -> np.ndarray:
    """``[S, K]``: target sector for each source sector under shift s.

    Matches the reference's pop/append rotation of ``pos_masks``
    (``utils/symmetry.py:319-320``) plus the reflected order [0,3,2,1]
    second pass for K=4 (``:326-328``).
    """
    k = num_sectors
    perms = [[(j + s) % k for j in range(k)] for s in range(k if k == 4 else 2)]
    if k == 4:
        refl = [0, 3, 2, 1]
        perms += [[refl[(j + s) % 4] for j in range(4)] for s in range(4)]
    return np.asarray(perms, np.int32)


@partial(jax.jit, static_argnames=("config",))
def symmetric_cut(key, feat, xyz, valid, config: SymPoseConfig):
    """Partition a cloud into K cyclically-ordered symmetric sectors.

    Returns (sector [N] int32 in [0, K), ok bool). Parity with
    ``symmetric_cut4`` (``utils/symmetry.py:182-259``): candidate seed
    points come from feature-space neighborhoods; the accepted KMeans model
    with minimal sector-size variance wins; sectors are cyclically ordered
    by inter-center distances from center 0.
    """
    n = xyz.shape[0]
    K = config.num_sectors
    W = config.rank_window
    n_valid = jnp.maximum(jnp.sum(valid), 1)

    key_pts, key_km = jax.random.split(key)
    raw = jax.random.randint(key_pts, (config.max_sample,), 0, 2**31 - 1)
    order = jnp.argsort(~valid)
    cand = order[raw % n_valid]  # random valid seed points

    km_keys = jax.random.split(key_km, config.max_sample)

    def one_candidate(seed_idx, km_key):
        # feature-space neighborhood of the seed: top-W closest features
        d = jnp.linalg.norm(feat - feat[seed_idx][None, :], axis=1)
        d = jnp.where(valid, d, _BIG)
        _, nn_idx = jax.lax.top_k(-d, W)
        nns = xyz[nn_idx]
        nns_valid = d[nn_idx] < _BIG / 2
        centers, _, _ = kmeans_lloyd(
            km_key, nns, nns_valid, K,
            iters=config.kmeans_iters, n_init=config.kmeans_restarts,
        )
        # acceptance statistics
        cdist = jnp.linalg.norm(
            centers[None, :, :] - centers[:, None, :], axis=2
        )
        cdist = cdist + jnp.eye(K) * 100.0
        labels_all = kmeans_predict(centers, xyz)
        ratios = jnp.array([
            jnp.sum((labels_all == i) & valid) / n_valid for i in range(K)
        ])
        nn_label = kmeans_predict(centers, nns)
        err = jnp.array([
            jnp.sum(
                jnp.where(
                    (nn_label == i) & nns_valid,
                    jnp.linalg.norm(nns - centers[i], axis=1), 0.0,
                )
            ) / jnp.maximum(jnp.sum((nn_label == i) & nns_valid), 1)
            for i in range(K)
        ])
        accept = (cdist.min() > config.center_dist_thresh) & (
            jnp.max(err) < config.cluster_err_thresh
        )
        score = jnp.sqrt(jnp.var(ratios))
        return centers, accept, score

    centers_all, accepts, scores = jax.vmap(one_candidate)(cand, km_keys)
    scores = jnp.where(accepts, scores, _BIG)
    best = jnp.argmin(scores)
    ok = accepts[best]
    centers = centers_all[best]

    # cyclic sector ordering (utils/symmetry.py:238-257)
    cdist = jnp.linalg.norm(
        centers[None, :, :] - centers[:, None, :], axis=2
    ) + jnp.eye(K) * 100.0
    labels = kmeans_predict(centers, xyz)
    if K == 2:
        # K=2 ordering is the identity (utils/symmetry.py:249-250).
        # (Also avoids a constant-index scatter that crashes the XLA TPU
        # scatter emitter: scatter_emitter.cc operand_indices check.)
        return labels.astype(jnp.int32), ok
    rank_centers = jnp.argsort(cdist[0, 1:]).astype(jnp.int32)
    label_order = jnp.stack([
        jnp.int32(0),
        rank_centers[0] + 1,
        rank_centers[2] + 1,
        rank_centers[1] + 1,
    ])
    # sector[i] = position of labels[i] in label_order
    inv = jnp.zeros((K,), jnp.int32).at[label_order].set(
        jnp.arange(K, dtype=jnp.int32)
    )
    sector = inv[labels]
    return sector, ok


@partial(jax.jit, static_argnames=("config", "chunk"))
def sym_pose(key, baseF, xyz0, v0, posF, xyz1, v1,
             config: SymPoseConfig, chunk: int = 1024):
    """Symmetry-aided pose for one (query, CAD) pair.

    Returns (T_best, cd_best, T_ransac, cd_ransac, sym_success) — the same
    5-tuple as ``sym_pose`` (``utils/symmetry.py:262-358``), fully jitted.
    """
    n0 = xyz0.shape[0]
    K = config.num_sectors
    S = config.num_shifts
    k_nn = config.k_nn
    rcfg = dataclasses.replace(
        config.ransac, max_corr_dist=config.max_corr
    )

    k_cut0, k_cut1, k_r = jax.random.split(key, 3)
    r_keys = jax.random.split(k_r, S + 1)

    # ---- symmetric sector cuts. Batch the two 100-candidate KMeans
    # fits into one device program only when the two clouds share a
    # padded capacity — the deployed register_pairs path pads query and
    # CAD sides to INDEPENDENT caps (eval/registration.py), where a
    # stacked call would be a shape error.
    if baseF.shape == posF.shape and v0.shape == v1.shape:
        sec_b, ok_b = jax.vmap(
            lambda kk, F, X, V: symmetric_cut(kk, F, X, V, config)
        )(jnp.stack([k_cut0, k_cut1]), jnp.stack([baseF, posF]),
          jnp.stack([xyz0, xyz1]), jnp.stack([v0, v1]))
        sec0, sec1 = sec_b[0], sec_b[1]
        sym_ok = ok_b[0] & ok_b[1]
    else:
        sec0, ok0 = symmetric_cut(k_cut0, baseF, xyz0, v0, config)
        sec1, ok1 = symmetric_cut(k_cut1, posF, xyz1, v1, config)
        sym_ok = ok0 & ok1

    # ---- one fused distance pass: slot 0 = GLOBAL top-k (the vanilla
    # RANSAC correspondences, utils/eval_pose.py:48-79), slots 1..K =
    # per-sector top-k reused by every cyclic shift. Computing both from
    # one d2 tile saves the second full feature-distance kernel the
    # round-2 pipeline paid (VERDICT r2 weak #2).
    all_idx, all_okm = find_kcorr_per_sector(
        baseF, posF, sec1, K, k_nn, v1=v1, chunk=chunk,
        include_global=True,
    )  # [N0, K+1, k]
    sec_idx, sec_okm = all_idx[:, 1:], all_okm[:, 1:]   # [N0, K, k]

    # vanilla RANSAC correspondences: every source point repeated k
    # times (utils/eval_pose.py:74-79); source side shared across the
    # S+1 RANSAC candidates instead of stacking [S+1, N0*k, 3] copies.
    src_shared = jnp.repeat(xyz0, k_nn, axis=0)
    dst_all = xyz1[all_idx[:, 0].reshape(-1)]
    cvalid = jnp.repeat(v0, k_nn) & all_okm[:, 0].reshape(-1)

    perms = jnp.asarray(shift_permutations(K))  # [S, K]

    def shift_corr(perm):
        tgt_sector = perm[sec0]                       # [N0]
        rows = jnp.arange(n0)
        d_idx = sec_idx[rows, tgt_sector]             # [N0, k]
        d_ok = sec_okm[rows, tgt_sector]              # [N0, k]
        dsts = xyz1[d_idx.reshape(-1)]
        vv = jnp.repeat(v0, k_nn) & d_ok.reshape(-1)
        return dsts, vv

    dsts_s, vs_s = jax.vmap(shift_corr)(perms)        # [S, N0*k, 3]

    # stack vanilla + shift target sides into one RANSAC batch
    dsts = jnp.concatenate([dst_all[None], dsts_s], axis=0)
    vs = jnp.concatenate([cvalid[None], vs_s], axis=0)

    if config.fold_candidates:
        Ts, _, _ = ransac_correspondences_multi(
            k_r, src_shared, dsts, vs, rcfg
        )
    else:
        def one_candidate(args):
            kk, d, v = args
            T, cnt, rmse = ransac_correspondences(kk, src_shared, d, v,
                                                  rcfg)
            return T

        Ts = jax.lax.map(one_candidate, (r_keys, dsts, vs))

    # ...then all candidates' Chamfer scores in one batched chunked pass
    # (1-direction, utils/preprocess.py:67-70).
    def cd(T):
        moved = xyz0 @ T[:3, :3].T + T[:3, 3]
        dmin = _min_nn_dists(moved, xyz1, v0, v1, chunk)
        return jnp.sum(dmin) / jnp.maximum(jnp.sum(v0), 1)

    cds = jax.vmap(cd)(Ts)

    T_ransac = Ts[0]
    cd_ransac = cds[0]

    cds_shift = jnp.where(sym_ok, cds[1:], _BIG)
    best_shift = jnp.argmin(cds_shift)
    use_shift = cds_shift[best_shift] < cd_ransac
    T_best = jnp.where(use_shift, Ts[1 + best_shift], T_ransac)
    cd_best = jnp.minimum(cds_shift[best_shift], cd_ransac)
    return T_best, cd_best, T_ransac, cd_ransac, sym_ok
