"""Fixed-iteration Lloyd KMeans, vmappable over restarts.

Replaces sklearn ``KMeans(n_clusters=K, n_init=10)`` used by the symmetric
sector cut (``utils/symmetry.py:216-247``). Initialization is a kmeans++-
style greedy D^2 seeding; iteration count is static so the whole fit jits.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_BIG = np.float32(1e30)  # np scalar: no device array at import


def _plus_plus_init(key, points, valid, k):
    """D^2-weighted seeding (matches sklearn's k-means++ default)."""
    n = points.shape[0]
    w0 = jnp.where(valid, 1.0, 0.0)
    i0 = jax.random.choice(key, n, p=w0 / jnp.sum(w0))
    centers = jnp.zeros((k, points.shape[1]), jnp.float32)
    centers = centers.at[0].set(points[i0])

    def body(carry, ki):
        centers, key = carry
        key, sub = jax.random.split(key)
        d2 = jnp.min(
            jnp.sum((points[:, None, :] - centers[None, :, :]) ** 2, -1)
            + jnp.where(
                (jnp.arange(centers.shape[0]) < ki)[None, :], 0.0, _BIG
            ),
            axis=1,
        )
        d2 = jnp.where(valid, d2, 0.0)
        p = d2 / jnp.maximum(jnp.sum(d2), 1e-12)
        idx = jax.random.choice(sub, n, p=p)
        centers = centers.at[ki].set(points[idx])
        return (centers, key), None

    (centers, _), _ = jax.lax.scan(
        body, (centers, key), jnp.arange(1, k)
    )
    return centers


@partial(jax.jit, static_argnames=("k", "iters", "n_init"))
def kmeans_lloyd(key, points, valid, k: int, iters: int = 25,
                 n_init: int = 10):
    """KMeans fit. Returns (centers [k,3], labels [N], inertia).

    Best of ``n_init`` D^2-seeded restarts, each run for ``iters`` Lloyd
    steps (masked for padding rows).
    """

    def one_restart(subkey):
        centers = _plus_plus_init(subkey, points, valid, k)

        def lloyd(carry, _):
            centers = carry
            d2 = jnp.sum(
                (points[:, None, :] - centers[None, :, :]) ** 2, -1
            )
            lab = jnp.argmin(d2, axis=1)
            onehot = jax.nn.one_hot(lab, k) * valid[:, None]
            counts = jnp.sum(onehot, axis=0)
            sums = onehot.T @ points
            new_centers = jnp.where(
                counts[:, None] > 0,
                sums / jnp.maximum(counts[:, None], 1.0),
                centers,
            )
            return new_centers, None

        centers, _ = jax.lax.scan(lloyd, centers, None, length=iters)
        d2 = jnp.sum((points[:, None, :] - centers[None, :, :]) ** 2, -1)
        lab = jnp.argmin(d2, axis=1)
        inertia = jnp.sum(
            jnp.where(valid, jnp.min(d2, axis=1), 0.0)
        )
        return centers, lab, inertia

    keys = jax.random.split(key, n_init)
    centers_all, labs_all, inertias = jax.vmap(one_restart)(keys)
    best = jnp.argmin(inertias)
    return centers_all[best], labs_all[best], inertias[best]


def kmeans_predict(centers, points):
    d2 = jnp.sum((points[:, None, :] - centers[None, :, :]) ** 2, -1)
    return jnp.argmin(d2, axis=1)


@partial(jax.jit, static_argnames=("k", "iters", "n_init"))
def kmeans_lloyd_fits(keys, points, valid, k: int, iters: int = 25,
                      n_init: int = 10):
    """Many independent KMeans fits in one LANE-MAJOR Lloyd loop.

    Drop-in for ``jax.vmap(kmeans_lloyd)`` over a fits axis:
    ``keys [F]``, ``points [F, N, D]``, ``valid [F, N]`` ->
    ``(centers [F, k, D], labels [F, N], inertia [F])``, same per-fit
    random draws (each fit's key splits into ``n_init`` restart seeds
    exactly as ``kmeans_lloyd`` does).

    MEASURED NEGATIVE on chip (r4, kept as the record + for other
    shapes): at the symmetric cut's shapes (800 fits x 50-pt window,
    K=4, 10 restarts x 25 iters) this form runs 9.8 ms vs the vmapped
    form's 6.1 ms per call, and a fixed-iteration variant 10.5 ms — the
    layout, not the early-exit while_loop, is the cost. The "vmapped
    Lloyd wastes 124/128 lanes" hypothesis was wrong: XLA lays the
    vmapped form out well, and the [window, fits] transpose layout
    here pays more in transpose/reduction traffic than it saves in
    lane fill. ``symmetric_cut`` uses ``vmap(kmeans_lloyd)``.

    Arithmetic is the same per fit up to reduction order (center sums
    reduce over the window axis instead of a [k, W] @ [W, D] matmul),
    so results can differ from ``kmeans_lloyd`` in the last ulp on
    near-tied fits only.
    """
    F, N, D = points.shape
    R = n_init
    # per-fit restart seeds, identical draw structure to kmeans_lloyd
    subkeys = jax.vmap(lambda kk: jax.random.split(kk, R))(keys)  # [F,R,2]
    flat_keys = subkeys.reshape(F * R, 2)
    pts_rep = jnp.repeat(points, R, axis=0)      # [FR, N, D]
    val_rep = jnp.repeat(valid, R, axis=0)       # [FR, N]

    centers0 = jax.vmap(
        lambda kk, p, v: _plus_plus_init(kk, p, v, k)
    )(flat_keys, pts_rep, val_rep)               # [FR, k, D]

    # Lane-major PER-AXIS layout: every tensor in the loop is [N, FR]
    # (or [k, FR]) — fits*restarts fill the 128-lane minor dim, the
    # window fills sublanes, and the coordinate axis is unrolled into
    # D separate arrays (keeping D=3 as a tensor dim wasted 5/8 of
    # every sublane tile and measured SLOWER than the vmapped form).
    pts_ax = [jnp.transpose(pts_rep[:, :, d], (1, 0)) for d in range(D)]
    val_l = jnp.transpose(val_rep, (1, 0))       # [N, FR]
    c0 = jnp.transpose(centers0, (2, 1, 0))      # [D, k, FR]

    def assign(c):
        # first-min compare chain == jnp.argmin tie-breaking
        def d2_of(kk):
            acc = (pts_ax[0] - c[0, kk][None]) ** 2
            for d in range(1, D):
                acc = acc + (pts_ax[d] - c[d, kk][None]) ** 2
            return acc                                       # [N, FR]

        bd = d2_of(0)
        lab = jnp.zeros(bd.shape, jnp.int32)
        for kk in range(1, k):
            d2_k = d2_of(kk)
            take = d2_k < bd
            lab = jnp.where(take, kk, lab)
            bd = jnp.where(take, d2_k, bd)
        return lab, bd

    def update(c, lab):
        new_c = []
        for kk in range(k):
            w = ((lab == kk) & val_l).astype(pts_ax[0].dtype)  # [N, FR]
            cnt = jnp.maximum(jnp.sum(w, axis=0), 1.0)         # [FR]
            has = jnp.sum(w, axis=0) > 0
            new_c.append([
                jnp.where(has, jnp.sum(w * pts_ax[d], axis=0) / cnt,
                          c[d, kk])
                for d in range(D)
            ])
        # [D, k, FR]
        return jnp.stack([
            jnp.stack([new_c[kk][d] for kk in range(k)]) for d in range(D)
        ])

    # Convergence early-exit: Lloyd is a deterministic fixpoint
    # iteration — once no label changes, every further iteration is a
    # no-op, so exiting early returns EXACTLY the fixed-`iters` result
    # whenever the fits converge sooner (typical window fits converge
    # in ~8-12 of the faithful 25). The loop-carried `lab` doubles as
    # the convergence probe, so each step costs one assign + update,
    # same as the fixed scan.
    lab0, _ = assign(c0)

    def cond(state):
        i, _, _, changed = state
        return (i < iters) & changed

    def body(state):
        i, c, lab, _ = state
        c2 = update(c, lab)
        lab2, _ = assign(c2)
        return i + 1, c2, lab2, jnp.any(lab2 != lab)

    _, c, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), c0, lab0, jnp.bool_(True))
    )
    lab, bd = assign(c)
    inertia = jnp.sum(jnp.where(val_l, bd, 0.0), axis=0)    # [FR]

    # best restart per fit (argmin = first min, as kmeans_lloyd)
    inertia = inertia.reshape(F, R)
    best_r = jnp.argmin(inertia, axis=1)                    # [F]
    flat_best = jnp.arange(F) * R + best_r
    centers = jnp.transpose(c, (2, 1, 0))[flat_best]        # [F, k, D]
    labels = jnp.transpose(lab, (1, 0)).reshape(F, R, N)[
        jnp.arange(F), best_r]
    return centers, labels, inertia[jnp.arange(F), best_r]
