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
