"""Closed-form rigid alignment (Kabsch/Umeyama) — the RANSAC model solver.

Replaces Open3D's ``TransformationEstimationPointToPoint`` inside
``registration_ransac_based_on_correspondence`` (``utils/eval_pose.py:95-97``)
with a batched, vmappable SVD solve: thousands of 3x3 SVDs per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kabsch_umeyama(src, dst, weights=None):
    """Best-fit rigid transform T (4x4) with ``dst ~= T @ src``.

    ``src``/``dst``: [N, 3]; optional non-negative ``weights`` [N].
    Degenerate inputs return a valid (det=+1) rotation.
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    if weights is None:
        w = jnp.ones(src.shape[0], jnp.float32)
    else:
        w = weights.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w), 1e-8)
    mu_s = jnp.sum(src * w[:, None], axis=0) / wsum
    mu_d = jnp.sum(dst * w[:, None], axis=0) / wsum
    cs = src - mu_s
    cd = dst - mu_d
    # 3x3 cross-covariance
    h = (cs * w[:, None]).T @ cd
    u, _, vt = jnp.linalg.svd(h)
    # Proper rotation: flip the last singular vector if det < 0.
    d = jnp.sign(jnp.linalg.det(vt.T @ u.T))
    diag = jnp.stack([1.0 + 0.0 * d, 1.0 + 0.0 * d, d])
    r = (vt.T * diag[None, :]) @ u.T
    t = mu_d - r @ mu_s
    T = jnp.eye(4, dtype=jnp.float32)
    T = T.at[:3, :3].set(r)
    T = T.at[:3, 3].set(t)
    return T


kabsch_batched = jax.vmap(kabsch_umeyama, in_axes=(0, 0, None))
