"""Robust IRLS pose solver (alternative registration path).

Parity with ``utils/_transform_estimation.py``: 20-iteration iteratively
reweighted least squares on the small-angle linearized pose, with
Geman-McClure-style weights ``par / (residual + par)`` and ``par`` halved
every 5 iterations; plus the correlation-based correspondence weighting of
``pose_estimation`` (``:140-159``). Fully jitted.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _rot_xyz(x):
    """R = Rz @ Ry @ Rx from the 3 small angles."""
    cx, sx = jnp.cos(x[0]), jnp.sin(x[0])
    cy, sy = jnp.cos(x[1]), jnp.sin(x[1])
    cz, sz = jnp.cos(x[2]), jnp.sin(x[2])
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rz @ ry @ rx


def _get_trans(x):
    T = jnp.eye(4)
    T = T.at[:3, :3].set(_rot_xyz(x[:3]))
    T = T.at[:3, 3].set(x[3:])
    return T


def _build_linear_system(pts0, pts1, w):
    """Small-angle linearization (``build_linear_system`` ``:74-95``)."""
    n = pts0.shape[0]
    z = jnp.zeros(n)
    o = jnp.ones(n)
    A0 = jnp.stack([z, pts0[:, 2], -pts0[:, 1], o, z, z], 1)
    A1 = jnp.stack([-pts0[:, 2], z, pts0[:, 0], z, o, z], 1)
    A2 = jnp.stack([pts0[:, 1], -pts0[:, 0], z, z, z, o], 1)
    A = jnp.concatenate([A0, A1, A2], 0)
    b = jnp.concatenate(
        [pts1[:, 0] - pts0[:, 0], pts1[:, 1] - pts0[:, 1],
         pts1[:, 2] - pts0[:, 2]], 0
    )[:, None]
    ww = jnp.tile(w[:, None], (3, 1))
    return A * ww, b * ww


@partial(jax.jit, static_argnames=("iters",))
def est_quad_linear_robust(pts0, pts1, weight=None, iters: int = 20):
    """Returns the accumulated 4x4 transform aligning pts0 -> pts1."""
    n = pts0.shape[0]
    if weight is None:
        weight = jnp.ones(n)
    weight = weight.reshape(-1)

    def body(i, carry):
        pts0_curr, trans, w, par = carry
        par = jnp.where((i > 0) & (i % 5 == 0), par / 2.0, par)
        A, b = _build_linear_system(pts0_curr, pts1, w)
        # normal equations with a tiny ridge for robustness
        ata = A.T @ A + 1e-8 * jnp.eye(6)
        x = jnp.linalg.solve(ata, A.T @ b).reshape(-1)
        T_curr = _get_trans(x)
        pts0_new = pts0_curr @ T_curr[:3, :3].T + T_curr[:3, 3]
        resid = jnp.linalg.norm(pts0_new - pts1, axis=1)
        w_new = par / (resid + par)
        return pts0_new, T_curr @ trans, w_new, par

    _, trans, _, _ = jax.lax.fori_loop(
        0, iters, body, (pts0, jnp.eye(4), weight, jnp.float32(1.0))
    )
    return trans


def pose_estimation_from_features(F0, F1, xyz0, xyz1):
    """Correlation-matrix correspondences + robust IRLS
    (``pose_estimation`` ``:140-159``). Returns (T, weights)."""
    corr = jnp.dot(F0, F1.T, preferred_element_type=jnp.float32)
    weight = jnp.max(corr, axis=1)
    inds = jnp.argmax(corr, axis=1)
    xyz1_corr = xyz1[inds]
    trans = est_quad_linear_robust(xyz0, xyz1_corr, weight)
    return trans, weight
