"""Pose error metrics with cyclic-symmetry minimization.

Parity with ``eval_pose`` (``utils/eval_pose.py:103-128``): for each element
i of the object's y-axis cyclic symmetry group, the ground-truth transform is
``T_gt = T1 @ inv(Rot_y(i * 2pi/sym)) @ inv(T0)``; RRE/RTE are evaluated at
the group element with the smallest rotation error.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from corsair_tpu.ops.transforms import euler_y


def eval_pose(T_est, T0, T1, axis_symmetry: int = 1):
    """Returns (t_loss, r_loss) minimized over the symmetry group.

    Host-side numpy (matches the reference's eval tail); see
    ``eval_pose_batch`` for the jitted batched version.
    """
    T_est = np.asarray(T_est, dtype=np.float64)
    T0 = np.asarray(T0, dtype=np.float64)
    T1 = np.asarray(T1, dtype=np.float64)
    t_best, r_best = np.inf, np.inf
    for i in range(max(int(axis_symmetry), 1)):
        rot = np.eye(4)
        rot[:3, :3] = euler_y(i * (2 * np.pi / axis_symmetry))
        T_gt = T1 @ np.linalg.inv(rot) @ np.linalg.inv(T0)
        tr = np.trace(T_est[:3, :3].T @ T_gt[:3, :3])
        r = np.arccos(np.clip((tr - 1) / 2, -1, 1))
        t = np.linalg.norm(T_est[:3, 3] - T_gt[:3, 3])
        if r < r_best:
            r_best, t_best = r, t
    return t_best, r_best


def eval_pose_batch(T_est, T0, T1, sym, max_sym: int = 12):
    """Jittable batched version. ``T_est/T0/T1``: [B,4,4]; ``sym``: [B] int.

    Evaluates all ``max_sym`` group elements and masks those >= sym.
    """
    B = T_est.shape[0]
    i = jnp.arange(max_sym, dtype=jnp.float32)  # [S]
    ang = i[None, :] * (2 * jnp.pi / jnp.maximum(sym[:, None], 1))  # [B,S]

    c, s = jnp.cos(ang), jnp.sin(ang)
    zeros, ones = jnp.zeros_like(c), jnp.ones_like(c)
    # inv(Rot_y(a)) = Rot_y(-a)
    rot_inv = jnp.stack([
        jnp.stack([c, zeros, -s], -1),
        jnp.stack([zeros, ones, zeros], -1),
        jnp.stack([s, zeros, c], -1),
    ], -2)  # [B, S, 3, 3]
    rot_inv4 = jnp.tile(jnp.eye(4)[None, None], (B, max_sym, 1, 1))
    rot_inv4 = rot_inv4.at[:, :, :3, :3].set(rot_inv)

    T0_inv = jnp.linalg.inv(T0)  # [B,4,4]
    T_gt = jnp.einsum("bij,bsjk,bkl->bsil", T1, rot_inv4, T0_inv)

    # trace(R_est^T @ R_gt) == sum(R_est * R_gt)
    R_est = T_est[:, None, :3, :3]
    tr = jnp.sum(R_est * T_gt[:, :, :3, :3], axis=(-2, -1))
    r = jnp.arccos(jnp.clip((tr - 1) / 2, -1, 1))
    t = jnp.linalg.norm(T_est[:, None, :3, 3] - T_gt[:, :, :3, 3], axis=-1)

    mask = i[None, :] < jnp.maximum(sym[:, None], 1)
    r = jnp.where(mask, r, jnp.inf)
    best = jnp.argmin(r, axis=1)
    bi = jnp.arange(B)
    return t[bi, best], r[bi, best]
