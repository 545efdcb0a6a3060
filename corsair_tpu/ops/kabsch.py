"""Closed-form rigid alignment (Kabsch/Umeyama) — the RANSAC model solver.

Replaces Open3D's ``TransformationEstimationPointToPoint`` inside
``registration_ransac_based_on_correspondence`` (``utils/eval_pose.py:95-97``)
with a batched, vmappable SVD solve: thousands of 3x3 SVDs per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


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


def kabsch_quaternion(src, dst, weights=None, power_iters: int = 50):
    """Horn's closed-form quaternion alignment — SVD-free.

    Builds the 4x4 symmetric quaternion matrix from the cross-covariance
    and extracts its dominant eigenvector with fixed-count shifted power
    iteration: pure matmuls/elementwise ops, which vectorize far better
    on TPU than batched 3x3 SVD (the RANSAC hypothesis solver's hot op).
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
    S = (cs * w[:, None]).T @ cd  # S[a, b] = sum w s_a d_b

    sxx, sxy, sxz = S[0, 0], S[0, 1], S[0, 2]
    syx, syy, syz = S[1, 0], S[1, 1], S[1, 2]
    szx, szy, szz = S[2, 0], S[2, 1], S[2, 2]
    N = jnp.array([
        [sxx + syy + szz, syz - szy, szx - sxz, sxy - syx],
        [syz - szy, sxx - syy - szz, sxy + syx, szx + sxz],
        [szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy],
        [sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz],
    ])
    # Shift so the most-positive eigenvalue dominates in magnitude, then
    # extract the dominant eigenvector via repeated matrix squaring
    # (M^(2^k) q0): log2 steps instead of a long power-iteration scan,
    # with Frobenius normalization between squarings for f32 range.
    sigma = jnp.sqrt(jnp.sum(N * N)) + 1e-6
    M = (N + sigma * jnp.eye(4)) / sigma

    def square(M, _):
        M = M @ M
        M = M / jnp.sqrt(jnp.maximum(jnp.sum(M * M), 1e-30))
        return M, None

    n_squarings = max(1, int(np.ceil(np.log2(max(power_iters, 2)))))
    M, _ = jax.lax.scan(square, M, None, length=n_squarings, unroll=True)

    q0 = jnp.array([1.0, 1e-3, 2e-3, 3e-3])
    q = M @ q0
    q = q / jnp.sqrt(jnp.maximum(jnp.sum(q * q), 1e-20))

    qw, qx, qy, qz = q[0], q[1], q[2], q[3]
    r = jnp.array([
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw),
         2 * (qx * qz + qy * qw)],
        [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz),
         2 * (qy * qz - qx * qw)],
        [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw),
         1 - 2 * (qx * qx + qy * qy)],
    ])
    t = mu_d - r @ mu_s
    T = jnp.eye(4, dtype=jnp.float32)
    T = T.at[:3, :3].set(r)
    T = T.at[:3, 3].set(t)
    return T
