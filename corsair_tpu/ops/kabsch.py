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


def kabsch_quaternion_lanes(src, dst, weights, power_iters: int = 50):
    """Lane-major batched Horn solve: same math as ``kabsch_quaternion``
    but with the hypothesis batch in the MINOR (lane) dimension.

    ``jax.vmap(kabsch_quaternion)`` lowers the 4x4 squarings and 3x3
    cross-covariances to [B, 4, 4] batched tiny matmuls whose 4-wide
    contraction runs at ~4 GFLOP/s on the VPU (profiled: ~43 of 64 ms of
    the folded-RANSAC device time). Here every quantity is a Python list
    of [B]-wide vectors, so all ~600 scalar steps of the solve become
    full-width elementwise VPU ops; the only non-elementwise work is the
    initial [B, s, 3] -> [s, 3, B] relayouts.

    ``src``/``dst``: [B, s, 3]; ``weights``: [B, s]. Returns [B, 4, 4].
    Agrees with ``vmap(kabsch_quaternion)`` to f32 roundoff.
    """
    st = jnp.transpose(src.astype(jnp.float32), (1, 2, 0))  # [s, 3, B]
    dt = jnp.transpose(dst.astype(jnp.float32), (1, 2, 0))
    wt = jnp.transpose(weights.astype(jnp.float32), (1, 0))  # [s, B]
    s = st.shape[0]

    wsum = jnp.maximum(sum(wt[j] for j in range(s)), 1e-8)   # [B]
    mu_s = [sum(st[j, a] * wt[j] for j in range(s)) / wsum
            for a in range(3)]
    mu_d = [sum(dt[j, b] * wt[j] for j in range(s)) / wsum
            for b in range(3)]

    S = [[sum(wt[j] * (st[j, a] - mu_s[a]) * (dt[j, b] - mu_d[b])
              for j in range(s))
          for b in range(3)] for a in range(3)]

    (sxx, sxy, sxz), (syx, syy, syz), (szx, szy, szz) = S
    N = [
        [sxx + syy + szz, syz - szy, szx - sxz, sxy - syx],
        [syz - szy, sxx - syy - szz, sxy + syx, szx + sxz],
        [szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy],
        [sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz],
    ]
    sigma = jnp.sqrt(
        sum(N[a][b] * N[a][b] for a in range(4) for b in range(4))
    ) + 1e-6
    M = [[(N[a][b] + sigma) / sigma if a == b else N[a][b] / sigma
          for b in range(4)] for a in range(4)]

    n_squarings = max(1, int(np.ceil(np.log2(max(power_iters, 2)))))
    for _ in range(n_squarings):
        M2 = [[sum(M[a][k] * M[k][b] for k in range(4))
               for b in range(4)] for a in range(4)]
        fro = jnp.sqrt(jnp.maximum(
            sum(M2[a][b] * M2[a][b] for a in range(4) for b in range(4)),
            1e-30,
        ))
        M = [[M2[a][b] / fro for b in range(4)] for a in range(4)]

    q0 = (1.0, 1e-3, 2e-3, 3e-3)
    q = [sum(M[a][b] * q0[b] for b in range(4)) for a in range(4)]
    qn = jnp.sqrt(jnp.maximum(sum(c * c for c in q), 1e-20))
    qw, qx, qy, qz = (c / qn for c in q)

    r = [
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw),
         2 * (qx * qz + qy * qw)],
        [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz),
         2 * (qy * qz - qx * qw)],
        [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw),
         1 - 2 * (qx * qx + qy * qy)],
    ]
    t = [mu_d[a] - sum(r[a][b] * mu_s[b] for b in range(3))
         for a in range(3)]

    one = jnp.ones_like(wsum)
    zero = jnp.zeros_like(wsum)
    rows = [
        jnp.stack([r[a][0], r[a][1], r[a][2], t[a]], axis=-1)
        for a in range(3)
    ]
    rows.append(jnp.stack([zero, zero, zero, one], axis=-1))
    return jnp.stack(rows, axis=-2)                   # [B, 4, 4]
