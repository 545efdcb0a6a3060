"""SE(3) helpers: homogeneous transforms, random poses, Scan2CAD TRS.

Parity targets: ``utils/preprocess.py:39-48`` (``apply_transform``),
``:73-86`` (``random_rotation``), ``utils/read_json.py:71-87`` (``to_T``).
Pure numpy/JAX — works under jit when given jnp arrays.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def apply_transform(points, T):
    """Apply a 4x4 homogeneous transform to ``[N, 3]`` points."""
    xp = jnp if isinstance(points, jnp.ndarray) else np
    return points @ xp.transpose(T[:3, :3]) + T[:3, 3]


def euler_xyz_mat(ai, aj, ak):
    """Rotation matrix for intrinsic 'sxyz' Euler angles (transforms3d
    ``euler2mat`` default convention): R = Rz(ak) @ Ry(aj) @ Rx(ai)."""
    xp = jnp if any(isinstance(a, jnp.ndarray) for a in (ai, aj, ak)) else np
    si, ci = xp.sin(ai), xp.cos(ai)
    sj, cj = xp.sin(aj), xp.cos(aj)
    sk, ck = xp.sin(ak), xp.cos(ak)
    rx = xp.array([[1, 0, 0], [0, ci, -si], [0, si, ci]])
    ry = xp.array([[cj, 0, sj], [0, 1, 0], [-sj, 0, cj]])
    rz = xp.array([[ck, -sk, 0], [sk, ck, 0], [0, 0, 1]])
    return rz @ ry @ rx


def euler_y(angle):
    """Rotation about the +y axis (ShapeNet's up axis, used for the cyclic
    symmetry group in ``utils/eval_pose.py:112-117``)."""
    xp = jnp if isinstance(angle, jnp.ndarray) else np
    s, c = xp.sin(angle), xp.cos(angle)
    if xp is jnp:
        return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
    return np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])


def quat_to_mat(q):
    """Unit quaternion (w, x, y, z) to rotation matrix (transforms3d
    ``quat2mat`` convention, ``utils/read_json.py:79``)."""
    q = np.asarray(q, dtype=np.float64)
    w, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def to_T(translation, quaternion, scale):
    """Scan2CAD TRS record -> 4x4 matrix: ``T = M(R, t) @ S``."""
    m = np.eye(4)
    m[:3, :3] = quat_to_mat(quaternion)
    m[:3, 3] = np.asarray(translation, dtype=np.float64)
    s = np.eye(4)
    s[0, 0], s[1, 1], s[2, 2] = np.asarray(scale, dtype=np.float64)
    return m @ s


def random_rotation(pointcloud, rng=None):
    """Random SE(3): uniform Euler angles, translation U(-0.5, 0.5)^3.

    Returns (transformed_points, T). Host-side (numpy) — used by the data
    pipeline, matching ``utils/preprocess.py:73-86``.
    """
    if rng is None:
        rng = np.random
    R = euler_xyz_mat(
        rng.uniform(0, 2 * np.pi),
        rng.uniform(0, 2 * np.pi),
        rng.uniform(0, 2 * np.pi),
    )
    t = rng.uniform(-0.5, 0.5, 3)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return pointcloud @ R.T + t, T


def random_rotation_id(pointcloud):
    """Parity counterpart of ``utils/preprocess.py:89-92`` (unused by
    the reference's entry points too): identity pose with the
    ``random_rotation`` (points, T) interface."""
    return pointcloud, np.eye(4)


def random_pose_limits(rng, max_rpy_deg, max_txyz):
    """Random pose with per-axis limits (``evaluation-shapenet.py:79-94``)."""
    rpy = np.deg2rad([rng.uniform(-m, m) for m in max_rpy_deg])
    t = [rng.uniform(-m, m) for m in max_txyz]
    T = np.eye(4)
    T[:3, :3] = euler_xyz_mat(*rpy)
    T[:3, 3] = t
    return T
