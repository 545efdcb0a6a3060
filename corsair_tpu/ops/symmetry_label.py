"""Online symmetry-label inference for ShapeNet models.

Parity with ``get_symmetry_label`` / ``test_symmetry_label``
(``evaluation-shapenet.py:138-155``): test sym in {12, 8, 6, 4, 3, 2, 1}
by rotating the cloud about +y by i*2pi/sym and thresholding the max-NN
Chamfer distance. All candidate rotations of all labels are evaluated in
one batched program instead of the reference's nested KDTree loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from corsair_tpu.ops.chamfer import chamfer_max

SYM_CANDIDATES = (12, 8, 6, 4, 3, 2)


@partial(jax.jit, static_argnames=("chunk",))
def _sym_errors(pc, valid, chunk: int = 1024):
    """Max-NN chamfer between pc and its y-rotation for every rotation
    needed by any candidate label. Returns [R] errors + the angle list is
    static."""
    angles = []
    for s in SYM_CANDIDATES:
        for i in range(1, s // 2 + 1):
            angles.append(i * 2 * np.pi / s)
    angles = jnp.asarray(np.asarray(angles, np.float32))

    def one(angle):
        c, s = jnp.cos(angle), jnp.sin(angle)
        R = jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
        rot = pc @ R.T
        return chamfer_max(pc, rot, valid, valid, chunk)

    return jax.lax.map(one, angles)


def get_symmetry_label(pc, valid=None, cd_threshold: float = 0.1,
                       chunk: int = 1024) -> int:
    """Returns the largest passing symmetry label (1 = asymmetric, 0 =
    degenerate, matching ``evaluation-shapenet.py:151-155``)."""
    pc = jnp.asarray(pc, jnp.float32)
    if valid is None:
        valid = jnp.ones(pc.shape[0], bool)
    errors = np.asarray(_sym_errors(pc, valid, chunk))
    off = 0
    for s in SYM_CANDIDATES:
        k = s // 2
        errs = errors[off : off + k]
        off += k
        if (errs <= cd_threshold).all():
            return s
    # sym=1 always passes (no rotations to test)
    return 1
