"""Checkpoint save/load for JAX param/optimizer pytrees.

Replaces the reference's torch-dict checkpoints (``utils/ckpts.py:21-63``)
with a flat npz container (no pickling, portable, works under zero-egress
environments); layout mirrors the reference keys: ``state_dict`` (model),
``embedding_state_dict`` (head), ``optimizer``, ``epoch``.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix: str) -> Dict[str, np.ndarray]:
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        key = prefix + jax.tree_util.keystr(path)
        out[key] = np.asarray(leaf)
    return out


def _unflatten(template, flat: Dict[str, np.ndarray], prefix: str):
    def rebuild(path, leaf):
        key = prefix + jax.tree_util.keystr(path)
        return jnp.asarray(flat[key])

    return jax.tree_util.tree_map_with_path(rebuild, template)


def save_checkpoint(model_params, embedding_params, opt_state, epoch: int,
                    save_dir: str, save_name: str) -> str:
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, save_name)
    flat = _flatten(model_params, "state_dict")
    if embedding_params is not None:
        flat.update(_flatten(embedding_params, "embedding_state_dict"))
    if opt_state is not None:
        flat.update(_flatten(opt_state, "optimizer"))
    flat["epoch"] = np.asarray(epoch)
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)
    return path if path.endswith(".npz") else path + ".npz"


def save_checkpoint_orbax(path: str, state) -> str:
    """Orbax backend (sharded/async-capable) for large-scale training."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint_orbax(path: str, template):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)


def load_checkpoint(path: str, model_template, embedding_template=None,
                    opt_template=None):
    """Returns (model_params, embedding_params, opt_state, epoch)."""
    flat = dict(np.load(path, allow_pickle=False))
    model = _unflatten(model_template, flat, "state_dict")
    emb = None
    if embedding_template is not None:
        emb = _unflatten(flat=flat, prefix="embedding_state_dict",
                         template=embedding_template)
    opt = None
    if opt_template is not None:
        opt = _unflatten(flat=flat, prefix="optimizer",
                         template=opt_template)
    epoch = int(flat["epoch"])
    return model, emb, opt, epoch
