"""Training loop: triplet batches -> contrastive + triplet loss -> optax.

Completes the training side whose artifacts the reference ships
(checkpoints with ``optimizer``/``scheduler`` state, ``utils/ckpts.py``)
but whose loop it omits. The step is a single jitted/pjit-able function:
forward all three roles (base/pos/neg), point-contrastive loss over the
mined PiP/PiN/NiN pairs, descriptor triplet loss, grads, optax update.
"""

from __future__ import annotations

import dataclasses
import functools
import jax
import jax.numpy as jnp
import numpy as np
import optax

from corsair_tpu.core.sparse import SparseGrid
from corsair_tpu.nn import heads, resunet
from corsair_tpu.nn.layers import l2_normalize
from corsair_tpu.train.loss import (
    descriptor_triplet_loss,
    point_contrastive_loss,
)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-1
    momentum: float = 0.8
    weight_decay: float = 1e-4
    exp_gamma: float = 0.99
    pos_margin: float = 0.1
    neg_margin: float = 1.4
    triplet_margin: float = 0.3
    triplet_weight: float = 1.0
    grad_clip: float = 10.0
    bn_momentum: float = 0.05   # deployed config, evaluation.py:185
    train_bn: bool = True       # batch stats + running-stat EMA


def make_optimizer(cfg: TrainConfig):
    sched = optax.exponential_decay(
        cfg.learning_rate, transition_steps=1, decay_rate=cfg.exp_gamma,
        staircase=True,
    )
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.add_decayed_weights(cfg.weight_decay),
        optax.sgd(sched, momentum=cfg.momentum),
    )


def _forward_role(params, model_cfg, manager, grid: SparseGrid,
                  training: bool = False, stats_out=None):
    maps = manager.build(grid)
    feats, bottleneck = resunet.forward(params["model"], grid, maps,
                                        model_cfg, training=training,
                                        stats_out=stats_out)
    l4 = maps.levels[3]
    emb_stats = {} if stats_out is not None else None
    desc = heads.conv1_max_embedding_apply(
        params["embedding"], bottleneck, l4.batch, l4.valid,
        grid.num_batches, training=training, stats_out=emb_stats,
    )
    if stats_out is not None:
        for k, v in emb_stats.items():
            stats_out["embedding." + k] = v
    return feats, l2_normalize(desc, axis=1)


def _stats_param(params, key):
    """Resolve a collected-stats key to its norm-param dict."""
    node = params["embedding"] if key.startswith("embedding.") else \
        params["model"]
    for part in key.split(".")[1:] if key.startswith("embedding.") else \
            key.split("."):
        node = node[part]
    return node


def ema_update_bn(params, stats, momentum: float):
    """torch-style running-stat update: r = (1-m)*r + m*batch."""
    import copy

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy

    def updated(norm_p, mean, var):
        new = dict(norm_p)
        new["mean"] = (1 - momentum) * norm_p["mean"] + momentum * mean
        new["var"] = (1 - momentum) * norm_p["var"] + momentum * var
        return new

    def set_path(root, key, value):
        parts = (["embedding"] + key.split(".")[1:]
                 if key.startswith("embedding.")
                 else ["model"] + key.split("."))
        node = root
        for part in parts[:-1]:
            node[part] = dict(node[part])
            node = node[part]
        node[parts[-1]] = value

    root = {"model": dict(params["model"]),
            "embedding": dict(params["embedding"])}
    for key, (mean, var) in stats.items():
        norm_p = _stats_param(root, key)
        set_path(root, key, updated(norm_p, mean, var))
    return root


@functools.partial(
    jax.jit, static_argnames=("model_cfg", "manager", "train_cfg", "opt")
)
def train_step(params, opt_state, base: SparseGrid, pos: SparseGrid,
               neg: SparseGrid, pip, pip_valid, pin, pin_valid, nin,
               nin_valid, model_cfg, manager, train_cfg: TrainConfig,
               opt):
    """One full training step. Pair index arrays are [P, 2] with masks.

    Pair indices address the *padded row space* of the collated grids
    (base rows for column 0; pos/neg rows for column 1), matching the
    offset-collate convention of ``datasets/ChairDataset.py:164-183``.
    """

    training = train_cfg.train_bn

    def loss_fn(p):
        stats = {} if training else None
        base_f, base_d = _forward_role(p, model_cfg, manager, base,
                                       training, stats)
        pos_f, pos_d = _forward_role(p, model_cfg, manager, pos, training)
        neg_f, neg_d = _forward_role(p, model_cfg, manager, neg, training)
        l_pp = point_contrastive_loss(
            base_f, pos_f, pip, pip_valid, pin, pin_valid,
            train_cfg.pos_margin, train_cfg.neg_margin,
        )
        l_nn = point_contrastive_loss(
            base_f, neg_f,
            jnp.zeros((1, 2), jnp.int32), jnp.zeros((1,), bool),
            nin, nin_valid,
            train_cfg.pos_margin, train_cfg.neg_margin,
        )
        l_trip = descriptor_triplet_loss(
            base_d, pos_d, neg_d, train_cfg.triplet_margin
        )
        total = l_pp + l_nn + train_cfg.triplet_weight * l_trip
        aux = {"pair": l_pp, "nin": l_nn, "triplet": l_trip}
        return total, (aux, stats)

    (loss, (aux, stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    if training and stats:
        stats = jax.tree_util.tree_map(jax.lax.stop_gradient, stats)
        params = ema_update_bn(params, stats, train_cfg.bn_momentum)
    return params, opt_state, loss, aux


def pad_pairs(pairs: np.ndarray, cap: int):
    out = np.zeros((cap, 2), np.int32)
    valid = np.zeros((cap,), bool)
    n = min(len(pairs), cap)
    if n:
        out[:n] = pairs[:n]
        valid[:n] = True
    return out, valid


class Trainer:
    """Host-side loop driving ``train_step`` over a triplet dataset."""

    def __init__(self, extractor, train_cfg: TrainConfig = TrainConfig(),
                 pair_cap: int = 1024):
        import dataclasses

        self.extractor = extractor
        self.train_cfg = train_cfg
        self.pair_cap = pair_cap
        self.opt = make_optimizer(train_cfg)
        # Training batches come from collate_pair_fn in first-occurrence
        # voxel order (pair indices reference those rows, so sorting is
        # not an option): banded-conv coverage plans would fail every
        # batch and only pay the check + lax.cond. Pin the gather conv.
        self.model_cfg = dataclasses.replace(
            extractor.model_cfg, banded_band=0
        )

    def init(self, key):
        params = self.extractor.init_params(key)
        return params, self.opt.init(params)

    def step(self, params, opt_state, batch, capacity: int):
        """``batch`` is the dict from ``collate_pair_fn``."""
        from corsair_tpu.core.sparse import SENTINEL

        def to_grid(role):
            nb = int(batch[f"{role}_T"].shape[0])
            return SparseGrid(
                coords=jnp.asarray(batch[f"{role}_coords"]),
                batch=jnp.asarray(batch[f"{role}_batch"]),
                feats=jnp.asarray(batch[f"{role}_feat"]),
                valid=jnp.asarray(batch[f"{role}_valid"]),
                stride=1,
                num_batches=nb,
            )

        pip, pip_v = pad_pairs(batch["PiP_pairs"], self.pair_cap)
        pin, pin_v = pad_pairs(batch["PiN_pairs"], self.pair_cap)
        nin, nin_v = pad_pairs(batch["NiN_pairs"], self.pair_cap)
        return train_step(
            params, opt_state,
            to_grid("base"), to_grid("pos"), to_grid("neg"),
            jnp.asarray(pip), jnp.asarray(pip_v),
            jnp.asarray(pin), jnp.asarray(pin_v),
            jnp.asarray(nin), jnp.asarray(nin_v),
            self.model_cfg, self.extractor.manager,
            self.train_cfg, self.opt,
        )
