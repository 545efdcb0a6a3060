"""Training losses for the retrieval + registration feature extractor.

The reference repo ships the triplet data pipeline (PiP/PiN/NiN pair sets,
``datasets/ChairDataset.py:164-237``) and checkpoints with optimizer state
(``utils/ckpts.py``) but not the loss/training loop itself. These are the
FCGF-style losses that train such checkpoints:

* point-feature contrastive loss over mined pairs: positive pairs pulled
  together, negative pairs pushed beyond a margin (hinge);
* descriptor triplet loss on the 256-D global embeddings.

All pair lists are padded with a valid mask (static shapes).
"""

from __future__ import annotations

import jax.numpy as jnp


def point_contrastive_loss(
    featsA, featsB, pos_pairs, pos_valid, neg_pairs, neg_valid,
    pos_margin: float = 0.1, neg_margin: float = 1.4,
):
    """Hardest-contrastive-style hinge loss on mined point pairs.

    ``pos_pairs``/``neg_pairs``: int32 [P, 2] indices (row into featsA,
    row into featsB); invalid rows masked out.
    """
    def pair_dist(pairs):
        a = featsA[pairs[:, 0]]
        b = featsB[pairs[:, 1]]
        sq = jnp.sum((a - b) ** 2, axis=1)
        return jnp.sqrt(jnp.maximum(sq, 1e-24))

    dpos = pair_dist(pos_pairs)
    dneg = pair_dist(neg_pairs)
    pos_loss = jnp.maximum(dpos - pos_margin, 0.0) ** 2
    neg_loss = jnp.maximum(neg_margin - dneg, 0.0) ** 2
    pw = pos_valid.astype(jnp.float32)
    nw = neg_valid.astype(jnp.float32)
    return (
        jnp.sum(pos_loss * pw) / jnp.maximum(jnp.sum(pw), 1.0)
        + jnp.sum(neg_loss * nw) / jnp.maximum(jnp.sum(nw), 1.0)
    )


def descriptor_triplet_loss(anchor, positive, negative,
                            margin: float = 0.3):
    """Triplet hinge on global descriptors [B, D]."""
    dpos = jnp.sqrt(jnp.maximum(
        jnp.sum((anchor - positive) ** 2, axis=1), 1e-24))
    dneg = jnp.sqrt(jnp.maximum(
        jnp.sum((anchor - negative) ** 2, axis=1), 1e-24))
    return jnp.mean(jnp.maximum(dpos - dneg + margin, 0.0))
