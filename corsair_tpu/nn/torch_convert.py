"""Torch/MinkowskiEngine checkpoint -> corsair_tpu param pytree converter.

The 8 released CORSAIR checkpoints (``scannet_{ret,pose}_{chair,table}{,_best}``,
``README.md:155-167``) are torch dicts with keys ``state_dict`` (ResUNetBN2C),
``embedding_state_dict`` (conv1_max_embedding), ``optimizer``, ``scheduler``,
``epoch`` (``utils/ckpts.py:21-63``; consumed ``evaluation.py:195-198``).

ME parameter layouts:
* ``MinkowskiConvolution.kernel``: ``[K, Cin, Cout]`` for kernel_size > 1,
  ``[Cin, Cout]`` for 1x1; ``bias``: ``[1, Cout]``.
* ``MinkowskiBatchNorm`` wraps ``torch.nn.BatchNorm1d`` as ``.bn``.
* ``torch.nn.Linear.weight``: ``[Cout, Cin]`` (transposed vs ours).

``offset_permutation`` reorders the K axis in case ME's kernel-offset
enumeration differs from ours (``core.coordmap.kernel_offsets``: dim-0
fastest, offsets -1..1). "identity" assumes they already match; "reverse"
flips all offsets (equivalent to negating the kernel region).
"""

from __future__ import annotations

from typing import Dict, Sequence, Union

import numpy as np
import jax.numpy as jnp


def _hypercube_offsets(kernel_size: int, ndim: int, order: str,
                       sign: int) -> np.ndarray:
    """Hypothesized ME kernel-offset enumeration: centered offsets with
    dim-0 fastest (``order='F'``) or dim-last fastest (``'C'``), optionally
    negated (``sign=-1`` models the opposite gather direction)."""
    half = kernel_size // 2
    rng = np.arange(-half, half + 1, dtype=np.int32)
    grids = np.meshgrid(*([rng] * ndim), indexing="ij")
    offs = np.stack(
        [g.reshape(-1, order=order) for g in grids], axis=1
    )
    return sign * offs


def offset_permutation_candidates(kernel_size: int = 3, ndim: int = 3
                                  ) -> Dict[str, np.ndarray]:
    """All plausible ME kernel-axis orderings, as permutations mapping OUR
    enumeration (``core.coordmap.kernel_offsets``: dim-0 fastest, -1..1)
    onto the torch kernel's K axis: ``ours_kernel[k] = torch_kernel[perm[k]]``.

    Used by ``nn.ckpt_verify.detect_offset_permutation`` to self-check a
    released checkpoint at load time (the enumeration order of ME 0.5's
    C++ kernel-region iterator cannot be re-verified in this environment;
    see NOTES.md §1).
    """
    from corsair_tpu.core.coordmap import kernel_offsets

    ours = kernel_offsets(kernel_size, ndim)
    cands = {}
    for name, (order, sign) in {
        "identity": ("F", 1),
        "reverse": ("F", -1),
        "c_order": ("C", 1),
        "c_order_reverse": ("C", -1),
    }.items():
        me = _hypercube_offsets(kernel_size, ndim, order, sign)
        # perm[k] = row of the hypothesized ME table equal to our offset k
        match = np.all(me[None, :, :] == ours[:, None, :], axis=2)
        perm = np.argmax(match, axis=1)
        assert np.all(match[np.arange(len(ours)), perm]), name
        cands[name] = perm.astype(np.int64)
    return cands


def _perm(k: int, spec: Union[str, Sequence[int]]):
    if isinstance(spec, str):
        if spec == "identity":
            return np.arange(k)
        if spec == "reverse":
            return np.arange(k)[::-1]
        kernel_size = round(k ** (1 / 3))
        cands = offset_permutation_candidates(kernel_size)
        if spec in cands:
            return cands[spec]
        raise ValueError(spec)
    return np.asarray(spec)


def _to_np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _conv(sd, prefix, perm_spec, has_bias=False):
    kernel = _to_np(sd[f"{prefix}.kernel"]).astype(np.float32)
    if kernel.ndim == 2:  # 1x1 conv
        kernel = kernel[None]
    else:
        kernel = kernel[_perm(kernel.shape[0], perm_spec)]
    out = {"kernel": jnp.asarray(kernel)}
    if has_bias or f"{prefix}.bias" in sd:
        out["bias"] = jnp.asarray(
            _to_np(sd[f"{prefix}.bias"]).reshape(-1).astype(np.float32)
        )
    return out


def _bn(sd, prefix):
    return {
        "scale": jnp.asarray(_to_np(sd[f"{prefix}.bn.weight"]).astype(np.float32)),
        "bias": jnp.asarray(_to_np(sd[f"{prefix}.bn.bias"]).astype(np.float32)),
        "mean": jnp.asarray(_to_np(sd[f"{prefix}.bn.running_mean"]).astype(np.float32)),
        "var": jnp.asarray(_to_np(sd[f"{prefix}.bn.running_var"]).astype(np.float32)),
    }


def _dense_bn(sd, prefix):
    return {
        "scale": jnp.asarray(_to_np(sd[f"{prefix}.weight"]).astype(np.float32)),
        "bias": jnp.asarray(_to_np(sd[f"{prefix}.bias"]).astype(np.float32)),
        "mean": jnp.asarray(_to_np(sd[f"{prefix}.running_mean"]).astype(np.float32)),
        "var": jnp.asarray(_to_np(sd[f"{prefix}.running_var"]).astype(np.float32)),
    }


def _linear(sd, prefix):
    return {
        "weight": jnp.asarray(
            _to_np(sd[f"{prefix}.weight"]).T.astype(np.float32)
        ),
        "bias": jnp.asarray(_to_np(sd[f"{prefix}.bias"]).astype(np.float32)),
    }


def _block(sd, prefix, perm_spec):
    return {
        "conv1": _conv(sd, f"{prefix}.conv1", perm_spec),
        "norm1": _bn(sd, f"{prefix}.norm1"),
        "conv2": _conv(sd, f"{prefix}.conv2", perm_spec),
        "norm2": _bn(sd, f"{prefix}.norm2"),
    }


def convert_resunet(state_dict: Dict, offset_permutation="identity"):
    """ResUNet2-family ``state_dict`` -> corsair_tpu resunet params."""
    sd = state_dict
    p = {}
    for i in (1, 2, 3, 4):
        p[f"conv{i}"] = _conv(sd, f"conv{i}", offset_permutation)
        p[f"norm{i}"] = _bn(sd, f"norm{i}")
        p[f"block{i}"] = _block(sd, f"block{i}", offset_permutation)
    for i in (2, 3, 4):
        p[f"conv{i}_tr"] = _conv(sd, f"conv{i}_tr", offset_permutation)
        p[f"norm{i}_tr"] = _bn(sd, f"norm{i}_tr")
        p[f"block{i}_tr"] = _block(sd, f"block{i}_tr", offset_permutation)
    p["conv1_tr"] = _conv(sd, "conv1_tr", offset_permutation)
    p["final"] = _conv(sd, "final", offset_permutation, has_bias=True)
    return p


def convert_conv1_max_embedding(state_dict: Dict):
    """conv1_max_embedding ``embedding_state_dict`` -> head params
    (``model/fc.py:114-128``)."""
    sd = state_dict
    return {
        "final": _conv(sd, "final.final", "identity", has_bias=True),
        "fc1": _linear(sd, "fc1"),
        "bn1": _dense_bn(sd, "bn1"),
        "fc2": _linear(sd, "fc2"),
    }


def load_corsair_checkpoint(path: str, offset_permutation="auto"):
    """Load a released CORSAIR torch checkpoint into JAX params.

    ``offset_permutation="auto"`` self-checks the ME kernel-offset
    enumeration at load time: each candidate ordering is scored by
    BN-statistics consistency on CPU probe clouds and the winner is used
    (``nn.ckpt_verify.detect_offset_permutation``; logged to stdout).

    Returns (resunet_params, embedding_params, epoch).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if offset_permutation == "auto":
        from corsair_tpu.nn.ckpt_verify import detect_offset_permutation

        scores = detect_offset_permutation(ckpt["state_dict"])
        offset_permutation = min(scores, key=scores.get)
        print(f"[ckpt] offset permutation auto-detect: "
              f"{offset_permutation} (BN-consistency scores: "
              + ", ".join(f"{k}={v:.4f}" for k, v in
                          sorted(scores.items(), key=lambda kv: kv[1]))
              + ")")
    model = convert_resunet(ckpt["state_dict"], offset_permutation)
    emb = None
    if "embedding_state_dict" in ckpt:
        emb = convert_conv1_max_embedding(ckpt["embedding_state_dict"])
    return model, emb, ckpt.get("epoch")
