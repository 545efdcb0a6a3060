"""Device mesh + sharding rules — the framework's distributed backend.

The reference is single-process/single-GPU (SURVEY §2.7); its concurrency
(DataLoader workers, joblib fan-out, OpenMP RANSAC) all becomes mesh
sharding here:

* axis ``data``  — clouds (feature extraction, registration queries,
  RANSAC problems) shard over it;
* axis ``model`` — the wide embedding-head matmuls (256->1024->512) and
  the retrieval distance matrix shard over it (tensor parallelism).

All cross-device movement is XLA-inserted collectives via sharding
constraints; there are no explicit sends.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """A (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(
        n_data, n_model
    )
    return Mesh(devs, axis_names=("data", "model"))


def shard_params(params, mesh: Mesh):
    """Replicate the conv trunk; shard the embedding head's wide layers
    over ``model`` (column parallel on 256->1024, row parallel 1024->512)."""
    def spec_for(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "embedding" in keys:
            if "final" in keys and leaf.ndim == 3:   # [1, 256, 1024]
                return P(None, None, "model")
            if "final" in keys and leaf.ndim == 1:   # bias [1024]
                return P("model")
            if "fc1" in keys and leaf.ndim == 2:     # [1024, 512]
                return P("model", None)
        return P()  # replicated

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(
            leaf, NamedSharding(mesh, spec_for(path, leaf))
        ),
        params,
    )


def shard_batched_clouds(arrays: Dict[str, jax.Array], mesh: Mesh):
    """Shard [B, cap, ...] cloud batches over the ``data`` axis."""
    out = {}
    for k, v in arrays.items():
        spec = P("data") if v.ndim >= 1 else P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def batched_extract(extractor, params, coords, valid, mesh: Mesh):
    """Sharded feature extraction over per-cloud padded arrays.

    ``coords``: int32 [B, cap, 3]; ``valid``: bool [B, cap]. Each cloud is
    an independent SparseGrid (batch dim vmapped, sharded over ``data``).
    Returns (point_feats [B, cap, C], descriptors [B, D]).
    """
    from corsair_tpu.core.sparse import SENTINEL, SparseGrid

    def one(coords_i, valid_i):
        grid = SparseGrid(
            coords=jnp.where(valid_i[:, None], coords_i, SENTINEL),
            batch=jnp.where(valid_i, 0, 1).astype(jnp.int32),
            feats=valid_i[:, None].astype(jnp.float32),
            valid=valid_i,
            stride=1,
            num_batches=1,
        )
        feats, desc = extractor.extract(params, grid)
        return feats, desc[0]

    fn = jax.jit(
        jax.vmap(one),
        in_shardings=(
            NamedSharding(mesh, P("data")),
            NamedSharding(mesh, P("data")),
        ),
        out_shardings=(
            NamedSharding(mesh, P("data")),
            NamedSharding(mesh, P("data")),
        ),
    )
    return fn(coords, valid)
