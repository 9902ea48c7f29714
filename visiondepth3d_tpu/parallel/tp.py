"""Tensor-parallel sharding rules for the ViT/DPT depth models.

Megatron-style column/row sharding of the transformer expressed as GSPMD
param shardings over the ``tp`` mesh axis — XLA inserts the all-reduces:

- attention ``qkv`` kernel: columns (heads) sharded -> (None, tp)
- attention ``proj`` kernel: rows sharded -> (tp, None)
- MLP ``fc1``: columns -> (None, tp); ``fc2``: rows -> (tp, None)
- everything else (LN, embeddings, convs, head) replicated.

Activations stay [batch-sharded over dp]; with these kernel shardings the
per-layer collective is exactly one psum per attention/MLP block, riding ICI.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def vit_param_spec(path: tuple[str, ...]) -> P:
    names = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(names)
    if joined.endswith("qkv/kernel") or joined.endswith("fc1/kernel"):
        return P(None, "tp")
    if joined.endswith("qkv/bias") or joined.endswith("fc1/bias"):
        return P("tp")
    if "attn/proj/kernel" in joined or joined.endswith("fc2/kernel"):
        return P("tp", None)
    return P()


def shard_params(params, mesh: Mesh):
    """Place a params pytree onto the mesh under the TP rules."""

    def place(path, x):
        spec = vit_param_spec(path)
        # only shard when the axis divides evenly; replicate otherwise
        for dim, axis in enumerate(spec):
            if axis is not None:
                size = mesh.shape[axis] if isinstance(axis, str) else 1
                if dim >= x.ndim or x.shape[dim] % max(size, 1) != 0:
                    spec = P()
                    break
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
