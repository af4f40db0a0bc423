"""Tensor-parallel parameter sharding over the 'model' mesh axis.

Megatron-style sharding of the ViT feed-forward and attention
projections: column-parallel first matmul (fc1 / qkv kernels split on
the output dim), row-parallel second matmul (fc2 / proj kernels split on
the input dim). XLA inserts the psum on the row-parallel output — no
manual collectives (scaling-book recipe).

At ViT-S scale the 'model' axis is usually 1 (pure DP is optimal —
SURVEY.md §2.3: "No TP/PP is warranted at these model sizes"), but the
axis is fully wired so larger backbones shard by changing the mesh
shape only.

Spec assignment is by parameter path substring, so it applies uniformly
to the raw param tree AND to optimizer-state trees that mirror it
(Adam's mu/nu), via `tree_map_with_path`.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLUMN_PARALLEL = ("fc1", "qkv")  # kernel (in, out): split out
ROW_PARALLEL = ("fc2", "proj")  # kernel (in, out): split in


def spec_for_path(path: str, ndim: int) -> P:
    """PartitionSpec for a parameter identified by its tree path."""
    is_kernel = path.endswith("kernel")
    is_bias = path.endswith("bias")
    if any(f"/{n}/" in path for n in COLUMN_PARALLEL):
        if is_kernel and ndim == 2:
            return P(None, "model")
        if is_bias and ndim == 1:
            return P("model")
    if any(f"/{n}/" in path for n in ROW_PARALLEL):
        if is_kernel and ndim == 2:
            return P("model", None)
        # row-parallel bias is added after the psum -> replicated
    return P()


def _path_str(path) -> str:
    parts = []
    for p in path:
        name = getattr(p, "key", getattr(p, "name", None))
        parts.append(str(name) if name is not None else str(p))
    return "/" + "/".join(parts) + "/"


def tree_shardings(tree: Any, mesh: Mesh) -> Any:
    """A NamedSharding pytree matching ``tree``, with TP specs where the
    path matches and replication elsewhere."""

    def assign(path, leaf):
        ps = _path_str(path)
        # strip the trailing slash so endswith checks see the leaf name
        ps_stripped = ps.rstrip("/")
        spec = spec_for_path(ps_stripped, getattr(leaf, "ndim", 0))
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, tree)


def shard_tree(tree: Any, mesh: Mesh) -> Any:
    """Device-put every leaf with its TP/replicated sharding."""
    shardings = tree_shardings(tree, mesh)
    return jax.tree.map(jax.device_put, tree, shardings)
