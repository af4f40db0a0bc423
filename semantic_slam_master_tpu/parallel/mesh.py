"""Device mesh + sharding helpers.

The reference has no multi-device story at all (SURVEY.md §2.3); here
parallelism is first-class. The canonical layout is a 2-D
``('data', 'model')`` mesh over a v5e-8 slice:

- **data**: frame pairs / frames / evaluation sequences shard across
  this axis; the only training-time collective is the gradient psum XLA
  inserts over ICI.
- **model**: reserved for tensor-parallel sharding of the ViT MLP /
  attention heads (sized 1 by default at ViT-S scale; the axis exists so
  larger backbones are a config change, not a rewrite).

Everything is expressed with `jax.sharding.NamedSharding` + jit
constraints; XLA chooses the collectives (scaling-book recipe: pick a
mesh, annotate shardings, let XLA insert collectives).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_data: Optional[int] = None,
    num_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults to all visible devices on
    the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_model
    assert num_data * num_model == len(devices), (
        f"mesh {num_data}x{num_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(num_data, num_model)
    return Mesh(arr, axis_names=("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with the batch axis sharded over
    'data' — the host->HBM boundary of the input pipeline."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch
    )


def replicate(mesh: Mesh, tree):
    return jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), tree)
