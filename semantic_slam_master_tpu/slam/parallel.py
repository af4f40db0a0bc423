"""Fleet SLAM: independent sequences sharded one-per-device over a mesh.

The TPU-first scale-out SURVEY.md §2.3(b) prescribes for inference: the
sequential tracking/BA state is tiny but frame-order-dependent, so the
way to use N chips is N *sequences* (or N disjoint chunks of one long
sequence) concurrently — not intra-frame parallelism. The reference has
no equivalent (single GPU, SLAM delegated to external C++).

`shard_map` (not vmap) is the load-bearing choice: each device runs the
UNBATCHED `run_slam` program, so the keyframe branch stays a real
`lax.cond` — batching it with vmap would lower to select() and execute
window BA on every frame of every sequence, throwing away the keyframe
policy's ~10x compute saving. Sequences are independent: no collectives
are needed or emitted; scaling is embarrassingly linear over ICI-
connected chips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.camera import PinholeCamera
from .system import SlamConfig, SlamOutput, run_slam
from .tracking import FrameFeatures


@partial(jax.jit, static_argnames=("cam", "cfg", "mesh"))
def run_slam_fleet(
    keys: jax.Array,
    features: FrameFeatures,
    cam: PinholeCamera,
    cfg: SlamConfig,
    mesh: Mesh,
) -> SlamOutput:
    """Run S independent SLAM sequences, sharded over ``mesh``'s 'data'
    axis.

    keys: (S, 2) one PRNG key per sequence; ``features`` leaves are
    (S, F, ...). S must be a multiple of the data-axis size; each device
    scans its S/devices sequences one after another (`lax.map`, which
    preserves the per-frame `lax.cond` keyframe branch). Returns
    SlamOutput with a leading (S,) axis.
    """
    num_data = mesh.shape["data"]
    S = keys.shape[0]
    assert S % num_data == 0, f"{S} sequences over {num_data} devices"

    def per_device(keys, feats):
        # keys: (S/dev, 2); feats leaves: (S/dev, F, ...)
        def one(args):
            k, f = args
            return run_slam(k, f, cam, cfg)

        return jax.lax.map(one, (keys, feats))

    spec = P("data")
    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(keys, features)
