"""Tensor-parallel numerical equivalence (round-2 verdict, Weak #7).

`parallel/tp.py`'s Megatron column/row specs were previously validated
only by "dryrun loss is finite at model=2"; here the TP-sharded forward
AND gradients are pinned against the fully-replicated single-device
computation. GSPMD partitioning is semantics-preserving up to float
reduction order, so agreement is to tight f32 tolerance — a wrong spec
(e.g. splitting a kernel on the contracted dim without the matching
psum) breaks this loudly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_slam_master_tpu.models.backbone import ViTBackbone
from semantic_slam_master_tpu.parallel import mesh as mesh_lib, tp


@pytest.fixture(scope="module")
def tiny_model_and_params():
    # f32 keeps the replicated-vs-TP comparison at float tolerance
    # (production bf16 would fold dtype noise into the check).
    model = ViTBackbone(
        embed_dim=64, depth=2, num_heads=2, num_registers=1,
        pos_grid=4, dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(0)
    # batch 8: divisible by the data axis at every mesh shape below
    images = jax.random.uniform(jax.random.PRNGKey(1), (8, 64, 64, 3))
    variables = model.init(rng, images)
    return model, variables, images


def _loss_fn(model):
    def loss(variables, images):
        feats = model.apply(variables, images)
        return jnp.sum(feats.astype(jnp.float32) ** 2) / feats.size

    return loss


@pytest.mark.parametrize("num_model", [2, 4])
def test_tp_forward_and_grads_match_replicated(
    tiny_model_and_params, num_model
):
    model, variables, images = tiny_model_and_params
    loss = _loss_fn(model)

    ref_out = jax.jit(model.apply)(variables, images)
    ref_grad = jax.jit(jax.grad(loss))(variables, images)

    mesh = mesh_lib.make_mesh(num_model=num_model)
    tp_vars = tp.shard_tree(variables, mesh)
    x = jax.device_put(images, mesh_lib.data_sharding(mesh, images.ndim))

    tp_out = jax.jit(model.apply)(tp_vars, x)
    tp_grad = jax.jit(jax.grad(loss))(tp_vars, x)

    np.testing.assert_allclose(
        np.asarray(tp_out), np.asarray(ref_out), rtol=2e-4, atol=1e-5
    )
    flat_ref = jax.tree.leaves(ref_grad)
    flat_tp = jax.tree.leaves(tp_grad)
    assert len(flat_ref) == len(flat_tp)
    for a, b in zip(flat_ref, flat_tp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=1e-5
        )


def test_tp_specs_actually_shard(tiny_model_and_params):
    """The specs must place fc1/qkv on the model axis (not silently
    replicate) — otherwise the equivalence test proves nothing."""
    model, variables, _ = tiny_model_and_params
    mesh = mesh_lib.make_mesh(num_model=4)
    tp_vars = tp.shard_tree(variables, mesh)

    found_col = found_row = 0

    def visit(path, leaf):
        nonlocal found_col, found_row
        ps = tp._path_str(path)
        spec = leaf.sharding.spec
        if "/fc1/" in ps and ps.rstrip("/").endswith("kernel"):
            assert spec == jax.sharding.PartitionSpec(None, "model"), ps
            found_col += 1
        if "/fc2/" in ps and ps.rstrip("/").endswith("kernel"):
            assert spec == jax.sharding.PartitionSpec("model", None), ps
            found_row += 1

    jax.tree_util.tree_map_with_path(visit, tp_vars)
    assert found_col == 2 and found_row == 2  # one per block
