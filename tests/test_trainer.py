import numpy as np
import jax
import jax.numpy as jnp
import pytest

from semantic_slam_master_tpu.parallel import mesh as mesh_lib
from semantic_slam_master_tpu.train import config as config_mod
from semantic_slam_master_tpu.train import trainer

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)


def tiny_config(tmp_path=None):
    cfg = config_mod.Config()
    cfg.model.input_size = 64
    cfg.model.backbone_depth = 2
    cfg.model.backbone_dim = 64
    cfg.model.backbone_heads = 2
    cfg.model.selector_hidden = 32
    cfg.model.refiner_hidden = 64
    cfg.model.refiner_layers = 3
    cfg.model.descriptor_dim = 32
    cfg.model.estimator_hidden = 32
    cfg.model.num_keypoints = 16
    cfg.training.epochs = 2
    cfg.training.batch_size = 8
    cfg.training.warmup_epochs = 0
    if tmp_path is not None:
        cfg.training.save_dir = str(tmp_path / "ckpt")
    return cfg


def _batch(rng, b=8, size=64):
    return {
        "rgb1": rng.normal(size=(b, size, size, 3)).astype(np.float32),
        "rgb2": rng.normal(size=(b, size, size, 3)).astype(np.float32),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    mesh = mesh_lib.make_mesh()
    model, state = trainer.create_train_state(cfg, steps_per_epoch=4)
    state = mesh_lib.replicate(mesh, state)
    tx = trainer.build_optimizer(cfg, 4)
    step = trainer.make_train_step(model, cfg, tx, mesh)
    return cfg, mesh, model, state, step


def test_train_step_runs_and_updates(setup, rng):
    cfg, mesh, model, state, step = setup
    batch = mesh_lib.shard_batch(mesh, _batch(rng))
    before = jax.tree.map(lambda x: np.asarray(x).copy(), jax.device_get(state.trainable))
    state2, out = step(state, batch)
    assert np.isfinite(float(out["loss"]))
    assert not bool(out["skipped"])
    assert int(state2.step) == int(np.asarray(jax.device_get(state2.step)))
    after = jax.device_get(state2.trainable)
    diffs = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - b).max()), after, before)
    assert max(jax.tree.leaves(diffs)) > 0.0
    # loss component keys mirror the reference's streams (train.py:204-221)
    for k in ("desc", "variance", "repeat", "peakiness", "activation", "edge",
              "sparsity", "num_matches", "descriptor_variance"):
        assert k in out


def test_nan_batch_skipped(setup, rng):
    cfg, mesh, model, state, step = setup
    batch = _batch(rng)
    batch["rgb1"][:] = np.nan
    batch = mesh_lib.shard_batch(mesh, batch)
    # re-create state because the previous test's step donated it
    model2, state = trainer.create_train_state(cfg, steps_per_epoch=4)
    state = mesh_lib.replicate(mesh, state)
    before = jax.tree.map(lambda x: np.asarray(x).copy(), jax.device_get(state.trainable))
    state2, out = step(state, batch)
    assert bool(out["skipped"])
    after = jax.device_get(state2.trainable)
    diffs = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - b).max()), after, before)
    assert max(jax.tree.leaves(diffs)) == 0.0  # params untouched
    assert int(jax.device_get(state2.step)) == 1  # step still counts


def test_checkpoint_roundtrip(tmp_path, rng):
    cfg = tiny_config(tmp_path)
    model, state = trainer.create_train_state(cfg, steps_per_epoch=2)
    trainer.save_checkpoint(tmp_path / "ck", jax.device_get(state), {"epoch": 3})
    # perturb, then restore
    import dataclasses

    perturbed = dataclasses.replace(
        state, trainable=jax.tree.map(lambda x: x + 1.0, state.trainable)
    )
    restored, meta = trainer.restore_checkpoint(tmp_path / "ck", perturbed)
    diff = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        restored.trainable,
        state.trainable,
    )
    assert max(jax.tree.leaves(diff)) == 0.0
    assert meta["epoch"] == 3


def test_checkpoint_params_only(tmp_path, rng):
    """Committed-artifact format: no opt state / PRNG; params, batch
    stats, and step restore; optimizer state keeps the template's."""
    import dataclasses

    cfg = tiny_config(tmp_path)
    model, state = trainer.create_train_state(cfg, steps_per_epoch=2)
    state = dataclasses.replace(state, step=state.step + 7)
    trainer.save_checkpoint(
        tmp_path / "ck", jax.device_get(state), {"epoch": 5}, params_only=True
    )
    model2, fresh = trainer.create_train_state(cfg, steps_per_epoch=2)
    perturbed = dataclasses.replace(
        fresh, trainable=jax.tree.map(lambda x: x + 1.0, fresh.trainable)
    )
    restored, meta = trainer.restore_checkpoint(tmp_path / "ck", perturbed)
    diff = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        restored.trainable,
        state.trainable,
    )
    assert max(jax.tree.leaves(diff)) == 0.0
    assert int(restored.step) == 7
    assert meta["params_only"] is True and meta["epoch"] == 5


def test_fit_saves_best(tmp_path, rng):
    cfg = tiny_config(tmp_path)
    cfg.training.epochs = 2

    def train_batches(epoch):
        for _ in range(2):
            yield _batch(rng)

    def val_batches():
        r = np.random.default_rng(42)  # fixed val set
        yield _batch(r)

    state, history = trainer.fit(
        cfg, train_batches, val_batches, steps_per_epoch=2
    )
    assert len(history["train"]) == 2
    assert len(history["val"]) == 2
    assert (tmp_path / "ckpt" / "best_model").exists()
    assert np.isfinite(history["train"][-1]["loss"])


def test_fit_resume_continues(tmp_path, rng):
    """True resume: epoch loop picks up at meta epoch + 1, optimizer
    step count carries over, best-val retention keeps the saved value."""
    import json

    cfg = tiny_config(tmp_path)
    cfg.training.epochs = 2

    def train_batches(epoch):
        for _ in range(2):
            yield _batch(rng)

    def val_batches():
        r = np.random.default_rng(42)
        yield _batch(r)

    trainer.fit(cfg, train_batches, val_batches, steps_per_epoch=2)
    ck = tmp_path / "ckpt" / "best_model"
    meta = json.loads((ck.parent / "best_model.meta.json").read_text())
    saved_epoch = meta["epoch"]
    assert meta["params_only"] is False  # fit saves full state

    cfg.training.epochs = 3
    state, history = trainer.fit(
        cfg, train_batches, val_batches, steps_per_epoch=2, resume_from=ck
    )
    epochs_run = [m["epoch"] for m in history["train"]]
    assert epochs_run == list(range(saved_epoch + 1, 4))
    # step continued from the checkpoint (2 steps/epoch in both runs)
    assert int(jax.device_get(state.step)) == 2 * 3

    # params-only checkpoints are refused (no optimizer state to resume)
    trainer.save_checkpoint(
        tmp_path / "po", jax.device_get(state), {"epoch": 3}, params_only=True
    )
    with pytest.raises(ValueError, match="params-only"):
        trainer.fit(
            cfg, train_batches, val_batches, steps_per_epoch=2,
            resume_from=tmp_path / "po",
        )


def test_config_loads_reference_yaml(tmp_path):
    """The reference's train_config.yaml keys load without loss."""
    yaml_text = """
model:
  input_size: 448
  num_keypoints: 500
  selector_hidden: 256
  descriptor_dim: 128
  refiner_hidden: 384
  refiner_layers: 4
dataset:
  root: "data/tum_rgbd"
  train_sequences: ["rgbd_dataset_freiburg1_desk"]
  frame_spacing: 1
  augmentation:
    enabled: true
    brightness: 0.2
loss:
  weights:
    desc: 8.0
    repeat: 0.3
    variance: 0.5
    peakiness: 0.1
    activation: 0.05
    edge: 0.3
    sparsity: 0.3
  desc_temperature: 0.10
training:
  epochs: 60
  batch_size: 4
  lr: 1e-4
  lr_min: 1e-6
  grad_clip: 1.0
logging:
  use_wandb: false
"""
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml_text)
    cfg = config_mod.load_config(p)
    assert cfg.model.num_keypoints == 500
    assert cfg.loss.weights["desc"] == 8.0
    assert cfg.training.lr == 1e-4
    assert cfg.dataset.augmentation.brightness == 0.2


def test_estimator_receives_gradient(setup, rng):
    """Round-1 gap: the uncertainty head had zero gradient. With the
    calibration/expected-error losses in the step, its params must move."""
    cfg, mesh, model, _, step = setup
    # The jitted step donates its input state, so the module fixture's
    # state is consumed by whichever test runs first — build a fresh one
    # (same shapes, so the compiled step is reused).
    _, state = trainer.create_train_state(cfg, steps_per_epoch=4)
    state = mesh_lib.replicate(mesh, state)
    batch = mesh_lib.shard_batch(mesh, _batch(rng))
    before = jax.device_get(state.trainable["estimator"])
    state2, out = step(state, batch)
    after = jax.device_get(state2.trainable["estimator"])
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()), after, before
    )
    assert max(jax.tree.leaves(diffs)) > 0.0
    assert np.isfinite(float(out["calibration"]))
    assert np.isfinite(float(out["expected_error"]))


def test_localization_loss_wired_through_train_step(rng):
    """With subpatch_refine on + localization weight + pose/depth extras,
    the train step reports a finite localization component and the
    selector still receives gradient."""
    cfg = tiny_config()
    cfg.model.subpatch_refine = True
    cfg.loss.weights = dict(cfg.loss.weights, localization=0.5)
    mesh = mesh_lib.make_mesh()
    model, state = trainer.create_train_state(cfg, steps_per_epoch=2)
    state = mesh_lib.replicate(mesh, state)
    tx = trainer.build_optimizer(cfg, 2)
    step = trainer.make_train_step(model, cfg, tx, mesh)

    b, size = 8, 64
    batch = {
        "rgb1": rng.normal(size=(b, size, size, 3)).astype(np.float32),
        "rgb2": rng.normal(size=(b, size, size, 3)).astype(np.float32),
        "depth1": np.full((b, size, size), 2.0, np.float32),
        "K": np.repeat(
            np.array([[[80.0, 0, 32], [0, 80, 32], [0, 0, 1]]], np.float32),
            b, axis=0,
        ),
        # Small translation: same-cell matches then carry a ~2 px
        # residual (identity pose gives exactly-zero or outlier-masked
        # residuals -> no gradient by construction).
        "rel_pose": np.repeat(
            np.array(
                [[1, 0, 0, 0.05], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
                np.float32,
            )[None],
            b, axis=0,
        ),
    }
    batch = mesh_lib.shard_batch(mesh, batch)
    before = jax.tree.map(
        lambda x: np.asarray(x).copy(),
        jax.device_get(state.trainable["offset_head"]),
    )
    state2, out = step(state, batch)
    assert "localization" in out
    assert np.isfinite(float(out["localization"]))
    assert np.isfinite(float(out["loss"]))
    # The offset head must be IN the trainable partition and receive
    # gradient from the localization loss (it has no other signal).
    after = jax.device_get(state2.trainable["offset_head"])
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), after, before
    )
    assert max(jax.tree.leaves(diffs)) > 0.0
