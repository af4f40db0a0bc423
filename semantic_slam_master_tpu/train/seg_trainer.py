"""Segmenter training on the synthetic world (labels come free).

The reference never trains its semantic component — segmentation exists
only as a *concept* behind the uncertainty/semantic weighting hooks
(`semantic-slam/models/uncertainty_estimator.py:4`). Here the synthetic
world (data/synthetic.py) renders perfect per-pixel labels including the
dynamic CLASS_PERSON, so the SemanticSegmenter can be trained end-to-end
with no dataset on disk, checkpointed with orbax, and dropped into the
SLAM CLI (`run-slam --semantics model --segmenter-checkpoint ...`).

Data-parallel over a ('data',) mesh when more than one device is
available; the model is tiny so DP is the only sharding that pays.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import segmenter as seg_mod


def synthetic_label_batches(
    batch_size: int,
    image_hw: Tuple[int, int] = (120, 160),
    seed: int = 0,
    num_frames: int = 64,
    dynamic: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """Endless (rgb, labels) batches rendered from the synthetic world.

    Frames are rendered once (host, numpy) and cycled with random crops
    flips — segmentation of a procedural world needs variety, not volume.
    """
    from ..data import synthetic
    from ..core.camera import TUM_FR2

    h, w = image_hw
    cam = TUM_FR2.scaled(w / TUM_FR2.width, h / TUM_FR2.height)
    make = synthetic.make_dynamic_sequence if dynamic else synthetic.make_sequence
    rng = np.random.default_rng(seed)
    # Two worlds with different texture seeds: train variety.
    frames = []
    for s in (seed, seed + 1):
        seq = make(num_frames=num_frames // 2, cam=cam, seed=s)
        for i in range(len(seq)):
            f = seq.frame(i)
            frames.append((f["rgb"], f["labels"]))
    while True:
        idx = rng.integers(0, len(frames), size=batch_size)
        rgb = np.stack([frames[i][0] for i in idx])
        lab = np.stack([frames[i][1] for i in idx])
        flip = rng.random(batch_size) < 0.5
        rgb[flip] = rgb[flip, :, ::-1]
        lab[flip] = lab[flip, :, ::-1]
        # Brightness/color jitter so the net can't memorize absolute color.
        gain = rng.uniform(0.7, 1.3, size=(batch_size, 1, 1, 3)).astype(np.float32)
        bias = rng.uniform(-0.08, 0.08, size=(batch_size, 1, 1, 3)).astype(np.float32)
        rgb = np.clip(rgb * gain + bias, 0.0, 1.0)
        yield {"rgb": rgb.astype(np.float32), "labels": lab.astype(np.int32)}


def make_train_step(model: seg_mod.SemanticSegmenter, tx: optax.GradientTransformation):
    def loss_fn(params, batch):
        logits = model.apply({"params": params}, batch["rgb"], train=True)
        loss = seg_mod.segmentation_loss(logits, batch["labels"])
        acc = jnp.mean(jnp.argmax(logits, -1) == batch["labels"])
        return loss, acc

    @jax.jit
    def step(params, opt_state, batch):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "accuracy": acc}

    return step


def train(
    num_steps: int = 300,
    batch_size: int = 8,
    lr: float = 3e-3,
    image_hw: Tuple[int, int] = (120, 160),
    seed: int = 0,
    width: int = 32,
    log_every: int = 25,
    verbose: bool = True,
):
    """Train the segmenter on synthetic frames; returns (model, params,
    final metrics)."""
    model = seg_mod.SemanticSegmenter(width=width)
    rng = jax.random.PRNGKey(seed)
    params = model.init(rng, jnp.zeros((1, *image_hw, 3)))["params"]
    tx = optax.adamw(optax.cosine_decay_schedule(lr, num_steps), weight_decay=1e-4)
    opt_state = tx.init(params)
    step = make_train_step(model, tx)

    data = synthetic_label_batches(batch_size, image_hw, seed=seed)
    metrics = {}
    for i in range(num_steps):
        batch = next(data)
        params, opt_state, metrics = step(params, opt_state, batch)
        if verbose and (i % log_every == 0 or i == num_steps - 1):
            m = jax.device_get(metrics)
            print(f"step {i}: loss={m['loss']:.4f} acc={m['accuracy']:.3f}")
    return model, params, jax.device_get(metrics)


def save_checkpoint(path: str | Path, params) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": params}, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str | Path):
    """Restore segmenter params (template-free: shapes come from the
    checkpoint itself, so any model width round-trips).

    Restores as host numpy arrays: a template-free jax.Array restore
    replays the SAVED shardings, which names devices of the saving
    process (e.g. ``TFRT_CPU_0``) and fails when loading a CPU-trained
    checkpoint on the TPU backend. The caller's first jit call moves the
    params to device."""
    import numpy as np
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path).item_metadata
    tree = meta.tree if hasattr(meta, "tree") else meta
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), dict(tree)
    )
    restored = ckptr.restore(path, restore_args=restore_args)
    return restored["params"]
