"""Training CLI — `semantic-slam/train.py` main parity.

Loads a (reference-compatible) YAML config, builds frame-pair batches
from TUM sequences or the synthetic world, and runs the jitted
data-parallel training loop with console/JSONL/wandb metric sinks and
best-checkpoint retention.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def _synthetic_pair_batches(cfg, split_seed: int):
    """Frame-pair batches from the synthetic world (deterministic)."""
    from ..data import synthetic, tum as tum_mod

    seq = synthetic.make_sequence(
        num_frames=cfg.dataset.synthetic_frames,
        scale=cfg.model.input_size / 480.0,
        seed=split_seed,
    )
    frames = [seq.frame(i) for i in range(len(seq))]
    size = cfg.model.input_size
    rgbs = np.stack(
        [
            tum_mod.imagenet_normalize(
                tum_mod.resize_bilinear(f["rgb"], size, size)
            ).astype(np.float32)
            for f in frames
        ]
    )
    # Localization-loss supervision: depth at the training resolution,
    # intrinsics rescaled for the (anisotropic) resize, and GT relative
    # poses — the same quantities a TUM pair batch carries.
    depths = np.stack(
        [
            tum_mod.resize_nearest(f["depth"], size, size).astype(np.float32)
            for f in frames
        ]
    )
    h0, w0 = frames[0]["depth"].shape
    K = np.asarray(seq.cam.scaled(size / w0, size / h0).K, np.float32)
    poses = np.asarray(seq.poses_wc, np.float64)  # T_wc
    inv = np.linalg.inv

    def batches(epoch=0):
        rng = np.random.default_rng(1000 * split_seed + epoch)
        s_lo = cfg.dataset.frame_spacing
        s_hi = cfg.dataset.frame_spacing_max or s_lo
        idx = np.arange(len(frames) - s_hi)
        rng.shuffle(idx)
        b = cfg.training.batch_size
        for start in range(0, len(idx) - b + 1, b):
            sel = idx[start : start + b]
            # Per-item spacing: wide baselines are what teach sub-patch
            # localization (a patch-center match is off by several px at
            # spacing 5, well past the 3 px repeatability tolerance).
            sp = rng.integers(s_lo, s_hi + 1, size=len(sel))
            rel = np.stack(
                [inv(poses[j + s]) @ poses[j] for j, s in zip(sel, sp)]
            ).astype(np.float32)
            yield {
                "rgb1": rgbs[sel],
                "rgb2": rgbs[sel + sp],
                "depth1": depths[sel],
                # Per-item K so the batch shards uniformly over 'data'.
                "K": np.repeat(K[None], len(sel), axis=0),
                "rel_pose": rel,
            }

    return batches


def _tum_pair_batches(cfg, sequences, is_train: bool):
    from ..data.tum import AugmentationConfig, TUMSequence, batch_pairs

    aug_cfg = cfg.dataset.augmentation
    aug = (
        AugmentationConfig(
            enabled=aug_cfg.enabled,
            brightness=aug_cfg.brightness,
            contrast=aug_cfg.contrast,
            saturation=aug_cfg.saturation,
            hue=aug_cfg.hue,
            gaussian_blur=aug_cfg.gaussian_blur,
        )
        if is_train
        else None
    )
    datasets = []
    for name in sequences:
        try:
            datasets.append(
                TUMSequence(
                    cfg.dataset.root,
                    name,
                    input_size=cfg.model.input_size,
                    frame_spacing=cfg.dataset.frame_spacing,
                    max_frames=cfg.dataset.max_frames,
                    augmentation=aug,
                )
            )
        except FileNotFoundError as e:
            print(f"[train] skipping {name}: {e}", file=sys.stderr)
    if not datasets:
        raise FileNotFoundError("no TUM sequences available")

    index = [(d, i) for d in datasets for i in range(len(d))]

    def batches(epoch=0):
        rng = np.random.default_rng(epoch if is_train else 12345)
        order = np.arange(len(index))
        if is_train:
            rng.shuffle(order)
        b = cfg.training.batch_size
        for start in range(0, len(order) - b + 1, b):
            pairs = []
            for k in order[start : start + b]:
                d, i = index[k]
                seed = int(rng.integers(0, 2**31)) if is_train else None
                pairs.append(d.pair(i, seed=seed))
            batch = batch_pairs(pairs)
            yield {"rgb1": batch["rgb1"], "rgb2": batch["rgb2"]}

    return batches


def main(argv=None):
    parser = argparse.ArgumentParser(prog="train", description=__doc__)
    parser.add_argument("--config", default=None, help="YAML config path")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--steps-per-epoch", type=int, default=None)
    parser.add_argument("--save-dir", default=None)
    parser.add_argument("--jsonl-log", default=None)
    args = parser.parse_args(argv)

    from ..train import config as config_mod, trainer
    from ..utils import sinks

    cfg = config_mod.load_config(args.config)
    if args.synthetic:
        cfg.dataset.synthetic = True
    if args.epochs:
        cfg.training.epochs = args.epochs
    if args.save_dir:
        cfg.training.save_dir = args.save_dir

    if cfg.dataset.synthetic:
        train_batches = _synthetic_pair_batches(cfg, split_seed=0)
        val_batches_fn = _synthetic_pair_batches(cfg, split_seed=1)
        val_batches = lambda: val_batches_fn(0)
    else:
        train_batches = _tum_pair_batches(cfg, cfg.dataset.train_sequences, True)
        val_fn = _tum_pair_batches(cfg, cfg.dataset.val_sequences, False)
        val_batches = lambda: val_fn(0)

    sink_list = [sinks.ConsoleSink()]
    if args.jsonl_log:
        sink_list.append(sinks.JsonlSink(args.jsonl_log))
    if cfg.logging.use_wandb:
        sink_list.append(
            sinks.WandbSink(cfg.logging.project, cfg.logging.run_name,
                            config_mod.to_dict(cfg))
        )
    sink = sinks.MultiSink(sink_list)

    steps = args.steps_per_epoch or cfg.training.steps_per_epoch or 16
    try:
        state, history = trainer.fit(
            cfg, train_batches, val_batches, steps_per_epoch=steps, log_fn=sink.log
        )
    finally:
        sink.close()
    print(f"done; best checkpoint in {Path(cfg.training.save_dir) / 'best_model'}")
    return 0
