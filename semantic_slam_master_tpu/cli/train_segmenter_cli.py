"""Train the semantic segmentation CNN on the synthetic world.

The labels are rendered, not annotated, so this runs with no dataset on
disk. The resulting orbax checkpoint feeds ``run-slam --semantics model``
(semantic residual weighting — the mechanism that keeps SLAM accurate in
dynamic scenes like TUM fr3_walking_xyz, where the reference's ORB-SLAM3
baseline degrades to 0.4611 m ATE,
`experiments/baselines/orb_slam3/results.json:140`).
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None):
    parser = argparse.ArgumentParser(prog="train-segmenter", description=__doc__)
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--lr", type=float, default=3e-3)
    parser.add_argument("--height", type=int, default=120)
    parser.add_argument("--width", type=int, default=160)
    parser.add_argument("--model-width", type=int, default=32)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output", default="checkpoints/segmenter")
    args = parser.parse_args(argv)

    from ..train import seg_trainer

    model, params, metrics = seg_trainer.train(
        num_steps=args.steps,
        batch_size=args.batch_size,
        lr=args.lr,
        image_hw=(args.height, args.width),
        seed=args.seed,
        width=args.model_width,
    )
    out = Path(args.output)
    seg_trainer.save_checkpoint(out, params)
    print(
        f"saved segmenter checkpoint to {out} "
        f"(final loss={metrics['loss']:.4f}, acc={metrics['accuracy']:.3f})"
    )
    return 0


if __name__ == "__main__":  # direct `python -m ...cli.x` use
    import sys as _sys

    _sys.exit(main() or 0)
