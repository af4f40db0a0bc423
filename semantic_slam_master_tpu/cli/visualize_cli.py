"""Saliency / match visualizations — `visualize*.py` parity.

Subcommands:
- ``saliency``: the 9-panel edge-aware dashboard (EdgeAwareVisualizer)
- ``matches``: two-frame side-by-side match plot (MatchVisualizer)
- ``sequence``: multi-spacing match grid (SequenceMatcher)
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def _load_sequence(args):
    if args.synthetic:
        from ..data import synthetic

        return synthetic.make_sequence(num_frames=args.frames, scale=args.scale)
    from ..data.tum import TUMSequence

    return TUMSequence(args.data_root, args.sequence)


def _orb_extract_and_match(num_keypoints=400):
    import jax.numpy as jnp

    from ..eval.frontend_tests import orb_adapter

    adapter = orb_adapter(num_keypoints=num_keypoints)

    def fn(rgb1, rgb2):
        feats = adapter.extract(np.stack([rgb1, rgb2]))
        m = adapter.match(feats, 0, 1)
        sims = np.ones(len(m))
        return feats["xy"][0], feats["xy"][1], m, sims

    return fn


def main(argv=None):
    parser = argparse.ArgumentParser(prog="visualize", description=__doc__)
    parser.add_argument("mode", choices=("saliency", "matches", "sequence"))
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--data-root", default="data/tum_rgbd")
    parser.add_argument("--sequence", default="rgbd_dataset_freiburg1_desk")
    parser.add_argument("--frames", type=int, default=25)
    parser.add_argument("--scale", type=float, default=0.5)
    parser.add_argument("--frame", type=int, default=0)
    parser.add_argument("--frame2", type=int, default=1)
    parser.add_argument("--spacings", nargs="*", type=int, default=(1, 5, 10, 15, 20))
    parser.add_argument("--checkpoint", default=None,
                        help="learned-frontend checkpoint for saliency mode")
    parser.add_argument("--output", default=None)
    args = parser.parse_args(argv)

    seq = _load_sequence(args)
    out_dir = Path(args.output or "visualizations")

    if args.mode == "saliency":
        frame = seq.frame(args.frame)
        rgb = frame["rgb"]
        if args.checkpoint:
            import jax.numpy as jnp

            from ..train import config as config_mod, trainer
            from ..models.frontend import LearnedFrontend

            cfg = config_mod.Config()
            model, state = trainer.create_train_state(cfg, 1)
            state, _ = trainer.restore_checkpoint(args.checkpoint, state)
            variables = {
                "params": trainer.merge_params(state.trainable, state.frozen),
                "batch_stats": state.batch_stats,
            }
            out = model.apply(variables, jnp.asarray(rgb)[None])
            sal = np.asarray(out.saliency)[0, ..., 0]
            kpts = np.asarray(out.keypoints_px)[0]
        else:
            # ORB path: FAST score map pooled to patch resolution as the
            # "saliency" analogue + FAST keypoints
            import jax.numpy as jnp

            from ..ops import fast, image

            gray = image.rgb_to_gray(jnp.asarray(rgb)[None])
            score = fast.fast_score(gray, 0.05)
            h, w = score.shape[1] // 16, score.shape[2] // 16
            sal = np.asarray(image.avg_pool_to(score[:, : h * 16, : w * 16], h, w))[0]
            sal = sal / (sal.max() + 1e-8)
            kp = fast.detect(gray, 400, 0.05)
            kpts = np.asarray(kp.xy)[0][np.asarray(kp.valid)[0]]
        from ..viz.saliency import saliency_dashboard

        stats = saliency_dashboard(
            rgb, sal, kpts, out_dir / "saliency_analysis.png"
        )
        print(stats)
        print(f"wrote {out_dir / 'saliency_analysis.png'}")

    elif args.mode == "matches":
        f1 = seq.frame(args.frame)
        f2 = seq.frame(args.frame2)
        k1, k2, m, sims = _orb_extract_and_match()(f1["rgb"], f2["rgb"])
        from ..viz.matches import draw_matches

        draw_matches(
            f1["rgb"], f2["rgb"], k1, k2, m, sims,
            out_dir / "matches.png",
            title=f"frames {args.frame}->{args.frame2}",
        )
        print(f"{len(m)} matches; wrote {out_dir / 'matches.png'}")

    else:  # sequence
        n = seq.num_frames() if hasattr(seq, "num_frames") else len(seq)
        frames = [seq.frame(i)["rgb"] for i in range(min(n, max(args.spacings) + 1))]
        from ..viz.matches import sequence_match_grid

        counts = sequence_match_grid(
            frames, _orb_extract_and_match(), args.spacings,
            out_dir / "matches_sequence.png",
        )
        print(counts)
        print(f"wrote {out_dir / 'matches_sequence.png'}")
    return 0


if __name__ == "__main__":  # direct `python -m ...cli.x` use
    import sys as _sys

    _sys.exit(main() or 0)
