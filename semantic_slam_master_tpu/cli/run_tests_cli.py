"""The four-test acceptance suite — `run_all_tests.py` parity.

Difficulty presets, the train/test-overlap guard
(`run_all_tests.py:38-60` — here a hard flag instead of an interactive
confirm), JSON results, and per-test pass/fail against the reference
thresholds.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main(argv=None):
    parser = argparse.ArgumentParser(prog="run-tests", description=__doc__)
    parser.add_argument(
        "--frontend", choices=("orb", "orb-pyramid", "learned"),
        default="orb-pyramid",
        help="default is the production multi-scale path that ships into "
             "SLAM (slam/tracking.extract_features)",
    )
    parser.add_argument("--num-levels", type=int, default=4,
                        help="pyramid levels for --frontend orb-pyramid")
    parser.add_argument("--checkpoint", default=None,
                        help="orbax checkpoint for the learned frontend")
    parser.add_argument("--config", default=None,
                        help="training YAML the checkpoint was produced "
                             "with (model dims must match)")
    parser.add_argument("--difficulty",
                        choices=("easy", "normal", "hard", "extreme"),
                        default="normal")
    parser.add_argument("--data-root", default="data/tum_rgbd")
    parser.add_argument("--sequences", nargs="*", default=None)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--synthetic-frames", type=int, default=40)
    parser.add_argument("--train-sequences", nargs="*", default=None,
                        help="training sequences, for the overlap guard")
    parser.add_argument("--allow-train-overlap", action="store_true")
    parser.add_argument("--no-performance", action="store_true")
    parser.add_argument("--output", default="test_results.json")
    parser.add_argument("--no-plots", action="store_true",
                        help="skip the per-sequence PNG dashboard "
                             "(reference parity: every test script emits "
                             "one, test_repeatability.py:389-408)")
    args = parser.parse_args(argv)

    from ..eval import frontend_tests

    # ---- data hygiene guard (`run_all_tests.py:38-60`) ----
    if args.train_sequences and args.sequences:
        overlap = frontend_tests.check_sequence_overlap(
            args.sequences, args.train_sequences
        )
        if overlap and not args.allow_train_overlap:
            print(
                "WARNING: evaluating on training sequences (inflated results): "
                f"{overlap}\nPass --allow-train-overlap to proceed.",
                file=sys.stderr,
            )
            return 1

    # ---- frontend adapter ----
    if args.frontend == "orb":
        adapter = frontend_tests.orb_adapter()
    elif args.frontend == "orb-pyramid":
        # The production multi-scale path that feeds full SLAM.
        adapter = frontend_tests.pyramid_orb_adapter(
            num_levels=args.num_levels
        )
    else:
        import jax
        import jax.numpy as jnp

        from ..train import config as config_mod, trainer

        cfg = config_mod.load_config(args.config)
        model, state = trainer.create_train_state(cfg, steps_per_epoch=1)
        if args.checkpoint:
            state, _ = trainer.restore_checkpoint(args.checkpoint, state)
        variables = {
            "params": trainer.merge_params(state.trainable, state.frozen),
            "batch_stats": state.batch_stats,
        }
        adapter = frontend_tests.learned_adapter(
            model, variables, input_size=cfg.model.input_size
        )

    # ---- sequence sources ----
    seqs = {}
    if args.synthetic:
        from ..data import synthetic

        seqs["synthetic_room"] = synthetic.make_sequence(
            num_frames=args.synthetic_frames, scale=0.5
        )
    else:
        from ..data.tum import TUMSequence

        for name in args.sequences or ["rgbd_dataset_freiburg1_desk"]:
            try:
                seqs[name] = TUMSequence(args.data_root, name)
            except FileNotFoundError as e:
                print(f"[run-tests] {name}: {e}", file=sys.stderr)

    if not seqs:
        print("no sequences available", file=sys.stderr)
        return 1

    all_results = {}
    for name, seq in seqs.items():
        print(f"== {name} ==")
        r = frontend_tests.run_all(
            seq, adapter, difficulty=args.difficulty,
            with_performance=not args.no_performance,
        )
        all_results[name] = r
        for rep in r["repeatability"]:
            print(
                f"  repeatability (spacing {rep['spacing']}): "
                f"{rep['mean_repeatability']:.3f} (target {rep['target']}) "
                f"{'PASS' if rep['passed'] else 'FAIL'}"
            )
        dq = r["descriptor_quality"]
        print(
            f"  descriptor quality: inlier {dq['inlier_ratio']:.3f} "
            f"precision {dq['precision']:.3f} "
            f"{'PASS' if dq['passed'] else 'FAIL'}"
        )
        for tr in r["tracking"]:
            print(
                f"  tracking (spacing {tr['spacing']}): "
                f"{tr['success_rate']:.3f} {'PASS' if tr['passed'] else 'FAIL'}"
            )
        if "performance" in r and "fps" in r["performance"]:
            print(f"  performance: {r['performance']['fps']:.1f} FPS")
        print(f"  => {'ALL PASS' if r['all_passed'] else 'FAILURES'}")
        if not args.no_plots:
            from ..viz import test_dashboard

            png = f"{Path(args.output).with_suffix('').as_posix()}_{name}.png"
            try:
                test_dashboard.acceptance_dashboard(r, png, sequence=name)
                print(f"  dashboard: {png}")
            except Exception as e:  # plots must never fail the suite
                print(f"  dashboard failed: {e}", file=sys.stderr)

    def strip_per_pair(obj):
        if isinstance(obj, dict):
            return {k: strip_per_pair(v) for k, v in obj.items() if k != "per_pair"}
        if isinstance(obj, list):
            return [strip_per_pair(v) for v in obj]
        return obj

    Path(args.output).write_text(json.dumps(strip_per_pair(all_results), indent=2))
    print(f"results: {args.output}")
    return 0 if all(r["all_passed"] for r in all_results.values()) else 1


if __name__ == "__main__":  # direct `python -m ...cli.x` use
    import sys as _sys

    _sys.exit(main() or 0)
