"""``python -m semantic_slam_master_tpu <command>`` dispatcher."""

from __future__ import annotations

import sys

COMMANDS = {
    "train": ("semantic_slam_master_tpu.cli.train_cli", "training CLI (train.py parity)"),
    "train-segmenter": ("semantic_slam_master_tpu.cli.train_segmenter_cli", "train the semantic segmentation CNN (synthetic labels)"),
    "run-slam": ("semantic_slam_master_tpu.cli.run_slam_cli", "full-sequence SLAM -> TUM trajectories"),
    "evaluate": ("semantic_slam_master_tpu.cli.evaluate_cli", "ATE/RPE evaluation (evaluate_baseline.py parity)"),
    "run-tests": ("semantic_slam_master_tpu.cli.run_tests_cli", "four-test acceptance suite"),
    "associate": ("semantic_slam_master_tpu.cli.associate_cli", "rgb/depth timestamp association"),
    "check-setup": ("semantic_slam_master_tpu.cli.check_setup_cli", "environment/dataset checks"),
    "download-tum": ("semantic_slam_master_tpu.cli.download_tum_cli", "TUM RGB-D downloader"),
    "visualize": ("semantic_slam_master_tpu.cli.visualize_cli", "saliency/match visualizations"),
    "bench": ("semantic_slam_master_tpu.cli.bench_cli", "per-stage performance report"),
}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m semantic_slam_master_tpu <command> [args]\n")
        for name, (_, desc) in COMMANDS.items():
            print(f"  {name:<14} {desc}")
        return 0
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"unknown command: {cmd}", file=sys.stderr)
        return 2
    module_name, _ = COMMANDS[cmd]
    import importlib

    module = importlib.import_module(module_name)
    return module.main(argv[1:]) or 0


if __name__ == "__main__":
    sys.exit(main())
