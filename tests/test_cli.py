import json
import os

import numpy as np
import pytest

from semantic_slam_master_tpu.__main__ import main

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)


def test_dispatcher_help(capsys):
    assert main([]) == 0
    out = capsys.readouterr().out
    for cmd in ("train", "run-slam", "evaluate", "run-tests", "associate",
                "check-setup", "visualize"):
        assert cmd in out


def test_dispatcher_unknown():
    assert main(["no-such-command"]) == 2


def test_check_setup():
    assert main(["check-setup"]) == 0


def test_associate_cli(tmp_path, capsys):
    rgb = tmp_path / "rgb.txt"
    depth = tmp_path / "depth.txt"
    rgb.write_text("# hdr\n1.00 rgb/1.png\n1.03 rgb/2.png\n")
    depth.write_text("1.01 depth/1.png\n1.04 depth/2.png\n")
    out = tmp_path / "assoc.txt"
    assert main(["associate", str(rgb), str(depth), "-o", str(out)]) == 0
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 2


def test_run_slam_and_evaluate(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    rc = main([
        "run-slam", "--synthetic", "--synthetic-frames", "8",
        "--output-dir", "traj", "--num-keypoints", "200",
        "--num-landmarks", "512", "--window-size", "3", "--ba-iters", "2",
    ])
    assert rc == 0
    assert (tmp_path / "traj" / "synthetic_room_trajectory.txt").exists()
    rc = main(["evaluate", "--trajectories", "traj", "--rpe-delta", "2"])
    assert rc == 0
    results = json.loads((tmp_path / "traj" / "results.json").read_text())
    assert results["synthetic_room"]["status"] == "success"
    assert results["synthetic_room"]["ate"]["rmse"] < 0.15  # full-res, few frames
    assert (tmp_path / "traj" / "plots" / "synthetic_room_trajectory.png").exists()


def test_run_tests_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = main([
        "run-tests", "--synthetic", "--synthetic-frames", "10",
        "--difficulty", "easy", "--no-performance", "--output", "t.json",
    ])
    assert rc == 0  # ORB passes all reference thresholds on the fixture
    data = json.loads((tmp_path / "t.json").read_text())
    assert data["synthetic_room"]["all_passed"]


def test_run_tests_overlap_guard(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = main([
        "run-tests", "--sequences", "seq_a", "--train-sequences", "seq_a",
    ])
    assert rc == 1  # refused without --allow-train-overlap


def test_visualize_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = main(["visualize", "matches", "--synthetic", "--frames", "4",
               "--scale", "0.25", "--output", "viz"])
    assert rc == 0
    assert (tmp_path / "viz" / "matches.png").exists()
