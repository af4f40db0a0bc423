"""Full-sequence SLAM -> TUM trajectories.

Internalizes the reference's baseline runners
(`baselines/orb_slam3/scripts/run_baseline.sh:49-110`): for each
sequence, run the on-device SLAM system and write
``<out>/<sequence>_trajectory.txt`` in TUM format, ready for
``evaluate``.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np


def _features_for_frames(gray_np, depth_np, num_keypoints, chunk=16):
    """Batched frontend over all frames, chunked to bound device memory."""
    import jax
    import jax.numpy as jnp

    from ..slam import tracking

    extract = jax.jit(
        lambda g, d: tracking.extract_features(g, d, num_keypoints=num_keypoints)
    )
    outs = []
    n = len(gray_np)
    pad = (-n) % chunk
    if pad:
        gray_np = np.concatenate([gray_np, np.repeat(gray_np[-1:], pad, 0)])
        depth_np = np.concatenate([depth_np, np.repeat(depth_np[-1:], pad, 0)])
    for i in range(0, len(gray_np), chunk):
        outs.append(
            jax.device_get(
                extract(jnp.asarray(gray_np[i : i + chunk]), jnp.asarray(depth_np[i : i + chunk]))
            )
        )
    feats = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0)[:n], *outs)
    return feats


def run_sequence(seq, out_path: Path, args) -> dict:
    import jax
    import jax.numpy as jnp

    from ..data import trajectory_io
    from ..slam import system, tracking

    n = seq.num_frames() if hasattr(seq, "num_frames") else len(seq)
    t0 = time.perf_counter()
    if hasattr(seq, "load_all_gray_depth"):
        # TUM directory: threaded native C++ PNG decode of the sequence.
        gray_np, depth_np = seq.load_all_gray_depth()
    else:
        rgbs, depths = [], []
        for i in range(n):
            f = seq.frame(i)
            rgbs.append(
                0.299 * f["rgb"][..., 0] + 0.587 * f["rgb"][..., 1]
                + 0.114 * f["rgb"][..., 2]
            )
            depths.append(f["depth"])
        gray_np = np.stack(rgbs).astype(np.float32)
        depth_np = np.stack(depths).astype(np.float32)
    t_decode = time.perf_counter() - t0

    t0 = time.perf_counter()
    feats_np = _features_for_frames(gray_np, depth_np, args.num_keypoints)
    feats = tracking.FrameFeatures(*[jnp.asarray(x) for x in feats_np])
    cfg = system.SlamConfig(
        num_landmarks=args.num_landmarks,
        window_size=args.window_size,
        ba_iters=args.ba_iters,
    )
    out = system.run_slam(jax.random.PRNGKey(args.seed), feats, seq.cam, cfg)
    poses = np.asarray(jax.device_get(out.poses_wc), dtype=np.float64)
    n_loops = 0
    if args.loop_closure:
        from ..slam import loop_closing

        poses, loops = loop_closing.close_sequence_loops(
            poses, feats, np.asarray(out.is_keyframe), seq.cam
        )
        n_loops = len(loops)
    t_slam = time.perf_counter() - t0

    timestamps = getattr(seq, "timestamps", np.arange(n) / 30.0)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    trajectory_io.write_tum_trajectory(out_path, timestamps, poses)
    fps = n / max(t_slam, 1e-9)
    return {
        "frames": n,
        "decode_s": round(t_decode, 2),
        "slam_s": round(t_slam, 2),
        "fps": round(fps, 1),
        "keyframes": int(np.asarray(out.is_keyframe).sum()),
        "loops_closed": n_loops,
        "mean_inliers": float(np.asarray(out.num_inliers)[1:].mean()) if n > 1 else 0.0,
        "trajectory": str(out_path),
    }


def main(argv=None):
    parser = argparse.ArgumentParser(prog="run-slam", description=__doc__)
    parser.add_argument("--data-root", default="data/tum_rgbd")
    parser.add_argument("--sequences", nargs="*", default=None,
                        help="TUM sequence names; default: the 6 reference sequences")
    parser.add_argument("--synthetic", action="store_true",
                        help="run on the synthetic world instead of TUM data")
    parser.add_argument("--synthetic-frames", type=int, default=60)
    parser.add_argument("--output-dir", default="experiments/trajectories")
    parser.add_argument("--num-keypoints", type=int, default=512)
    parser.add_argument("--num-landmarks", type=int, default=2048)
    parser.add_argument("--window-size", type=int, default=5)
    parser.add_argument("--ba-iters", type=int, default=4)
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--loop-closure", action="store_true",
                        help="BoW loop detection + pose-graph correction pass")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    out_dir = Path(args.output_dir)
    results = {}
    if args.synthetic:
        from ..data import synthetic

        seq = synthetic.make_sequence(num_frames=args.synthetic_frames, scale=1.0)
        # keep GT alongside for evaluation convenience
        from ..data import trajectory_io

        out_dir.mkdir(parents=True, exist_ok=True)
        trajectory_io.write_tum_trajectory(
            out_dir / "synthetic_room_groundtruth.txt", seq.timestamps, seq.poses_wc
        )
        results["synthetic_room"] = run_sequence(
            seq, out_dir / "synthetic_room_trajectory.txt", args
        )
    else:
        from ..data.tum import TUMSequence

        sequences = args.sequences or [
            "rgbd_dataset_freiburg1_desk",
            "rgbd_dataset_freiburg1_plant",
            "rgbd_dataset_freiburg1_room",
            "rgbd_dataset_freiburg3_long_office_household",
            "rgbd_dataset_freiburg3_walking_static",
            "rgbd_dataset_freiburg3_walking_xyz",
        ]
        for name in sequences:
            try:
                seq = TUMSequence(args.data_root, name, max_frames=args.max_frames)
            except FileNotFoundError as e:
                print(f"[run-slam] {name}: missing data ({e})", file=sys.stderr)
                results[name] = {"status": "missing_data"}
                continue
            results[name] = run_sequence(
                seq, out_dir / f"{name}_trajectory.txt", args
            )

    for name, r in results.items():
        print(f"{name}: {r}")
    return 0
