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


def _features_for_frames(gray_np, depth_np, num_keypoints, weight_np=None, chunk=16):
    """Batched frontend over all frames, chunked to bound device memory.

    ``weight_np`` is an optional per-pixel semantic residual weight map
    (F, H, W) sampled at keypoints (north-star semantic weighting)."""
    import jax
    import jax.numpy as jnp

    from ..slam import tracking

    use_w = weight_np is not None
    extract = jax.jit(
        lambda g, d, w: tracking.extract_features(
            g, d, num_keypoints=num_keypoints, weight_map=w
        )
        if use_w
        else tracking.extract_features(g, d, num_keypoints=num_keypoints)
    )
    outs = []
    n = len(gray_np)
    pad = (-n) % chunk
    if pad:
        gray_np = np.concatenate([gray_np, np.repeat(gray_np[-1:], pad, 0)])
        depth_np = np.concatenate([depth_np, np.repeat(depth_np[-1:], pad, 0)])
        if use_w:
            weight_np = np.concatenate([weight_np, np.repeat(weight_np[-1:], pad, 0)])
    for i in range(0, len(gray_np), chunk):
        w = jnp.asarray(weight_np[i : i + chunk]) if use_w else jnp.ones((1,))
        outs.append(
            jax.device_get(
                extract(
                    jnp.asarray(gray_np[i : i + chunk]),
                    jnp.asarray(depth_np[i : i + chunk]),
                    w,
                )
            )
        )
    feats = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0)[:n], *outs)
    return feats


def _learned_features_for_frames(
    model, variables, rgb_np, depth_np, weight_np=None, chunk=8
):
    """Batched learned frontend (LearnedFrontend -> FrameFeatures) over a
    sequence, chunked; float descriptors cosine-match in the SLAM backend
    (slam.system.match_features dtype dispatch)."""
    import jax
    import jax.numpy as jnp

    from ..slam import tracking

    use_w = weight_np is not None
    extract = jax.jit(
        lambda r, d, w: tracking.extract_learned_features(
            model, variables, r, d, weight_map=w if use_w else None
        )
    )
    outs = []
    n = len(rgb_np)
    pad = (-n) % chunk
    if pad:
        rgb_np = np.concatenate([rgb_np, np.repeat(rgb_np[-1:], pad, 0)])
        depth_np = np.concatenate([depth_np, np.repeat(depth_np[-1:], pad, 0)])
        if use_w:
            weight_np = np.concatenate([weight_np, np.repeat(weight_np[-1:], pad, 0)])
    for i in range(0, len(rgb_np), chunk):
        w = jnp.asarray(weight_np[i : i + chunk]) if use_w else jnp.ones((1,))
        outs.append(
            jax.device_get(
                extract(
                    jnp.asarray(rgb_np[i : i + chunk]),
                    jnp.asarray(depth_np[i : i + chunk]),
                    w,
                )
            )
        )
    return jax.tree.map(lambda *xs: np.concatenate(xs, axis=0)[:n], *outs)


def _load_learned_frontend(args):
    """Build the LearnedFrontend + restored variables for --frontend
    learned (mirrors run_tests_cli's adapter construction)."""
    from ..train import config as config_mod, trainer

    cfg = config_mod.load_config(args.train_config)
    model, state = trainer.create_train_state(cfg, steps_per_epoch=1)
    if args.checkpoint:
        state, _ = trainer.restore_checkpoint(args.checkpoint, state)
    variables = {
        "params": trainer.merge_params(state.trainable, state.frozen),
        "batch_stats": state.batch_stats,
    }
    return model, variables


def _semantic_weight_maps(rgb_np, labels_np, args):
    """Per-pixel BA residual weights from semantics.

    ``--semantics gt``    : use ground-truth label maps (synthetic world).
    ``--semantics model`` : run the SemanticSegmenter (optionally from an
                            orbax checkpoint) on the RGB frames.
    Returns float32 (F, H, W) or None.
    """
    if args.semantics == "off":
        return None
    import jax
    import jax.numpy as jnp

    from ..models import segmenter as seg_mod

    if args.semantics == "gt":
        if labels_np is None:
            print("[run-slam] --semantics gt needs GT labels; skipping",
                  file=sys.stderr)
            return None
        return np.asarray(
            seg_mod.class_weights_map(jnp.asarray(labels_np))
        ).astype(np.float32)

    # --semantics model
    model = seg_mod.SemanticSegmenter()
    if args.segmenter_checkpoint:
        from ..train import seg_trainer

        params = seg_trainer.load_checkpoint(args.segmenter_checkpoint)
    else:
        print("[run-slam] --semantics model without --segmenter-checkpoint: "
              "using untrained weights (labels will be noise)", file=sys.stderr)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1,) + rgb_np.shape[1:3] + (3,))
        )["params"]
    # Production path: 1/4-res logits -> labels -> weight map. The
    # full-res upsample is pure HBM cost; `tracking.extract_features`
    # rescales keypoint coords onto the low-res map when sampling.
    apply = jax.jit(
        lambda x: jnp.argmax(
            model.apply({"params": params}, x, full_res=False), -1
        )
    )
    chunks = []
    for i in range(0, len(rgb_np), 8):
        chunks.append(np.asarray(apply(jnp.asarray(rgb_np[i : i + 8]))))
    labels = np.concatenate(chunks, axis=0)
    return np.asarray(
        seg_mod.class_weights_map(jnp.asarray(labels))
    ).astype(np.float32)


def run_sequence(seq, out_path: Path, args) -> dict:
    import jax
    import jax.numpy as jnp

    from ..data import trajectory_io
    from ..slam import system, tracking

    n = seq.num_frames() if hasattr(seq, "num_frames") else len(seq)
    want_rgb = args.semantics == "model" or args.frontend == "learned"
    t0 = time.perf_counter()
    rgb_np = labels_np = None
    if hasattr(seq, "load_all_gray_depth") and not want_rgb:
        # TUM directory: threaded native C++ PNG decode of the sequence.
        gray_np, depth_np = seq.load_all_gray_depth()
    else:
        rgbs, depths, labels = [], [], []
        for i in range(n):
            f = seq.frame(i)
            rgbs.append(f["rgb"])
            depths.append(f["depth"])
            if "labels" in f:
                labels.append(f["labels"])
        rgb_np = np.stack(rgbs).astype(np.float32)
        gray_np = (
            0.299 * rgb_np[..., 0] + 0.587 * rgb_np[..., 1] + 0.114 * rgb_np[..., 2]
        ).astype(np.float32)
        depth_np = np.stack(depths).astype(np.float32)
        labels_np = np.stack(labels) if labels else None
    t_decode = time.perf_counter() - t0

    weight_np = _semantic_weight_maps(rgb_np, labels_np, args)

    t0 = time.perf_counter()
    if args.frontend == "learned":
        model, variables = _load_learned_frontend(args)
        feats_np = _learned_features_for_frames(
            model, variables, rgb_np, depth_np, weight_np
        )
    else:
        feats_np = _features_for_frames(
            gray_np, depth_np, args.num_keypoints, weight_np
        )
    feats = tracking.FrameFeatures(*[jnp.asarray(x) for x in feats_np])
    cfg = system.SlamConfig(
        num_landmarks=args.num_landmarks,
        window_size=args.window_size,
        ba_iters=args.ba_iters,
    )
    n_loops = 0
    if args.loop_closure == "online":
        from ..slam import online

        out, loops = online.run_slam_online(
            jax.random.PRNGKey(args.seed), feats, seq.cam, cfg,
            chunk_size=args.chunk_size,
        )
        poses = np.asarray(jax.device_get(out.poses_wc), dtype=np.float64)
        n_loops = len(loops)
    else:
        out = system.run_slam(jax.random.PRNGKey(args.seed), feats, seq.cam, cfg)
        poses = np.asarray(jax.device_get(out.poses_wc), dtype=np.float64)
        if args.loop_closure == "offline":
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
    parser.add_argument("--dynamic", action="store_true",
                        help="synthetic world with a moving person slab "
                             "(fr3_walking-style dynamic-scene stress)")
    parser.add_argument("--semantics", choices=["off", "gt", "model"],
                        default="off",
                        help="semantic residual weighting: GT labels "
                             "(synthetic) or the SemanticSegmenter model")
    parser.add_argument("--segmenter-checkpoint", default=None,
                        help="orbax checkpoint dir for --semantics model")
    parser.add_argument("--output-dir", default="experiments/trajectories")
    parser.add_argument("--num-keypoints", type=int, default=512)
    parser.add_argument("--frontend", choices=("orb", "learned"), default="orb",
                        help="classic ORB (Hamming) or a trained "
                             "LearnedFrontend (cosine) driving the same "
                             "SLAM backend")
    parser.add_argument("--checkpoint", default=None,
                        help="orbax checkpoint for --frontend learned")
    parser.add_argument("--train-config", default=None,
                        help="training YAML the checkpoint was produced "
                             "with (model dims must match)")
    parser.add_argument("--num-landmarks", type=int, default=2048)
    parser.add_argument("--window-size", type=int, default=5)
    parser.add_argument("--ba-iters", type=int, default=4)
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--loop-closure", nargs="?", const="offline",
                        choices=["off", "offline", "online"], default="off",
                        help="BoW loop closing: 'offline' = post-pass over "
                             "the finished run; 'online' = streaming "
                             "between-chunk closure that re-anchors the "
                             "live map (slam/online.py)")
    parser.add_argument("--chunk-size", type=int, default=32,
                        help="frames per jitted scan chunk (online mode)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    out_dir = Path(args.output_dir)
    results = {}
    if args.synthetic:
        from ..data import synthetic

        make = (
            synthetic.make_dynamic_sequence if args.dynamic
            else synthetic.make_sequence
        )
        seq = make(num_frames=args.synthetic_frames, scale=1.0)
        # keep GT alongside for evaluation convenience
        from ..data import trajectory_io

        out_dir.mkdir(parents=True, exist_ok=True)
        trajectory_io.write_tum_trajectory(
            out_dir / f"{seq.name}_groundtruth.txt", seq.timestamps, seq.poses_wc
        )
        results[seq.name] = run_sequence(
            seq, out_dir / f"{seq.name}_trajectory.txt", args
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


if __name__ == "__main__":  # direct `python -m ...cli.x` use
    import sys as _sys

    _sys.exit(main() or 0)
