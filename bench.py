#!/usr/bin/env python
"""Headline benchmark: END-TO-END SLAM frames/sec/chip.

Measures the full RGB-D SLAM system the north star names (BASELINE.json:
">=10x frames/sec over the CPU pySLAM baseline on TUM fr2/desk"), in its
production decomposition:

- frontend (batched over 8 frames): 4-level pyramid FAST detect + ORB
  describe + depth sampling — `tracking.extract_features`;
- backend (sequential scan over 64 frames): brute-force Hamming matching
  against the 2048-slot landmark map, RANSAC(Kabsch)+GN PnP, keyframe
  policy, Schur-complement window BA — `system.run_slam`.

e2e ms/frame = frontend ms/frame + backend ms/frame; quoting the stage
sum is exact for the streaming pipeline (every frame pays both stages;
the stages are measured at their true production batch shapes — the
65-frame monolithic program additionally hits TPU worker memory faults).

Methodology: each stage is timed by MARGINAL in-jit scan repetition —
the stage runs N times inside ONE jitted `lax.scan` with a loop-carried
salt (so XLA cannot hoist it), and the quoted time is the best-of-3
difference between a long and a short scan divided by the iteration
difference. This cancels dispatch/tunnel/transfer overhead exactly and
forces a real device sync by fetching the reduced scalar. (Naive
block_until_ready timing does not block on tunneled backends and
over-reports throughput by >10x; per-call re-jitting adds seconds of
host tracing jitter — both failure modes are documented in
utils/profiling.py.)

Baseline for ``vs_baseline``: pySLAM's Python+C++ frontend tracks at
roughly 15 FPS on 640x480 TUM sequences on a desktop CPU (the reference
baseline the north star names). Frames are deterministic synthetic
fr2-camera renders (no dataset download in this container); the compute
is shape-identical to real fr2/desk frames.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N, ...}
"""

import json

import numpy as np

PYSLAM_CPU_FPS_BASELINE = 15.0
BATCH = 8
NUM_KEYPOINTS = 1000
F = 65  # backend frames per SLAM run (1 bootstrap + 64 tracked)


def main():
    import jax

    # Persistent compilation cache: the SLAM scan takes minutes to
    # compile; cache hits make repeated bench runs start in seconds.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    import jax.numpy as jnp

    from semantic_slam_master_tpu.core.camera import TUM_FR2
    from semantic_slam_master_tpu.data import synthetic
    from semantic_slam_master_tpu.slam import system, tracking
    from semantic_slam_master_tpu.utils import profiling

    seq = synthetic.make_sequence(num_frames=F, cam=TUM_FR2)
    frames = seq.frames()
    gray_np = np.stack(
        [
            0.299 * f["rgb"][..., 0] + 0.587 * f["rgb"][..., 1] + 0.114 * f["rgb"][..., 2]
            for f in frames
        ]
    ).astype(np.float32)
    depth_np = np.stack([f["depth"] for f in frames]).astype(np.float32)
    gray = jnp.asarray(gray_np)
    depth = jnp.asarray(depth_np)
    cfg = system.SlamConfig()

    # ---- frontend: ms/frame at the production batch shape ----
    def frontend(g, d):
        f = tracking.extract_features(g, d, num_keypoints=NUM_KEYPOINTS)
        return f.xy, f.desc, f.depth, f.valid

    r_fe = profiling.marginal_time_ms(
        frontend, (gray[:BATCH], depth[:BATCH]), iters=40, base_iters=8
    )
    fe_ms = r_fe["mean_ms"] / BATCH

    # ---- precompute the backend's input features, in production chunks ----
    ext = jax.jit(
        lambda g, d: tracking.extract_features(g, d, num_keypoints=NUM_KEYPOINTS)
    )
    chunks = []
    for s in range(0, F, BATCH):
        e = min(s + BATCH, F)
        g = gray[s:e] if e - s == BATCH else jnp.concatenate(
            [gray[s:e], gray[: BATCH - (e - s)]]
        )
        d = depth[s:e] if e - s == BATCH else jnp.concatenate(
            [depth[s:e], depth[: BATCH - (e - s)]]
        )
        chunks.append(jax.tree.map(lambda x: x[: e - s], ext(g, d)))
    feats = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *chunks)

    # ---- backend: ms per 65-frame SLAM run ----
    def backend(feats):
        out = system.run_slam(jax.random.PRNGKey(0), feats, TUM_FR2, cfg)
        return out.poses_wc, out.num_inliers

    r_be = profiling.marginal_time_ms(backend, (feats,), iters=18, base_iters=2)
    be_ms = r_be["mean_ms"] / F

    total_ms = fe_ms + be_ms
    fps = 1000.0 / total_ms

    result = {
        "metric": (
            "frames/sec/chip, end-to-end RGB-D SLAM (4-level pyramid ORB "
            "frontend + Hamming map matching + RANSAC/GN PnP + keyframe "
            "window BA), 640x480 fr2-camera frames"
        ),
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / PYSLAM_CPU_FPS_BASELINE, 2),
        "frontend_ms_per_frame": round(fe_ms, 3),
        "backend_ms_per_frame": round(be_ms, 3),
        "frontend_only_fps": round(1000.0 / fe_ms, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
