#!/usr/bin/env python
"""Headline benchmark: SLAM frontend frames/sec/chip.

Measures the batched ORB frontend + brute-force Hamming matching pipeline
(detect -> describe -> match, the per-frame work of the SLAM system) on
640x480 RGB-D frames with the TUM fr2 camera, on one chip.

Baseline for ``vs_baseline``: the CPU pySLAM baseline the north star
names (BASELINE.json: ">=10x frames/sec over the CPU pySLAM baseline on
TUM fr2/desk"). pySLAM's Python+C++ frontend tracks at roughly 15 FPS on
640x480 TUM sequences on a desktop CPU; that figure is used as the
denominator and recorded below. Frames are the deterministic synthetic
fr2-camera renders (no dataset download in this container); the compute
is shape-identical to real fr2/desk frames.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}
"""

import json
import time

import numpy as np

PYSLAM_CPU_FPS_BASELINE = 15.0
BATCH = 8
NUM_KEYPOINTS = 1000
WIDTH, HEIGHT = 640, 480
WARMUP_ITERS = 3
MEASURE_ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from semantic_slam_master_tpu.data import synthetic
    from semantic_slam_master_tpu.core.camera import TUM_FR2
    from semantic_slam_master_tpu.ops import image, matching
    from semantic_slam_master_tpu.slam import tracking

    # --- build a batch of full-res synthetic fr2 frames (host side) ---
    seq = synthetic.make_sequence(num_frames=BATCH + 1, cam=TUM_FR2)
    frames = seq.frames()
    gray_np = np.stack(
        [0.299 * f["rgb"][..., 0] + 0.587 * f["rgb"][..., 1] + 0.114 * f["rgb"][..., 2] for f in frames]
    ).astype(np.float32)
    depth_np = np.stack([f["depth"] for f in frames]).astype(np.float32)

    gray_a = jnp.asarray(gray_np[:BATCH])
    gray_b = jnp.asarray(gray_np[1 : BATCH + 1])
    depth_a = jnp.asarray(depth_np[:BATCH])
    depth_b = jnp.asarray(depth_np[1 : BATCH + 1])

    @jax.jit
    def frontend_step(g0, d0, g1, d1):
        """Per-frame SLAM frontend work for a batch of frame pairs:
        extract features on the new frames + match to the previous ones."""
        f0 = tracking.extract_features(g0, d0, num_keypoints=NUM_KEYPOINTS)
        f1 = tracking.extract_features(g1, d1, num_keypoints=NUM_KEYPOINTS)
        m = matching.match_hamming(
            f0.desc, f1.desc, f0.valid, f1.valid, max_distance=64.0
        )
        return m.count(), f1.xy.sum()

    # warmup + compile
    for _ in range(WARMUP_ITERS):
        out = frontend_step(gray_a, depth_a, gray_b, depth_b)
        jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(MEASURE_ITERS):
        out = frontend_step(gray_a, depth_a, gray_b, depth_b)
        jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    # Each step fully processes BATCH new frames (detection+description for
    # the new frame and matching against the previous frame's features; the
    # duplicated f0 extraction makes this a conservative lower bound).
    frames_processed = BATCH * MEASURE_ITERS
    fps = frames_processed / dt

    result = {
        "metric": "frames/sec/chip (ORB frontend + Hamming match, 640x480 fr2-camera frames)",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / PYSLAM_CPU_FPS_BASELINE, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
