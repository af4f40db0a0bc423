#!/usr/bin/env python
"""Frontend sub-stage attribution (round-4 verdict ask #6).

`bench.py` measures the frontend (`tracking.extract_features`) as one
jitted stage: 0.57 ms/frame at 47% HBM / 16% MXU — near neither
roofline, and until now attributed only by prose. This script measures
each sub-stage with the SAME marginal in-jit scan methodology as
`bench.py` (so the numbers are directly comparable and dispatch-free):

  pyramid    4-level bilinear resize chain (`tracking.build_pyramid`)
  detect     per-level FAST-9 score + NMS + block top-k + subpixel
             (`ops/fast.py`, Pallas kernel `ops/pallas/fast_score.py`)
  blur       per-level 2D Gaussian prefilter (`ops/image.gaussian_blur`)
  describe   per-level oriented-BRIEF sampling + bit packing
             (`ops/orb.describe`)
  sample     keypoint depth lookup + level->0 mapping + concat (residual:
             full frontend minus the above, includes XLA fusion overlap)

Each row also carries XLA cost-model FLOPs/bytes and the achieved
fraction of the v5e rooflines, so "which sub-stage is attackable" is a
measurement, not a guess. Writes FRONTEND_PROFILE.json and prints one
JSON line.
"""

import json
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent

BATCH = 8
NUM_KEYPOINTS = 1000
V5E_PEAK_BF16_TFLOPS = 197.0
V5E_PEAK_HBM_GBS = 819.0


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    import jax.numpy as jnp

    from semantic_slam_master_tpu.core.camera import TUM_FR2
    from semantic_slam_master_tpu.data import synthetic
    from semantic_slam_master_tpu.ops import fast, image, orb
    from semantic_slam_master_tpu.slam import tracking
    from semantic_slam_master_tpu.utils import profiling

    seq = synthetic.make_sequence(num_frames=BATCH, cam=TUM_FR2)
    frames = seq.frames()
    gray = jnp.asarray(
        np.stack(
            [
                0.299 * f["rgb"][..., 0]
                + 0.587 * f["rgb"][..., 1]
                + 0.114 * f["rgb"][..., 2]
                for f in frames
            ]
        ).astype(np.float32)
    )
    depth = jnp.asarray(
        np.stack([f["depth"] for f in frames]).astype(np.float32)
    )

    # Mirror extract_features' static per-level geometry exactly.
    num_levels, scale_factor = 4, 1.2
    levels = tracking.build_pyramid(gray, num_levels, scale_factor)
    areas = np.array([p.shape[1] * p.shape[2] for p in levels], np.float64)
    quotas = np.maximum((NUM_KEYPOINTS * areas / areas.sum()).astype(int), 1)
    quotas[0] += NUM_KEYPOINTS - int(quotas.sum())
    level_vals = tuple(jax.jit(lambda g: tuple(
        tracking.build_pyramid(g, num_levels, scale_factor)))(gray))

    # Detected keypoints per level (static inputs for blur/describe rows).
    kps = []
    for img, quota in zip(level_vals, quotas):
        kp = jax.jit(
            lambda im, q=int(quota): fast.detect(im, q, 0.05, 3, subpixel=True)
        )(img)
        kps.append(kp)
    blurred_vals = tuple(
        jax.jit(lambda im: image.gaussian_blur(im, sigma=2.0, radius=3))(img)
        for img in level_vals
    )

    stages = {}

    def measure(name, fn, args, iters=60, base_iters=12):
        r = profiling.marginal_time_ms(fn, args, iters=iters, base_iters=base_iters)
        c = profiling.stage_cost(fn, args)
        ms = r["mean_ms"] / BATCH
        stages[name] = {
            "ms_per_frame": round(ms, 4),
            "gflop_per_frame": round(c["flops"] / BATCH / 1e9, 3),
            "mb_per_frame": round(c["bytes"] / BATCH / 1e6, 2),
            "pct_bf16_peak": round(
                100.0 * c["flops"] / (ms * BATCH / 1e3) / 1e12 / V5E_PEAK_BF16_TFLOPS,
                1,
            ),
            "pct_hbm_peak": round(
                100.0 * c["bytes"] / (ms * BATCH / 1e3) / 1e9 / V5E_PEAK_HBM_GBS, 1
            ),
        }
        return ms

    # ---- full frontend (the bench.py stage, for the residual) ----
    def frontend(g, d):
        f = tracking.extract_features(g, d, num_keypoints=NUM_KEYPOINTS)
        return f.xy, f.desc, f.depth, f.valid

    full_ms = measure("full_frontend", frontend, (gray, depth), 40, 8)

    # ---- pyramid ----
    measure("pyramid", lambda g: tuple(
        tracking.build_pyramid(g, num_levels, scale_factor)), (gray,))

    # ---- detect: all levels ----
    def detect_all(*lv):
        outs = []
        for img, quota in zip(lv, quotas):
            kp = fast.detect(img, int(quota), 0.05, 3, subpixel=True)
            outs.append((kp.xy, kp.score, kp.valid))
        return outs

    measure("detect", detect_all, level_vals)

    # ---- blur: all levels ----
    def blur_all(*lv):
        return [image.gaussian_blur(img, sigma=2.0, radius=3) for img in lv]

    measure("blur", blur_all, level_vals)

    # ---- describe: all levels (blurred inputs + detected xy) ----
    desc_args = tuple(blurred_vals) + tuple(kp.xy for kp in kps)
    n_lv = len(level_vals)

    def describe_all(*av):
        imgs, xys = av[:n_lv], av[n_lv:]
        return [
            orb.describe(img, xy, prefiltered=True)
            for img, xy in zip(imgs, xys)
        ]

    measure("describe", describe_all, desc_args)

    sub_sum = sum(
        stages[k]["ms_per_frame"] for k in ("pyramid", "detect", "blur", "describe")
    )
    stages["residual_sample_concat"] = {
        "ms_per_frame": round(full_ms - sub_sum, 4),
        "note": "depth nearest_sample + level->0 mapping + concat, minus "
        "any cross-stage fusion overlap the full jit enjoys",
    }

    out = {
        "meta": {
            "backend": jax.default_backend(),
            "batch": BATCH,
            "keypoints": NUM_KEYPOINTS,
            "levels": [list(map(int, p.shape)) for p in level_vals],
            "quotas": [int(q) for q in quotas],
            "methodology": "marginal in-jit scan (bench.py), per-frame = /batch",
        },
        "stages": stages,
    }
    Path(REPO / "FRONTEND_PROFILE.json").write_text(json.dumps(out, indent=1))
    top = max(
        (k for k in stages if k != "full_frontend"),
        key=lambda k: stages[k]["ms_per_frame"],
    )
    print(json.dumps({
        "metric": "frontend sub-stage attribution, ms/frame",
        "full": stages["full_frontend"]["ms_per_frame"],
        "pyramid": stages["pyramid"]["ms_per_frame"],
        "detect": stages["detect"]["ms_per_frame"],
        "blur": stages["blur"]["ms_per_frame"],
        "describe": stages["describe"]["ms_per_frame"],
        "residual": stages["residual_sample_concat"]["ms_per_frame"],
        "largest_sub_stage": top,
        "out": "FRONTEND_PROFILE.json",
    }))


if __name__ == "__main__":
    main()
