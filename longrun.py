#!/usr/bin/env python
"""Long-sequence stress: 1000+-frame multi-loop online SLAM.

Proves the two online claims at scale (round-3 verdict, ask #4):

1. **Per-chunk latency stays flat** as the sequence/keyframe history
   grows — the incremental `BowIndex` (train-once vocabulary, cached
   signatures, score-new-only) bounds the closing pass by chunk length,
   not sequence length (`slam/online.py:22-28`). Evidence: the recorded
   per-chunk wall-latency series and a first-third vs last-third ratio.
2. **Loop closure pays more the longer you run**: over multiple laps the
   odometry drift accumulates while closures keep pulling the estimate
   back onto the map, so the closure-vs-odometry ATE gap must exceed the
   single-lap harsh-loop gain (~6% in ACCURACY_r03) and reach Wilcoxon
   significance at n>=8 paired seeds (the behaviour being matched is
   ORB-SLAM3's loop-closing thread, SURVEY §2.2).

Writes the full JSON to --out and prints ONE summary line.
"""

import argparse
import json
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1200)
    ap.add_argument("--laps", type=int, default=3)
    ap.add_argument("--scale", type=float, default=0.5)
    ap.add_argument("--keypoints", type=int, default=768)
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--chunk-size", type=int, default=32)
    ap.add_argument("--harsh", action=argparse.BooleanOptionalAction, default=True,
                    help="harsh sensor model (default; --no-harsh for clean)")
    ap.add_argument("--out", default=str(REPO / "LONGRUN.json"))
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    import jax.numpy as jnp

    from accuracy import _extract_classic, _render, _summary
    from semantic_slam_master_tpu.data import synthetic
    from semantic_slam_master_tpu.eval import ate_rpe, stats
    from semantic_slam_master_tpu.slam import online, system

    t0 = time.time()
    seq = synthetic.make_loop_sequence(
        num_frames=args.frames, scale=args.scale, harsh=args.harsh,
        laps=args.laps,
    )
    data = _render(seq)
    print(f"[longrun] rendered {args.frames} frames ({args.laps} laps) "
          f"in {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    feats = _extract_classic(data["gray"], data["depth"], args.keypoints)
    print(f"[longrun] extracted features in {time.time()-t0:.0f}s", flush=True)

    cfg = system.SlamConfig()
    feats_dev = jax.tree.map(jnp.asarray, feats)
    loop_kw = dict(min_score=0.30, min_frame_gap=60, min_inliers=25)

    def run(seed: int, closure: bool):
        timings: list = []
        t0 = time.time()
        out, loops = online.run_slam_online(
            jax.random.PRNGKey(seed), feats_dev, seq.cam, cfg,
            chunk_size=args.chunk_size, enable_loop_closure=closure,
            timings=timings, **(loop_kw if closure else {}),
        )
        poses = np.asarray(jax.device_get(out.poses_wc), np.float64)
        res = ate_rpe.evaluate_trajectory(
            data["times"], data["poses_gt"], data["times"], poses
        )
        return {
            "seed": seed,
            "ate_rmse": res["ate"]["rmse"],
            "loops_closed": len(loops),
            "loops": [[int(a), int(b), round(float(s), 3)] for a, b, s in loops],
            "wall_s": round(time.time() - t0, 1),
            "timings": timings,
        }

    # Un-timed warmup closure run: the first run pays every jit compile
    # (chunk graphs, per-loop-count posegraph shapes) — measured 773s vs
    # 74s warm — which would otherwise pollute seed 0's per-chunk latency
    # series, the flatness evidence. ATE is unaffected (seeded RANSAC).
    t0 = time.time()
    run(0, True)
    print(f"[longrun] warmup (compile) run in {time.time()-t0:.0f}s",
          flush=True)

    rows_c, rows_o = [], []
    for seed in range(args.seeds):
        rc = run(seed, True)
        ro = run(seed, False)
        rows_c.append(rc)
        rows_o.append(ro)
        print(f"[longrun] seed {seed}: closure {rc['ate_rmse']:.4f} m "
              f"({rc['loops_closed']} loops, {rc['wall_s']}s) vs odom "
              f"{ro['ate_rmse']:.4f} m ({ro['wall_s']}s)", flush=True)

    # Latency-flatness evidence from seed 0's closure run — fully warm
    # thanks to the warmup run above (the others are summarized):
    # per-chunk total latency, first-third vs last-third.
    t_series = [
        round(t["slam_s"] + t["closure_s"], 4) for t in rows_c[0]["timings"]
    ]
    # Drop chunk 0 (residual per-process first-dispatch cost) from the ratio.
    body = np.asarray(t_series[1:])
    third = max(len(body) // 3, 1)
    flatness = float(body[-third:].mean() / max(body[:third].mean(), 1e-9))

    wil = stats.wilcoxon_signed_rank(
        [r["ate_rmse"] for r in rows_c], [r["ate_rmse"] for r in rows_o]
    )
    sum_c, sum_o = _summary(rows_c), _summary(rows_o)
    gain = 1.0 - sum_c["mean"] / max(sum_o["mean"], 1e-9)
    # Keep per-chunk series only for seed 0 (artifact size).
    for r in rows_c[1:] + rows_o:
        r.pop("timings", None)

    result = {
        "meta": {
            "backend": jax.default_backend(),
            "frames": args.frames,
            "laps": args.laps,
            "scale": args.scale,
            "keypoints": args.keypoints,
            "chunk_size": args.chunk_size,
            "seeds": args.seeds,
            "harsh": bool(args.harsh),
            "compile_warmup_run": True,
        },
        "closure": {"runs": rows_c, "ate": sum_c},
        "odometry": {"runs": rows_o, "ate": sum_o},
        "comparisons": {
            "closure_vs_odom": wil,
            "closure_gain_fraction": round(gain, 4),
        },
        "latency": {
            "per_chunk_s_seed0": t_series,
            "last_third_over_first_third": round(flatness, 3),
            "keyframes_total_end": rows_c[0]["timings"][-1]["keyframes_total"],
        },
    }
    Path(args.out).write_text(json.dumps(result, indent=1))
    # Keep the README long-run table in lockstep with the artifact.
    try:
        import sys

        import readme_sync

        if Path(args.out).resolve() == REPO / "LONGRUN.json":
            readme_sync.sync()
    except Exception as e:
        print(f"[longrun] readme sync skipped: {e}", file=sys.stderr)
    print(json.dumps({
        "metric": f"ATE RMSE (m), {args.frames}-frame {args.laps}-lap "
                  "harsh loop, online SLAM + closure",
        "value": sum_c["mean"],
        "odom_ate": sum_o["mean"],
        "closure_gain": round(gain, 4),
        "p_value": wil["p_value"],
        "latency_flatness": round(flatness, 3),
        "out": str(args.out),
    }))


if __name__ == "__main__":
    main()
