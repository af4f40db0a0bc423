#!/usr/bin/env python
"""Accuracy benchmark: full-SLAM ATE/RPE on the TPU, committed per round.

The speed half of the north star is measured by `bench.py`; this is the
ACCURACY half ("ATE RMSE within 1% of ORB-SLAM3/pySLAM", BASELINE.json).
No TUM data can exist in this container (no egress), so the evidence is a
measured PROXY: the TUM-faithful synthetic world (16-bit depth
quantization at the /5000 TUM scale, Kinect axial depth noise,
depth holes, motion blur, exposure drift — `data/synthetic.SensorModel`)
on a 320-frame closed-loop trajectory plus the dynamic-scene and
learned-frontend fixtures. Reference bands for context:
ORB-SLAM3 on real TUM spans 0.0103-0.0853 m ATE on static sequences and
0.4611 m on dynamic fr3_walking_xyz
(`/root/reference/experiments/baselines/orb_slam3/results.json`).

Implements the reference's declared-but-never-implemented statistical
protocol (5 runs / Wilcoxon / 95% CI,
`/root/reference/configs/datasets/tum_rgbd.yaml:63-68`): every row is N
RANSAC-seed runs summarized as mean +/- CI, and the headline comparisons
(loop closure on/off, semantics on/off) get paired Wilcoxon p-values.

Rows:
  loop_harsh_closure  320-frame harsh loop, online SLAM + loop closure
  loop_harsh_odom     same frames, closure disabled (drift baseline)
  loop_clean_closure  same trajectory, clean sensor (fidelity cost)
  dynamic_sem_off     moving-person scene, geometry only (corrupted)
  dynamic_sem_gt      same, GT-label semantic weighting (recovered)
  learned / learned_classic_ref
                      trained tiny frontend vs classic ORB on the same
                      sequence (learned-vs-classic ATE ratio)

Writes the full JSON to --out and prints ONE summary JSON line.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent


def _render(seq, want_rgb=False, want_labels=False):
    """Render a SyntheticSequence to stacked numpy arrays (gray/depth and
    optionally rgb/labels), frame by frame to bound memory."""
    gray, depth, rgb, labels = [], [], [], []
    for i in range(len(seq)):
        f = seq.frame(i)
        r = f["rgb"]
        gray.append(
            (0.299 * r[..., 0] + 0.587 * r[..., 1] + 0.114 * r[..., 2]).astype(
                np.float32
            )
        )
        depth.append(f["depth"])
        if want_rgb:
            rgb.append(r)
        if want_labels:
            labels.append(f["labels"])
    out = {
        "gray": np.stack(gray),
        "depth": np.stack(depth),
        "times": np.asarray(seq.timestamps),
        "poses_gt": np.asarray(seq.poses_wc),
    }
    if want_rgb:
        out["rgb"] = np.stack(rgb)
    if want_labels:
        out["labels"] = np.stack(labels)
    return out


def _extract_classic(gray_np, depth_np, num_keypoints, weight_map=None, batch=8):
    """Chunked batched frontend extraction (production batch shape)."""
    import jax
    import jax.numpy as jnp

    from semantic_slam_master_tpu.slam import tracking

    ext = jax.jit(
        lambda g, d, w: tracking.extract_features(
            g, d, num_keypoints=num_keypoints, weight_map=w
        )
    )
    ext_plain = jax.jit(
        lambda g, d: tracking.extract_features(
            g, d, num_keypoints=num_keypoints
        )
    )
    F = len(gray_np)
    outs = []
    for s in range(0, F, batch):
        e = min(s + batch, F)
        pad = batch - (e - s)
        g = np.concatenate([gray_np[s:e], gray_np[s : s + pad]]) if pad else gray_np[s:e]
        d = np.concatenate([depth_np[s:e], depth_np[s : s + pad]]) if pad else depth_np[s:e]
        if weight_map is not None:
            w = (
                np.concatenate([weight_map[s:e], weight_map[s : s + pad]])
                if pad
                else weight_map[s:e]
            )
            r = ext(jnp.asarray(g), jnp.asarray(d), jnp.asarray(w))
        else:
            r = ext_plain(jnp.asarray(g), jnp.asarray(d))
        outs.append(jax.tree.map(lambda x: np.asarray(x)[: e - s], r))
    return jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *outs)


def _run_rows(data, feats, cam, cfg, seeds, closure, chunk_size=32, **loop_kw):
    """N-seed SLAM runs -> list of per-seed {ate_rmse, rpe_*, loops}."""
    import jax
    import jax.numpy as jnp

    from semantic_slam_master_tpu.eval import ate_rpe
    from semantic_slam_master_tpu.slam import online

    feats_dev = jax.tree.map(jnp.asarray, feats)
    rows = []
    for seed in seeds:
        t0 = time.time()
        out, loops = online.run_slam_online(
            jax.random.PRNGKey(seed),
            feats_dev,
            cam,
            cfg,
            chunk_size=chunk_size,
            enable_loop_closure=closure,
            **loop_kw,
        )
        poses = np.asarray(jax.device_get(out.poses_wc), np.float64)
        res = ate_rpe.evaluate_trajectory(
            data["times"], data["poses_gt"], data["times"], poses
        )
        row = {
            "seed": int(seed),
            "ate_rmse": res["ate"]["rmse"],
            "ate_mean": res["ate"]["mean"],
            "loops_closed": len(loops),
            "loops": [[int(a), int(b), round(float(s), 3)] for a, b, s in loops],
            "wall_s": round(time.time() - t0, 1),
        }
        if "rpe" in res:
            row["rpe_trans_rmse"] = res["rpe"]["translation"]["rmse"]
            row["rpe_rot_rmse_deg"] = res["rpe"]["rotation"]["rmse"]
        if "rpe_metric" in res:
            # Metric-delta RPE (Δ=1.0 m GT path length) — the mode the
            # reference's eval config DECLARES (tum_rgbd.yaml:57-59).
            row["rpe_metric_trans_rmse"] = res["rpe_metric"]["translation"]["rmse"]
            row["rpe_metric_rot_rmse_deg"] = res["rpe_metric"]["rotation"]["rmse"]
        rows.append(row)
    return rows


def _summary(rows, key="ate_rmse"):
    from semantic_slam_master_tpu.eval import stats

    return stats.summarize([r[key] for r in rows])


def _row(runs):
    """Row dict: runs + ATE summary + metric-delta RPE summary (when the
    trajectory is long enough for >=1 one-meter pair)."""
    out = {"runs": runs, "ate": _summary(runs)}
    if all("rpe_metric_trans_rmse" in r for r in runs):
        out["rpe_metric_trans"] = _summary(runs, key="rpe_metric_trans_rmse")
        out["rpe_metric_rot_deg"] = _summary(runs, key="rpe_metric_rot_rmse_deg")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=8,
                    help="paired seeds per row. Default 8: the exact "
                    "two-sided Wilcoxon floor at n=5 is 2/2^5=0.0625, "
                    "mathematically unable to clear the reference's "
                    "declared 0.95 confidence (tum_rgbd.yaml:63-68); "
                    "n=8 reaches p=0.0078")
    ap.add_argument("--loop-frames", type=int, default=320)
    ap.add_argument("--dyn-frames", type=int, default=64)
    ap.add_argument("--scale", type=float, default=1.0,
                    help="camera scale for the loop rows (1.0 = 640x480)")
    ap.add_argument("--keypoints", type=int, default=1000)
    ap.add_argument("--out", default=str(REPO / "ACCURACY.json"))
    ap.add_argument("--skip-learned", action="store_true")
    ap.add_argument("--skip-dynamic", action="store_true")
    ap.add_argument("--skip-loop", action="store_true")
    ap.add_argument(
        "--learned-ckpt",
        default=str(REPO / "artifacts" / "frontend_tiny" / "best_model"),
        help="orbax checkpoint for the learned row",
    )
    ap.add_argument(
        "--learned-config",
        default=str(REPO / "configs" / "train_tiny_synthetic.yaml"),
        help="training YAML matching --learned-ckpt's model dims",
    )
    ap.add_argument("--learned-scale", type=float, default=0.4)
    ap.add_argument(
        "--merge-from",
        default=None,
        help="existing ACCURACY json to seed rows/comparisons from; rows "
        "run in this invocation overwrite the loaded ones (lets a "
        "--skip-* partial run refresh single rows, e.g. the learned row "
        "after retraining, without re-running the whole protocol)",
    )
    ap.add_argument(
        "--segmenter-ckpt",
        default=str(REPO / "artifacts" / "segmenter" / "best_model"),
        help="trained SemanticSegmenter checkpoint for the "
        "dynamic_sem_model row (model-driven semantics, not GT labels); "
        "the row is skipped if absent",
    )
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    import jax.numpy as jnp

    from semantic_slam_master_tpu.data import synthetic
    from semantic_slam_master_tpu.eval import stats
    from semantic_slam_master_tpu.slam import system

    seeds = list(range(args.seeds))
    result = {
        "meta": {
            "backend": jax.default_backend(),
            "seeds": seeds,
            "loop_frames": args.loop_frames,
            "scale": args.scale,
            "keypoints": args.keypoints,
            "protocol": "N RANSAC seeds; mean/median/95% CI (Student t); "
            "paired two-sided Wilcoxon signed-rank "
            "(reference tum_rgbd.yaml:63-68)",
        },
        "rows": {},
        "comparisons": {},
    }
    if args.merge_from:
        prev = json.loads(Path(args.merge_from).read_text())
        result["rows"].update(prev.get("rows", {}))
        result["comparisons"].update(prev.get("comparisons", {}))
        result["meta"]["merged_from"] = {
            "file": str(args.merge_from),
            "meta": prev.get("meta", {}),
        }
    cfg = system.SlamConfig()

    # ---- loop rows ----
    if not args.skip_loop:
        t0 = time.time()
        seq_h = synthetic.make_loop_sequence(
            num_frames=args.loop_frames, scale=args.scale, harsh=True
        )
        data_h = _render(seq_h)
        seq_c = synthetic.make_loop_sequence(
            num_frames=args.loop_frames, scale=args.scale, harsh=False
        )
        data_c = _render(seq_c)
        print(f"[accuracy] rendered 2x{args.loop_frames} loop frames "
              f"in {time.time()-t0:.0f}s", flush=True)

        feats_h = _extract_classic(data_h["gray"], data_h["depth"], args.keypoints)
        feats_c = _extract_classic(data_c["gray"], data_c["depth"], args.keypoints)
        loop_kw = dict(min_score=0.30, min_frame_gap=60, min_inliers=25)

        rows_hc = _run_rows(data_h, feats_h, seq_h.cam, cfg, seeds, True, **loop_kw)
        rows_ho = _run_rows(data_h, feats_h, seq_h.cam, cfg, seeds, False)
        rows_cc = _run_rows(data_c, feats_c, seq_c.cam, cfg, seeds, True, **loop_kw)
        result["rows"]["loop_harsh_closure"] = _row(rows_hc)
        result["rows"]["loop_harsh_odom"] = _row(rows_ho)
        result["rows"]["loop_clean_closure"] = _row(rows_cc)
        result["comparisons"]["closure_vs_odom_harsh"] = stats.wilcoxon_signed_rank(
            [r["ate_rmse"] for r in rows_hc], [r["ate_rmse"] for r in rows_ho]
        )
        print(f"[accuracy] loop rows done: harsh+closure "
              f"{result['rows']['loop_harsh_closure']['ate']['mean']:.4f} m, "
              f"odom {result['rows']['loop_harsh_odom']['ate']['mean']:.4f} m",
              flush=True)

    # ---- dynamic-scene rows (semantics off/on) ----
    if not args.skip_dynamic:
        from semantic_slam_master_tpu.models import segmenter as seg_mod

        seq_d = synthetic.make_dynamic_sequence(
            num_frames=args.dyn_frames, scale=args.scale
        )
        want_model_row = Path(args.segmenter_ckpt).exists()
        data_d = _render(seq_d, want_rgb=want_model_row, want_labels=True)
        wmap = np.asarray(
            seg_mod.class_weights_map(jnp.asarray(data_d["labels"]))
        ).astype(np.float32)
        feats_off = _extract_classic(
            data_d["gray"], data_d["depth"], args.keypoints
        )
        feats_gt = _extract_classic(
            data_d["gray"], data_d["depth"], args.keypoints, weight_map=wmap
        )
        rows_off = _run_rows(
            data_d, feats_off, seq_d.cam, cfg, seeds, False
        )
        rows_gt = _run_rows(data_d, feats_gt, seq_d.cam, cfg, seeds, False)
        result["rows"]["dynamic_sem_off"] = _row(rows_off)
        result["rows"]["dynamic_sem_gt"] = _row(rows_gt)
        result["comparisons"]["semantics_gt_vs_off_dynamic"] = (
            stats.wilcoxon_signed_rank(
                [r["ate_rmse"] for r in rows_gt],
                [r["ate_rmse"] for r in rows_off],
            )
        )
        print(f"[accuracy] dynamic rows done: sem_off "
              f"{result['rows']['dynamic_sem_off']['ate']['mean']:.4f} m, "
              f"sem_gt {result['rows']['dynamic_sem_gt']['ate']['mean']:.4f} m",
              flush=True)

        # Model-driven semantics: the trained SemanticSegmenter's
        # predictions (production 1/4-res path, same as
        # `run-slam --semantics model`) instead of oracle labels — the
        # capability the reference names (model-driven semantic inference
        # in the loop; ORB-SLAM3 fails at 0.4611 m on fr3_walking_xyz,
        # `experiments/baselines/orb_slam3/results.json:140`).
        seg_ckpt = Path(args.segmenter_ckpt)
        if seg_ckpt.exists():
            from semantic_slam_master_tpu.train import seg_trainer

            seg_model = seg_mod.SemanticSegmenter()
            seg_params = seg_trainer.load_checkpoint(str(seg_ckpt))
            seg_apply = jax.jit(
                lambda x: jnp.argmax(
                    seg_model.apply({"params": seg_params}, x, full_res=False),
                    -1,
                )
            )
            pred_chunks = []
            for s in range(0, len(data_d["rgb"]), 8):
                pred_chunks.append(
                    np.asarray(seg_apply(jnp.asarray(data_d["rgb"][s : s + 8])))
                )
            pred_labels = np.concatenate(pred_chunks, axis=0)
            wmap_model = np.asarray(
                seg_mod.class_weights_map(jnp.asarray(pred_labels))
            ).astype(np.float32)
            # Segmenter fidelity vs the rendered GT labels (1/4-res).
            gt_q = data_d["labels"][
                :, :: data_d["labels"].shape[1] // pred_labels.shape[1],
                :: data_d["labels"].shape[2] // pred_labels.shape[2],
            ][:, : pred_labels.shape[1], : pred_labels.shape[2]]
            seg_acc = float((pred_labels == gt_q).mean())
            person = gt_q == synthetic.CLASS_PERSON
            person_recall = float(
                (pred_labels[person] == synthetic.CLASS_PERSON).mean()
            ) if person.any() else None
            feats_model = _extract_classic(
                data_d["gray"], data_d["depth"], args.keypoints,
                weight_map=wmap_model,
            )
            rows_model = _run_rows(
                data_d, feats_model, seq_d.cam, cfg, seeds, False
            )
            result["rows"]["dynamic_sem_model"] = _row(rows_model)
            result["rows"]["dynamic_sem_model"]["segmenter"] = {
                "checkpoint": str(seg_ckpt),
                "label_accuracy_quarter_res": seg_acc,
                "person_recall": person_recall,
            }
            result["comparisons"]["semantics_model_vs_off_dynamic"] = (
                stats.wilcoxon_signed_rank(
                    [r["ate_rmse"] for r in rows_model],
                    [r["ate_rmse"] for r in rows_off],
                )
            )
            print(
                f"[accuracy] dynamic_sem_model done: "
                f"{result['rows']['dynamic_sem_model']['ate']['mean']:.4f} m "
                f"(seg acc {seg_acc:.3f}, person recall {person_recall})",
                flush=True,
            )
        else:
            print(f"[accuracy] no segmenter checkpoint at {seg_ckpt}; "
                  "skipping dynamic_sem_model row", flush=True)

    # ---- learned-frontend row (vs classic on the same sequence) ----
    ckpt = Path(args.learned_ckpt)
    if not args.skip_learned and ckpt.exists():
        from semantic_slam_master_tpu.slam import tracking
        from semantic_slam_master_tpu.train import config as config_mod, trainer

        tcfg = config_mod.load_config(args.learned_config)
        model, state = trainer.create_train_state(tcfg, steps_per_epoch=1)
        state, _ = trainer.restore_checkpoint(str(ckpt), state)
        variables = {
            "params": trainer.merge_params(state.trainable, state.frozen),
            "batch_stats": state.batch_stats,
        }
        # Default 0.4 -> 256x192 (both /16) keeps the ViT patch grid
        # exact; use 0.8 -> 512x384 for the 448-px ViT-S checkpoint.
        seq_l = synthetic.make_sequence(
            num_frames=args.dyn_frames, scale=args.learned_scale
        )
        data_l = _render(seq_l, want_rgb=True)

        ext = jax.jit(
            lambda r, d: tracking.extract_learned_features(
                model, variables, r, d
            )
        )
        F = len(data_l["rgb"])
        outs = []
        for s in range(0, F, 8):
            e = min(s + 8, F)
            pad = 8 - (e - s)
            r = data_l["rgb"][s:e]
            d = data_l["depth"][s:e]
            if pad:
                r = np.concatenate([r, data_l["rgb"][s : s + pad]])
                d = np.concatenate([d, data_l["depth"][s : s + pad]])
            o = ext(jnp.asarray(r), jnp.asarray(d))
            outs.append(jax.tree.map(lambda x: np.asarray(x)[: e - s], o))
        feats_l = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *outs)

        # Same SlamConfig as the classic reference row — the round-3
        # min_inliers=12 discount padded the learned side (VERDICT r3
        # Weak #6); the comparison is only meaningful at parity.
        rows_l = _run_rows(data_l, feats_l, seq_l.cam, cfg, seeds, False)
        feats_lc = _extract_classic(data_l["gray"], data_l["depth"], 512)
        rows_lc = _run_rows(data_l, feats_lc, seq_l.cam, cfg, seeds, False)
        result["rows"]["learned"] = _row(rows_l)
        result["rows"]["learned"]["checkpoint"] = str(ckpt)
        result["rows"]["learned_classic_ref"] = _row(rows_lc)
        result["comparisons"]["learned_vs_classic_ratio"] = float(
            _summary(rows_l)["mean"] / max(_summary(rows_lc)["mean"], 1e-9)
        )
        print(f"[accuracy] learned rows done: learned "
              f"{result['rows']['learned']['ate']['mean']:.4f} m vs classic "
              f"{result['rows']['learned_classic_ref']['ate']['mean']:.4f} m",
              flush=True)

    Path(args.out).write_text(json.dumps(result, indent=1))
    # Keep the README accuracy table in lockstep with the artifact
    # (VERDICT r4 ask #5) — only when writing a repo-root ACCURACY_r* file
    # the README generator actually reads.
    try:
        import readme_sync

        if Path(args.out).resolve().parent == REPO and Path(args.out).name.startswith(
            "ACCURACY_r"
        ):
            readme_sync.sync()
    except Exception as e:
        print(f"[accuracy] readme sync skipped: {e}", file=sys.stderr)
    if "loop_harsh_closure" in result["rows"]:
        head = {
            "metric": "ATE RMSE (m), harsh 320-frame loop, online SLAM + closure",
            "value": result["rows"]["loop_harsh_closure"]["ate"]["mean"],
            "ci95": result["rows"]["loop_harsh_closure"]["ate"].get(
                "ci95_half_width"
            ),
            "odom_ate": result["rows"]["loop_harsh_odom"]["ate"]["mean"],
            "closure_p": result["comparisons"]["closure_vs_odom_harsh"]["p_value"],
            "out": str(args.out),
        }
    elif result["rows"]:
        first = next(iter(result["rows"]))
        head = {
            "metric": f"ATE RMSE (m), {first}",
            "value": result["rows"][first]["ate"]["mean"],
            "out": str(args.out),
        }
    else:
        head = {"metric": "no rows selected", "value": None, "out": str(args.out)}
    print(json.dumps(head))


if __name__ == "__main__":
    main()
