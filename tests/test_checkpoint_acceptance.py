"""Regression pins on the COMMITTED tiny checkpoint's acceptance
capabilities (artifacts/frontend_tiny) — the round-2 verdict's item 2:
sub-patch localization must survive (spacing-5 repeatability was 0%
when keypoints were pinned to 16 px patch centers).

Thresholds are set a few points below the recorded results
(test_results.json: rep 0.733/0.788, inlier 0.793) so noise does not
flake the gate while a real regression (e.g. offsets silently dead
again) still fails loudly.
"""

from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
CKPT = REPO / "artifacts" / "frontend_tiny" / "best_model"

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def adapter():
    from semantic_slam_master_tpu.eval import frontend_tests as ft
    from semantic_slam_master_tpu.train import config as config_mod, trainer

    if not CKPT.exists():
        pytest.skip("no committed checkpoint")
    cfg = config_mod.load_config(
        str(REPO / "configs" / "train_tiny_synthetic.yaml")
    )
    model, state = trainer.create_train_state(cfg, steps_per_epoch=1)
    state, _ = trainer.restore_checkpoint(str(CKPT), state)
    variables = {
        "params": trainer.merge_params(state.trainable, state.frozen),
        "batch_stats": state.batch_stats,
    }
    return ft.learned_adapter(model, variables, input_size=cfg.model.input_size)


@pytest.fixture(scope="module")
def seq():
    from semantic_slam_master_tpu.data import synthetic

    return synthetic.make_sequence(num_frames=30, scale=0.5)


def test_spacing5_repeatability_above_reference_target(seq, adapter):
    """THE round-2 gap: >=60% of keypoints re-detected within 3 px under
    ~5 px/frame motion (reference target, test_repeatability.py:5).
    Patch-center-pinned models score 0% here."""
    from semantic_slam_master_tpu.eval import frontend_tests as ft

    r = ft.run_repeatability_test(seq, adapter, spacing=5, num_pairs=8)
    assert r["mean_repeatability"] >= 0.60, r["mean_repeatability"]


def test_spacing1_repeatability(seq, adapter):
    from semantic_slam_master_tpu.eval import frontend_tests as ft

    r = ft.run_repeatability_test(seq, adapter, spacing=1, num_pairs=8)
    assert r["mean_repeatability"] >= 0.60, r["mean_repeatability"]


def test_descriptor_quality_floor(seq, adapter):
    """Inlier/precision floor: descriptors must pair geometrically
    corresponding points (GT-warp-supervised training), not lookalike
    texture — the failure mode that scored 0.19 mid-round."""
    from semantic_slam_master_tpu.eval import frontend_tests as ft

    r = ft.run_descriptor_quality_test(seq, adapter, num_pairs=8)
    assert r["inlier_ratio"] >= 0.70, r["inlier_ratio"]
    assert r["precision"] >= 0.65, r["precision"]


def test_learned_offsets_are_alive(adapter, seq):
    """Mean |sub-patch offset| must be clearly nonzero: a dead OffsetHead
    (zero offsets) regresses to patch-center pinning silently."""
    f = seq.frame(0)
    feats = adapter.extract(np.stack([f["rgb"], f["rgb"]]))
    xy = feats["xy"][0][feats["valid"][0]]
    # Keypoints off the 16px-grid patch centers (mapped back to native
    # pixels, centers are not integral, so measure spread instead):
    # offsets vary per keypoint -> fractional parts are dispersed.
    frac = xy - np.round(xy)
    assert np.abs(frac).std() > 0.05, np.abs(frac).std()
