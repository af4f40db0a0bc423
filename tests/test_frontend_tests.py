import numpy as np
import pytest

from semantic_slam_master_tpu.data import synthetic
from semantic_slam_master_tpu.eval import frontend_tests, metrics

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)


@pytest.fixture(scope="module")
def seq():
    return synthetic.make_sequence(num_frames=12, scale=0.5)


@pytest.fixture(scope="module")
def orb():
    return frontend_tests.orb_adapter(num_keypoints=300, threshold=0.05)


def test_repeatability_on_orb(seq, orb):
    r = frontend_tests.run_repeatability_test(seq, orb, spacing=1, num_pairs=5)
    assert r["num_pairs"] == 5
    # FAST corners on checkerboard texture repeat well under small motion
    assert r["mean_repeatability"] > 0.5, r["mean_repeatability"]


def test_descriptor_quality_on_orb(seq, orb):
    r = frontend_tests.run_descriptor_quality_test(seq, orb, spacing=1, num_pairs=5)
    assert r["num_matches"] > 50
    assert r["inlier_ratio"] > 0.5, r
    assert r["precision"] > 0.3, r


def test_tracking_on_orb(seq, orb):
    r = frontend_tests.run_tracking_test(seq, orb, spacing=1, min_matches=50)
    assert r["success_rate"] == 1.0, r


def test_performance_harness(seq, orb):
    r = frontend_tests.run_performance_test(seq, orb)
    assert "fast_detect" in r["stages"]
    assert r["fps"] > 0
    assert np.isfinite(r["stages"]["total"]["mean_ms"])


def test_run_all_structure(seq, orb):
    r = frontend_tests.run_all(seq, orb, difficulty="easy", with_performance=False)
    assert r["difficulty"] == "easy"
    assert len(r["repeatability"]) == 1
    assert "all_passed" in r


def test_overlap_guard():
    overlap = frontend_tests.check_sequence_overlap(
        ["a", "b"], ["b", "c"]
    )
    assert overlap == ["b"]
    assert frontend_tests.check_sequence_overlap(["a"], ["c"]) == []


def test_learned_adapter_runs(seq):
    import jax
    import jax.numpy as jnp

    from semantic_slam_master_tpu.models import frontend as frontend_mod

    model = frontend_mod.tiny_frontend()
    rgb0 = seq.frame(0)["rgb"]
    # crop to a 16-multiple for the tiny ViT
    h = (rgb0.shape[0] // 16) * 16
    w = (rgb0.shape[1] // 16) * 16

    class Cropped:
        cam = seq.cam
        def __len__(self):
            return len(seq)
        def frame(self, i):
            f = seq.frame(i)
            return {**f, "rgb": f["rgb"][:h, :w]}

    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)))
    adapter = frontend_tests.learned_adapter(model, variables)
    r = frontend_tests.run_tracking_test(Cropped(), adapter, min_matches=1)
    assert r["num_steps"] > 0
    # untrained net: no quality assertion, only that the plumbing works
    rq = frontend_tests.run_repeatability_test(Cropped(), adapter, num_pairs=2)
    assert 0.0 <= rq["mean_repeatability"] <= 1.0
