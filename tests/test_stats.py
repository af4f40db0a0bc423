"""Statistical-protocol machinery (reference tum_rgbd.yaml:63-68)."""

import numpy as np
import pytest

from semantic_slam_master_tpu.eval import stats


def test_summarize_basic():
    s = stats.summarize([1.0, 2.0, 3.0, 4.0, 5.0])
    assert s["n"] == 5 and s["mean"] == 3.0 and s["median"] == 3.0
    # CI half-width = t(4, .975) * sd / sqrt(5)
    sd = np.std([1, 2, 3, 4, 5], ddof=1)
    assert s["ci95_half_width"] == pytest.approx(2.776 * sd / np.sqrt(5), rel=1e-6)


def test_summarize_single_run():
    s = stats.summarize([2.5])
    assert s["n"] == 1 and "ci95_half_width" not in s


def test_wilcoxon_exact_matches_scipy():
    scipy_stats = pytest.importorskip("scipy.stats")
    rng = np.random.default_rng(0)
    for trial in range(6):
        a = rng.normal(0, 1, 10)
        b = a + rng.normal(0.3, 0.5, 10)
        ours = stats.wilcoxon_signed_rank(a, b)
        ref = scipy_stats.wilcoxon(a, b, mode="exact")
        assert ours["statistic"] == pytest.approx(ref.statistic)
        assert ours["p_value"] == pytest.approx(ref.pvalue, rel=1e-9), trial


def test_wilcoxon_normal_approx_reasonable():
    rng = np.random.default_rng(1)
    a = rng.normal(0, 1, 40)
    b = a + 0.8  # strong consistent shift
    r = stats.wilcoxon_signed_rank(a, b)
    assert r["p_value"] < 1e-5
    c = a + rng.normal(0, 1e-3, 40) * 0  # identical -> all zero diffs
    r2 = stats.wilcoxon_signed_rank(a, c)
    assert r2["p_value"] == 1.0


def test_wilcoxon_detects_no_difference():
    rng = np.random.default_rng(2)
    a = rng.normal(0, 1, 12)
    b = a + rng.normal(0, 1, 12) * 0.01 * rng.choice([-1, 1], 12)
    r = stats.wilcoxon_signed_rank(a, b)
    assert r["p_value"] > 0.05
