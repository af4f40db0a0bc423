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
