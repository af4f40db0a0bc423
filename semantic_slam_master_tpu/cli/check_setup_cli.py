"""Environment / dataset sanity checks.

Parity with the reference's `scripts/check_setup.sh` +
`semantic-slam/setup.py:31-175`: python deps, accelerator visibility,
dataset completeness (rgb/depth/groundtruth per sequence), and package
import health — adapted to TPU/JAX.
"""

from __future__ import annotations

import argparse
import importlib
from pathlib import Path

REQUIRED_PACKAGES = ("jax", "flax", "optax", "orbax.checkpoint", "numpy", "yaml")
REFERENCE_SEQUENCES = (
    "rgbd_dataset_freiburg1_desk",
    "rgbd_dataset_freiburg1_plant",
    "rgbd_dataset_freiburg1_room",
    "rgbd_dataset_freiburg3_long_office_household",
    "rgbd_dataset_freiburg3_walking_static",
    "rgbd_dataset_freiburg3_walking_xyz",
)


def check_sequence_dir(seq_dir: Path) -> dict:
    """Structure check matching `download_tum_rgbd.py:158-205`."""
    rgb = seq_dir / "rgb"
    depth = seq_dir / "depth"
    gt = seq_dir / "groundtruth.txt"
    status = {
        "exists": seq_dir.exists(),
        "rgb": rgb.exists() and any(rgb.glob("*.png")),
        "depth": depth.exists() and any(depth.glob("*.png")),
        "groundtruth": gt.exists(),
    }
    status["complete"] = all(status.values())
    return status


def main(argv=None):
    parser = argparse.ArgumentParser(prog="check-setup", description=__doc__)
    parser.add_argument("--data-root", default="data/tum_rgbd")
    args = parser.parse_args(argv)

    ok = True
    print("== packages ==")
    for pkg in REQUIRED_PACKAGES:
        try:
            importlib.import_module(pkg)
            print(f"  [ok] {pkg}")
        except ImportError as e:
            print(f"  [MISSING] {pkg}: {e}")
            ok = False

    print("== accelerator ==")
    try:
        import jax

        devs = jax.devices()
        print(f"  [ok] backend={jax.default_backend()} devices={devs}")
    except Exception as e:
        print(f"  [FAIL] jax devices: {e}")
        ok = False

    print("== framework ==")
    try:
        from .. import core, data, eval as eval_mod, losses, models, ops, slam  # noqa

        print("  [ok] semantic_slam_master_tpu imports")
    except Exception as e:
        print(f"  [FAIL] package import: {e}")
        ok = False

    print("== dataset ==")
    root = Path(args.data_root)
    if not root.exists():
        print(f"  [absent] {root} — TUM data not downloaded "
              "(synthetic world available for tests/benchmarks)")
    else:
        for seq in REFERENCE_SEQUENCES:
            st = check_sequence_dir(root / seq)
            mark = "ok" if st["complete"] else ("partial" if st["exists"] else "absent")
            print(f"  [{mark}] {seq}")

    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":  # direct `python -m ...cli.x` use
    import sys as _sys

    _sys.exit(main() or 0)
