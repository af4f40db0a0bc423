"""TUM-format trajectory I/O.

The accuracy contract of the whole framework: trajectories are exchanged
as ``timestamp tx ty tz qx qy qz qw`` text files, the format produced by
the reference's baselines (`baselines/orb_slam3/scripts/run_baseline.sh:101-103`)
and consumed by its evaluator (`scripts/evaluate_baseline.py:47-48`).
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np

from ..core import lie


def write_tum_trajectory(
    path: str | Path, timestamps: np.ndarray, poses: np.ndarray
) -> None:
    """Write world-frame camera poses (N, 4, 4) as a TUM trajectory file."""
    poses = np.asarray(poses)
    import jax.numpy as jnp

    quats = np.asarray(lie.matrix_to_quat(jnp.asarray(poses[:, :3, :3])))
    with open(path, "w") as f:
        f.write("# timestamp tx ty tz qx qy qz qw\n")
        for ts, T, q in zip(np.asarray(timestamps), poses, quats):
            t = T[:3, 3]
            f.write(
                f"{ts:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n"
            )


def read_tum_trajectory(path: str | Path) -> Tuple[np.ndarray, np.ndarray]:
    """Read a TUM trajectory file -> (timestamps (N,), poses (N, 4, 4))."""
    times = []
    mats = []
    import jax.numpy as jnp

    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(v) for v in line.split()]
            if len(vals) < 8:
                continue
            ts, tx, ty, tz, qx, qy, qz, qw = vals[:8]
            R = np.asarray(lie.quat_to_matrix(jnp.asarray([qx, qy, qz, qw])))
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = [tx, ty, tz]
            times.append(ts)
            mats.append(T)
    return np.asarray(times, dtype=np.float64), np.asarray(mats, dtype=np.float64)
