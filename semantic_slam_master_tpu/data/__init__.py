from . import associate, synthetic, trajectory_io, tum

__all__ = ["associate", "synthetic", "trajectory_io", "tum"]
