from . import ate_rpe

__all__ = ["ate_rpe"]
