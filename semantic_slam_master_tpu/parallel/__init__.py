from . import mesh, tp

__all__ = ["mesh", "tp"]
