from . import self_supervised

__all__ = ["self_supervised"]
