from . import lie, camera, fixed

__all__ = ["lie", "camera", "fixed"]
