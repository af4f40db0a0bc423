from . import fast, image, matching, orb, sampling

__all__ = ["fast", "image", "matching", "orb", "sampling"]
