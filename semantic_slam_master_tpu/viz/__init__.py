from . import matches, saliency, trajectory

__all__ = ["matches", "saliency", "trajectory"]
