from . import backbone, frontend, refiner, segmenter, selector, uncertainty

__all__ = [
    "backbone",
    "frontend",
    "refiner",
    "segmenter",
    "selector",
    "uncertainty",
]
