from . import profiling, sinks

__all__ = ["profiling", "sinks"]
