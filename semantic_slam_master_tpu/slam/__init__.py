from . import ba, bow, loop_closing, online, pnp, posegraph, system, tracking

__all__ = [
    "ba", "bow", "loop_closing", "online", "pnp", "posegraph", "system",
    "tracking",
]
