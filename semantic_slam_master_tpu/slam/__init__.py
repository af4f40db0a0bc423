from . import ba, bow, loop_closing, pnp, posegraph, system, tracking

__all__ = [
    "ba", "bow", "loop_closing", "pnp", "posegraph", "system", "tracking",
]
