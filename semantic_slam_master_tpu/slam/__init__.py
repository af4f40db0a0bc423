from . import ba, pnp, system, tracking

__all__ = ["ba", "pnp", "system", "tracking"]
