from . import config, trainer

__all__ = ["config", "trainer"]
