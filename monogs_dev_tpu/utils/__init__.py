from .config import load_config, DotDict
from .logging import Log

__all__ = ["load_config", "DotDict", "Log"]
