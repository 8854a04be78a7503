from . import nco

__all__ = ["nco"]
