from . import bits, scan

__all__ = ["bits", "scan"]
