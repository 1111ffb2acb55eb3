from .sources import TestGen, BlockGen

__all__ = ["TestGen", "BlockGen"]
