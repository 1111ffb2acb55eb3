from .sources import TestGen, BlockGen
from .live import LiveTapView

__all__ = ["TestGen", "BlockGen", "LiveTapView"]
