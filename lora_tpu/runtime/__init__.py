from .stream import StreamDemodulator, Frame, decode_frames
from . import iqio

__all__ = ["StreamDemodulator", "Frame", "decode_frames", "iqio"]
