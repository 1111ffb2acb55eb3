from . import codes, chirp, detect, fft  # noqa: F401
