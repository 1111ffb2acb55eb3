from . import encoder, decoder, modulator, demodulator  # noqa: F401
