from . import encoder, decoder  # noqa: F401
