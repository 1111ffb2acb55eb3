from . import codes  # noqa: F401
