from . import text, vector  # noqa: F401
