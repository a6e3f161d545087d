from . import pgn  # noqa: F401
