from . import media  # noqa: F401
