from . import fixtures, kafka  # noqa: F401
