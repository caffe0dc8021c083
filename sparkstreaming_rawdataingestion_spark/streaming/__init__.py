from . import ingest_stream, windows  # noqa: F401
