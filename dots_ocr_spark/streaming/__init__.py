from .stream import stream_extract  # noqa: F401
