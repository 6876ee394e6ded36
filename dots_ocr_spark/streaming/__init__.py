from .stream import stream_dedup_extract, stream_extract  # noqa: F401
