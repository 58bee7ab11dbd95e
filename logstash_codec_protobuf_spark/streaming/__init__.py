from .stream import streaming_parse_route, streaming_windowed_counts  # noqa: F401
