from data_cube_spark.streaming.cube_stream import (
    session_windows,
    sessionize_batch,
    streaming_cube,
    tumbling_agg,
)

__all__ = [
    "session_windows",
    "sessionize_batch",
    "streaming_cube",
    "tumbling_agg",
]
