from data_cube_spark.streaming.stream_join import interval_attribution_join
from data_cube_spark.streaming.cube_stream import (
    cube_from_materialized,
    session_windows,
    sessionize_batch,
    stateful_sessionize,
    stateful_user_totals,
    streaming_cube,
    streaming_scd2_dimension,
    tumbling_agg,
    user_totals_batch,
)

__all__ = [
    "cube_from_materialized",
    "interval_attribution_join",
    "session_windows",
    "sessionize_batch",
    "stateful_sessionize",
    "stateful_user_totals",
    "streaming_cube",
    "streaming_scd2_dimension",
    "tumbling_agg",
    "user_totals_batch",
]
