from world_cup_duckdb_spark.streaming.stateful import running_user_profile
from world_cup_duckdb_spark.streaming.windows import (
    dedup_within_watermark,
    read_event_stream,
    sessionize,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "dedup_within_watermark",
    "read_event_stream",
    "running_user_profile",
    "sessionize",
    "sliding_counts",
    "tumbling_counts",
]
