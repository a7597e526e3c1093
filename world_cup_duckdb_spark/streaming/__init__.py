from world_cup_duckdb_spark.streaming.rollup import (
    maintain_day_rollup,
    read_rollup,
)
from world_cup_duckdb_spark.streaming.ivm_sink import (
    stream_maintain_join_view,
)
from world_cup_duckdb_spark.streaming.sinks import stream_validated_write
from world_cup_duckdb_spark.streaming.stateful import (
    running_user_profile,
    running_user_profile_tws,
)
from world_cup_duckdb_spark.streaming.table_sink import stream_upsert_table
from world_cup_duckdb_spark.streaming.windows import (
    dedup_within_watermark,
    enrich_events,
    read_event_stream,
    sessionize,
    sliding_counts,
    stream_funnel_pairs,
    tumbling_counts,
)

__all__ = [
    "dedup_within_watermark",
    "enrich_events",
    "maintain_day_rollup",
    "read_rollup",
    "read_event_stream",
    "running_user_profile",
    "running_user_profile_tws",
    "sessionize",
    "stream_maintain_join_view",
    "stream_upsert_table",
    "stream_validated_write",
    "stream_funnel_pairs",
    "sliding_counts",
    "tumbling_counts",
]
