"""Structured Streaming layer (SURVEY.md §2.8 — EXTENSION, not
reference-derived: the reference is purely batch).

Spark's unified model means the window expressions here are the *same*
ones the batch queries in queries/ext_stream.py use — readStream in,
writeStream out, plus watermarks for state cleanup. tests/test_streaming.py
proves streaming output ≡ batch output on the events fixture.

Scale notes: event-time aggregation state is bounded by the watermark
horizon; keys = (window × type/user) so state size tracks cardinality,
not throughput. Sessionization uses session_window's mergeable state.
`availableNow` triggers give batch-like backfill with streaming semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from world_cup_duckdb_spark.functions.strings import dec

#: Event-stream schema — ts kept as TimestampType (the ns→us conversion
#: happens when staging parquet for the file source; streaming sources
#: declare schemas explicitly, there is no inference to lean on).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source event stream (the micro-batch ingestion pattern; swap
    for Kafka by changing format only — the downstream operators are
    source-agnostic). ``max_files_per_trigger`` bounds micro-batch size —
    under an availableNow trigger it splits a backfill into multiple
    batches instead of one giant one (backpressure at scale)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def tumbling_counts(
    events: DataFrame, window: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with late-data bound."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding-window variant (each event lands in window/slide windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Per-user session windows (dynamic gap-merged state)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def stream_funnel_pairs(
    events: DataFrame,
    first: str = "click",
    then: str = "purchase",
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: every (first → then) event pair for the
    same user within ``within`` — the streaming twin of the batch funnel
    (queries/ext_events.py:ext_funnel_click_purchase's join stage).

    Both sides carry a watermark and the join condition carries an
    event-time range, so Spark bounds each side's join state: a buffered
    click can be dropped once the watermark passes click_ts + within, a
    purchase once it can no longer match any live click. Without the time
    bound the state would grow forever — this is THE correctness
    requirement for stream-stream joins at scale.

    Works as a self-join of one source stream (Spark plans two independent
    scans); append output mode, matches emitted as they arrive.
    """
    clicks = (
        events.filter(F.col("event_type") == first)
        .select(
            F.col("event_id").alias("click_event_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    follows = (
        events.filter(F.col("event_type") == then)
        .select("event_id", "user_id", F.col("ts").alias("then_ts"))
        .withWatermark("then_ts", watermark)
    )
    return clicks.join(
        follows,
        F.expr(
            f"""click_user = user_id
                AND then_ts > click_ts
                AND then_ts <= click_ts + INTERVAL {within}"""
        ),
        "inner",
    ).select(
        "user_id",
        "click_event_id",
        "click_ts",
        F.col("event_id").alias("then_event_id"),
        "then_ts",
    )


def dedup_within_watermark(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "1 hour"
) -> DataFrame:
    """Stateful keyed dedup: keep the first arrival per key, with state
    expiry bounded by the watermark (`dropDuplicatesWithinWatermark`)."""
    keys = keys or ["user_id", "event_type"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def enrich_events(
    events: DataFrame,
    dim: DataFrame,
    key_left: str = "user_id",
    key_right: str = "c_custkey",
    label: str = "c_mktsegment",
    window: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-static enrichment join + windowed rollup: join each event to
    a slowly-changing dimension, then aggregate per (window, label).

    The static side is broadcast, so the join is STATELESS — each
    micro-batch probes the in-memory dim copy with zero streaming join
    state and zero shuffle on the stream side (contrast
    stream_funnel_pairs, whose stream-stream state needs time bounds).
    This is the canonical enrichment pattern at scale: the only stateful
    operator left is the windowed aggregation, bounded by the watermark.

    Unified batch/streaming: pass batch DataFrames and the same code is
    the batch query (queries/ext_events.py:ext_stream_enrich oracle-checks
    it).
    """
    enriched = events.join(
        F.broadcast(dim.select(key_right, label)),
        F.col(key_left) == F.col(key_right),
        "inner",
    )
    return (
        enriched.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), label)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            label,
            "n_events",
            "total_value",
        )
    )


def ohlc_bars(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch OHLC downsample (queries/
    ext_events.py:ext_ohlc_bars): per tumbling hour, open / high / low /
    close over the value stream. Open and close are min_by/max_by over
    the (ts, event_id) struct — a TOTAL order, so the pick is
    deterministic and equals the batch twin's row_number form row for
    row (pinned in tests/test_streaming.py across micro-batch splits;
    min_by/max_by are declarative aggregates, so partial states merge
    across triggers like any windowed agg). A 2-hour watermark bounds
    state for late data."""
    e = events.filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
        )
        .select(
            F.col("w.start").alias("bar"),
            "n_events",
            "open",
            "high",
            "low",
            "close",
        )
    )
