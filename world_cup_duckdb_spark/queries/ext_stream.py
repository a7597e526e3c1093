"""Event-time windowing queries over the `events` table.

These run the *same* window operators Structured Streaming uses
(`F.window`, `F.session_window`) in batch mode — Spark's unified batch/
streaming semantics means one definition serves both; streaming/windows.py
wires the identical expressions to readStream with watermarks, and
tests/test_streaming.py proves batch≡streaming output.

Oracle mapping: tumbling/sliding windows are epoch-floor arithmetic;
session windows are the gaps-and-islands construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from world_cup_duckdb_spark.functions.strings import dec
from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import load_tables


@register(
    "ext_stream_tumbling",
    oracle="""
    SELECT make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 600000000)
                          * 600000000) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    -- Spark's F.window inserts an isnotnull(ts) filter (null-ts rows
    -- are unwindowable); mirror it or the oracle emits a NULL-window row
    WHERE ts IS NOT NULL
    GROUP BY 1, 2
    """,
)
def ext_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute event-time windows (streaming §2.8 surface, in
    batch mode). Window assignment is map-side arithmetic; the agg is one
    partial+final hash aggregate keyed (window, type)."""
    e = load_tables(spark, sf_dir)["events"]
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
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


@register(
    "ext_stream_sliding",
    oracle="""
    WITH e AS (
      -- ts IS NOT NULL mirrors F.window's implicit filter (the UNION
      -- ALL grid would otherwise emit the null row TWICE)
      SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type, value
      FROM events WHERE ts IS NOT NULL
    ),
    w AS (
      SELECT make_timestamp((us // 300000000) * 300000000) AS window_start,
             event_type, value
      FROM e
      UNION ALL
      SELECT make_timestamp((us // 300000000) * 300000000 - 300000000),
             event_type, value
      FROM e
    )
    SELECT window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM w GROUP BY 1, 2
    """,
)
def ext_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 10-minute length, 5-minute slide — each event in
    exactly two windows (the oracle unions the two 5-min-aligned grids)."""
    e = load_tables(spark, sf_dir)["events"]
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
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


@register(
    "ext_stream_session",
    oracle="""
    WITH e AS (
      -- ts IS NOT NULL: Spark's session_window drops null-ts rows (its
      -- TimeWindowing rule inserts an isnotnull filter); the
      -- gaps-and-islands form would fold them into the last session
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
      WHERE ts IS NOT NULL
    ),
    marked AS (
      -- strictly > : Spark session_window MERGES events exactly one
      -- gap apart (the window is [start, last+gap), boundary inclusive)
      SELECT *,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS brk
      FROM e
    ),
    sessions AS (
      SELECT *,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM sessions
    GROUP BY user_id, sid
    """,
)
def ext_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute-gap session windows per user
    (`session_window` — the streaming stateful operator, batch mode).
    Oracle is the classic gaps-and-islands rewrite; a new session starts
    only when the gap is STRICTLY GREATER than the timeout — Spark's
    per-event window [ts, ts+gap) merges an event landing exactly on the
    boundary (verified empirically). Null-ts rows are dropped by
    session_window; the oracle filters them to match.
    """
    e = load_tables(spark, sf_dir)["events"]
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
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


@register(
    "ext_stream_dedup",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id,
           CAST(ts AS TIMESTAMP) AS first_ts
    FROM (
      SELECT user_id, event_type, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def ext_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First event per (user, type) — the batch semantics of streaming
    `dropDuplicatesWithinWatermark` keyed dedup (streaming/windows.py
    provides the stateful streaming form). Deterministic via (ts,
    event_id) total order."""
    from pyspark.sql import Window

    e = load_tables(spark, sf_dir)["events"]
    # asc_nulls_last: a null-ts event must not win rn=1 over real events
    # (the oracle's default places nulls last)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc_nulls_last(), "event_id"
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
        )
    )


@register(
    "ext_window_distinct_users",
    oracle="""
    SELECT make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000)
                          * 3600000000) AS window_start,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events WHERE ts IS NOT NULL GROUP BY 1
    """,
)
def ext_window_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct active users per tumbling hour — the cardinality-per-
    window shape behind DAU/HAU dashboards, exact here (expand-based
    distinct aggregate inside the window group).

    Scale: count_distinct expands to a two-phase aggregate keyed
    (window, user) then (window) — both partial-combine. For streaming or
    for billions of users per window, swap in approx_count_distinct
    (HLL++ partials merge across triggers; operators/sketch.py documents
    the error bound) without changing the window shape.
    """
    e = load_tables(spark, sf_dir)["events"]
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(F.col("w.start").alias("window_start"), "n_users", "n_events")
    )


@register(
    "ext_gap_fill_locf",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000)
                            * 3600000000) AS h,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_value
      FROM events GROUP BY 1, 2
    ),
    b AS (SELECT MIN(h) AS mn, MAX(h) AS mx FROM hourly),
    spine AS (
      SELECT t.event_type, unnest(generate_series(b.mn, b.mx, INTERVAL 1 HOUR)) AS h
      FROM (SELECT DISTINCT event_type FROM events) t, b
    ),
    j AS (
      SELECT spine.event_type, spine.h, hourly.n, hourly.avg_value
      FROM spine LEFT JOIN hourly USING (event_type, h)
    )
    SELECT event_type, h AS hour_start,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
           avg_value,
           LAST_VALUE(avg_value IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY h ROWS UNBOUNDED PRECEDING
           ) AS filled_value
    FROM j
    """,
)
def ext_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event type with gap filling: hours where a
    type logged nothing get n_events=0 and a last-observation-carried-
    forward value — the time-series densification every dashboard /
    feature pipeline needs (a bare GROUP BY silently drops empty hours,
    which downstream models read as 'no row', not 'zero').

    Scale: the hourly rollup is the only fact-sized work. The spine is
    generated, not stored — a 1-row min/max aggregate cross-joined with
    the distinct types, then `sequence()` exploded; its size is
    |types| × hours regardless of event volume. LOCF is one window pass
    per type partition (`last(ignorenulls)` over an unbounded-preceding
    ROWS frame). AVG goes through decimal-sum / count so both engines
    produce bit-identical doubles."""
    e = load_tables(spark, sf_dir)["events"]
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(dec("value")).cast("double") / F.count(F.lit(1))).alias("avg_value"),
    )
    bounds = hourly.agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
    spine = (
        e.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(mn, mx, INTERVAL 1 HOUR)")).alias("h"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.col("h").alias("hour_start"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
            "avg_value",
            F.last("avg_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


@register(
    "ext_stream_stream_join",
    oracle="""
    WITH c AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS cus
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS pus, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE)
             AS attributed_value,
           CAST(MIN(p.pus - c.cus) AS BIGINT) AS min_gap_us
    FROM c JOIN p
      ON p.user_id = c.user_id
     AND p.pus > c.cus
     AND p.pus <= c.cus + 900000000
    GROUP BY c.user_id
    """,
)
def ext_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join, batch semantics: every (click,
    purchase) pair of the same user where the purchase lands within 15
    minutes AFTER the click — the attribution join `readStream ⋈
    readStream` runs with watermarks bounding both sides' state. The
    batch implementation is the scalable BAND JOIN: clicks replicate to
    their own and the following 900-second bucket, the join is a pure
    EQUI-join on (user, bucket) — hash-partitionable, AQE-skew-splittable
    — and the exact range predicate then trims the candidates. The
    oracle states the naive inequality join; the hash match proves the
    two-bucket cover is exactly lossless (a purchase ≤900 s after a
    click can only sit in the click's bucket or the next one).

    Scale: a raw time-inequality join degenerates to
    broadcast-nested-loop (per-user cross product); bucketization keeps
    it a shuffled hash join whose fan-out is the fixed 2× replication,
    independent of data volume — the same trick ext_range_join uses,
    here in its streaming-attribution shape. Gap arithmetic is exact
    integer microseconds; attributed value sums in decimal."""
    e = load_tables(spark, sf_dir)["events"]
    bucket_us = 900_000_000
    c = e.filter(F.col("event_type") == "click").select(
        "user_id", F.unix_micros("ts").alias("cus")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.unix_micros("ts").alias("pus"),
        "value",
        (F.unix_micros("ts") / bucket_us).cast("bigint").alias("pb"),
    )
    cb = c.withColumn(
        "cb",
        F.explode(
            F.array(
                (F.col("cus") / bucket_us).cast("bigint"),
                (F.col("cus") / bucket_us).cast("bigint") + 1,
            )
        ),
    )
    pairs = cb.join(
        p,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("pb") == F.col("cb"))
        & (F.col("pus") > F.col("cus"))
        & (F.col("pus") <= F.col("cus") + bucket_us),
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(dec("value")).cast("double").alias("attributed_value"),
        F.min(F.col("pus") - F.col("cus")).cast("bigint").alias("min_gap_us"),
    )


def _stream_neardup_oracle() -> str:
    from world_cup_duckdb_spark.queries.ext_dedup import (
        _bands_sql,
        _CORPUS_SQL,
    )

    return f"""
    WITH {_bands_sql(_CORPUS_SQL, '')},
    hub AS (
      SELECT band, band_key, MIN(doc_id) AS hub
      FROM bands GROUP BY band, band_key
    ),
    m AS (
      SELECT b.doc_id, CAST(MIN(h.hub) AS BIGINT) AS matched_doc
      FROM bands b JOIN hub h USING (band, band_key)
      WHERE h.hub < b.doc_id
      GROUP BY b.doc_id
    )
    SELECT d.doc_id, m.matched_doc,
           m.matched_doc IS NOT NULL AS is_dup
    FROM (SELECT DISTINCT doc_id FROM ({_CORPUS_SQL})) d
    LEFT JOIN m USING (doc_id)
    """


@register("ext_stream_neardup", oracle=_stream_neardup_oracle())
def ext_stream_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH TWIN of the streaming near-dup detector
    (streaming/neardup.py): per document, the minimum EARLIER-arriving
    document (smaller id) sharing any LSH band bucket — the bucket hub —
    or NULL when the document is novel. In the streaming form the hub
    is one long of applyInPandasWithState state per bucket, updated as
    batches arrive; here it is one aggregate over the static band
    table. tests/test_streaming.py proves the two produce identical
    rows across micro-batch splits, and this oracle hash-checks the
    semantics against DuckDB.

    Scale: hub aggregation + hub join are both keyed by (band,
    band_key) — md5-uniform, one shuffle shape; per-document reduce is
    a plain min. No pair set is ever materialized (star-edge shape,
    linear in bucket size)."""
    from world_cup_duckdb_spark.operators.dedup import (
        minhash_bands,
        with_recrawl,
    )
    from world_cup_duckdb_spark.queries import tracked_persist

    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    bands = minhash_bands(
        with_recrawl(d), num_hashes=8, band_size=2
    ).transform(tracked_persist)
    hub = bands.groupBy("band", "band_key").agg(
        F.min("doc_id").alias("hub")
    )
    m = (
        bands.join(hub, ["band", "band_key"])
        .filter(F.col("hub") < F.col("doc_id"))
        .groupBy("doc_id")
        .agg(F.min("hub").cast("bigint").alias("matched_doc"))
    )
    return (
        with_recrawl(d)
        .select("doc_id")
        .distinct()
        .join(m, "doc_id", "left")
        .select(
            "doc_id",
            "matched_doc",
            F.col("matched_doc").isNotNull().alias("is_dup"),
        )
    )


@register(
    "ext_stream_topk",
    oracle="""
    SELECT event_type, user_id, n_events, CAST(rnk AS INT) AS rank
    FROM (
      SELECT event_type, user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY COUNT(*) DESC, user_id) AS rnk
      FROM events
      GROUP BY event_type, user_id
    )
    WHERE rnk <= 3
    """,
)
def ext_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH TWIN of the streaming leaderboard (streaming/topk.py): the
    top-3 users per event type by exact event count, ties broken by
    user_id. In the streaming form the per-type tallies live as keyed
    applyInPandasWithState state and the top-3 re-emits after every
    trigger; here it is one (type, user) count aggregate plus a ranking
    window over the per-type rows. tests/test_streaming.py proves the
    stream's final emission equals these rows across micro-batch
    splits — counts are order-independent, so the equivalence holds for
    any arrival order (unlike neardup's arrival-ordered hub rule).

    Scale: the count aggregate partial-combines map-side and shuffles
    pre-reduced (type, user) rows; the window ranks per-type
    aggregates, never raw events. Streaming state is O(users per
    type); the operator docstring names the space-saving swap for
    unbounded cardinality."""
    e = load_tables(spark, sf_dir)["events"]
    from pyspark.sql import Window

    counts = e.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("n_events"), F.asc("user_id")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("event_type", "user_id", "n_events", "rank")
    )
