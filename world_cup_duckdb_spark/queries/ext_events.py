"""Event-analytics extension queries over the `events` table: funnel
conversion and cohort retention — the product-analytics shapes an event
store exists to answer (complementing the windowing queries in
ext_stream.py).

Scale notes: both queries shuffle once on user_id and then work entirely
within user partitions (window functions / conditional aggregation over
tens of events per user) — the per-user state is bounded, so the plans
scale with users, not events-per-shuffle-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import load_tables, table


@register(
    "ext_funnel_click_purchase",
    oracle="""
    WITH clicks AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS click_ts FROM events
      WHERE event_type = 'click'
    ),
    conv AS (
      SELECT c.user_id,
             MIN(CAST(e.ts AS TIMESTAMP)) AS first_conversion
      FROM clicks c
      JOIN events e
        ON e.user_id = c.user_id
       AND e.event_type = 'purchase'
       AND CAST(e.ts AS TIMESTAMP) > c.click_ts
       AND CAST(e.ts AS TIMESTAMP) <= c.click_ts + INTERVAL '30 minutes'
      GROUP BY c.user_id
    )
    SELECT user_id, first_conversion FROM conv
    """,
)
def ext_funnel_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel: users who purchased within 30 minutes of a click, with
    their earliest such conversion time. Expressed as a range self-join
    (click → purchase within the window) + min-aggregate; Catalyst plans
    one shuffle per side on user_id."""
    e = load_tables(spark, sf_dir)["events"]
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    return (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("click_ts"))
            & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .groupBy("user_id")
        .agg(F.min("p_ts").alias("first_conversion"))
    )


@register(
    "ext_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE))
               AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id,
             CAST(date_trunc('week', CAST(e.ts AS TIMESTAMP)) AS DATE)
               AS active_week
      FROM events e
    )
    SELECT f.cohort_week,
           CAST((a.active_week - f.cohort_week) / 7 AS INT) AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM firsts f JOIN activity a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def ext_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen week,
    counted per subsequent active week. Two aggregations sharing the
    user_id shuffle; the cohort join broadcasts (≤ distinct users)."""
    e = load_tables(spark, sf_dir)["events"]
    week = F.date_trunc("week", F.col("ts")).cast("date")
    firsts = e.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    activity = e.select("user_id", week.alias("active_week")).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("active_week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
        .select("cohort_week", "week_offset", "n_active")
    )


@register(
    "ext_asof_join",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      WHERE event_type = 'purchase'
    ),
    clicks AS (
      -- one row per (user, ts): ASOF JOIN's pick among right-side ts
      -- ties is unspecified, so ties are collapsed to MAX(event_id) —
      -- the same row the Spark operator's max-payload tie-break carries
      SELECT CAST(MAX(event_id) AS BIGINT) AS click_event_id, user_id,
             CAST(ts AS TIMESTAMP) AS click_ts
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts, c.click_event_id, c.click_ts
    FROM purchases p
    ASOF JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
)
def ext_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase paired with the same user's latest click
    at-or-before it — DuckDB runs its native ASOF JOIN as the oracle;
    Spark runs the union+window technique
    (operators/relational.py:asof_join). Same single-shuffle cost shape
    as a windowed aggregation; no range cross-join anywhere."""
    from world_cup_duckdb_spark.operators.relational import asof_join

    e = load_tables(spark, sf_dir)["events"]
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    return asof_join(
        purchases, clicks,
        key="user_id", left_ts="ts", right_ts="click_ts",
        right_cols=["click_event_id", "click_ts"],
    )


@register(
    "ext_range_join",
    oracle="""
    WITH hours AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
             COUNT(*) AS c
      FROM events GROUP BY 1
      ORDER BY c DESC, h LIMIT 5
    ),
    iv AS (
      SELECT h AS window_start,
             h + INTERVAL '1 hour' - INTERVAL '1 microsecond' AS window_end
      FROM hours
    )
    SELECT e.event_id, e.user_id, iv.window_start
    FROM events e
    JOIN iv ON CAST(e.ts AS TIMESTAMP) BETWEEN iv.window_start AND iv.window_end
    WHERE e.event_type = 'error'
    """,
)
def ext_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-containment join: error events falling inside the 5 busiest
    hours. Spark runs the bucketized rewrite (explode intervals to hour
    buckets → equi-join → exact filter;
    operators/relational.py:bucketed_range_join) — never a cross join;
    the oracle runs the naive BETWEEN join."""
    from world_cup_duckdb_spark.operators.relational import bucketed_range_join

    e = load_tables(spark, sf_dir)["events"]
    hours = (
        e.groupBy(F.date_trunc("hour", "ts").alias("window_start"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("window_start"))
        .limit(5)
        .select(
            "window_start",
            (
                F.col("window_start")
                + F.expr("INTERVAL 1 HOUR")
                - F.expr("INTERVAL 1 MICROSECOND")
            ).alias("window_end"),
        )
    )
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    return bucketed_range_join(
        errors, hours, "ts", "window_start", "window_end", bucket_seconds=3600
    ).select("event_id", "user_id", "window_start")


@register(
    "ext_kmv_sketch",
    oracle=f"""
    WITH hashed AS (
      SELECT DISTINCT l_returnflag, md5(CAST(l_partkey AS VARCHAR)) AS h
      FROM lineitem
    ),
    ranked AS (
      SELECT l_returnflag, h,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
      FROM hashed
    ),
    kth AS (
      SELECT l_returnflag, MAX(rn) AS n_kept, MAX(h) AS kth_hash
      FROM ranked WHERE rn <= 64 GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE)
                ELSE 63.0 / (CAST(concat('0x', substring(kth_hash, 1, 13))
                                  AS BIGINT) / 4503599627370496.0)
           END AS kmv_estimate
    FROM kth
    """,
)
def ext_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch per l_returnflag over l_partkey —
    deterministic md5-based sketching, so the ESTIMATE (not just the
    mechanism) is bit-identical across engines
    (operators/sketch.py:kmv_distinct_estimate; mergeable min-k at
    scale)."""
    from world_cup_duckdb_spark.operators.sketch import kmv_distinct_estimate

    li = load_tables(spark, sf_dir)["lineitem"]
    return kmv_distinct_estimate(li, "l_partkey", ["l_returnflag"], k=64)


@register(
    "ext_json_extract",
    oracle="""
    SELECT event_type,
           CAST(COUNT(k) AS BIGINT) AS n_with_k,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(MAX(k) AS INT) AS max_k
    FROM (
      -- mirrors Spark from_json('k INT') on DIRTY payloads (verified on
      -- malformed json, float/string/bool/overflow/missing/null k):
      -- only a JSON integer that fits INT yields a value, else NULL
      SELECT event_type,
             TRY_CAST(CASE WHEN json_valid(props)
                            AND json_type(props, '$.k')
                                IN ('UBIGINT', 'BIGINT')
                       THEN json_extract_string(props, '$.k')
                  END AS INTEGER) AS k
      FROM events
    ) e
    GROUP BY event_type
    """,
)
def ext_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: `events.props` holds a JSON payload as
    a string; pull the typed field out and aggregate it per event type.

    Uses `from_json` with a declared schema rather than per-field
    `get_json_object`: one parse per row materializes every needed field
    (n extractions with get_json_object would parse the document n
    times), stays JVM-side (Jackson inside codegen — no Python), and
    malformed documents become NULL rather than failing the scan, which
    is the posture a 100 TB corpus with dirty payloads needs."""
    e = load_tables(spark, sf_dir)["events"]
    parsed = e.select(
        "event_type",
        F.from_json("props", "k INT").alias("p"),
    ).select("event_type", F.col("p.k").alias("k"))
    return parsed.groupBy("event_type").agg(
        F.count("k").cast("bigint").alias("n_with_k"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.max("k").cast("int").alias("max_k"),
    )


@register(
    "ext_stream_enrich",
    oracle="""
    SELECT make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 600000000)
                          * 600000000) AS window_start,
           c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    WHERE ts IS NOT NULL  -- mirrors F.window's implicit isnotnull filter
    GROUP BY 1, 2
    """,
)
def ext_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (batch twin): events joined to the
    customer dimension, rolled up per (10-min window, market segment).

    Runs streaming/windows.py:enrich_events verbatim on batch frames —
    the unified-API proof that the streaming enrichment pipeline computes
    exactly the batch join+rollup (tests/test_streaming.py drives the
    same function from readStream and compares). The dim side is
    broadcast: at 100 TB of events the join adds no shuffle and no
    streaming state."""
    from world_cup_duckdb_spark.streaming.windows import enrich_events

    t = load_tables(spark, sf_dir)
    return enrich_events(t["events"], t["customer"])


@register(
    "ext_scd2_intervals",
    oracle="""
    SELECT user_id, event_type, value AS state_value,
           CAST(ts AS TIMESTAMP) AS valid_from,
           LEAD(CAST(ts AS TIMESTAMP)) OVER (
             PARTITION BY user_id, event_type ORDER BY ts, event_id
           ) AS valid_to,
           CAST(CASE WHEN LEAD(ts) OVER (
                  PARTITION BY user_id, event_type ORDER BY ts, event_id
                ) IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
    FROM events
    """,
)
def ext_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build: turn a change stream into
    validity intervals — each (user, attribute) version is valid from its
    event time until the next version's (valid_to NULL + is_current=1 on
    the open-ended latest row). The warehouse primitive behind
    as-of-correct historical joins; ext_asof_join is its query-side twin,
    and ext_upsert_latest is the degenerate keep-only-current case.

    Scale: one shuffle on (user_id, event_type), one LEAD window pass —
    no self-join (the naive interval build joins the stream to itself;
    LEAD halves the cost and cannot skew worse than the key already
    does). Incremental maintenance appends new versions and closes only
    the previously-open rows of touched keys.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        "event_type",
        F.col("value").alias("state_value"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).cast("int").alias("is_current"),
    )


@register(
    "ext_variant_json",
    oracle="""
    WITH j AS (
      SELECT event_type,
             '{"user":' || user_id || ',"type":"' || event_type
               || '","payload":' || props || '}' AS doc
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(DISTINCT CAST(json_extract_string(doc, '$.user')
                                    AS BIGINT)) AS BIGINT) AS n_users,
           CAST(SUM(CAST(json_extract_string(doc, '$.payload.k')
                         AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(doc, '$.payload.k')
                         AS INTEGER)) AS INT) AS max_k
    FROM j
    GROUP BY event_type
    """,
)
def ext_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics over the VARIANT type (Spark 4.0): each
    event's payload is wrapped into a nested JSON document, parsed ONCE
    into Spark's binary variant encoding with `parse_json`, then fields
    come out through `variant_get` path extraction with per-path result
    types — no schema declared up front, unlike ext_json_extract's
    `from_json`, which is the right tool only when the shape is known.

    Scale: variant's binary encoding makes repeated path extraction cheap
    (no re-parse per field, unlike chained get_json_object), and at rest
    parquet shreds variant columns so scans prune to the touched paths.
    The whole pipeline is JVM-side codegen; the aggregate is a standard
    two-phase hash agg on a 5-value key. The oracle runs DuckDB's JSON
    extraction over the identical constructed document."""
    e = load_tables(spark, sf_dir)["events"]
    doc = F.concat(
        F.lit('{"user":'),
        F.col("user_id").cast("string"),
        F.lit(',"type":"'),
        F.col("event_type"),
        F.lit('","payload":'),
        F.col("props"),
        F.lit("}"),
    )
    v = F.parse_json(doc)
    parsed = e.select(
        "event_type",
        F.try_variant_get(v, "$.user", "bigint").alias("u"),
        F.try_variant_get(v, "$.payload.k", "int").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.countDistinct("u").alias("n_users"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.max("k").cast("int").alias("max_k"),
    )


@register(
    "ext_top_paths",
    oracle="""
    WITH r AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    p AS (
      SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= 5 GROUP BY user_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM p GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT 20
    """,
)
def ext_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 onboarding paths: each user's first five events as an
    ordered `a>b>c` path string, counted across users — the user-journey
    mining query behind funnel design (complements ext_transition_matrix,
    which is the memoryless one-step view; this is the exact-prefix view).

    Scale: one shuffle on user_id; the path build is a window row_number
    + an array_sort over the ≤5 collected (rn, type) structs per user —
    per-partition work with bounded per-key state. The path→count agg
    shuffles only |users| short strings with map-side partials;
    TakeOrderedAndProject keeps the final top-k sort local. Determinism:
    (ts, event_id) total order, struct sort on rn."""
    e = load_tables(spark, sf_dir)["events"]
    # asc_nulls_last: a null-ts event must rank last like the oracle
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), "event_id"
    )
    paths = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .groupBy("user_id")
        .agg(
            F.expr(
                "concat_ws('>', transform(array_sort(collect_list("
                "struct(rn, event_type))), s -> s.event_type))"
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(20)
    )


@register(
    "ext_hll_sketch_union",
    oracle="""
    SELECT CAST(COUNT(DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)))
                AS BIGINT) AS n_days,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_total,
           CAST('ok' AS VARCHAR) AS est_status
    FROM events
    """,
)
def ext_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable cardinality sketches as DATA (Apache DataSketches HLL,
    Spark 4 `hll_sketch_agg`/`hll_union_agg`): build one user-cardinality
    sketch per day, then union the per-day sketches into a whole-range
    estimate — the two-level pattern a 100 TB rollup needs, where daily
    partials are stored once (bytes, not user sets) and any date range
    re-aggregates by unioning sketches instead of rescanning facts.

    Oracle strategy: the sketch binary and its exact estimate are
    implementation-defined, so the hash-checked columns are n_days,
    exact_total (both SQL-exact) and est_status — 'ok' iff the unioned
    estimate is within 5% relative error (HLL lgConfigK=12 has ~1.6%
    standard error, so 'ok' is the deterministic expected value). On a
    bound failure est_status CARRIES the estimate ("est=N exact=M"), so
    the driver's value diff shows how far off it was instead of an
    opaque boolean flip. The exact twin lives in
    ext_window_distinct_users at hour grain."""
    e = load_tables(spark, sf_dir)["events"]
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    est = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_union"),
    )
    exact = e.agg(F.countDistinct("user_id").alias("exact_total"))
    within = (
        F.abs(F.col("est_union") - F.col("exact_total"))
        / F.col("exact_total")
        <= F.lit(0.05)
    )
    return est.crossJoin(exact).select(
        "n_days",
        "exact_total",
        F.when(within, F.lit("ok"))
        .otherwise(
            F.concat(
                F.lit("est="),
                F.round("est_union", 1).cast("string"),
                F.lit(" exact="),
                F.col("exact_total").cast("string"),
            )
        )
        .alias("est_status"),
    )


@register(
    "ext_ab_test",
    oracle="""
    WITH users AS (
      SELECT user_id,
             CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS variant,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) >= 14
                  THEN 1 ELSE 0 END AS converted
      FROM events
      GROUP BY user_id
    ),
    agg AS (
      SELECT
        CAST(COUNT(*) FILTER (WHERE variant = 'A') AS BIGINT) AS n_a,
        CAST(SUM(converted) FILTER (WHERE variant = 'A') AS BIGINT) AS conv_a,
        CAST(COUNT(*) FILTER (WHERE variant = 'B') AS BIGINT) AS n_b,
        CAST(SUM(converted) FILTER (WHERE variant = 'B') AS BIGINT) AS conv_b
      FROM users
    )
    SELECT n_a, conv_a, n_b, conv_b,
           ROUND(conv_a / CAST(n_a AS DOUBLE), 8) AS rate_a,
           ROUND(conv_b / CAST(n_b AS DOUBLE), 8) AS rate_b,
           ROUND(
             (conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE))
             / sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                    * (1 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 / n_a + 1.0 / n_b)),
             6) AS z_score
    FROM agg
    """,
)
def ext_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment readout: users deterministically hash-bucketed into
    variants (md5 hex prefix — the reproducible assignment every
    experimentation platform needs so reruns and engines agree),
    heavy-purchaser conversion (≥14 purchase events — a thresholded
    metric so both arms have non-degenerate rates on this fixture) per
    variant, and the pooled two-proportion z-statistic — the end-to-end
    A/B analysis in one query.

    Scale: one shuffle keyed user_id (conversion flag per user is a
    max-aggregate), then a single-row global conditional aggregate; the
    z arithmetic is a map-side expression on that one row. Cross-engine
    float parity: counts are exact, IEEE sqrt is correctly rounded, and
    the outputs are ROUND-pinned."""
    e = load_tables(spark, sf_dir)["events"]
    users = e.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            >= 14
        )
        .cast("int")
        .alias("converted")
    ).select(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", "A"
        )
        .otherwise("B")
        .alias("variant"),
        "converted",
    )
    agg = users.agg(
        F.count(F.when(F.col("variant") == "A", 1)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("variant") == "A", F.col("converted")))
        .cast("bigint")
        .alias("conv_a"),
        F.count(F.when(F.col("variant") == "B", 1)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("variant") == "B", F.col("converted")))
        .cast("bigint")
        .alias("conv_b"),
    )
    rate_a = F.col("conv_a") / F.col("n_a").cast("double")
    rate_b = F.col("conv_b") / F.col("n_b").cast("double")
    pooled = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    z = (rate_a - rate_b) / F.sqrt(
        pooled * (1 - pooled) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return agg.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(rate_a, 8).alias("rate_a"),
        F.round(rate_b, 8).alias("rate_b"),
        F.round(z, 6).alias("z_score"),
    )


@register(
    "ext_funnel_strict3",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t1
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
      SELECT s.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t2
      FROM s JOIN events e
        ON e.user_id = s.user_id AND e.event_type = 'click'
       AND CAST(e.ts AS TIMESTAMP) > s.t1
       AND CAST(e.ts AS TIMESTAMP) <= s.t1 + INTERVAL '24 hours'
      GROUP BY s.user_id
    ),
    p AS (
      SELECT c.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t3
      FROM c JOIN events e
        ON e.user_id = c.user_id AND e.event_type = 'purchase'
       AND CAST(e.ts AS TIMESTAMP) > c.t2
       AND CAST(e.ts AS TIMESTAMP) <= c.t2 + INTERVAL '24 hours'
      GROUP BY c.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_signup,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_then_click,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_then_purchase,
           ROUND((SELECT COUNT(*) FROM c)
                 / CAST((SELECT COUNT(*) FROM s) AS DOUBLE), 8) AS step2_rate,
           ROUND((SELECT COUNT(*) FROM p)
                 / CAST((SELECT COUNT(*) FROM c) AS DOUBLE), 8) AS step3_rate
    """,
)
def ext_funnel_strict3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered three-step funnel: first signup, then the first
    click within 24 hours AFTER it, then the first purchase within 24
    hours after THAT — event order and step deadlines matter, not mere
    co-occurrence (the two-step ext_funnel_click_purchase checks one
    window; this checks the full ordered chain with per-step time
    budgets, the shape real activation funnels need).

    Scale: three min-aggregates, each joined forward on user_id — every
    stage shuffles on the same key so AQE plans co-partitioned joins;
    per-user state is one timestamp per stage. The final counts collapse
    to a single row (scalar aggregates on tiny frames)."""
    e = load_tables(spark, sf_dir)["events"]

    def first_after(prev: DataFrame, etype: str, tcol: str, out: str) -> DataFrame:
        return (
            prev.join(
                e.filter(F.col("event_type") == etype).select(
                    "user_id", F.col("ts").alias("ets")
                ),
                "user_id",
            )
            .filter(
                (F.col("ets") > F.col(tcol))
                & (F.col("ets") <= F.col(tcol) + F.expr("INTERVAL 24 HOURS"))
            )
            .groupBy("user_id")
            .agg(F.min("ets").alias(out))
        )

    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = first_after(s, "click", "t1", "t2")
    p = first_after(c, "purchase", "t2", "t3")
    counts = (
        s.agg(F.count(F.lit(1)).cast("bigint").alias("n_signup"))
        .crossJoin(c.agg(F.count(F.lit(1)).cast("bigint").alias("n_then_click")))
        .crossJoin(
            p.agg(F.count(F.lit(1)).cast("bigint").alias("n_then_purchase"))
        )
    )
    return counts.select(
        "n_signup",
        "n_then_click",
        "n_then_purchase",
        F.round(
            F.col("n_then_click") / F.col("n_signup").cast("double"), 8
        ).alias("step2_rate"),
        F.round(
            F.col("n_then_purchase") / F.col("n_then_click").cast("double"), 8
        ).alias("step3_rate"),
    )


@register(
    "ext_cusum",
    oracle="""
    WITH RECURSIVE hourly AS (
      SELECT event_type,
             make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000)
                            * 3600000000) AS h,
             COUNT(*) AS x
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, h, x,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM hourly
    ),
    mu AS (
      SELECT event_type, SUM(x) / CAST(COUNT(*) AS DOUBLE) AS mean_x
      FROM hourly GROUP BY event_type
    ),
    walk AS (
      SELECT i.event_type, i.rn, i.h, i.x,
             GREATEST(0.0, i.x - m.mean_x) AS s
      FROM idx i JOIN mu m USING (event_type) WHERE i.rn = 1
      UNION ALL
      SELECT i.event_type, i.rn, i.h, i.x,
             GREATEST(0.0, w.s + i.x - m.mean_x)
      FROM walk w
      JOIN idx i ON i.event_type = w.event_type AND i.rn = w.rn + 1
      JOIN mu m ON m.event_type = i.event_type
    )
    SELECT event_type, h AS hour_start,
           CAST(x AS BIGINT) AS n_events,
           ROUND(s, 6) AS cusum,
           s > 20.0 AS alarm
    FROM walk
    """,
)
def ext_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection over per-type hourly event rates:
    S_t = max(0, S_{t-1} + x_t − mean) with an alarm threshold — the
    monitoring primitive that flags sustained rate shifts a fixed
    threshold misses.

    The recurrence is NON-ASSOCIATIVE (the max-with-zero clamp), so no
    window frame or prefix-sum expresses it — this is precisely the
    case for the Arrow group-map escape hatch (`applyInPandas` per
    event_type over hour-sorted rows; engine policy: builtins first,
    Python only for genuinely sequential state). The oracle walks the
    identical recurrence with a RECURSIVE CTE. Floats stay bit-equal:
    hourly counts are exact ints, the mean is an exact-sum division,
    and both engines apply the same IEEE add/clamp sequence in the same
    order.

    Scale: the fact scan reduces to |types| × |hours| rows BEFORE any
    Python; the group-map receives only that tiny frame per key (state
    = one running double). A streaming twin would be
    applyInPandasWithState on the same recurrence."""
    import pandas as pd

    e = load_tables(spark, sf_dir)["events"]
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(F.count(F.lit(1)).alias("n_events"))

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("hour_start").reset_index(drop=True)
        mean_x = float(pdf["n_events"].sum()) / len(pdf)
        s = 0.0
        out = []
        for x in pdf["n_events"]:
            s = max(0.0, s + float(x) - mean_x)
            out.append(s)
        pdf["cusum"] = [round(v, 6) for v in out]
        pdf["alarm"] = [v > 20.0 for v in out]
        return pdf

    return (
        hourly.groupBy("event_type")
        .applyInPandas(
            walk,
            schema="event_type string, hour_start timestamp, n_events bigint, "
            "cusum double, alarm boolean",
        )
    )


@register(
    "ext_sketch_incremental",
    oracle="""
    SELECT CAST(COUNT(DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)))
                AS BIGINT) AS n_sketch_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_total,
           CAST('ok' AS VARCHAR) AS est_status
    FROM events
    """,
)
def ext_sketch_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-state LIFECYCLE — the index-persistence pattern applied to
    cardinality partials: per-day HLL user sketches for all but the
    newest day are built once and PERSISTED as parquet binary rows
    (bytes, not user sets); the newest day's batch then builds ONLY its
    own sketch and APPENDS, exactly like ivf_index_append; serving the
    whole-range distinct-user estimate reads the persisted partials and
    unions them — zero fact-table rescan for the historical days. This
    is how a 100 TB rollup answers "distinct users, any date range"
    without ever re-touching old facts.

    Oracle strategy (shared with ext_hll_sketch_union): the sketch
    binary is implementation-defined, so the hash-checked columns are
    the partial count and the SQL-exact total, plus est_status = 'ok'
    iff the round-tripped union lands within 5% of exact (HLL
    lgConfigK=12 ≈ 1.6% se). On failure the status CARRIES est/exact.
    The full-build ≡ build-then-append equivalence through the parquet
    round trip is what this key adds over the in-memory form."""
    import os

    from world_cup_duckdb_spark.queries.lifecycle import _fresh_dir

    e = load_tables(spark, sf_dir)["events"].filter(F.col("ts").isNotNull())
    days = e.select(F.date_trunc("day", "ts").alias("day"), "user_id")
    last_day = days.agg(F.max("day")).collect()[0][0]  # bounded: 1 row
    loc = _fresh_dir("sketch-incremental")
    hist = (
        days.filter(F.col("day") < F.lit(last_day))
        .groupBy("day")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    hist.write.mode("overwrite").parquet(os.path.join(loc, "partials"))
    newest = (
        days.filter(F.col("day") == F.lit(last_day))
        .groupBy("day")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    newest.write.mode("append").parquet(os.path.join(loc, "partials"))

    persisted = spark.read.parquet(os.path.join(loc, "partials"))
    est = persisted.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sketch_rows"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_union"),
    )
    exact = e.agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_total")
    )
    within = (
        F.abs(F.col("est_union") - F.col("exact_total"))
        / F.col("exact_total")
        <= F.lit(0.05)
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "n_sketch_rows",
        "exact_total",
        F.when(within, F.lit("ok"))
        .otherwise(
            F.concat(
                F.lit("est="),
                F.col("est_union").cast("string"),
                F.lit(" exact="),
                F.col("exact_total").cast("string"),
            )
        )
        .alias("est_status"),
    )


@register(
    "ext_ohlc_bars",
    oracle="""
    WITH e AS (
      SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, value,
             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY bar ORDER BY ts, event_id)
               AS rn_open,
             ROW_NUMBER() OVER (PARTITION BY bar ORDER BY ts DESC,
                                event_id DESC) AS rn_close
      FROM e
    )
    SELECT bar,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(CASE WHEN rn_open = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_close = 1 THEN value END) AS close
    FROM ranked GROUP BY bar
    """,
)
def ext_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars — the canonical time-series downsample
    (open / high / low / close per hour over the event value stream),
    what every metrics store and trading system materializes at ingest.
    Open and close are the FIRST and LAST values under the (ts,
    event_id) total order — row_number tie-broken, not arg_min/arg_max,
    because both engines leave argmin ties unspecified while a
    row_number over a total order is deterministic everywhere.

    Scale: one (bar) exchange; the two rank windows and the aggregate
    all share it (same partition key), and high/low/count are plain
    map-side-combinable aggregates. At 100 TB this is the shape of a
    streaming-materialized rollup (ext_rollup_hypertable's hour grain;
    the streaming twin is a tumbling window with the same expressions).

    Determinism: values pass through untouched (no float arithmetic at
    all — min/max/first/last only), counts exact."""
    from pyspark.sql import Window

    e = (
        load_tables(spark, sf_dir)["events"]
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_id",
            "ts",
            "value",
            F.date_trunc("hour", "ts").alias("bar"),
        )
    )
    w_open = Window.partitionBy("bar").orderBy(F.asc("ts"), F.asc("event_id"))
    w_close = Window.partitionBy("bar").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    ranked = e.withColumn("rn_open", F.row_number().over(w_open)).withColumn(
        "rn_close", F.row_number().over(w_close)
    )
    return ranked.groupBy("bar").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max(F.when(F.col("rn_open") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_close") == 1, F.col("value"))).alias("close"),
    )


@register(
    "ext_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
      FROM events WHERE ts IS NOT NULL
    ),
    islands AS (
      SELECT user_id, d,
             CAST(d - CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY d) AS INT) AS DATE) AS island
      FROM days
    ),
    streaks AS (
      SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len,
             MIN(d) AS streak_start, MAX(d) AS streak_end
      FROM islands GROUP BY user_id, island
    ),
    best AS (
      SELECT user_id, len, streak_start, streak_end FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY len DESC, streak_start) AS rn
        FROM streaks
      ) WHERE rn = 1
    )
    SELECT user_id, len AS longest_streak_days, streak_start, streak_end
    FROM best
    ORDER BY longest_streak_days DESC, user_id LIMIT 25
    """,
)
def ext_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's LONGEST run of consecutive active
    days — the classic SQL pattern behind engagement streaks, uptime
    runs, and sensor-contiguity reports, done the set-based way: a day
    minus its per-user rank is CONSTANT within a consecutive run, so
    the island key is pure window math (no self-join, no recursion),
    then one count per island and an argmax per user. Top 25 by streak
    length ships.

    Scale: distinct-day reduce, rank window, island aggregate, and the
    per-user argmax all hash on user_id — ONE exchange family; the
    final top-25 is a TakeOrderedAndProject. Determinism: dates and
    integers only; ties broken (len DESC, streak_start) per user and
    (streak DESC, user_id) globally."""
    from pyspark.sql import Window

    days = (
        load_tables(spark, sf_dir)["events"]
        .filter(F.col("ts").isNotNull())
        .select(
            "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "island", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("bigint").alias("len"),
        F.min("d").alias("streak_start"),
        F.max("d").alias("streak_end"),
    )
    w_best = Window.partitionBy("user_id").orderBy(
        F.desc("len"), F.asc("streak_start")
    )
    best = (
        streaks.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("len").alias("longest_streak_days"),
            "streak_start",
            "streak_end",
        )
    )
    return best.orderBy(
        F.desc("longest_streak_days"), F.asc("user_id")
    ).limit(25)


@register(
    "ext_attribution_linear",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events
      WHERE event_type = 'purchase' AND ts IS NOT NULL AND value IS NOT NULL
    ),
    clicks AS (
      SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS cts
      FROM events WHERE event_type = 'click' AND ts IS NOT NULL
    ),
    touch AS (
      SELECT p.event_id, p.cents, c.click_id, c.cts
      FROM purchases p JOIN clicks c
        ON c.user_id = p.user_id
       AND c.cts <= p.ts
       AND c.cts >= p.ts - INTERVAL 1 HOUR
    ),
    credited AS (
      SELECT click_id, cts,
             CAST(1000000 // COUNT(*) OVER (PARTITION BY event_id)
                  AS BIGINT) AS credit_ppm,
             CAST(cents // COUNT(*) OVER (PARTITION BY event_id)
                  AS BIGINT) AS credit_cents
      FROM touch
    )
    SELECT CAST(EXTRACT(hour FROM cts) AS INT) AS click_hour,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(credit_ppm) AS BIGINT) AS attributed_purchases_ppm,
           CAST(SUM(credit_cents) AS BIGINT) AS attributed_cents
    FROM credited GROUP BY 1
    """,
)
def ext_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution — the marketing-analytics workload
    between last-touch (ext_asof_join) and a full Markov model: every
    click by the purchasing user within the hour before a purchase
    shares the conversion credit equally, and credit rolls up by click
    hour-of-day (when do converting touches happen). Fractional credit
    is carried as EXACT integers — purchase value floored to cents once,
    then integer-divided by the touch count (ppm for the count credit) —
    because summing 1/n doubles across an unordered shuffle would be
    accumulation-order-dependent; the floor bias is documented and
    identical in both engines.

    Scale: the touch join shuffles both sides on user_id once and
    applies the 1-hour band as a post-join range predicate — the
    standard banded-join shape (a production deployment bucketing by
    (user, hour) makes the band an equi-join key, same rows); the
    per-purchase touch count is a window over the sparse touch set; the
    final rollup is a 24-key aggregate. Determinism: integers end to
    end; one floor(value*100) per purchase is the only float op."""
    e = load_tables(spark, sf_dir)["events"]
    from pyspark.sql import Window

    purchases = e.filter(
        (F.col("event_type") == "purchase")
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    clicks = e.filter(
        (F.col("event_type") == "click") & F.col("ts").isNotNull()
    ).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("cts"),
    )
    touch = purchases.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("cts") <= F.col("ts"))
        & (F.col("cts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")),
    ).select("event_id", "cents", "click_id", "cts")
    w = Window.partitionBy("event_id")
    credited = touch.select(
        "click_id",
        "cts",
        F.floor(F.lit(1000000) / F.count(F.lit(1)).over(w))
        .cast("bigint")
        .alias("credit_ppm"),
        F.floor(F.col("cents") / F.count(F.lit(1)).over(w))
        .cast("bigint")
        .alias("credit_cents"),
    )
    return credited.groupBy(
        F.hour("cts").cast("int").alias("click_hour")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.sum("credit_ppm").cast("bigint").alias("attributed_purchases_ppm"),
        F.sum("credit_cents").cast("bigint").alias("attributed_cents"),
    )


@register(
    "ext_forecast_backtest",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
               AS d
      FROM events WHERE ts IS NOT NULL
    ),
    ranked AS (
      SELECT d, ROW_NUMBER() OVER (ORDER BY d) AS rn,
             COUNT(*) OVER () AS n
      FROM days
    ),
    cutoff AS (
      SELECT d AS cutoff_day FROM ranked
      WHERE rn = CAST(ceil(0.8 * n) AS BIGINT)
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT d, event_type FROM days CROSS JOIN types),
    actual AS (
      SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
             event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    full_grid AS (
      SELECT g.d, g.event_type, COALESCE(a.c, 0) AS c,
             CAST(dayofweek(g.d) AS INT) AS dow
      FROM grid g LEFT JOIN actual a
        ON a.d = g.d AND a.event_type = g.event_type
    ),
    train AS (
      SELECT event_type, dow,
             CAST(SUM(c) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
      FROM full_grid, cutoff WHERE d <= cutoff_day
      GROUP BY event_type, dow
    ),
    test AS (
      SELECT f.event_type, f.d, f.c,
             CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE) AS forecast
      FROM full_grid f
      CROSS JOIN cutoff
      JOIN train t ON t.event_type = f.event_type AND t.dow = f.dow
      WHERE f.d > cutoff_day
    ),
    folded AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_test_days,
             CAST(list_reduce(
               list_transform(
                 list_sort(list(struct_pack(d := d,
                                            ae := ABS(forecast
                                                      - CAST(c AS DOUBLE))))),
                 x -> x.ae),
               (a, b) -> a + b) AS DOUBLE) AS ae_sum
      FROM test GROUP BY event_type
    )
    SELECT event_type, n_test_days,
           ae_sum / CAST(n_test_days AS DOUBLE) AS mae
    FROM folded
    """,
)
def ext_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest — the baseline every demand /
    capacity forecasting pipeline is graded against: per event type,
    forecast each held-out day's event count as the TRAINING mean for
    that day-of-week (the first 80% of days train, the rest test, zero
    days included via the day x type grid), and report per-type MAE.
    Any real model must beat this row to earn its complexity.

    Scale: the only corpus pass is the (day, type) count aggregate
    (map-side partials); everything downstream — the day rank, the
    80% cutoff (single-row), the dow means, the backtest join — runs on
    day-grain relations. The MAE's |error| sum is the one cross-row
    float reduction, so it folds a day-sorted collected array per type
    (bounded by the test-window length) in ONE fixed order on both
    engines; 0.0-seeded fold == DuckDB's unseeded first-element fold.

    Determinism: counts exact; each forecast is one divide of exact
    ints. NOTE the two engines NUMBER day-of-week differently — Spark's
    dayofweek is 1=Sunday..7=Saturday, DuckDB's is 0=Sunday..6=Saturday
    (ADVICE r9) — which is safe here ONLY because dow is an
    engine-internal grouping key (any bijection of the key groups
    identically) and is never emitted or compared across engines. If
    dow ever joins the output schema, normalize both sides to one
    convention first."""
    from pyspark.sql import Window

    e = load_tables(spark, sf_dir)["events"].filter(F.col("ts").isNotNull())
    days = e.select(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    from world_cup_duckdb_spark.functions import bounded_one_partition

    wb = Window.partitionBy(bounded_one_partition("d")).orderBy("d")
    ranked = days.select(
        "d",
        F.row_number().over(wb).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy(bounded_one_partition("d"))
        ).alias("n"),
    )
    cutoff = ranked.filter(
        F.col("rn") == F.ceil(0.8 * F.col("n")).cast("bigint")
    ).select(F.col("d").alias("cutoff_day"))
    types = e.select("event_type").distinct()
    grid = days.crossJoin(F.broadcast(types))
    actual = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    full_grid = (
        grid.join(actual, ["d", "event_type"], "left")
        .select(
            "d",
            "event_type",
            F.coalesce(F.col("c"), F.lit(0).cast("bigint")).alias("c"),
            F.dayofweek("d").cast("int").alias("dow"),
        )
        .crossJoin(F.broadcast(cutoff))
    )
    train = (
        full_grid.filter(F.col("d") <= F.col("cutoff_day"))
        .groupBy("event_type", "dow")
        .agg(
            F.sum("c").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    test = (
        full_grid.filter(F.col("d") > F.col("cutoff_day"))
        .join(train, ["event_type", "dow"])
        .select(
            "event_type",
            "d",
            (
                F.abs(
                    F.col("s").cast("double") / F.col("n").cast("double")
                    - F.col("c").cast("double")
                )
            ).alias("ae"),
        )
    )
    folded = test.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test_days"),
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("d", "ae"))),
                lambda x: x["ae"],
            ),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        ).alias("ae_sum"),
    )
    return folded.select(
        "event_type",
        "n_test_days",
        (F.col("ae_sum") / F.col("n_test_days").cast("double")).alias("mae"),
    )
