"""Hierarchical / multi-granularity aggregation extensions: cascading
time rollups (the "hypertable continuous aggregate" pattern), GROUPING
SETS, Markov transition matrices, RFM segmentation, and fixed-width
histograms.

Reference scope: the World-Cup schema exists to be aggregated at multiple
grains (per-match, per-tournament, all-time — e.g. the rollup sites in
`scripts/build_db.py:945-947` full-table scans); these queries express that
multi-grain capability in the shapes a 100 TB product/training pipeline
uses daily. All are DuckDB-SQL-expressible, so each carries a full
value-hash oracle.

The unifying scale theme: **reaggregate partials, never rescan facts**.
The hypertable rollup computes the day grain FROM the hour grain (mergeable
partial aggregates — the same property that makes Spark's map-side combine
correct); grouping sets expand inside one hash-aggregate pass; the
transition matrix reuses the sessionization exchange shape (one shuffle by
user, then window + count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from world_cup_duckdb_spark.functions.strings import dec
from world_cup_duckdb_spark.operators.relational import distributed_ntile
from world_cup_duckdb_spark.queries import register, tracked_persist
from world_cup_duckdb_spark.sources.catalog import table


@register(
    "ext_rollup_hypertable",
    oracle="""
    SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
             AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def ext_rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascading time rollup (hypertable continuous-aggregate pattern):
    aggregate events to the HOUR grain, then compute the DAY grain by
    reaggregating the hourly partials — never rescanning the fact table.
    The oracle aggregates straight to day, proving the cascade is exact
    (count and decimal-sum are mergeable; that is the same algebraic
    property Spark's map-side partial aggregation relies on).

    Complements sql_hypertable_rollup, which materializes hour/day/week
    grains in ONE pass via GROUPING SETS (3× the fact scan cost but a
    single job); this query is the incremental-maintenance shape — coarse
    grains derived from the fine grain without touching the facts again.
    The continuously-maintained version is
    streaming/rollup.py:maintain_day_rollup (foreachBatch merge of these
    same partials, versioned publish, replay-idempotent), proven
    equivalent to this batch shape in tests/test_streaming.py.

    Scale: this is THE pattern for time-series at 100 TB — the hour grain
    is materialized once per ingest window (here, computed in-plan), and
    every coarser grain (day/week/month) derives from it at hourly-rollup
    cost, orders of magnitude smaller than the raw facts. Both aggregates
    partial-combine map-side; the second exchange carries at most
    |hours × types| rows.
    """
    e = table(spark, sf_dir, "events")
    hourly = (
        e.select(F.date_trunc("hour", "ts").alias("hour"), "event_type",
                 dec("value").alias("v"))
        .groupBy("hour", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    )
    return (
        hourly.groupBy(
            F.date_trunc("day", "hour").alias("day"), "event_type"
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("sv").cast("double").alias("sum_value"),
        )
    )


@register(
    "ext_grouping_sets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), ())
    """,
)
def ext_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with GROUPING() disambiguation flags — the general
    form of op49's ROLLUP: an explicit lattice of (priority, status),
    (priority), and grand-total grains in one pass, with grouping flags
    distinguishing "subtotal row" from "the data really was NULL".
    The DataFrame-native twin of sql_grouping_sets (shared-SQL-text
    surface): this one exercises `DataFrame.groupingSets` + `F.grouping`.

    Scale: like rollup, Spark expands the sets inside a single
    partial+final hash aggregate (Expand → Aggregate) — the fact table is
    scanned once and the exchange carries one partial row per (set ×
    group), not one per input row.
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.grouping("o_orderpriority").cast("int").alias("g_pri"),
            F.grouping("o_orderstatus").cast("int").alias("g_st"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("sum_price"),
        )
    )


@register(
    "ext_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT event_type AS src,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS dst
      FROM events
    )
    SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / CAST(SUM(COUNT(*)) OVER (PARTITION BY src) AS DOUBLE),
                 6) AS p
    FROM seq WHERE dst IS NOT NULL
    GROUP BY src, dst
    """,
)
def ext_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix over the event stream: for each user's
    time-ordered events, count (event_type → next event_type) pairs and
    normalize to transition probabilities — the sequence-mining primitive
    behind funnel discovery and next-action models.

    Scale: one shuffle on user_id for the LEAD window (same exchange shape
    as sessionization), then a tiny |types|² aggregate; the probability
    window runs over that tiny result. Integer counts divide exactly the
    same on both engines (single IEEE division, then round).
    """
    e = table(spark, sf_dir, "events")
    # asc_nulls_last: a null-ts event must pair AFTER the user's last
    # real event (the oracle's placement), not before the first
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), "event_id"
    )
    seq = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    counts = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(tot).cast("double"), 6
        ).alias("p"),
    )


@register(
    "ext_rfm",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey AS custkey,
             MAX(CAST(o_orderdate AS TIMESTAMP)) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY o_custkey
    )
    SELECT custkey, last_order, frequency, monetary,
           CAST(NTILE(5) OVER (ORDER BY last_order DESC, custkey) AS INT)
             AS r_score,
           CAST(NTILE(5) OVER (ORDER BY frequency DESC, custkey) AS INT)
             AS f_score,
           CAST(NTILE(5) OVER (ORDER BY monetary DESC, custkey) AS INT)
             AS m_score
    FROM rfm
    """,
)
def ext_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency (last order), frequency
    (order count), monetary (lifetime spend), each bucketed into quintile
    scores 1–5 — the classic customer-value segmentation, deterministic
    via custkey tie-breaks.

    Scale: the per-customer aggregate shuffles once on custkey and
    partial-combines map-side. Each quintile score comes from
    distributed_ntile (operators/relational.py) — range-shuffle +
    broadcast partition offsets over a NARROW (custkey, metric)
    projection, then one join back on custkey — instead of `NTILE OVER
    (ORDER BY metric)`: the window form is a single-partition sort of
    the whole customer table per metric, which at billions of customers
    is three serial corpus sorts (VERDICT r6). The (metric, custkey)
    tie-break is a total order, so the distributed tile equals the ANSI
    window bit-for-bit — no percentile_approx tolerance needed.
    """
    o = table(spark, sf_dir, "orders")
    # Persist the customer aggregate: four consumers read it (the base
    # projection + three ntile range shuffles, each of which eagerly
    # checkpoints its ranged input) — without the cut the fact-sized
    # groupBy would recompute once per score.
    rfm = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(dec("o_totalprice")).cast("double").alias("monetary"),
    ).transform(tracked_persist)
    scored = rfm
    for metric, score in (
        ("last_order", "r_score"),
        ("frequency", "f_score"),
        ("monetary", "m_score"),
    ):
        tiles = distributed_ntile(
            rfm.select("custkey", metric),
            5,
            [F.desc(metric), F.asc("custkey")],
            out_col=score,
        ).select("custkey", score)
        scored = scored.join(tiles, "custkey")
    return scored.select(
        "custkey", "last_order", "frequency", "monetary",
        "r_score", "f_score", "m_score",
    )


@register(
    "ext_histogram",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,
           CAST(FLOOR(o_totalprice / 25000.0) * 25000.0 AS DOUBLE)
             AS bucket_lo,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY 1, 2
    """,
)
def ext_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals ($25k buckets) — the
    distribution-profiling primitive behind data-quality dashboards and
    skew detection (the engine's own salting decisions start from exactly
    this shape run over join keys).

    Scale: bucket id is a per-row arithmetic expression inside the scan
    stage; the aggregate exchange carries one partial row per bucket.
    A single IEEE division + floor is bit-identical on both engines.
    """
    o = table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / F.lit(25000.0))
    return (
        o.select(
            bucket.cast("bigint").alias("bucket"),
            (bucket * F.lit(25000.0)).cast("double").alias("bucket_lo"),
        )
        .groupBy("bucket", "bucket_lo")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "ext_market_basket",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (
      SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n FROM baskets
    ),
    part_n AS (
      SELECT l_partkey, COUNT(*) AS n_part FROM baskets GROUP BY l_partkey
    ),
    pair_n AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS n_pair
      FROM baskets a
      JOIN baskets b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b,
           CAST(n_pair AS BIGINT) AS n_pair,
           ROUND(n_pair / n_orders.n, 8) AS support,
           ROUND(n_pair / CAST(pa.n_part AS DOUBLE), 8) AS confidence_a_b,
           ROUND((n_pair * n_orders.n)
                 / (CAST(pa.n_part AS DOUBLE) * pb.n_part), 8) AS lift
    FROM pair_n
    JOIN part_n pa ON pa.l_partkey = part_a
    JOIN part_n pb ON pb.l_partkey = part_b
    CROSS JOIN n_orders
    WHERE n_pair >= 2
    ORDER BY lift DESC, part_a, part_b
    LIMIT 50
    """,
)
def ext_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence mining: part pairs ordered together,
    scored by support / confidence / lift (the association-rule metric
    trio), top-50 by lift at min-support 2 — the recommendation /
    affinity query a normalized order schema exists to answer.

    Scale: baskets dedup to (order, part) and the pair build self-joins
    WITHIN order keys — one shuffle on l_orderkey, pair explosion
    bounded by per-basket size squared (≈4 lines/order here; skewed mega
    baskets would get a per-order item cap first). Per-part counts are
    vocabulary-sized and broadcast back; lift arithmetic is exact
    integer counts in double division, ROUND(…,8)-pinned on both
    engines; TakeOrderedAndProject keeps top-k local."""
    li = table(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = baskets.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n")
    )
    part_n = baskets.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    a = baskets.alias("a")
    b = baskets.alias("b")
    pair_n = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= 2)
    )
    pa = part_n.select(
        F.col("l_partkey").alias("part_a"), F.col("n_part").alias("na")
    )
    pb = part_n.select(
        F.col("l_partkey").alias("part_b"), F.col("n_part").alias("nb")
    )
    return (
        pair_n.join(F.broadcast(pa), "part_a")
        .join(F.broadcast(pb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            F.col("n_pair").cast("bigint").alias("n_pair"),
            F.round(F.col("n_pair") / F.col("n"), 8).alias("support"),
            F.round(F.col("n_pair") / F.col("na").cast("double"), 8).alias(
                "confidence_a_b"
            ),
            F.round(
                (F.col("n_pair") * F.col("n"))
                / (F.col("na").cast("double") * F.col("nb")),
                8,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(50)
    )


@register(
    "ext_calendar_dims",
    oracle="""
    WITH b AS (
      SELECT MIN(CAST(o_orderdate AS DATE)) AS mn,
             MAX(CAST(o_orderdate AS DATE)) AS mx
      FROM orders
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
      FROM b
    )
    SELECT d,
           CAST(year(d) AS INT) AS year,
           CAST(quarter(d) AS INT) AS quarter,
           CAST(month(d) AS INT) AS month,
           CAST(day(d) AS INT) AS day_of_month,
           CAST(week(d) AS INT) AS iso_week,
           CAST(isodow(d) AS INT) AS iso_dow,
           isodow(d) >= 6 AS is_weekend
    FROM spine
    """,
)
def ext_calendar_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar dimension build: a dense date spine spanning the fact
    range with the standard derived attributes (year/quarter/month/
    ISO week/ISO day-of-week/weekend flag) — the dimension every
    warehouse joins dates against, generated rather than stored.

    Cross-engine care: day-of-week numbering is a classic trap (Spark's
    `dayofweek` is Sunday=1, DuckDB's is Sunday=0); both sides use the
    ISO convention (Monday=1) explicitly — EXTRACT(DAYOFWEEK_ISO) here,
    `isodow` in the oracle — and ISO week numbers, which the engines
    agree on. Scale: a two-value bounds aggregate plus a generated
    explode; size is |days|, independent of fact volume."""
    o = table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("mn"),
        F.max(F.col("o_orderdate").cast("date")).alias("mx"),
    )
    return bounds.select(
        F.explode(F.expr("sequence(mn, mx, INTERVAL 1 DAY)")).alias("d")
    ).select(
        "d",
        F.year("d").cast("int").alias("year"),
        F.quarter("d").cast("int").alias("quarter"),
        F.month("d").cast("int").alias("month"),
        F.dayofmonth("d").cast("int").alias("day_of_month"),
        F.weekofyear("d").cast("int").alias("iso_week"),
        F.expr("EXTRACT(DAYOFWEEK_ISO FROM d)").cast("int").alias("iso_dow"),
        (F.expr("EXTRACT(DAYOFWEEK_ISO FROM d)") >= 6).alias("is_weekend"),
    )
