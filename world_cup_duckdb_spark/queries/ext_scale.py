"""Skew-management extension queries: salted rewrites whose results are
provably identical to the plain forms (the DuckDB oracle runs the
unsalted SQL — matching hashes prove the rewrite is semantics-preserving
while spreading hot keys over n reducers at scale)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from world_cup_duckdb_spark.functions.strings import cents, dec
from world_cup_duckdb_spark.operators.scale import salted_agg, salted_join
from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import table


@register(
    "ext_salted_agg",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem GROUP BY l_orderkey
    """,
)
def ext_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation ≡ plain groupBy (hot keys spread over
    4 reducers in the first exchange; the second carries ≤4 rows/key)."""
    li = table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        "l_orderkey",
        aggs={
            "sum_qty": F.sum(dec("l_quantity")),
            "n_lines": F.count(F.lit(1)),
        },
        merges={
            "sum_qty": F.sum("sum_qty"),
            "n_lines": F.sum("n_lines").cast("long"),
        },
        n_salts=4,
        salt_cols=["l_orderkey", "l_linenumber"],
    )
    return out.select(
        "l_orderkey", F.col("sum_qty").cast("double").alias("sum_qty"), "n_lines"
    )


@register(
    "ext_salted_join",
    oracle="""
    SELECT l_orderkey, l_linenumber, o_orderstatus
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def ext_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salt-replicated join ≡ plain join (small side replicated ×4, big
    side scattered by row-identity hash)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    orders = (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus")
        .withColumnRenamed("o_orderkey", "l_orderkey")
    )
    return salted_join(
        li, orders, "l_orderkey", n_salts=4,
        big_id_cols=["l_orderkey", "l_linenumber"],
    ).select("l_orderkey", "l_linenumber", "o_orderstatus")


@register(
    "ext_skew_profile",
    oracle="""
    WITH k AS (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_orderkey
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n_keys FROM k)
    SELECT k.l_orderkey, k.n,
           ROUND(CAST(k.n AS DOUBLE) / CAST(t.total AS DOUBLE), 8)
             AS share,
           ROUND(CAST(k.n AS DOUBLE) * CAST(t.n_keys AS DOUBLE)
                 / CAST(t.total AS DOUBLE), 4) AS x_mean
    FROM k, tot t
    ORDER BY k.n DESC, k.l_orderkey LIMIT 10
    """,
)
def ext_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler: the 10 heaviest l_orderkey values with
    their share of all rows and their multiple of the mean key weight —
    the diagnostic run BEFORE choosing a salting factor or trusting AQE's
    skew-join split (operators/scale.py:salted_join consumes exactly this
    signal). x_mean ≈ 1 everywhere means don't salt.

    Scale: one partial-combined count by key, a broadcast-able 1-row
    total, and a TakeOrdered top-10 — the profile costs one aggregate
    exchange however large the fact table is.
    """
    li = table(spark, sf_dir, "lineitem")
    k = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    tot = k.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        k.crossJoin(F.broadcast(tot))
        .select(
            "l_orderkey",
            "n",
            F.round(F.col("n").cast("double") / F.col("total").cast("double"), 8)
            .alias("share"),
            F.round(
                F.col("n").cast("double")
                * F.col("n_keys").cast("double")
                / F.col("total").cast("double"),
                4,
            ).alias("x_mean"),
        )
        .orderBy(F.desc("n"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "ext_seasonality",
    oracle="""
    SELECT CAST(CAST(FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / 86400000000.0)
                     AS BIGINT) % 7 AS INT) AS day_nr,
           CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hour_of_day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def ext_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality matrix: event volume by (day-of-week × hour-of-day) —
    the load-shape profile behind capacity planning and anomaly baselines.
    Day number is computed as epoch-days mod 7 (not the engines' DOW
    functions, whose 0/1-origin and week-start conventions differ).

    Scale: pure per-row time arithmetic in the scan stage; the aggregate
    exchange carries at most 7×24 partial rows per map task.
    """
    e = table(spark, sf_dir, "events")
    return (
        e.select(
            # floor() over MICROSECONDS, not a truncate-cast of seconds:
            # the oracle floors epoch_us/86400e6, and for pre-1970
            # timestamps truncation lands on day 0 where floor lands on
            # day -1 (catalog.py guards the same divergence for ns→µs);
            # microseconds also avoid unix_timestamp's sub-second trunc
            (F.floor(F.unix_micros("ts") / F.lit(86_400_000_000.0)) % 7)
            .cast("int")
            .alias("day_nr"),
            F.hour("ts").cast("int").alias("hour_of_day"),
            dec("value").alias("v"),
        )
        .groupBy("day_nr", "hour_of_day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").cast("double").alias("total_value"),
        )
    )


@register(
    "ext_bucketed_join",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS qty_c
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def ext_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join ≡ plain join: both facts are persisted
    bucketed+sorted by the join key, so the subsequent join runs
    bucket-to-bucket with NO exchange on either side — the shuffle is
    paid once at write time and amortized over every later join
    (operators/scale.py:write_bucketed; tests/test_plans.py asserts the
    lazy plan via bucketed_join_plan, tests/test_scale.py the operator).
    At 100 TB this is how recurring fact-fact joins (orders⋈lineitem
    every run) stop re-shuffling the corpus.

    Hermetic AND leak-free: unique per-invocation table names + scratch
    location, eagerly executed, then the catalog entries and scratch
    files are dropped before returning.
    """
    import uuid

    tag = uuid.uuid4().hex[:12]
    lazy, loc = bucketed_join_plan(spark, sf_dir, tag)
    # Eagerly run the bucketed join (the zero-exchange plan shape is
    # separately pinned in tests/test_plans.py), so the catalog tables
    # and scratch files can be dropped before returning — without this,
    # every invocation leaks two catalog entries plus full bucketed
    # copies of lineitem and orders. The result goes to a RELIABLE
    # parquet sink, not localCheckpoint (same class as the r12
    # multibatch-durability fix): the checkpoint's lineage reads the
    # bucketed tables this function deletes two lines later, so an
    # executor loss after the cleanup would recompute against missing
    # files; the read-back depends only on the written result.
    from world_cup_duckdb_spark.queries.lifecycle import _fresh_dir

    res = os.path.join(_fresh_dir("bucketed-join-result"), "out")
    lazy.write.mode("overwrite").parquet(res)
    spark.sql(f"DROP TABLE IF EXISTS bkt_lineitem_{tag}")
    spark.sql(f"DROP TABLE IF EXISTS bkt_orders_{tag}")
    shutil.rmtree(loc, ignore_errors=True)
    return spark.read.parquet(res).select("o_orderstatus", "n_lines", "qty_c")


def bucketed_join_plan(
    spark: SparkSession, sf_dir: str, tag: str
) -> tuple[DataFrame, str]:
    """The lazy bucketed-join plan behind ext_bucketed_join, plus its
    scratch location. Split out so the plan test can assert the
    exchange-free join shape BEFORE the query checkpoints it away (the
    checkpoint is what lets the query drop its catalog tables)."""
    from world_cup_duckdb_spark.operators.scale import write_bucketed
    from world_cup_duckdb_spark.queries.lifecycle import _fresh_dir

    loc = _fresh_dir(f"bucketed-{tag}")
    li = write_bucketed(
        table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity"),
        spark,
        f"bkt_lineitem_{tag}",
        "l_orderkey",
        4,
        f"{loc}/lineitem",
    )
    o = write_bucketed(
        table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus"),
        spark,
        f"bkt_orders_{tag}",
        "o_orderkey",
        4,
        f"{loc}/orders",
    )
    lazy = (
        # merge hint: at fixture scale the planner would broadcast orders,
        # which bypasses the very mechanism under test; at fact scale SMJ
        # is what the planner picks anyway, and bucket co-location means
        # it runs with zero exchanges and zero sorts.
        li.hint("merge")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(cents("l_quantity")).alias("qty_c"),
        )
    )
    return lazy, loc


@register(
    "ext_partitioned_layout",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type
    """,
)
def ext_partitioned_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned at-rest layout + partition-pruned scan: events are
    written partitioned by event_type (operators/scale.py:
    write_partitioned — the 100 TB fact layout), and the filtered re-read
    prunes to the two matching directories with ZERO I/O on every other
    partition (PartitionFilters in the scan; static + dynamic pruning
    plan-asserted in tests/test_scale.py). The aggregate proves the
    round-trip is lossless vs the unpartitioned oracle.

    Hermetic: unique per-invocation scratch path; the returned plan
    lazily reads files nothing will mutate.
    """
    from world_cup_duckdb_spark.operators.scale import write_partitioned
    from world_cup_duckdb_spark.queries.lifecycle import _fresh_dir

    loc = _fresh_dir("partitioned-events")
    write_partitioned(
        table(spark, sf_dir, "events").select("event_type", "value"),
        loc,
        "event_type",
    )
    return (
        spark.read.parquet(loc)
        .filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
    )


@register(
    "ext_compaction",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS qty_c
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def ext_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction round-trip: lineitem is staged as 64 small
    files (the one-file-per-task-per-trigger debris streaming appends
    leave behind), bin-packed back to ~target-sized files by
    operators/scale.py:compact_parquet, and re-aggregated — hash-equality
    with the oracle over the ORIGINAL table proves the maintenance job is
    lossless. At 100 TB this job runs per ingest partition; without it,
    scan planning and file-open overhead come to dominate query time.

    Hermetic: unique per-invocation scratch path; after the atomic swap
    the compacted files are never mutated.
    """
    from world_cup_duckdb_spark.operators.scale import compact_parquet
    from world_cup_duckdb_spark.queries.lifecycle import _fresh_dir

    loc = _fresh_dir("compaction") + "/lineitem"
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity"
    )
    li.repartition(64).write.mode("overwrite").parquet(loc)
    before, after = compact_parquet(spark, loc, target_bytes=32 * 1024 * 1024)
    assert after < before, (before, after)
    return (
        spark.read.parquet(loc)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(cents("l_quantity")).alias("qty_c"),
        )
    )
