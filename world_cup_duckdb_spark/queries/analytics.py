"""Analytical operator set (SURVEY.md §2.7, OP43-OP49).

The reference's schema exists to be queried (README.md:1-3); these are the
aggregation/window/top-k/rollup capabilities needed to recompute every
derived table in it from facts. Scale notes per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from world_cup_duckdb_spark.functions.strings import cents, dec
from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import load_tables



@register(
    "op43_hash_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS sum_base_price,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0
             AS sum_disc_price,
           CAST(SUM(CASE WHEN l_quantity > 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk,
           (CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0) / COUNT(*)
             AS avg_qty,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def op43_hash_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate hash aggregation incl. conditional sum (OP43).

    The TPC-H-Q1-shaped recompute target: n_wins/n_draws/goals_for-style
    conditional aggregation per docs/schema.sql:22. Spark plans
    partial (map-side) + final hash aggregation — the shuffle carries one
    row per (group × partition), not fact rows. Money sums run on exact
    scaled-integer longs (functions.strings.cents: primitive codegen'd
    buffers, 2-4× faster than decimal) over fact volume, then widen to
    decimal(38,0) when merging the per-partition partials — so group-level
    totals can exceed BIGINT (10^12-row groups at the 100 TB design point)
    without ANSI overflow while the hot path stays primitive. One double
    division after the final aggregate; avg is that exact sum / count —
    all partition-order independent.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    rev_e4 = cents("l_extendedprice") * (F.lit(100).cast("long") - cents("l_discount"))
    # Two-level exact sum (overflow-safe at unbounded group size): the
    # per-(group, partition) stage sums primitive longs — a partition is
    # bounded by maxPartitionBytes (~10^7 rows), so a ≤10^9-per-row term
    # stays ~10^2 under BIGINT range — then the merge of the tiny partial
    # rows widens to decimal(38,0). The fact-volume pass keeps codegen'd
    # long buffers; decimal cost is paid only on groups × partitions rows.
    # Same shuffle volume as plain partial aggregation.
    part = li.groupBy(
        "l_returnflag", "l_linestatus", F.spark_partition_id().alias("_pid")
    ).agg(
        F.sum(cents("l_quantity")).alias("_qty_c"),
        F.sum(cents("l_extendedprice")).alias("_base_c"),
        F.sum(rev_e4).alias("_disc_e4"),
        F.sum(F.when(F.col("l_quantity") > 30, 1).otherwise(0)).alias("_n_bulk"),
        F.count(F.lit(1)).alias("_n"),
    )

    def wide(c: str) -> F.Column:
        return F.sum(F.col(c).cast("decimal(38,0)"))

    sum_qty = wide("_qty_c").cast("double") / 100.0
    return part.groupBy("l_returnflag", "l_linestatus").agg(
        sum_qty.alias("sum_qty"),
        (wide("_base_c").cast("double") / 100.0).alias("sum_base_price"),
        (wide("_disc_e4").cast("double") / 10000.0).alias("sum_disc_price"),
        F.sum("_n_bulk").alias("n_bulk"),
        (sum_qty / F.sum("_n")).alias("avg_qty"),
        F.sum("_n").alias("count_order"),
    )


@register(
    "op44_distinct_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def op44_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (OP44) — the n_teams/n_matches per stage shape
    (docs/schema.sql:21).

    Exact count-distinct expands to a two-phase aggregate. At the 100 TB
    design point swap in `approx_count_distinct` (HLL sketch, mergeable,
    single pass) where ±2% error is acceptable — kept exact here because
    the correctness gate hash-compares values.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "op45_rank_window",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal, pos
    FROM (
      SELECT c_custkey, c_nationkey, c_acctbal,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY c_nationkey
               ORDER BY c_acctbal DESC, c_custkey) AS INT) AS pos
      FROM customer
    )
    WHERE pos <= 3
    """,
)
def op45_rank_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: position within group (OP45).

    The group-standings `position` recompute (rank by points, goal
    difference, goals_for within tournament group — docs/schema.sql:22).
    Total order (value DESC, key ASC) makes row_number deterministic.
    One shuffle on the partition key; at scale the partition count is the
    number of groups, far above executor count → no stragglers.
    """
    c = load_tables(spark, sf_dir)["customer"]
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.row_number().over(w).cast("int").alias("pos"),
        )
        .filter(F.col("pos") <= 3)
    )


@register(
    "op46_analytic_window",
    oracle="""
    SELECT event_id, user_id,
           CAST(epoch_us(CAST(ts AS TIMESTAMP))
                - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS BIGINT) AS gap_us,
           lag(value) OVER w AS prev_value,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    """,
)
def op46_analytic_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window: lag + running sum over event time (OP46).

    The next-match/running-total query shape over match.datetime
    (docs/schema.sql:23). Order key is (ts, event_id) — a total order, so
    lag/running values are deterministic even with timestamp ties.
    """
    e = load_tables(spark, sf_dir)["events"]
    # asc_nulls_last on ts: Spark's ASC default is nulls-first, the
    # oracle's (DuckDB) is nulls-last — a null-ts row would otherwise
    # sit at opposite ends of its partition in the two engines.
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), "event_id"
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"),
        F.lag("value").over(w).alias("prev_value"),
        F.sum(dec("value")).over(run).cast("double").alias("running_value"),
    )


@register(
    "op47_topk",
    oracle="""
    SELECT l_partkey,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS total_qty
    FROM lineitem
    GROUP BY l_partkey
    ORDER BY total_qty DESC, l_partkey
    LIMIT 10
    """,
)
def op47_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by aggregate (OP47) — the "top scorers" shape the reference
    schema is built for (docs/schema.sql:8, :30).

    orderBy+limit compiles to TakeOrderedAndProject: each partition keeps
    its local top-k, the driver merges k×partitions rows — no global sort
    at any scale. Tie-break on the key makes k-th place deterministic.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_partkey")
        .agg((F.sum(cents("l_quantity")).cast("double") / 100.0).alias("total_qty"))
        .orderBy(F.desc("total_qty"), F.asc("l_partkey"))
        .limit(10)
    )


@register(
    "op48_sort",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey
    """,
)
def op48_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort (OP48) — ordered reporting via sort_order
    (docs/schema.sql:21). Spark plans a range-partitioned exchange
    (sampled split points) then per-partition sort — the scalable
    total-order strategy."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.select("o_custkey", "o_orderkey", "o_totalprice").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )


@register(
    "op49_rollup",
    oracle="""
    SELECT r_name, n_name,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def op49_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup: per-group + subtotal + grand total in one pass (OP49) —
    per-tournament plus overall totals (SURVEY.md §2.7). Spark expands
    rollup groups inside the same partial+final hash aggregation, so the
    fact table is still read once.

    Shape (r8 job-floor rework): customer pre-aggregates to nation grain
    FIRST — one exchange of ≤|nations| partial rows — and the bounded
    dims then attach as SHUFFLE_HASH joins (25-row exchanges inside the
    same job) before the rollup expands over the 25-row relation. The
    old forced dim broadcasts cost a broadcast-build job each (3 jobs
    total); this plan is 1 job, same single customer scan, and the
    decimal two-level sum stays exact (partial decimal(28,2) per nation,
    merged before the double cast)."""
    t = load_tables(spark, sf_dir)
    per_nation = (
        t["customer"]
        .groupBy("c_nationkey")
        .agg(
            F.sum(dec("c_acctbal")).alias("_bal"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    return (
        per_nation
        .join(
            t["nation"].hint("shuffle_hash"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            t["region"].hint("shuffle_hash"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .rollup("r_name", "n_name")
        .agg(
            F.sum("_bal").cast("double").alias("total_acctbal"),
            F.sum("_n").alias("n_customers"),
        )
    )
