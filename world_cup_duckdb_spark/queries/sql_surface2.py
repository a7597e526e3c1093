"""SQL-surface batch 2: ordered string aggregation, correlated scalar
subqueries, RANGE-frame windows over event time, and null-safe equality
joins.

These extend the implicit DuckDB-SQL query surface the reference offers
over its schema (SURVEY.md §2.7 rationale: the repo's purpose is to BE
queried, README.md:1-3). Each runs through `spark.sql` against the
registered temp views — the engine's §3.1 lifecycle — with the DuckDB
oracle carrying the dialect's equivalent spelling where the two differ
(listagg vs string_agg, <=> vs IS NOT DISTINCT FROM).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import register_views

_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


@register(
    "sql_listagg",
    oracle=f"""
    WITH rev AS (
      SELECT s_nationkey, s_name, SUM({_REV}) AS rev
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY s_nationkey ORDER BY rev DESC, s_name
      ) AS rn
      FROM rev
    )
    SELECT n_name,
           CAST(COUNT(*) AS INTEGER) AS n_top,
           string_agg(s_name, ',' ORDER BY rev DESC, s_name) AS top_suppliers
    FROM rk JOIN nation ON n_nationkey = s_nationkey
    WHERE rn <= 3
    GROUP BY n_name
    """,
)
def sql_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: each nation's top-3 revenue suppliers
    as one comma-joined, revenue-ordered string — LISTAGG ... WITHIN
    GROUP (the ISO SQL:2016 spelling, new in Spark 4) vs DuckDB's
    string_agg ORDER BY. The inside-aggregate ORDER BY is the point:
    without it concatenation order is partition-dependent garbage.

    Scale: revenue reduces the fact before any window; the top-3 filter
    bounds each group to 3 rows, so the string build is dimension-sized.
    Determinism: exact decimal ranking with a name tie-break gives both
    engines the identical element order."""
    register_views(spark, sf_dir)
    return spark.sql(f"""
        WITH rev AS (
          SELECT s_nationkey, s_name, SUM({_REV}) AS rev
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          GROUP BY 1, 2
        ),
        rk AS (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY s_nationkey ORDER BY rev DESC, s_name
          ) AS rn
          FROM rev
        )
        SELECT n_name,
               CAST(COUNT(*) AS INTEGER) AS n_top,
               listagg(s_name, ',')
                 WITHIN GROUP (ORDER BY rev DESC, s_name) AS top_suppliers
        FROM rk JOIN nation ON n_nationkey = s_nationkey
        WHERE rn <= 3
        GROUP BY n_name
    """)


@register(
    "sql_scalar_correlated",
    oracle="""
    SELECT n_name, s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier s JOIN nation ON n_nationkey = s_nationkey
    WHERE s_acctbal = (
      SELECT MAX(s2.s_acctbal) FROM supplier s2
      WHERE s2.s_nationkey = s.s_nationkey
    )
    """,
)
def sql_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: suppliers whose account balance is
    their nation's maximum — the subquery references the outer row, and
    both optimizers decorrelate it into an aggregate + join rather than
    re-executing per row (Catalyst: RewriteCorrelatedScalarSubquery).

    Scale: post-decorrelation this is one grouped MAX over supplier and
    a re-join on nationkey — no nested-loop anywhere. MAX on doubles is
    exact, so the equality predicate is engine-stable."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT n_name, s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
        FROM supplier s JOIN nation ON n_nationkey = s_nationkey
        WHERE s_acctbal = (
          SELECT MAX(s2.s_acctbal) FROM supplier s2
          WHERE s2.s_nationkey = s.s_nationkey
        )
    """)


@register(
    "sql_window_range_interval",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(FLOOR(epoch(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT) AS ep,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders
    )
    SELECT o_orderkey, o_custkey,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_orders_30d,
           CAST(SUM(price) OVER w AS DOUBLE) AS spend_30d
    FROM o
    WINDOW w AS (PARTITION BY o_custkey ORDER BY ep
                 RANGE BETWEEN 2591999 PRECEDING AND CURRENT ROW)
    """,
)
def sql_window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window over event time: each order sees its customer's
    trailing-30-day order count and spend. RANGE frames bound by VALUE
    distance (epoch seconds here), not row offsets — same-timestamp peers
    enter the frame together, and gaps in activity genuinely shrink the
    window, which ROWS frames get wrong on irregular series.

    Scale: one shuffle on o_custkey, per-partition sort by time — the
    frame is evaluated with a sliding two-pointer pass, not a rescan.
    Determinism: integer epoch bounds and an exact decimal sum; RANGE
    peer handling makes the result independent of intra-timestamp row
    order, so no tie-break is even needed."""
    register_views(spark, sf_dir)
    return spark.sql("""
        WITH o AS (
          SELECT o_orderkey, o_custkey,
                 unix_seconds(CAST(o_orderdate AS TIMESTAMP)) AS ep,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS price
          FROM orders
        )
        SELECT o_orderkey, o_custkey,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_orders_30d,
               CAST(SUM(price) OVER w AS DOUBLE) AS spend_30d
        FROM o
        WINDOW w AS (PARTITION BY o_custkey ORDER BY ep
                     RANGE BETWEEN 2591999 PRECEDING AND CURRENT ROW)
    """)


@register(
    "ext_null_safe_join",
    oracle="""
    WITH a AS (
      SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS prio,
             COUNT(*) AS n_open
      FROM orders WHERE o_orderstatus = 'O' GROUP BY 1
    ),
    b AS (
      SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS prio,
             COUNT(*) AS n_done
      FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
    )
    SELECT a.prio, CAST(a.n_open AS BIGINT) AS n_open,
           CAST(b.n_done AS BIGINT) AS n_done
    FROM a JOIN b ON a.prio IS NOT DISTINCT FROM b.prio
    """,
)
def ext_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join: open vs finished order counts per
    priority where '3-MEDIUM' has been NULLIF'd away (the standard
    sentinel-to-NULL cleanup). A plain equi-join silently drops the NULL
    bucket — both rows exist, but NULL = NULL is not true; the null-safe
    operator (Spark `<=>`, DuckDB IS NOT DISTINCT FROM) keeps it.

    Scale: null-safe equality remains a hash-joinable key (NULL hashes
    like any value under <=>), so the plan is an ordinary shuffled hash
    join, not a cross-join fallback — worth knowing before reaching for
    COALESCE-sentinel workarounds that reintroduce collision risk."""
    from pyspark.sql import functions as F

    from world_cup_duckdb_spark.sources.catalog import load_tables

    o = load_tables(spark, sf_dir)["orders"]
    prio = F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("prio")
    a = (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy(prio)
        .agg(F.count(F.lit(1)).alias("n_open"))
    )
    b = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy(prio)
        .agg(F.count(F.lit(1)).alias("n_done"))
    )
    return a.join(b, a.prio.eqNullSafe(b.prio)).select(
        a.prio.alias("prio"),
        F.col("n_open").cast("bigint").alias("n_open"),
        F.col("n_done").cast("bigint").alias("n_done"),
    )
