"""SQL-dialect parity, batch 5 (EXTENSION): the remaining DuckDB-dialect
tail — ``COLUMNS(...)`` star-expressions, ``SUMMARIZE`` (as a portable
exact profile), ``POSITIONAL JOIN``, the ``EXCLUDE CURRENT ROW`` frame
modifier, ``CREATE MACRO`` (as a Spark 4 SQL UDF), top-level
``SEMI/ANTI JOIN``, and the portable regex-function subset. Where Spark
has no native spelling, the key pairs an ENGINE-side emulation
(programmatic select building / a one-pass profile aggregate /
zip-by-distributed-row-number / algebraic frame exclusion) with the
DuckDB-native form as its oracle — the shim a migrating user would
otherwise write by hand; where both have native forms the dialect
delta stays confined to the two SQL strings.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import load_tables


def columns_regex(df: DataFrame, pattern: str) -> list[str]:
    """DuckDB ``COLUMNS('regex')`` resolution: the column names of ``df``
    the regex matches (DuckDB uses RE2 *search* semantics — anchor with
    ^$ for exact-name matching), in schema order. The emulation surface
    for star-expressions: callers splat the returned list into a
    programmatic select/agg."""
    return [c for c in df.columns if re.search(pattern, c)]


@register(
    "sql_columns_expr",
    oracle="""
    WITH m AS (
      SELECT l_returnflag, MAX(COLUMNS('^l_(extendedprice|discount|tax)$'))
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           l_extendedprice AS max_l_extendedprice,
           l_discount AS max_l_discount,
           l_tax AS max_l_tax
    FROM m
    """,
)
def sql_columns_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``COLUMNS(regex)`` star-expression: apply one aggregate across
    every column a regex matches (here MAX over the three lineitem money
    columns, per return flag). The oracle runs DuckDB's native COLUMNS;
    Spark has no equivalent, so the engine emulates it by resolving the
    regex against the schema (columns_regex above) and splatting the
    aggregate — exactly the shim a migrating user needs, now a tested
    engine helper.

    Scale: one hash aggregate, partial map-side, grouped on a 3-value
    key; MAX is order-insensitive so doubles are exact cross-engine."""
    li = load_tables(spark, sf_dir)["lineitem"]
    cols = columns_regex(li, r"^l_(extendedprice|discount|tax)$")
    return li.groupBy("l_returnflag").agg(
        *[F.max(c).alias(f"max_{c}") for c in cols]
    )


@register(
    "sql_summarize",
    oracle="""
    SELECT 'p_partkey' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(p_partkey) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT p_partkey) AS BIGINT) AS n_distinct,
           CAST(MIN(p_partkey) AS VARCHAR) AS min_value,
           CAST(MAX(p_partkey) AS VARCHAR) AS max_value
    FROM part
    UNION ALL
    SELECT 'p_brand', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(p_brand) AS BIGINT),
           CAST(COUNT(DISTINCT p_brand) AS BIGINT),
           CAST(MIN(p_brand) AS VARCHAR), CAST(MAX(p_brand) AS VARCHAR)
    FROM part
    UNION ALL
    SELECT 'p_type', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(p_type) AS BIGINT),
           CAST(COUNT(DISTINCT p_type) AS BIGINT),
           CAST(MIN(p_type) AS VARCHAR), CAST(MAX(p_type) AS VARCHAR)
    FROM part
    UNION ALL
    SELECT 'p_size', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(p_size) AS BIGINT),
           CAST(COUNT(DISTINCT p_size) AS BIGINT),
           CAST(MIN(p_size) AS VARCHAR), CAST(MAX(p_size) AS VARCHAR)
    FROM part
    UNION ALL
    SELECT 'p_retailprice', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(p_retailprice) AS BIGINT),
           CAST(COUNT(DISTINCT p_retailprice) AS BIGINT),
           CAST(MIN(p_retailprice) AS VARCHAR),
           CAST(MAX(p_retailprice) AS VARCHAR)
    FROM part
    """,
)
def sql_summarize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SUMMARIZE`` as a PORTABLE exact column profile: per column —
    row count, null count, exact distinct count, min/max (string-cast).
    DuckDB's native SUMMARIZE also emits approx_unique/std/quantiles,
    which are engine-defined approximations no cross-engine hash can
    pin; this key certifies the exact subset both engines must agree
    on, and the engine helper is the profiling entry point.

    Scale: ONE scan — all per-column aggregates (including the multiple
    exact count-distincts, planned via Expand) run in a single pass;
    the one-row result then unpivots to a row per column with stack().
    At 100 TB swap exact count-distinct for approx_count_distinct and
    profile a sampled fraction; the plan shape (single pass, constant
    output) is unchanged."""
    part = load_tables(spark, sf_dir)["part"]
    cols = ["p_partkey", "p_brand", "p_type", "p_size", "p_retailprice"]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"_nn_{c}"),
            F.countDistinct(c).cast("long").alias(f"_nd_{c}"),
            F.min(c).cast("string").alias(f"_mn_{c}"),
            F.max(c).cast("string").alias(f"_mx_{c}"),
        ]
    one = part.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _n, _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)"
    )


@register(
    "sql_window_exclude",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             EXCLUDE CURRENT ROW) AS DOUBLE) AS others_total
    FROM orders
    """,
)
def sql_window_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``EXCLUDE CURRENT ROW`` window-frame modifier (each order
    carries the total of the customer's OTHER orders; NULL when it is
    the only one — an excluded frame over one row is empty). Spark has
    no EXCLUDE clause; the engine emulates it algebraically — whole-
    partition sum minus the current row's value, NULL-gated on the
    partition count — which is exact because the sums are decimal.

    Scale: one customer-partitioned window pass (per-key state,
    executor-local), two unbounded aggregates sharing the single sort —
    same shuffle volume as the native clause would cost."""
    from pyspark.sql import Window

    o = load_tables(spark, sf_dir)["orders"]
    dec_price = F.col("o_totalprice").cast("decimal(18,2)")
    w = Window.partitionBy("o_custkey").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.when(
            F.count(F.lit(1)).over(w) > 1,
            (F.sum(dec_price).over(w) - dec_price).cast("double"),
        ).alias("others_total"),
    )


@register(
    "sql_positional_join",
    oracle="""
    SELECT a.c_custkey, a.c_name, b.active_custkey
    FROM (SELECT c_custkey, c_name FROM customer ORDER BY c_custkey) a
    POSITIONAL JOIN
         (SELECT o_custkey AS active_custkey
          FROM (SELECT DISTINCT o_custkey FROM orders)
          ORDER BY o_custkey) b
    """,
)
def sql_positional_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``POSITIONAL JOIN``: zip two relations row-by-row, NULL-padding
    the shorter side — here every customer (ordered by key) zipped with
    the ordered distinct custkeys that placed orders (fewer rows, so the
    tail pads with NULL). DuckDB zips physical row order; a distributed
    table has none, so the engine form (operators/relational.py:
    positional_join) requires explicit total orders per side and the
    oracle pins them with ORDER BY subqueries.

    Scale: each side's position comes from distributed_row_number
    (range shuffle + broadcast offsets — no single-task window), then
    one full-outer equi-join on position. No collect, no zipWithIndex
    RDD hop."""
    from world_cup_duckdb_spark.operators.relational import positional_join

    t = load_tables(spark, sf_dir)
    left = t["customer"].select("c_custkey", "c_name")
    right = (
        t["orders"]
        .select(F.col("o_custkey").alias("active_custkey"))
        .distinct()
    )
    return positional_join(
        left, right, ["c_custkey"], ["active_custkey"]
    ).select("c_custkey", "c_name", "active_custkey")


@register(
    "sql_macro",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                AS DOUBLE) AS revenue_e4
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def sql_macro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB ``CREATE MACRO`` ↔ Spark 4 SQL scalar UDFs
    (``CREATE FUNCTION … RETURNS … RETURN expr``): the reusable-
    expression surface a migrating user's macros land on. The function
    body is the engine's exact e4-cents revenue term, so the aggregate
    is order-independent and the oracle (body inlined — DuckDB macros
    can't be defined inside a single oracle statement; the dialect
    delta is the definition syntax, the SEMANTICS are what the hash
    pins) matches bit-for-bit. The sum stays within 2^53, so the
    double cast is exact in both engines.

    Scale: the SQL UDF inlines into the plan at analysis time — the
    aggregate runs as ordinary whole-stage-codegen'd expressions, with
    map-side partial aggregation; a macro costs nothing at runtime."""
    load_tables(spark, sf_dir)["lineitem"].createOrReplaceTempView(
        "lineitem"
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION rev_e4(p DOUBLE, d DOUBLE)
        RETURNS BIGINT
        RETURN CAST(ROUND(p * 100) AS BIGINT)
               * (100 - CAST(ROUND(d * 100) AS BIGINT))
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(SUM(rev_e4(l_extendedprice, l_discount)) AS DOUBLE)
                 AS revenue_e4
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


@register(
    "sql_semi_anti_join",
    oracle="""
    SELECT 'with_orders' AS cohort,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer SEMI JOIN orders ON c_custkey = o_custkey
    UNION ALL
    SELECT 'without_orders',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
    FROM customer ANTI JOIN orders ON c_custkey = o_custkey
    """,
)
def sql_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB's top-level ``SEMI JOIN`` / ``ANTI JOIN`` clauses ↔ Spark's
    ``LEFT SEMI JOIN`` / ``LEFT ANTI JOIN``: existence joins that never
    duplicate the left side (the correct way to write "customers with /
    without orders" — an inner join would multiply customers by their
    order count, and a DISTINCT after it hides that bug instead of
    avoiding the work).

    Scale: both plan as build-on-the-right hash joins with EARLY-OUT
    probe semantics — no join output materialization, and at 100 TB the
    right side reduces to its distinct keys before broadcast/shuffle
    (Catalyst inserts the aggregate)."""
    for t in ("customer", "orders"):
        load_tables(spark, sf_dir)[t].createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT 'with_orders' AS cohort,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_bal
        FROM customer LEFT SEMI JOIN orders ON c_custkey = o_custkey
        UNION ALL
        SELECT 'without_orders',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        FROM customer LEFT ANTI JOIN orders ON c_custkey = o_custkey
        """
    )


@register(
    "sql_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           regexp_matches(p_name, '^[a-z]+ [a-z]+$') AS two_words
    FROM part
    """,
)
def sql_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable regex functions — the text-pipeline workhorses
    (extract / replace / match) pinned on the PORTABLE pattern subset
    (character classes, groups, anchors — identical under DuckDB's RE2
    and Spark's java.util.regex; lookarounds and \\b-style classes are
    where the engines diverge and are deliberately out of scope).
    Dialect deltas confined to the strings: DuckDB's regexp_replace
    needs the 'g' flag for global replacement (Spark is global by
    default) and spells boolean matching regexp_matches (Spark: RLIKE).
    Both extract functions return '' on no match.

    Scale: all three are per-row JVM/native expressions inside
    whole-stage codegen — no UDF, no shuffle."""
    load_tables(spark, sf_dir)["part"].createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey,
               regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
               regexp_replace(p_name, '[aeiou]', '_') AS devoweled,
               p_name RLIKE '^[a-z]+ [a-z]+$' AS two_words
        FROM part
        """
    )


@register(
    "sql_rank_family",
    oracle="""
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(RANK() OVER w AS INT) AS rnk,
           CAST(DENSE_RANK() OVER w AS INT) AS drnk,
           PERCENT_RANK() OVER w AS prnk,
           CUME_DIST() OVER w AS cdist,
           CAST(NTILE(4) OVER w AS INT) AS quartile
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    WINDOW w AS (ORDER BY COUNT(*) DESC, n_name)
    """,
)
def sql_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete ranking-function family in one named window —
    RANK / DENSE_RANK / PERCENT_RANK / CUME_DIST / NTILE — over the
    per-nation supplier census. PERCENT_RANK and CUME_DIST return
    doubles, but both engines compute the identical ratio of the same
    small integers, so the hash pins them exactly. Aggregates inside
    the window's ORDER BY (COUNT(*) DESC) exercise the agg-then-window
    phase ordering both planners must agree on.

    Scale: the window runs over the ≤|nations| aggregate, never fact
    rows — the safe (bounded-partition) window class."""
    for t in ("supplier", "nation"):
        load_tables(spark, sf_dir)[t].createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n_name,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               CAST(RANK() OVER w AS INT) AS rnk,
               CAST(DENSE_RANK() OVER w AS INT) AS drnk,
               PERCENT_RANK() OVER w AS prnk,
               CUME_DIST() OVER w AS cdist,
               CAST(NTILE(4) OVER w AS INT) AS quartile
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
        WINDOW w AS (ORDER BY COUNT(*) DESC, n_name)
        """
    )
