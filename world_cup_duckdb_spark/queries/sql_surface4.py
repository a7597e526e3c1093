"""SQL-dialect parity, batch 4 (EXTENSION): ORDER BY ALL, the PIVOT
clause, named WINDOW specs, and IGNORE NULLS — the remaining everyday
DuckDB-dialect forms a migrating user types, each expressed in Spark
SQL (all four are native in Spark 4) and hash-checked against the
DuckDB twin. Dialect deltas are confined to the oracle string (e.g.
DuckDB spells ``LAST_VALUE(x IGNORE NULLS)``, Spark
``LAST_VALUE(x) IGNORE NULLS``), so a green row certifies the
SEMANTICS match even where the surface syntax differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import load_tables


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_tables(spark, sf_dir)[n].createOrReplaceTempView(n)


@register(
    "sql_order_by_all",
    oracle="""
    SELECT r_name AS region, n_name AS nation,
           CAST(n_nationkey AS BIGINT) AS nationkey
    FROM nation JOIN region ON n_regionkey = r_regionkey
    ORDER BY ALL
    """,
)
def sql_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ORDER BY ALL`` (every select-list column, left to right) — the
    DuckDB convenience Spark 4 adopted verbatim. The driver hash is
    order-insensitive, so what the green row certifies is that the
    clause resolves and the projected values/schemas agree; the clause
    itself is the dialect-parity subject. Scale: a 25-row dim join —
    the sort is dimension-sized by construction."""
    _views(spark, sf_dir, "nation", "region")
    return spark.sql(
        """
        SELECT r_name AS region, n_name AS nation,
               CAST(n_nationkey AS BIGINT) AS nationkey
        FROM nation JOIN region ON n_regionkey = r_regionkey
        ORDER BY ALL
        """
    )


@register(
    "sql_pivot_clause",
    oracle="""
    WITH p AS (
      SELECT * FROM (
        SELECT l_linestatus, l_returnflag, l_quantity FROM lineitem
      ) PIVOT (SUM(l_quantity) FOR l_returnflag IN ('A', 'N', 'R'))
    )
    SELECT l_linestatus,
           CAST("A" AS DOUBLE) AS qty_a,
           CAST("N" AS DOUBLE) AS qty_n,
           CAST("R" AS DOUBLE) AS qty_r
    FROM p
    """,
)
def sql_pivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL ``PIVOT`` clause (not the DataFrame ``groupBy().pivot()``
    twin `ext_pivot_wide` registers): quantity totals spread across
    return flags, grouped implicitly by the remaining column — the
    spreadsheet-shaped report both dialects grew native syntax for.

    Scale: Spark plans the clause as the same two-phase partial/final
    pivot aggregate as the DataFrame form — one shuffle keyed on the
    group column, flag columns folded map-side. Determinism: quantities
    are integer-valued doubles (≤50), so the double sums are exact in
    any accumulation order."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        WITH p AS (
          SELECT * FROM (
            SELECT l_linestatus, l_returnflag, l_quantity FROM lineitem
          ) PIVOT (SUM(l_quantity) FOR l_returnflag IN ('A', 'N', 'R'))
        )
        SELECT l_linestatus,
               CAST(A AS DOUBLE) AS qty_a,
               CAST(N AS DOUBLE) AS qty_n,
               CAST(R AS DOUBLE) AS qty_r
        FROM p
        """
    )


@register(
    "sql_named_window",
    oracle="""
    WITH r AS (
      SELECT n_name,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(28,2)) AS rev
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(RANK() OVER w AS INT) AS rev_rank,
           CAST(SUM(rev) OVER wrun AS DOUBLE) AS running_rev
    FROM r
    WINDOW w AS (ORDER BY rev DESC, n_name),
           wrun AS (ORDER BY rev DESC, n_name
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def sql_named_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named ``WINDOW`` clause: two specs over one ordering (a rank and
    a framed running sum) — the define-once SQL feature that keeps
    multi-window selects consistent and lets the planner share one sort.
    (Spark parses multiple comma-separated named windows but not
    DuckDB's ``OVER (w ROWS ...)`` frame-extension shorthand, so both
    sides spell the frame in its own named spec.) Scale: the windows run over the 25-row
    per-nation aggregate, never fact rows; the fact reduces first with
    exact decimal sums. Determinism: (rev, n_name) is a total order."""
    _views(spark, sf_dir, "orders", "customer", "nation")
    return spark.sql(
        """
        WITH r AS (
          SELECT n_name,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                      AS DECIMAL(28,2)) AS rev
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name
        )
        SELECT n_name,
               CAST(rev AS DOUBLE) AS revenue,
               CAST(RANK() OVER w AS INT) AS rev_rank,
               CAST(SUM(rev) OVER wrun AS DOUBLE) AS running_rev
        FROM r
        WINDOW w AS (ORDER BY rev DESC, n_name),
               wrun AS (ORDER BY rev DESC, n_name
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """
    )


@register(
    "sql_ignore_nulls",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           LAST_VALUE(CASE WHEN o_totalprice > 200000 THEN o_orderkey END
                      IGNORE NULLS) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS last_big_order
    FROM orders
    """,
)
def sql_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``IGNORE NULLS`` on LAST_VALUE — the SQL spelling of
    last-observation-carried-forward (each order carries the customer's
    most recent >$200k order key, NULL until one exists). Dialect
    delta confined to the strings: DuckDB puts IGNORE NULLS inside the
    call, Spark after it; the green row certifies identical semantics.
    Scale: the window is PARTITIONED by customer (state is per-key,
    executor-local — the scale-safe window class; compare the
    distributed_* helpers for the unpartitioned forms). Determinism:
    (o_orderdate, o_orderkey) totally orders each partition."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_custkey,
               o_orderkey,
               LAST_VALUE(CASE WHEN o_totalprice > 200000
                               THEN o_orderkey END) IGNORE NULLS OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS last_big_order
        FROM orders
        """
    )
