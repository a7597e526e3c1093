"""The SQL entry point (§3.1): one ANSI SQL text, two engines, equal
hashes.

The reference's real query interface is DuckDB SQL over the schema
(README.md:1-3 — "implemented as a DuckDB database"); this engine serves
the same surface through `spark.sql` over the registered views
(sources/catalog.py:register_views — Spark's temp views play the role of
DuckDB replacement scans). Each query here is a SINGLE shared SQL string:
the Spark implementation runs it verbatim through Catalyst, the oracle
runs the identical text in DuckDB — the strongest possible statement of
SQL-surface parity (no per-engine rewriting at all), covering the classic
TPC-H-style analytical shapes the schema exists to serve.

Determinism: decimal-cast money math (order-independent sums), explicit
tie-breaks on every ORDER BY ... LIMIT, DATE literals (not bare strings)
for timestamp comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import register_views

_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

SHARED_SQL: dict[str, str] = {
    # TPC-H Q1 shape: full-scan conditional aggregation
    "sql_pricing_summary": f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM({_REV}) AS DOUBLE) AS sum_disc_price,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    # TPC-H Q3 shape: 3-way join + group + deterministic top-10
    "sql_shipping_priority": f"""
    SELECT o_orderkey,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    # TPC-H Q5 shape: star join to region level
    "sql_local_supplier_volume": f"""
    SELECT n_name,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    # TPC-H Q6 shape: selective scan-heavy aggregate (pushdown showcase)
    "sql_revenue_change": """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_quantity < 24
      AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.05 AND 0.07
    """,
    # correlated-shape rewrite: customers whose spend exceeds 2x the
    # average order price (join against a scalar aggregate)
    "sql_big_spenders": """
    SELECT c_custkey,
           CAST(total AS DOUBLE) AS total_spend
    FROM (
      SELECT c_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey
    ) s
    CROSS JOIN (
      SELECT AVG(CAST(o_totalprice AS DECIMAL(18,2))) AS avg_price FROM orders
    ) a
    WHERE total > 2 * avg_price
    """,
    # TPC-H Q4 shape: correlated EXISTS — Catalyst decorrelates to a
    # semi join (SURVEY §4 "subquery decorrelation" exercised end-to-end)
    "sql_order_priority_check": """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_quantity > 49
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    # anti-join path: customers that never placed an urgent order
    "sql_customers_without_orders": """
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    """,
    # multi-grain aggregation in one pass (OP49's SQL form)
    "sql_grouping_sets": f"""
    SELECT r_name, n_name,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
    """,
    # hypertable-style continuous aggregate: one pass materializes the
    # hour/day/week grains (time-chunked rollup over the event stream)
    "sql_hypertable_rollup": """
    SELECT grain_hour, grain_day, grain_week, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM (
      SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS grain_hour,
             CAST(date_trunc('day',  CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS grain_day,
             CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS grain_week,
             event_type, value
      FROM events
    ) g
    GROUP BY GROUPING SETS (
      (grain_hour, event_type), (grain_day, event_type),
      (grain_week, event_type)
    )
    """,
    # calendar rollup: monthly order volume (event-time bucketing in SQL)
    "sql_monthly_volume": """
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS volume
    FROM orders
    GROUP BY 1
    """,
    # window over SQL text: per-nation customer account-balance rank
    "sql_balance_rank": """
    SELECT n_name, c_custkey, bal_rank FROM (
      SELECT n_name, c_custkey,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY n_name
               ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey
             ) AS INT) AS bal_rank
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    ) ranked
    WHERE bal_rank <= 3
    """,
}


def _make(name: str, text: str):
    @register(name, oracle=text)
    def _q(spark: SparkSession, sf_dir: str, _text=text) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_text)

    _q.__name__ = name
    _q.__doc__ = (
        "Shared-text SQL query (§3.1 lifecycle): the identical string "
        "runs through Catalyst here and through DuckDB as its own oracle."
    )
    return _q


for _name, _text in SHARED_SQL.items():
    _make(_name, _text)
