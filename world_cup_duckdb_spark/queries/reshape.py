"""Dedup / set ops / reshape / surrogate keys (SURVEY.md §2.5, OP30-OP33)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from world_cup_duckdb_spark.operators.relational import (
    diagonal_union,
    surrogate_key,
    surrogate_key_distributed,
    unpivot_measures,
)
from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import load_tables


@register(
    "op30_distinct",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def op30_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row distinct (OP30).

    Reference: `unique()` before keying dimension tables
    (scripts/build_db.py:141, :276, :408, :575, :750). Spark plans this as
    partial+final hash aggregate — map-side dedup before the shuffle, so
    at scale the exchange only carries already-unique rows per partition.
    """
    c = load_tables(spark, sf_dir)["customer"]
    return c.select("c_nationkey", "c_mktsegment").distinct()


@register(
    "op31_diagonal_union",
    oracle="""
    SELECT event_id, user_id, value FROM (
      SELECT event_id, user_id, value
      FROM events WHERE event_type = 'purchase'
      UNION ALL BY NAME
      SELECT event_id, user_id FROM events WHERE event_type = 'click'
      UNION ALL BY NAME
      SELECT event_id, value FROM events WHERE event_type = 'error'
    )
    """,
)
def op31_diagonal_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagonal (union-by-name) concat of differently-shaped frames (OP31).

    Reference: `pl.concat(how='diagonal')` of goals + melted bookings +
    melted substitutions (scripts/build_db.py:1048-1102); missing columns
    become null. Zero-shuffle plan-level union.
    """
    e = load_tables(spark, sf_dir)["events"]
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "value")
    return diagonal_union([purchases, clicks, errors]).select(
        "event_id", "user_id", "value"
    )


@register(
    "op32_unpivot",
    oracle="""
    SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
    """,
)
def op32_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (OP32).

    Reference: `melt(id_vars=[...])` over event-flag columns then
    `filter(value==1)` (scripts/build_db.py:1065-1081, :1083-1099).
    Measures are pre-cast to double for value-column type unification
    (SURVEY.md §7 hard part 3).
    """
    p = load_tables(spark, sf_dir)["part"]
    return unpivot_measures(
        p, ids=["p_partkey"], measures=["p_size", "p_retailprice"],
        variable_col="measure", value_col="value",
    )


@register(
    "op33_surrogate_key",
    oracle="""
    SELECT 'BR-' || CAST(ROW_NUMBER() OVER (ORDER BY p_brand) AS VARCHAR) AS brand_id,
           p_brand
    FROM (SELECT DISTINCT p_brand FROM part)
    """,
)
def op33_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense prefixed surrogate keys over a deduped dimension (OP33+OP30).

    Reference: `unique() → with_row_count(offset=1) → 'CTY-' + row_nr`
    (scripts/build_db.py:141-144; same at :277-279, :408-411, :576-578,
    :1109-1111). Deterministic via explicit natural-key ordering — see
    operators/relational.py:surrogate_key for the scale contract.
    """
    p = load_tables(spark, sf_dir)["part"]
    brands = p.select("p_brand").distinct()
    return surrogate_key(brands, "BR-", ["p_brand"], key_col="brand_id").select(
        "brand_id", "p_brand"
    )


@register(
    "ext_surrogate_key_scalable",
    oracle="""
    SELECT 'PK-' || CAST(ROW_NUMBER() OVER (ORDER BY p_partkey) AS VARCHAR)
             AS part_sk,
           p_partkey
    FROM part
    """,
)
def ext_surrogate_key_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-scale dense surrogate keys with NO global window: range
    shuffle + order-preserving Arrow local indexing + broadcast
    partition offsets (operators/relational.py:surrogate_key_distributed
    — the scale-safe answer to the single-task sort that op33's
    dimension-sized form deliberately accepts). Hash equality with the
    oracle's ROW_NUMBER() OVER (ORDER BY p_partkey) proves the
    decomposition is exact."""
    p = load_tables(spark, sf_dir)["part"]
    return surrogate_key_distributed(
        p.select("p_partkey"), "PK-", ["p_partkey"], key_col="part_sk",
        n_ranges=8,
    ).select("part_sk", "p_partkey")


@register(
    "ext_pivot_wide",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS n_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def ext_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-to-wide pivot — the inverse of OP32's unpivot: order counts
    per priority, one column per order status.

    The pivot values are declared explicitly, which matters twice at
    scale: Spark skips the extra distinct-values job it would otherwise
    run over the whole fact, and the plan stays a single partial+final
    hash aggregate (one shuffle on the groupBy key, each status count a
    pivoted aggregate slot — no per-status scans). `sum(1)` rather than
    `count(*)` so an absent (priority, status) cell is NULL on both
    engines (DuckDB's conditional SUM over zero rows is NULL; COUNT
    would be 0)."""
    o = load_tables(spark, sf_dir)["orders"]
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(F.lit(1)).cast("bigint"))
    )
    return p.select(
        "o_orderpriority",
        F.col("F").alias("n_f"),
        F.col("O").alias("n_o"),
        F.col("P").alias("n_p"),
    )
