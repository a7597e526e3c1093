"""Skew-management extension queries: salted rewrites whose results are
provably identical to the plain forms (the DuckDB oracle runs the
unsalted SQL — matching hashes prove the rewrite is semantics-preserving
while spreading hot keys over n reducers at scale)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from world_cup_duckdb_spark.functions.strings import dec
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
