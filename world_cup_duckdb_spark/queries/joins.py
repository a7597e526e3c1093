"""Join operators (SURVEY.md §2.4, OP23-OP29).

All reference joins are hash equi-joins over small dims plus one left
join and one self-join. Scale policy: bounded dims (region, nation,
literal lookups) are explicitly broadcast — at 100 TB the fact side never
shuffles for a dim join; fact⋈fact joins shuffle on their keys and AQE
picks sort-merge vs shuffled-hash (and splits skewed partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from world_cup_duckdb_spark.functions.strings import cents, dec
from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import load_tables


@register(
    "op23_join_broadcast",
    oracle="""
    SELECT r_name, n_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def op23_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ small-dim chain, broadcast both dims (OP23/OP24).

    Reference: stadium⋈city (scripts/build_db.py:529-532), team⋈federation
    (:624-627) — tiny inner equi-joins. Explicit `broadcast()` keeps the
    plan shuffle-free on the dim side at any scale.
    """
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


@register(
    "op25_join_diff_keys",
    oracle="""
    SELECT s_suppkey, s_name, n_name AS supplier_nation
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
)
def op25_join_diff_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner join with differing key names on the two sides (OP25).

    Reference: tournament⋈team with left_on='winner', right_on='team_name'
    (scripts/build_db.py:666-670).
    """
    t = load_tables(spark, sf_dir)
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("supplier_nation"))
    )


@register(
    "op26_join_composite",
    oracle="""
    SELECT l.l_orderkey, l.l_partkey, l.l_linenumber,
           CAST(g.grp_qty_c AS DOUBLE) / 100.0 AS group_qty
    FROM lineitem l
    JOIN (
      SELECT l_orderkey, l_partkey,
             SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS grp_qty_c
      FROM lineitem GROUP BY l_orderkey, l_partkey
    ) g ON l.l_orderkey = g.l_orderkey AND l.l_partkey = g.l_partkey
    """,
)
def op26_join_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key equi-join (OP26).

    Reference: matches⋈tournament_stages on ['tournament_id','stage_name']
    (scripts/build_db.py:741-748). Aggregate and probe shuffle on the same
    composite key, so Catalyst reuses one exchange for both sides.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    grp = li.groupBy("l_orderkey", "l_partkey").agg(
        F.sum(cents("l_quantity")).alias("grp_qty_c")
    )
    return li.join(grp, ["l_orderkey", "l_partkey"]).select(
        "l_orderkey",
        "l_partkey",
        "l_linenumber",
        (F.col("grp_qty_c").cast("double") / 100.0).alias("group_qty"),
    )


@register(
    "op27_left_join_flag",
    oracle="""
    SELECT c_custkey,
           (o.o_custkey IS NOT NULL) AS has_ordered
    FROM customer
    LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
      ON c_custkey = o.o_custkey
    """,
)
def op27_left_join_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join + null-probe → boolean flag (OP27).

    Reference: the only outer join — qualified_teams LEFT JOIN
    host_countries, null probe → is_host=False
    (scripts/build_db.py:823-841): `F.when(col.isNull(), False)`.
    """
    t = load_tables(spark, sf_dir)
    hosts = t["orders"].select("o_custkey").distinct()
    return (
        t["customer"]
        .join(hosts, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            F.when(F.col("o_custkey").isNull(), F.lit(False))
            .otherwise(F.lit(True))
            .alias("has_ordered"),
        )
    )


@register(
    "op28_self_join",
    oracle="""
    SELECT a.o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM orders a
    JOIN orders b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
    GROUP BY a.o_custkey
    """,
)
def op28_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join with disambiguating aliases (OP28).

    Reference: matches⋈matches replay pairing on
    ['home_team_id','away_team_id'] keeping both match ids
    (scripts/build_db.py:1183-1203). Equi-key + inequality residual:
    Catalyst plans the equi part as the join key (one shuffle on
    o_custkey) and applies the `<` as a post-join filter.

    SHUFFLE_HASH-hinted (r8): at bench SF Catalyst would auto-broadcast
    one side — broadcasting a full FACT table, the one plan shape that
    cannot survive 100 TB — and pay a broadcast-build job for it. The
    hinted self-join co-partitions both sides on o_custkey inside the
    single job; at scale that is the only correct plan anyway.
    """
    o = load_tables(spark, sf_dir)["orders"]
    a = o.select(F.col("o_custkey"), F.col("o_orderkey").alias("k1"))
    b = o.select(F.col("o_custkey").alias("cust2"), F.col("o_orderkey").alias("k2"))
    return (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("o_custkey") == F.col("cust2")) & (F.col("k1") < F.col("k2")),
        )
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "op29_join_renamed_dim",
    oracle="""
    SELECT c_custkey, c_name, n_name AS nation_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    """,
)
def op29_join_renamed_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join after renaming the dim key to the fact's FK name (OP29).

    Reference: `rename({'id':'stage_id'})` then join — match⋈stage
    (scripts/build_db.py:949-953), squad⋈position (:907-910), etc.
    """
    t = load_tables(spark, sf_dir)
    dim = t["nation"].withColumnRenamed("n_nationkey", "c_nationkey")
    return (
        t["customer"]
        .join(F.broadcast(dim), "c_nationkey")
        .select("c_custkey", "c_name", F.col("n_name").alias("nation_name"))
    )
