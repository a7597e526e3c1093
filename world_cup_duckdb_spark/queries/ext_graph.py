"""Graph-analytics extension: iterative algorithms expressed as DataFrame
programs (EXTENSION — the reference is purely batch-relational, but its
normalized fact/dimension schema is exactly the shape graph extraction
starts from; complement to operators/dedup.py's connected components).

Pattern demonstrated: *edge aggregation is the big-data step, iteration
runs on the aggregated graph.* Extracting the nation→nation trade graph
scans and joins the full fact tables (lineitem ⋈ orders ⋈ customer ⋈
supplier — the 100 TB part); the resulting weighted graph has only
|nations|² edges, so the fixed-point iteration is a handful of tiny
shuffles regardless of input scale. This split — heavy extract, light
iterate — is how PageRank/label-propagation runs on warehouse-scale data
without a specialized graph engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import load_tables

_DAMP = 0.85
_ITERS = 3

_PR_ITER_SQL = """
    r{k} AS (
      SELECT nodes.nk,
             ROUND(0.15 / nn.n_nodes + 0.85 * COALESCE(cs.s, 0.0), 9) AS pr
      FROM nodes CROSS JOIN nn
      LEFT JOIN (
        SELECT norm.dst, SUM(r{prev}.pr * norm.p) AS s
        FROM norm JOIN r{prev} ON r{prev}.nk = norm.src
        GROUP BY norm.dst
      ) cs ON cs.dst = nodes.nk
    )"""


@register(
    "ext_pagerank",
    oracle="""
    WITH edges AS (
      SELECT c_nationkey AS src, s_nationkey AS dst, COUNT(*) AS w
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1, 2
    ),
    outw AS (SELECT src, SUM(w) AS sw FROM edges GROUP BY src),
    norm AS (
      SELECT edges.src, edges.dst, edges.w / CAST(outw.sw AS DOUBLE) AS p
      FROM edges JOIN outw USING (src)
    ),
    nodes AS (
      SELECT src AS nk FROM edges UNION SELECT dst FROM edges
    ),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_nodes FROM nodes),
    r0 AS (SELECT nk, 1.0 / nn.n_nodes AS pr FROM nodes CROSS JOIN nn),
    {iters}
    SELECT n_name,
           CAST(nk AS INT) AS nationkey,
           ROUND(r{last}.pr, 6) AS pagerank
    FROM r{last} JOIN nation ON n_nationkey = nk
    """.format(
        iters=",".join(
            _PR_ITER_SQL.format(k=k, prev=k - 1) for k in range(1, _ITERS + 1)
        ).lstrip(),
        last=_ITERS,
    ),
)
def ext_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation→nation trade graph (damping 0.85, 3
    iterations): an edge src→dst for every lineitem whose buying
    customer sits in nation src and supplier in nation dst, weighted by
    line count; rank mass flows along out-weight-normalized edges.

    Scale: the 4-way fact join is the only data-sized work — customer
    and supplier are broadcast, lineitem⋈orders shuffles once on
    orderkey, and the partial aggregate collapses to ≤|nations|² edge
    rows before anything iterates. Each of the 3 iterations is a join +
    groupBy on that tiny frame (AQE broadcasts it), so iteration count
    scales the plan, not the data volume. Cross-engine float parity:
    each iteration rounds to 9 decimals in BOTH engines (sums of ~25
    products are addition-order-sensitive in the last ulps; mid-chain
    rounding removes the divergence), final ranks round to 6.
    """
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_suppkey")
    o = t["orders"].select("o_orderkey", "o_custkey")
    c = t["customer"].select("c_custkey", "c_nationkey")
    s = t["supplier"].select("s_suppkey", "s_nationkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("sw"))
    norm = edges.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("sw").cast("double")).alias("p")
    )
    nodes = edges.select(F.col("src").alias("nk")).union(
        edges.select(F.col("dst").alias("nk"))
    ).distinct()
    nn = nodes.agg(F.count(F.lit(1)).cast("double").alias("n_nodes"))
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "nk", (F.lit(1.0) / F.col("n_nodes")).alias("pr")
    )
    for _ in range(_ITERS):
        contrib = (
            norm.join(ranks, norm.src == ranks.nk)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("p")).alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes.nk == contrib.dst, "left")
            .crossJoin(F.broadcast(nn))
            .select(
                "nk",
                F.round(
                    F.lit(1 - _DAMP) / F.col("n_nodes")
                    + F.lit(_DAMP) * F.coalesce("s", F.lit(0.0)),
                    9,
                ).alias("pr"),
            )
        )
    nation = t["nation"].select("n_nationkey", "n_name")
    return ranks.join(
        F.broadcast(nation), ranks.nk == nation.n_nationkey
    ).select(
        "n_name",
        F.col("nk").cast("int").alias("nationkey"),
        F.round("pr", 6).alias("pagerank"),
    )
