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

from world_cup_duckdb_spark.queries import register, tracked_persist
from world_cup_duckdb_spark.sources.catalog import load_tables

#: Damping 0.85 enters the integer iteration as the exact ratio 17/20.
_ITERS = 3

#: Rank unit: pr is an exact BIGINT in units of 1e-12 rank mass;
#: per-edge transition probabilities are BIGINT parts-per-million.
#: All iteration arithmetic is integer multiply + floor division —
#: bit-identical and addition-order-independent in BOTH engines, unlike
#: any float formulation (mid-chain ROUND(x, 9) was measurably unsound:
#: Spark rounds the exact binary expansion, DuckDB a scaled float, and
#: boundary doubles flip — verified on adversarial samples).
_R_SCALE = 1_000_000_000_000
_P_SCALE = 1_000_000

_PR_ITER_SQL = f"""
    r{{k}} AS (
      SELECT nodes.nk,
             (3 * {_R_SCALE}) // (20 * nn.n_nodes)
             + (17 * COALESCE(cs.s, 0)) // 20 AS pr
      FROM nodes CROSS JOIN nn
      LEFT JOIN (
        SELECT norm.dst,
               SUM((r{{prev}}.pr * norm.p_ppm) // {_P_SCALE}) AS s
        FROM norm JOIN r{{prev}} ON r{{prev}}.nk = norm.src
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
      SELECT edges.src, edges.dst,
             (edges.w * 1000000) // outw.sw AS p_ppm
      FROM edges JOIN outw USING (src)
    ),
    nodes AS (
      SELECT src AS nk FROM edges UNION SELECT dst FROM edges
    ),
    nn AS (SELECT COUNT(*) AS n_nodes FROM nodes),
    r0 AS (SELECT nk, 1000000000000 // nn.n_nodes AS pr
           FROM nodes CROSS JOIN nn),
    {iters}
    SELECT n_name,
           CAST(nk AS INT) AS nationkey,
           ROUND(CAST(r{last}.pr AS DOUBLE) / 1000000000000.0, 6) AS pagerank
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
    scales the plan, not the data volume.

    Cross-engine exactness: the whole iteration runs in scaled INTEGER
    arithmetic — pr in BIGINT units of 1e-12 rank mass, per-edge
    transition probabilities in parts-per-million, every step an
    integer multiply + floor division (identical in Spark `div` and
    DuckDB `//` for non-negative operands) — so the fixed point is
    bit-identical and addition-order-independent in both engines.
    Float formulations are NOT equalizable by mid-chain rounding:
    Spark's ROUND works on the exact binary expansion while DuckDB
    scales a float, and boundary doubles measurably flip between them.
    The per-edge floor leaks < 1e-6 relative mass per hop (deterministic
    in both engines); only the final display value divides into a double.
    Overflow bounds: pr ≤ 1e12 and p_ppm ≤ 1e6 keep every product
    ≤ 1e18 < 2^63; the w*1e6 normalization requires per-edge weight
    < 9.2e12 rows (repartition the edge extract first if a single
    nation-pair ever exceeds that).
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
        # Bounded (≤|nations|² rows) extract consumed by outw, norm,
        # nodes AND every iteration's join: without the persist cut each
        # consumer re-executes the 4-way FACT join — the datacard
        # 120-scan class (plan census r10: 25 parquet scans; 4 after).
        .transform(tracked_persist)
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("sw"))
    norm = edges.join(outw, "src").select(
        "src", "dst", F.expr(f"(w * {_P_SCALE}) div sw").alias("p_ppm")
    )
    nodes = edges.select(F.col("src").alias("nk")).union(
        edges.select(F.col("dst").alias("nk"))
    ).distinct()
    nn = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "nk", F.expr(f"{_R_SCALE} div n_nodes").alias("pr")
    )
    for it in range(_ITERS):
        contrib = (
            norm.join(ranks, norm.src == ranks.nk)
            .select("dst", F.expr(f"(pr * p_ppm) div {_P_SCALE}").alias("t"))
            .groupBy("dst")
            .agg(F.sum("t").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes.nk == contrib.dst, "left")
            .crossJoin(F.broadcast(nn))
            .select(
                "nk",
                F.expr(
                    f"(3 * {_R_SCALE}) div (20 * n_nodes)"
                    f" + (17 * coalesce(s, 0)) div 20"
                ).alias("pr"),
            )
        )
        # Truncate lineage every other round (same guard as
        # operators/dedup.py:connected_components): each iteration nests
        # the previous plan, and an unbounded chain blows up optimizer
        # time / stack depth when the pattern is lifted to a real graph
        # with tens of iterations. Checkpointing a ≤|nations| frame is
        # O(nothing) here and keeps the loop shape scale-safe.
        if it % 2 == 1:
            ranks = ranks.localCheckpoint(eager=True)
    nation = t["nation"].select("n_nationkey", "n_name")
    return ranks.join(
        F.broadcast(nation), ranks.nk == nation.n_nationkey
    ).select(
        "n_name",
        F.col("nk").cast("int").alias("nationkey"),
        # the only float op in the query: one exact-BIGINT-to-double
        # divide (pr < 2^53) for display, identical in both engines
        F.round(F.col("pr").cast("double") / F.lit(float(_R_SCALE)), 6).alias(
            "pagerank"
        ),
    )


_EDGES_SQL = """
      SELECT DISTINCT
             LEAST(c_nationkey, s_nationkey) AS a,
             GREATEST(c_nationkey, s_nationkey) AS b
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE c_nationkey <> s_nationkey
"""


@register(
    "ext_triangles",
    oracle=f"""
    WITH e AS ({_EDGES_SQL}),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    member AS (
      SELECT x AS nk FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    ),
    per_node AS (SELECT nk, COUNT(*) AS n_triangles FROM member GROUP BY nk),
    deg AS (
      SELECT nk, COUNT(*) AS degree FROM (
        SELECT a AS nk FROM e UNION ALL SELECT b FROM e
      ) GROUP BY nk
    )
    SELECT n_name,
           CAST(deg.nk AS INT) AS nationkey,
           CAST(deg.degree AS INT) AS degree,
           CAST(COALESCE(per_node.n_triangles, 0) AS BIGINT) AS n_triangles,
           COALESCE(per_node.n_triangles, 0)
             / (deg.degree * (deg.degree - 1) / 2.0) AS clustering_coeff
    FROM deg
    LEFT JOIN per_node ON per_node.nk = deg.nk
    JOIN nation ON n_nationkey = deg.nk
    """,
)
def ext_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + local clustering coefficient on the undirected
    nation trade graph: the oriented-edge (a<b) self-join method — each
    triangle is found exactly once as a<b<c, so no post-dedup. Per-node
    triangle membership over node degree pairs gives the clustering
    coefficient (how interconnected each nation's partners are).

    Scale: same heavy-extract/light-iterate split as ext_pagerank — the
    fact join distills to a distinct oriented edge list (≤|nations|²/2
    rows), then two broadcast self-joins enumerate wedges and close
    them. On a large graph the identical plan shuffles by edge key and
    the orientation (low-degree endpoint first, a<b here) is THE
    classic bound on wedge counts (Schank-Wagner); degree arithmetic is
    exact integer → double division, no float drift. Degrees here count
    distinct neighbors (complete-graph degree = |nodes|-1)."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_suppkey")
    o = t["orders"].select("o_orderkey", "o_custkey")
    c = t["customer"].select("c_custkey", "c_nationkey")
    s = t["supplier"].select("s_suppkey", "s_nationkey")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.least("c_nationkey", "s_nationkey").alias("a"),
            F.greatest("c_nationkey", "s_nationkey").alias("b"),
        )
        .distinct()
        # Bounded (≤|nations|²/2 rows) oriented edge list consumed FIVE
        # times (three self-join arms + both degree unions): persist the
        # cut or every arm re-runs the full fact join (plan census r10:
        # 45 parquet scans; 4 after).
        .transform(tracked_persist)
    )
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    e3 = e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z"))
    )
    member = (
        tri.select(F.col("x").alias("nk"))
        .unionAll(tri.select(F.col("y").alias("nk")))
        .unionAll(tri.select(F.col("z").alias("nk")))
    )
    per_node = member.groupBy("nk").agg(F.count(F.lit(1)).alias("n_triangles"))
    deg = (
        e.select(F.col("a").alias("nk"))
        .unionAll(e.select(F.col("b").alias("nk")))
        .groupBy("nk")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    nation = t["nation"].select("n_nationkey", "n_name")
    return (
        deg.join(per_node, "nk", "left")
        .join(F.broadcast(nation), deg.nk == nation.n_nationkey)
        .select(
            "n_name",
            F.col("nk").cast("int").alias("nationkey"),
            F.col("degree").cast("int").alias("degree"),
            F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
            # NULL for degree-1 nodes (0 wedges): DuckDB's x/0.0 is
            # NULL, Spark under ANSI would error — guard to match
            F.when(
                F.col("degree") > 1,
                F.coalesce("n_triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1) / 2.0),
            ).alias("clustering_coeff"),
        )
    )


_BFS_DEPTH = 4

_BFS_EDGES_SQL = """
      SELECT c_nationkey AS src, s_nationkey AS dst, COUNT(*) AS w
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE c_nationkey <> s_nationkey
      GROUP BY 1, 2
"""


@register(
    "ext_bfs_reachability",
    oracle=f"""
    WITH RECURSIVE allw AS ({_BFS_EDGES_SQL}),
    e AS (
      SELECT src, dst FROM allw WHERE w > (SELECT AVG(w) FROM allw)
    ),
    walk AS (
      SELECT CAST(0 AS BIGINT) AS nk, 0 AS d
      UNION ALL
      SELECT e.dst, walk.d + 1
      FROM walk JOIN e ON e.src = walk.nk
      WHERE walk.d < {_BFS_DEPTH}
    )
    SELECT n_name, CAST(nk AS INT) AS nationkey,
           CAST(MIN(d) AS INT) AS dist
    FROM walk JOIN nation ON n_nationkey = nk
    GROUP BY 1, 2
    """,
)
def ext_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS: shortest hop distance from nation 0 over the
    above-average-weight trade edges (the thresholding sparsifies the
    near-complete graph so distances are non-trivial), bounded at 4
    hops. The oracle is a RECURSIVE CTE enumerating bounded walks and
    taking MIN(d) — the declarative twin of the iterative frontier
    expansion.

    Scale: heavy-extract/light-iterate again — the fact join reduces to
    ≤|nations|² weighted edges before any iteration. The Spark side runs
    TRUE frontier BFS: each round joins only the newly-reached frontier
    against the edge list and anti-joins the visited set, so work per
    round is bounded by the frontier, while the oracle's walk
    enumeration would blow up on a big graph (fine at dimension size,
    wrong at scale — that asymmetry is the point of the test). The
    threshold compares exact integer counts to one IEEE average of
    integers, identical on both engines."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_suppkey")
    o = t["orders"].select("o_orderkey", "o_custkey")
    c = t["customer"].select("c_custkey", "c_nationkey")
    s = t["supplier"].select("s_suppkey", "s_nationkey")
    allw = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    avg_w = allw.agg(F.avg("w").alias("aw"))
    e = (
        allw.crossJoin(F.broadcast(avg_w))
        .filter(F.col("w") > F.col("aw"))
        .select("src", "dst")
    )
    dist = spark.createDataFrame([(0, 0)], "nk bigint, d int")
    frontier = dist
    for depth in range(1, _BFS_DEPTH + 1):
        reached = (
            frontier.join(e, frontier.nk == e.src)
            .select(F.col("dst").alias("nk"))
            .distinct()
        )
        frontier = reached.join(dist, "nk", "left_anti").select(
            "nk", F.lit(depth).alias("d")
        )
        frontier = frontier.localCheckpoint(eager=True)
        if not frontier.take(1):
            break
        dist = dist.unionByName(frontier)
    nation = t["nation"].select("n_nationkey", "n_name")
    return dist.join(F.broadcast(nation), dist.nk == nation.n_nationkey).select(
        "n_name",
        F.col("nk").cast("int").alias("nationkey"),
        F.col("d").cast("int").alias("dist"),
    )
