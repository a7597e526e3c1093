"""Similarity-search extension queries (operators/similarity.py).

Cosine values are hash-compared directly against DuckDB — the double
fold in operators/similarity.py matches list_cosine_similarity
bit-for-bit (verified; both are strict sequential sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from world_cup_duckdb_spark.operators.similarity import (
    brute_force_topk,
    brute_force_topk_np,
    embedding_near_duplicates,
    lsh_topk,
)
from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import load_tables


# Shared by the fold form and its Arrow-vectorized twin: both compute the
# identical left-to-right double arithmetic, so one oracle checks both.
_BRUTEFORCE_ORACLE = """
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
                      sqrt(list_sum(list_transform(
                        range(1, len(embedding) + 1),
                        i -> CAST(embedding AS DOUBLE[])[i]
                             * CAST(embedding AS DOUBLE[])[i]))) AS qn
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv,
                 sqrt(list_sum(list_transform(
                   range(1, len(embedding) + 1),
                   i -> CAST(embedding AS DOUBLE[])[i]
                        * CAST(embedding AS DOUBLE[])[i]))) AS cn
          FROM embeddings),
    scored AS (
      -- explicit dot/(sqrt·sqrt): matches Spark's sequential double fold
      -- bit-for-bit (list_cosine_similarity would clamp to [-1, 1])
      SELECT query_id, neighbor_id,
             list_sum(list_transform(range(1, len(qv) + 1),
                                     i -> qv[i] * cv[i])) / (qn * cn) AS cos_sim
      FROM q CROSS JOIN c
      WHERE query_id <> neighbor_id
    )
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank, cos_sim
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM scored
    )
    WHERE rnk <= 5
    """


@register("ext_ann_bruteforce", oracle=_BRUTEFORCE_ORACLE)
def ext_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for 10 query vectors — the ANN
    baseline: broadcast queries, stream corpus, rank window
    (operators/similarity.py:brute_force_topk)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return brute_force_topk(emb.filter(F.col("vec_id") < 10), emb, k=5)


@register("ext_ann_bruteforce_np", oracle=_BRUTEFORCE_ORACLE)
def ext_ann_bruteforce_np(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same exact top-5, through the Arrow-vectorized kernel
    (operators/similarity.py:brute_force_topk_np): per-partition numpy
    scoring with dimension-ordered accumulation (bit-identical to the
    fold and the shared oracle) and per-partition top-k, so the global
    rank window sees |Q|·k·partitions rows, never corpus volume — the
    throughput form a 100 TB brute-force pass actually runs."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return brute_force_topk_np(emb.filter(F.col("vec_id") < 10), emb, k=5)


@register(
    "ext_embedding_neardup",
    oracle="""
    WITH v0 AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id < 300
      UNION ALL
      SELECT vec_id + 100000, CAST(embedding AS DOUBLE[])
      FROM embeddings WHERE vec_id < 300
    ),
    v AS (
      SELECT vec_id, e,
             sqrt(list_sum(list_transform(range(1, len(e) + 1),
                                          i -> e[i] * e[i]))) AS nrm
      FROM v0
    )
    -- explicit dot/(sqrt·sqrt): matches Spark's sequential double fold
    -- bit-for-bit (list_cosine_similarity would clamp to [-1, 1])
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           list_sum(list_transform(range(1, len(a.e) + 1),
                                   i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm)
             AS cos_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_sum(list_transform(range(1, len(a.e) + 1),
                                  i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm)
          >= 0.95
    """,
)
def ext_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (≥0.95) over a bounded
    corpus ∪ an id-shifted copy — every vector has an exact duplicate,
    exercising the detection path. The quadratic verify stage of
    embedding dedup (operators/similarity.py:embedding_near_duplicates).
    """
    emb = load_tables(spark, sf_dir)["embeddings"].filter(F.col("vec_id") < 300)
    copy = emb.withColumn("vec_id", F.col("vec_id") + 100000)
    return embedding_near_duplicates(emb.unionByName(copy), threshold=0.95)


def _sign_lsh_sql(num_planes: int = 4) -> str:
    """DuckDB mirror of operators/similarity.py:lsh_signature: bit p =
    sign of the vector's sequential-fold projection onto a hyperplane
    whose ±1 coefficients come from md5(p ':' dim)."""
    projs = []
    for p in range(num_planes):
        coef = (
            "CASE WHEN (strpos('0123456789abcdef', "
            f"substr(md5('{p}:' || CAST(i - 1 AS VARCHAR)), 1, 1)) - 1) "
            "% 2 = 0 THEN 1.0 ELSE -1.0 END"
        )
        projs.append(
            "(CASE WHEN list_sum(list_transform(range(1, len(v) + 1), "
            f"i -> v[i] * ({coef}))) > 0 THEN {2 ** p} ELSE 0 END)"
        )
    return " + ".join(projs)


@register(
    "ext_ann_lsh",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ),
    sigs AS (
      SELECT vec_id, v,
             sqrt(list_sum(list_transform(range(1, len(v) + 1),
                                          i -> v[i] * v[i]))) AS nrm,
             CAST({_sign_lsh_sql(4)} AS INT) AS bucket
      FROM e
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, bucket
          FROM sigs WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, len(q.qv) + 1),
                                     i -> q.qv[i] * c.v[i]))
               / (q.qnrm * c.nrm) AS cos_sim
      FROM q JOIN sigs c ON q.bucket = c.bucket
      WHERE q.query_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank, cos_sim
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM scored
    )
    WHERE rnk <= 5
    """,
)
def ext_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN (operators/similarity.py:lsh_topk): random
    hyperplane signatures → bucket equi-join → exact re-score. The scale
    path replacing brute-force's cross join. Hash-checked oracle: the
    hyperplane coefficients are md5-derived and the projection is a
    sequential double fold, so DuckDB reproduces bucket assignments —
    and therefore the APPROXIMATE top-k itself — exactly; recall vs
    brute force is additionally pytest-measured."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return lsh_topk(emb.filter(F.col("vec_id") < 10), emb, k=5, num_planes=4)


@register(
    "ext_ann_ivf",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_sum(list_transform(
               range(1, len(embedding) + 1),
               i -> CAST(embedding AS DOUBLE[])[i]
                    * CAST(embedding AS DOUBLE[])[i]))) AS nrm
      FROM embeddings
    ),
    picked AS (
      SELECT vec_id AS cid FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ),
    centroids AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY cid) AS INT) AS list_id,
             e.v AS centroid, e.nrm AS cnrm
      FROM picked JOIN e ON e.vec_id = picked.cid
    ),
    assign_scored AS (
      SELECT e.vec_id AS vid, e.v, e.nrm, c.list_id,
             list_sum(list_transform(range(1, len(c.centroid) + 1),
                                     i -> c.centroid[i] * e.v[i]))
               / (c.cnrm * e.nrm) AS c_sim
      FROM e CROSS JOIN centroids c
    ),
    assigned AS (
      SELECT vid, v, nrm, list_id FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vid ORDER BY c_sim DESC, list_id) AS rn
        FROM assign_scored
      ) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm
          FROM e WHERE vec_id < 10),
    q_scored AS (
      SELECT q.query_id, q.qv, q.qnrm, c.list_id,
             list_sum(list_transform(range(1, len(q.qv) + 1),
                                     i -> q.qv[i] * c.centroid[i]))
               / (q.qnrm * c.cnrm) AS c_sim
      FROM q CROSS JOIN centroids c
    ),
    probes AS (
      SELECT query_id, qv, qnrm, list_id FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY c_sim DESC, list_id) AS rn
        FROM q_scored
      ) WHERE rn <= 4
    ),
    cand AS (
      SELECT p.query_id, a.vid AS neighbor_id,
             MAX(list_sum(list_transform(range(1, len(p.qv) + 1),
                                         i -> p.qv[i] * a.v[i]))
                 / (p.qnrm * a.nrm)) AS cos_sim
      FROM probes p JOIN assigned a ON p.list_id = a.list_id
      WHERE p.query_id <> a.vid
      GROUP BY p.query_id, a.vid
    )
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank, cos_sim
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM cand
    )
    WHERE rnk <= 5
    """,
)
def ext_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed approximate top-5 for 10 query vectors: coarse-quantize
    the corpus into 16 lists, probe the 4 nearest lists per query, exact
    re-score only within them (operators/similarity.py:ivf_topk — the
    candidate join is an equi-join on list_id, not a cross join).
    Hash-checked oracle: the md5-ordered centroid pick, the argmax list
    assignment, the probe selection, and every cosine are deterministic,
    so DuckDB reproduces the APPROXIMATE result exactly — the whole IVF
    pipeline (not just its mechanism) is differentially tested. Recall
    vs brute force and the full-probe ≡ brute-force identity are
    additionally pytest-verified (tests/test_similarity.py)."""
    from world_cup_duckdb_spark.operators.similarity import ivf_topk

    emb = load_tables(spark, sf_dir)["embeddings"]
    return ivf_topk(
        emb.filter(F.col("vec_id") < 10), emb, k=5, n_lists=16, n_probe=4
    )


@register(
    "ext_vector_norm",
    oracle="""
    SELECT vec_id,
           ROUND(sqrt(list_sum(
             list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
           )), 6) AS l2_norm
    FROM embeddings
    """,
)
def ext_vector_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm via a sequential array fold (`F.aggregate`) —
    the normalization primitive every cosine pipeline needs. The fold
    walks each array in element order on both engines, so the double
    result matches the DuckDB list_sum oracle (rounded to 6 to absorb
    the last ulp of sqrt).

    Scale: embarrassingly parallel, zero shuffle; the arithmetic is a
    JVM higher-order function, not Python."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    sq_sum = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    # NULL for an empty embedding array: the fold's 0.0 seed would say
    # norm 0.0, but DuckDB's list_sum([]) is NULL — match the oracle (a
    # zero-length vector has no meaningful norm anyway).
    return emb.select(
        "vec_id",
        F.when(F.size("embedding") > 0, F.round(F.sqrt(sq_sum), 6)).alias(
            "l2_norm"
        ),
    )


@register(
    "ext_embedding_centroids",
    oracle="""
    SELECT label, CAST(dim - 1 AS INT) AS dim_idx,
           CAST(SUM(CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
                AS DOUBLE) / (COUNT(*) * 1000000.0) AS centroid
    FROM (
      SELECT label, unnest(embedding) AS x,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings
    ) t
    GROUP BY label, dim
    """,
)
def ext_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, one row per (label, dimension) — the k-means
    update step / class-prototype computation. Components are scaled to
    integer micro-units before summing so the distributed sum is exact
    and partition-order independent (the float-sum analogue of the
    decimal money rule), then divided back to a double.

    Scale: posexplode multiplies rows by dimension count, but the partial
    aggregation reduces to (labels × dims) rows before the single
    shuffle — the classic map-side-combine win."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return (
        emb.select("label", F.posexplode("embedding").alias("dim_idx", "x"))
        .groupBy("label", "dim_idx")
        .agg(
            (
                F.sum(F.round(F.col("x").cast("double") * 1000000).cast("bigint"))
                .cast("double")
                / (F.count(F.lit(1)) * 1000000.0)
            ).alias("centroid")
        )
        .select("label", F.col("dim_idx").cast("int"), "centroid")
    )


@register(
    "ext_embedding_quantize",
    oracle="""
    WITH s AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding,
                                     x -> abs(CAST(x AS DOUBLE)))) / 127.0
               AS scale
      FROM embeddings
    )
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS n_dims,
           scale,
           CAST(len(list_distinct(list_transform(
             embedding,
             x -> CAST(round(CAST(x AS DOUBLE) / scale) AS BIGINT)
           ))) AS INT) AS n_levels,
           list_max(list_transform(
             embedding,
             x -> abs(CAST(x AS DOUBLE)
                      - round(CAST(x AS DOUBLE) / scale) * scale)
           )) AS max_abs_err
    FROM s
    WHERE scale > 0
    """,
)
def ext_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization QC for the embedding store: per-vector
    scale = max|x|/127, codes = round(x/scale) ∈ [-127,127], reporting
    the distinct code count (how much of the int8 range the vector
    actually uses) and the worst dequantization error (bounded by
    scale/2) — the 4× memory-compression step an ANN serving tier
    applies before ext_ann_* search, with this query as its loss audit.

    Scale: zero shuffle — every metric is per-row JVM higher-order
    array arithmetic (transform/array_max/array_distinct), Tungsten-
    codegen'd, no Python. Determinism: max, one divide, elementwise
    round (both engines round half away from zero) and one
    multiply-subtract per element — no accumulation anywhere, so the
    doubles match bit-for-bit unrounded."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    x = lambda c: c.cast("double")  # noqa: E731
    withs = emb.withColumn(
        "scale",
        F.array_max(F.transform("embedding", lambda v: F.abs(x(v)))) / 127.0,
    ).filter(F.col("scale") > 0)
    codes = F.transform(
        "embedding", lambda v: F.round(x(v) / F.col("scale")).cast("bigint")
    )
    errs = F.transform(
        "embedding",
        lambda v: F.abs(x(v) - F.round(x(v) / F.col("scale")) * F.col("scale")),
    )
    return withs.select(
        "vec_id",
        F.size("embedding").cast("int").alias("n_dims"),
        "scale",
        F.size(F.array_distinct(codes)).cast("int").alias("n_levels"),
        F.array_max(errs).alias("max_abs_err"),
    )


from world_cup_duckdb_spark.queries import REGISTRY as _REG  # noqa: E402

_BF_SQL = _REG["ext_ann_bruteforce"].oracle
_LSH_SQL = _REG["ext_ann_lsh"].oracle


@register(
    "ext_ann_lsh_persist",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    sigs AS (
      SELECT vec_id, CAST({_sign_lsh_sql(4)} AS INT) AS bucket FROM e
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(vec_id) AS BIGINT) AS sum_vid
    FROM sigs GROUP BY bucket
    """,
)
def ext_ann_lsh_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH index BUILD + PERSIST (operators/similarity.py:
    lsh_index_persist): the corpus written hive-partitioned by its
    hyperplane-signature bucket, completing the index-lifecycle trio
    (IVF, PQ, LSH). The returned per-bucket census re-reads the
    persisted files, so the oracle hash-checks what landed on disk."""
    import os

    from world_cup_duckdb_spark.operators.similarity import lsh_index_persist
    from world_cup_duckdb_spark.queries.lifecycle import _fresh_dir

    emb = load_tables(spark, sf_dir)["embeddings"]
    loc = _fresh_dir("lsh-index")
    lsh_index_persist(emb, loc, num_planes=4)
    return (
        spark.read.parquet(os.path.join(loc, "buckets"))
        .groupBy(F.col("bucket").cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.sum("vid").cast("bigint").alias("sum_vid"),
        )
    )


@register("ext_ann_lsh_query", oracle=_LSH_SQL)
def ext_ann_lsh_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH top-k SERVED FROM THE PERSISTED INDEX (operators/
    similarity.py:lsh_topk_from_index): query signatures computed on the
    bounded query side only, the bucket scan pruned to the queried
    signatures via a literal partition predicate (plan-pinned in
    tests/test_similarity.py). Shares ext_ann_lsh's oracle verbatim —
    the serve path is bit-identical to the in-memory form through a
    parquet round trip."""
    from world_cup_duckdb_spark.operators.similarity import (
        lsh_index_persist,
        lsh_topk_from_index,
    )
    from world_cup_duckdb_spark.queries.lifecycle import _fresh_dir

    emb = load_tables(spark, sf_dir)["embeddings"]
    loc = _fresh_dir("lsh-serve")
    lsh_index_persist(emb, loc, num_planes=4)
    return lsh_topk_from_index(
        spark, loc, emb.filter(F.col("vec_id") < 10), k=5, num_planes=4
    )
_IVF_SQL = _REG["ext_ann_ivf"].oracle


@register(
    "ext_ann_recall",
    oracle=f"""
    WITH bf AS ({_BF_SQL}),
    lshq AS ({_LSH_SQL}),
    ivfq AS ({_IVF_SQL}),
    approx AS (
      SELECT 'lsh' AS method, query_id, neighbor_id FROM lshq
      UNION ALL
      SELECT 'ivf', query_id, neighbor_id FROM ivfq
    ),
    base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_base FROM bf),
    hits AS (
      SELECT method, CAST(COUNT(*) AS BIGINT) AS hits
      FROM approx JOIN bf USING (query_id, neighbor_id)
      GROUP BY method
    )
    SELECT method, hits, n_base,
           ROUND(hits / CAST(n_base AS DOUBLE), 6) AS recall_at_5
    FROM hits CROSS JOIN base
    """,
)
def ext_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 audit for both approximate ANN paths against the exact
    brute-force baseline — one hash-checked row per method. This is the
    number you read before trusting an index config on a 100 TB corpus:
    hits = ground-truth neighbors the method recovered, recall =
    hits/n_base. Every input is deterministic (md5 centroids and
    hyperplanes, sequential cosine folds), so the oracle — the three
    full pipelines composed as CTEs — reproduces the recall itself.

    The division uses integer hits over integer n_base (no float
    accumulation anywhere), so the recall doubles match bit-for-bit.
    """
    from world_cup_duckdb_spark.operators.similarity import ivf_topk

    emb = load_tables(spark, sf_dir)["embeddings"]
    q = emb.filter(F.col("vec_id") < 10)
    bf = brute_force_topk(q, emb, k=5).select("query_id", "neighbor_id")
    lsh = lsh_topk(q, emb, k=5, num_planes=4).select("query_id", "neighbor_id")
    ivf = ivf_topk(q, emb, k=5, n_lists=16, n_probe=4).select(
        "query_id", "neighbor_id"
    )
    approx = lsh.withColumn("method", F.lit("lsh")).unionByName(
        ivf.withColumn("method", F.lit("ivf"))
    )
    base = bf.agg(F.count(F.lit(1)).alias("n_base"))
    hits = (
        approx.join(bf, ["query_id", "neighbor_id"])
        .groupBy("method")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    return hits.crossJoin(F.broadcast(base)).select(
        "method",
        "hits",
        "n_base",
        F.round(F.col("hits") / F.col("n_base").cast("double"), 6).alias(
            "recall_at_5"
        ),
    )


@register(
    "ext_ann_pq",
    oracle="""
    WITH micro AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(round(x * 1000000) AS BIGINT)) AS e
      FROM embeddings
    ),
    subs AS (
      SELECT vec_id, CAST(mm.m AS INT) AS m,
             list_slice(e, mm.m * 16 + 1, mm.m * 16 + 16) AS sub
      FROM micro CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS m) mm
    ),
    cb_dim AS (
      SELECT m,
             CAST(CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 16 AS INT) AS c,
             generate_subscripts(sub, 1) AS j, unnest(sub) AS x
      FROM subs
    ),
    cb AS (
      SELECT m, c, j,
             CAST(floor(CAST(SUM(x) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)
               AS cx
      FROM cb_dim GROUP BY m, c, j
    ),
    cent AS (SELECT m, c, list(cx ORDER BY j) AS cent FROM cb GROUP BY m, c),
    scored AS (
      SELECT s.vec_id AS vid, s.m, t.c,
             list_sum(list_transform(
               range(1, len(s.sub) + 1),
               i -> (s.sub[i] - t.cent[i]) * (s.sub[i] - t.cent[i]))) AS d2
      FROM subs s JOIN cent t ON s.m = t.m
    ),
    codes AS (
      SELECT vid, m, c AS code FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vid, m ORDER BY d2, c) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    qd2 AS (
      SELECT q.vec_id AS query_id, q.m, t.c,
             list_sum(list_transform(
               range(1, len(q.sub) + 1),
               i -> (q.sub[i] - t.cent[i]) * (q.sub[i] - t.cent[i]))) AS qd2
      FROM subs q JOIN cent t ON q.m = t.m
      WHERE q.vec_id < 10
    ),
    adc AS (
      SELECT qd2.query_id, codes.vid,
             CAST(SUM(qd2.qd2) AS BIGINT) AS adc_dist
      FROM codes JOIN qd2 ON codes.m = qd2.m AND codes.code = qd2.c
      WHERE qd2.query_id <> codes.vid
      GROUP BY 1, 2
    )
    SELECT query_id, vid AS neighbor_id, CAST(rnk AS INT) AS rank, adc_dist
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY adc_dist, vid) AS rnk
      FROM adc
    )
    WHERE rnk <= 5
    """,
)
def ext_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-5 for 10 query vectors
    (operators/similarity.py:pq_index/pq_topk): 64-dim vectors split
    into M=4 sub-spaces, each sub-vector quantized to one of K=16
    centroids, queries scored against the corpus via M table lookups
    over the broadcast per-query distance tables — the memory-compressed
    ANN path that complements IVF's list pruning (a production system
    composes both: IVF prunes lists, PQ compresses the residual scan).

    Hash-checked oracle: the whole pipeline — micro-unit scaling,
    seed-cluster Lloyd update, argmin encoding, ADC sums — is pure
    INTEGER arithmetic, so codebooks, codes, distances, and ranks all
    reproduce exactly in DuckDB; the full APPROXIMATE result is
    differentially tested, not just its mechanism. Recall vs brute
    force and the exact-duplicate rank-1 property are additionally
    pytest-verified (tests/test_similarity.py)."""
    from world_cup_duckdb_spark.operators.similarity import pq_topk

    emb = load_tables(spark, sf_dir)["embeddings"]
    return pq_topk(
        emb.filter(F.col("vec_id") < 10), emb, k_neighbors=5, m=4, k=16, dims=64
    )


@register(
    "ext_semantic_dedup",
    oracle="""
    WITH v0 AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id < 300
      UNION ALL
      SELECT vec_id + 100000, CAST(embedding AS DOUBLE[])
      FROM embeddings WHERE vec_id < 300
    ),
    e AS (
      SELECT vec_id, v,
             sqrt(list_sum(list_transform(range(1, len(v) + 1),
                                          i -> v[i] * v[i]))) AS nrm
      FROM v0
    ),
    picked AS (
      SELECT vec_id AS cid FROM v0
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ),
    centroids AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY cid) AS INT) AS list_id,
             e.v AS centroid, e.nrm AS cnrm
      FROM picked JOIN e ON e.vec_id = picked.cid
    ),
    assign_scored AS (
      SELECT e.vec_id AS vid, e.v, e.nrm, c.list_id,
             list_sum(list_transform(range(1, len(c.centroid) + 1),
                                     i -> c.centroid[i] * e.v[i]))
               / (c.cnrm * e.nrm) AS c_sim
      FROM e CROSS JOIN centroids c
    ),
    assigned AS (
      SELECT vid, v, nrm, list_id FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vid ORDER BY c_sim DESC, list_id) AS rn
        FROM assign_scored
      ) WHERE rn = 1
    ),
    dropped AS (
      SELECT DISTINCT b.vid AS drop_id
      FROM assigned a JOIN assigned b
        ON a.list_id = b.list_id AND a.vid < b.vid
      WHERE list_sum(list_transform(range(1, len(a.v) + 1),
                                    i -> a.v[i] * b.v[i]))
            / (a.nrm * b.nrm) >= 0.95
    )
    SELECT list_id, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(COUNT(d.drop_id) AS BIGINT) AS n_dropped
    FROM assigned LEFT JOIN dropped d ON assigned.vid = d.drop_id
    GROUP BY list_id
    """,
)
def ext_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style cluster-pruned embedding dedup
    (operators/similarity.py:semantic_dedup_census) over a corpus ∪ an
    id-shifted copy (every vector has an exact duplicate, so the drop
    path is exercised end-to-end): coarse-cluster with the IVF
    assignment, run the quadratic cosine scan ONLY within clusters
    (self-equi-join on list_id — the candidate-bounding move that makes
    embedding dedup feasible at 100 TB, where all-pairs is not), drop
    min-id-canonically, report the per-cluster census.

    Hash-checked oracle: assignment, within-cluster cosines, and the
    drop rule are all deterministic (md5 centroid pick, sequential
    double folds), so DuckDB reproduces the census exactly. The
    duplicates-all-dropped invariant is additionally pytest-verified."""
    from world_cup_duckdb_spark.operators.similarity import (
        semantic_dedup_census,
    )

    emb = load_tables(spark, sf_dir)["embeddings"].filter(F.col("vec_id") < 300)
    copy = emb.withColumn("vec_id", F.col("vec_id") + 100000)
    return semantic_dedup_census(
        emb.unionByName(copy), threshold=0.95, n_clusters=16
    )


_KM_K = 4      # clusters
_KM_T = 3      # assignment rounds (T-1 centroid updates between them)
_KM_DIMS = 64  # fixture embedding width (FIXTURES.md)

_KM_MICRO = "list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(ROUND(x * 1000000) AS BIGINT))"


def _kmeans_oracle() -> str:
    """Unrolled Lloyd's iterations as MATERIALIZED CTEs (DuckDB inlines
    CTEs by default; the cent->assign->cent chain re-references `m`
    multiplicatively — the same exponential-inlining trap the BPE
    oracles hit in r7). Distances are exact integers: micro-unit
    components, den-scaled diffs squared in HUGEINT — so the argmin
    (ties broken by smallest centroid id) is engine-independent."""
    dist = (
        "list_sum(list_transform(range(1, {dims} + 1), d -> "
        "(CAST(e.m[d] AS HUGEINT) * c.den - c.num[d])"
        " * (CAST(e.m[d] AS HUGEINT) * c.den - c.num[d])))"
    ).format(dims=_KM_DIMS)
    parts = [
        f"m AS MATERIALIZED (SELECT vec_id, {_KM_MICRO} AS m FROM embeddings)",
        f"""cent_0 AS MATERIALIZED (
      SELECT vec_id AS cid, list_transform(m, x -> CAST(x AS HUGEINT)) AS num,
             CAST(1 AS BIGINT) AS den
      FROM m WHERE vec_id < {_KM_K})""",
    ]
    for i in range(_KM_T):
        parts.append(f"""dists_{i} AS MATERIALIZED (
      SELECT e.vec_id, c.cid, {dist} AS dist
      FROM m e CROSS JOIN cent_{i} c)""")
        parts.append(f"""amin_{i} AS MATERIALIZED (
      SELECT vec_id, MIN(dist) AS md FROM dists_{i} GROUP BY vec_id)""")
        parts.append(f"""assign_{i} AS MATERIALIZED (
      SELECT d.vec_id, CAST(MIN(d.cid) AS INT) AS cluster_id
      FROM dists_{i} d JOIN amin_{i} a
        ON d.vec_id = a.vec_id AND d.dist = a.md
      GROUP BY d.vec_id)""")
        if i < _KM_T - 1:
            parts.append(f"""sums_{i} AS MATERIALIZED (
      SELECT a.cluster_id AS cid, t.d, SUM(t.v) AS s,
             COUNT(*) AS den
      FROM assign_{i} a
      JOIN (SELECT vec_id, unnest(m) AS v, generate_subscripts(m, 1) AS d
            FROM m) t USING (vec_id)
      GROUP BY a.cluster_id, t.d)""")
            parts.append(f"""cent_{i + 1} AS MATERIALIZED (
      SELECT cid, list(CAST(s AS HUGEINT) ORDER BY d) AS num,
             CAST(MIN(den) AS BIGINT) AS den
      FROM sums_{i} GROUP BY cid)""")
    last = _KM_T - 1
    return (
        "WITH " + ",\n    ".join(parts)
        + f"\n    SELECT vec_id, cluster_id FROM assign_{last}"
    )


@register("ext_kmeans", oracle=_kmeans_oracle())
def ext_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means over the embedding corpus (k=4, 3
    assignment rounds) — the clustering step a curation pipeline runs
    before cluster-balanced sampling / SemDeDup-style pruning. Spark
    runs the textbook driver-coordinated loop: centroids live on the
    driver as EXACT integer state (per-dim micro-unit sums + member
    count — k×dims numbers, bounded regardless of corpus size) and are
    re-broadcast each round as literals, so every assignment pass is
    pure map-side work over the one persisted micro-unit relation; the
    update is one (k×dims)-row aggregate collect per round. No
    fact-sized shuffle anywhere except the update aggregates, which
    combine map-side to k×dims rows.

    EXACTNESS (what makes this oracle-checkable where float k-means is
    not): components are scaled to integer micro-units; a point-to-
    centroid comparison multiplies through by the cluster size, so
    dist = Σ_d (x_d·den − num_d)² is INTEGER arithmetic end-to-end
    (decimal(38) on the Spark side, HUGEINT in DuckDB) and the argmin —
    ties to the smallest centroid id — is bit-independent of engines,
    partitioning, and summation order. The long diff term is exact for
    clusters up to ~10^13 members (den·max|x_micro| < 2^63); beyond
    that, renormalize den. Empty clusters drop out of the next round in
    both engines (no arbitrary re-seeding).

    Scale: per round = one map-side assignment over the corpus + one
    map-side-combined aggregate down to k×dims rows; driver state is
    k×(dims+1) integers. The iteration count is the driver loop bound,
    exactly like connected_components."""
    t = load_tables(spark, sf_dir)["embeddings"]
    from world_cup_duckdb_spark.queries import tracked_persist

    emb = t.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * 1000000).cast("long"),
        ).alias("m"),
    ).transform(tracked_persist)

    # init: the k smallest vec_ids are the seeds (num = components, den=1)
    init = {
        int(r["vec_id"]): ([int(v) for v in r["m"]], 1)
        for r in emb.filter(F.col("vec_id") < _KM_K).collect()
    }
    cents = init

    def assign_expr() -> F.Column:
        choices = []
        for cid in sorted(cents):
            num, den = cents[cid]
            num_lit = F.array(*[F.lit(v).cast("long") for v in num])
            sq = F.zip_with(
                F.col("m"),
                num_lit,
                lambda x, nm: (
                    (x * F.lit(den) - nm).cast("decimal(19,0)")
                    * (x * F.lit(den) - nm).cast("decimal(19,0)")
                ),
            )
            dist = F.aggregate(
                sq,
                F.lit(0).cast("decimal(38,0)"),
                lambda acc, v: acc + v,
            )
            choices.append(
                F.struct(dist.alias("d"), F.lit(cid).alias("cid"))
            )
        # struct comparison is field-order lexicographic: min dist,
        # ties to the smallest centroid id — same rule as the oracle.
        return F.array_min(F.array(*choices))["cid"].cast("int")

    for it in range(_KM_T):
        assigned = emb.withColumn("cluster_id", assign_expr())
        if it < _KM_T - 1:
            rows = (
                assigned.select(
                    "cluster_id", F.posexplode("m").alias("d", "v")
                )
                .groupBy("cluster_id", "d")
                .agg(
                    F.sum("v").alias("s"),
                    F.count(F.lit(1)).alias("den"),
                )
                .collect()  # bounded: k×dims rows of integers
            )
            nxt: dict[int, tuple[list[int], int]] = {}
            for r in rows:
                num, _ = nxt.setdefault(
                    int(r["cluster_id"]), ([0] * _KM_DIMS, int(r["den"]))
                )
                num[int(r["d"])] = int(r["s"])
                nxt[int(r["cluster_id"])] = (num, int(r["den"]))
            cents = nxt
    return assigned.select("vec_id", "cluster_id")


@register(
    "ext_ann_ivf_persist",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_sum(list_transform(
               range(1, len(embedding) + 1),
               i -> CAST(embedding AS DOUBLE[])[i]
                    * CAST(embedding AS DOUBLE[])[i]))) AS nrm
      FROM embeddings
    ),
    picked AS (
      SELECT vec_id AS cid FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ),
    centroids AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY cid) AS INT) AS list_id,
             e.v AS centroid, e.nrm AS cnrm
      FROM picked JOIN e ON e.vec_id = picked.cid
    ),
    assign_scored AS (
      SELECT e.vec_id AS vid, c.list_id,
             list_sum(list_transform(range(1, len(c.centroid) + 1),
                                     i -> c.centroid[i] * e.v[i]))
               / (c.cnrm * e.nrm) AS c_sim
      FROM e CROSS JOIN centroids c
    ),
    assigned AS (
      SELECT vid, list_id FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vid ORDER BY c_sim DESC, list_id) AS rn
        FROM assign_scored
      ) WHERE rn = 1
    )
    SELECT list_id,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(vid) AS BIGINT) AS sum_vid
    FROM assigned GROUP BY list_id
    """,
)
def ext_ann_ivf_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index BUILD + PERSIST (operators/similarity.py:
    ivf_index_persist): assignments written hive-partitioned by list_id,
    centroids alongside — the amortized at-rest layout a 100 TB embedding
    store needs (build once, every query batch prunes to its probed
    lists). The returned per-list census (count + id-sum) is computed by
    RE-READING the persisted files, so the oracle hash-checks what
    actually landed on disk, not the pre-write plan. Round-trip
    losslessness and the pruned serve path are pinned in
    tests/test_similarity.py."""
    import os

    from world_cup_duckdb_spark.operators.similarity import ivf_index_persist
    from world_cup_duckdb_spark.queries.lifecycle import _fresh_dir

    emb = load_tables(spark, sf_dir)["embeddings"]
    loc = _fresh_dir("ivf-index")
    ivf_index_persist(emb, loc, n_lists=16)
    return (
        spark.read.parquet(os.path.join(loc, "assigned"))
        .groupBy(F.col("list_id").cast("int").alias("list_id"))
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("vid").alias("sum_vid"),
        )
    )


@register("ext_ann_ivf_query", oracle=_IVF_SQL)
def ext_ann_ivf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k SERVED FROM THE PERSISTED INDEX (operators/similarity.py:
    ivf_topk_from_index): centroids read back, probes chosen per query,
    and the assigned-corpus scan pruned to the probed lists via a literal
    partition predicate — the scan's PartitionFilters carry
    ``list_id IN (…)`` so unprobed directories cost zero I/O (plan-pinned
    in tests/test_similarity.py). Shares ext_ann_ivf's oracle verbatim:
    the serve path is bit-identical to the in-memory build (same md5
    centroid pick, same double-fold cosines), which the hash check
    proves end-to-end through a parquet round trip."""
    from world_cup_duckdb_spark.operators.similarity import (
        ivf_index_persist,
        ivf_topk_from_index,
    )
    from world_cup_duckdb_spark.queries.lifecycle import _fresh_dir

    emb = load_tables(spark, sf_dir)["embeddings"]
    loc = _fresh_dir("ivf-serve")
    ivf_index_persist(emb, loc, n_lists=16)
    return ivf_topk_from_index(
        spark, loc, emb.filter(F.col("vec_id") < 10), k=5, n_probe=4
    )


@register(
    "ext_ann_ivf_append",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_sum(list_transform(
               range(1, len(embedding) + 1),
               i -> CAST(embedding AS DOUBLE[])[i]
                    * CAST(embedding AS DOUBLE[])[i]))) AS nrm
      FROM embeddings
    ),
    picked AS (
      SELECT vec_id AS cid FROM embeddings
      WHERE vec_id % 4 <> 0
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ),
    centroids AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY cid) AS INT) AS list_id,
             e.v AS centroid, e.nrm AS cnrm
      FROM picked JOIN e ON e.vec_id = picked.cid
    ),
    assign_scored AS (
      SELECT e.vec_id AS vid, c.list_id,
             list_sum(list_transform(range(1, len(c.centroid) + 1),
                                     i -> c.centroid[i] * e.v[i]))
               / (c.cnrm * e.nrm) AS c_sim
      FROM e CROSS JOIN centroids c
    ),
    assigned AS (
      SELECT vid, list_id FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vid ORDER BY c_sim DESC, list_id) AS rn
        FROM assign_scored
      ) WHERE rn = 1
    )
    SELECT list_id,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN vid % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_appended,
           CAST(SUM(vid) AS BIGINT) AS sum_vid
    FROM assigned GROUP BY list_id
    """,
)
def ext_ann_ivf_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance (operators/similarity.py:
    ivf_index_append): build+persist on 3/4 of the corpus, then APPEND
    the held-out 1/4 — assigned against the SAVED centroids only, cost
    O(new·n_lists), no recompute of the existing index — as new files
    inside the hive-partitioned layout. The per-list census (total,
    appended-only count, id-sum) is computed by re-reading the layout,
    and the oracle recomputes the equivalent single-shot assignment of
    the FULL corpus against base-picked centroids: hash-equality proves
    build-then-append ≡ build-over-union, i.e. appends change WHAT is
    indexed, never HOW. Serve-after-append is pinned in
    tests/test_similarity.py."""
    import os

    from world_cup_duckdb_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_persist,
    )
    from world_cup_duckdb_spark.queries.lifecycle import _fresh_dir

    emb = load_tables(spark, sf_dir)["embeddings"]
    loc = _fresh_dir("ivf-append")
    ivf_index_persist(emb.filter(F.col("vec_id") % 4 != 0), loc, n_lists=16)
    ivf_index_append(spark, loc, emb.filter(F.col("vec_id") % 4 == 0))
    return (
        spark.read.parquet(os.path.join(loc, "assigned"))
        .groupBy(F.col("list_id").cast("int").alias("list_id"))
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum((F.col("vid") % 4 == 0).cast("bigint")).alias("n_appended"),
            F.sum("vid").alias("sum_vid"),
        )
    )


_IVF_DELETE_SQL = _IVF_SQL.replace(
    "WHERE p.query_id <> a.vid",
    "WHERE p.query_id <> a.vid AND a.vid % 7 <> 3",
)
assert "a.vid % 7 <> 3" in _IVF_DELETE_SQL  # replace anchor still present


@register("ext_ann_ivf_delete", oracle=_IVF_DELETE_SQL)
def ext_ann_ivf_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index DELETE lifecycle (operators/similarity.py:
    ivf_index_delete / ivf_index_compact): tombstone every vector with
    vec_id % 7 == 3 — O(delete-batch) metadata, immediately masked at
    serve time by a broadcast anti-join — then COMPACT, which rewrites
    ONLY the list partitions holding victims (their list ids were
    captured at delete time, so compaction never scans to find them)
    and clears the tombstones. Serves top-5 for the 10 query vectors
    from the compacted files.

    The oracle is ext_ann_ivf's full pipeline with the deleted vids
    removed from the CANDIDATE set only — centroids, assignments and
    probes are unchanged because deletion must not silently re-shape
    the index. The tombstone-masked serve, the compacted serve, and a
    rebuild on the surviving corpus with the same centroids are all
    bit-identical (pinned in tests/test_similarity.py, along with
    untouched partitions keeping their files byte-for-byte)."""
    from world_cup_duckdb_spark.operators.similarity import (
        ivf_index_compact,
        ivf_index_delete,
        ivf_index_persist,
        ivf_topk_from_index,
    )
    from world_cup_duckdb_spark.queries.lifecycle import _fresh_dir

    emb = load_tables(spark, sf_dir)["embeddings"]
    loc = _fresh_dir("ivf-delete")
    ivf_index_persist(emb, loc, n_lists=16)
    ivf_index_delete(spark, loc, emb.filter(F.col("vec_id") % 7 == 3))
    ivf_index_compact(spark, loc)
    return ivf_topk_from_index(
        spark, loc, emb.filter(F.col("vec_id") < 10), k=5, n_probe=4
    )


_PQ_SQL = _REG["ext_ann_pq"].oracle


@register(
    "ext_ann_pq_persist",
    oracle="""
    WITH micro AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(round(x * 1000000) AS BIGINT)) AS e
      FROM embeddings
    ),
    subs AS (
      SELECT vec_id, CAST(mm.m AS INT) AS m,
             list_slice(e, mm.m * 16 + 1, mm.m * 16 + 16) AS sub
      FROM micro CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS m) mm
    ),
    cb_dim AS (
      SELECT m,
             CAST(CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 16 AS INT) AS c,
             generate_subscripts(sub, 1) AS j, unnest(sub) AS x
      FROM subs
    ),
    cb AS (
      SELECT m, c, j,
             CAST(floor(CAST(SUM(x) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)
               AS cx
      FROM cb_dim GROUP BY m, c, j
    ),
    cent AS (SELECT m, c, list(cx ORDER BY j) AS cent FROM cb GROUP BY m, c),
    scored AS (
      SELECT s.vec_id AS vid, s.m, t.c,
             list_sum(list_transform(
               range(1, len(s.sub) + 1),
               i -> (s.sub[i] - t.cent[i]) * (s.sub[i] - t.cent[i]))) AS d2
      FROM subs s JOIN cent t ON s.m = t.m
    ),
    codes AS (
      SELECT vid, m, c AS code FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vid, m ORDER BY d2, c) AS rn
        FROM scored
      ) WHERE rn = 1
    )
    SELECT m, code,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(vid) AS BIGINT) AS sum_vid
    FROM codes GROUP BY m, code
    """,
)
def ext_ann_pq_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ index BUILD + PERSIST (operators/similarity.py:
    pq_index_persist): integer codebook + compressed codes written to
    parquet — the ~64×-smaller ANN-serving copy of the corpus. The
    returned per-(sub-space, code) census re-reads the persisted codes,
    so the oracle (the codes CTE chain of ext_ann_pq, then the census)
    hash-checks what landed on disk through the round trip — codebook
    training, argmin encoding, and the files themselves."""
    import os

    from world_cup_duckdb_spark.operators.similarity import pq_index_persist
    from world_cup_duckdb_spark.queries.lifecycle import _fresh_dir

    emb = load_tables(spark, sf_dir)["embeddings"]
    loc = _fresh_dir("pq-index")
    pq_index_persist(emb, loc, m=4, k=16, dims=64)
    return (
        spark.read.parquet(os.path.join(loc, "codes"))
        .groupBy("m", "code")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("vid").alias("sum_vid"),
        )
    )


@register("ext_ann_pq_query", oracle=_PQ_SQL)
def ext_ann_pq_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-k SERVED FROM THE PERSISTED PQ INDEX (operators/
    similarity.py:pq_topk_from_index): the corpus-side scan on the serve
    path reads ONLY the compressed codes parquet — never raw embeddings
    — and the read-back codebook broadcasts to price each query's
    distance tables. Shares ext_ann_pq's oracle verbatim: integer
    arithmetic end-to-end means the serve path is bit-identical to the
    in-memory build through the parquet round trip."""
    from world_cup_duckdb_spark.operators.similarity import (
        pq_index_persist,
        pq_topk_from_index,
    )
    from world_cup_duckdb_spark.queries.lifecycle import _fresh_dir

    emb = load_tables(spark, sf_dir)["embeddings"]
    loc = _fresh_dir("pq-serve")
    pq_index_persist(emb, loc, m=4, k=16, dims=64)
    return pq_topk_from_index(
        spark, loc, emb.filter(F.col("vec_id") < 10), k_neighbors=5, m=4, dims=64
    )


def _plane_sweep_oracle() -> str:
    """Per-plane-count LSH recall vs brute force: one lsh pipeline CTE
    per plane count (2/4/6/8) sharing the e/bf CTEs, stacked and
    graded. Mechanical unroll of the ext_ann_recall shape over the
    tuning grid."""
    arms = []
    for p in (2, 4, 6, 8):
        arms.append(f"""
    sigs{p} AS (
      SELECT vec_id, v, nrm, CAST({_sign_lsh_sql(p)} AS INT) AS bucket
      FROM e
    ),
    lsh{p} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_sum(list_transform(range(1, len(q.v) + 1),
                                                  i -> q.v[i] * c.v[i]))
                          / (q.nrm * c.nrm) DESC, c.vec_id) AS rnk
        FROM sigs{p} q JOIN sigs{p} c ON q.bucket = c.bucket
        WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
      ) WHERE rnk <= 5
    )""")
    unions = "\n      UNION ALL\n".join(
        f"      SELECT {p} AS num_planes, query_id, neighbor_id FROM lsh{p}"
        for p in (2, 4, 6, 8)
    )
    return f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_sum(list_transform(
               range(1, len(embedding) + 1),
               i -> CAST(embedding AS DOUBLE[])[i]
                    * CAST(embedding AS DOUBLE[])[i]))) AS nrm
      FROM embeddings
    ),
    {",".join(arms)},
    bf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_sum(list_transform(range(1, len(q.v) + 1),
                                                  i -> q.v[i] * c.v[i]))
                          / (q.nrm * c.nrm) DESC, c.vec_id) AS rnk
        FROM e q CROSS JOIN e c
        WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
      ) WHERE rnk <= 5
    ),
    approx AS (
{unions}
    ),
    base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_base FROM bf),
    hits AS (
      SELECT num_planes, CAST(COUNT(*) AS BIGINT) AS hits
      FROM approx JOIN bf USING (query_id, neighbor_id)
      GROUP BY num_planes
    ),
    grid AS (SELECT unnest([2, 4, 6, 8]) AS num_planes)
    SELECT CAST(g.num_planes AS INT) AS num_planes,
           COALESCE(h.hits, 0) AS hits, n_base,
           CAST(COALESCE(h.hits, 0) AS DOUBLE) / CAST(n_base AS DOUBLE)
             AS recall_at_5
    FROM grid g LEFT JOIN hits h ON h.num_planes = g.num_planes
    CROSS JOIN base
    """


@register("ext_ann_plane_sweep", oracle=_plane_sweep_oracle())
def ext_ann_plane_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH index-tuning curve — the ANN analog of the dedup threshold
    sweep: recall@5 vs brute force for hyperplane counts 2/4/6/8. More
    planes → smaller buckets → cheaper re-scoring but lower recall; this
    table is what picks num_planes before building the persisted index
    (ext_ann_lsh_persist) on a real corpus.

    Scale: each arm is the standard bucketed pipeline (signature
    map-side, candidate equi-join on bucket); the sweep multiplies the
    QUERY-side cost by the grid size, never the corpus-side signature
    passes beyond one per config — at 100 TB the same sweep runs on a
    sampled corpus slice, a documented estimator pattern. Determinism:
    md5 hyperplanes and sequential folds make every arm's approximate
    result — and therefore the recall itself — exactly reproducible;
    hits/n_base are exact integers with one divide."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    q = emb.filter(F.col("vec_id") < 10)
    bf = brute_force_topk(q, emb, k=5).select("query_id", "neighbor_id")
    approx = None
    for p in (2, 4, 6, 8):
        arm = (
            lsh_topk(q, emb, k=5, num_planes=p)
            .select("query_id", "neighbor_id")
            .withColumn("num_planes", F.lit(p))
        )
        approx = arm if approx is None else approx.unionByName(arm)
    base = bf.agg(F.count(F.lit(1)).cast("bigint").alias("n_base"))
    hits = (
        approx.join(bf, ["query_id", "neighbor_id"])
        .groupBy("num_planes")
        .agg(F.count(F.lit(1)).cast("bigint").alias("hits"))
    )
    # grid left-join: a plane count whose recall is ZERO must still emit
    # its row — a hole in the tuning curve reads as "not measured"
    grid = spark.createDataFrame([(2,), (4,), (6,), (8,)], "num_planes int")
    return (
        grid.join(hits, "num_planes", "left")
        .crossJoin(F.broadcast(base))
        .select(
            F.col("num_planes").cast("int").alias("num_planes"),
            F.coalesce(F.col("hits"), F.lit(0).cast("bigint")).alias("hits"),
            "n_base",
            (
                F.coalesce(F.col("hits"), F.lit(0).cast("bigint")).cast(
                    "double"
                )
                / F.col("n_base").cast("double")
            ).alias("recall_at_5"),
        )
    )


@register(
    "ext_embedding_drift",
    oracle="""
    WITH vals AS (
      SELECT CAST(vec_id % 2 AS INT) AS pop, u.i AS dim, u.v
      FROM (
        SELECT vec_id,
               unnest(list_transform(
                 range(1, len(embedding) + 1),
                 i -> struct_pack(
                   i := CAST(i AS INT),
                   v := CAST(round(CAST(embedding AS DOUBLE[])[i] * 1000000)
                             AS BIGINT)))) AS u
        FROM embeddings
      )
    ),
    per_dim AS (
      SELECT dim,
             CAST(SUM(CASE WHEN pop = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN pop = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN pop = 0 THEN v ELSE 0 END) AS BIGINT) AS s_a,
             CAST(SUM(CASE WHEN pop = 1 THEN v ELSE 0 END) AS BIGINT) AS s_b
      FROM vals GROUP BY dim
    ),
    scored AS (
      SELECT dim, n_a, n_b,
             CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a_micro,
             CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b_micro,
             ABS(CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                 - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)) AS drift_micro
      FROM per_dim
    )
    SELECT CAST(dim AS INT) AS dim, n_a, n_b, mean_a_micro, mean_b_micro,
           drift_micro
    FROM scored
    ORDER BY drift_micro DESC, dim LIMIT 10
    """,
)
def ext_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor: split the vector population into
    two cohorts (even/odd vec_id here; production uses time or model
    version) and report the 10 dimensions whose cohort means diverge
    most — the per-dimension check that catches a silently retrained or
    mis-normalized encoder before it poisons ANN indexes and dedup
    thresholds downstream. Values live in the PQ family's exact
    micro-unit integer space (round(x·1e6)), so cohort sums are exact
    int64 and each mean is ONE IEEE divide.

    Scale: one posexplode pass feeding a |dims|-key hash aggregate
    (map-side partials; dims is a constant of the model, never
    corpus-sized), then a top-10 TakeOrderedAndProject over the bounded
    per-dim relation. Determinism: integers until two divides, one
    subtract, one abs, in fixed order; ties (drift DESC, dim)."""
    from world_cup_duckdb_spark.operators.similarity import _micro_units

    emb = load_tables(spark, sf_dir)["embeddings"]
    vals = emb.select(
        (F.col("vec_id") % 2).cast("int").alias("pop"),
        F.posexplode(_micro_units("embedding")).alias("dim0", "v"),
    ).select("pop", (F.col("dim0") + 1).alias("dim"), "v")
    per_dim = vals.groupBy("dim").agg(
        F.count_if(F.col("pop") == 0).cast("bigint").alias("n_a"),
        F.count_if(F.col("pop") == 1).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("pop") == 0, F.col("v")).otherwise(0))
        .cast("bigint")
        .alias("s_a"),
        F.sum(F.when(F.col("pop") == 1, F.col("v")).otherwise(0))
        .cast("bigint")
        .alias("s_b"),
    )
    mean_a = F.col("s_a").cast("double") / F.col("n_a").cast("double")
    mean_b = F.col("s_b").cast("double") / F.col("n_b").cast("double")
    scored = per_dim.select(
        F.col("dim").cast("int").alias("dim"),
        "n_a",
        "n_b",
        mean_a.alias("mean_a_micro"),
        mean_b.alias("mean_b_micro"),
        F.abs(mean_a - mean_b).alias("drift_micro"),
    )
    return scored.orderBy(F.desc("drift_micro"), F.asc("dim")).limit(10)
