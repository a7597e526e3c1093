"""Retrieval & curation batch (EXTENSION): hybrid lexical+semantic
retrieval with reciprocal-rank fusion, contrastive hard-negative mining,
and a KMV-sketch source-overlap matrix.

These are the retrieval-side companions to the dedup/ANN families: RRF
is how a training-data search stack actually combines BM25-style and
embedding arms (Cormack et al., SIGIR 2009 — rank-only fusion, no score
calibration needed); hard negatives are what contrastive embedding
training mines from a corpus; the KMV overlap matrix is the sketch-sized
answer to "how much do two crawl sources overlap?" that the exact
token-cosine matrix (ext_source_similarity) answers at vocabulary cost.

Scale shape: every query-side relation is bounded by contract
(broadcast); corpus passes are single-scan map-side reductions; the
overlap matrix's downstream cost is |sources|²·k rows — independent of
corpus size, which is the entire point of sketching.

Determinism: ranks are integers with total tie-breaks; RRF scores are
sums of exactly two IEEE divides in fixed written order; KMV uses
md5-hex ordering (binary collation in both engines); all counts are
exact integers until a final divide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from world_cup_duckdb_spark.operators.similarity import (
    brute_force_topk,
    hard_negative_topk,
)
from world_cup_duckdb_spark.queries import register, tracked_persist
from world_cup_duckdb_spark.sources.catalog import load_tables

_N_QUERIES = 8  # bounded query set: doc_id/vec_id < 8
_ARM_K = 20  # per-arm candidate depth
_RRF_K = 60  # standard RRF dampening constant (Cormack et al.)
_FUSED_K = 5  # fused results returned per query
_KMV_K = 128  # per-source signature size


@register(
    "ext_hybrid_rrf",
    oracle=f"""
    WITH qt AS (
      SELECT DISTINCT doc_id AS query_id, t AS token
      FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
            FROM documents WHERE doc_id < {_N_QUERIES})
      WHERE t <> ''
    ),
    ct AS (
      SELECT doc_id, t AS token
      FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
            FROM documents)
      WHERE t <> ''
    ),
    lexcnt AS (
      SELECT q.query_id, c.doc_id AS neighbor_id,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM qt q JOIN ct c USING (token)
      WHERE c.doc_id <> q.query_id
      GROUP BY 1, 2
    ),
    lex AS (
      SELECT query_id, neighbor_id, CAST(rnk AS INT) AS lex_rank
      FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY query_id
              ORDER BY n_shared DESC, neighbor_id) AS rnk
            FROM lexcnt)
      WHERE rnk <= {_ARM_K}
    ),
    qv AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v,
                  sqrt(list_sum(list_transform(
                    range(1, len(embedding) + 1),
                    i -> CAST(embedding AS DOUBLE[])[i]
                         * CAST(embedding AS DOUBLE[])[i]))) AS nrm
           FROM embeddings WHERE vec_id < {_N_QUERIES}),
    cv AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS v,
                  sqrt(list_sum(list_transform(
                    range(1, len(embedding) + 1),
                    i -> CAST(embedding AS DOUBLE[])[i]
                         * CAST(embedding AS DOUBLE[])[i]))) AS nrm
          FROM embeddings),
    sem AS (
      SELECT query_id, neighbor_id, CAST(rnk AS INT) AS sem_rank
      FROM (
        SELECT q.query_id, c.neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_sum(list_transform(range(1, len(q.v) + 1),
                                                  i -> q.v[i] * c.v[i]))
                          / (q.nrm * c.nrm) DESC,
                          c.neighbor_id) AS rnk
        FROM qv q CROSS JOIN cv c
        WHERE q.query_id <> c.neighbor_id
      )
      WHERE rnk <= {_ARM_K}
    ),
    fused AS (
      SELECT query_id, neighbor_id, lex_rank, sem_rank,
             COALESCE(CAST(1 AS DOUBLE) / ({_RRF_K} + lex_rank),
                      CAST(0 AS DOUBLE))
             + COALESCE(CAST(1 AS DOUBLE) / ({_RRF_K} + sem_rank),
                        CAST(0 AS DOUBLE)) AS rrf_score
      FROM lex FULL JOIN sem USING (query_id, neighbor_id)
    )
    SELECT query_id, neighbor_id, lex_rank, sem_rank, rrf_score,
           CAST(rnk AS INT) AS fused_rank
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY rrf_score DESC, neighbor_id) AS rnk
          FROM fused)
    WHERE rnk <= {_FUSED_K}
    """,
)
def ext_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion: a lexical arm
    (distinct-token overlap against an inverted index — the set-overlap
    core of BM25 candidate generation) and a semantic arm (exact cosine
    top-k over embeddings) each rank {_ARM_K} candidates per query;
    RRF fuses them rank-only — score = Σ 1/(60+rank) over the arms a
    candidate appears in — and the top {_FUSED_K} fused results ship.
    This is the standard first stage of a RAG / training-data search
    stack (rank fusion needs no cross-arm score calibration).

    Scale: the query side is bounded by contract on BOTH arms and rides
    a broadcast; the corpus is touched exactly twice, each a single
    scan — the token arm dedups tokens IN-ROW (array_distinct before
    explode: no corpus-grain distinct shuffle) and reduces via one
    (query, doc) count aggregate; the vector arm is brute_force_topk
    (per-partition scoring, rank window sees |Q|·|C| scored rows only
    through the window's own partial top-k). The fusion join is
    |Q|·{_ARM_K} vs |Q|·{_ARM_K} — trivial at any corpus size. A
    production form drops high-document-frequency tokens from the
    inverted index (stopword pruning) to bound posting lists; at this
    fixture scale every token participates so the oracle can mirror
    exactly.

    Determinism: arm ranks are integer-tie-broken by neighbor_id; the
    RRF score is lex-term + sem-term in fixed order (each one IEEE
    divide of exact ints); fused rank tie-breaks (score DESC,
    neighbor_id)."""
    return _rrf_fused(spark, sf_dir, _FUSED_K)


def _rrf_fused(spark: SparkSession, sf_dir: str, fused_k: int) -> DataFrame:
    """Shared RRF core: lexical + semantic arms fused rank-only, top
    ``fused_k`` per query. ext_hybrid_rrf serves it directly (k=5);
    ext_retrieval_pipeline re-ranks its k=10 pool with MMR."""
    d = load_tables(spark, sf_dir)["documents"]
    emb = load_tables(spark, sf_dir)["embeddings"]

    # Lexical arm: in-row token dedup, then one inverted-index join.
    toks = F.explode(F.array_distinct(F.split("text", " "))).alias("token")
    qt = (
        d.filter(F.col("doc_id") < _N_QUERIES)
        .select(F.col("doc_id").alias("query_id"), toks)
        .filter(F.col("token") != "")
    )
    ct = d.select("doc_id", toks).filter(F.col("token") != "")
    lexcnt = (
        ct.join(F.broadcast(qt), "token")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", F.col("doc_id").alias("neighbor_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    w_lex = Window.partitionBy("query_id").orderBy(
        F.desc("n_shared"), F.asc("neighbor_id")
    )
    lex = (
        lexcnt.withColumn("lex_rank", F.row_number().over(w_lex).cast("int"))
        .filter(F.col("lex_rank") <= _ARM_K)
        .select("query_id", "neighbor_id", "lex_rank")
    )

    # Semantic arm: exact cosine top-k (broadcast queries, corpus streams).
    sem = brute_force_topk(
        emb.filter(F.col("vec_id") < _N_QUERIES), emb, k=_ARM_K
    ).select("query_id", "neighbor_id", F.col("rank").alias("sem_rank"))

    fused = lex.join(sem, ["query_id", "neighbor_id"], "full").withColumn(
        "rrf_score",
        F.coalesce(
            F.lit(1).cast("double") / (F.lit(_RRF_K) + F.col("lex_rank")),
            F.lit(0).cast("double"),
        )
        + F.coalesce(
            F.lit(1).cast("double") / (F.lit(_RRF_K) + F.col("sem_rank")),
            F.lit(0).cast("double"),
        ),
    )
    w_fused = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("neighbor_id")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w_fused).cast("int"))
        .filter(F.col("fused_rank") <= fused_k)
        .select(
            "query_id",
            "neighbor_id",
            "lex_rank",
            "sem_rank",
            "rrf_score",
            "fused_rank",
        )
    )


@register(
    "ext_hard_negatives",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, label AS query_label,
                      CAST(embedding AS DOUBLE[]) AS qv,
                      sqrt(list_sum(list_transform(
                        range(1, len(embedding) + 1),
                        i -> CAST(embedding AS DOUBLE[])[i]
                             * CAST(embedding AS DOUBLE[])[i]))) AS qn
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, label AS neighbor_label,
                 CAST(embedding AS DOUBLE[]) AS cv,
                 sqrt(list_sum(list_transform(
                   range(1, len(embedding) + 1),
                   i -> CAST(embedding AS DOUBLE[])[i]
                        * CAST(embedding AS DOUBLE[])[i]))) AS cn
          FROM embeddings),
    scored AS (
      SELECT query_id, query_label, neighbor_id, neighbor_label,
             list_sum(list_transform(range(1, len(qv) + 1),
                                     i -> qv[i] * cv[i])) / (qn * cn)
               AS cos_sim
      FROM q CROSS JOIN c
      WHERE neighbor_label <> query_label
    )
    SELECT query_id, query_label, neighbor_id, neighbor_label,
           CAST(rnk AS INT) AS rank, cos_sim
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM scored
    )
    WHERE rnk <= 5
    """,
)
def ext_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining: for 10 anchor vectors, the 5
    most cosine-similar corpus vectors carrying a DIFFERENT label — the
    near-boundary negatives a contrastive embedding trainer samples
    (random in-batch negatives are too easy to carry gradient signal).
    Label-mismatch is filtered BEFORE scoring inside the broadcast
    nested-loop join (operators/similarity.py:hard_negative_topk)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return hard_negative_topk(emb.filter(F.col("vec_id") < 10), emb, k=5)


@register(
    "ext_source_overlap_kmv",
    oracle=f"""
    WITH sig AS (
      SELECT source, h
      FROM (
        SELECT source, h, ROW_NUMBER() OVER (
                 PARTITION BY source ORDER BY h) AS rn
        FROM (SELECT DISTINCT source, md5(t) AS h
              FROM (SELECT source,
                           unnest(list_distinct(string_split(text, ' '))) AS t
                    FROM documents)
              WHERE t <> '')
      ) WHERE rn <= {_KMV_K}
    ),
    p AS (
      SELECT a.source AS source_a, b.source AS source_b
      FROM (SELECT DISTINCT source FROM sig) a
      JOIN (SELECT DISTINCT source FROM sig) b ON a.source < b.source
    ),
    u AS (
      SELECT source_a, source_b, h,
             MAX(in_a) AS in_a, MAX(in_b) AS in_b
      FROM (
        SELECT p.source_a, p.source_b, s.h, 1 AS in_a, 0 AS in_b
        FROM p JOIN sig s ON s.source = p.source_a
        UNION ALL
        SELECT p.source_a, p.source_b, s.h, 0, 1
        FROM p JOIN sig s ON s.source = p.source_b
      ) GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY source_a, source_b ORDER BY h) AS rn
      FROM u
    )
    SELECT source_a, source_b,
           CAST(COUNT(*) AS BIGINT) AS n_union_k,
           CAST(SUM(in_a * in_b) AS BIGINT) AS n_intersect,
           CAST(SUM(in_a * in_b) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS jaccard_est
    FROM ranked WHERE rn <= {_KMV_K}
    GROUP BY 1, 2
    """,
)
def ext_source_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap (Jaccard) estimation from KMV sketches:
    each source keeps the {_KMV_K} lexicographically-smallest md5 hashes
    of its distinct tokens; for a pair, the k smallest hashes of the
    signature UNION are examined and the fraction present in BOTH
    signatures estimates J(A,B) (Beyer et al., SIGMOD 2007). This is the
    sketch-sized answer to "how much do two crawl sources overlap" — the
    exact cosine matrix (ext_source_similarity) costs a vocabulary
    self-join; this costs |sources|²·k rows downstream of ONE corpus
    pass, independent of corpus size.

    Scale: token dedup is in-row (array_distinct before explode), the
    (source, hash) vocabulary reduce is the single corpus-grain shuffle,
    and the per-source bottom-k window runs on vocabulary-sized input
    (at extreme vocabularies, swap in a two-phase bottom-k: per-partition
    slice, then the same window on |sources|·k·partitions rows). All
    pair arithmetic is on ≤ 2k-row relations per pair.

    Determinism: md5-hex ordering is binary collation in both engines;
    distinct hashes make every rank total; the only float op is the
    final count/count divide."""
    d = load_tables(spark, sf_dir)["documents"]
    toks = F.explode(F.array_distinct(F.split("text", " "))).alias("t")
    sig_full = (
        d.select("source", toks)
        .filter(F.col("t") != "")
        .select("source", F.md5("t").alias("h"))
        .distinct()
    )
    w_sig = Window.partitionBy("source").orderBy(F.asc("h"))
    sig = (
        sig_full.withColumn("rn", F.row_number().over(w_sig))
        .filter(F.col("rn") <= _KMV_K)
        .select("source", "h")
        .transform(tracked_persist)
    )
    srcs = sig.select("source").distinct()
    p = (
        srcs.select(F.col("source").alias("source_a"))
        .crossJoin(F.broadcast(srcs.select(F.col("source").alias("source_b"))))
        .filter(F.col("source_a") < F.col("source_b"))
    )
    ea = p.join(
        F.broadcast(sig), F.col("source") == F.col("source_a")
    ).select("source_a", "source_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    eb = p.join(
        F.broadcast(sig), F.col("source") == F.col("source_b")
    ).select("source_a", "source_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    u = (
        ea.unionByName(eb)
        .groupBy("source_a", "source_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w_pair = Window.partitionBy("source_a", "source_b").orderBy(F.asc("h"))
    return (
        u.withColumn("rn", F.row_number().over(w_pair))
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_union_k"),
            F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("n_intersect"),
            (
                F.sum(F.col("in_a") * F.col("in_b")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("jaccard_est"),
        )
    )


# DCG gain table 1/log2(rank+1) for ranks 1..{_ARM_K}, computed ONCE in
# Python and embedded as the SAME decimal literals in both the Spark
# plan and the DuckDB oracle. This sidesteps cross-engine libm: Spark's
# log2 is Math.log(x)/Math.log(2) while DuckDB's is std::log2 — they can
# disagree by an ulp, but two engines parsing one literal cannot.
import math as _math

_GAIN = [1.0 / _math.log2(r + 1) for r in range(1, _ARM_K + 1)]
_IDCG_PREFIX = []
_acc = 0.0
for _g in _GAIN:
    _acc = _acc + _g
    _IDCG_PREFIX.append(_acc)
_GAIN_SQL = "[" + ", ".join(f"CAST('{g!r}' AS DOUBLE)" for g in _GAIN) + "]"
_IDCG_SQL = "[" + ", ".join(f"CAST('{g!r}' AS DOUBLE)" for g in _IDCG_PREFIX) + "]"
_TRUTH_K = 5  # ground-truth depth (semantic top-k judged "relevant")


@register(
    "ext_retrieval_metrics",
    oracle=f"""
    WITH qt AS (
      SELECT DISTINCT doc_id AS query_id, t AS token
      FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
            FROM documents WHERE doc_id < {_N_QUERIES})
      WHERE t <> ''
    ),
    ct AS (
      SELECT doc_id, t AS token
      FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
            FROM documents)
      WHERE t <> ''
    ),
    lexcnt AS (
      SELECT q.query_id, c.doc_id AS neighbor_id,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM qt q JOIN ct c USING (token)
      WHERE c.doc_id <> q.query_id
      GROUP BY 1, 2
    ),
    lex AS (
      SELECT query_id, neighbor_id, CAST(rnk AS INT) AS lex_rank
      FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY query_id
              ORDER BY n_shared DESC, neighbor_id) AS rnk
            FROM lexcnt)
      WHERE rnk <= {_ARM_K}
    ),
    qv AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v,
                  sqrt(list_sum(list_transform(
                    range(1, len(embedding) + 1),
                    i -> CAST(embedding AS DOUBLE[])[i]
                         * CAST(embedding AS DOUBLE[])[i]))) AS nrm
           FROM embeddings WHERE vec_id < {_N_QUERIES}),
    cv AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS v,
                  sqrt(list_sum(list_transform(
                    range(1, len(embedding) + 1),
                    i -> CAST(embedding AS DOUBLE[])[i]
                         * CAST(embedding AS DOUBLE[])[i]))) AS nrm
          FROM embeddings),
    truth AS (
      SELECT query_id, neighbor_id
      FROM (
        SELECT q.query_id, c.neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_sum(list_transform(range(1, len(q.v) + 1),
                                                  i -> q.v[i] * c.v[i]))
                          / (q.nrm * c.nrm) DESC,
                          c.neighbor_id) AS rnk
        FROM qv q CROSS JOIN cv c
        WHERE q.query_id <> c.neighbor_id
      )
      WHERE rnk <= {_TRUTH_K}
    ),
    nrel AS (
      SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel
      FROM truth GROUP BY 1
    ),
    hits AS (
      SELECT t.query_id, list_sort(list(l.lex_rank)) AS ranks
      FROM truth t JOIN lex l
        ON l.query_id = t.query_id AND l.neighbor_id = t.neighbor_id
      GROUP BY 1
    ),
    per_q AS (
      SELECT n.query_id, n.n_rel,
             COALESCE(h.ranks, []) AS ranks
      FROM nrel n LEFT JOIN hits h ON h.query_id = n.query_id
    )
    SELECT query_id, n_rel,
           CAST(len(ranks) AS BIGINT) AS n_hit,
           CAST(ranks[1] AS INT) AS first_hit_rank,
           CAST(len(ranks) AS DOUBLE) / CAST(n_rel AS DOUBLE) AS recall_at_k,
           CASE WHEN len(ranks) = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(1 AS DOUBLE) / ranks[1] END AS mrr,
           CASE WHEN len(ranks) = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(list_reduce(
                       list_transform(ranks, r -> ({_GAIN_SQL})[r]),
                       (x, y) -> x + y) AS DOUBLE) END AS dcg,
           ({_IDCG_SQL})[n_rel] AS idcg,
           CASE WHEN len(ranks) = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(list_reduce(
                       list_transform(ranks, r -> ({_GAIN_SQL})[r]),
                       (x, y) -> x + y) AS DOUBLE) END
             / ({_IDCG_SQL})[n_rel] AS ndcg
    FROM per_q
    """,
)
def ext_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation: judge the LEXICAL arm (token-overlap
    top-{_ARM_K}, the BM25-candidate stage of ext_hybrid_rrf) against the
    SEMANTIC arm's exact cosine top-{_TRUTH_K} as ground truth, per query:
    recall@k, MRR (reciprocal rank of the first relevant hit), and
    nDCG@k — the standard offline eval triple for a retrieval stack
    (how well does the cheap lexical stage surface what the expensive
    semantic stage would).

    Scale: both arms are the bounded-query-side primitives (broadcast
    queries, single corpus scans); everything after the arms runs on
    |Q|·k rows. The judged join is truth(|Q|·{_TRUTH_K}) vs
    lex(|Q|·{_ARM_K}).

    Determinism: the DCG gain table 1/log2(rank+1) is computed ONCE in
    Python and embedded as the same decimal literals in the Spark plan
    and the oracle (cross-engine libm log2 can differ by an ulp; a
    shared literal cannot); per-query gains fold in ascending-rank
    order on both sides, with Spark's 0.0-seeded fold exactly equal to
    DuckDB's unseeded first-element fold because 0.0 + g == g. IDCG is
    a literal prefix-sum lookup, and MRR/recall are single divides of
    exact integers."""
    d = load_tables(spark, sf_dir)["documents"]
    emb = load_tables(spark, sf_dir)["embeddings"]

    toks = F.explode(F.array_distinct(F.split("text", " "))).alias("token")
    qt = (
        d.filter(F.col("doc_id") < _N_QUERIES)
        .select(F.col("doc_id").alias("query_id"), toks)
        .filter(F.col("token") != "")
    )
    ct = d.select("doc_id", toks).filter(F.col("token") != "")
    lexcnt = (
        ct.join(F.broadcast(qt), "token")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", F.col("doc_id").alias("neighbor_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    w_lex = Window.partitionBy("query_id").orderBy(
        F.desc("n_shared"), F.asc("neighbor_id")
    )
    lex = (
        lexcnt.withColumn("lex_rank", F.row_number().over(w_lex).cast("int"))
        .filter(F.col("lex_rank") <= _ARM_K)
        .select("query_id", "neighbor_id", "lex_rank")
    )
    truth = brute_force_topk(
        emb.filter(F.col("vec_id") < _N_QUERIES), emb, k=_TRUTH_K
    ).select("query_id", "neighbor_id")

    nrel = truth.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rel")
    )
    hits = (
        truth.join(lex, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.sort_array(F.collect_list("lex_rank")).alias("ranks"))
    )
    gain_arr = F.array(*[F.lit(g).cast("double") for g in _GAIN])
    idcg_arr = F.array(*[F.lit(g).cast("double") for g in _IDCG_PREFIX])
    per_q = nrel.join(hits, "query_id", "left").select(
        "query_id",
        "n_rel",
        F.coalesce(F.col("ranks"), F.array().cast("array<int>")).alias("ranks"),
    )
    dcg = F.aggregate(
        "ranks",
        F.lit(0.0).cast("double"),
        lambda acc, r: acc + F.element_at(gain_arr, r),
    )
    return per_q.select(
        "query_id",
        "n_rel",
        F.size("ranks").cast("bigint").alias("n_hit"),
        F.try_element_at("ranks", F.lit(1)).cast("int").alias(
            "first_hit_rank"
        ),
        (F.size("ranks").cast("double") / F.col("n_rel").cast("double")).alias(
            "recall_at_k"
        ),
        F.when(F.size("ranks") == 0, F.lit(0.0).cast("double"))
        .otherwise(
            F.lit(1.0).cast("double") / F.try_element_at("ranks", F.lit(1))
        )
        .alias("mrr"),
        dcg.alias("dcg"),
        F.element_at(idcg_arr, F.col("n_rel").cast("int")).alias("idcg"),
        (dcg / F.element_at(idcg_arr, F.col("n_rel").cast("int"))).alias("ndcg"),
    )


_MMR_K = 10  # candidate pool per query (semantic top-k)
_MMR_SELECT = 3  # diversified results returned
_MMR_LAMBDA = 0.7  # relevance/diversity trade-off


def _mmr_oracle() -> str:
    """Greedy MMR as unrolled SQL CTEs: candidate pool -> pairwise sims
    -> three selection steps, each picking argmax(lambda*rel -
    (1-lambda)*max-sim-to-selected) with a (score DESC, neighbor_id)
    tie-break. Unrolled because the selection depth is a fixed constant
    of the query, not data-dependent."""
    lam = "CAST('0.7' AS DOUBLE)"
    one_m_lam = "CAST('0.3' AS DOUBLE)"
    return f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_sum(list_transform(
               range(1, len(embedding) + 1),
               i -> CAST(embedding AS DOUBLE[])[i]
                    * CAST(embedding AS DOUBLE[])[i]))) AS nrm
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm
          FROM e WHERE vec_id < {_N_QUERIES}),
    cand AS (
      SELECT query_id, neighbor_id, rel FROM (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               list_sum(list_transform(range(1, len(q.qv) + 1),
                                       i -> q.qv[i] * c.v[i]))
                 / (q.qnrm * c.nrm) AS rel,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_sum(list_transform(range(1, len(q.qv) + 1),
                                                  i -> q.qv[i] * c.v[i]))
                          / (q.qnrm * c.nrm) DESC, c.vec_id) AS rnk
        FROM q CROSS JOIN e c
        WHERE q.query_id <> c.vec_id
      ) WHERE rnk <= {_MMR_K}
    ),
    psim AS (
      SELECT a.query_id, a.neighbor_id AS id_a, b.neighbor_id AS id_b,
             list_sum(list_transform(range(1, len(ea.v) + 1),
                                     i -> ea.v[i] * eb.v[i]))
               / (ea.nrm * eb.nrm) AS sim
      FROM cand a
      JOIN cand b ON a.query_id = b.query_id
                 AND a.neighbor_id <> b.neighbor_id
      JOIN e ea ON ea.vec_id = a.neighbor_id
      JOIN e eb ON eb.vec_id = b.neighbor_id
    ),
    s1 AS (
      SELECT query_id, neighbor_id, rel, rel AS mmr FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY rel DESC, neighbor_id) AS rn
        FROM cand
      ) WHERE rn = 1
    ),
    r2 AS (
      SELECT c.query_id, c.neighbor_id, c.rel,
             {lam} * c.rel - {one_m_lam} * MAX(p.sim) AS mmr
      FROM cand c
      JOIN s1 ON s1.query_id = c.query_id
             AND c.neighbor_id <> s1.neighbor_id
      JOIN psim p ON p.query_id = c.query_id
                 AND p.id_a = c.neighbor_id AND p.id_b = s1.neighbor_id
      GROUP BY c.query_id, c.neighbor_id, c.rel
    ),
    s2 AS (
      SELECT query_id, neighbor_id, rel, mmr FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY mmr DESC, neighbor_id) AS rn
        FROM r2
      ) WHERE rn = 1
    ),
    r3 AS (
      SELECT c.query_id, c.neighbor_id, c.rel,
             {lam} * c.rel - {one_m_lam} * MAX(p.sim) AS mmr
      FROM cand c
      JOIN s1 ON s1.query_id = c.query_id
             AND c.neighbor_id <> s1.neighbor_id
      JOIN s2 ON s2.query_id = c.query_id
             AND c.neighbor_id <> s2.neighbor_id
      JOIN psim p ON p.query_id = c.query_id AND p.id_a = c.neighbor_id
                 AND p.id_b IN (s1.neighbor_id, s2.neighbor_id)
      GROUP BY c.query_id, c.neighbor_id, c.rel
    ),
    s3 AS (
      SELECT query_id, neighbor_id, rel, mmr FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY mmr DESC, neighbor_id) AS rn
        FROM r3
      ) WHERE rn = 1
    )
    SELECT query_id, neighbor_id, CAST(1 AS INT) AS mmr_rank, rel, mmr FROM s1
    UNION ALL
    SELECT query_id, neighbor_id, CAST(2 AS INT), rel, mmr FROM s2
    UNION ALL
    SELECT query_id, neighbor_id, CAST(3 AS INT), rel, mmr FROM s3
    """


@register("ext_mmr_diversify", oracle=_mmr_oracle())
def ext_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998) — the diversification stage after candidate retrieval:
    from each query's exact-cosine top-{_MMR_K} pool, greedily select
    {_MMR_SELECT} results maximizing lambda*relevance -
    (1-lambda)*max-similarity-to-already-selected (lambda=0.7), so the
    final slate is relevant but not redundant — what a RAG stack runs
    between retrieval and the context window.

    Scale shape: the corpus is touched ONLY by the initial top-k
    (broadcast-query brute force here; the LSH/IVF serve paths at
    scale); candidate vectors are recovered by broadcasting the bounded
    candidate list INTO the embeddings scan (map-side semi-join), and
    the greedy selection is ONE applyInPandas exchange keyed by
    query_id — |Q|*{_MMR_K} rows, each group a {_MMR_K}-row in-memory
    greedy, scaling linearly with the query batch. (An earlier unrolled
    join/window form was plan-correct but paid ~10 stage launches for
    the same 80 rows — the grouped Arrow form is both faster locally
    and the right 100 TB shape.)

    Determinism: relevance scores come from the JVM-side fold pipeline
    unchanged; in-group pair cosines accumulate dimension 0..d-1 —
    exactly the sequential fold's (and DuckDB list_sum's) order, the
    brute_force_topk_np parity pattern — so every double matches the
    unrolled-SQL oracle bit-for-bit; the greedy tie-breaks (score DESC,
    neighbor_id ASC)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    cand = brute_force_topk(
        emb.filter(F.col("vec_id") < _N_QUERIES), emb, k=_MMR_K
    ).select("query_id", "neighbor_id", F.col("cos_sim").alias("rel"))
    return _greedy_mmr_grouped(emb, cand)


def _greedy_mmr_grouped(
    emb: DataFrame,
    cand: DataFrame,
    select_n: int = _MMR_SELECT,
    lam: float = _MMR_LAMBDA,
    one_m_lam: float = 0.3,
) -> DataFrame:
    """Grouped-Arrow greedy MMR over a bounded candidate relation
    (query_id, neighbor_id, rel): candidate vectors are recovered by
    broadcasting the candidate list INTO the embeddings scan (map-side
    semi-join, no corpus shuffle), then ONE applyInPandas exchange
    keyed by query_id runs the k-row greedy per group. Pair cosines
    accumulate dimension 0..d-1 — the sequential fold's (and DuckDB
    list_sum's) order — so every double matches an unrolled-SQL oracle
    bit-for-bit. Tie-breaks (score DESC, neighbor_id ASC)."""
    import pandas as pd
    from pyspark.sql import types as T

    cand_v = emb.join(
        F.broadcast(cand), emb["vec_id"] == cand["neighbor_id"]
    ).select(
        "query_id",
        "neighbor_id",
        "rel",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("mmr_rank", T.IntegerType()),
            T.StructField("rel", T.DoubleType()),
            T.StructField("mmr", T.DoubleType()),
        ]
    )
    # one_m_lam is passed as its own decimal literal, NOT computed as
    # 1.0 - lam: 1.0 - 0.7 is 0.30000000000000004 in IEEE doubles and
    # the oracle's CAST('0.3' AS DOUBLE) is 0.3 exactly — a silent ulp.

    def greedy(pdf: "pd.DataFrame") -> "pd.DataFrame":
        rows = sorted(
            zip(pdf["neighbor_id"], pdf["rel"], pdf["v"]),
            key=lambda t: t[0],
        )
        ids = [int(n) for n, _, _ in rows]
        rel = {int(n): float(r) for n, r, _ in rows}
        vecs = {int(n): [float(x) for x in v] for n, _, v in rows}

        def cos(a: list, b: list) -> float:
            # dimension-order accumulation == the sequential fold ==
            # DuckDB list_sum: bit-identical cross-engine
            num = 0.0
            na = 0.0
            nb = 0.0
            for x, y in zip(a, b):
                num = num + x * y
                na = na + x * x
                nb = nb + y * y
            return num / (na**0.5 * nb**0.5)

        sel: list = []
        out: list = []
        remaining = list(ids)
        for step in range(1, select_n + 1):
            best = None
            for nid in remaining:
                if step == 1:
                    score = rel[nid]
                else:
                    worst = max(cos(vecs[nid], vecs[sid]) for sid in sel)
                    score = lam * rel[nid] - one_m_lam * worst
                if (
                    best is None
                    or score > best[1]
                    or (score == best[1] and nid < best[0])
                ):
                    best = (nid, score)
            if best is None:
                break
            sel.append(best[0])
            remaining.remove(best[0])
            out.append(
                (
                    int(pdf["query_id"].iloc[0]),
                    best[0],
                    step,
                    rel[best[0]],
                    best[1],
                )
            )
        return pd.DataFrame(
            out, columns=["query_id", "neighbor_id", "mmr_rank", "rel", "mmr"]
        )

    return cand_v.groupBy("query_id").applyInPandas(greedy, out_schema)


def _rrf_sql(fused_k: int) -> str:
    """DuckDB mirror of :func:`_rrf_fused` as a CTE-embeddable SELECT,
    parameterized by the fused depth (shared by the ext_hybrid_rrf
    oracle's structure and ext_retrieval_pipeline's candidate CTE)."""
    return f"""
    WITH qt AS (
      SELECT DISTINCT doc_id AS query_id, t AS token
      FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
            FROM documents WHERE doc_id < {_N_QUERIES})
      WHERE t <> ''
    ),
    ct AS (
      SELECT doc_id, t AS token
      FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
            FROM documents)
      WHERE t <> ''
    ),
    lexcnt AS (
      SELECT q.query_id, c.doc_id AS neighbor_id,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM qt q JOIN ct c USING (token)
      WHERE c.doc_id <> q.query_id
      GROUP BY 1, 2
    ),
    lex AS (
      SELECT query_id, neighbor_id, CAST(rnk AS INT) AS lex_rank
      FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY query_id
              ORDER BY n_shared DESC, neighbor_id) AS rnk
            FROM lexcnt)
      WHERE rnk <= {_ARM_K}
    ),
    qv AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v,
                  sqrt(list_sum(list_transform(
                    range(1, len(embedding) + 1),
                    i -> CAST(embedding AS DOUBLE[])[i]
                         * CAST(embedding AS DOUBLE[])[i]))) AS nrm
           FROM embeddings WHERE vec_id < {_N_QUERIES}),
    cv AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS v,
                  sqrt(list_sum(list_transform(
                    range(1, len(embedding) + 1),
                    i -> CAST(embedding AS DOUBLE[])[i]
                         * CAST(embedding AS DOUBLE[])[i]))) AS nrm
          FROM embeddings),
    sem AS (
      SELECT query_id, neighbor_id, CAST(rnk AS INT) AS sem_rank
      FROM (
        SELECT q.query_id, c.neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_sum(list_transform(range(1, len(q.v) + 1),
                                                  i -> q.v[i] * c.v[i]))
                          / (q.nrm * c.nrm) DESC,
                          c.neighbor_id) AS rnk
        FROM qv q CROSS JOIN cv c
        WHERE q.query_id <> c.neighbor_id
      )
      WHERE rnk <= {_ARM_K}
    ),
    rrffused AS (
      SELECT query_id, neighbor_id, lex_rank, sem_rank,
             COALESCE(CAST(1 AS DOUBLE) / ({_RRF_K} + lex_rank),
                      CAST(0 AS DOUBLE))
             + COALESCE(CAST(1 AS DOUBLE) / ({_RRF_K} + sem_rank),
                        CAST(0 AS DOUBLE)) AS rrf_score
      FROM lex FULL JOIN sem USING (query_id, neighbor_id)
    )
    SELECT query_id, neighbor_id, lex_rank, sem_rank, rrf_score,
           CAST(rnk AS INT) AS fused_rank
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY rrf_score DESC, neighbor_id) AS rnk
          FROM rrffused)
    WHERE rnk <= {fused_k}
    """


def _pipeline_oracle() -> str:
    lam = "CAST('0.7' AS DOUBLE)"
    one_m_lam = "CAST('0.3' AS DOUBLE)"
    return f"""
    WITH fusedk AS ({_rrf_sql(10)}),
    e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_sum(list_transform(
               range(1, len(embedding) + 1),
               i -> CAST(embedding AS DOUBLE[])[i]
                    * CAST(embedding AS DOUBLE[])[i]))) AS nrm
      FROM embeddings
    ),
    mx AS (
      SELECT query_id, MAX(rrf_score) AS mx FROM fusedk GROUP BY query_id
    ),
    cand AS (
      SELECT f.query_id, f.neighbor_id, f.rrf_score / m.mx AS rel
      FROM fusedk f JOIN mx m ON m.query_id = f.query_id
    ),
    psim AS (
      SELECT a.query_id, a.neighbor_id AS id_a, b.neighbor_id AS id_b,
             list_sum(list_transform(range(1, len(ea.v) + 1),
                                     i -> ea.v[i] * eb.v[i]))
               / (ea.nrm * eb.nrm) AS sim
      FROM cand a
      JOIN cand b ON a.query_id = b.query_id
                 AND a.neighbor_id <> b.neighbor_id
      JOIN e ea ON ea.vec_id = a.neighbor_id
      JOIN e eb ON eb.vec_id = b.neighbor_id
    ),
    s1 AS (
      SELECT query_id, neighbor_id, rel, rel AS mmr FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY rel DESC, neighbor_id) AS rn
        FROM cand
      ) WHERE rn = 1
    ),
    r2 AS (
      SELECT c.query_id, c.neighbor_id, c.rel,
             {lam} * c.rel - {one_m_lam} * MAX(p.sim) AS mmr
      FROM cand c
      JOIN s1 ON s1.query_id = c.query_id
             AND c.neighbor_id <> s1.neighbor_id
      JOIN psim p ON p.query_id = c.query_id
                 AND p.id_a = c.neighbor_id AND p.id_b = s1.neighbor_id
      GROUP BY c.query_id, c.neighbor_id, c.rel
    ),
    s2 AS (
      SELECT query_id, neighbor_id, rel, mmr FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY mmr DESC, neighbor_id) AS rn
        FROM r2
      ) WHERE rn = 1
    ),
    r3 AS (
      SELECT c.query_id, c.neighbor_id, c.rel,
             {lam} * c.rel - {one_m_lam} * MAX(p.sim) AS mmr
      FROM cand c
      JOIN s1 ON s1.query_id = c.query_id
             AND c.neighbor_id <> s1.neighbor_id
      JOIN s2 ON s2.query_id = c.query_id
             AND c.neighbor_id <> s2.neighbor_id
      JOIN psim p ON p.query_id = c.query_id AND p.id_a = c.neighbor_id
                 AND p.id_b IN (s1.neighbor_id, s2.neighbor_id)
      GROUP BY c.query_id, c.neighbor_id, c.rel
    ),
    s3 AS (
      SELECT query_id, neighbor_id, rel, mmr FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY mmr DESC, neighbor_id) AS rn
        FROM r3
      ) WHERE rn = 1
    )
    SELECT query_id, neighbor_id, CAST(1 AS INT) AS mmr_rank, rel, mmr FROM s1
    UNION ALL
    SELECT query_id, neighbor_id, CAST(2 AS INT), rel, mmr FROM s2
    UNION ALL
    SELECT query_id, neighbor_id, CAST(3 AS INT), rel, mmr FROM s3
    """


@register("ext_retrieval_pipeline", oracle=_pipeline_oracle())
def ext_retrieval_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FUSED retrieval serving flow as ONE plan — what a RAG stack
    actually executes per query batch: hybrid candidate generation
    (lexical + semantic arms, reciprocal-rank fusion, top-10 per query;
    the shared _rrf_fused core), per-query max-normalized RRF relevance
    (one divide — rank-fusion scores live on a tiny scale, so
    normalizing puts the MMR trade-off knob in [0,1]), then greedy MMR
    diversification (3 unrolled steps, lambda=0.7) over the fused pool.

    Scale: corpus touched exactly twice (token arm, vector arm) by the
    candidate stage; everything downstream — normalization, candidate
    pair-sims, the three argmax steps — runs on |Q|·10 rows. This is
    the composition contract the individual keys (ext_hybrid_rrf,
    ext_mmr_diversify) each pin in isolation, proven end-to-end as one
    lazy plan.

    Determinism: inherited from the parts — integer arm ranks, fixed-
    order IEEE fusion sums, shared-literal lambda, total-order
    tie-breaks everywhere."""
    cand_full = _rrf_fused(spark, sf_dir, 10)
    mx = cand_full.groupBy("query_id").agg(F.max("rrf_score").alias("mx"))
    cand = cand_full.join(F.broadcast(mx), "query_id").select(
        "query_id",
        "neighbor_id",
        (F.col("rrf_score") / F.col("mx")).alias("rel"),
    )
    emb = load_tables(spark, sf_dir)["embeddings"]
    return _greedy_mmr_grouped(emb, cand)
