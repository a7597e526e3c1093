"""Deduplication extension queries (operators/dedup.py) with DuckDB
oracles. The corpus for exact/MinHash runs is documents ∪ an id-shifted
copy (simulated re-crawl, operators/dedup.py:with_recrawl) so every
detection path produces non-trivial output on the synthetic data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from world_cup_duckdb_spark.operators.dedup import (
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_bands,
    ngram_jaccard_pairs,
    simhash16,
    with_recrawl,
)
from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import load_tables

_CORPUS_SQL = """
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents
"""

_SHINGLES_SQL = """
      CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [] END
"""


@register(
    "ext_dedup_exact",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL})
    SELECT md5(text) AS text_hash,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM corpus
    GROUP BY md5(text)
    HAVING COUNT(*) > 1
    """,
)
def ext_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text), deterministic canonical
    representative = min(doc_id). One uniform-key shuffle, no skew."""
    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    return exact_duplicates(with_recrawl(d))


@register(
    "ext_dedup_minhash",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
    sh AS (
      SELECT doc_id, unnest(list_distinct({_SHINGLES_SQL})) AS shingle
      FROM tok
    ),
    seeded AS (
      SELECT doc_id, s.seed,
             md5(CAST(s.seed AS VARCHAR) || ':' || shingle) AS h
      FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS seed) s
    ),
    sigs AS (SELECT doc_id, seed, MIN(h) AS sig FROM seeded GROUP BY doc_id, seed),
    bands AS (
      SELECT doc_id, CAST(seed // 2 AS INT) AS band,
             string_agg(sig, '' ORDER BY seed) AS band_key
      FROM sigs GROUP BY doc_id, CAST(seed // 2 AS INT)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
    """,
)
def ext_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: 3-word shingles → 8 seeded
    min-hashes → 4 bands of 2 → bucket join. Identical re-crawl copies
    share every band, so all true pairs are recovered; random collisions
    are deterministic (md5) and appear in both engines identically.

    Scale: pairwise cost is Σ bucket², not n² — see operators/dedup.py.
    """
    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    bands = minhash_bands(with_recrawl(d), num_hashes=8, band_size=2)
    return lsh_candidate_pairs(bands)


def _simhash_sql() -> str:
    nib = [
        f"strpos('0123456789abcdef', substr(h, {k + 1}, 1)) - 1" for k in range(4)
    ]
    sums = ",\n             ".join(
        f"SUM(CASE WHEN (({nib[j // 4]}) // {2 ** (j % 4)}) % 2 = 1 "
        f"THEN 1 ELSE -1 END) AS s{j}"
        for j in range(16)
    )
    assemble = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {2 ** j} ELSE 0 END)" for j in range(16)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    hashed AS (SELECT doc_id, md5(tok) AS h FROM tok),
    sums AS (
      SELECT doc_id,
             {sums}
      FROM hashed GROUP BY doc_id
    )
    SELECT doc_id, CAST({assemble} AS BIGINT) AS simhash FROM sums
    """


@register("ext_dedup_simhash", oracle=_simhash_sql())
def ext_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash signatures (operators/dedup.py:simhash16): token
    votes ±1 on md5-derived bits, signature = sign pattern of the sums.
    Near-dups = equal (or Hamming-close) signatures."""
    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    return simhash16(d)


@register(
    "ext_dedup_ngram_jaccard",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN length(text) >= 3
                  THEN list_distinct(list_transform(range(1, length(text) - 1),
                                                    i -> substr(text, i, 3)))
                  ELSE [] END AS sh
      FROM documents WHERE doc_id < 100
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           len(list_intersect(a.sh, b.sh))
             / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE)
             AS jaccard
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))
            / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.5
    """,
)
def ext_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact char-3-gram Jaccard pairs ≥ 0.5 over a bounded subset
    (doc_id < 100) — the verify stage for LSH candidates; quadratic by
    nature, so never applied corpus-wide (operators/dedup.py)."""
    d = (
        load_tables(spark, sf_dir)["documents"]
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
    )
    return ngram_jaccard_pairs(d, threshold=0.5)


@register(
    "ext_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE corpus AS ({_CORPUS_SQL}),
    tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
    sh AS (
      SELECT doc_id, unnest(list_distinct({_SHINGLES_SQL})) AS shingle
      FROM tok
    ),
    seeded AS (
      SELECT doc_id, s.seed,
             md5(CAST(s.seed AS VARCHAR) || ':' || shingle) AS h
      FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS seed) s
    ),
    sigs AS (SELECT doc_id, seed, MIN(h) AS sig FROM seeded GROUP BY doc_id, seed),
    bands AS (
      SELECT doc_id, CAST(seed // 2 AS INT) AS band,
             string_agg(sig, '' ORDER BY seed) AS band_key
      FROM sigs GROUP BY doc_id, CAST(seed // 2 AS INT)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION
      SELECT doc_b, doc_a FROM cand
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src AS doc_id,
           CAST(LEAST(src, MIN(dst)) AS BIGINT) AS cluster_id
    FROM reach GROUP BY src
    """,
)
def ext_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: MinHash-LSH candidate pairs → connected
    components by iterative min-label propagation (the pairwise→groups
    step of dedup; operators/dedup.py:connected_components). The oracle
    computes the same components via a recursive-CTE transitive closure —
    two entirely different algorithms, equal hashes."""
    from world_cup_duckdb_spark.operators.dedup import connected_components

    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    bands = minhash_bands(with_recrawl(d), num_hashes=8, band_size=2)
    return connected_components(lsh_candidate_pairs(bands))
