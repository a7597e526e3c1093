"""End-to-end training-corpus preparation pipeline — the composition
claim behind the individual curation operators: near-dup clustering →
quality-aware canonical selection → leak-free split gate → temperature
mixing → deterministic epoch shuffle → sequence packing, fused into ONE
registered query with ONE DuckDB value-hash oracle.

Extension surface (not reference-derived — SURVEY.md Phase 5): each
stage exists and is individually oracled (ext_dedup_clusters,
ext_cluster_best_copy, ext_split_leakage, ext_temperature_mix,
ext_epoch_shuffle, ext_pack_sequences); this module is the honest
"a user can run the whole corpus-prep flow as one plan" statement, and
the fused plan is what a 100 TB run would actually submit.

Scale contract (pinned in tests/test_plans.py): no corpus-sized global
window or global sort anywhere in the fused plan —
- clustering: LSH band bucket-join star edges, never bucket cliques;
- canonical selection: struct-max hash aggregate, no window over
  member lists;
- split gate: map-side hash of the cluster label;
- mixing: O(#sources) multiplier relation broadcast over a map-only
  corpus side (the only unpartitioned window runs over the aggregated
  per-source stats, not the corpus);
- shuffle+pack: one hash exchange on (epoch, shard), then TWO window
  passes over the same partitioning (rank, then running offset) that
  reuse the single exchange — the TeraSort-free global permutation.

Determinism: clusters/splits/coins/shard-positions all derive from md5
of stable ids; quality is the identical double formula on identical
ints in both engines; every other column is exact integer arithmetic —
so the full pipeline output value-hashes identically in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from world_cup_duckdb_spark.operators.dedup import (
    connected_components,
    lsh_star_edges,
    minhash_bands,
    with_recrawl,
)
from world_cup_duckdb_spark.operators.text import stage_token_counts
from world_cup_duckdb_spark.operators.training import (
    epoch_shuffle,
    temperature_mix,
)
from world_cup_duckdb_spark.queries import register, tracked_persist
from world_cup_duckdb_spark.queries.ext_dedup import (
    _CLUSTER_CTES,
    _split_sql,
    quality_scored_sql,
    quality_sql,
    split_bucket_sql,
)
from world_cup_duckdb_spark.sources.catalog import load_tables

#: Recrawl id offset (operators/dedup.py:with_recrawl default) — maps a
#: kept recrawl copy back to its original document row.
_OFFSET = 1_000_000

#: Pack budget in characters: each (epoch, shard) stream is cut into
#: contiguous fixed-budget packs.
_BUDGET = 4096

_N_EPOCHS = 2
_N_SHARDS = 8
_MAX_UPSAMPLE = 8.0


def _pipeline_oracle() -> str:
    return f"""
    WITH RECURSIVE {_CLUSTER_CTES},
    scored AS ({quality_scored_sql("corpus")}
    ),
    best AS (
      SELECT cluster_id, doc_id AS kept_doc_id FROM (
        SELECT m.cluster_id, m.doc_id,
               ROW_NUMBER() OVER (PARTITION BY m.cluster_id
                                  ORDER BY s.q DESC, m.doc_id) AS rn
        FROM members m JOIN scored s ON m.doc_id = s.doc_id
      ) WHERE rn = 1
    ),
    train AS (
      SELECT kept_doc_id FROM best
      WHERE ({_split_sql("cluster_id")}) = 'train'
    ),
    meta AS (
      SELECT doc_id, source, n_chars FROM documents
      UNION ALL
      SELECT doc_id + {_OFFSET}, source, n_chars FROM documents
    ),
    surv AS (
      SELECT t.kept_doc_id, m.source, m.n_chars
      FROM train t JOIN meta m ON m.doc_id = t.kept_doc_id
    ),
    stats AS (SELECT source, SUM(n_chars) AS c FROM surv GROUP BY source),
    mult AS (
      SELECT source,
             CASE WHEN c > 0 THEN
               LEAST({_MAX_UPSAMPLE},
                     sqrt(CAST((SELECT MAX(c) FROM stats) AS DOUBLE)
                          / CAST(c AS DOUBLE)))
             ELSE 1.0 END AS m
      FROM stats
    ),
    planned AS (
      SELECT s.kept_doc_id, s.n_chars,
             CAST(FLOOR(mult.m) AS BIGINT)
             + CASE WHEN CAST(('0x' || substring(
                        md5('tmix-' || CAST(s.kept_doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT)
                     < CAST(FLOOR((mult.m - FLOOR(mult.m)) * 4294967296.0)
                            AS BIGINT)
                    THEN 1 ELSE 0 END AS n_copies
      FROM surv s JOIN mult USING (source)
    ),
    mixed AS (
      SELECT kept_doc_id, n_chars,
             CAST(unnest(range(1, n_copies + 1)) AS INT) AS copy_nr
      FROM planned WHERE n_copies > 0
    ),
    hashed AS (
      SELECT kept_doc_id, copy_nr, n_chars, e.epoch,
             md5(CAST(e.epoch AS VARCHAR)
                 || '-' || CAST(length(CAST(kept_doc_id AS VARCHAR))
                                AS VARCHAR)
                 || ':' || CAST(kept_doc_id AS VARCHAR)
                 || '-' || CAST(length(CAST(copy_nr AS VARCHAR)) AS VARCHAR)
                 || ':' || CAST(copy_nr AS VARCHAR)) AS hx
      FROM mixed, (SELECT unnest(range(0, {_N_EPOCHS})) AS epoch) e
    ),
    positioned AS (
      SELECT CAST(epoch AS INT) AS epoch,
             CAST(CAST(('0x' || substring(hx, 1, 8)) AS BIGINT)
                  % {_N_SHARDS} AS INT) AS shard,
             n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY epoch,
                            CAST(('0x' || substring(hx, 1, 8)) AS BIGINT)
                            % {_N_SHARDS}
               ORDER BY substring(hx, 9, 16), kept_doc_id, copy_nr
             ) AS pos
      FROM hashed
    ),
    placed AS (
      SELECT epoch, shard, pos, n_chars,
             SUM(n_chars) OVER (
               PARTITION BY epoch, shard ORDER BY pos
               ROWS UNBOUNDED PRECEDING
             ) - n_chars AS off
      FROM positioned
    )
    SELECT epoch, shard,
           CAST(FLOOR(off / {_BUDGET}.0) AS BIGINT) AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS pack_chars,
           CAST(MIN(pos) AS BIGINT) AS first_pos
    FROM placed
    GROUP BY epoch, shard, pack_id
    """


@register("ext_corpus_prep_pipeline", oracle=_pipeline_oracle())
def ext_corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-prep flow as one fused plan over the
    recrawl-heavy corpus (every document has a near-dup copy, so every
    stage does real work):

    1. near-dup clusters (MinHash bands → LSH star edges → connected
       components; singletons are their own cluster);
    2. quality-aware canonical selection per cluster (struct-max argmax
       on the length/stopword quality score, ties to the lowest id);
    3. leak-free split gate: hash-split on the CLUSTER label (the
       by-cluster mode ext_split_leakage proves leak-free) and keep the
       train shard;
    4. temperature mixing (alpha=0.5, 8x cap) of the survivors toward
       the largest source by character budget;
    5. deterministic 2-epoch / 8-shard md5 shuffle of the mixed copies
       (composite (kept_doc_id, copy_nr) key, char budget carried);
    6. contiguous 4096-char sequence packing per (epoch, shard) stream.

    Returns one row per (epoch, shard, pack_id): n_docs, pack_chars,
    first_pos — the pack manifest a trainer's data loader reads.
    """
    d = load_tables(spark, sf_dir)["documents"]
    corpus = with_recrawl(d.select("doc_id", "text"))
    bands = minhash_bands(corpus, num_hashes=8, band_size=2).transform(
        tracked_persist
    )
    clusters = connected_components(lsh_star_edges(bands))
    counted = stage_token_counts(corpus, keep=("doc_id",), langs=("en",))
    # SQL-string projections through the tail (r13, VERDICT r12 item 2):
    # this stateful query rebuilds its plan every run, and the
    # Column-builder forms of the quality/argmax/split-gate expressions
    # cost ~0.1 s of py4j chatter per build; each selectExpr/expr below
    # is one round trip. Faithful transcriptions of the old Column
    # forms (coalesce, struct-max argmax, split_bucket gate, -m.neg).
    members = (
        corpus.select("doc_id")
        .join(clusters, "doc_id", "left")
        .selectExpr("doc_id", "coalesce(cluster_id, doc_id) AS cluster_id")
        .join(counted.selectExpr("doc_id", f"{quality_sql()} AS q"), "doc_id")
    )
    best = members.groupBy("cluster_id").agg(
        F.expr("max(struct(q, -doc_id AS neg))").alias("m")
    )
    train = best.where(f"({split_bucket_sql('cluster_id')}) < 8").selectExpr(
        "CAST(-m.neg AS BIGINT) AS kept_doc_id"
    )
    # Metadata rides the SAME recrawl union the clustering saw — an
    # exact join on the (possibly shifted) kept id, never arithmetic on
    # the id value (an `id >= offset` reverse-map silently misclassifies
    # corpora whose genuine ids exceed the offset, e.g. the shifted-key
    # replicas scripts/scale_check.py stages).
    meta = with_recrawl(d.select("doc_id", "source", "n_chars"))
    # Persist the survivor metadata: temperature_mix consumes it TWICE
    # (the per-source stats aggregate feeding the multiplier broadcast,
    # and the corpus side the multipliers re-join) and without a cut the
    # whole upstream chain — cluster labels, quality join, canonical
    # argmax, split gate, meta join — executes once PER CONSUMER
    # (verified in the r12 before-plan: the subtree appeared twice,
    # once under the broadcast build). The cut is (kept_doc_id, source,
    # n_chars): the guide-§8 "decide on small rows" metadata relation,
    # three narrow columns per surviving doc — the class a 100 TB run
    # materializes (or writes out) exactly once by design. Measured at
    # sf0.1: full-pipeline noop tail 1.22 s → 0.7 s.
    survivors = train.join(
        meta, train["kept_doc_id"] == meta["doc_id"]
    ).select("kept_doc_id", "source", "n_chars").transform(tracked_persist)
    mixed = temperature_mix(
        survivors.select("kept_doc_id", "source", "n_chars"),
        weight_col="n_chars",
        group_col="source",
        id_col="kept_doc_id",
        alpha=0.5,
        max_upsample=_MAX_UPSAMPLE,
        salt="tmix-",
    )
    shuffled = epoch_shuffle(
        mixed.select("kept_doc_id", "copy_nr", "n_chars"),
        id_col=["kept_doc_id", "copy_nr"],
        n_epochs=_N_EPOCHS,
        n_shards=_N_SHARDS,
        carry=("n_chars",),
    )
    placed = shuffled.selectExpr(
        "epoch",
        "shard",
        "pos",
        "n_chars",
        "sum(n_chars) OVER (PARTITION BY epoch, shard ORDER BY pos"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        " - n_chars AS off",
    )
    return (
        placed.selectExpr(
            "*", f"CAST(FLOOR(off / {_BUDGET}) AS BIGINT) AS pack_id"
        )
        .groupBy("epoch", "shard", "pack_id")
        .agg(
            F.expr("CAST(count(1) AS BIGINT)").alias("n_docs"),
            F.expr("CAST(sum(n_chars) AS BIGINT)").alias("pack_chars"),
            F.expr("CAST(min(pos) AS BIGINT)").alias("first_pos"),
        )
    )
