"""Query registry: one entry per operator in SURVEY.md §2 (+ extensions).

Each entry pairs a Spark DataFrame implementation with the equivalent
ANSI/DuckDB SQL oracle. The driver (and our own tests/test_parity.py) runs
both on the same parquet tables and compares row count + schema +
order-insensitive value hash — the engine's primary correctness gate
(SURVEY.md §5).

Determinism rules every query follows:
- money/double aggregation goes through decimal (functions.dec) so results
  are independent of partition/accumulation order, then casts to double;
- oracle SQL casts aggregates to the Spark result types (BIGINT counts,
  DOUBLE money) so schemas line up;
- every computed column is aliased identically on both sides;
- rankings/limits always carry an explicit total tie-break order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the
    registry, optionally with its DuckDB oracle SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


# Union of CORRECTNESS_r01.json + CORRECTNESS_r02.json keys: every registry
# key that already has a green driver-side correctness row. The driver
# samples the first ~50 keys of the dict order each round, so keys in this
# set are demoted to the tail and never-sampled keys lead — the coverage
# policy that got all of SURVEY §2 green across rounds 1-2.
DRIVER_VERIFIED: frozenset[str] = frozenset({
    "ext_corrupt_json", "ext_deterministic_sample", "ext_fuzzy_join",
    "ext_ivm_join", "ext_merge_upsert", "ext_metadata_columns",
    "ext_python_datasource", "ext_quantiles", "ext_schema_evolution",
    "ext_sessionize_batch", "ext_stratified_sample", "ext_table_diff",
    "ext_time_travel", "ext_upsert_latest", "ext_window_distribution",
    "ext_zone_map_pruning", "flagship", "op01_remote_fetch_cache",
    "op02_scan_project", "op02b_csv_scan", "op02c_json_scan",
    "op02d_orc_scan", "op03_date_parse", "op04_literal_table",
    "op05_lazy_plan", "op06_ddl_create", "op07_insert_select",
    "op08_catalog_introspection", "op09_preview_limit", "op10_export_database",
    "op11_schema_report", "op12_project_compute", "op13_alias",
    "op14_rename", "op15_drop", "op16_with_column",
    "op17_filter_eq", "op18_when_chain", "op19_isin",
    "op20_null_test", "op21_contains", "op22_endswith",
    "op23_join_broadcast", "op24_join_dim", "op25_join_diff_keys",
    "op26_join_composite", "op27_left_join_flag", "op28_self_join",
    "op29_join_renamed_dim", "op30_distinct", "op31_diagonal_union",
    "op32_unpivot", "op33_surrogate_key", "op34_fk_orphans",
    "op35_concat_key", "op36_replace", "op37_capitalize",
    "op38_singularize", "op39_timestamp_parse", "op40_casts",
    "op41_arithmetic", "op42_contains_classifier", "op43_hash_agg",
    "op44_distinct_agg", "op45_rank_window", "op46_analytic_window",
    "op47_topk", "op48_sort", "op49_rollup",
    "op50_pk_duplicates", "op51_notnull_pk",
})


def _ordered_names() -> list[str]:
    """Driver-facing key order. The round driver evaluates queries in dict
    order and stops after a fixed budget (~50 keys per round), so the order
    IS the coverage policy. Round-3 policy: lead with the never-driver-
    verified LLM-data-pipeline surface (dedup, ANN/embedding, text quality,
    training prep, streaming, multimodal — the keys VERDICT r2 flagged as
    the evidence gap), then the rest of the never-verified extension and
    SQL-surface keys, then everything already green in r01/r02."""
    round3_head = [
        # Deduplication family.
        "ext_dedup_exact", "ext_dedup_minhash", "ext_dedup_clusters",
        "ext_dedup_simhash", "ext_dedup_ngram_jaccard",
        "ext_jaccard_prefix_join", "ext_dedup_incremental",
        "ext_minhash_accuracy", "ext_substring_dedup",
        # ANN / embedding family.
        "ext_ann_bruteforce", "ext_ann_lsh", "ext_ann_ivf", "ext_ann_recall",
        "ext_embedding_neardup", "ext_embedding_centroids",
        "ext_embedding_quantize", "ext_vector_norm",
        # Text analysis family.
        "ext_tfidf", "ext_token_count", "ext_lang_id",
        "ext_quality_filter_pipeline", "ext_quality_score",
        "ext_fingerprint", "ext_bm25", "ext_vocab_topk", "ext_repetition",
        "ext_bigram_topk", "ext_lm_score",
        # Training-data prep family.
        "ext_chunk_documents", "ext_pack_sequences", "ext_corpus_mix",
        "ext_contamination", "ext_kfold_split", "ext_vocab_growth",
        "ext_feature_hash",
        # Streaming family (stream-equals-batch forms).
        "ext_stream_tumbling", "ext_stream_sliding", "ext_stream_session",
        "ext_stream_dedup", "ext_stream_enrich", "ext_stream_stream_join",
        # Multimodal family.
        "ext_mm_metadata", "ext_mm_decode", "ext_mm_decode_real",
        "ext_mm_features", "ext_mm_resize", "ext_mm_frames",
        # Rows-only queries upgraded to oracles this round + pipeline.
        "ext_fit_pandas", "ext_hll_sketch_union", "wc_build_manifest",
    ]
    # Guard against silent priority demotion: every priority name must be a
    # real registry key (a rename upstream would otherwise quietly drop the
    # query from the driver-sampled head of the ordering). Raise — not
    # assert — so the guard survives `python -O`.
    missing = [n for n in round3_head if n not in REGISTRY]
    if missing:
        raise ValueError(f"ordering names not in REGISTRY: {missing}")
    ordered: list[str] = list(round3_head)
    # Remaining never-driver-verified keys, registration order.
    ordered += [
        n for n in REGISTRY
        if n not in DRIVER_VERIFIED and n not in ordered
    ]
    # Already driver-verified keys last (still present for local parity).
    ordered += [n for n in REGISTRY if n not in ordered]
    if len(ordered) != len(REGISTRY):
        raise RuntimeError(
            f"ordering dropped keys: {len(ordered)} != {len(REGISTRY)}"
        )
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: REGISTRY[n].fn for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        n: REGISTRY[n].oracle
        for n in _ordered_names()
        if REGISTRY[n].oracle is not None
    }


# Populate the registry (import order = display order).
from world_cup_duckdb_spark.queries import (  # noqa: E402,F401
    analytics,
    constraints,
    core,
    csv_source,
    ext_advanced,
    ext_analytics2,
    ext_analytics3,
    ext_analytics4,
    ext_analytics5,
    ext_dedup,
    ext_events,
    ext_graph,
    ext_metrics,
    ext_multimodal,
    ext_optim,
    ext_regression,
    ext_rollups,
    ext_scale,
    ext_similarity,
    ext_stream,
    ext_text,
    ext_training,
    ext_training2,
    joins,
    lifecycle,
    reshape,
    scalars,
    sql_surface,
    sql_surface2,
    wc_pipeline,
)
