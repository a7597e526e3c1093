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


def _ordered_names() -> list[str]:
    """Driver-facing key order. The round driver evaluates queries in dict
    order and may stop after a fixed budget (round 1 covered exactly the
    first 50 keys), so the order IS the coverage policy: every SURVEY §2
    `opNN` key first — those not yet driver-verified in round 1 ahead of
    the re-verified ones, so all 50 canonical ops land inside a 50-key
    budget — then flagship (it has its own smoke check and a green
    round-1 row), then the scan-format variants, then the
    training-data-pipeline extension keys (dedup/similarity/text/
    training), then everything else in registration order."""
    first_round_unverified = [
        "op08_catalog_introspection", "op11_schema_report",
        "op23_join_broadcast", "op25_join_diff_keys", "op26_join_composite",
        "op27_left_join_flag", "op28_self_join", "op29_join_renamed_dim",
        "op30_distinct", "op31_diagonal_union", "op32_unpivot",
        "op33_surrogate_key", "op35_concat_key", "op36_replace",
        "op37_capitalize", "op38_singularize", "op39_timestamp_parse",
        "op40_casts", "op41_arithmetic", "op42_contains_classifier",
    ]
    import re

    def canonical_op(n: str) -> bool:
        return re.match(r"^op\d+_", n) is not None

    variants = [
        "op02b_csv_scan",
        "op02c_json_scan",
        "op02d_orc_scan",
        "op36b_replace_first",
    ]
    priority_ext = [
        "ext_dedup_exact", "ext_dedup_minhash", "ext_dedup_clusters",
        "ext_dedup_simhash", "ext_dedup_ngram_jaccard",
        "ext_jaccard_prefix_join", "ext_dedup_incremental",
        "ext_minhash_accuracy", "ext_hdr_quantiles",
        "ext_ann_bruteforce", "ext_ann_lsh", "ext_ann_ivf", "ext_ann_recall",
        "ext_embedding_neardup", "ext_mm_decode_real", "ext_tfidf", "ext_lang_id",
        "ext_quality_filter_pipeline", "ext_token_count",
        "ext_fingerprint", "ext_chunk_documents", "ext_pack_sequences",
        "ext_corpus_mix", "ext_contamination",
    ]
    # Guard against silent priority demotion: every priority name must be a
    # real registry key (a rename upstream would otherwise quietly drop the
    # query from the driver-sampled head of the ordering).
    missing = [
        n
        for n in priority_ext + first_round_unverified + variants
        if n not in REGISTRY
    ]
    assert not missing, f"ordering names not in REGISTRY: {missing}"
    ordered: list[str] = [n for n in first_round_unverified if n in REGISTRY]
    ordered += sorted(
        n
        for n in REGISTRY
        if canonical_op(n) and n not in ordered and n not in variants
    )
    ordered.append("flagship")
    ordered += [n for n in variants if n in REGISTRY]
    ordered += [n for n in priority_ext if n in REGISTRY and n not in ordered]
    ordered += [n for n in REGISTRY if n not in ordered]
    assert len(ordered) == len(REGISTRY)
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
