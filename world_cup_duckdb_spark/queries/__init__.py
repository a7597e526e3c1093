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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: q.fn for n, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {n: q.oracle for n, q in REGISTRY.items() if q.oracle is not None}


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
