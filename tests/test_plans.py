"""Physical-plan quality gates — the 100 TB design checks.

Correctness tests say the engine computes the right answer; these say it
computes it with the plan you'd want on a 1000-executor cluster:
projection/predicate pushdown into the parquet scan, broadcast joins for
bounded dims, TakeOrderedAndProject for top-k, no Python (BatchEvalPython)
in any reference-surface plan.
"""

from __future__ import annotations

import pytest

from world_cup_duckdb_spark.queries import REGISTRY


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_scan_projection_pushdown(spark, sf_dir):
    df = REGISTRY["op02_scan_project"].fn(spark, sf_dir)
    p = plan(df)
    # Only the three selected columns reach the reader...
    assert "l_orderkey" in p and "l_quantity" in p
    assert "l_extendedprice" not in p and "l_shipdate" not in p
    # ...and the filter is pushed to parquet.
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]" in p


def test_filter_pushdown_eq(spark, sf_dir):
    p = plan(REGISTRY["op17_filter_eq"].fn(spark, sf_dir))
    assert "EqualTo(o_orderstatus,F)" in p


def test_flagship_broadcasts_dims(spark, sf_dir):
    p = plan(REGISTRY["flagship"].fn(spark, sf_dir))
    assert p.count("BroadcastHashJoin") >= 2, p


def test_topk_is_take_ordered(spark, sf_dir):
    p = plan(REGISTRY["op47_topk"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in p


def test_no_python_udf_on_reference_surface(spark, sf_dir):
    # Engine policy (SURVEY.md §2.8): zero Python UDFs for reference ops.
    reference_keys = [n for n in REGISTRY if n.startswith("op") or n == "flagship"]
    for name in reference_keys:
        p = plan(REGISTRY[name].fn(spark, sf_dir))
        assert "BatchEvalPython" not in p, f"{name} uses a row-at-a-time Python UDF"


def test_whole_stage_codegen_on_agg(spark, sf_dir):
    # AQE wraps the plan pre-execution and hides codegen spans; disable it
    # for the inspection so the static plan shows them.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        p = plan(REGISTRY["op43_hash_agg"].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # Formatted explain marks whole-stage-codegen membership per operator.
    assert "[codegen id :" in p
    # Partial (map-side) + final aggregate around one exchange: the shuffle
    # carries one row per group per partition, not fact rows.
    assert "partial_sum" in p
    tree = p.split("(1) Scan")[0]
    assert tree.count("HashAggregate") == 2
    assert tree.count("Exchange") == 1


def test_sessionize_single_exchange(spark, sf_dir):
    # Both window passes and the per-session aggregate reuse the one
    # user_id shuffle — cost is a single exchange of the events table.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        p = plan(REGISTRY["ext_sessionize_batch"].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    tree = p.split("(1) Scan")[0]
    assert tree.count("Exchange") == 1, p


def test_vocab_topk_is_take_ordered(spark, sf_dir):
    # Top-k over exploded tokens must not globally sort the vocabulary.
    p = plan(REGISTRY["ext_vocab_topk"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in p, p
    # The explode feeds a partial aggregate — shuffle volume is
    # vocabulary-sized, not corpus-sized.
    assert "partial_count" in p or "partial" in p, p
