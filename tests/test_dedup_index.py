"""Persisted MinHash signature index lifecycle
(operators/dedup_index.py — VERDICT r10 item 5).

Value-level parity of the probe vs the single-batch DuckDB form is the
registered key ext_inc_dedup_index (parity suite + driver). Here:
append ≡ build-over-union, the delete/compact lifecycle, and the
crash-recovery windows of the manifest-commit swap.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from world_cup_duckdb_spark.operators.dedup_index import (
    minhash_index_append,
    minhash_index_compact,
    minhash_index_delete,
    minhash_index_persist,
    minhash_index_probe_dedup,
)
from world_cup_duckdb_spark.sources.catalog import table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        table(spark, sf_dir, "documents").select("doc_id", "text").cache()
    )


def _probe_rows(spark, path, delta):
    return sorted(
        tuple(r)
        for r in minhash_index_probe_dedup(spark, path, delta).collect()
    )


def test_append_equals_full_build(spark, docs, tmp_path):
    """persist(half) + append(half) must probe identically to
    persist(full): appends change WHAT is indexed, never HOW."""
    delta = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")

    full = str(tmp_path / "full")
    minhash_index_persist(docs, full)

    inc = str(tmp_path / "inc")
    minhash_index_persist(docs.filter(F.col("doc_id") % 2 == 0), inc)
    minhash_index_append(spark, inc, docs.filter(F.col("doc_id") % 2 == 1))

    assert _probe_rows(spark, full, delta) == _probe_rows(spark, inc, delta)


def test_delete_mask_compact_and_crash_recovery(spark, docs, tmp_path):
    """Deletes are visible at probe time immediately (tombstone mask),
    compaction folds them into the files without changing results, and
    the worst reachable crash state (swap done, manifest removed,
    stale scratch left) neither corrupts probes nor blocks the next
    delete+compact cycle."""
    loc = str(tmp_path / "ix")
    minhash_index_persist(docs, loc)
    delta = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")

    # Reference: an index built WITHOUT the victims.
    victims = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    ref = str(tmp_path / "ref")
    minhash_index_persist(
        docs.join(victims, "doc_id", "left_anti"), ref
    )
    expect = _probe_rows(spark, ref, delta)

    # Tombstone-masked probe equals the rebuilt-without-victims probe.
    minhash_index_delete(spark, loc, victims)
    assert _probe_rows(spark, loc, delta) == expect

    # Compaction folds the tombstones; probe unchanged; only affected
    # bucket partitions were rewritten.
    affected = minhash_index_compact(spark, loc)
    assert affected != []
    assert _probe_rows(spark, loc, delta) == expect
    assert not os.path.isdir(os.path.join(loc, "tombstones"))
    remaining = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(loc, "bands"))
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert not any(v % 5 == 0 for v in remaining)

    # Crash window: reconstruct {manifest gone, stale bands_old +
    # tombstones on disk} and require the NEXT cycle to clear it and
    # keep every surviving doc (mirror of the IVF ADVICE-r10 test).
    old_root = os.path.join(loc, "bands_old")
    os.makedirs(old_root, exist_ok=True)
    some_bucket = next(
        d
        for d in os.listdir(os.path.join(loc, "bands"))
        if d.startswith("bucket=")
    )
    os.makedirs(os.path.join(old_root, some_bucket), exist_ok=True)
    victims2 = docs.filter(F.col("doc_id") % 7 == 3).select("doc_id")
    minhash_index_delete(spark, loc, victims2)
    assert minhash_index_compact(spark, loc) != []
    remaining2 = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(loc, "bands"))
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert not any(v % 7 == 3 or v % 5 == 0 for v in remaining2)
    assert not os.path.isdir(old_root)


def test_probe_edge_inputs(spark, docs, tmp_path):
    """Contract corners: an empty delta probes to an empty result (not
    an error), and a delta doc too short to produce any 3-word shingle
    is ABSENT from the result rather than misreported — its band keys
    are null, null keys never equi-join, and the DuckDB twin drops the
    doc the same way (its unnest of an empty shingle list yields no
    band rows at all). Same edge semantics as the batch MinHash key."""
    loc = str(tmp_path / "edge-ix")
    minhash_index_persist(docs, loc)

    empty = docs.filter(F.lit(False)).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    assert minhash_index_probe_dedup(spark, loc, empty).count() == 0

    first_text = docs.select("text").first()["text"]
    delta = spark.createDataFrame(
        [(2_000_001, "just two"), (2_000_002, first_text)],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in minhash_index_probe_dedup(spark, loc, delta).collect()
    }
    assert 2_000_001 not in rows  # sub-shingle-width doc: no verdict
    assert rows[2_000_002]["is_dup"] is True  # exact copy of a corpus doc


def test_probe_plan_has_no_pair_join(spark, docs, tmp_path):
    """The probe must never emit candidate PAIRS: its physical plan
    joins band rows only against the per-bucket min summary — assert
    no join output column set carries two doc-id-like sides at the
    band grain by pinning the aggregate-before-join shape: exactly two
    HashAggregate pairs (bucket reduction + per-doc min) downstream of
    the index scan, and every join is either the broadcast semi filter
    or the summary equi-join."""
    loc = str(tmp_path / "plan-ix")
    minhash_index_persist(docs, loc)
    delta = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    out = minhash_index_probe_dedup(spark, loc, delta)
    plan = out._jdf.queryExecution().toString()
    # No SortMergeJoin / shuffled hash join between two band-grain
    # relations: the only non-broadcast join key set allowed is
    # (band, band_key) against the AGGREGATED summary.
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan  # the index-scan kill filter survives


def test_gram_index_append_equals_full(spark, docs, tmp_path):
    """gram_index_persist(half) + gram_index_append(half) probes
    identically to a one-shot persist over the union — appends extend
    WHAT is indexed (set semantics survive cross-batch duplicate gram
    rows because the probe is a semi-join)."""
    from pyspark.sql import functions as F  # noqa: F811

    from world_cup_duckdb_spark.operators.dedup_index import (
        gram_index_append,
        gram_index_persist,
        gram_index_probe_hits,
    )
    from world_cup_duckdb_spark.queries.ext_dedup import _grams

    base = docs.select("doc_id", F.split("text", " ").alias("l"))
    ev = base.filter(F.col("doc_id") % 17 == 0)
    corpus = _grams(base.filter(F.col("doc_id") % 17 != 0))

    full = str(tmp_path / "gfull")
    gram_index_persist(_grams(ev), full)

    inc = str(tmp_path / "ginc")
    gram_index_persist(_grams(ev.filter(F.col("doc_id") % 2 == 0)), inc)
    gram_index_append(_grams(ev.filter(F.col("doc_id") % 2 == 1)), inc)

    a = sorted(
        tuple(r) for r in gram_index_probe_hits(spark, full, corpus).collect()
    )
    b = sorted(
        tuple(r) for r in gram_index_probe_hits(spark, inc, corpus).collect()
    )
    assert a == b and a
