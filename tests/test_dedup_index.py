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


def test_recover_never_strands_tombstones(spark, docs, tmp_path, monkeypatch):
    """ADVICE r11: already-applied tombstones must never survive a
    completed swap with the manifest gone — that state is
    indistinguishable from pending deletes, so a later append
    re-inserting a deleted doc_id would be silently masked by probes
    and destroyed by the next compact. The fixed ordering clears
    tombstones BEFORE the manifest (commit marker), so the worst crash
    {manifest present, tombstones gone} is finished idempotently by the
    next entry point. Simulate that exact crash: fail the manifest
    os.remove once, then require the next append+probe to (a) finish
    recovery and (b) see a re-inserted previously-deleted doc."""
    import world_cup_duckdb_spark.operators.dedup_index as dix

    loc = str(tmp_path / "ix")
    minhash_index_persist(docs, loc)
    victim = docs.orderBy("doc_id").limit(1)
    victim_id = victim.first()["doc_id"]
    minhash_index_delete(spark, loc, victim.select("doc_id"))

    real_remove = os.remove

    def failing_remove(p):
        if p.endswith("compact_manifest.json"):
            raise OSError("simulated crash before manifest removal")
        real_remove(p)

    monkeypatch.setattr(dix.os, "remove", failing_remove)
    with pytest.raises(OSError, match="simulated crash"):
        minhash_index_compact(spark, loc)
    monkeypatch.setattr(dix.os, "remove", real_remove)

    # Crash state: swap done, tombstones already cleared, manifest left.
    assert os.path.isfile(os.path.join(loc, "compact_manifest.json"))
    assert not os.path.isdir(os.path.join(loc, "tombstones"))

    # Next cycle: re-ingest the purged doc, then probe an exact copy of
    # it. Stranded tombstones would mask the re-inserted doc (probe says
    # unique); the fixed ordering must find it.
    reinserted = docs.filter(F.col("doc_id") == victim_id)
    minhash_index_append(spark, loc, reinserted)
    assert not os.path.isfile(os.path.join(loc, "compact_manifest.json"))
    recrawl = reinserted.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    rows = minhash_index_probe_dedup(spark, loc, recrawl).collect()
    assert len(rows) == 1 and rows[0]["is_dup"] is True
    assert rows[0]["canon_id"] == victim_id
    # And the next compact must not destroy the re-inserted doc.
    minhash_index_delete(
        spark, loc, docs.filter(F.col("doc_id") == victim_id + 1).select("doc_id")
    )
    minhash_index_compact(spark, loc)
    rows2 = minhash_index_probe_dedup(spark, loc, recrawl).collect()
    assert len(rows2) == 1 and rows2[0]["is_dup"] is True


def test_multibatch_verdicts_survive_lineage_recompute(spark, docs, tmp_path):
    """VERDICT r11 item 2: per-batch verdicts in the probe-then-append
    cycle must be durable against lineage recomputation — a probe
    recomputed AFTER its batch was appended sees itself on the index
    side and flips every doc to dup-of-itself. The reliable parquet
    sink makes the read-back depend only on written files: unpersist
    everything, clear the cache, re-collect — the verdicts must be
    byte-stable and must NOT equal the post-append re-probe."""
    loc = str(tmp_path / "mb-ix")
    minhash_index_persist(docs.filter(F.col("doc_id") % 2 == 0), loc)
    batch = docs.filter(F.col("doc_id") % 2 == 1).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    verdicts = os.path.join(loc, "verdicts")
    minhash_index_probe_dedup(spark, loc, batch).write.parquet(verdicts)
    out = spark.read.parquet(verdicts)
    before = sorted(tuple(r) for r in out.collect())

    minhash_index_append(spark, loc, batch)  # the mutation

    spark.catalog.clearCache()  # kill any cached lineage state
    after = sorted(tuple(r) for r in out.collect())
    assert after == before  # durable: read-back unaffected by the append

    # The hazard is real: a recomputed probe WOULD differ (every batch
    # doc now collides with its own appended signature).
    reprobe = sorted(
        tuple(r)
        for r in minhash_index_probe_dedup(spark, loc, batch).collect()
    )
    assert reprobe != before
    # Read-back is a pure file scan — no banding stages to recompute.
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "parquet" in plan.lower()


def test_gram_index_compact_lifecycle(spark, docs, tmp_path):
    """VERDICT r11 item 4 + ADVICE r11 (medium): batch-distinct appends
    accumulate cross-batch duplicate gram rows; the probe must stay
    set-semantic anyway (left-semi join), and gram_index_compact must
    fold the duplicates out behind the crash-safe swap without changing
    any probe answer."""
    from world_cup_duckdb_spark.operators.dedup_index import (
        _gram_compact_recover,
        gram_index_append,
        gram_index_compact,
        gram_index_persist,
        gram_index_probe_hits,
    )
    from world_cup_duckdb_spark.queries.ext_dedup import _grams

    base = docs.select("doc_id", F.split("text", " ").alias("l"))
    ev = base.filter(F.col("doc_id") % 17 == 0)
    corpus = _grams(base.filter(F.col("doc_id") % 17 != 0))

    loc = str(tmp_path / "gix")
    ev_grams = _grams(ev)
    gram_index_persist(ev_grams, loc)
    expect = sorted(
        tuple(r) for r in gram_index_probe_hits(spark, loc, corpus).collect()
    )
    assert expect

    # Append the SAME gram set twice: worst-case cross-batch overlap.
    gram_index_append(ev_grams, loc)
    gram_index_append(ev_grams, loc)
    ix_path = os.path.join(loc, "grams")
    n_dup = spark.read.parquet(ix_path).count()
    n_set = spark.read.parquet(ix_path).distinct().count()
    assert n_dup == 3 * n_set  # duplicates really are on disk
    # Set-semantic probe: identical hits despite triplicated grams —
    # an inner join would emit each hit three times (ADVICE r11).
    got = sorted(
        tuple(r) for r in gram_index_probe_hits(spark, loc, corpus).collect()
    )
    assert got == expect

    # Compact folds the duplicates; probe unchanged; on-disk rows shrink.
    gram_index_compact(spark, loc)
    assert spark.read.parquet(ix_path).count() == n_set
    got2 = sorted(
        tuple(r) for r in gram_index_probe_hits(spark, loc, corpus).collect()
    )
    assert got2 == expect
    assert not os.path.isfile(os.path.join(loc, "gram_compact_manifest.json"))

    # Crash window: committed manifest + staging present, swap not yet
    # run — the next probe's recovery must roll it forward.
    gram_index_append(ev_grams, loc)
    staging = os.path.join(loc, "grams_compacting")
    (
        spark.read.parquet(ix_path)
        .select("gram")
        .distinct()
        .write.mode("overwrite")
        .parquet(staging)
    )
    with open(os.path.join(loc, "gram_compact_manifest.json"), "w") as fh:
        fh.write('{"op": "gram_compact"}')
    got3 = sorted(
        tuple(r) for r in gram_index_probe_hits(spark, loc, corpus).collect()
    )
    assert got3 == expect
    assert not os.path.isdir(staging)
    assert not os.path.isfile(os.path.join(loc, "gram_compact_manifest.json"))
    assert spark.read.parquet(ix_path).count() == n_set
    _gram_compact_recover(loc)  # idempotent no-op afterwards


def test_stats_reflect_lifecycle(spark, docs, tmp_path):
    """minhash_index_stats must report the tombstone-MASKED view at
    every lifecycle point: fresh index → no pending/masked; after
    delete → live shrinks by exactly the masked docs while pending and
    masked go positive; after compact → pending/masked reset to zero
    with live counts unchanged (compaction changes storage, not the
    probed set)."""
    from world_cup_duckdb_spark.operators.dedup_index import (
        minhash_index_stats,
    )

    loc = str(tmp_path / "stats-ix")
    minhash_index_persist(docs, loc)
    s0 = minhash_index_stats(spark, loc).first()
    assert s0["pending_tombstones"] == 0 and s0["masked_band_rows"] == 0
    assert s0["live_docs"] > 0 and s0["live_band_rows"] > 0

    victims = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    n_victims_with_bands = (
        spark.read.parquet(os.path.join(loc, "bands"))
        .join(victims, "doc_id", "left_semi")
        .select("doc_id")
        .distinct()
        .count()
    )
    minhash_index_delete(spark, loc, victims)
    s1 = minhash_index_stats(spark, loc).first()
    assert s1["pending_tombstones"] == victims.count()  # requested ids
    assert s1["masked_band_rows"] > 0
    assert s1["live_docs"] == s0["live_docs"] - n_victims_with_bands
    assert s1["live_band_rows"] == s0["live_band_rows"] - s1["masked_band_rows"]

    minhash_index_compact(spark, loc)
    s2 = minhash_index_stats(spark, loc).first()
    assert s2["pending_tombstones"] == 0 and s2["masked_band_rows"] == 0
    assert (s2["live_docs"], s2["live_band_rows"]) == (
        s1["live_docs"],
        s1["live_band_rows"],
    )


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
