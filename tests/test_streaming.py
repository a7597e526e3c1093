"""Structured Streaming tests: streaming output ≡ batch output.

Spark's unified model means the window expressions in
streaming/windows.py are the same ones queries/ext_stream.py runs in
batch; these tests prove it end-to-end: stage the events fixture as a
3-file parquet directory, stream it with maxFilesPerTrigger=1 (3
micro-batches) under an availableNow trigger into a memory sink, and
compare against the batch answers. The multi-batch split matters — it
forces windowed-aggregation and applyInPandasWithState state to merge
across micro-batches, not just within one.
"""

from __future__ import annotations

import math

import pytest

from world_cup_duckdb_spark.sources.catalog import table
from world_cup_duckdb_spark.streaming import (
    dedup_within_watermark,
    read_event_stream,
    sessionize,
    sliding_counts,
    stream_funnel_pairs,
    tumbling_counts,
)
from world_cup_duckdb_spark.streaming.stateful import running_user_profile
from world_cup_duckdb_spark.streaming.windows import EVENT_SCHEMA


@pytest.fixture(scope="module")
def staged(spark, sf_dir, tmp_path_factory):
    """events → 3 parquet files ordered by event time (arrival ≈ event
    order, so watermarks behave as in production)."""
    base = tmp_path_factory.mktemp("events_stream")
    df = table(spark, sf_dir, "events").orderBy("ts", "event_id").toPandas()
    # TIMESTAMP(MICROS) parquet so the streaming reader's declared
    # TimestampType matches (the source fixture is NANOS — catalog gotcha).
    df["ts"] = df["ts"].astype("datetime64[us]")
    third = math.ceil(len(df) / 3)
    import pyarrow as pa
    import pyarrow.parquet as pq

    for i in range(3):
        chunk = df.iloc[i * third : (i + 1) * third]
        tbl = pa.Table.from_pandas(chunk, preserve_index=False)
        pq.write_table(tbl, base / f"events_{i}.parquet")
    return str(base)


def _run_stream(spark, df, mode: str, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _rows(df, cols):
    out = set()
    for r in df.collect():
        out.add(tuple(
            round(r[c], 6) if isinstance(r[c], float) else r[c] for c in cols
        ))
    return out


def test_stream_source_declares_schema(spark, staged):
    stream = read_event_stream(spark, staged)
    assert stream.isStreaming
    assert stream.schema == EVENT_SCHEMA


def test_tumbling_stream_equals_batch(spark, sf_dir, staged):
    stream = read_event_stream(spark, staged)
    got = _run_stream(spark, tumbling_counts(stream), "complete", "t_tumbling")
    from world_cup_duckdb_spark.queries import REGISTRY

    want = REGISTRY["ext_stream_tumbling"].fn(spark, sf_dir)
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_sliding_stream_equals_batch(spark, sf_dir, staged):
    stream = read_event_stream(spark, staged)
    got = _run_stream(spark, sliding_counts(stream), "complete", "t_sliding")
    from world_cup_duckdb_spark.queries import REGISTRY

    want = REGISTRY["ext_stream_sliding"].fn(spark, sf_dir)
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_session_stream_equals_batch(spark, sf_dir, staged):
    stream = read_event_stream(spark, staged)
    got = _run_stream(spark, sessionize(stream), "complete", "t_session")
    from world_cup_duckdb_spark.queries import REGISTRY

    want = REGISTRY["ext_stream_session"].fn(spark, sf_dir)
    cols = ["user_id", "session_start", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_dedup_stream_matches_batch_keys(spark, sf_dir, staged):
    stream = read_event_stream(spark, staged)
    got = _run_stream(
        spark, dedup_within_watermark(stream), "append", "t_dedup"
    )
    from world_cup_duckdb_spark.queries import REGISTRY

    want = REGISTRY["ext_stream_dedup"].fn(spark, sf_dir)
    # First-arrival tie-breaks within a micro-batch are nondeterministic;
    # the kept key set and cardinality are exact.
    assert _rows(got, ["user_id", "event_type"]) == _rows(
        want, ["user_id", "event_type"]
    )
    assert got.count() == want.count()


def test_stream_stream_join_equals_batch(spark, sf_dir, staged):
    """Stream-stream funnel join (watermarked, time-range-bounded state)
    emits exactly the pairs the identical batch join produces — including
    pairs whose click and purchase arrive in different micro-batches."""
    from pyspark.sql import functions as F

    stream = read_event_stream(spark, staged)
    got = _run_stream(spark, stream_funnel_pairs(stream), "append", "t_ssjoin")

    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("then_event_id"),
        "user_id",
        F.col("ts").alias("then_ts"),
    )
    want = clicks.join(
        purchases,
        (F.col("click_user") == F.col("user_id"))
        & (F.col("then_ts") > F.col("click_ts"))
        & (F.col("then_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    cols = ["user_id", "click_event_id", "click_ts", "then_event_id", "then_ts"]
    assert _rows(got, cols) == _rows(want, cols)
    assert got.count() == want.count()


def test_checkpoint_recovery_resumes_not_reprocesses(
    spark, sf_dir, staged, tmp_path_factory
):
    # Production posture: a restarted query with the same checkpoint must
    # resume from committed offsets — the second run over an unchanged
    # source emits nothing new, it does not double-count.
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    out = str(tmp_path_factory.mktemp("out"))

    def run_once():
        q = (
            read_event_stream(spark, staged, max_files_per_trigger=1)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = spark.read.parquet(out).count()
    run_once()  # restart against the same checkpoint: nothing to do
    assert spark.read.parquet(out).count() == first
    batch = table(spark, sf_dir, "events").count()
    assert first == batch


def test_stream_validated_write_clean_and_dirty(
    spark, sf_dir, staged, tmp_path_factory
):
    from pyspark.sql import functions as F
    from world_cup_duckdb_spark.operators.validators import ValidationError
    from world_cup_duckdb_spark.streaming.sinks import stream_validated_write

    # clean stream: event_id PK holds → everything lands
    out = str(tmp_path_factory.mktemp("wap_out"))
    q = stream_validated_write(
        read_event_stream(spark, staged),
        out,
        str(tmp_path_factory.mktemp("wap_ckpt")),
        pk=["event_id"],
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == table(
        spark, sf_dir, "events"
    ).count()

    # dirty stream: collapse every event_id to 0 → duplicate-PK batch must
    # fail the query and write nothing
    dirty = read_event_stream(spark, staged).withColumn(
        "event_id", F.lit(0).cast("long")
    )
    out2 = str(tmp_path_factory.mktemp("wap_out2"))
    q2 = stream_validated_write(
        dirty, out2, str(tmp_path_factory.mktemp("wap_ckpt2")), pk=["event_id"]
    )
    import pyspark.errors

    with pytest.raises(pyspark.errors.StreamingQueryException) as exc:
        q2.awaitTermination(120)
    assert "duplicate PK" in str(exc.value) or "ValidationError" in str(
        exc.value
    )
    import os

    # Walk recursively: the sink writes into batch_id=N subdirectories, so
    # a leaked dirty batch would never appear in the top-level listing.
    leaked = [
        os.path.join(root, f)
        for root, _, files in os.walk(out2)
        for f in files
        if f.endswith(".parquet")
    ]
    assert not leaked, f"dirty batch leaked into the sink: {leaked}"


def test_stateful_profile_accumulates_across_batches(spark, sf_dir, staged):
    stream = read_event_stream(spark, staged, max_files_per_trigger=1)
    got = _run_stream(
        spark, running_user_profile(stream), "update", "t_profile"
    )
    updates = got.collect()
    # Final snapshot per user = the row with that user's max n_events.
    final: dict[int, tuple] = {}
    for r in updates:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (
                r["n_events"], r["total_value"], r["last_event_id"]
            )
    from pyspark.sql import functions as F

    batch = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
            F.max_by("event_id", F.struct("ts", "event_id")).alias("last_id"),
        )
        .collect()
    )
    assert len(updates) > len(final), "no cross-batch state updates happened"
    for r in batch:
        n, total, last_id = final[r["user_id"]]
        assert n == r["n"]
        assert total == pytest.approx(r["total"], rel=1e-9)
        assert last_id == r["last_id"]


def test_transform_with_state_equals_apply_in_pandas_with_state(
    spark, sf_dir, staged
):
    """The transformWithStateInPandas twin must emit the IDENTICAL
    update stream as the applyInPandasWithState form: same per-user
    snapshots, batch for batch (both read the same 3-file source with
    maxFilesPerTrigger=1). Runs on the RocksDB state store provider the
    new API requires; the conf is restored afterwards so the rest of the
    suite keeps the default provider."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's Python worker speaks protobuf to the "
        "JVM state server; the module is absent in this container",
    )
    from world_cup_duckdb_spark.streaming.stateful import (
        running_user_profile_tws,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = read_event_stream(spark, staged, max_files_per_trigger=1)
        got_tws = _run_stream(
            spark, running_user_profile_tws(stream), "update", "t_profile_tws"
        ).collect()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    stream = read_event_stream(spark, staged, max_files_per_trigger=1)
    got_apips = _run_stream(
        spark, running_user_profile(stream), "update", "t_profile_apips"
    ).collect()
    a = sorted(tuple(r) for r in got_tws)
    b = sorted(tuple(r) for r in got_apips)
    assert len(a) > 0
    assert a == b


def test_enrich_stream_equals_batch(spark, sf_dir, staged):
    """Stream-static broadcast join: the streaming enrichment pipeline
    (3 micro-batches probing the static customer dim) must equal the
    batch join+rollup — and the join itself must add no streaming state
    (it's stateless; only the windowed agg keeps state)."""
    from world_cup_duckdb_spark.queries import REGISTRY
    from world_cup_duckdb_spark.streaming import enrich_events

    stream = read_event_stream(spark, staged, max_files_per_trigger=1)
    dim = table(spark, sf_dir, "customer")
    got = _run_stream(spark, enrich_events(stream, dim), "complete", "t_enrich")
    want = REGISTRY["ext_stream_enrich"].fn(spark, sf_dir)
    cols = ["window_start", "c_mktsegment", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_incremental_rollup_matches_batch_and_replay_is_idempotent(
    spark, staged, sf_dir, tmp_path
):
    from world_cup_duckdb_spark.streaming.rollup import (
        _day_partials,
        maintain_day_rollup,
        merge_batch_into_rollup,
        read_rollup,
    )

    path = str(tmp_path / "rollup")
    ck = str(tmp_path / "ck")
    stream = read_event_stream(spark, staged)
    q = maintain_day_rollup(stream, path, ck)
    q.awaitTermination(120)

    def norm(df):
        return sorted(
            (str(r["day"]), r["event_type"], r["n_events"],
             float(r["sum_value"]))
            for r in df.collect()
        )

    # 3 micro-batches of incremental merging == one batch aggregation
    got = read_rollup(spark, path)
    want = _day_partials(
        spark.read.parquet(staged).selectExpr(
            "ts", "event_type", "value"
        )
    )
    assert norm(got) == norm(want)

    # Crash-replay: re-running the LAST micro-batch (same batch_id) must
    # rebuild, not double-count. Drive the merges explicitly (the stream's
    # file→batch_id order is listing-dependent) on a fresh rollup dir.
    import glob

    files = sorted(glob.glob(f"{staged}/events_*.parquet"))
    path2 = str(tmp_path / "rollup2")
    for bid, f in enumerate(files):
        merge_batch_into_rollup(spark.read.parquet(f), bid, path2)
    assert norm(read_rollup(spark, path2)) == norm(want)
    # replay the last batch twice more — result must not change
    merge_batch_into_rollup(spark.read.parquet(files[-1]), 2, path2)
    merge_batch_into_rollup(spark.read.parquet(files[-1]), 2, path2)
    assert norm(read_rollup(spark, path2)) == norm(want)


def test_stream_upsert_table_matches_batch_and_replay_is_fenced(
    spark, sf_dir, staged, tmp_path
):
    """Streaming MERGE-maintained latest-state table: 3 micro-batches of
    upserts must land exactly the batch keep-latest result, and
    replaying an already-committed batch id must be a no-op (the
    exactly-once fence every foreachBatch sink needs)."""
    from pyspark.sql import functions as F

    from world_cup_duckdb_spark.operators.lakehouse import (
        latest_version,
        read_table,
    )
    from world_cup_duckdb_spark.streaming import read_event_stream
    from world_cup_duckdb_spark.streaming.table_sink import (
        _last_batch_id,
        stream_upsert_table,
    )

    path = str(tmp_path / "state_table")
    q = stream_upsert_table(
        read_event_stream(spark, staged, max_files_per_trigger=1),
        path,
        str(tmp_path / "ck"),
    )
    q.awaitTermination(120)

    got = read_table(spark, path)
    want = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(
            F.max_by(
                F.struct("ts", "value", "event_id"),
                F.struct("ts", "event_id"),
            ).alias("_s")
        )
        .select(
            "user_id", "event_type",
            F.col("_s.ts").alias("ts"),
            F.col("_s.value").alias("value"),
            F.col("_s.event_id").alias("event_id"),
        )
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0

    # replay fence: re-running the stream over the unchanged source must
    # commit nothing (offsets say done) and a direct stale-batch call is
    # skipped by the manifest fence
    v_before = latest_version(path)
    q2 = stream_upsert_table(
        read_event_stream(spark, staged, max_files_per_trigger=1),
        path,
        str(tmp_path / "ck"),
    )
    q2.awaitTermination(120)
    assert latest_version(path) == v_before
    assert _last_batch_id(path) is not None


def test_stream_ivm_view_matches_batch_join_and_replay_is_fenced(
    spark, sf_dir, staged, tmp_path
):
    """One stream maintains the fact table AND its materialized join view
    exactly-once: after 3 micro-batches the view must equal
    (batch keep-latest fact) ⋈ dim, and replaying with a fresh checkpoint
    must leave both version histories untouched."""
    from pyspark.sql import functions as F

    from world_cup_duckdb_spark.operators.lakehouse import (
        latest_version,
        read_table,
    )
    from world_cup_duckdb_spark.streaming import read_event_stream
    from world_cup_duckdb_spark.streaming.ivm_sink import (
        stream_maintain_join_view,
    )

    fact = str(tmp_path / "fact")
    view = str(tmp_path / "view")
    dim = spark.createDataFrame(
        [("click", "engage"), ("view", "engage"), ("purchase", "convert"),
         ("signup", "convert"), ("error", "ops")],
        "event_type string, category string",
    )
    q = stream_maintain_join_view(
        read_event_stream(spark, staged, max_files_per_trigger=1),
        fact, view, str(tmp_path / "ck"), dim, join_key="event_type",
    )
    q.awaitTermination(180)

    want = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(
            F.max_by(
                F.struct("ts", "value", "event_id"),
                F.struct("ts", "event_id"),
            ).alias("_s")
        )
        .select(
            "user_id", "event_type",
            F.col("_s.ts").alias("ts"),
            F.col("_s.value").alias("value"),
            F.col("_s.event_id").alias("event_id"),
        )
        .join(dim, "event_type")
    )
    got = read_table(spark, view)
    assert got.count() == want.count()
    assert got.select(*sorted(got.columns)).exceptAll(
        want.select(*sorted(got.columns))
    ).count() == 0
    # fact and view advanced in lockstep
    fv, vv = latest_version(fact), latest_version(view)

    # replay everything from scratch (fresh checkpoint): fully fenced
    q2 = stream_maintain_join_view(
        read_event_stream(spark, staged, max_files_per_trigger=1),
        fact, view, str(tmp_path / "ck2"), dim, join_key="event_type",
    )
    q2.awaitTermination(180)
    assert latest_version(fact) == fv
    assert latest_version(view) == vv


def test_stream_ivm_recovers_first_batch_crash_before_view_write(
    spark, sf_dir, staged, tmp_path
):
    """Crash landing BETWEEN the very first fact write and the first view
    write: on replay the fact fence equals the batch id but the view does
    not exist — recovery must build the initial view from the version-0
    fact snapshot, not diff against a nonexistent version -1."""
    from pyspark.sql import functions as F

    from world_cup_duckdb_spark.operators.lakehouse import (
        latest_version,
        read_table,
        write_table,
    )
    from world_cup_duckdb_spark.streaming import read_event_stream
    from world_cup_duckdb_spark.streaming.ivm_sink import (
        stream_maintain_join_view,
    )

    fact = str(tmp_path / "fact")
    view = str(tmp_path / "view")
    dim = spark.createDataFrame(
        [("click", "engage"), ("view", "engage"), ("purchase", "convert"),
         ("signup", "convert"), ("error", "ops")],
        "event_type string, category string",
    )
    # Simulate the half-committed state: batch 0 (one availableNow batch
    # = the whole backfill) reached the fact table, then the process died
    # before the view write.
    latest0 = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(
            F.max_by(
                F.struct("ts", "value", "event_id"),
                F.struct("ts", "event_id"),
            ).alias("_s")
        )
        .select(
            "user_id", "event_type",
            F.col("_s.ts").alias("ts"),
            F.col("_s.value").alias("value"),
            F.col("_s.event_id").alias("event_id"),
        )
    )
    write_table(latest0, fact, meta={"batch_id": 0})

    q = stream_maintain_join_view(
        read_event_stream(spark, staged),  # no file cap → single batch 0
        fact, view, str(tmp_path / "ck"), dim, join_key="event_type",
    )
    q.awaitTermination(180)

    # fact untouched (fenced), view initialized from the fact snapshot
    assert latest_version(fact) == 0
    assert latest_version(view) == 0
    got = read_table(spark, view)
    want = read_table(spark, fact).join(dim, "event_type")
    assert got.count() == want.count()
    assert got.select(*sorted(got.columns)).exceptAll(
        want.select(*sorted(got.columns))
    ).count() == 0


@pytest.fixture(scope="module")
def staged_docs(spark, sf_dir, tmp_path_factory):
    """The ext_stream_neardup corpus (documents + id-shifted re-crawl)
    staged as 3 parquet files in ASCENDING doc_id order — the arrival
    rule the streaming detector's batch twin assumes (monotone ids)."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F
    from world_cup_duckdb_spark.operators.dedup import with_recrawl

    base = tmp_path_factory.mktemp("docs_stream")
    df = (
        with_recrawl(
            table(spark, sf_dir, "documents").select("doc_id", "text")
        )
        .orderBy("doc_id")
        .toPandas()
    )
    third = math.ceil(len(df) / 3)
    for i in range(3):
        chunk = df.iloc[i * third : (i + 1) * third]
        pq.write_table(
            pa.Table.from_pandas(chunk, preserve_index=False),
            base / f"docs_{i}.parquet",
        )
    return str(base)


def test_streaming_neardup_equals_batch_twin(spark, sf_dir, staged_docs):
    """streaming/neardup.py ≡ ext_stream_neardup: the stateful bucket-hub
    detector, run over 3 micro-batches, flags exactly the documents the
    batch twin flags, with the same matched hub. The multi-batch split
    is the point — cross-batch matches must come out of the state
    store, not the current batch."""
    from world_cup_duckdb_spark.queries import REGISTRY
    from world_cup_duckdb_spark.streaming.neardup import (
        neardup_flags,
        read_document_stream,
        streaming_neardup_band_matches,
    )

    stream = read_document_stream(spark, staged_docs, max_files_per_trigger=1)
    matches = streaming_neardup_band_matches(stream)
    got = _rows(
        neardup_flags(_run_stream(spark, matches, "update", "neardup_m")),
        ["doc_id", "matched_doc", "is_dup"],
    )
    want = _rows(
        REGISTRY["ext_stream_neardup"].fn(spark, sf_dir),
        ["doc_id", "matched_doc", "is_dup"],
    )
    assert got == want and want
    # sanity: the re-crawl guarantees dups exist and novel docs exist
    assert any(r[2] for r in want) and any(not r[2] for r in want)


def test_streaming_neardup_state_survives_restart(
    spark, sf_dir, tmp_path_factory
):
    """Stronger than cross-batch: cross-RUN state recovery. Run 1
    indexes a corpus of novel documents and stops; a re-crawl lands
    AFTER the query stopped; run 2 (same checkpoint) must flag every
    re-crawled document against the bucket hubs recovered from run 1's
    STATE STORE — not against anything in its own input."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from world_cup_duckdb_spark.streaming.neardup import (
        neardup_flags,
        read_document_stream,
        streaming_neardup_band_matches,
    )

    from pyspark.sql import functions as F

    src = tmp_path_factory.mktemp("nd_src")
    out = str(tmp_path_factory.mktemp("nd_out"))
    ckpt = str(tmp_path_factory.mktemp("nd_ckpt"))
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 100)
        .orderBy("doc_id")
        .toPandas()
    )
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        src / "batch0.parquet",
    )

    def run_once():
        q = (
            streaming_neardup_band_matches(
                read_document_stream(spark, str(src), max_files_per_trigger=1)
            )
            .writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()  # run 1: index the originals
    recrawl = docs.copy()
    recrawl["doc_id"] = recrawl["doc_id"] + 1000
    pq.write_table(
        pa.Table.from_pandas(recrawl, preserve_index=False),
        src / "batch1.parquet",
    )
    run_once()  # run 2: only batch1 is new; state comes from the store
    flags = {
        r.doc_id: r
        for r in neardup_flags(spark.read.parquet(out)).collect()
    }
    assert len(flags) == 200
    for d in range(1000, 1100):
        # every re-crawled doc matches a RUN-1 hub (an original id)
        assert flags[d].is_dup, d
        assert flags[d].matched_doc is not None and flags[d].matched_doc < 100


def test_update_bucket_empty_batch_without_state_is_safe():
    """ADVICE r8: the grouped callback may fire with zero rows and no
    existing state (future timeout configs / empty pandas chunks). hub
    stays None — the guard must skip state.update instead of raising
    TypeError(int(None)) and killing the streaming query."""
    import pandas as pd

    from world_cup_duckdb_spark.streaming.neardup import _update_bucket

    class _FakeState:
        exists = False
        updated = None

        def update(self, t):
            self.updated = t

    st = _FakeState()
    out = list(_update_bucket((7,), iter([pd.DataFrame({"doc_id": []})]), st))
    assert len(out) == 1 and len(out[0]) == 0
    assert st.updated is None  # no state written for an empty bucket
    # and a normal batch still records the hub
    st2 = _FakeState()
    out2 = list(
        _update_bucket((7,), iter([pd.DataFrame({"doc_id": [5, 3]})]), st2)
    )
    assert st2.updated == (3,)
    got = out2[0].set_index("doc_id")["matched_doc"]
    assert pd.isna(got[3]) and got[5] == 3


def test_streaming_neardup_midbatch_failure_at_least_once_no_hub_regression(
    spark, sf_dir, tmp_path_factory
):
    """VERDICT r8 item 7: failure INJECTION between state update and sink
    commit. The foreachBatch sink writes the re-crawl batch's output and
    THEN dies (simulating a crash after the stateful tasks committed
    their state-store version but before the batch's commit log entry).
    The restarted query must replay that batch against the PREVIOUS
    committed state version: the sink shows the batch at-least-once
    (duplicated rows), every flagged match still points at a RUN-1 hub
    (an original id — no hub regression from the failed attempt), and
    the DISTINCT output equals the no-failure expectation."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F
    from world_cup_duckdb_spark.streaming.neardup import (
        neardup_flags,
        read_document_stream,
        streaming_neardup_band_matches,
    )

    src = tmp_path_factory.mktemp("ndf_src")
    out = str(tmp_path_factory.mktemp("ndf_out"))
    ckpt = str(tmp_path_factory.mktemp("ndf_ckpt"))
    marker = str(tmp_path_factory.mktemp("ndf_marker") / "crashed")
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 100)
        .orderBy("doc_id")
        .toPandas()
    )
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        src / "batch0.parquet",
    )
    recrawl = docs.copy()
    recrawl["doc_id"] = recrawl["doc_id"] + 1000
    pq.write_table(
        pa.Table.from_pandas(recrawl, preserve_index=False),
        src / "batch1.parquet",
    )

    def crashing_sink(df, _bid):
        # materialize the batch fully (this runs the stateful plan and
        # commits its state-store version), land it in the sink...
        df.write.mode("append").parquet(out)
        # ...then die once, before Structured Streaming records the
        # batch in the commit log — the classic torn sink commit.
        if not os.path.exists(marker) and (
            df.filter(F.col("doc_id") >= 1000).count() > 0
        ):
            open(marker, "w").close()
            raise RuntimeError("injected crash after sink write")

    def run_once():
        q = (
            streaming_neardup_band_matches(
                read_document_stream(spark, str(src), max_files_per_trigger=1)
            )
            .writeStream.foreachBatch(crashing_sink)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    with pytest.raises(Exception, match="injected crash"):
        run_once()
    assert os.path.exists(marker), "injection never fired"
    run_once()  # restart: replays the re-crawl batch from recovered state

    raw = spark.read.parquet(out)
    # at-least-once: the torn batch landed twice (attempt + replay) ...
    recrawl_rows = raw.filter(F.col("doc_id") >= 1000)
    n_distinct = recrawl_rows.distinct().count()
    assert recrawl_rows.count() > n_distinct, "expected duplicated batch"
    # ... and both attempts produced IDENTICAL rows (replay hit the same
    # recovered state version, not state advanced by the failed attempt)
    assert (
        recrawl_rows.groupBy(*recrawl_rows.columns)
        .count()
        .filter(F.col("count") != 2)
        .count()
        == 0
    )
    flags = {
        r.doc_id: r for r in neardup_flags(raw.distinct()).collect()
    }
    assert len(flags) == 200
    for d in range(1000, 1100):
        # no hub regression: every re-crawl doc matches a RUN-1 hub
        assert flags[d].is_dup, d
        assert flags[d].matched_doc is not None and flags[d].matched_doc < 100


def test_streaming_topk_equals_batch_twin(spark, sf_dir, staged):
    """streaming/topk.py ≡ ext_stream_topk: the stateful per-type
    leaderboard, run over 3 micro-batches, converges to exactly the
    batch top-3 per event type. The final emission is the rows carrying
    each type's max update seq; requiring seq >= 2 proves the counts
    actually accumulated ACROSS batches through the state store rather
    than being computed in one trigger."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from world_cup_duckdb_spark.queries import REGISTRY
    from world_cup_duckdb_spark.streaming.topk import (
        read_event_stream as read_events3,
    )
    from world_cup_duckdb_spark.streaming.topk import streaming_topk_per_type

    stream = read_events3(spark, staged, max_files_per_trigger=1)
    out = _run_stream(
        spark, streaming_topk_per_type(stream), "update", "topk_m"
    )
    w = Window.partitionBy("event_type")
    final = out.withColumn("_mx", F.max("seq").over(w)).filter(
        F.col("seq") == F.col("_mx")
    )
    got = _rows(final, ["event_type", "user_id", "n_events", "rank"])
    want = _rows(
        REGISTRY["ext_stream_topk"].fn(spark, sf_dir),
        ["event_type", "user_id", "n_events", "rank"],
    )
    assert got == want and want
    assert out.agg(F.max("seq")).collect()[0][0] >= 2


def test_streaming_ohlc_equals_batch_twin(spark, sf_dir, staged):
    """streaming/windows.py:ohlc_bars ≡ ext_ohlc_bars across 3
    micro-batches: windowed min/max/count partials merge across
    triggers, and the min_by/max_by open/close picks over the (ts,
    event_id) total order land on exactly the rows the batch twin's
    row_number form selects."""
    from world_cup_duckdb_spark.queries import REGISTRY
    from world_cup_duckdb_spark.streaming.windows import (
        ohlc_bars,
        read_event_stream,
    )

    stream = read_event_stream(spark, staged, max_files_per_trigger=1)
    got = _rows(
        _run_stream(spark, ohlc_bars(stream), "append", "ohlc_m"),
        ["bar", "n_events", "open", "high", "low", "close"],
    )
    want = _rows(
        REGISTRY["ext_ohlc_bars"].fn(spark, sf_dir),
        ["bar", "n_events", "open", "high", "low", "close"],
    )
    # append mode only emits windows the watermark has CLOSED; every
    # emitted bar must match the batch bar exactly, and most bars close
    got_map = {r[0]: r for r in got}
    want_map = {r[0]: r for r in want}
    assert got_map, "no bars emitted"
    for bar, row in got_map.items():
        assert row == want_map[bar], (row, want_map[bar])
    assert len(got_map) >= len(want_map) - 3  # only tail windows open


def test_streaming_decontaminate_equals_batch_twin(spark, sf_dir, tmp_path):
    """streaming/decontaminate.py:decontaminate_docs driven from
    readStream (3 micro-batches, append mode) ≡ the batch twin
    ext_stream_decontaminate ≡ the join-form ext_eval_decontaminate —
    the map-only broadcast plan computes the same answer on a stream as
    both batch plans, with zero state to merge across triggers (every
    doc cut in-row on arrival)."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from world_cup_duckdb_spark.queries import REGISTRY
    from world_cup_duckdb_spark.queries.ext_dedup import (
        _grams,
        _token_base,
    )
    from world_cup_duckdb_spark.sources.catalog import table
    from world_cup_duckdb_spark.streaming.decontaminate import (
        DOC_SCHEMA,
        decontaminate_docs,
    )
    from pyspark.sql import functions as F

    # stage documents as 3 parquet files -> 3 micro-batches
    base = tmp_path / "docs_stream"
    base.mkdir()
    pdf = table(spark, sf_dir, "documents").toPandas()
    third = math.ceil(len(pdf) / 3)
    for i in range(3):
        chunk = pdf.iloc[i * third : (i + 1) * third]
        pq.write_table(
            pa.Table.from_pandas(chunk, preserve_index=False),
            base / f"docs_{i}.parquet",
        )

    is_eval = F.col("doc_id") % 17 == 0
    eval_grams = [
        r["gram"]
        for r in _grams(_token_base(spark, sf_dir).filter(is_eval))
        .select("gram")
        .distinct()
        .collect()
    ]
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(base))
        .filter(~is_eval)
    )
    got = _rows(
        _run_stream(
            spark,
            decontaminate_docs(stream, eval_grams),
            "append",
            "decon_stream",
        ),
        ["doc_id", "n_tokens", "n_removed", "clean_text"],
    )
    twin = _rows(
        REGISTRY["ext_stream_decontaminate"].fn(spark, sf_dir),
        ["doc_id", "n_tokens", "n_removed", "clean_text"],
    )
    join_form = _rows(
        REGISTRY["ext_eval_decontaminate"].fn(spark, sf_dir),
        ["doc_id", "n_tokens", "n_removed", "clean_text"],
    )
    assert got == twin == join_form and len(got) > 0


def test_stream_inc_dedup_checkpoint_resume(spark, sf_dir, tmp_path):
    """The index-backed streaming dedup (streaming/inc_dedup.py) must
    survive a stop/restart: drain two staged batch files, stop, stage
    two MORE files, rerun with the SAME checkpoint — the resumed query
    processes only the new files (no double-probe of batches 0-1, which
    would flip their docs to dup-of-self after their append), and the
    final verdict set equals the batch probe-then-append cycle run over
    the same four batches in one go."""
    import glob
    import os
    import shutil
    import time

    from pyspark.sql import functions as F

    from world_cup_duckdb_spark.operators.dedup_index import (
        minhash_index_append,
        minhash_index_persist,
        minhash_index_probe_dedup,
    )
    from world_cup_duckdb_spark.streaming.inc_dedup import (
        DOC_ID_TEXT_SCHEMA,
        stream_inc_dedup,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    delta = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    ids = delta.select(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")).first()
    lo, hi = ids["lo"], ids["hi"]
    width = (hi - lo) // 4 + 1
    batches = [
        delta.filter(
            (F.col("doc_id") >= lo + b * width)
            & (F.col("doc_id") < lo + (b + 1) * width)
        )
        for b in range(4)
    ]

    # Reference: the batch cycle over the same four batches.
    ref_ix = str(tmp_path / "ref-ix")
    minhash_index_persist(docs, ref_ix)
    expect = []
    for b in batches:
        expect.extend(
            tuple(r) for r in minhash_index_probe_dedup(spark, ref_ix, b).collect()
        )
        minhash_index_append(spark, ref_ix, b)
    expect = sorted(expect)

    # Streaming: stage 2 files, drain, stop; stage 2 more, resume.
    ix = str(tmp_path / "ix")
    minhash_index_persist(docs, ix)
    src = str(tmp_path / "incoming")
    os.makedirs(src, exist_ok=True)
    verdicts = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")
    base_t = time.time() - 3600

    def stage(b):
        stage_dir = str(tmp_path / f"stage-{b}")
        batches[b].coalesce(1).write.mode("overwrite").parquet(stage_dir)
        part = glob.glob(os.path.join(stage_dir, "part-*.parquet"))[0]
        dst = os.path.join(src, f"batch-{b}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (base_t + b, base_t + b))

    def run():
        stream = (
            spark.readStream.schema(DOC_ID_TEXT_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        stream_inc_dedup(spark, stream, ix, verdicts, ckpt)

    stage(0), stage(1)
    run()  # drains batches 0-1, stops (AvailableNow)
    n_after_first = len(spark.read.parquet(verdicts).collect())
    stage(2), stage(3)
    run()  # resumes from the checkpoint: only batches 2-3
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(verdicts)
        .select("doc_id", "canon_id", "is_dup")  # drop the batch= key
        .collect()
    )
    assert got == expect
    # The resume really was incremental: the first drain's rows were
    # not reprocessed (their count is exactly the first two batches').
    assert n_after_first == sum(b.count() for b in batches[:2])


def test_stream_inc_dedup_retry_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: re-running a micro-batch body
    (streaming/inc_dedup.py:probe_then_append) with the same batch_id
    must leave the OBSERVABLE state unchanged — verdicts are replaced,
    not duplicated (batch-keyed overwrite sink), and the duplicate band
    rows a re-append adds change no later probe verdict (per-bucket
    mins are duplicate-proof)."""
    from pyspark.sql import functions as F

    from world_cup_duckdb_spark.operators.dedup_index import (
        minhash_index_persist,
        minhash_index_probe_dedup,
    )
    from world_cup_duckdb_spark.streaming.inc_dedup import probe_then_append

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    delta = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    b0 = delta.filter(F.col("doc_id") % 2 == 0)
    b1 = delta.filter(F.col("doc_id") % 2 == 1)

    ix = str(tmp_path / "ix")
    verdicts = str(tmp_path / "verdicts")
    minhash_index_persist(docs, ix)
    probe_then_append(spark, ix, verdicts, b0, 0)
    once = sorted(tuple(r)[:3] for r in spark.read.parquet(verdicts).collect())
    # RETRY batch 0: same batch_id, body re-runs end to end.
    probe_then_append(spark, ix, verdicts, b0, 0)
    twice = sorted(tuple(r)[:3] for r in spark.read.parquet(verdicts).collect())
    assert twice == once  # overwrite sink: no duplicate verdict rows
    # Batch 1's verdicts are unaffected by batch 0's duplicate bands:
    # identical to probing against a never-retried reference index.
    ref = str(tmp_path / "ref")
    minhash_index_persist(docs, ref)
    probe_then_append(spark, ref, str(tmp_path / "rv"), b0, 0)
    expect_b1 = sorted(
        tuple(r) for r in minhash_index_probe_dedup(spark, ref, b1).collect()
    )
    got_b1 = sorted(
        tuple(r) for r in minhash_index_probe_dedup(spark, ix, b1).collect()
    )
    assert got_b1 == expect_b1
