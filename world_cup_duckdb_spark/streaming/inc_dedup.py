"""Streaming incremental dedup against a PERSISTED signature index:
the probe-then-append cycle (operators/dedup_index.py) run as a real
Structured Streaming ``foreachBatch`` sink.

streaming/neardup.py keeps its dedup state in a Spark state store —
right for one long-lived query, but the state dies with the
checkpoint's engine version and is invisible to batch jobs. This form
holds the state in the persisted MinHash index itself, so the SAME
files serve the nightly batch probe (queries/ext_dedup.py:
ext_inc_dedup_index), the multi-batch backfill
(ext_inc_dedup_multibatch), and this continuous-ingest stream — one
state, three execution modes.

Per micro-batch (the foreachBatch body):

1. probe the batch against the index (one index scan semi-joined down
   to colliding buckets, per-bucket two-min reduction — no pair
   emission, see the operator docstring);
2. WRITE the verdicts to a reliable parquet sink — before the append,
   so a recomputation can never see the mutated index (the same
   durability contract VERDICT r11 item 2 demanded of the batch
   multibatch key, which foreachBatch gives naturally: the sink write
   is the batch's output commit);
3. append the batch's bands to the index (O(batch), partitioned
   parquet append).

Semantics: first-seen-wins in MICRO-BATCH ARRIVAL ORDER — a doc is a
duplicate iff some LSH bucket holds an already-ingested doc or a
smaller-id doc of its own batch; its canonical is the min such id.
When batches arrive in id order this equals the single-shot batch
dedup over the whole corpus (the equality ext_inc_dedup_multibatch
pins); out-of-order arrival degrades to the oracled first-seen-wins
rule (ext_inc_dedup_multibatch_ooo).

Retry semantics (foreachBatch is at-least-once per micro-batch; both
halves of the cycle are retry-idempotent, so the OBSERVABLE result is
exactly-once):

- verdicts land under ``verdicts_path/batch=<batch_id>`` with
  mode=overwrite — a retried batch REPLACES its own output instead of
  appending a duplicate copy (the standard foreachBatch idempotent-sink
  pattern, keyed by the batch id Spark guarantees stable across
  retries);
- a retried append adds duplicate band rows to the index — harmless by
  construction: probe verdicts are per-bucket MINs over the band SET,
  and duplicates don't change a min (pinned in
  tests/test_streaming.py::test_stream_inc_dedup_retry_idempotent).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: (doc_id, text) slice of the documents fixture — streaming parquet
#: sources require an explicit schema.
DOC_ID_TEXT_SCHEMA = "doc_id long, text string"


def stream_inc_dedup(
    spark: SparkSession,
    docs_stream: DataFrame,
    index_path: str,
    verdicts_path: str,
    checkpoint_path: str,
) -> None:
    """Run the probe-then-append cycle over a streaming DataFrame of
    (doc_id, text) until no more data is available (Trigger.AvailableNow
    — drains the source in micro-batches, respecting source rate
    options such as maxFilesPerTrigger, then stops; a production
    deployment drops the trigger and runs forever). Verdict rows land
    under ``verdicts_path`` as (doc_id, canon_id, is_dup)."""
    def _cycle(batch_df: DataFrame, batch_id: int) -> None:
        probe_then_append(
            spark, index_path, verdicts_path, batch_df, batch_id
        )

    (
        docs_stream.writeStream.foreachBatch(_cycle)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def probe_then_append(
    spark: SparkSession,
    index_path: str,
    verdicts_path: str,
    batch_df: DataFrame,
    batch_id: int,
) -> None:
    """One micro-batch body, exposed for retry-idempotence tests: probe
    BEFORE append, and materialize the verdicts to the batch-keyed sink
    before the index files move — the read-back depends only on written
    parquet, never on probe lineage, and a retry overwrites its own
    batch directory instead of duplicating rows."""
    from world_cup_duckdb_spark.operators.dedup_index import (
        minhash_index_append,
        minhash_index_probe_dedup,
    )

    minhash_index_probe_dedup(spark, index_path, batch_df).write.mode(
        "overwrite"
    ).parquet(os.path.join(verdicts_path, f"batch={int(batch_id)}"))
    minhash_index_append(spark, index_path, batch_df)
