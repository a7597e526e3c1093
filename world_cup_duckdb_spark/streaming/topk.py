"""Streaming top-k maintenance: the leaderboard a live pipeline keeps.

Events arrive as a stream; per ``event_type`` the operator maintains
exact per-user counts as keyed state (applyInPandasWithState) and emits
the current top-k after every trigger. The batch twin is the registry
key ``ext_stream_topk`` (hash-checked vs DuckDB); tests/test_streaming.py
proves the stream's FINAL emission equals the batch answer across
micro-batch splits — counts are order-independent, so the equivalence is
exact whatever the arrival order.

Scale: state is O(distinct users per type) longs, partitioned by the
group key — the exact form. When user cardinality is unbounded, swap the
dict for a space-saving / Misra-Gries summary (k counters per group,
guaranteed-overcount bounds) without changing the operator shape; the
exact form is kept here because the batch-equivalence pin and the DuckDB
oracle require exact counts.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:
    import pandas as pd

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)

#: Per-type state: parallel user/count arrays + a monotone update seq.
TOPK_STATE = T.StructType(
    [
        T.StructField("users", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("seq", T.LongType()),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField("seq", T.LongType()),
    ]
)

TOP_K = 3


def read_event_stream(
    spark, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Parquet event stream with a DECLARED schema (streaming readers
    never infer)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def _update_topk(
    key: tuple[Any, ...],
    pdfs: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    if state.exists:
        users, counts, seq = state.get
        tally = dict(zip((int(u) for u in users), (int(c) for c in counts)))
        seq = int(seq)
    else:
        tally = {}
        seq = 0
    n_new = 0
    for pdf in pdfs:
        n_new += len(pdf)
        for u in pdf["user_id"]:
            u = int(u)
            tally[u] = tally.get(u, 0) + 1
    if n_new == 0 and not tally:
        # zero-row callback with no prior state: nothing to emit or
        # record (same guard rationale as neardup's _update_bucket)
        yield pd.DataFrame(
            {c.name: pd.array([], dtype="object") for c in OUT_SCHEMA}
        ).astype(
            {
                "event_type": "object",
                "user_id": "int64",
                "n_events": "int64",
                "rank": "int32",
                "seq": "int64",
            }
        )
        return
    seq += 1
    items = sorted(tally.items())
    state.update(
        ([u for u, _ in items], [c for _, c in items], seq)
    )
    top = sorted(tally.items(), key=lambda t: (-t[1], t[0]))[:TOP_K]
    yield pd.DataFrame(
        {
            "event_type": pd.array([key[0]] * len(top), dtype="object"),
            "user_id": pd.array([u for u, _ in top], dtype="int64"),
            "n_events": pd.array([c for _, c in top], dtype="int64"),
            "rank": pd.array(range(1, len(top) + 1), dtype="int32"),
            "seq": pd.array([seq] * len(top), dtype="int64"),
        }
    )


def streaming_topk_per_type(events: DataFrame) -> DataFrame:
    """Current top-{TOP_K} users per event type, re-emitted after every
    trigger that touches the type (rows carry a per-type update ``seq``;
    the latest seq is the live leaderboard)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _update_topk,
        outputStructType=OUT_SCHEMA,
        stateStructType=TOPK_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
