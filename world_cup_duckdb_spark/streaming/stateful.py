"""Custom stateful streaming operator: per-key running profile via
``applyInPandasWithState`` (SURVEY.md §2.8 extension surface).

This is the shape for stateful logic the built-in windowed aggregates
can't express — running snapshots emitted on every update, custom merge
rules, model-state accumulation. State lives in Spark's state store
(checkpointed, partitioned by key hash); each micro-batch the operator
receives only the keys present in that batch, as Arrow-batched pandas
frames.

Scale notes: state size is O(distinct keys), not O(events); the groupBy
shuffles each micro-batch by key so state access is executor-local.
Always pair with a timeout (or watermark-bounded keys) in production so
abandoned keys expire — here ``NoTimeout`` keeps the example exact vs
the batch oracle.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:
    import pandas as pd

#: Output: one snapshot row per key per micro-batch it appears in.
PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_event_id", T.LongType()),
    ]
)

#: State per user: running (count, sum, latest event id by ts order).
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("last_id", T.LongType()),
    ]
)


def _update_profile(
    key: tuple[Any, ...],
    pdfs: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    n, total, last_us, last_id = (
        state.get if state.exists else (0, 0.0, -1, -1)
    )
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        latest = pdf.sort_values(["ts", "event_id"]).iloc[-1]
        cand = (int(pd.Timestamp(latest["ts"]).value), int(latest["event_id"]))
        if cand > (last_us, last_id):
            last_us, last_id = cand
    # State keeps the UNROUNDED running sum — rounding only the emitted
    # snapshot. Storing round(total, 6) would accumulate the next batch
    # on top of an already-truncated value, drifting the running total
    # away from the batch-sum-then-round result by up to 5e-7 per batch.
    state.update((n, total, last_us, last_id))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 6)],
            "last_event_id": [last_id],
        }
    )


def running_user_profile(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_value, latest event) snapshots,
    one output row per user per micro-batch — cross-batch state proves
    the state store round-trip (tests/test_streaming.py)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_profile_tws(events: DataFrame) -> DataFrame:
    """The same running profile through ``transformWithStateInPandas`` —
    Spark 4's successor stateful API (SPARK-46815, arbitrary state v2):
    typed state handles (value/list/map state per key), timers, and
    initial-state seeding, on the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` must point at
    RocksDBStateStoreProvider — the API refuses the default HDFS-backed
    store). Semantics here are identical to :func:`running_user_profile`
    by construction (same accumulation, same unrounded-state/rounded-emit
    discipline), which the equivalence test asserts batch-for-batch.

    Environment gate: the API's Python worker requires ``protobuf``
    (it speaks the arbitrary-state-v2 protocol to the JVM state server);
    where the module is absent the equivalence test skips and
    :func:`running_user_profile` remains the portable form — both emit
    the same stream, so callers lose no capability, only the newer
    engine (timers, list/map state, initial-state seeding)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _ProfileProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("profile", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            n, total, last_us, last_id = (
                self._state.get() if self._state.exists() else (0, 0.0, -1, -1)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                latest = pdf.sort_values(["ts", "event_id"]).iloc[-1]
                cand = (
                    int(pd.Timestamp(latest["ts"]).value),
                    int(latest["event_id"]),
                )
                if cand > (last_us, last_id):
                    last_us, last_id = cand
            # Unrounded state, rounded emission — same discipline as
            # _update_profile (see the comment there).
            self._state.update((n, total, last_us, last_id))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 6)],
                    "last_event_id": [last_id],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_ProfileProcessor(),
        outputStructType=PROFILE_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
