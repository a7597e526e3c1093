"""Reshape operators: diagonal union, unpivot, deterministic surrogate keys.

These re-express the reference's Polars reshape vocabulary (SURVEY.md §2.5)
with built-in Spark operators — chosen so every one of them scales: no
driver-side collection, no Python in the row path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from world_cup_duckdb_spark.functions.strings import (
    bounded_one_partition as _one,
)


def diagonal_union(frames: Sequence[DataFrame]) -> DataFrame:
    """Union-by-name of differently-shaped frames; missing columns → null.

    Reference: ``pl.concat(how='diagonal')`` of goals + melted bookings +
    melted substitutions (scripts/build_db.py:1048-1102, OP31). Spark's
    ``unionByName(allowMissingColumns=True)`` has identical semantics and
    is a zero-shuffle operator (pure plan-level concatenation).
    """
    if not frames:
        raise ValueError("diagonal_union requires at least one frame")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def unpivot_measures(
    df: DataFrame,
    ids: Sequence[str],
    measures: Sequence[str],
    variable_col: str = "variable",
    value_col: str = "value",
) -> DataFrame:
    """Wide→long unpivot with a unified double value column.

    Reference: ``melt(id_vars=[...])`` over event-flag columns
    (scripts/build_db.py:1065-1081, :1083-1099, OP32). Casting measures to
    double up-front avoids Spark's unpivot type-unification error when
    measures mix int/double (SURVEY.md §7 hard part 3). Unpivot is a
    narrow operator — each row expands locally, no shuffle.
    """
    casted = df.select(
        *ids, *[F.col(m).cast("double").alias(m) for m in measures]
    )
    return casted.unpivot(list(ids), list(measures), variable_col, value_col)


def surrogate_key(
    df: DataFrame,
    prefix: str,
    order_by: Sequence[str | Column],
    key_col: str = "id",
) -> DataFrame:
    """Dense 1-based prefixed surrogate keys: ``'CTY-' || row_number``.

    Reference: ``unique() → with_row_count(offset=1) → 'CTY-' + str``
    (scripts/build_db.py:141-144 and 4 more sites, OP33). Two deliberate
    deviations from the reference, per SURVEY.md §7 hard part 1:

    - ``row_number().over(Window.orderBy(natural key))`` instead of an
      input-order row count: Polars' unique()+row-count order is itself
      unstable, and on distributed data input order is undefined — an
      explicit natural-key order is the only deterministic choice.
    - NOT ``monotonically_increasing_id`` — that is non-dense (partition
      gaps) and non-reproducible.

    Scale note: a global window without partitionBy funnels through one
    task. That is exactly what a *dense global* sequence requires
    (it's an inherently sequential contract) and is only used for
    dimension tables (≤10⁵ rows). Fact-scale keying should use natural or
    composite keys instead.
    """
    # NULLS LAST explicitly: Spark's ASC default is nulls-first, ANSI
    # SQL engines' (DuckDB, Postgres) is nulls-last — a null natural key
    # would otherwise take id 1 and shift every real key by one.
    w = Window.orderBy(*[F.col(c).asc_nulls_last() for c in order_by])
    return df.withColumn(
        key_col, F.concat(F.lit(prefix), F.row_number().over(w).cast("string"))
    )


def surrogate_key_distributed(
    df: DataFrame,
    prefix: str,
    order_by: Sequence[str],
    key_col: str = "id",
    n_ranges: int | None = None,
) -> DataFrame:
    """Dense 1-based prefixed surrogate keys WITHOUT a global window —
    the fact-scale form of :func:`surrogate_key`.

    The single-task global sort that a dense sequence seems to require is
    decomposed into three scalable steps:

    1. ``repartitionByRange(order_by) + sortWithinPartitions`` — a range
       shuffle puts globally-ordered, non-overlapping key ranges in each
       partition (every partition sorted internally, partitions ordered
       by partition id).
    2. An order-preserving Arrow ``mapInPandas`` assigns each row its
       local 0-based index within its partition — pure per-partition
       streaming, no state crosses partitions.
    3. Per-partition row counts (one row per partition) get a running-sum
       window — over ≤ ``n_ranges`` rows, never data — and the offsets
       broadcast back: ``global_id = offset(pid) + local_index + 1``.

    The intermediate is materialized (``localCheckpoint``) because BOTH
    the count aggregate and the final join consume it: without the
    truncation the range shuffle could re-execute with different sampled
    partition boundaries for each consumer, and offsets computed from one
    partitioning would be applied to another — silently wrong ids. With
    unique ``order_by`` keys the assignment equals
    ``ROW_NUMBER() OVER (ORDER BY order_by)`` exactly.
    """
    from pyspark.sql import types as T

    spark = df.sparkSession
    if n_ranges is None:
        n_ranges = spark.sparkContext.defaultParallelism
    cols = df.columns
    # asc_nulls_last on BOTH the range shuffle and the in-partition sort,
    # matching surrogate_key / ANSI ROW_NUMBER (Spark's default would
    # range nulls into the first partition and number them first).
    order_cols = [F.col(c).asc_nulls_last() for c in order_by]
    ranged = (
        df.repartitionByRange(n_ranges, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    # NOT schema.add(...): StructType.add mutates the receiver in place,
    # and ranged.schema is the live cached schema of the input plan.
    out_schema = T.StructType(
        list(ranged.schema.fields) + [T.StructField("_local", T.LongType())]
    )

    def add_local(batches):
        i = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["_local"] = range(i, i + len(pdf))
            i += len(pdf)
            yield pdf

    indexed = ranged.mapInPandas(add_local, schema=out_schema).localCheckpoint(
        eager=True
    )
    counts = indexed.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    # bounded (<= n_ranges count rows) global window: constant partition
    # key so WindowExec's no-partition warning stays a true alarm for
    # corpus-grain windows (see functions.bounded_one_partition)
    w = (
        Window.partitionBy(_one("_pid"))
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(w), F.lit(0)).alias("_offset")
    )
    return (
        indexed.join(F.broadcast(offsets), "_pid")
        .withColumn(
            key_col,
            F.concat(
                F.lit(prefix),
                (F.col("_offset") + F.col("_local") + 1).cast("string"),
            ),
        )
        .select(key_col, *cols)
    )


def _guard_reserved(df: DataFrame, *names: str) -> None:
    """Reject inputs that already carry one of the operator's internal
    scratch columns. The distributed_* decompositions add-then-drop
    columns like ``_pid``/``_localmax``; a pre-existing column with the
    same name would be silently overwritten and dropped — wrong results
    with no error (ADVICE r8; same contract as positional_join's
    ``_pos`` guard)."""
    clash = [c for c in names if c in df.columns]
    if clash:
        raise ValueError(
            f"input already has reserved internal column(s) {clash}; "
            "rename them before calling this operator"
        )


def _norm_order(order_by: Sequence[str | Column]) -> list[Column]:
    """Normalize order keys: bare column names get ANSI asc-nulls-last
    (Spark's asc default is nulls-FIRST; DuckDB/Postgres rank nulls
    last, and every oracle in the registry assumes the ANSI order).
    Column expressions pass through — callers own their null order."""
    return [
        F.col(c).asc_nulls_last() if isinstance(c, str) else c
        for c in order_by
    ]


def _ranged(
    df: DataFrame,
    order_by: Sequence[str | Column],
    n_ranges: int | None,
) -> DataFrame:
    """Range-partition ``df`` on the order keys, tag rows with ``_pid``,
    and materialize ONCE (``localCheckpoint``) — the shared first step of
    every distributed_* decomposition. Materialization rationale and the
    fault-tolerance trade are documented on :func:`_ranged_offsets`."""
    spark = df.sparkSession
    if n_ranges is None:
        n_ranges = spark.sparkContext.defaultParallelism
    order_cols = _norm_order(order_by)
    ranged = (
        df.repartitionByRange(n_ranges, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # Release the checkpoint's block-cached RDD with the query scope
    # (DataFrame.unpersist can't reach it; see tracking.py). The handle
    # is the LogicalRDD the checkpointed frame is rooted at.
    from world_cup_duckdb_spark import tracking

    try:
        _jrdd = ranged._jdf.queryExecution().analyzed().rdd()
    except Exception:
        _jrdd = None  # plan shape changed upstream: fall back to GC release
    if _jrdd is not None:
        tracking.track_release(lambda: _jrdd.unpersist(False))
    return ranged


def _ranged_offsets(
    df: DataFrame,
    order_by: Sequence[str | Column],
    n_ranges: int | None,
    weight: Column | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Shared scaffold of the distributed global-window family: range-
    partition ``df`` on the order keys, and compute per-partition
    EXCLUSIVE prefix offsets (row counts, or ``weight`` sums) plus the
    grand total.

    This is the same three-step decomposition
    :func:`surrogate_key_distributed` pioneered — a range shuffle gives
    non-overlapping, globally-ordered key ranges per partition; anything
    "global running" then splits into a partition-LOCAL part (scale-safe:
    a window partitioned by partition id) plus a broadcast per-partition
    offset — generalized so ranks, ntiles, and running sums all reuse it
    (VERDICT r6 item 4).

    The ranged relation is materialized once (``localCheckpoint``)
    because two consumers derive from it (the offsets aggregate and the
    caller's main expression): without the lineage cut the range shuffle
    could re-execute with differently-sampled boundaries per consumer
    and offsets from one partitioning would be applied to another.
    ``persist()`` would NOT be a safe substitute: an evicted/lost cache
    block silently recomputes with re-sampled boundaries — wrong rows —
    whereas lost checkpoint blocks FAIL the job, which retries the whole
    query from source (fault-tolerance trade, ADVICE r7: on a real
    cluster an executor loss costs a query retry, never a wrong answer;
    swap in reliable ``checkpoint()`` against a checkpoint dir if
    retries are too expensive at your scale). The checkpoint blocks are
    scoped to the current registry query via tracking.track_release —
    the next query's entry unpersists them, so the driver's multi-
    hundred-query loop never accumulates checkpoint storage.

    Equal order keys always land in ONE partition (the range partitioner
    maps each key deterministically), so tie groups never straddle an
    offset boundary. Skew caveat: a single key with more rows than fits
    one executor partition is the caller's salting problem — the same
    caveat every ORDER BY PARTITION carries.

    Returns ``(ranged, offsets)``: ``ranged`` is ``df`` plus ``_pid``;
    ``offsets`` has one row per non-empty partition with ``_offset``
    (exclusive prefix total of earlier partitions) and ``_total`` (grand
    total) — ≤ ``n_ranges`` rows, always broadcast-sized.
    """
    ranged = _ranged(df, order_by, n_ranges)
    part = F.count(F.lit(1)) if weight is None else F.sum(weight)
    counts = ranged.groupBy("_pid").agg(part.alias("_n"))
    w_run = (
        Window.partitionBy(_one("_pid"))
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(_one("_pid")).orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_n").over(w_run), F.lit(0)).alias("_offset"),
        F.sum("_n").over(w_all).alias("_total"),
    )
    return ranged, offsets


def distributed_row_number(
    df: DataFrame,
    order_by: Sequence[str | Column],
    out_col: str = "rn",
    n_ranges: int | None = None,
) -> DataFrame:
    """Exact ``ROW_NUMBER() OVER (ORDER BY order_by)`` (1-based) without
    a single-partition window: global rank = broadcast partition offset
    + partition-local row_number. The only windows in the plan are
    partitioned by ``_pid`` (the local rank) or run over the ≤n_ranges
    offset rows — no window ever sees the data in one task.

    With a total (duplicate-free) order the assignment is deterministic
    and equals the ANSI window exactly; among tied keys the numbering is
    arbitrary, same as any ROW_NUMBER over a non-total order.
    """
    _guard_reserved(df, "_pid", "_local", "_offset", "_total")
    ranged, offsets = _ranged_offsets(df, order_by, n_ranges)
    w_local = Window.partitionBy("_pid").orderBy(*_norm_order(order_by))
    return (
        ranged.withColumn("_local", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_offset") + F.col("_local")).cast("bigint"))
        .drop("_pid", "_local", "_offset", "_total")
    )


def distributed_ntile(
    df: DataFrame,
    n: int,
    order_by: Sequence[str | Column],
    out_col: str = "tile",
    n_ranges: int | None = None,
) -> DataFrame:
    """Exact ``NTILE(n) OVER (ORDER BY order_by)`` without a single-
    partition window. ANSI NTILE gives the first ``N mod n`` tiles
    ``N div n + 1`` rows and the rest ``N div n``; with the global rank
    ``i`` from the offset decomposition and the grand total ``N``
    (carried on the broadcast offsets row), the tile is closed-form:

        q, r = N div n, N mod n
        tile(i) = (i-1) div (q+1) + 1                  if i <= r*(q+1)
                  r + (i - r*(q+1) - 1) div q + 1      otherwise

    (``N < n`` degenerates to ``tile = i`` via the first branch.)
    Tie caveat as :func:`distributed_row_number`; tile COUNTS are exact
    regardless of tie order.

    All arithmetic is BIGINT integral division (``div``), never double
    ``/`` + ``floor`` — double division loses exactness once counts
    approach 2^53, which the 100 TB design point can reach (ADVICE r7).
    """
    _guard_reserved(df, "_pid", "_local", "_offset", "_total")
    ranged, offsets = _ranged_offsets(df, order_by, n_ranges)
    w_local = Window.partitionBy("_pid").orderBy(*_norm_order(order_by))
    i = F.col("_offset") + F.col("_local")
    q = F.expr(f"_total div {int(n)}")
    r = F.col("_total") % n
    head = r * (q + 1)

    def _idiv(num: Column, den: Column) -> Column:
        return F.call_function("div", num.cast("bigint"), den.cast("bigint"))

    tile = F.when(
        i <= head, _idiv(i - 1, q + 1) + 1
    ).otherwise(r + _idiv(i - head - 1, q) + 1)
    return (
        ranged.withColumn("_local", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, tile.cast("int"))
        .drop("_pid", "_local", "_offset", "_total")
    )


def distributed_running_sum(
    df: DataFrame,
    order_by: Sequence[str | Column],
    value: str | Column,
    out_col: str = "running",
    n_ranges: int | None = None,
    inclusive: bool = True,
) -> DataFrame:
    """Exact global running sum — ``SUM(value) OVER (ORDER BY order_by
    ROWS UNBOUNDED PRECEDING [AND -1])`` — without a single-partition
    window: partition-local running sum + the broadcast exclusive prefix
    of per-partition totals. ``inclusive=False`` gives the
    rows-to-previous form (0 for the first row, never NULL).

    The value column is summed as-is: pass an exact type (bigint /
    decimal) when cross-engine bit-equality matters, as the registry's
    determinism rules require.

    PRECONDITION (ADVICE r7): ``value`` must be NON-NULL on every row.
    ANSI ``SUM OVER`` skips NULLs and returns NULL only when the whole
    frame is NULL-valued; reproducing that exactly would need a second
    non-null running count. This decomposition instead coalesces the
    EMPTY frame (first row under ``inclusive=False``) to 0 — the
    documented never-NULL contract — and with NULL values present an
    all-NULL prefix frame would diverge from the window form (0 / offset
    instead of NULL). Every registry caller feeds a non-null expression;
    new callers must ``coalesce`` or filter first.
    """
    _guard_reserved(df, "_pid", "_w", "_localsum", "_offset", "_total")
    val = F.col(value) if isinstance(value, str) else value
    ranged, offsets = _ranged_offsets(
        df.withColumn("_w", val), order_by, n_ranges, weight=F.col("_w")
    )
    upper = 0 if inclusive else -1
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*_norm_order(order_by))
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    zero = F.lit(0).cast("bigint")
    local = F.sum("_w").over(w_local)
    if not inclusive:
        # Only the empty first frame can be NULL under the non-null
        # precondition; inclusive frames are never empty, so no coalesce
        # (masking a violated precondition with 0 would be silent).
        local = F.coalesce(local, zero)
    return (
        ranged.withColumn("_localsum", local)
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_offset") + F.col("_localsum"))
        .drop("_pid", "_w", "_localsum", "_offset", "_total")
    )


def distributed_running_max(
    df: DataFrame,
    order_by: Sequence[str | Column],
    value: str | Column,
    out_col: str = "running_max",
    n_ranges: int | None = None,
    inclusive: bool = False,
) -> DataFrame:
    """Exact global running max — ``MAX(value) OVER (ORDER BY order_by
    ROWS UNBOUNDED PRECEDING [AND -1])`` — without a single-partition
    window: partition-local running max combined (``greatest``) with the
    broadcast max over all EARLIER partitions. Same range-shuffle
    decomposition as :func:`distributed_running_sum`; max needs no
    weight plumbing because per-partition maxes combine associatively.

    NULL semantics match the ANSI window exactly: MAX skips NULL values,
    and the result is NULL only when the frame holds no non-null value
    (``greatest`` returns NULL only when every argument is NULL) — the
    empty exclusive first frame is therefore NULL, as the window form
    gives. Tie caveat as :func:`distributed_row_number` for rows equal
    on the full order key (an exclusive frame is order-sensitive among
    ties); with a total order the result is deterministic and exact.
    """
    _guard_reserved(df, "_pid", "_v", "_localmax", "_prevmax", "_pm")
    val = F.col(value) if isinstance(value, str) else value
    ranged = _ranged(df.withColumn("_v", val), order_by, n_ranges)
    per_part = ranged.groupBy("_pid").agg(F.max("_v").alias("_pm"))
    w_run = (
        Window.partitionBy(_one("_pid"))
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_part.select(
        "_pid", F.max("_pm").over(w_run).alias("_prevmax")
    )
    upper = 0 if inclusive else -1
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*_norm_order(order_by))
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    return (
        ranged.withColumn("_localmax", F.max("_v").over(w_local))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.greatest(F.col("_localmax"), F.col("_prevmax")))
        .drop("_pid", "_v", "_localmax", "_prevmax")
    )


def distributed_lead(
    df: DataFrame,
    order_by: Sequence[str | Column],
    cols: Sequence[str],
    suffix: str = "_next",
    n_ranges: int | None = None,
) -> DataFrame:
    """Exact ``LEAD(col) OVER (ORDER BY order_by)`` for each name in
    ``cols`` — without a single-partition window. Same range-shuffle
    decomposition as the rest of the distributed_* family, plus the
    boundary-row handoff an adjacency operator needs:

    1. Range-partition on the order keys (``_ranged``): non-overlapping,
       globally-ordered key ranges per partition.
    2. Partition-local LEAD (window partitioned by ``_pid`` — scale-safe)
       fills every row except each partition's LAST, whose successor
       lives in the next partition.
    3. The FIRST row of every non-empty partition (one row per partition,
       ≤ ``n_ranges`` total) is extracted, each tagged — via a bounded
       LAG over the partition ids — with the PREVIOUS non-empty
       partition it is the successor for, and broadcast-joined back to
       patch exactly those last rows. Empty range partitions drop out of
       the firsts relation, so the handoff skips them correctly.

    The global last row keeps NULL leads, as ANSI LEAD gives. Last rows
    are detected with ``LEAD(1) IS NULL`` (a literal probe), not
    ``LEAD(col) IS NULL`` — a legitimately-NULL next value must not be
    mistaken for a partition boundary. Tie caveat as
    :func:`distributed_row_number`: pass a total order for deterministic
    successor assignment.
    """
    scratch = ["_pid", "_is_last", "_prev_pid"] + [f"_h_{c}" for c in cols]
    _guard_reserved(df, *scratch, "_rn", *[c + suffix for c in cols])
    ranged = _ranged(df, order_by, n_ranges)
    order_cols = _norm_order(order_by)
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    led = ranged.select(
        "*",
        *[F.lead(c).over(w_local).alias(c + suffix) for c in cols],
        F.lead(F.lit(1)).over(w_local).isNull().alias("_is_last"),
    )
    firsts = (
        ranged.withColumn("_rn", F.row_number().over(w_local))
        .filter(F.col("_rn") == 1)
        .select("_pid", *cols)
    )
    w_b = Window.partitionBy(_one("_pid")).orderBy("_pid")
    handoff = firsts.select(
        F.lag("_pid").over(w_b).alias("_prev_pid"),
        *[F.col(c).alias(f"_h_{c}") for c in cols],
    ).filter(F.col("_prev_pid").isNotNull())
    out = led.join(
        F.broadcast(handoff), led["_pid"] == handoff["_prev_pid"], "left"
    )
    for c in cols:
        out = out.withColumn(
            c + suffix,
            F.when(F.col("_is_last"), F.col(f"_h_{c}")).otherwise(
                F.col(c + suffix)
            ),
        )
    return out.drop(*scratch)


def positional_join(
    left: DataFrame,
    right: DataFrame,
    left_order: Sequence[str | Column],
    right_order: Sequence[str | Column],
    n_ranges: int | None = None,
) -> DataFrame:
    """DuckDB ``POSITIONAL JOIN`` semantics, made well-defined for a
    distributed engine: zip the two relations row-by-row under EXPLICIT
    total orders (DuckDB zips physical row order, which a distributed
    table doesn't have — callers must say what "position" means), with
    the shorter side NULL-padded to the longer one (DuckDB pads the same
    way).

    Scale: each side gets a global position from
    :func:`distributed_row_number` (range shuffle + broadcast offsets —
    no single-task window), then a plain equi-join on the position
    column; output length = max(|left|, |right|) via full-outer join.
    """
    clash = [c for c in ("_pos",) if c in left.columns or c in right.columns]
    if clash:
        raise ValueError(
            f"positional_join reserves column {clash}; rename it first"
        )
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            "positional_join output would have ambiguous columns "
            f"{sorted(overlap)}; alias one side first"
        )
    l = distributed_row_number(left, left_order, "_pos", n_ranges)
    r = distributed_row_number(right, right_order, "_pos", n_ranges)
    return l.join(r, "_pos", "full_outer").drop("_pos")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
) -> DataFrame:
    """As-of join: for each left row, attach the right row with the
    greatest ``right_ts`` ≤ ``left_ts`` within the same ``key`` (inner:
    left rows with no prior right row are dropped) — the time-series
    operator Spark lacks natively (DuckDB: ``ASOF JOIN``; the oracle in
    queries/ext_events.py uses exactly that).

    Implementation is the scalable single-shuffle union+window technique,
    NOT a range cross-join: tag both inputs, union them, sort within each
    key by (ts, side) with right rows first on ties (≤ semantics), and
    carry the latest right payload forward with ``last(..., ignorenulls)``
    over an unbounded-preceding running window. One exchange on ``key``,
    one sort — O(n log n) per key regardless of how many right rows
    precede each left row.
    """
    # null struct literals need the payload struct's exact type
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.select(
            F.struct(*[F.col(c) for c in left.columns]).alias("s")
        ).schema["s"].dataType.simpleString()).alias("_lpay"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_rpay"),
    )
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lpay"),
        F.lit(None).cast(right.select(
            F.struct(*[F.col(c) for c in right_cols]).alias("s")
        ).schema["s"].dataType.simpleString()).alias("_rpay"),
    )
    unioned = l_tag.unionByName(r_tag)
    # Final _rpay tie-break: two right rows sharing (key, ts) would
    # otherwise make the carried pick partition-order-dependent (and
    # DuckDB's native ASOF JOIN is likewise unspecified under right-side
    # ts ties). Ordering by the payload struct makes the pick the MAX
    # payload (lexicographic on right_cols) — deterministic on both
    # engines when the oracle dedupes ties the same way.
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_rpay")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_r", F.last("_rpay", ignorenulls=True).over(w)
    )
    out = carried.filter((F.col("_side") == 1) & F.col("_r").isNotNull())
    cols = [F.col(f"_lpay.{c}").alias(c) for c in left.columns] + [
        F.col(f"_r.{c}").alias(c) for c in right_cols
    ]
    return out.select(*cols)


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Range-containment join (point ∈ [start, end]) without a cross
    join — the interval-overlap operator Spark has no native strategy
    for. Each interval explodes into the coarse time buckets it covers;
    points bucket by the same grain; candidates equi-join on the bucket
    and the exact containment predicate filters within — shuffle cost is
    O(points + Σ interval-spans), never |points| × |intervals|.

    Bucketing is epoch arithmetic (µs-exact). Pick ``bucket_seconds``
    near the median interval length: too coarse inflates candidates, too
    fine inflates the interval explosion.

    Output: all (point, interval) pairs with containment, deduplicated
    (an interval spanning several buckets meets its points once per
    shared bucket).
    """
    bus = bucket_seconds * 1_000_000

    def to_bucket(c: Column) -> Column:
        return F.floor(F.unix_micros(c) / bus).cast("long")

    p = points.withColumn("_b", to_bucket(F.col(point_ts)))
    i = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(to_bucket(F.col(start_ts)), to_bucket(F.col(end_ts)))
        ),
    )
    joined = p.join(i, "_b").filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    )
    return joined.drop("_b").distinct()
