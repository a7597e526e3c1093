"""Skew & co-location operators — the shuffle-management toolkit for the
100 TB design point (SURVEY.md Phase 5 scale design).

Three mechanisms Spark needs explicit help with when AQE's runtime skew
splitting isn't enough or when a shuffle can be designed away entirely:

- **Salted replicated join**: a hot key overwhelms one reducer in a
  shuffle join. Replicate the small side ``n_salts`` times (one row per
  salt) and scatter the big side across salts with a deterministic hash
  of its row identity; the join key becomes (key, salt) so the hot key's
  rows spread over ``n_salts`` reducers. Result set is identical to the
  plain join.
- **Salted two-phase aggregation**: same idea for aggregations — partial
  aggregate on (key, salt), final aggregate on key. Spark's partial/final
  hash aggregation already does this per-partition; explicit salting
  additionally splits a hot key *across* reducers in the shuffle.
- **Bucketed co-located join**: persist both fact tables bucketed by the
  join key; Spark then sort-merge-joins bucket-to-bucket with NO exchange
  on either side — the shuffle is paid once at write time and amortized
  over every subsequent join (tests/test_scale.py asserts the
  exchange-free plan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    big_id_cols: list[str] | None = None,
) -> DataFrame:
    """Inner equi-join on ``key`` with the small side replicated across
    ``n_salts`` salts. Deterministic: the big side's salt is a hash of
    ``big_id_cols`` (default: the key itself plus every big column used
    would be overkill — pass the row-identity columns for an even
    spread). Output columns = big ∪ small minus duplicate key, exactly
    like ``big.join(small, key)``.
    """
    id_cols = big_id_cols or [key]
    salted_big = big.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in id_cols]), F.lit(n_salts))
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(salted_small, [key, "_salt"]).drop("_salt")


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, Column],
    merges: dict[str, Column],
    n_salts: int = 8,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation with an explicit salt: partial on
    (key, salt), final merge on key. ``aggs`` maps output name → partial
    aggregate expression; ``merges`` maps the same names → the merge
    expression over the partial column (e.g. sum → sum, count → sum,
    max → max). A hot key's input spreads over ``n_salts`` reducers in
    the first exchange; the second exchange carries ≤ n_salts rows/key.
    """
    salt_src = salt_cols or [key]
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in salt_src]), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "_salt").agg(
        *[e.alias(name) for name, e in aggs.items()]
    )
    return partial.groupBy(key).agg(
        *[e.alias(name) for name, e in merges.items()]
    )


def write_partitioned(df: DataFrame, path: str, partition_col: str) -> None:
    """Persist ``df`` hive-partitioned by ``partition_col`` — the at-rest
    layout for 100 TB facts. Filters on the partition column become
    directory pruning (zero I/O for excluded partitions) and joins
    against a filtered dimension trigger dynamic partition pruning
    (tests/test_scale.py asserts both in the plan)."""
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def write_bucketed(
    df: DataFrame,
    spark: SparkSession,
    table_name: str,
    key: str,
    n_buckets: int,
    location: str,
) -> DataFrame:
    """Persist ``df`` bucketed+sorted by ``key`` as a session-catalog
    table; returns the re-read table. Joins between two tables bucketed
    the same way on the same key run with zero exchanges (the write IS
    the shuffle, paid once).

    The pre-write ``repartition(n_buckets, key)`` uses the same Murmur3
    hash as the bucketing, so every task holds exactly one bucket and
    each bucket lands in ONE file — without it every input task writes a
    file per bucket (a small-file explosion at scale), and a
    multi-file-per-bucket layout makes downstream scans re-Sort because
    only single-file buckets have a trustable global sort order."""
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    (
        df.repartition(n_buckets, F.col(key))
        .write.mode("overwrite")
        .option("path", location)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )
    return spark.table(table_name)


def zorder_value(
    cols: list[tuple[Column | str, float, float]], bits: int = 8
) -> Column:
    """Z-order (Morton) curve value for multi-dimensional clustering.

    Each entry is ``(column, min, max)``; the value is scaled to
    ``[0, 2^bits)`` and the columns' bits are interleaved, so rows close
    on the curve are close in EVERY dimension at once. Sorting files by
    this value gives parquet min/max skipping on all participating
    columns — a single-column sort only skips on that column.

    Pure built-in bit arithmetic (shift/and/or) — stays inside
    whole-stage codegen; the expression has bits×len(cols) terms, so keep
    ``bits`` modest (8 bits/dim ≈ 256 buckets/dim is plenty for file
    skipping).
    """
    quantized = []
    top = (1 << bits) - 1
    for c, mn, mx in cols:
        c = F.col(c) if isinstance(c, str) else c
        span = (mx - mn) or 1.0
        quantized.append(
            F.least(
                F.lit(top),
                F.greatest(
                    F.lit(0),
                    ((c.cast("double") - F.lit(float(mn))) * top / span).cast("int"),
                ),
            )
        )
    from world_cup_duckdb_spark.operators.optim import morton_interleave

    return morton_interleave(quantized, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[tuple[str, float, float]],
    n_files: int = 16,
    bits: int = 8,
) -> None:
    """Cluster-and-write: range-partition on the Z-value (tight,
    non-overlapping curve ranges per file), sort within each file, write
    parquet. Readers filtering on ANY of the clustered columns skip most
    files via footer min/max — the lakehouse data-skipping layout without
    a table format."""
    z = zorder_value(list(cols), bits=bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> tuple[int, int]:
    """Small-file compaction: rewrite a parquet directory into files of
    ~``target_bytes`` each; returns (files_before, files_after).

    Streaming appends (e.g. stream_validated_write) and high-parallelism
    writes leave one file per task per trigger; at 100 TB that means
    millions of small files, and scan planning + open() overhead comes to
    dominate query time. Compaction bin-packs by TOTAL BYTES — not file
    count — so output files land near the target regardless of how skewed
    the input file sizes are. Runs as read → repartition(n) → overwrite of
    a staging dir, then an atomic-ish swap, so a crash never leaves the
    directory half-compacted.

    At cluster scale this is the maintenance job run per ingest partition
    (so each compaction reads a bounded slice), and the repartition count
    keeps output files within a 2× band of the target — aligned with
    `spark.sql.files.maxPartitionBytes` so a later scan gets one split
    per file.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    statuses = [
        st
        for st in fs.listStatus(p)
        if st.getPath().getName().endswith(".parquet")
    ]
    files_before = len(statuses)
    total = sum(st.getLen() for st in statuses)
    n_out = max(1, -(-total // target_bytes))  # ceil
    df = spark.read.parquet(path)
    stage = path.rstrip("/") + "_compacting"
    df.repartition(n_out).write.mode("overwrite").parquet(stage)
    backup = path.rstrip("/") + "_precompact"
    fs.delete(jvm.org.apache.hadoop.fs.Path(backup), True)
    fs.rename(p, jvm.org.apache.hadoop.fs.Path(backup))
    fs.rename(jvm.org.apache.hadoop.fs.Path(stage), p)
    fs.delete(jvm.org.apache.hadoop.fs.Path(backup), True)
    files_after = sum(
        1
        for st in fs.listStatus(p)
        if st.getPath().getName().endswith(".parquet")
    )
    return files_before, files_after


#: Split-estimate memo for spread_for_cpu_work, keyed on
#: (applicationId, semanticHash of the analyzed plan) — the probe below
#: (inputFiles + getsize loop, or the df.rdd partition read for cached
#: inputs) measured ~28 ms per call under the bench posture and every
#: stateful dedup/text build pays it per run; the estimate is a pure
#: function of the resolved input within a session, so one probe per
#: (session, input plan) is enough (VERDICT r12 item 3). Perf-only
#: state: a stale entry can only change a repartition decision, never
#: results.
_SPREAD_MEMO: dict = {}


def spread_for_cpu_work(df: DataFrame, key_col: str) -> DataFrame:
    """Fan a narrow scan out to the session's parallelism before CPU-heavy
    map-side work (shingle hashing, embedding scoring).

    Small text/vector tables pack many rows per file, so a corpus often
    arrives as ONE input split — and a single core then does all the
    work while the rest idle. Hash-repartitions on ``key_col``
    (NOT round-robin ``repartition()``, which inserts a deterministic
    local SORT over full rows — on long text columns that sort costs more
    than the work it parallelizes). The decision reads file metadata
    only — never ``df.rdd`` (which under AQE executes the plan to learn
    its partitioning: measured 3 s per call). Fires only when the scan's
    ESTIMATED split count (total bytes / maxPartitionBytes) is below the
    cluster's slot count; at real scale the scan has thousands of splits
    and this is a no-op — no shuffle is ever added to the 100 TB path,
    and unknown/remote inputs are left untouched (conservative). The
    estimate is memoized per (session, analyzed plan) — see
    ``_SPREAD_MEMO``."""
    import os

    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        memo_key = (
            spark.sparkContext.applicationId,
            df._jdf.queryExecution().analyzed().semanticHash(),
        )
    except Exception:
        memo_key = None
    est_splits = _SPREAD_MEMO.get(memo_key) if memo_key is not None else None
    if est_splits is None:
        try:
            files = df.inputFiles()
            if len(files) >= target:
                est_splits = len(files)
            elif not files:
                # Persisted inputs report no files (the InMemoryRelation
                # hides the scan). The cached partition count is the real
                # parallelism then; reading it via df.rdd is cheap here
                # because a cached scan + projection has no exchange for
                # AQE to pre-execute (the 3 s df.rdd trap only bites
                # plans with shuffles).
                est_splits = df.rdd.getNumPartitions()
            else:
                total = 0
                for f in files:
                    p = f[5:] if f.startswith("file:") else f
                    total += os.path.getsize("/" + p.lstrip("/"))
                max_pb = int(
                    str(
                        spark.conf.get(
                            "spark.sql.files.maxPartitionBytes", "134217728"
                        )
                    ).rstrip("b")
                )
                est_splits = max(1, -(-total // max_pb))
        except Exception:
            return df
        if memo_key is not None:
            _SPREAD_MEMO[memo_key] = est_splits
    if est_splits < target:
        return df.repartition(target, F.col(key_col))
    return df
