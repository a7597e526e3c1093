"""Table catalog over the driver-generated parquet directories.

Reference parallel: the DuckDB catalog built by scripts/build_db.py (25
`CREATE OR REPLACE TABLE` sites, e.g. scripts/build_db.py:112-120) plus the
replacement-scan bridge that exposes Python-local frames to SQL
(scripts/build_db.py:72-83). In Spark one engine serves both roles: parquet
scans are DataFrames, and `createOrReplaceTempView` is the DF↔SQL bridge
(SURVEY.md §1.3).

Parquet is the at-rest format (columnar, like DuckDB storage): Catalyst
pushes projections and predicates into the scan, so `table(...).select(...)
.filter(...)` reads only the needed columns / row groups — the distributed
equivalent of the reference's manual positional-column CSV projection
(scripts/build_db.py:104-108).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any scale factor — on a
#: 1000-executor cluster these join sides must never shuffle.
BROADCAST_TABLES = frozenset({"region", "nation"})


#: DataFrame (logical-plan) cache keyed by (session, sf_dir, table).
#: Building a reader re-lists the path and re-reads parquet footers on the
#: driver (~150 ms/table); plans are immutable so reuse within a session
#: is free and saves ~1.5 s per query invocation. Keyed by applicationId
#: so a restarted session never sees stale plans.
_PLAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table (OP02/OP03-equivalent: columnar scan, lazy plan).

    ``events.ts`` is TIMESTAMP(NANOS) parquet; with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as nanos-since-epoch
    long and is normalized here to a microsecond TimestampType (integer
    ``div`` — a double division would lose precision above 2^53 ns).
    """
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _PLAN_CACHE.get(key)
    if cached is not None:
        return cached
    # Calendar functions (hour, date_trunc, ...) follow the session
    # timezone in Spark but read naively by the DuckDB oracle; pin UTC at
    # runtime so results are caller-session independent.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # Runtime-settable; without it the TIMESTAMP(NANOS) scan throws
        # PARQUET_TYPE_ILLEGAL — set proactively so a caller-provided
        # session (the round driver's) needs no special build config.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # timestamp[us] parquet with no zone: with the session pinned
            # UTC the cast is wall-clock identity, and downstream
            # unix_micros/window functions require TimestampType.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _PLAN_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All tables as lazy DataFrames, keyed by name."""
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the Spark SQL entry point
    (the role DuckDB replacement scans play in the reference, §3.1)."""
    for t in TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)
