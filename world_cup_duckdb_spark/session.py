"""SparkSession factory tuned for this engine.

Replaces the reference's engine setup (`duckdb.connect` at
scripts/build_db.py:26-30 plus Polars defaults) with a single distributed
engine. Settings are chosen for correctness-vs-DuckDB comparison (UTC
session timezone) and for scale (AQE, Arrow, right-sized shuffle
parallelism).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # ~cores, not 200: local runs are over-parallelized otherwise. On a real
    # cluster this is overridden to ~2-3x total cores (or left to AQE
    # coalescing with a high initial value).
    "spark.sql.shuffle.partitions": "32",
    # AQE: runtime re-plan — coalesce small shuffle partitions, convert to
    # broadcast when a side turns out small, split skewed partitions.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Runtime bloom-filter join pruning: when one join side is selectively
    # filtered, inject a bloom filter of its keys into the other side's
    # scan — at 100 TB this cuts the probe side's shuffle volume before it
    # happens (complements static/dynamic partition pruning).
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # Arrow for toPandas / pandas_udf boundaries.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # DuckDB timestamps are UTC-naive; pin the session so timestamp
    # semantics match the oracle byte-for-byte.
    "spark.sql.session.timeZone": "UTC",
    # The events table stores TIMESTAMP(NANOS) parquet, which Spark's
    # reader rejects natively; read as long and convert in the catalog
    # (sources/catalog.py truncates to microseconds, matching a DuckDB
    # CAST(ts AS TIMESTAMP)).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.ui.enabled": "false",
    # This factory always builds local[...] masters: shuffle blocks never
    # cross a network and live in the page cache, so lz4 on the shuffle
    # path is pure CPU overhead. A cluster deployment passes extra_conf
    # to re-enable both.
    "spark.shuffle.compress": "false",
    "spark.shuffle.spill.compress": "false",
}


def get_spark(
    app_name: str = "world_cup_duckdb_spark",
    cpus: str | int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine session.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (else all cores). Note that
    if a session already exists in this JVM, Spark returns it and static
    confs (master, driver memory) keep their original values.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    conf = dict(_DEFAULTS)
    conf.setdefault(
        "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g")
    )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
