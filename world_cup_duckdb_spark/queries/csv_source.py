"""CSV source fidelity: the reference's ingest edge is CSV
(`pl.read_csv` with positional projection and `try_parse_dates`,
scripts/build_db.py:104-108, :455-461). The registry's opNN scans read
parquet (the at-rest format); this query exercises the actual CSV path:
distributed CSV write → schema-declared CSV read → projection + filter +
timestamp round-trip, compared against the oracle on the original table.

Scale notes: the CSV reader prunes columns and pushes filters like the
parquet one (no row-group stats, but it skips parsing unselected
columns); explicit StructType avoids the inference pass that would scan
the file twice (SURVEY.md §7 hard part 5: never rely on CSV inference).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.queries.lifecycle import _fresh_dir
from world_cup_duckdb_spark.sources.catalog import table

ORDERS_CSV_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)


@register(
    "op02b_csv_scan",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderdate
    FROM orders
    WHERE o_orderstatus = 'O'
    """,
)
def op02b_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip scan with explicit schema, projection and filter
    (OP02+OP03 on the real CSV path). Timestamps survive the text
    round-trip exactly because BOTH sides pin a microsecond
    timestampFormat — Spark's default CSV pattern carries only
    milliseconds (.SSS), which would silently truncate sub-ms values
    (the fixture's midnight-only o_orderdate never exposes it; real
    event data would)."""
    # Both variants pinned: the parquet source carries NTZ timestamps
    # (isAdjustedToUTC=false → TIMESTAMP_NTZ under inferTimestampNTZ),
    # whose CSV writer consults timestampNTZFormat, while the declared
    # read schema is TimestampType and consults timestampFormat.
    ts_fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    loc = _fresh_dir("op02b_orders_csv")
    (
        table(spark, sf_dir, "orders")
        .write.mode("overwrite")
        .option("header", True)
        .option("timestampFormat", ts_fmt)
        .option("timestampNTZFormat", ts_fmt)
        .csv(os.path.join(loc, "orders"))
    )
    return (
        spark.read.schema(ORDERS_CSV_SCHEMA)
        .option("header", True)
        .option("timestampFormat", ts_fmt)
        .option("timestampNTZFormat", ts_fmt)
        .csv(os.path.join(loc, "orders"))
        .filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_orderstatus", "o_orderdate")
    )


CUSTOMER_JSON_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.LongType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)


@register(
    "op02c_json_scan",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_mktsegment = 'MACHINERY'
    """,
)
def op02c_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines round-trip scan with explicit schema (the semi-structured
    ingest edge the CSV path doesn't cover). Doubles survive the text
    round-trip exactly (Spark writes shortest-round-trip reprs); the
    declared StructType skips the schema-inference pass that would read
    the files twice — at 100 TB inference is a full extra scan."""
    loc = _fresh_dir("op02c_customer_json")
    (
        table(spark, sf_dir, "customer")
        .write.mode("overwrite")
        .json(os.path.join(loc, "customer"))
    )
    return (
        spark.read.schema(CUSTOMER_JSON_SCHEMA)
        .json(os.path.join(loc, "customer"))
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .select("c_custkey", "c_name", "c_acctbal")
    )


@register(
    "op02d_orc_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity >= 49
    """,
)
def op02d_orc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip scan (the second columnar at-rest format Spark
    serves natively). Like parquet, ORC carries stripe-level min/max
    stats, so the selective quantity predicate is pushed to the reader
    and non-matching stripes are skipped without decoding."""
    loc = _fresh_dir("op02d_lineitem_orc")
    (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .write.mode("overwrite")
        .orc(os.path.join(loc, "lineitem"))
    )
    return (
        spark.read.orc(os.path.join(loc, "lineitem"))
        .filter(F.col("l_quantity") >= 49)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


NATION_CSV_SCHEMA = T.StructType(
    [
        # int, matching the parquet source schema so the result's types
        # line up with the oracle reading the same table.
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)


@register(
    "op01_remote_fetch_cache",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def op01_remote_fetch_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remote CSV fetch through a local cache, then scan (OP01).

    Reference: each source CSV is downloaded over HTTPS into `data/raw/`
    only if absent (scripts/build_db.py:33-52). Engine: `sources/remote.py:
    fetch_cached` — URL-md5-keyed cache, atomic tmp→rename publish — then
    a schema-declared `spark.read.csv` over the cached copy. The query
    fetches the SAME URL twice and asserts the second round was a cache
    hit, so the fetch-if-absent contract is exercised on every run, not
    just in a unit test. The sandbox has no network, so the "remote" URL
    uses the file:// scheme; the fetch path is identical for http(s).
    """
    from world_cup_duckdb_spark.queries.lifecycle import (
        _mark_staged,
        _stable_staged_dir,
    )
    from world_cup_duckdb_spark.sources.remote import fetch_cached

    # Stage the "remote" side once (plays the role of the upstream host).
    remote_dir, staged = _stable_staged_dir("op01_remote_host")
    if not staged:
        import csv as _csv

        rows = table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        ).collect()  # 25 rows at any scale factor: nation is bounded
        with open(os.path.join(remote_dir, "nation.csv"), "w", newline="") as fh:
            w = _csv.writer(fh)
            w.writerow(["n_nationkey", "n_name", "n_regionkey"])
            w.writerows([r[0], r[1], r[2]] for r in rows)
        remote_dir = _mark_staged(remote_dir)  # atomic publish → final path
    csv_path = os.path.join(remote_dir, "nation.csv")

    cache = _fresh_dir("op01_cache")
    url = f"file://{csv_path}"
    local, hit = fetch_cached(url, cache)
    assert not hit, "fresh cache dir cannot hit"
    local2, hit2 = fetch_cached(url, cache)
    assert hit2 and local2 == local, "second fetch must be served from cache"
    return (
        spark.read.schema(NATION_CSV_SCHEMA)
        .option("header", True)
        .csv(local)
    )


@register(
    "ext_python_datasource",
    oracle="""
    SELECT grp,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(id) AS BIGINT) AS sum_id,
           CAST(SUM(CAST(val AS DECIMAL(18,1))) AS DOUBLE) AS sum_val
    FROM (
      SELECT i AS id, CAST(i % 7 AS INT) AS grp,
             ((i * 2654435761) % 1000) / 10.0 AS val
      FROM range(0, 5000) t(i)
    )
    GROUP BY grp
    """,
)
def ext_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom connector through the Python Data Source API (Spark 4.0):
    a user-defined, partition-parallel source registered in pure Python
    (sources/pyds.py) — the extension seam for feeds Spark has no
    built-in reader for. The source declares its own split (8 disjoint
    row-range partitions → 8 parallel tasks), streams rows via Arrow,
    and is deterministic per slice so task retries are idempotent.
    The oracle regenerates the identical rows from `range()` — proving
    the connector's contents, not just its plumbing. Value sums go
    through DECIMAL so partition accumulation order can't show."""
    from world_cup_duckdb_spark.sources.pyds import SyntheticEventsSource

    spark.dataSource.register(SyntheticEventsSource)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", 5000)
        .option("partitions", 8)
        .load()
    )
    return df.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("id").cast("bigint").alias("sum_id"),
        F.sum(F.col("val").cast("decimal(18,1)")).cast("double").alias("sum_val"),
    )


@register(
    "ext_schema_evolution",
    oracle="""
    WITH merged AS (
      SELECT n_nationkey, n_name, n_regionkey, NULL AS batch_tag
      FROM nation WHERE n_regionkey < 2
      UNION ALL
      SELECT n_nationkey, n_name, n_regionkey, 'v2' AS batch_tag
      FROM nation WHERE n_regionkey >= 2
    )
    SELECT CAST(n_nationkey AS INT) AS n_nationkey, n_name,
           CAST(n_regionkey AS INT) AS n_regionkey,
           batch_tag
    FROM merged
    """,
)
def ext_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution: a directory whose older files lack a
    column the newer files carry (`batch_tag`), read back as ONE table
    with `mergeSchema` — the lake-ingestion reality where producers add
    fields over time and the reader must union schemas, null-filling
    history, instead of failing or silently dropping the new column.

    The oracle regenerates the expected union from the source table
    (DuckDB's union_by_name semantics match Spark's mergeSchema). At
    scale, schema merging reads ONLY file footers (no data scan) and a
    pinned explicit StructType is still preferred on hot paths — this
    query is the capability proof for the evolving-feed edge."""
    from world_cup_duckdb_spark.queries.lifecycle import _fresh_dir

    loc = _fresh_dir("ext_schema_evolution")
    n = table(spark, sf_dir, "nation")
    n.filter(F.col("n_regionkey") < 2).select(
        "n_nationkey", "n_name", "n_regionkey"
    ).write.mode("append").parquet(loc)
    n.filter(F.col("n_regionkey") >= 2).select(
        "n_nationkey",
        "n_name",
        "n_regionkey",
        F.lit("v2").alias("batch_tag"),
    ).write.mode("append").parquet(loc)
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(loc)
        .select("n_nationkey", "n_name", "n_regionkey", "batch_tag")
    )


@register(
    "ext_corrupt_json",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_good,
           CAST(3 AS BIGINT) AS n_corrupt,
           CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
    FROM nation
    """,
)
def ext_corrupt_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-feed ingestion: a JSON-lines file carrying 3 malformed
    records among the good ones, read in PERMISSIVE mode with an
    explicit `_corrupt_record` column — bad lines become quarantine rows
    instead of failing the scan or silently vanishing, and the query
    reports good/corrupt counts plus a checksum of the parsed payload.
    The dead-letter posture a 100 TB feed needs (FAILFAST is for curated
    data; dropping errors silently is never right).

    The corrupt-line count is a staged constant (we inject exactly 3),
    so the oracle validates the parsed-row content from the source table
    and pins the quarantine count."""
    import json as _json

    loc = _fresh_dir("ext_corrupt_json")
    rows = [
        r.asDict()
        for r in table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name")
        .collect()
    ]
    path = os.path.join(loc, "feed.json")
    with open(path, "w") as f:
        for i, r in enumerate(rows):
            f.write(_json.dumps(r) + "\n")
            if i in (0, 1, 2):
                f.write('{"n_nationkey": "NOT AN INT", "n_name": [broken\n')
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()  # querying _corrupt_record requires materialization
    )
    return parsed.agg(
        F.count(F.when(F.col("_corrupt_record").isNull(), 1))
        .cast("bigint")
        .alias("n_good"),
        F.count(F.col("_corrupt_record")).cast("bigint").alias("n_corrupt"),
        F.sum(F.when(F.col("_corrupt_record").isNull(), F.col("n_nationkey")))
        .cast("bigint")
        .alias("key_sum"),
    )


from world_cup_duckdb_spark.queries.lifecycle import REPO_SCRATCH as _SCRATCH


@register(
    "ext_metadata_columns",
    oracle="""
    SELECT parse_filename(filename) AS file_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
    FROM read_parquet('{scratch}/ext_metadata_cols/*.parquet',
                      filename=true)
    GROUP BY 1
    """.format(scratch=_SCRATCH),
)
def ext_metadata_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row file lineage via the hidden `_metadata` column: every
    parquet-scanned row knows which file it came from (no extra scan, no
    path-encoding hacks) — the provenance signal incident debugging and
    selective reprocessing need ('which input file produced these bad
    rows?'). Rows are grouped by source file with a content checksum;
    the oracle reads the same staged directory with DuckDB's
    filename=true.

    Scale: `_metadata` is populated from the scan's own file split —
    zero additional I/O; grouping by file keeps partial aggregation
    local to each file's tasks."""
    # Stage-once fixed path: the oracle SQL reads this directory by a
    # static path, so it cannot be per-invocation unique. Hermeticity
    # comes from immutability instead — files are written exactly once
    # per scratch tree and never touched again (_STAGED marker).
    from world_cup_duckdb_spark.queries.lifecycle import (
        _mark_staged,
        _stable_staged_dir,
    )

    loc, staged = _stable_staged_dir("ext_metadata_cols")
    if not staged:
        n = table(spark, sf_dir, "nation")
        n.filter(F.col("n_regionkey") < 2).repartition(1).write.mode(
            "append"
        ).parquet(loc)
        n.filter(F.col("n_regionkey") >= 2).repartition(1).write.mode(
            "append"
        ).parquet(loc)
        loc = _mark_staged(loc)  # atomic publish; returns the final path
    return (
        spark.read.parquet(loc)
        .select(
            F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias(
                "file_name"
            ),
            "n_nationkey",
        )
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("n_nationkey").cast("bigint").alias("key_sum"),
        )
    )


@register(
    "op02e_xml_scan",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey
    FROM supplier
    WHERE s_nationkey < 10
    """,
)
def op02e_xml_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML round-trip scan (Spark 4's built-in XML source — the format
    the enterprise-feed ingest edge still arrives in). One row element
    per supplier; the read declares an explicit schema, skipping the
    inference pass that would scan the files twice, and the selective
    nationkey predicate + 3-column projection are applied on the typed
    relation. XML carries no row-group statistics, so unlike the
    parquet/ORC twins the filter cannot prune I/O — at 100 TB that is
    exactly why a pipeline converts XML feeds to a columnar at-rest
    format on first touch (op02d); this key covers the ingest step
    itself."""
    from pyspark.sql import types as T

    loc = _fresh_dir("op02e_supplier_xml")
    (
        table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey")
        .write.mode("overwrite")
        .format("xml")
        .option("rootTag", "suppliers")
        .option("rowTag", "supplier")
        .save(os.path.join(loc, "supplier"))
    )
    schema = T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.LongType()),
        ]
    )
    return (
        spark.read.schema(schema)
        .format("xml")
        .option("rowTag", "supplier")
        .load(os.path.join(loc, "supplier"))
        .filter(F.col("s_nationkey") < 10)
        .select("s_suppkey", "s_name", "s_nationkey")
    )
