"""Table lifecycle: DDL create, insert-select load, whole-database export.

Covers SURVEY.md §2.1 OP06 (DDL create table), OP07 (insert-select engine
bridge), OP10 (whole-database export), plus the small §2.2 projections OP13
(alias) and §2.4 OP24 (second dim broadcast join).

The reference's lifecycle is: `CREATE OR REPLACE TABLE` DDL with declared
schema (scripts/build_db.py:112-120 and 24 sibling sites), `INSERT INTO t
SELECT * FROM ldf` where DuckDB replacement-scans a Python-local frame
(scripts/build_db.py:72-83), and `EXPORT DATABASE '../data/stage'`
(scripts/build_db.py:1423) emitting per-table files plus a DDL script.

Spark-native equivalents: `spark.sql(CREATE TABLE ...)` against the session
catalog (external/path-based so no warehouse assumption), the temp-view
bridge for INSERT ... SELECT (temp views are Spark's replacement scans,
SURVEY.md §1.3), and a catalog loop writing parquet + a generated
`schema.sql` for export. Writes land under REPO_SCRATCH (never the
read-only testdata).

Scale notes: INSERT INTO an external parquet table is a distributed write —
one file per partition, no driver funnel; export writes are likewise
per-table distributed jobs. Only the 3-row manifest is collected.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import TABLES, table

REPO_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".scratch")


def _fresh_dir(name: str) -> str:
    """Unique per-invocation scratch dir. Uniqueness is the hermeticity
    guarantee: these queries write state and return DataFrames that read
    it LAZILY, so a shared path would let any re-entry (driver correctness
    pass, bench, tests — all in one process) rewrite files a previously
    returned plan still references, changing what the caller later hashes.
    With a fresh dir per call, every returned plan reads files nothing
    will ever mutate."""
    path = os.path.join(REPO_SCRATCH, f"{name}-{uuid.uuid4().hex[:12]}")
    os.makedirs(path, exist_ok=True)
    return path


def _stable_staged_dir(name: str) -> tuple[str, bool]:
    """Fixed-path scratch dir with a stage-once marker, for queries whose
    DuckDB oracle must read the same files by a static path
    (ext_metadata_columns, op01's fixture host). Returns
    ``(path, already_staged)``. When staging is needed, ``path`` is a
    per-call UNIQUE work dir — the caller writes there and then calls
    :func:`_mark_staged`, which publishes it to the stable path with an
    atomic directory rename and returns the FINAL path. Concurrent
    processes (pytest + the bench driver share REPO_SCRATCH) each build
    their own work dir and race to one winner; check-then-write into the
    shared path would let one rmtree the other's half-written staging
    and then mark the interleaved result as staged."""
    path = os.path.join(REPO_SCRATCH, name)
    if os.path.exists(os.path.join(path, "_STAGED")):
        return path, True
    work = f"{path}.stage-{uuid.uuid4().hex[:12]}"
    os.makedirs(work, exist_ok=True)
    return work, False


def _mark_staged(work: str) -> str:
    """Publish a staged work dir to its stable path (atomic rename claim);
    returns the final path. Exactly one of any concurrent stagers wins —
    losers adopt the winner's published files."""
    final = work.rsplit(".stage-", 1)[0]
    with open(os.path.join(work, "_STAGED"), "w") as fh:
        fh.write("staged\n")
    try:
        os.rename(work, final)
        return final
    except OSError:
        pass
    # Rename blocked: either a concurrent stager already published, or a
    # crashed run left a stale partial dir. Retry the claim in a small
    # loop — a concurrent stager can publish between our rmtree of the
    # stale dir and our second rename, which must count as losing the
    # race (adopt their files), not raise.
    for _ in range(8):
        if os.path.exists(os.path.join(final, "_STAGED")):
            shutil.rmtree(work, ignore_errors=True)  # lost the race
            return final
        # stale partial dir from a crashed run: replace it
        shutil.rmtree(final, ignore_errors=True)
        try:
            os.rename(work, final)
            return final
        except OSError:
            continue  # someone else claimed between rmtree and rename
    raise RuntimeError(f"could not publish staged dir to {final}")


_SPARK_TO_SQL = {
    T.IntegerType(): "INTEGER",
    T.LongType(): "BIGINT",
    T.DoubleType(): "DOUBLE",
    T.StringType(): "VARCHAR",
    T.BooleanType(): "BOOLEAN",
    T.DateType(): "DATE",
    T.TimestampType(): "TIMESTAMP",
}


def schema_to_ddl(name: str, schema: T.StructType) -> str:
    """Emit `CREATE OR REPLACE TABLE` DDL from a Spark schema — the export
    counterpart of the reference's generated schema script
    (docs/schema.sql:4-30, produced by EXPORT DATABASE)."""
    cols = ", ".join(
        f"{f.name} {_SPARK_TO_SQL.get(f.dataType, f.dataType.simpleString().upper())}"
        for f in schema.fields
    )
    return f"CREATE OR REPLACE TABLE {name} ({cols});"


@register(
    "op06_ddl_create",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def op06_ddl_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDL create table with declared schema, then load (OP06).

    Reference: 25 `CREATE OR REPLACE TABLE ... (cols, PRIMARY KEY ...)`
    sites (scripts/build_db.py:112-120 for `award`; full DDL
    docs/schema.sql:4-30). Spark: path-based `CREATE TABLE ... USING
    PARQUET LOCATION` into the session catalog; PK/FK declarations become
    the §2.9 validators (Spark does not enforce constraints).
    """
    loc = _fresh_dir("op06_nation_ddl")
    # Catalog name carries the dir's unique suffix and the returned plan
    # binds to the path, not the name — re-entrant invocations can never
    # race on a shared table identifier or swap state under a previously
    # returned DataFrame.
    tbl = f"nation_ddl_{os.path.basename(loc).rsplit('-', 1)[-1]}"
    spark.sql(
        f"CREATE TABLE {tbl} "
        "(n_nationkey INT, n_name STRING, n_regionkey INT) "
        f"USING PARQUET LOCATION '{loc}'"
    )
    table(spark, sf_dir, "nation").write.insertInto(tbl)
    out = spark.read.schema(spark.table(tbl).schema).parquet(loc)
    spark.sql(f"DROP TABLE {tbl}")  # external: files at loc survive
    return out


@register(
    "op07_insert_select",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE c_mktsegment = 'BUILDING'
    """,
)
def op07_insert_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert-select load through the temp-view bridge (OP07).

    Reference: `INSERT INTO {tbl} SELECT * FROM ldf` where DuckDB's binder
    replacement-scans the Python-local LazyFrame via Arrow
    (scripts/build_db.py:72-83). Spark's temp view plays the replacement
    scan's role: register the frame, name it inside SQL. The WHERE on the
    view is pushed through to the parquet scan (filter pushdown survives
    the view boundary).
    """
    loc = _fresh_dir("op07_customer_load")
    suffix = os.path.basename(loc).rsplit("-", 1)[-1]
    tbl, view = f"customer_loaded_{suffix}", f"customer_src_{suffix}"
    spark.sql(
        f"CREATE TABLE {tbl} "
        "(c_custkey BIGINT, c_name STRING, c_mktsegment STRING) "
        f"USING PARQUET LOCATION '{loc}'"
    )
    table(spark, sf_dir, "customer").createOrReplaceTempView(view)
    spark.sql(
        f"INSERT INTO {tbl} "
        f"SELECT c_custkey, c_name, c_mktsegment FROM {view} "
        "WHERE c_mktsegment = 'BUILDING'"
    )
    out = spark.read.schema(spark.table(tbl).schema).parquet(loc)
    spark.sql(f"DROP TABLE {tbl}")
    spark.catalog.dropTempView(view)
    return out


# Shared manifest oracle for the two whole-database export variants
# (op10 parquet, op10b CSV): expected (table, row count, column count)
# per catalog table, straight from the source views.
_EXPORT_MANIFEST_SQL = """
    SELECT * FROM (
      SELECT 'region' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(2 AS INTEGER) AS n_cols FROM region
      UNION ALL
      SELECT 'nation', CAST(COUNT(*) AS BIGINT), CAST(3 AS INTEGER) FROM nation
      UNION ALL
      SELECT 'customer', CAST(COUNT(*) AS BIGINT), CAST(5 AS INTEGER) FROM customer
      UNION ALL
      SELECT 'supplier', CAST(COUNT(*) AS BIGINT), CAST(4 AS INTEGER) FROM supplier
      UNION ALL
      SELECT 'part', CAST(COUNT(*) AS BIGINT), CAST(6 AS INTEGER) FROM part
      UNION ALL
      SELECT 'orders', CAST(COUNT(*) AS BIGINT), CAST(6 AS INTEGER) FROM orders
      UNION ALL
      SELECT 'lineitem', CAST(COUNT(*) AS BIGINT), CAST(11 AS INTEGER) FROM lineitem
      UNION ALL
      SELECT 'events', CAST(COUNT(*) AS BIGINT), CAST(6 AS INTEGER) FROM events
      UNION ALL
      SELECT 'documents', CAST(COUNT(*) AS BIGINT), CAST(5 AS INTEGER) FROM documents
      UNION ALL
      SELECT 'embeddings', CAST(COUNT(*) AS BIGINT), CAST(3 AS INTEGER) FROM embeddings
    ) ORDER BY table_name
    """


@register("op10_export_database", oracle=_EXPORT_MANIFEST_SQL)
def op10_export_database(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-database export: per-table files + generated DDL (OP10).

    Reference: `EXPORT DATABASE '../data/stage'` (scripts/build_db.py:1423)
    writes one file per table plus a schema script (the committed
    docs/schema.sql is that script's descendant). Spark: loop the ENTIRE
    catalog (all 10 tables — sources/catalog.py:TABLES), `df.write.parquet`
    per table (distributed, one file per partition, no driver funnel),
    emit `CREATE OR REPLACE TABLE` DDL from each `df.schema` into a
    generated schema.sql. The returned manifest counts the rows that
    actually LANDED on disk (read back from the exported files), so the
    hash match audits the export itself, not just the source counts.
    """
    base = _fresh_dir("op10_export")
    manifest, ddl_lines = [], []
    for name in TABLES:
        df = table(spark, sf_dir, name)
        dest = os.path.join(base, name)
        df.write.mode("overwrite").parquet(dest)
        ddl_lines.append(schema_to_ddl(name, df.schema))
        written = spark.read.parquet(dest)
        manifest.append((name, written.count(), len(written.columns)))
    with open(os.path.join(base, "schema.sql"), "w") as fh:
        fh.write("\n".join(ddl_lines) + "\n")
    return spark.createDataFrame(
        manifest, "table_name string, n_rows bigint, n_cols int"
    ).orderBy("table_name")


@register("op10b_export_csv", oracle=_EXPORT_MANIFEST_SQL)
def op10b_export_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-database export, CSV form — the exact `EXPORT DATABASE`
    file set (OP10 fidelity variant).

    Reference: DuckDB's `EXPORT DATABASE` (scripts/build_db.py:1423)
    writes per-table **CSV** plus `schema.sql` and `load.sql`; op10's
    parquet form is this engine's at-rest format, this variant mirrors
    the reference byte-level shape. Nested/binary columns (embeddings'
    vec array) are serialized to JSON text — the same escape hatch the
    SQL export takes for non-scalar types. The manifest is read back
    from the exported CSVs (header'd, schema-free), so the hash match
    audits landed files, not source counts.

    Scale: each table writes distributedly (one CSV part per partition —
    no driver funnel); the fixture texts carry no embedded newlines, and
    quoting covers delimiters, so the read-back stays splittable. The
    generated load.sql replays one COPY per table, as the reference's
    generated script does."""
    base = _fresh_dir("op10b_export_csv")
    manifest, ddl_lines, load_lines = [], [], []
    for name in TABLES:
        df = table(spark, sf_dir, name)
        flat = df.select(
            *[
                F.to_json(c).alias(c)
                if isinstance(
                    df.schema[c].dataType, (T.ArrayType, T.StructType, T.MapType)
                )
                else F.col(c)
                for c in df.columns
            ]
        )
        dest = os.path.join(base, name)
        flat.write.mode("overwrite").option("header", True).csv(dest)
        ddl_lines.append(schema_to_ddl(name, df.schema))
        load_lines.append(f"COPY {name} FROM '{name}/*.csv' (HEADER);")
        written = spark.read.option("header", True).csv(dest)
        manifest.append((name, written.count(), len(written.columns)))
    with open(os.path.join(base, "schema.sql"), "w") as fh:
        fh.write("\n".join(ddl_lines) + "\n")
    with open(os.path.join(base, "load.sql"), "w") as fh:
        fh.write("\n".join(load_lines) + "\n")
    return spark.createDataFrame(
        manifest, "table_name string, n_rows bigint, n_cols int"
    ).orderBy("table_name")


@register(
    "op13_alias",
    oracle="""
    SELECT r_name AS region_name, r_regionkey AS region_key FROM region
    """,
)
def op13_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column alias / keep-name projection (OP13).

    Reference: `.alias(...)`/`keep_name()` on computed columns
    (scripts/build_db.py:144, :287).
    """
    return table(spark, sf_dir, "region").select(
        F.col("r_name").alias("region_name"),
        F.col("r_regionkey").alias("region_key"),
    )


@register(
    "op24_join_dim",
    oracle="""
    SELECT s_suppkey, s_name, n_name AS nation_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
)
def op24_join_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ small dimension broadcast equi-join (OP24).

    Reference: team ⋈ federation on federation_name
    (scripts/build_db.py:624-627). The dim is bounded (≤25 nations at any
    scale) → broadcast, so the supplier side never shuffles — the pattern
    every dim join in this engine uses at 100 TB.
    """
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    return sup.join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", F.col("n_name").alias("nation_name"))


@register(
    "ext_time_travel",
    oracle="""
    SELECT 'v0' AS snapshot, CAST(n_nationkey AS INT) AS n_nationkey, n_name
    FROM nation WHERE n_regionkey < 2
    UNION ALL
    SELECT 'latest' AS snapshot, CAST(n_nationkey AS INT) AS n_nationkey, n_name
    FROM nation WHERE n_regionkey = 0
    """,
)
def ext_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table versioning + time travel (operators/lakehouse.py): three
    commits — append, append, overwrite — then one query reads the v0
    snapshot AND the post-overwrite latest snapshot side by side. The
    oracle regenerates both expected states from the source table; the
    hash match proves the manifest log preserves exact history while
    atomic rename keeps every snapshot complete-or-absent.

    This is the open-table-format core (Delta/Iceberg transaction-log
    design) expressed engine-natively: manifests stay KB-sized at any
    data scale, commits are O(1) renames, data files are immutable."""
    from world_cup_duckdb_spark.operators.lakehouse import (
        read_table,
        write_table,
    )

    loc = _fresh_dir("ext_time_travel")
    n = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    write_table(n.filter(F.col("n_regionkey") < 2), loc)
    write_table(n.filter(F.col("n_regionkey") >= 2), loc)
    write_table(n.filter(F.col("n_regionkey") == 0), loc, mode="overwrite")
    v0 = read_table(spark, loc, version=0).select(
        F.lit("v0").alias("snapshot"),
        F.col("n_nationkey").cast("int").alias("n_nationkey"),
        "n_name",
    )
    latest = read_table(spark, loc).select(
        F.lit("latest").alias("snapshot"),
        F.col("n_nationkey").cast("int").alias("n_nationkey"),
        "n_name",
    )
    return v0.unionByName(latest)


@register(
    "ext_zone_map_pruning",
    oracle="""
    SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    WHERE o_orderdate BETWEEN DATE '1997-01-01' AND DATE '1997-12-31'
    """,
)
def ext_zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest zone-map data skipping (operators/lakehouse.py:
    prune_dirs / read_table_pruned): orders are committed in four
    year-range appends, each recording its o_orderdate min/max in the
    manifest; a 1994 range query then plans its scan from the manifest
    alone and reads ONLY the overlapping directory. The oracle filters
    the raw table — the hash match proves skipping is lossless, and
    tests/test_lakehouse.py asserts the scan really touched 1 of 4 dirs.

    Scale: this is Delta/Iceberg-style scan planning. On a time-
    clustered 100 TB table the manifest is KBs, so a day-range query
    prunes thousands of files without touching the filesystem; the
    residual predicate still runs because zones are necessary, not
    sufficient."""
    from world_cup_duckdb_spark.operators.lakehouse import (
        read_table_pruned,
        write_table,
    )

    loc = _fresh_dir("ext_zone_map_pruning")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    for lo, hi in (
        ("1995-01-01", "1996-12-31"),
        ("1997-01-01", "1997-12-31"),
        ("1998-01-01", "1999-12-31"),
        ("2000-01-01", "2001-12-31"),
    ):
        write_table(
            o.filter(F.col("o_orderdate").between(lo, hi)),
            loc,
            stats_cols=["o_orderdate"],
        )
    return read_table_pruned(spark, loc, "o_orderdate", "1997-01-01", "1997-12-31")


@register(
    "ext_merge_upsert",
    oracle="""
    SELECT CAST(n_nationkey AS INT) AS n_nationkey,
           CASE WHEN n_regionkey = 0 THEN lower(n_name) ELSE n_name END
             AS n_name,
           CAST(n_regionkey AS INT) AS n_regionkey
    FROM nation
    UNION ALL
    SELECT 999, 'atlantis', 0
    """,
)
def ext_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics on the versioned table layer
    (operators/lakehouse.py:merge_table): a CDC batch that UPDATES every
    region-0 nation (lowercased name) and INSERTS one new key, applied
    copy-on-write in a single atomic commit. The oracle states the
    expected post-merge table directly — update semantics, insert
    semantics, and carry-over of untouched rows all hash-checked."""
    from world_cup_duckdb_spark.operators.lakehouse import (
        merge_table,
        read_table,
        write_table,
    )

    loc = _fresh_dir("ext_merge_upsert")
    n = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("int").alias("n_regionkey"),
    )
    write_table(n, loc)
    source = (
        n.filter(F.col("n_regionkey") == 0)
        .withColumn("n_name", F.lower("n_name"))
        .unionByName(
            spark.createDataFrame(
                [(999, "atlantis", 0)],
                "n_nationkey int, n_name string, n_regionkey int",
            )
        )
    )
    merge_table(spark, loc, source, ["n_nationkey"])
    return read_table(spark, loc)


@register(
    "ext_merge_upsert_fact",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(o_custkey AS BIGINT) AS o_custkey,
           CAST(CASE WHEN o_orderkey % 97 = 0
                     THEN 2 * CAST(o_totalprice AS DECIMAL(18,2))
                     ELSE CAST(o_totalprice AS DECIMAL(18,2))
                END AS DOUBLE) AS price
    FROM orders
    UNION ALL
    SELECT CAST(o_orderkey + 10000000000 AS BIGINT),
           CAST(o_custkey AS BIGINT),
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
    FROM orders WHERE o_orderkey % 1000 = 0
    """,
)
def ext_merge_upsert_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO at FACT scale: the same copy-on-write merge_table as
    ext_merge_upsert, but the target is the full orders table and the
    CDC batch is fact-derived (every %97 key's price doubled, every
    %1000 key re-inserted under a shifted key) — the shape a daily
    warehouse upsert actually has, and the one scripts/scale_check.py
    times to prove the lakehouse layer's cost grows with DATA, while
    its manifest state stays KB-sized at any volume.

    Scale: merge is one key-shuffled anti-join of the snapshot against
    the (broadcast-small) CDC key set plus a union — no driver funnel;
    the commit itself is an O(1) manifest rename regardless of table
    size. Price math stays in decimal(18,2) (doubling is exact); only
    the final projection casts to double, so both engines emit the same
    bit pattern."""
    from world_cup_duckdb_spark.operators.lakehouse import (
        merge_table,
        read_table,
        write_table,
    )

    loc = _fresh_dir("ext_merge_upsert_fact")
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.col("o_custkey").cast("bigint").alias("o_custkey"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    write_table(orders, loc)
    updates = orders.filter(F.col("o_orderkey") % 97 == 0).withColumn(
        "price", (F.col("price") * 2).cast("decimal(18,2)")
    )
    inserts = orders.filter(F.col("o_orderkey") % 1000 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000_000).cast("bigint")
    )
    merge_table(spark, loc, updates.unionByName(inserts), ["o_orderkey"])
    # Exact-decimal merge math; final projection to double (decimal output
    # hash-mismatches the DuckDB pandas bridge — see ext_ivm_join).
    return read_table(spark, loc).withColumn(
        "price", F.col("price").cast("double")
    )


@register(
    "ext_table_diff",
    oracle="""
    SELECT 'insert' AS change, CAST(n_nationkey AS INT) AS n_nationkey,
           lower(n_name) AS n_name, CAST(n_regionkey AS INT) AS n_regionkey
    FROM nation WHERE n_regionkey = 0 AND n_name <> lower(n_name)
    UNION ALL
    SELECT 'insert', 999, 'atlantis', 0
    UNION ALL
    SELECT 'delete', CAST(n_nationkey AS INT), n_name,
           CAST(n_regionkey AS INT)
    FROM nation WHERE n_regionkey = 0 AND n_name <> lower(n_name)
    """,
)
def ext_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data feed between two table versions
    (operators/lakehouse.py:diff_versions): the pre-/post-merge
    snapshots decompose into insert/delete rows via bag-semantics set
    difference — an update surfaces as one delete (old image) plus one
    insert (new image), the standard snapshot-CDC contract. The oracle
    enumerates the exact expected change rows."""
    from world_cup_duckdb_spark.operators.lakehouse import (
        diff_versions,
        merge_table,
        write_table,
    )

    loc = _fresh_dir("ext_table_diff")
    n = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("int").alias("n_regionkey"),
    )
    write_table(n, loc)
    source = (
        n.filter(F.col("n_regionkey") == 0)
        .withColumn("n_name", F.lower("n_name"))
        .unionByName(
            spark.createDataFrame(
                [(999, "atlantis", 0)],
                "n_nationkey int, n_name string, n_regionkey int",
            )
        )
    )
    v1 = merge_table(spark, loc, source, ["n_nationkey"])
    return diff_versions(spark, loc, 0, v1)


@register(
    "ext_ivm_join",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(CASE WHEN o_orderkey % 11 = 0 AND o_orderkey % 7 <> 0
                     THEN 2 * CAST(o_totalprice AS DECIMAL(18,2))
                     ELSE CAST(o_totalprice AS DECIMAL(18,2))
                END AS DOUBLE) AS price,
           CAST(c_custkey AS BIGINT) AS c_custkey,
           c_name,
           CAST(c_nationkey AS BIGINT) AS c_nationkey
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderkey % 5 <> 0
    """,
)
def ext_ivm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained materialized join view
    (operators/ivm.py:maintain_join_view): a versioned fact table A
    (orders slice) joined to a static customer dimension, materialized
    once, then kept current through two CDC batches — an upsert wave
    (new orders inserted, some prices doubled) and a delete wave — by
    the delta rule V ← (V ⊖ ΔA⁻⋈B) ⊎ (ΔA⁺⋈B), never recomputing A⋈B.
    The oracle states the final joined result directly from base
    tables, so the hash match proves the incremental path converges to
    the exact recompute.

    Scale: each refresh joins only the CDC batch against the dimension
    (AQE broadcasts the small delta) and anti-joins the view on deleted
    pks — one pk-keyed shuffle of V instead of a full fact join. Every
    refresh is one atomic copy-on-write commit."""
    from world_cup_duckdb_spark.operators.ivm import maintain_join_view
    from world_cup_duckdb_spark.operators.lakehouse import (
        diff_versions,
        merge_table,
        read_table,
        write_table,
    )

    loc_a = _fresh_dir("ext_ivm_join_fact")
    loc_v = _fresh_dir("ext_ivm_join_view")
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.col("o_custkey").cast("bigint").alias("o_custkey"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    dim = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("bigint").alias("o_custkey"),
        F.col("c_name").alias("c_name"),
        F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
    )
    view_cols = ["o_orderkey", "price", "c_custkey", "c_name", "c_nationkey"]

    def to_view(a: DataFrame) -> DataFrame:
        return a.join(dim, "o_custkey").select(
            "o_orderkey",
            "price",
            F.col("o_custkey").alias("c_custkey"),
            "c_name",
            "c_nationkey",
        )

    a0 = orders.filter(F.col("o_orderkey") % 7 != 0)
    write_table(a0, loc_a)
    write_table(to_view(a0), loc_v)

    # CDC batch 1 (upserts): insert the held-out orders, double some prices.
    upserts = orders.filter(F.col("o_orderkey") % 7 == 0).unionByName(
        orders.filter(
            (F.col("o_orderkey") % 11 == 0) & (F.col("o_orderkey") % 7 != 0)
        ).withColumn(
            "price", (F.col("price") * 2).cast("decimal(18,2)")
        )
    )
    merge_table(spark, loc_a, upserts, ["o_orderkey"])
    dim_view = dim.select(
        "o_custkey",
        F.col("o_custkey").alias("c_custkey"),
        "c_name",
        "c_nationkey",
    )
    maintain_join_view(
        spark,
        loc_v,
        diff_versions(spark, loc_a, 0, 1),
        dim_view,
        join_key="o_custkey",
        pk=["o_orderkey"],
        meta={"ivm_batch": 1},
    )

    # CDC batch 2 (deletes): drop every fifth order.
    a2 = read_table(spark, loc_a).filter(F.col("o_orderkey") % 5 != 0)
    write_table(a2, loc_a, mode="overwrite")
    maintain_join_view(
        spark,
        loc_v,
        diff_versions(spark, loc_a, 1, 2),
        dim_view,
        join_key="o_custkey",
        pk=["o_orderkey"],
        meta={"ivm_batch": 2},
    )
    # All maintenance math stays in exact decimal(18,2); only the FINAL
    # projection casts to double. Emitting decimal itself hash-mismatches:
    # Spark returns Decimal('310761.70') where DuckDB's pandas bridge
    # returns float 310761.7 (the r1 driver miss on this key).
    return read_table(spark, loc_v).select(
        "o_orderkey",
        F.col("price").cast("double").alias("price"),
        "c_custkey",
        "c_name",
        "c_nationkey",
    )


def _quartered_doc_table(spark: SparkSession, sf_dir: str, name: str):
    """Shared scaffold for the versioned-table (CoW) family: documents
    written into a fresh table as FOUR id-range appends, each carrying a
    doc_id zone map — the clustered multi-file layout every CoW key
    (delete / update / vacuum) mutates. Returns (loc, d, q) where q is
    the five quartile boundaries. The max(doc_id) collect is bounded:
    one row."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    n = d.agg(F.max("doc_id")).collect()[0][0] + 1  # bounded: 1 row
    q = [(i * n) // 4 for i in range(5)]
    from world_cup_duckdb_spark.operators.lakehouse import write_table

    loc = _fresh_dir(name)
    for i in range(4):
        write_table(
            d.filter(
                (F.col("doc_id") >= q[i]) & (F.col("doc_id") < q[i + 1])
            ),
            loc,
            stats_cols=["doc_id"],
        )
    return loc, d, q


@register(
    "ext_gdpr_delete",
    oracle="""
    WITH m AS (SELECT MAX(doc_id) + 1 AS n FROM documents),
    b AS (
      SELECT (2 * n) // 4 + ((3 * n) // 4 - (2 * n) // 4) // 2 AS lo,
             (3 * n) // 4 + (n - (3 * n) // 4) // 2 AS hi
      FROM m
    )
    SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS rows_before,
           CAST((SELECT COUNT(*) FROM documents, b
                 WHERE doc_id >= lo AND doc_id < hi) AS BIGINT)
             AS rows_deleted,
           CAST((SELECT COUNT(*) FROM documents, b
                 WHERE doc_id < lo OR doc_id >= hi) AS BIGINT) AS rows_after,
           CAST((SELECT SUM(doc_id) FROM documents, b
                 WHERE doc_id < lo OR doc_id >= hi) AS BIGINT)
             AS surviving_id_sum
    """,
)
def ext_gdpr_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write ``DELETE WHERE`` on a versioned table
    (operators/lakehouse.py:delete_where) — the GDPR / right-to-be-
    forgotten operation: documents land in four id-range appends (each
    with a doc_id zone map), then an id-range delete straddling the
    third and fourth ranges rewrites ONLY those two directories; the
    first two carry into the new version by reference, untouched. The
    oracle recomputes the surviving population from the source table —
    the hash match proves CoW deletion loses exactly the matching rows
    and nothing else. Directory-level behavior (reference-kept dirs,
    pre-delete time travel, no-op idempotence) is pinned in
    tests/test_lakehouse.py.

    Scale: the match pass reads the snapshot once and collects only
    per-FILE match counts (manifest-scale); the rewrite scans only
    affected directories — a targeted delete on a clustered 100 TB
    table touches a handful of files. True erasure = delete + vacuum
    (history keeps pre-delete snapshots until retention drops them)."""
    from world_cup_duckdb_spark.operators.lakehouse import (
        delete_where,
        read_table,
    )

    loc, d, q = _quartered_doc_table(spark, sf_dir, "ext_gdpr_delete")
    lo = q[2] + (q[3] - q[2]) // 2
    hi = q[3] + (q[4] - q[3]) // 2
    rows_before = read_table(spark, loc).count()
    _, report = delete_where(
        spark, loc, (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
    )
    after = read_table(spark, loc)
    return after.agg(
        F.lit(rows_before).cast("bigint").alias("rows_before"),
        F.lit(report["rows_deleted"]).cast("bigint").alias("rows_deleted"),
        F.count(F.lit(1)).cast("bigint").alias("rows_after"),
        F.sum("doc_id").cast("bigint").alias("surviving_id_sum"),
    )


@register(
    "ext_cow_update",
    oracle="""
    WITH updated AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                  THEN '[REDACTED] ' || text ELSE text END AS text
      FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(CASE WHEN text LIKE '[REDACTED]%' THEN 1 END)
                AS BIGINT) AS n_updated,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars
    FROM updated
    """,
)
def ext_cow_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write ``UPDATE ... SET ... WHERE`` on a versioned table
    (operators/lakehouse.py:update_where): documents land in four
    id-range appends, then every doc_id % 5 == 0 row gets its text
    prefixed — the redaction-in-place shape of PII remediation. All four
    directories hold matches here, so all rewrite into one new dir (the
    directory-LEVEL selectivity is pinned separately in
    tests/test_lakehouse.py, where a single-region update keeps the
    other dirs by reference). The oracle recomputes the post-update
    population from the source — the hash match proves the update hit
    exactly the matching rows, evaluated assignments against pre-update
    values, and lost nothing.

    Scale: same CoW contract as delete_where — match pass collects
    per-file counts (manifest-scale), rewrite scans only affected
    directories, untouched dirs carry by reference."""
    from world_cup_duckdb_spark.operators.lakehouse import (
        read_table,
        update_where,
    )

    loc, d, q = _quartered_doc_table(spark, sf_dir, "ext_cow_update")
    update_where(
        spark,
        loc,
        F.col("doc_id") % 5 == 0,
        {"text": F.concat(F.lit("[REDACTED] "), F.col("text"))},
    )
    after = read_table(spark, loc)
    return after.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count_if(F.col("text").startswith("[REDACTED]"))
        .cast("bigint")
        .alias("n_updated"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
    )


@register(
    "ext_gdpr_vacuum",
    oracle="""
    WITH m AS (SELECT MAX(doc_id) + 1 AS n FROM documents),
    b AS (
      SELECT (2 * n) // 4 + ((3 * n) // 4 - (2 * n) // 4) // 2 AS lo,
             (3 * n) // 4 + (n - (3 * n) // 4) // 2 AS hi
      FROM m
    )
    SELECT CAST((SELECT COUNT(*) FROM documents, b
                 WHERE doc_id < lo OR doc_id >= hi) AS BIGINT) AS rows_after,
           CAST((SELECT SUM(doc_id) FROM documents, b
                 WHERE doc_id < lo OR doc_id >= hi) AS BIGINT)
             AS surviving_id_sum,
           CAST(5 AS BIGINT) AS n_versions_before,
           CAST(1 AS BIGINT) AS n_versions_after,
           CAST(2 AS BIGINT) AS n_dirs_removed
    """,
)
def ext_gdpr_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE GDPR erasure: CoW delete + VACUUM. ext_gdpr_delete's
    docstring notes that a CoW delete alone keeps pre-delete snapshots
    readable via time travel; this key completes the flow — four
    id-range appends (versions 1-4), the straddling id-range delete
    (version 5), then ``vacuum(keep_versions=1)`` drops the four old
    manifests and physically removes the directories only they
    referenced: exactly the TWO pre-delete directories whose rows were
    rewritten (the two carried-by-reference dirs survive because the
    live version still points at them). The result row proves (a) the
    surviving population is intact (oracle recomputes it from source),
    and (b) the version/dir accounting matches the CoW model: 5
    versions before, 1 after, 2 data dirs physically erased.

    Scale: vacuum is manifest arithmetic (set difference of referenced
    dirs) plus deletes of exactly the orphaned directories — no data
    scan at any table size. Determinism: counts are integers; the dir
    accounting is structural, pinned by the oracle's constants."""
    from world_cup_duckdb_spark.operators.lakehouse import (
        delete_where,
        read_table,
        table_history,
        vacuum,
    )

    loc, d, q = _quartered_doc_table(spark, sf_dir, "ext_gdpr_vacuum")
    lo = q[2] + (q[3] - q[2]) // 2
    hi = q[3] + (q[4] - q[3]) // 2
    delete_where(spark, loc, (F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    n_before = len(table_history(loc))
    removed = vacuum(loc, keep_versions=1)
    n_after = len(table_history(loc))
    after = read_table(spark, loc)
    return after.agg(
        F.count(F.lit(1)).cast("bigint").alias("rows_after"),
        F.sum("doc_id").cast("bigint").alias("surviving_id_sum"),
        F.lit(n_before).cast("bigint").alias("n_versions_before"),
        F.lit(n_after).cast("bigint").alias("n_versions_after"),
        F.lit(len(removed)).cast("bigint").alias("n_dirs_removed"),
    )


@register(
    "ext_torn_commit_recovery",
    oracle="""
    WITH m AS (SELECT MAX(doc_id) + 1 AS n FROM documents),
    extra AS (
      SELECT doc_id FROM documents, m WHERE doc_id < n // 10
    )
    SELECT CAST(1 AS BIGINT) AS n_rolled_forward,
           CAST(4 AS BIGINT) AS latest_version_after,
           CAST((SELECT COUNT(*) FROM documents)
                + (SELECT COUNT(*) FROM extra) AS BIGINT) AS rows_after,
           CAST((SELECT SUM(doc_id) FROM documents)
                + (SELECT COALESCE(SUM(doc_id), 0) FROM extra) AS BIGINT)
             AS id_sum_after
    """,
)
def ext_torn_commit_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crash-recovery as a first-class query: fabricate the exact
    residue a writer crash leaves mid-commit — a COMPLETE data
    directory (parquet written, _SUCCESS marker present), a durable
    fsynced tmp manifest body, and the O_EXCL claim sidecar, but NO
    published manifest — then run restart-time recovery
    (operators/lakehouse.py:recover_torn_commits) and prove the torn
    version ROLLS FORWARD: the claimant had durably decided the
    content, so recovery publishes it and the table serves base rows +
    the torn append (the first tenth of doc ids re-appended here). The
    oracle recomputes the post-recovery population from source, and the
    rolled-forward/latest-version accounting is structural.

    Scale: recovery is transaction-log arithmetic — it lists the _log
    directory, validates referenced dirs exist (metadata stats, no data
    scan), and publishes via one atomic rename; cost is O(residue), not
    table size. The protocol's full crash matrix (every
    claim × tmp-residue combination, refusal-before-recovery, orphan
    accounting) is pytest-parametrized in tests/test_lakehouse.py; this
    key puts the roll-forward path under the driver's hash gate."""
    import json
    import os

    from world_cup_duckdb_spark.operators.lakehouse import (
        _log_dir,
        read_table,
        recover_torn_commits,
    )

    loc, d, q = _quartered_doc_table(spark, sf_dir, "ext_torn_commit")
    n = q[4]
    torn_version = 4  # versions 0-3 are the quartered appends
    torn_dir = f"data-{torn_version:06d}-torn"
    # the crashed writer finished its parquet job (complete dir)…
    d.filter(F.col("doc_id") < n // 10).write.mode("overwrite").parquet(
        os.path.join(loc, torn_dir)
    )
    # …and durably decided the commit (fsynced tmp body + claim), but
    # crashed before the publishing rename.
    # the manifest's ``dirs`` is the FULL snapshot list: previous
    # version's directories plus the torn append's
    from world_cup_duckdb_spark.operators.lakehouse import _read_manifest

    prev_dirs = _read_manifest(loc, torn_version - 1)["dirs"]
    body = {
        "version": torn_version,
        "mode": "append",
        "dirs": prev_dirs + [torn_dir],
    }
    log = _log_dir(loc)
    with open(
        os.path.join(log, f"v{torn_version}.json.tmp-crashed"), "w"
    ) as f:
        json.dump(body, f)
    os.close(
        os.open(
            os.path.join(log, f"v{torn_version}.json.claim"),
            os.O_CREAT | os.O_EXCL | os.O_WRONLY,
        )
    )
    report = recover_torn_commits(loc)
    from world_cup_duckdb_spark.operators.lakehouse import latest_version

    after = read_table(spark, loc)
    return after.agg(
        F.lit(len(report["rolled_forward"]))
        .cast("bigint")
        .alias("n_rolled_forward"),
        F.lit(latest_version(loc)).cast("bigint").alias("latest_version_after"),
        F.count(F.lit(1)).cast("bigint").alias("rows_after"),
        F.sum("doc_id").cast("bigint").alias("id_sum_after"),
    )


@register(
    "ext_version_rollback",
    oracle="""
    SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT)
             AS rows_after_restore,
           CAST((SELECT SUM(doc_id) FROM documents) AS BIGINT)
             AS id_sum_after_restore,
           CAST(5 AS BIGINT) AS restored_as_version,
           CAST(6 AS BIGINT) AS n_history
    """,
)
def ext_version_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE — the undo button of the versioned table, completing the
    lifecycle family (merge / delete / update / time-travel / vacuum /
    torn-commit recovery): four id-range appends (versions 0-3), a
    destructive mid-range delete (version 4), then
    ``restore_table(..., 3)`` re-commits version 3's EXACT file set as
    version 5 — an O(1) metadata operation, no data copied — so the
    head serves the full pre-delete population again while the
    mis-write stays in history for audit (6 surviving manifests). The
    oracle recomputes the restored population from source and pins the
    structural version/history accounting.

    Scale: restore is one manifest read + one atomic commit at any
    table size; history listing is O(versions)."""
    from world_cup_duckdb_spark.operators.lakehouse import (
        delete_where,
        read_table,
        restore_table,
        table_history,
    )

    loc, d, q = _quartered_doc_table(spark, sf_dir, "ext_version_rollback")
    lo = q[2] + (q[3] - q[2]) // 2
    hi = q[3] + (q[4] - q[3]) // 2
    delete_where(spark, loc, (F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    restored_as = restore_table(loc, 3)
    after = read_table(spark, loc)
    return after.agg(
        F.count(F.lit(1)).cast("bigint").alias("rows_after_restore"),
        F.sum("doc_id").cast("bigint").alias("id_sum_after_restore"),
        F.lit(restored_as).cast("bigint").alias("restored_as_version"),
        F.lit(len(table_history(loc))).cast("bigint").alias("n_history"),
    )
