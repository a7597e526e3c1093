"""Scalar function surface (SURVEY.md §2.6, OP35-OP42).

All expressed with built-in JVM functions — zero Python UDFs (the
reference used 3 row-at-a-time lambdas; see functions/strings.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from world_cup_duckdb_spark.functions.strings import (
    capitalize_first,
    dec,
    prefixed_key,
    singularize,
)
from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import load_tables


@register(
    "op35_concat_key",
    oracle="""
    SELECT 'N-' || CAST(n_nationkey AS VARCHAR) AS nation_key, n_name
    FROM nation
    """,
)
def op35_concat_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String concat with literal prefix (OP35) — the `'CTY-' || row_nr`
    key pattern (scripts/build_db.py:144, :231, :279, :411, :578)."""
    n = load_tables(spark, sf_dir)["nation"]
    return n.select(
        prefixed_key("N-", "n_nationkey").alias("nation_key"), "n_name"
    )


@register(
    "op36_replace",
    oracle="""
    SELECT p_partkey, REPLACE(p_name, ' ', '_') AS snake_name FROM part
    """,
)
def op36_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String replace — all occurrences (OP36).

    Reference: Polars `str.replace('_',' ')` replaces the FIRST occurrence
    only (scripts/build_db.py:232); this engine standardizes on
    replace-all, the documented deliberate deviation (SURVEY.md §7 hard
    part 2 — the reference's own README reads as replace-all).
    """
    p = load_tables(spark, sf_dir)["part"]
    return p.select(
        "p_partkey", F.regexp_replace("p_name", " ", "_").alias("snake_name")
    )


@register(
    "op36b_replace_first",
    oracle="""
    SELECT p_partkey,
           CASE WHEN instr(p_name, ' ') > 0
                THEN substr(p_name, 1, instr(p_name, ' ') - 1) || '_'
                     || substr(p_name, instr(p_name, ' ') + 1)
                ELSE p_name END AS first_swap
    FROM part
    """,
)
def op36b_replace_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String replace — FIRST occurrence only (OP36, exact Polars
    fidelity).

    Reference: Polars `str.replace` substitutes only the first match
    (scripts/build_db.py:232). Spark's `regexp_replace`/`replace` are
    replace-all, so first-only is expressed as locate → splice: head
    before the match, replacement, tail after. All codegen-able builtins,
    identical expression on the oracle side (`instr`/`substr` are common
    SQL), no regex anchoring tricks."""
    first = F.expr(
        "CASE WHEN instr(p_name, ' ') > 0 "
        "THEN concat(substr(p_name, 1, instr(p_name, ' ') - 1), '_', "
        "substr(p_name, instr(p_name, ' ') + 1)) "
        "ELSE p_name END"
    )
    p = load_tables(spark, sf_dir)["part"]
    return p.select("p_partkey", first.alias("first_swap"))


@register(
    "op37_capitalize",
    oracle="""
    SELECT DISTINCT c_mktsegment,
           UPPER(SUBSTR(LOWER(c_mktsegment), 1, 1)) || SUBSTR(LOWER(c_mktsegment), 2)
             AS segment_label
    FROM customer
    """,
)
def op37_capitalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capitalize-first-letter, rest untouched (OP37).

    Reference implements this as a Python lambda UDF
    (scripts/build_db.py:581, :764-771); here it's pure codegen-able
    builtins (NOT initcap, which lower-cases the tail per word).
    """
    c = load_tables(spark, sf_dir)["customer"]
    return c.select(
        "c_mktsegment",
        capitalize_first(F.lower(F.col("c_mktsegment"))).alias("segment_label"),
    ).distinct()


@register(
    "op38_singularize",
    oracle="""
    SELECT name,
           CASE WHEN name LIKE '%s'
                THEN SUBSTR(name, 1, LENGTH(name) - 1)
                ELSE name END AS singular
    FROM (
      SELECT DISTINCT event_type || 's' AS name FROM events
      UNION ALL
      SELECT DISTINCT r_name FROM region
    )
    """,
)
def op38_singularize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop trailing 's' when present (OP38, guarded by OP22 endswith).

    Reference: stage-name singularization lambdas
    (scripts/build_db.py:765-767, :964-966). Plural inputs are
    manufactured from event_type||'s'; region names exercise the
    unchanged branch.
    """
    t = load_tables(spark, sf_dir)
    plurals = (
        t["events"]
        .select(F.concat(F.col("event_type"), F.lit("s")).alias("name"))
        .distinct()
    )
    asis = t["region"].select(F.col("r_name").alias("name")).distinct()
    return plurals.unionAll(asis).select(
        "name", singularize("name").alias("singular")
    )


@register(
    "op39_timestamp_parse",
    oracle="""
    SELECT o_orderkey,
           strptime(strftime(o_orderdate, '%Y-%m-%d') || ' ' || '12:30',
                    '%Y-%m-%d %H:%M') AS kickoff_ts
    FROM orders
    """,
)
def op39_timestamp_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date + time string concat → explicit-format timestamp parse (OP39).

    Reference: `strptime(date + ' ' + time, '%Y-%m-%d %H:%M')`
    (scripts/build_db.py:977-981). Explicit patterns, never inference
    (SURVEY.md §7 hard part 5).
    """
    o = load_tables(spark, sf_dir)["orders"]
    return o.select(
        "o_orderkey",
        F.to_timestamp(
            F.concat_ws(
                " ", F.date_format("o_orderdate", "yyyy-MM-dd"), F.lit("12:30")
            ),
            "yyyy-MM-dd HH:mm",
        ).alias("kickoff_ts"),
    )


@register(
    "op40_casts",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_linenumber AS VARCHAR) AS line_str,
           CAST(l_linenumber % 2 AS BOOLEAN) AS odd_line,
           (l_quantity > 25) AS is_bulk
    FROM lineitem
    """,
)
def op40_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts: int→string, int-flag→bool, predicate→bool (OP40).

    Reference: `cast(str)` / `cast(bool)` flag conversions
    (scripts/build_db.py:583, :915, :1157, :1240-1241, :1387).
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_linenumber").cast("string").alias("line_str"),
        (F.col("l_linenumber") % 2).cast("boolean").alias("odd_line"),
        (F.col("l_quantity") > 25).alias("is_bulk"),
    )


@register(
    "op41_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                - CAST(l_discount AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS discounted,
           (l_linenumber * 2 - 1) AS line_odd_index
    FROM lineitem
    """,
)
def op41_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column arithmetic in expressions (OP41) — reference
    `extra_time + penalty_shootout` (scripts/build_db.py:985-989),
    `penalties_for - penalties_against` (:1297-1300)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (dec("l_extendedprice") - dec("l_discount") * dec("l_extendedprice"))
        .cast("double")
        .alias("discounted"),
        (F.col("l_linenumber") * 2 - 1).alias("line_odd_index"),
    )


@register(
    "op11_schema_report",
    oracle="""
    SELECT column_name,
           CASE WHEN column_name = 'l_orderkey' THEN 'PK'
                WHEN column_name LIKE '%key' THEN 'FK'
                ELSE 'attr' END AS key_class
    FROM information_schema.columns
    WHERE table_name = 'lineitem'
    """,
)
def op11_schema_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog introspection + CASE/contains classification (OP08/OP11/OP42).

    Reference: `information_schema.columns` schema echo
    (scripts/build_db.py:55-69) and the PK/FK schema report with
    `contains(column_name,'_id')` (scripts/build_db.md:1444-1461).
    Schema metadata is driver-side by nature; the report itself is a
    DataFrame so it composes with the rest of the engine.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    cols = spark.createDataFrame(
        [(f.name,) for f in li.schema.fields], "column_name string"
    )
    return cols.select(
        "column_name",
        F.when(F.col("column_name") == "l_orderkey", "PK")
        .when(F.col("column_name").endswith("key"), "FK")
        .otherwise("attr")
        .alias("key_class"),
    )


@register(
    "op08_catalog_introspection",
    oracle="""
    SELECT column_name, data_type
    FROM information_schema.columns
    WHERE table_name = 'orders'
    """,
)
def op08_catalog_introspection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog introspection (OP08) — reference queries
    `information_schema.columns` for a table's schema after each load
    (scripts/build_db.py:55-69). Spark's equivalent is `df.schema` /
    `spark.catalog.listColumns`; types are reported in ANSI names so the
    report matches the oracle's information_schema output."""
    ansi = {
        "int": "INTEGER",
        "bigint": "BIGINT",
        "double": "DOUBLE",
        "string": "VARCHAR",
        "boolean": "BOOLEAN",
        "date": "DATE",
        "timestamp": "TIMESTAMP",
        "timestamp_ntz": "TIMESTAMP",
    }
    o = load_tables(spark, sf_dir)["orders"]
    # .get with an upper-cased fallback: unmapped types (decimal(p,s),
    # float, smallint, ...) degrade to a visible parity diff instead of a
    # KeyError at plan-build time if the table schema ever drifts.
    rows = [
        (f.name, ansi.get(st, st.upper()))
        for f in o.schema.fields
        for st in (f.dataType.simpleString(),)
    ]
    return spark.createDataFrame(rows, "column_name string, data_type string")


@register(
    "op42_contains_classifier",
    oracle="""
    SELECT column_name,
           CASE WHEN contains(column_name, '_id') THEN 'FK-shaped'
                ELSE 'attr' END AS key_class
    FROM information_schema.columns
    WHERE table_name = 'events'
    """,
)
def op42_contains_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar `contains` over catalog metadata (OP42) — reference
    classifies columns with `contains(column_name,'_id')` in the schema.csv
    export (scripts/build_db.md:1453-1455)."""
    ev = load_tables(spark, sf_dir)["events"]
    cols = spark.createDataFrame(
        [(f.name,) for f in ev.schema.fields], "column_name string"
    )
    return cols.select(
        "column_name",
        F.when(F.col("column_name").contains("_id"), "FK-shaped")
        .otherwise("attr")
        .alias("key_class"),
    )
