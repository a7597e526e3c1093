"""Constraint validator queries (SURVEY.md §2.9, OP50/OP34/OP51).

The reference gets these from DuckDB's insert-time enforcement; here they
are first-class distributed operators (operators/validators.py) that gate
writes. The registry entries exercise them with observable (non-empty)
results; tests/test_validators.py covers the gating behavior itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from world_cup_duckdb_spark.operators.validators import fk_orphans, pk_duplicates
from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import load_tables


@register(
    "op50_pk_duplicates",
    oracle="""
    SELECT o_orderkey, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT * FROM orders UNION ALL SELECT * FROM orders)
    GROUP BY o_orderkey
    HAVING COUNT(*) > 1
    """,
)
def op50_pk_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PK uniqueness check (OP50) on a deliberately duplicated input —
    every key appears twice, so the violation path is exercised.

    Replaces DuckDB dup-PK insert rejection (docs/schema.sql:4-30 PK
    decls, exercised by every load at scripts/build_db.py:72-83).
    """
    o = load_tables(spark, sf_dir)["orders"]
    return pk_duplicates(o.unionAll(o), ["o_orderkey"])


@register(
    "op34_fk_orphans",
    oracle="""
    -- IS NOT NULL mirrors SQL FK semantics (and fk_orphans): a NULL FK
    -- is not an orphan, but bare NOT EXISTS would count it as one
    SELECT 'lineitem.l_orderkey->orders' AS check_name,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE l.l_orderkey IS NOT NULL
                   AND NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
             AS n_orphans
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           CAST((SELECT COUNT(*) FROM customer c
                 WHERE c.c_nationkey IS NOT NULL
                   AND NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
    """,
)
def op34_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK orphan audit across two relationships (OP34).

    Replaces DuckDB REFERENCES enforcement (docs/schema.sql:16, :23) with
    left-anti joins; the audit result is itself a queryable DataFrame
    (check_name, n_orphans) — the write-audit-publish audit table.
    """
    t = load_tables(spark, sf_dir)
    checks = [
        ("lineitem.l_orderkey->orders",
         fk_orphans(t["lineitem"], t["orders"], {"l_orderkey": "o_orderkey"})),
        ("customer.c_nationkey->nation",
         fk_orphans(t["customer"], t["nation"], {"c_nationkey": "n_nationkey"})),
    ]
    out = None
    for name, orphans in checks:
        row = orphans.agg(F.count(F.lit(1)).alias("n_orphans")).select(
            F.lit(name).alias("check_name"), "n_orphans"
        )
        out = row if out is None else out.unionAll(row)
    return out


@register(
    "op51_notnull_pk",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_null_pk
    FROM (SELECT NULLIF(o_orderkey, 0) AS k FROM orders)
    WHERE k IS NULL
    """,
)
def op51_notnull_pk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT-NULL-on-PK check (OP51), with a null manufactured via NULLIF so
    the detection path returns a non-trivial count."""
    o = load_tables(spark, sf_dir)["orders"]
    nulled = o.select(F.nullif(F.col("o_orderkey"), F.lit(0)).alias("k"))
    return nulled.filter(F.col("k").isNull()).agg(
        F.count(F.lit(1)).alias("n_null_pk")
    )
