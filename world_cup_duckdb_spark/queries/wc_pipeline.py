"""Driver-visible evidence for the Phase-4 World-Cup DAG: build all 27
schema.sql tables from the literal raw fixtures, validate every declared
PK/FK, and return a one-row-per-table manifest. Rows-only check (the DAG
itself is pytest-verified in tests/test_worldcup.py; inputs are literal
fixtures, not the sf testdata, so there is no DuckDB oracle view to
compare against)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from world_cup_duckdb_spark.queries import register


@register("wc_build_manifest", oracle=None)
def wc_build_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """27-table build manifest: (table_name, n_rows, pk_cols, n_fks).

    Write-audit-publish gate: every declared PK/FK/NOT-NULL validator
    (OP50/OP34/OP51, operators/validators.py) runs over every built table
    BEFORE the manifest is returned — the engine-side equivalent of the
    reference's load-time constraint rejection (scripts/build_db.py:72-83
    inserting into the declared DDL of docs/schema.sql). A violation
    raises ValidationError, so a manifest row existing certifies its
    table passed audit. One unioned aggregation plan then counts every
    table in a single job.
    """
    from world_cup_duckdb_spark.operators.validators import ValidationError
    from world_cup_duckdb_spark.plans import (
        CONSTRAINTS,
        build_worldcup,
        validate_worldcup,
    )
    from world_cup_duckdb_spark.plans.fixtures import raw_fixture

    tables = build_worldcup(spark, raw_fixture(spark))
    problems = validate_worldcup(tables)
    if problems:
        raise ValidationError(str(problems))
    counts = [
        df.select(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.lit(",".join(CONSTRAINTS[name][0])).alias("pk_cols"),
            F.lit(len(CONSTRAINTS[name][1])).cast("int").alias("n_fks"),
        )
        for name, df in tables.items()
    ]
    return reduce(lambda a, b: a.unionByName(b), counts).orderBy("table_name")
