"""Driver-visible evidence for the Phase-4 World-Cup DAG: build all 27
schema.sql tables from the literal raw fixtures, validate every declared
PK/FK, and return a one-row-per-table manifest. The build consumes
literal fixtures (not the sf testdata), so its output is fully
deterministic — the oracle states the expected manifest as a VALUES
literal, pinning every table's row count, PK columns, and FK count the
way the reference's own expected-output assertions would. The DAG's
internals are additionally pytest-verified in tests/test_worldcup.py."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from world_cup_duckdb_spark.queries import register

_MANIFEST_ORACLE = """
    SELECT col0 AS table_name, CAST(col1 AS BIGINT) AS n_rows,
           col2 AS pk_cols, CAST(col3 AS INTEGER) AS n_fks
    FROM (VALUES
      ('award', 1, 'id', 0),
      ('award_winner', 1, 'tournament_id,award_id,player_id', 3),
      ('city', 2, 'id', 0),
      ('confederation', 2, 'id', 0),
      ('event', 14, 'id', 4),
      ('event_type', 9, 'id', 0),
      ('federation', 4, 'id', 1),
      ('manager', 3, 'id', 0),
      ('match', 4, 'id', 5),
      ('match_player', 8, 'match_id,player_id', 4),
      ('match_replay', 1, 'first_match_id,second_match_id', 2),
      ('penalty_kick', 4, 'id', 3),
      ('player', 8, 'id', 0),
      ('position', 4, 'id', 1),
      ('position_type', 4, 'id', 0),
      ('referee', 2, 'id', 1),
      ('stadium', 2, 'id', 1),
      ('stage', 2, 'id', 0),
      ('team', 4, 'id', 1),
      ('team_appearance', 8, 'match_id,team_id', 3),
      ('tournament', 1, 'id', 1),
      ('tournament_manager', 3, 'tournament_id,manager_id', 3),
      ('tournament_referee', 2, 'tournament_id,referee_id', 2),
      ('tournament_schedule', 2, 'tournament_id,stage_id,stage_detail', 2),
      ('tournament_squad', 8, 'tournament_id,team_id,player_id', 4),
      ('tournament_team', 4, 'tournament_id,team_id', 2),
      ('tournament_team_group_performance', 4,
       'tournament_id,stage_id,stage_detail,team_id', 3)
    ) ORDER BY 1
"""


@register("wc_build_manifest", oracle=_MANIFEST_ORACLE)
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
