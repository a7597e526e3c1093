"""Engine programs: multi-table dataflow DAGs composed from the operator
library (SURVEY.md Phase 4)."""

from world_cup_duckdb_spark.plans.worldcup import (
    CONSTRAINTS,
    build_worldcup,
    validate_worldcup,
)

__all__ = ["CONSTRAINTS", "build_worldcup", "validate_worldcup"]
