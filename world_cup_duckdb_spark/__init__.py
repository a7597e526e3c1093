"""world_cup_duckdb_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo ljk233/World-Cup-DuckDB (a DuckDB + Polars ELT/relational
database — see SURVEY.md), re-expressed Spark-first:

- DataFrame / Spark SQL logical plans; Catalyst + Tungsten pick the physical
  strategy (no RDD-level code).
- Constraint enforcement (PK / FK / NOT NULL), which DuckDB does at insert
  time, becomes explicit distributed validators (operators/validators.py).
- The reference's Polars transform vocabulary (select/filter/join/unique/
  melt/diagonal-concat/row-count surrogate keys) is re-expressed with
  built-in pyspark.sql.functions — no Python UDFs on the reference surface.
- Extensions (operators the reference lacks but a 100 TB training-data
  pipeline needs): dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  embedding), similarity search, text analysis, multimodal plumbing, and a
  Structured Streaming layer.
"""

from world_cup_duckdb_spark.session import get_spark
from world_cup_duckdb_spark.sources.catalog import (
    load_tables,
    register_views,
    table,
)

__all__ = ["get_spark", "load_tables", "register_views", "table"]
__version__ = "0.1.0"
