from world_cup_duckdb_spark.sources.catalog import TABLES, load_tables, register_views, table

__all__ = ["TABLES", "load_tables", "register_views", "table"]
