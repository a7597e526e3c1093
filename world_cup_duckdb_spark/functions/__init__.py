from world_cup_duckdb_spark.functions.strings import (
    capitalize_first,
    dec,
    md5_bucket,
    prefixed_key,
    singularize,
)

__all__ = ["capitalize_first", "dec", "md5_bucket", "prefixed_key", "singularize"]
