"""Local differential harness: Spark result vs DuckDB oracle.

Mimics the driver's correctness gate (row count + schema-insensitive,
order-insensitive value comparison) so every registry entry is verified
before the driver ever sees it. Values are canonicalized to strings; floats
via repr (exact — our determinism rules make both engines produce the same
doubles), timestamps to microsecond ISO strings.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from world_cup_duckdb_spark.sources.catalog import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(float(v))
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (int,)):
        return str(v)
    return str(v)


def _rows_to_canon(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def spark_result(df) -> tuple[list[str], list[tuple]]:
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duck_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return cols, rows


def compare(name: str, spark_df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    s_cols, s_rows = spark_result(spark_df)
    d_cols, d_rows = duck_result(con, sql)
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"{name}: columns differ spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}")
    s_canon = _rows_to_canon(s_cols, s_rows)
    d_canon = _rows_to_canon(d_cols, d_rows)
    if s_canon != d_canon:
        diffs = [
            (a, b) for a, b in zip(s_canon, d_canon) if a != b
        ][:5]
        only_s = [r for r in s_canon[:2000] if r not in set(d_canon)][:3]
        only_d = [r for r in d_canon[:2000] if r not in set(s_canon)][:3]
        problems.append(
            f"{name}: values differ; first pair diffs={diffs} only_spark={only_s} only_duck={only_d}"
        )
    return problems
