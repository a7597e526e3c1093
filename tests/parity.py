"""Local differential harness: Spark result vs DuckDB oracle.

Mimics the driver's correctness gate so every registry entry is verified
before the driver ever sees it — and mimics it FAITHFULLY: the driver
compares PANDAS frames (Spark toPandas vs DuckDB .df()), canonicalized by
sorting the frame over every column, which is where the bridge hazards
live (array cells crash the sort; Spark bridges DECIMAL as
Decimal('x.x0') where DuckDB bridges it as a float; DATE arrives as a
date object on one side and a midnight Timestamp on the other). The r3
version of this harness compared collect()/fetchall() rows with a string
canon and passed two queries the driver then failed — comparisons must go
through the same pandas path the driver uses (canon_frame below).

The legacy string canon (_canon/_rows_to_canon over collect() rows) is
kept for re-invocation stability checks (tests/test_determinism.py).
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math

import duckdb
import pandas as pd

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


def canon_cell(v) -> str:
    """Driver-shaped scalar canon, applied AFTER the pandas sort."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if v is pd.NaT:
        return "NULL"
    if isinstance(v, float):
        return repr(float(v))
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat(
            timespec="microseconds"
        )
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, _dt.date):
        # DATE == midnight timestamp: the DuckDB pandas bridge turns every
        # DATE into datetime64, and the driver judges Spark date vs bridge
        # Timestamp equal (op03_date_parse, green r1+r2, has that shape).
        return _dt.datetime(v.year, v.month, v.day).isoformat(
            timespec="microseconds"
        )
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_frame(df: pd.DataFrame) -> list[tuple]:
    """The driver-shaped canonicalization: sort columns by name, then sort
    ROWS via pandas sort_values over every column — the step that dies on
    array/map cells, and it must be allowed to die here so local runs
    predict driver behavior."""
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return [
        tuple(canon_cell(v) for v in row)
        for row in df.itertuples(index=False)
    ]


def compare(name: str, spark_df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity). Goes
    through the SAME pandas bridges the driver uses (toPandas / .df());
    see the module docstring for why collect()-level comparison is not
    faithful."""
    problems: list[str] = []
    s_pdf = spark_df.toPandas()
    d_pdf = con.execute(sql).df()
    s_cols, d_cols = list(s_pdf.columns), list(d_pdf.columns)
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"{name}: columns differ spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_pdf) != len(d_pdf):
        problems.append(f"{name}: row count spark={len(s_pdf)} duck={len(d_pdf)}")
    s_canon = canon_frame(s_pdf)
    d_canon = canon_frame(d_pdf)
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
