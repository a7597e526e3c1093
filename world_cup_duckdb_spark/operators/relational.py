"""Reshape operators: diagonal union, unpivot, deterministic surrogate keys.

These re-express the reference's Polars reshape vocabulary (SURVEY.md §2.5)
with built-in Spark operators — chosen so every one of them scales: no
driver-side collection, no Python in the row path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def diagonal_union(frames: Sequence[DataFrame]) -> DataFrame:
    """Union-by-name of differently-shaped frames; missing columns → null.

    Reference: ``pl.concat(how='diagonal')`` of goals + melted bookings +
    melted substitutions (scripts/build_db.py:1048-1102, OP31). Spark's
    ``unionByName(allowMissingColumns=True)`` has identical semantics and
    is a zero-shuffle operator (pure plan-level concatenation).
    """
    if not frames:
        raise ValueError("diagonal_union requires at least one frame")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def unpivot_measures(
    df: DataFrame,
    ids: Sequence[str],
    measures: Sequence[str],
    variable_col: str = "variable",
    value_col: str = "value",
) -> DataFrame:
    """Wide→long unpivot with a unified double value column.

    Reference: ``melt(id_vars=[...])`` over event-flag columns
    (scripts/build_db.py:1065-1081, :1083-1099, OP32). Casting measures to
    double up-front avoids Spark's unpivot type-unification error when
    measures mix int/double (SURVEY.md §7 hard part 3). Unpivot is a
    narrow operator — each row expands locally, no shuffle.
    """
    casted = df.select(
        *ids, *[F.col(m).cast("double").alias(m) for m in measures]
    )
    return casted.unpivot(list(ids), list(measures), variable_col, value_col)


def surrogate_key(
    df: DataFrame,
    prefix: str,
    order_by: Sequence[str | Column],
    key_col: str = "id",
) -> DataFrame:
    """Dense 1-based prefixed surrogate keys: ``'CTY-' || row_number``.

    Reference: ``unique() → with_row_count(offset=1) → 'CTY-' + str``
    (scripts/build_db.py:141-144 and 4 more sites, OP33). Two deliberate
    deviations from the reference, per SURVEY.md §7 hard part 1:

    - ``row_number().over(Window.orderBy(natural key))`` instead of an
      input-order row count: Polars' unique()+row-count order is itself
      unstable, and on distributed data input order is undefined — an
      explicit natural-key order is the only deterministic choice.
    - NOT ``monotonically_increasing_id`` — that is non-dense (partition
      gaps) and non-reproducible.

    Scale note: a global window without partitionBy funnels through one
    task. That is exactly what a *dense global* sequence requires
    (it's an inherently sequential contract) and is only used for
    dimension tables (≤10⁵ rows). Fact-scale keying should use natural or
    composite keys instead.
    """
    w = Window.orderBy(*order_by)
    return df.withColumn(
        key_col, F.concat(F.lit(prefix), F.row_number().over(w).cast("string"))
    )
