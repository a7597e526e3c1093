"""Distinct-count sketching: K-minimum-values (KMV) with portable
hashing.

The scale story for COUNT(DISTINCT) is a mergeable sketch
(`approx_count_distinct`'s HLL++ is the built-in); its estimates are
engine-specific, so they can't be differentially tested. KMV fixes that:
keep the k smallest md5 hashes of the values — a deterministic set given
a deterministic hash — and estimate n ≈ (k-1)/frac(k-th smallest). Both
engines compute bit-identical estimates (tests + oracle), which is the
point: a sketch whose behavior is provable across systems.

Mergeability (the 100 TB property): the union of two KMV sets, re-trimmed
to the k smallest, is the sketch of the union — partial aggregation works
per partition exactly like any min-k.

Accuracy: relative error ~ 1/sqrt(k-2); k=64 → ~12%. Uses 13 hex digits
(52 bits) of the hash so the fraction arithmetic is exact in IEEE double
and in BIGINT in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HEX_DIGITS = 13
_SCALE = float(16**HEX_DIGITS)


def kmv_distinct_estimate(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Per-group KMV estimate of COUNT(DISTINCT value_col).

    Output: group cols + ``kmv_estimate`` (double). Groups with fewer
    than k distinct values fall back to the exact distinct count (the
    sketch set IS the value set there).
    """
    hashed = (
        df.select(*group_cols, F.md5(F.col(value_col).cast("string")).alias("h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    ranked = hashed.withColumn("rn", F.row_number().over(w))
    kth = ranked.filter(F.col("rn") <= k).groupBy(*group_cols).agg(
        F.max("rn").alias("n_kept"), F.max("h").alias("kth_hash")
    )
    frac = (
        F.conv(F.substring("kth_hash", 1, HEX_DIGITS), 16, 10).cast("bigint")
        / F.lit(_SCALE)
    )
    return kth.select(
        *group_cols,
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise((F.lit(float(k - 1))) / frac)
        .alias("kmv_estimate"),
    )
