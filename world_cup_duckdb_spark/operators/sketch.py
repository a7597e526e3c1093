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


def approx_group_stats(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    quantile_col: str,
    percentages: list[float] | None = None,
    accuracy: int = 10000,
    rsd: float = 0.05,
) -> DataFrame:
    """The approximate-aggregation scale path: per-group HLL++ distinct
    count (`approx_count_distinct`, relative std dev ``rsd``) and
    approximate percentiles (`percentile_approx`, Greenwald-Khanna-style
    mergeable summary with 1/``accuracy`` rank error).

    This is what replaces exact COUNT(DISTINCT) / PERCENTILE_CONT at
    100 TB: both sketches aggregate partially map-side and merge in one
    shuffle round, state is O(sketch) per group instead of O(values), and
    the error is tunable. Estimates are engine-specific (unlike
    kmv_distinct_estimate), so correctness is asserted as an error bound
    against the exact answers (tests/test_scale.py), not an oracle hash.

    Output: group cols + ``approx_distinct`` (bigint) + one
    ``approx_p{pct}`` column per requested percentage.
    """
    percentages = percentages or [0.5, 0.95]
    aggs = [
        F.approx_count_distinct(distinct_col, rsd=rsd).alias("approx_distinct")
    ]
    for p in percentages:
        aggs.append(
            F.percentile_approx(quantile_col, p, accuracy).alias(
                f"approx_p{int(p * 100)}"
            )
        )
    return df.groupBy(*group_cols).agg(*aggs)


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


def misra_gries_candidates(items: DataFrame, col: str, k: int) -> DataFrame:
    """Partition-local Misra-Gries heavy-hitter candidates.

    Runs the classic k-counter summary over each partition's stream of
    `col` values via Arrow-batched mapInPandas, emitting each partition's
    surviving candidate set (≤ k rows per partition, one column `col`).

    Guarantee (the reason two-pass exact heavy hitters works at 100 TB):
    any item with global frequency > N/k has local frequency > N_p/k in at
    least one partition (averaging argument), and Misra-Gries with k
    counters never evicts an item whose local frequency exceeds N_p/k —
    so the union of per-partition candidates is a SUPERSET of the true
    heavy hitters, regardless of how rows were partitioned. A second
    exact counting pass over this small candidate set then yields the
    exact answer with no full-cardinality shuffle.
    """
    import pandas as pd

    out_schema = f"{col} string"

    def mg(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for v in pdf[col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = [key for key in counters if counters[key] == 1]
                    for key in counters:
                        counters[key] -= 1
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({col: list(counters.keys())})

    return items.select(col).mapInPandas(mg, out_schema)
