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


def hdr_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    quantiles: list[float] | None = None,
    mantissa_bits: int = 4,
    scale: int = 100,
) -> DataFrame:
    """Per-group quantile estimates from an HDR-histogram-style log-linear
    sketch — the quantile member of the portable-sketch family (KMV for
    distinct counts, this for percentiles).

    Bucketing (HdrHistogram's exponent+mantissa scheme, all integer math so
    both engines agree bit-for-bit — no libm log whose last-ulp rounding
    could flip a bucket at a boundary): the value is fixed-pointed to an
    integer ``c = round(value * scale)``, its binary magnitude is
    ``b = length(bin(c))``, and the top ``mantissa_bits`` bits index a
    sub-bucket within the octave: ``sub = floor(c / 2^shift)`` with
    ``shift = max(b - mantissa_bits, 0)``. Buckets are disjoint intervals
    ``[sub*2^shift, (sub+1)*2^shift)`` with relative width ``2^-(m-1)``
    (m=4 → ≤ 6.7% relative error); the estimate is the bucket midpoint
    (exact value when the bucket is single-integer).

    Scale properties (why this replaces exact PERCENTILE_CONT at 100 TB):
    the bucket count aggregation combines map-side (a group's state is
    ≤ ~16 buckets/octave × ~40 octaves regardless of row count), sketches
    merge by adding counts — so daily partials can be stored and any range
    re-aggregated without rescanning facts — and the quantile extraction
    runs over those few bucket rows, not the data. Division by a power of
    two is exact in IEEE double for c < 2^53, so the only rounding is the
    final display ROUND — deterministic across engines, hence
    oracle-hashable (unlike percentile_approx, whose Greenwald-Khanna
    summary is implementation-defined; see approx_group_stats).

    Output: group cols + ``n`` (bigint) + one ``hdr_p{pct}`` double per
    requested quantile (bucket-midpoint estimate, rounded to 4 decimals).
    """
    counts = hdr_bucket_counts(df, value_col, group_cols, mantissa_bits, scale)
    return hdr_quantiles_from_buckets(counts, group_cols, quantiles, scale)


def hdr_bucket_counts(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    mantissa_bits: int = 4,
    scale: int = 100,
) -> DataFrame:
    """The sketch STATE: per-group bucket counts (group cols, _shift,
    _sub, _cnt). This is what a 100 TB pipeline stores per shard/day —
    sketches MERGE by unioning count tables and summing _cnt per bucket
    (groupBy + sum), proven in tests/test_operators.py.

    Domain: values fixed-pointing to c >= 0. Zeros land in the exact
    [0,1) bucket (bin(0)='0' gives shift 0, sub 0 in both engines);
    NEGATIVE values are outside the sketch's domain (HdrHistogram
    likewise records non-negative magnitudes) and are excluded from the
    counts — quantiles over a signed distribution need a sign-split pair
    of sketches, not this one."""
    c = F.round(F.col(value_col) * scale).cast("bigint")
    base = df.select(*group_cols, c.alias("_c")).filter(F.col("_c") >= 0)
    shift = F.greatest(
        F.length(F.bin(F.col("_c"))) - F.lit(mantissa_bits), F.lit(0)
    )
    sub = F.floor(F.col("_c") / F.pow(F.lit(2.0), shift.cast("double"))).cast(
        "bigint"
    )
    return (
        base.withColumn("_shift", shift)
        .withColumn("_sub", sub)
        .groupBy(*group_cols, "_shift", "_sub")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )


def hdr_quantiles_from_buckets(
    counts: DataFrame,
    group_cols: list[str],
    quantiles: list[float] | None = None,
    scale: int = 100,
) -> DataFrame:
    """Quantile extraction over a (possibly merged) bucket-count table —
    runs over O(buckets) rows, never the data."""
    quantiles = quantiles or [0.5, 0.95, 0.99]
    two_pow = F.pow(F.lit(2.0), F.col("_shift").cast("double"))
    lo = F.col("_sub") * two_pow  # bucket lower bound: orders buckets by value
    est = (
        F.when(F.col("_shift") > 0, (F.col("_sub") + F.lit(0.5)) * two_pow)
        .otherwise(F.col("_sub").cast("double"))
        / F.lit(float(scale))
    )
    grp = Window.partitionBy(*group_cols)
    cum_w = grp.orderBy(lo).rowsBetween(Window.unboundedPreceding, 0)
    ranked = counts.select(
        *group_cols,
        F.round(est, 4).alias("_est"),
        F.sum("_cnt").over(cum_w).alias("_cum"),
        F.sum("_cnt").over(grp).alias("_n"),
    )
    aggs = [F.max("_n").alias("n")]
    for q in quantiles:
        target = F.ceil(F.lit(q) * F.col("_n"))
        aggs.append(
            F.min(F.when(F.col("_cum") >= target, F.col("_est"))).alias(
                f"hdr_p{round(q * 100)}"
            )
        )
    return ranked.groupBy(*group_cols).agg(*aggs)


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
