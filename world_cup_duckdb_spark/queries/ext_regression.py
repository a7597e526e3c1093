"""Per-group model fitting: built-in regression aggregates and the
`applyInPandas` group-map escape hatch.

Reference scope: beyond the reference surface, in the same spirit as the
other training-pipeline extensions — the "fit a small model per group"
shape (per-segment trend lines, per-source drift detectors) that a 100 TB
pipeline runs as a grouped aggregate, not a driver loop.

Two implementations of the same fit prove the engine's API ladder:
- ext_regr_per_group: ANSI REGR_* aggregates — JVM-side, partial-
  combining, the right tool when the statistic is expressible;
- fit_events_ols (operators side, registered rows-only as
  ext_fit_pandas): `groupBy().applyInPandas` — Arrow-batched numpy per
  group, the pattern for fits Spark has no aggregate for (tested equal
  to the aggregate version in tests/test_operators.py).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import table

#: epoch seconds of 2024-01-01 UTC — the events fixture's time origin;
#: hours-since-origin keeps regressor magnitudes small enough that a
#: 4-decimal round absorbs engine-side float accumulation differences.
_T0 = 1704067200


@register(
    "ext_regr_per_group",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(REGR_SLOPE(value, (epoch(CAST(ts AS TIMESTAMP)) - {_T0})
                                   / 3600.0), 4) AS slope,
           ROUND(REGR_INTERCEPT(value,
                                (epoch(CAST(ts AS TIMESTAMP)) - {_T0})
                                / 3600.0), 4) AS intercept,
           ROUND(REGR_R2(value, (epoch(CAST(ts AS TIMESTAMP)) - {_T0})
                                / 3600.0), 4) AS r2
    FROM events GROUP BY event_type
    """,
)
def ext_regr_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of value over time (slope / intercept /
    R²) via the ANSI REGR_* aggregates — drift detection as a grouped
    aggregate. Hours-since-origin as the regressor bounds magnitudes so
    the 4-decimal round pins both engines to identical values.

    Scale: REGR_* are algebraic aggregates (sums of x, y, xy, x², y²) —
    they partial-combine map-side like any sum, so the fit costs exactly
    one aggregate exchange of 5 doubles per (group × partition); there is
    no per-group data movement at all.
    """
    e = table(spark, sf_dir, "events")
    x = (F.unix_timestamp("ts") - F.lit(_T0)) / F.lit(3600.0)
    ex = e.select("event_type", F.col("value").alias("y"), x.alias("x"))
    return ex.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.regr_slope("y", "x"), 4).alias("slope"),
        F.round(F.regr_intercept("y", "x"), 4).alias("intercept"),
        F.round(F.regr_r2("y", "x"), 4).alias("r2"),
    )


_FIT_SCHEMA = (
    "event_type string, n bigint, slope double, intercept double, r2 double"
)


def _ols(pdf: pd.DataFrame) -> pd.DataFrame:
    # Plain closed-form OLS in numpy — stands in for any scikit-style fit
    # Spark lacks an aggregate for. One pandas frame per group, Arrow in.
    x, y = pdf["x"].to_numpy(), pdf["y"].to_numpy()
    n = len(x)
    mx, my = x.mean(), y.mean()
    sxx = ((x - mx) ** 2).sum()
    sxy = ((x - mx) * (y - my)).sum()
    syy = ((y - my) ** 2).sum()
    slope = sxy / sxx if sxx else float("nan")
    r2 = (sxy * sxy) / (sxx * syy) if sxx and syy else float("nan")
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n": [n],
            "slope": [slope],
            "intercept": [my - slope * mx],
            "r2": [r2],
        }
    )


def fit_events_ols(events: DataFrame) -> DataFrame:
    """The same per-group OLS via ``groupBy().applyInPandas`` — the
    group-map escape hatch for fits with no SQL aggregate (regularized
    models, scipy optimizers). Each group arrives as ONE Arrow-backed
    pandas frame, so group cardinality must be bounded (here: event
    types); for huge groups, pre-aggregate sufficient statistics with
    REGR_*-style sums instead and fit on the reduced frame.

    Scale: one shuffle on the group key; Python cost is per-group, Arrow-
    batched, and parallel across executors. tests/test_operators.py
    proves it equal to ext_regr_per_group's JVM aggregates.
    """
    x = (F.unix_timestamp("ts") - F.lit(_T0)) / F.lit(3600.0)
    ex = events.select(
        "event_type", F.col("value").alias("y"), x.alias("x")
    )
    return ex.groupBy("event_type").applyInPandas(_ols, _FIT_SCHEMA)


@register(
    "ext_fit_pandas",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(REGR_SLOPE(value, (epoch(CAST(ts AS TIMESTAMP)) - {_T0})
                                   / 3600.0) * 1e4 + 0.5) / 1e4 AS slope,
           FLOOR(REGR_INTERCEPT(value,
                                (epoch(CAST(ts AS TIMESTAMP)) - {_T0})
                                / 3600.0) * 1e4 + 0.5) / 1e4 AS intercept,
           FLOOR(REGR_R2(value, (epoch(CAST(ts AS TIMESTAMP)) - {_T0})
                                / 3600.0) * 1e4 + 0.5) / 1e4 AS r2
    FROM events GROUP BY event_type
    """,
)
def ext_fit_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas group-map fit, hash-checked against the same REGR_*
    oracle as its JVM twin ext_regr_per_group: numpy's mean-centered
    two-pass OLS and SQL's algebraic sums agree to ~1e-12 relative on
    the bounded hours-since-origin regressor, so a 4-decimal quantize
    pins both engines to identical doubles. The quantizer is the
    bit-portable floor(x*1e4 + 0.5)/1e4 on BOTH sides — pure IEEE-754
    double ops, unlike ROUND, whose semantics differ across engines
    (Spark HALF_UP via BigDecimal vs DuckDB double rounding) exactly at
    representable .5 boundaries. Raw (unrounded) numeric equality to the
    aggregate twin remains pytest-verified."""
    fit = fit_events_ols(table(spark, sf_dir, "events"))

    def q4(c: str):
        return (F.floor(F.col(c) * 1e4 + 0.5) / 1e4).alias(c)

    return fit.select("event_type", "n", q4("slope"), q4("intercept"), q4("r2"))
