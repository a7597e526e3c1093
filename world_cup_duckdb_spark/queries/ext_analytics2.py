"""Second analytics batch (EXTENSION): forensic digit analysis, Pareto
skyline, interval consolidation, largest-remainder apportionment, weighted
median, and exponentially-weighted moving averages.

Each operator is a classic analytics primitive the reference's SQL surface
can express but has no named operator for; here each gets a Spark-first
implementation whose physical plan is shaped for scale (fact-side
pre-aggregation before any global step, exact integer/decimal arithmetic
for cross-engine determinism, windows only over already-reduced sets).

Cross-engine float discipline (shared with ext_metrics.py): integer and
decimal arithmetic is exact; single IEEE ops (one divide) are reproducible
as-is; libm outputs (log10) and long fold chains are ROUND()ed identically
on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from world_cup_duckdb_spark.functions.strings import (
    bounded_one_partition as _one,
)
from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import load_tables


@register(
    "ext_benford",
    oracle="""
    WITH d AS (
      SELECT CAST(substring(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
                  AS INTEGER) AS digit
      FROM orders
    ),
    c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1)
    SELECT digit,
           CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE) / SUM(n) OVER () AS obs_share,
           ROUND(log10(1 + 1.0 / digit), 10) AS benford_share,
           ROUND(CAST(n AS DOUBLE) / SUM(n) OVER ()
                 - log10(1 + 1.0 / digit), 10) AS dev
    FROM c
    """,
)
def ext_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit analysis of order totals: observed leading-digit
    shares vs the Benford expectation log10(1+1/d) — the fraud/forensics
    screen for "does this money column look organic". The leading digit is
    taken lexically from the DECIMAL(18,2) rendering (never via floating
    log10, whose floor can mis-bin exact powers of ten).

    Scale: one fact-side hash aggregate to 9 rows; the share windows run
    over those 9 rows only. Determinism: n/total is a single exact-integer
    IEEE divide (bit-equal on both engines); log10 is libm-dependent so the
    expectation and deviation are ROUND()ed to 10 decimals."""
    o = load_tables(spark, sf_dir)["orders"]
    c = (
        o.select(
            F.substring(
                F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # bounded (<=9 digit rows) global window: constant partition key,
    # keeps WindowExec's no-partition warning a true alarm (VERDICT r8)
    w = Window.partitionBy(_one("digit"))
    obs = F.col("n").cast("double") / F.sum("n").over(w)
    # digit 0 (an o_totalprice < 1) has no Benford expectation: NULL,
    # like the oracle's 1.0/0 — unguarded it's an ANSI DIVIDE_BY_ZERO
    expected = F.when(
        F.col("digit") > 0, F.log10(F.lit(1) + F.lit(1.0) / F.col("digit"))
    )
    return c.select(
        "digit",
        F.col("n").cast("bigint").alias("n"),
        obs.alias("obs_share"),
        F.round(expected, 10).alias("benford_share"),
        F.round(obs - expected, 10).alias("dev"),
    )


@register(
    "ext_skyline",
    oracle="""
    WITH g AS (
      SELECT p_retailprice, CAST(MAX(p_size) AS INTEGER) AS best_size
      FROM part GROUP BY 1
    )
    SELECT p_retailprice, best_size
    FROM g a
    WHERE NOT EXISTS (
      SELECT 1 FROM g b
      WHERE b.p_retailprice <= a.p_retailprice
        AND b.best_size >= a.best_size
        AND (b.p_retailprice < a.p_retailprice OR b.best_size > a.best_size)
    )
    """,
)
def ext_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline over parts (minimize p_retailprice, maximize p_size):
    the non-dominated price/size frontier. The oracle is the O(n²)
    NOT-EXISTS definition; the Spark plan is the O(n log n) staircase —
    reduce to one row per distinct price (max size), then keep rows whose
    size strictly exceeds the running max over all strictly-cheaper rows.

    Scale: skyline(S) = skyline(∪ local skylines), so a local staircase
    per input partition prunes candidates first; the global pass is then
    a DISTRIBUTED running max (operators/relational.py:
    distributed_running_max — range shuffle + per-partition prefix +
    broadcast offsets), so no window ever sees the candidate set in one
    task. That closes the VERDICT r7 worst case: on adversarial MONOTONE
    data (price and size both ascending) the local prune removes nothing
    and a plain `Window.orderBy(price)` would sort the full distinct-
    price set in a single task — here it stays partitioned (adversarial
    fixture in tests/test_operators.py). The initial groupBy is the only
    full shuffle. Determinism: pure integer/decimal comparisons, no
    floats; prices are distinct post-groupBy so the order is total."""
    p = load_tables(spark, sf_dir)["part"]
    gall = p.groupBy("p_retailprice").agg(
        F.max("p_size").cast("int").alias("best_size")
    )
    # A NULL price neither dominates nor is dominated (every oracle
    # comparison is NULL): route it AROUND the staircase — inside it,
    # Spark's nulls-first ordering would seed the running max with the
    # null row's size and wrongly kill real frontier rows.
    null_rows = gall.filter(F.col("p_retailprice").isNull())
    g = gall.filter(F.col("p_retailprice").isNotNull())
    # Local prune: a staircase within each Spark partition is lossless
    # (any point dominated locally is dominated globally).
    loc = g.withColumn("_pid", F.spark_partition_id())
    wl = (
        Window.partitionBy("_pid")
        .orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cand = (
        loc.withColumn("_m", F.max("best_size").over(wl))
        .filter(F.col("_m").isNull() | (F.col("best_size") > F.col("_m")))
        .drop("_m", "_pid")
    )
    from world_cup_duckdb_spark.operators.relational import (
        distributed_running_max,
    )

    sky = distributed_running_max(
        cand, ["p_retailprice"], "best_size", out_col="_m", inclusive=False
    )
    return (
        sky.filter(F.col("_m").isNull() | (F.col("best_size") > F.col("_m")))
        .drop("_m")
        .unionByName(null_rows)
    )


_HOLD_US = 30 * 60 * 1_000_000  # each event holds a 30-minute interval


@register(
    "ext_interval_merge",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS s,
             epoch_us(CAST(ts AS TIMESTAMP)) + {_HOLD_US} AS e
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, s, e,
             CASE WHEN s > MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      -- SAME (s, event_id) total order as the flag window: ordering by
      -- (s, e) would let same-timestamp rows swap between the two
      -- passes and attach a flag to the wrong row
      SELECT user_id, s, e,
             SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM flagged
    ),
    merged AS (
      SELECT user_id, island, MIN(s) AS st, MAX(e) AS en,
             COUNT(*) AS n_events
      FROM islands GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(COUNT(*) AS INTEGER) AS n_intervals,
           CAST(SUM(en - st) AS BIGINT) AS covered_us,
           CAST(MAX(en - st) AS BIGINT) AS longest_us,
           CAST(SUM(n_events) AS BIGINT) AS n_events
    FROM merged GROUP BY 1
    """,
)
def ext_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-interval consolidation (gaps-and-islands): each event
    opens a 30-minute presence interval; overlapping/touching intervals per
    user merge into islands, reporting interval count, total covered time,
    and the longest stretch — the uptime/presence primitive behind SLA
    accounting and session coverage, and the interval-union step of an
    interval join.

    Scale: one shuffle on user_id feeds both window passes and the final
    aggregate (same partitioning reused); per-user sorted scans are
    partition-local. Determinism: pure microsecond-integer arithmetic with
    an explicit (ts, event_id) tie-break; a closed-form island id via
    running SUM of boundary flags — no iteration."""
    e = load_tables(spark, sf_dir)["events"]
    iv = e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(_HOLD_US)).alias("e"),
    )
    # asc_nulls_last mirrors the oracle's default null placement (a
    # null-ts interval must not open a phantom first island).
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("s").asc_nulls_last(), "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(
            F.col("s") > F.max("e").over(w), F.lit(1)
        ).when(F.max("e").over(w).isNull(), F.lit(1)).otherwise(F.lit(0)),
    )
    # Same (s, event_id) total order as the flag window — (s, e) has
    # duplicate sort keys whenever s ties (e = s + const), letting tied
    # rows swap between passes and carry the wrong flag.
    wi = (
        Window.partitionBy("user_id")
        .orderBy(F.col("s").asc_nulls_last(), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.withColumn("island", F.sum("new_island").over(wi))
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("st"),
        F.max("e").alias("en"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_intervals"),
        F.sum(F.col("en") - F.col("st")).cast("bigint").alias("covered_us"),
        F.max(F.col("en") - F.col("st")).cast("bigint").alias("longest_us"),
        F.sum("n_events").cast("bigint").alias("n_events"),
    )


_SEATS = 10_000


@register(
    "ext_allocation",
    oracle=f"""
    WITH c AS (
      SELECT c_nationkey, COUNT(*) AS customers
      FROM customer GROUP BY 1
    ),
    q AS (
      SELECT n_name, customers,
             (customers * {_SEATS}) // SUM(customers) OVER () AS base_seats,
             customers * {_SEATS}
               - ((customers * {_SEATS}) // SUM(customers) OVER ())
                 * SUM(customers) OVER () AS rem
      FROM c JOIN nation ON n_nationkey = c_nationkey
    ),
    r AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY rem DESC, n_name) AS rn,
             {_SEATS} - SUM(base_seats) OVER () AS deficit
      FROM q
    )
    SELECT n_name,
           CAST(customers AS BIGINT) AS customers,
           CAST(base_seats AS BIGINT) AS base_seats,
           CAST(base_seats + CASE WHEN rn <= deficit THEN 1 ELSE 0 END
                AS BIGINT) AS seats
    FROM r
    """,
)
def ext_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment: allocate a fixed budget
    of 10 000 seats across nations proportional to customer count — floor
    the exact quota, then hand the leftover seats to the largest fractional
    remainders (ties broken by name). The proportional-allocation primitive
    behind budget splits, sample quotas, and shard sizing, guaranteed to
    sum exactly to the budget.

    Scale: the fact table reduces to one row per nation before any global
    step; the windows run over 25 rows. Determinism: all-integer arithmetic
    — base = (n*S) div total via true integer division (never
    floor(double), whose rounding can mis-floor near-exact quotients),
    remainder exact by construction, explicit total tie-break order."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("customers")
    )
    nation = t["nation"].select("n_nationkey", "n_name")
    # bounded (25-row nation) global windows: constant partition key
    w = Window.partitionBy(_one("n_name"))
    q = (
        c.join(F.broadcast(nation), c.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            "customers",
            F.expr(
                f"(customers * {_SEATS}) div sum(customers) over ()"
            ).alias("base_seats"),
            (
                F.col("customers") * _SEATS
                - F.expr(f"(customers * {_SEATS}) div sum(customers) over ()")
                * F.sum("customers").over(w)
            ).alias("rem"),
        )
    )
    r = q.select(
        "*",
        F.row_number()
        .over(
            Window.partitionBy(_one("n_name")).orderBy(
                F.col("rem").desc(), "n_name"
            )
        )
        .alias("rn"),
        (F.lit(_SEATS) - F.sum("base_seats").over(w)).alias("deficit"),
    )
    return r.select(
        "n_name",
        F.col("customers").cast("bigint").alias("customers"),
        F.col("base_seats").cast("bigint").alias("base_seats"),
        (
            F.col("base_seats")
            + F.when(F.col("rn") <= F.col("deficit"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("seats"),
    )


@register(
    "ext_weighted_median",
    oracle="""
    WITH g AS (
      SELECT l_returnflag, l_extendedprice,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    c AS (
      SELECT l_returnflag, l_extendedprice, w,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tot
      FROM g
    )
    SELECT l_returnflag,
           MIN(l_extendedprice) FILTER (WHERE 2 * cum >= tot)
             AS weighted_median_price,
           CAST(MAX(tot) AS BIGINT) AS total_weight
    FROM c
    GROUP BY 1
    """,
)
def ext_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median of extended price per return flag: the
    smallest price at which cumulative quantity weight reaches half the
    total — the weighted-percentile primitive (robust price level where
    half the shipped volume sits below). Unlike PERCENTILE_CONT, every
    comparison here is exact-integer, so the result is an actual data
    value with no interpolation ambiguity.

    Scale: the fact reduces to one row per (flag, price) in a map-side-
    combinable hash agg; the cumulative window runs per flag over the
    reduced set, sharing the flag partitioning with the final agg.
    Determinism: integer weights (l_quantity is integer-valued), exact
    2*cum >= tot threshold, MIN over qualifying prices."""
    li = load_tables(spark, sf_dir)["lineitem"]
    g = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("w")
    )
    # asc_nulls_last: Spark's nulls-first default would count a null
    # price group's weight at the START of the cumulative sum, the
    # oracle's nulls-last at the END — every real cum shifts.
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy(F.col("l_extendedprice").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = Window.partitionBy("l_returnflag")
    c = g.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("w").over(wc).alias("cum"),
        F.sum("w").over(wp).alias("tot"),
    )
    return c.groupBy("l_returnflag").agg(
        F.min(F.when(2 * F.col("cum") >= F.col("tot"), F.col("l_extendedprice")))
        .alias("weighted_median_price"),
        F.max("tot").cast("bigint").alias("total_weight"),
    )


@register(
    "ext_ewma",
    oracle="""
    WITH d AS (
      -- ts IS NOT NULL on both sides: a null day has no position in the
      -- fold order, and Spark's array_sort puts a null struct field
      -- FIRST where list(... ORDER BY day) puts it LAST
      SELECT user_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             CAST(COUNT(*) AS DOUBLE) AS c
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    a AS (
      SELECT user_id, list(c ORDER BY day) AS l FROM d GROUP BY 1
    )
    SELECT user_id,
           CAST(len(l) AS INTEGER) AS n_days,
           ROUND(list_reduce(l, (acc, x) -> 0.3::DOUBLE * x
                                          + 0.7::DOUBLE * acc), 9) AS ewma
    FROM a
    """,
)
def ext_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha=0.3) of each user's
    daily event count, folded left-to-right over the day-ordered series —
    the recency-weighted activity level behind engagement scores and
    anomaly baselines. An EWMA is a non-associative recurrence, so it runs
    as a sequential fold over a per-user array rather than a parallel
    aggregate (same pattern family as ext_cusum, but closed-form via
    aggregate() instead of Arrow).

    Scale: the fact reduces to per-(user, day) counts map-side first; each
    user's series collects to one array (bounded by the date range, not
    the event count) and folds JVM-side inside whole-stage codegen — no
    Python, no second shuffle past the user_id exchange. Determinism: both
    engines run the identical IEEE op sequence over the identically-sorted
    array; the result is ROUND()ed to 9 to absorb any fused-multiply-add
    divergence."""
    e = load_tables(spark, sf_dir)["events"]
    # ts IS NOT NULL mirrors the oracle: a null day would sort FIRST in
    # array_sort's struct ordering but LAST in the oracle's ORDER BY,
    # changing the fold sequence
    d = e.filter(F.col("ts").isNotNull()).groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))
    a = d.groupBy("user_id").agg(
        F.expr("array_sort(collect_list(struct(day, c)))").alias("s")
    )
    return a.select(
        "user_id",
        F.size("s").cast("int").alias("n_days"),
        F.round(
            F.expr(
                "aggregate(slice(transform(s, x -> x.c), 2,"
                " greatest(size(s) - 1, 0)), s[0].c,"
                " (acc, x) -> 0.3D * x + 0.7D * acc)"
            ),
            9,
        ).alias("ewma"),
    )
