"""Statistical profile metrics (EXTENSION): behavioral entropy, market
concentration, and time-weighted averages — the summary-statistics layer a
training-data / analytics pipeline runs over event and fact tables.

Cross-engine float discipline (shared with ext_text.py:ext_lm_score):
non-associative reductions (sums of logs, value×duration products,
squared shares) quantize each term to decimal BEFORE the sum, so the result
is independent of partition/accumulation order and identical between
Spark and the DuckDB oracle; exact integer/decimal arithmetic and single
IEEE ops (one divide, one multiply) are reproducible as-is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from world_cup_duckdb_spark.functions.strings import dec
from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import load_tables

_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


def _revenue():
    return dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))


@register(
    "ext_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    t AS (SELECT user_id, SUM(c) AS t FROM c GROUP BY 1),
    terms AS (
      SELECT c.user_id, t.t,
             CAST(c.c AS DECIMAL(8,0))
               * CAST(ln(c.c / t.t) AS DECIMAL(20,12)) AS term
      FROM c JOIN t USING (user_id)
    )
    SELECT user_id,
           CAST(MAX(t) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS INTEGER) AS n_types,
           -(CAST(SUM(term) AS DOUBLE) / MAX(t)) AS entropy_nats
    FROM terms
    GROUP BY user_id
    """,
)
def ext_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of each user's event-type mix — the
    behavioral-diversity signal (0 = single-minded, ln|types| = uniform)
    used for bot filtering and engagement scoring; the same construction
    computes label/token distribution entropy over a training corpus.

    Scale: two partial-combine hash aggregates on the fact plus a
    self-sized join keyed user_id — one shuffle lineage reused by both
    aggregates. Determinism: p = c/t is one exact-integer IEEE divide,
    ln(p) is quantized to DECIMAL(20,12) per term and weighted by the
    integer count, so the per-user sum is accumulation-order exact."""
    e = load_tables(spark, sf_dir)["events"]
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    t = c.groupBy("user_id").agg(F.sum("c").alias("t"))
    terms = c.join(t, "user_id").select(
        "user_id",
        "t",
        (
            F.col("c").cast("decimal(8,0)")
            * F.log(F.col("c") / F.col("t")).cast("decimal(20,12)")
        ).alias("term"),
    )
    return terms.groupBy("user_id").agg(
        F.max("t").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("int").alias("n_types"),
        (-(F.sum("term").cast("double") / F.max("t"))).alias("entropy_nats"),
    )


@register(
    "ext_hhi_concentration",
    oracle=f"""
    WITH rev AS (
      SELECT s_nationkey, l_suppkey, SUM({_REV_SQL}) AS rev
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT s_nationkey, SUM(rev) AS tot FROM rev GROUP BY 1),
    shares AS (
      SELECT rev.s_nationkey,
             CAST(rev.rev AS DOUBLE) / CAST(tot.tot AS DOUBLE) AS share
      FROM rev JOIN tot USING (s_nationkey)
    )
    SELECT n_name,
           CAST(COUNT(*) AS INTEGER) AS n_suppliers,
           ROUND(CAST(SUM(CAST(share * share AS DECIMAL(20,18))) AS DOUBLE), 12)
             AS hhi,
           MAX(share) AS top_share
    FROM shares JOIN nation ON n_nationkey = s_nationkey
    GROUP BY n_name
    """,
)
def ext_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman index of supplier revenue concentration per
    nation: sum of squared revenue shares (1/n = perfectly even, 1.0 =
    monopoly) plus the top supplier's share — the market-structure /
    source-domination metric, identical in shape to corpus-source
    concentration checks over `documents`.

    Scale: revenue reduces fact-side to |suppliers| partials before any
    join; nation totals and shares are dimension-sized. Shares are exact
    decimal→double casts and one IEEE divide; share² is quantized to
    DECIMAL(20,18) pre-sum so the per-nation reduction is order-exact;
    the scale-18 sum's double conversion is ulp-divergent between
    engines, so hhi rounds to 12 decimals (positive, HALF_UP == away)."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select("l_suppkey", _revenue().alias("r"))
    sup = t["supplier"].select("s_suppkey", "s_nationkey")
    rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum("r").alias("rev"))
    )
    tot = rev.groupBy("s_nationkey").agg(F.sum("rev").alias("tot"))
    shares = rev.join(tot, "s_nationkey").select(
        "s_nationkey",
        (F.col("rev").cast("double") / F.col("tot").cast("double")).alias("share"),
    )
    nation = t["nation"].select("n_nationkey", "n_name")
    return (
        shares.join(F.broadcast(nation), shares.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_suppliers"),
            F.round(
                F.sum((F.col("share") * F.col("share")).cast("decimal(20,18)"))
                .cast("double"),
                12,
            ).alias("hhi"),
            F.max("share").alias("top_share"),
        )
    )


@register(
    "ext_time_weighted_avg",
    oracle="""
    WITH e AS (
      SELECT user_id, value,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             LEAD(epoch_us(CAST(ts AS TIMESTAMP)))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    seg AS (
      SELECT user_id, nxt - us AS dur,
             CAST(nxt - us AS DECIMAL(14,0))
               * CAST(value AS DECIMAL(20,12)) AS term
      FROM e WHERE nxt IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(dur) AS BIGINT) AS total_us,
           ROUND(CAST(SUM(term) AS DOUBLE) / SUM(dur), 6) AS twap
    FROM seg
    GROUP BY user_id
    """,
)
def ext_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of `value` per user: each observation holds
    until the next one, so it is weighted by its duration (microsecond
    epoch diffs via lead()) — the TWAP/uptime-average semantic that a
    plain AVG gets wrong whenever sampling is irregular (dense bursts
    would dominate). The final open-ended segment is excluded on both
    engines.

    Scale: one window pass partitioned by user (shuffle on user_id),
    then a hash agg on the same key — the sort is per-partition and the
    partitioning is reused. Determinism: durations are exact integers;
    duration×value quantizes the double value to DECIMAL(20,12) so each
    term — and therefore the sum — is accumulation-order exact. The final
    quotient is rounded to 6 decimals: converting the ~26-digit decimal
    sum to double differs in the last ulp between engines, and rounding
    removes that (positive values, so HALF_UP == half-away)."""
    e = load_tables(spark, sf_dir)["events"]
    # asc_nulls_last mirrors the oracle's null placement for null ts
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), "event_id"
    )
    seg = (
        e.select(
            "user_id",
            "value",
            F.unix_micros("ts").alias("us"),
            F.lead(F.unix_micros("ts")).over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .select(
            "user_id",
            (F.col("nxt") - F.col("us")).alias("dur"),
            (
                (F.col("nxt") - F.col("us")).cast("decimal(14,0)")
                * F.col("value").cast("decimal(20,12)")
            ).alias("term"),
        )
    )
    return seg.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum("dur").cast("bigint").alias("total_us"),
        # try_divide: a user whose kept segments all have zero duration
        # (identical timestamps) has twap NULL like the oracle's /0,
        # not an ANSI DIVIDE_BY_ZERO crash
        F.round(
            F.try_divide(F.sum("term").cast("double"), F.sum("dur")), 6
        ).alias("twap"),
    )


# Poisson(1) CDF thresholds for the deterministic bootstrap, computed
# once in Python and embedded as the same decimal literals in both
# engines (the ext_retrieval_metrics shared-literal pattern).
_POIS_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
]
_N_RESAMPLES = 32


def _bootstrap_oracle() -> str:
    c = [f"CAST('{p!r}' AS DOUBLE)" for p in _POIS_CDF]
    w_case = (
        f"CASE WHEN u < {c[0]} THEN 0 WHEN u < {c[1]} THEN 1 "
        f"WHEN u < {c[2]} THEN 2 WHEN u < {c[3]} THEN 3 "
        f"WHEN u < {c[4]} THEN 4 ELSE 5 END"
    )
    return f"""
    WITH draws AS (
      SELECT doc_id, n_chars, b,
             CAST(
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                               || CAST(b AS VARCHAR)), 1, 8))::BIGINT
               AS DOUBLE) / CAST(4294967296 AS DOUBLE) AS u
      FROM documents
      CROSS JOIN (SELECT unnest(range(0, {_N_RESAMPLES})) AS b)
    ),
    weighted AS (
      SELECT b, CAST(SUM(({w_case}) * n_chars) AS BIGINT) AS wsum,
             CAST(SUM({w_case}) AS BIGINT) AS wn
      FROM draws GROUP BY b
    ),
    means AS (
      SELECT b, CAST(wsum AS DOUBLE) / CAST(wn AS DOUBLE) AS m
      FROM weighted
    ),
    pt AS (
      SELECT CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS pm
      FROM documents
    )
    SELECT CAST({_N_RESAMPLES} AS INT) AS n_resamples,
           pt.pm AS point_mean,
           (SELECT MIN(m) FROM means) AS ci_lo,
           (SELECT MAX(m) FROM means) AS ci_hi
    FROM pt
    """


@register("ext_poisson_bootstrap", oracle=_bootstrap_oracle())
def ext_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson bootstrap (Chamandy et al., Google 2012 —
    "Estimating uncertainty for massive data streams"): the CI
    technique that actually works at 100 TB, because each of the
    {_N_RESAMPLES} resamples assigns every row an INDEPENDENT
    Poisson(1) inclusion weight in a single pass — no resample-sized
    shuffles, no sampling with replacement over distributed data. Here
    the randomness is a DETERMINISTIC md5 draw per (row, resample)
    pushed through the Poisson(1) inverse CDF (thresholds shared as
    literals with the oracle), so the whole procedure — weights,
    per-resample means of n_chars, and the min/max envelope of the 32
    means — is bit-reproducible cross-engine. With 32 resamples the
    min/max envelope is a ~94% CI (1 - 2/33 coverage under the
    bootstrap distribution); more resamples sharpen it without
    changing any shape.

    Scale: ALL 32 resample weights are computed IN-ROW (64 integer
    counters fold map-side in one aggregate over one corpus scan — no
    32-way row explosion); weighted sums are exact int64, so each
    resample mean is one IEEE divide. The point estimate shares the
    same pass's counters."""
    d = load_tables(spark, sf_dir)["documents"]
    c = [F.lit(p).cast("double") for p in _POIS_CDF]

    def weight(b: int):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.lit(str(b)),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        u = h.cast("double") / F.lit(4294967296.0)
        return (
            F.when(u < c[0], 0)
            .when(u < c[1], 1)
            .when(u < c[2], 2)
            .when(u < c[3], 3)
            .when(u < c[4], 4)
            .otherwise(5)
        )

    aggs = [F.sum("n_chars").cast("bigint").alias("tot_chars"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs")]
    for b in range(_N_RESAMPLES):
        w = weight(b)
        aggs.append(
            F.sum(w * F.col("n_chars")).cast("bigint").alias(f"ws{b}")
        )
        aggs.append(F.sum(w).cast("bigint").alias(f"wn{b}"))
    one = d.agg(*aggs)
    means = F.array(
        *[
            F.col(f"ws{b}").cast("double") / F.col(f"wn{b}").cast("double")
            for b in range(_N_RESAMPLES)
        ]
    )
    return one.select(
        F.lit(_N_RESAMPLES).cast("int").alias("n_resamples"),
        (F.col("tot_chars").cast("double") / F.col("n_docs").cast("double"))
        .alias("point_mean"),
        F.array_min(means).alias("ci_lo"),
        F.array_max(means).alias("ci_hi"),
    )


@register(
    "ext_kanonymity",
    oracle="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(10 AS INT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN n < 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_groups_below_k,
           CAST(COALESCE(SUM(CASE WHEN n < 10 THEN n END), 0) AS BIGINT)
             AS n_rows_at_risk,
           CAST(MIN(n) AS BIGINT) AS min_group_size,
           CAST(SUM(CASE WHEN n < 10 THEN n ELSE 0 END) AS DOUBLE)
             / CAST(SUM(n) AS DOUBLE) AS at_risk_share
    FROM g
    """,
)
def ext_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity risk report over quasi-identifiers — the privacy
    governance check that complements PII redaction (ext_pii_redact):
    rows whose quasi-identifier combination (nation, market segment)
    occurs fewer than k=10 times are re-identifiable by linkage, and a
    release gate needs the count BEFORE publishing. Reports group
    census, the below-k population, the minimum group size (the
    table's actual k-anonymity level), and the at-risk share.

    Scale: one hash aggregate on the quasi-identifier key (map-side
    partials) then a census over the bounded group relation — the same
    two-level shape as ext_corpus_datacard's mix section. The
    remediation step (generalize or suppress below-k groups) is a
    broadcast join of the flagged combos back onto the table.
    Determinism: pure integer counts, one final divide."""
    c = load_tables(spark, sf_dir)["customer"]
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    below = F.when(F.col("n") < 10, F.col("n"))
    return g.agg(
        F.lit(10).cast("int").alias("k"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.count_if(F.col("n") < 10).cast("bigint").alias("n_groups_below_k"),
        F.coalesce(F.sum(below), F.lit(0)).cast("bigint").alias(
            "n_rows_at_risk"
        ),
        F.min("n").cast("bigint").alias("min_group_size"),
        (
            F.coalesce(F.sum(below), F.lit(0)).cast("double")
            / F.sum("n").cast("double")
        ).alias("at_risk_share"),
    )
