"""Third analytics batch (EXTENSION): time-series resampling with linear
interpolation, chi-square independence, new-vs-returning novelty curves,
positional phrase search, two-pass exact heavy hitters, and Kaplan-Meier
survival.

Scale shape shared by all six: reduce the fact table with a partial-
combinable aggregate (or a pushed-down filter) FIRST, run windows only on
the reduced set, and keep every global step bounded by group cardinality,
never row count. Cross-engine float discipline as in ext_metrics.py:
integer arithmetic exact, single IEEE divides reproducible, libm outputs
(ln/exp) quantized to decimal pre-sum and ROUND()ed post.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from world_cup_duckdb_spark.operators.sketch import misra_gries_candidates
from world_cup_duckdb_spark.functions.strings import (
    bounded_one_partition as _one,
)
from world_cup_duckdb_spark.queries import register, tracked_persist
from world_cup_duckdb_spark.sources.catalog import load_tables

_HOUR_US = 3_600_000_000


@register(
    "ext_linear_interp",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
      FROM events
    ),
    b AS (
      SELECT user_id,
             (({_HOUR_US} - 1 + MIN(us)) // {_HOUR_US}) * {_HOUR_US} AS lo,
             (MAX(us) // {_HOUR_US}) * {_HOUR_US} AS hi
      FROM e GROUP BY 1
    ),
    g AS (
      SELECT user_id, unnest(generate_series(lo, hi, {_HOUR_US})) AS us
      FROM b WHERE lo <= hi
    ),
    u AS (
      -- evt_us is null WHEN value is null: the carried (pc, pts) pair
      -- must come from the SAME observation, or a null-valued event
      -- would desynchronize the slope's anchor timestamp from its value.
      -- value is carried in exact CENTS (the column is 2-decimal money):
      -- integer arithmetic downstream is engine-exact, where a double
      -- mul-add is FMA-contractable in a C engine but never in the JVM
      -- (2-ulp divergence observed at sf0.1: 2 of 1,047,914 rows).
      SELECT user_id, us, 0 AS tag, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS vc,
             CASE WHEN value IS NOT NULL THEN us END AS evt_us FROM e
      UNION ALL
      SELECT user_id, us, 1 AS tag, -1 AS event_id,
             NULL::BIGINT AS vc, NULL::BIGINT AS evt_us FROM g
    ),
    w AS (
      SELECT user_id, us, tag,
             last_value(vc IGNORE NULLS) OVER prv AS pc,
             last_value(evt_us IGNORE NULLS) OVER prv AS pts,
             first_value(vc IGNORE NULLS) OVER nxt AS nc,
             first_value(evt_us IGNORE NULLS) OVER nxt AS nts
      FROM u
      WINDOW
        prv AS (PARTITION BY user_id ORDER BY us, tag, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        nxt AS (PARTITION BY user_id ORDER BY us, tag, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    -- exact int64 numerator, ONE int64->double conversion each side of
    -- ONE IEEE divide: bit-identical in any IEEE-754 engine
    SELECT user_id, make_timestamp(us) AS ts,
           CASE WHEN nts IS NULL THEN CAST(pc AS DOUBLE) / 100.0
                ELSE CAST(pc * (nts - us) + nc * (us - pts) AS DOUBLE)
                     / CAST((nts - pts) * 100 AS DOUBLE)
           END AS v
    FROM w
    WHERE tag = 1 AND pc IS NOT NULL
    """,
)
def ext_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's irregular `value` series onto an hourly grid by
    linear interpolation between the surrounding observations (flat-fill
    after the last one) — the time-series alignment primitive that turns
    event streams into fixed-step model inputs; the interpolating upgrade
    of `ext_gap_fill_locf`.

    Mechanism: generate the per-user hourly grid with sequence(), union it
    with the events, and in ONE sorted pass per user carry the previous
    observation forward (last_value IGNORE NULLS) and the next one
    backward (first_value IGNORE NULLS over the suffix frame) — no as-of
    self-join, no per-grid-point probe.

    Scale: one shuffle on user_id; grid size is bounded by the time range
    (hours), not the event count, and both window frames plus the sort
    share that single exchange. Determinism: values are carried as exact
    integer CENTS (2-decimal column) and timestamps as exact integer
    microseconds, so the interpolation numerator pc·(nts−us)+nc·(us−pts)
    is exact int64 arithmetic; the only floating-point op is ONE IEEE
    divide after ONE int64→double conversion per side — bit-identical in
    any IEEE-754 engine. The earlier double mul-add form diverged by one
    ulp on 2 of 1,047,914 rows at sf0.1 (C engines may contract a*b+c to
    FMA; the JVM never does), which a ROUND(…,9) cannot absorb when the
    boundary lands on the round digit. int64 headroom: |cents| ≤ ~10⁶ and
    segment gaps ≤ ~10¹² µs keep the numerator < 2⁶³ by >5 orders of
    magnitude; a multi-year-gap corpus would need the numerator in
    DECIMAL(38). Ties at the same microsecond order by (tag, event_id),
    both non-null everywhere."""
    e = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_id", F.unix_micros("ts").alias("us"), "value"
    )
    b = e.groupBy("user_id").agg(
        (
            F.expr(f"({_HOUR_US} - 1 + min(us)) div {_HOUR_US}") * _HOUR_US
        ).alias("lo"),
        (F.expr(f"max(us) div {_HOUR_US}") * _HOUR_US).alias("hi"),
    )
    g = b.filter("lo <= hi").select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.lit(_HOUR_US))).alias("us"),
    )
    u = e.select(
        "user_id", "us", F.lit(0).alias("tag"), "event_id",
        # exact integer cents — see the oracle comment: int64 arithmetic
        # is engine-exact where a double mul-add can FMA-contract
        F.round(F.col("value") * 100).cast("bigint").alias("vc"),
        # null evt_us for null-valued events: (pc, pts) and (nc, nts)
        # must be carried as synchronized pairs from the same observation
        F.when(F.col("value").isNotNull(), F.col("us")).alias("evt_us"),
    ).unionAll(
        g.select(
            "user_id", "us", F.lit(1).alias("tag"),
            F.lit(-1).alias("event_id"),
            F.lit(None).cast("bigint").alias("vc"),
            F.lit(None).cast("bigint").alias("evt_us"),
        )
    )
    order = [F.col("us"), F.col("tag"), F.col("event_id")]
    prv = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nxt = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    w = u.select(
        "user_id", "us", "tag",
        F.last("vc", ignorenulls=True).over(prv).alias("pc"),
        F.last("evt_us", ignorenulls=True).over(prv).alias("pts"),
        F.first("vc", ignorenulls=True).over(nxt).alias("nc"),
        F.first("evt_us", ignorenulls=True).over(nxt).alias("nts"),
    )
    num = (
        F.col("pc") * (F.col("nts") - F.col("us"))
        + F.col("nc") * (F.col("us") - F.col("pts"))
    ).cast("double")
    den = ((F.col("nts") - F.col("pts")) * 100).cast("double")
    return (
        w.filter((F.col("tag") == 1) & F.col("pc").isNotNull())
        .select(
            "user_id",
            F.timestamp_micros("us").alias("ts"),
            F.when(
                F.col("nts").isNull(), F.col("pc").cast("double") / 100.0
            ).otherwise(num / den).alias("v"),
        )
    )


@register(
    "ext_chi_square",
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority AS p, o_orderstatus AS s, COUNT(*) AS o
      FROM orders GROUP BY 1, 2
    ),
    m AS (
      SELECT o,
             SUM(o) OVER (PARTITION BY p) AS rt,
             SUM(o) OVER (PARTITION BY s) AS ct,
             SUM(o) OVER () AS tot
      FROM cells
    ),
    t AS (
      SELECT tot,
             (SELECT COUNT(DISTINCT p) FROM cells) AS r,
             (SELECT COUNT(DISTINCT s) FROM cells) AS c,
             CAST(
               (o - CAST(rt * ct AS DOUBLE) / tot)
               * (o - CAST(rt * ct AS DOUBLE) / tot)
               / (CAST(rt * ct AS DOUBLE) / tot)
               AS DECIMAL(26,12)) AS term
      FROM m
    )
    SELECT CAST(MAX(tot) AS BIGINT) AS n,
           CAST((MAX(r) - 1) * (MAX(c) - 1) AS INTEGER) AS dof,
           ROUND(CAST(SUM(term) AS DOUBLE), 9) AS chi2
    FROM t
    """,
)
def ext_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between order priority and
    order status: Σ (observed − expected)² / expected over the
    contingency cells, with expected = row·col/total — the categorical
    association screen (is status independent of priority?) behind
    feature selection and drift detection.

    Scale: the fact collapses to an r×c cell table in one partial-
    combinable aggregate; every margin is a window over those ≤15 rows.
    Determinism: observed counts and margin products are exact integers;
    expected is one exact-integer IEEE divide; each cell's term is
    quantized to DECIMAL(26,12) before the order-sensitive sum and the
    final statistic is ROUND()ed to 9."""
    o = load_tables(spark, sf_dir)["orders"]
    cells = o.groupBy(
        F.col("o_orderpriority").alias("p"), F.col("o_orderstatus").alias("s")
    ).agg(F.count(F.lit(1)).alias("o"))
    wr = Window.partitionBy("p")
    wc = Window.partitionBy("s")
    # bounded (priority x status cells) global total: constant partition
    wa = Window.partitionBy(_one("p"))
    e = (F.col("rt") * F.col("ct")).cast("double") / F.col("tot")
    m = cells.select(
        "p",
        "s",
        "o",
        F.sum("o").over(wr).alias("rt"),
        F.sum("o").over(wc).alias("ct"),
        F.sum("o").over(wa).alias("tot"),
    )
    t = m.select(
        "p",
        "s",
        "tot",
        ((F.col("o") - e) * (F.col("o") - e) / e).cast("decimal(26,12)").alias(
            "term"
        ),
    )
    return t.agg(
        F.max("tot").cast("bigint").alias("n"),
        # NULL-on-empty like the oracle's (MAX(r)-1)*(MAX(c)-1): bare
        # count_distinct over zero rows is 0, which would yield dof=1
        # where DuckDB's MAX-over-empty yields NULL
        F.when(
            F.count(F.lit(1)) > 0,
            (F.count_distinct(F.col("p")) - 1)
            * (F.count_distinct(F.col("s")) - 1),
        )
        .cast("int")
        .alias("dof"),
        F.round(F.sum("term").cast("double"), 9).alias("chi2"),
    )


@register(
    "ext_novelty_curve",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
      FROM events
    ),
    f AS (
      SELECT user_id, day, MIN(day) OVER (PARTITION BY user_id) AS first_day
      FROM d
    )
    SELECT day,
           CAST(COUNT(*) FILTER (WHERE day = first_day) AS BIGINT)
             AS new_users,
           CAST(COUNT(*) FILTER (WHERE day > first_day) AS BIGINT)
             AS returning_users,
           COUNT(*) FILTER (WHERE day = first_day)
             / CAST(COUNT(*) AS DOUBLE) AS pct_new
    FROM f
    GROUP BY 1
    """,
)
def ext_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning curve: of the users active each day, how
    many are first-seen that day — the novelty/growth decomposition of
    activity, and the exact shape of the first-seen-vs-repeat monitor a
    corpus-ingest pipeline runs over document hashes per batch.

    Scale: the fact dedupes to (user, day) pairs map-side; the first-seen
    day is a per-user window over those pairs and the daily rollup reuses
    no more than the pair set. Determinism: date_trunc pinned to DATE on
    both engines (UTC session), counts exact, one exact-integer divide."""
    e = load_tables(spark, sf_dir)["events"]
    d = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    f = d.withColumn(
        "first_day", F.min("day").over(Window.partitionBy("user_id"))
    )
    new = F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
    return f.groupBy("day").agg(
        new.cast("bigint").alias("new_users"),
        F.sum(F.when(F.col("day") > F.col("first_day"), 1).otherwise(0))
        .cast("bigint")
        .alias("returning_users"),
        (new / F.count(F.lit(1)).cast("double")).alias("pct_new"),
    )


_PHRASE = ("batch", "batch")


@register(
    "ext_phrase_search",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    p AS (
      SELECT doc_id, unnest(l) AS term,
             unnest(generate_series(0, len(l) - 1)) AS pos
      FROM s
    )
    SELECT a.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MIN(a.pos) AS INTEGER) AS first_pos
    FROM p a JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    WHERE a.term = '{_PHRASE[0]}' AND b.term = '{_PHRASE[1]}'
    GROUP BY 1
    """,
)
def ext_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search (the query phrase is `_PHRASE`): tokenize
    documents into a
    positional postings list (term, doc, position) and find exact phrase
    occurrences by joining adjacent positions — the inverted-index
    primitive under every full-text engine, here as a first-class
    relational plan.

    Scale: the phrase terms filter the postings BEFORE the self-join, so
    the join touches only the two terms' postings, never the full index
    (Catalyst pushes the term predicate into both scan branches); the
    equi-join keys on (doc_id, pos) and the per-doc rollup reuses the
    doc_id partitioning. Determinism: pure integer positions and counts.
    """
    d = load_tables(spark, sf_dir)["documents"]
    postings = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
    )
    a = postings.filter(F.col("term") == _PHRASE[0]).alias("a")
    b = postings.filter(F.col("term") == _PHRASE[1]).alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.min("a.pos").cast("int").alias("first_pos"),
        )
    )


_MG_K = 50


@register(
    "ext_heavy_hitters",
    oracle=f"""
    WITH t AS (
      SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tot AS (SELECT COUNT(*) AS n FROM t)
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS n,
           COUNT(*) / CAST(MAX(tot.n) AS DOUBLE) AS share
    FROM t, tot
    GROUP BY term
    HAVING COUNT(*) * {_MG_K} > MAX(tot.n)
    """,
)
def ext_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters (terms with frequency > N/k, k=_MG_K)
    via the two-pass Misra-Gries method: pass 1 runs a k-counter Misra-Gries
    summary per partition (Arrow mapInPandas) whose union provably
    contains every true heavy hitter; pass 2 exactly counts only those
    candidates. The output is EXACT — the sketch only prunes.

    Scale: this is the 100 TB answer to top-frequency queries over
    unbounded cardinality — pass 1 is map-only with O(k) state per
    partition and emits ≤ k·partitions candidate rows; pass 2 makes ONE
    further corpus pass: non-candidate terms collapse into a single null
    group (split() never emits null, so null is a safe sentinel), which
    yields both the exact candidate counts AND the corpus total from one
    aggregation — no shuffle ever carries the full term cardinality (a
    plain groupBy would, and a separate COUNT(*) pass would scan the
    corpus a third time). The oracle is the naive full
    GROUP BY ... HAVING, so the hash match proves the pruning lossless.
    Determinism: integer counts, one exact divide for the share."""
    d = load_tables(spark, sf_dir)["documents"]
    terms = d.select(
        F.explode(F.split("text", " ")).alias("term")
    )
    cand = misra_gries_candidates(terms, "term", _MG_K).distinct()
    marked = terms.join(
        F.broadcast(cand.withColumn("_cand", F.lit(True))), "term", "left"
    )
    groups = (
        marked.groupBy(
            F.when(F.col("_cand"), F.col("term")).alias("term")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        # Tiny (≤ candidates + 1 rows) but its subplan is corpus-sized:
        # persist so the total and the final filter both read the cache.
        .transform(tracked_persist)
    )
    tot = groups.agg(F.sum("n").alias("tot"))
    return (
        groups.filter(F.col("term").isNotNull())
        .crossJoin(F.broadcast(tot))
        .filter(F.col("n") * _MG_K > F.col("tot"))
        .select(
            "term",
            F.col("n").cast("bigint").alias("n"),
            (F.col("n") / F.col("tot").cast("double")).alias("share"),
        )
    )


@register(
    "ext_survival_km",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events
    ),
    horizon AS (SELECT MAX(us) AS h FROM e),
    clicks AS (
      SELECT user_id, MIN(us) AS t0 FROM e
      WHERE event_type = 'click' GROUP BY 1
    ),
    deaths AS (
      SELECT c.user_id, MIN(e.us) AS td
      FROM clicks c JOIN e
        ON e.user_id = c.user_id AND e.event_type = 'purchase'
           AND e.us >= c.t0
      GROUP BY 1
    ),
    subjects AS (
      SELECT c.user_id,
             COALESCE(d.td, horizon.h) - c.t0 AS dur_us,
             CASE WHEN d.td IS NULL THEN 0 ELSE 1 END AS died
      FROM clicks c LEFT JOIN deaths d ON c.user_id = d.user_id, horizon
    ),
    grouped AS (
      -- durations CEIL-bucketed to whole hours BEFORE grouping: the KM
      -- table's cardinality is then bounded by the horizon in hours,
      -- not the subject count — microsecond-exact durs are ~unique per
      -- user and would funnel the whole population through the global
      -- cumulative windows below
      SELECT ((dur_us + 3599999999) // 3600000000) * 3600000000 AS dur,
             SUM(died) AS d, COUNT(*) AS x
      FROM subjects GROUP BY 1
    ),
    risk AS (
      SELECT dur, d,
             SUM(x) OVER () - COALESCE(SUM(x) OVER (
               ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS n_risk
      FROM grouped
    ),
    km AS (
      SELECT dur, d, n_risk,
             CASE WHEN d = n_risk THEN NULL
                  ELSE CAST(ln(1 - d / CAST(n_risk AS DOUBLE))
                            AS DECIMAL(20,12)) END AS logterm,
             CASE WHEN d = n_risk THEN 1 ELSE 0 END AS hit_zero
      FROM risk WHERE d > 0
    )
    SELECT dur / 3600000000.0 AS t_hours,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS deaths,
           CASE WHEN SUM(hit_zero) OVER cum > 0 THEN 0.0
                ELSE ROUND(EXP(CAST(SUM(logterm) OVER cum AS DOUBLE)), 9)
           END AS surv
    FROM km
    WINDOW cum AS (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    """,
)
def ext_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for click→purchase conversion time:
    each user enters at their first click and "dies" at their first
    subsequent purchase; users with no purchase are right-censored at the
    data horizon. S(t) = Π over death times ≤ t of (1 − dᵢ/nᵢ), the
    censoring-correct time-to-event estimator (a plain AVG of durations
    is biased by the censored users).

    Scale: subjects reduce to one row per user (two filtered min-aggs
    and a left join on user_id), and durations are CEIL-bucketed to
    whole hours before grouping, so everything downstream — risk sets
    via a cumulative window, the product via a cumulative log-sum —
    runs over at most horizon-in-hours rows, never the subject count
    (microsecond-exact durations are ~unique per user, which would put
    the whole population through the single-task global windows). Determinism: durations are exact integer
    microseconds; d/n is one exact-integer IEEE divide; ln is quantized
    to DECIMAL(20,12) pre-sum so the cumulative sum is order-exact; EXP
    is libm so the curve is ROUND()ed to 9; an S(t)=0 absorbing state is
    handled explicitly (ln(0) never evaluates)."""
    e = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    horizon = e.agg(F.max("us").alias("h"))
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("us").alias("t0"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("us").alias("pus")
    )
    deaths = (
        clicks.join(purchases, "user_id")
        .filter(F.col("pus") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("pus").alias("td"))
    )
    subjects = (
        clicks.join(deaths, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            (F.coalesce("td", "h") - F.col("t0")).alias("dur_us"),
            F.when(F.col("td").isNull(), 0).otherwise(1).alias("died"),
        )
    )
    # CEIL-bucket durations to whole hours BEFORE grouping: distinct
    # death times are then bounded by the horizon in hours, never the
    # subject count — without this the microsecond-exact durs are
    # ~unique per user and the global cumulative windows below would
    # sort the entire population on one task.
    grouped = subjects.select(
        (
            F.expr(f"((dur_us + {_HOUR_US - 1}) div {_HOUR_US})") * _HOUR_US
        ).alias("dur"),
        "died",
    ).groupBy("dur").agg(
        F.sum("died").alias("d"), F.count(F.lit(1)).alias("x")
    )
    # bounded (one row per distinct rounded duration) global windows
    wall = Window.partitionBy(_one("dur"))
    wprev = (
        Window.partitionBy(_one("dur"))
        .orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = grouped.select(
        "dur",
        "d",
        (
            F.sum("x").over(wall)
            - F.coalesce(F.sum("x").over(wprev), F.lit(0))
        ).alias("n_risk"),
    )
    km = risk.filter(F.col("d") > 0).select(
        "dur",
        "d",
        "n_risk",
        F.when(F.col("d") == F.col("n_risk"), F.lit(None))
        .otherwise(
            F.log(F.lit(1) - F.col("d") / F.col("n_risk").cast("double"))
            .cast("decimal(20,12)")
        )
        .alias("logterm"),
        F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0).alias("hit_zero"),
    )
    cum = (
        Window.partitionBy(_one("dur"))
        .orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return km.select(
        (F.col("dur") / F.lit(3_600_000_000.0)).alias("t_hours"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").cast("bigint").alias("deaths"),
        F.when(F.sum("hit_zero").over(cum) > 0, F.lit(0.0))
        .otherwise(F.round(F.exp(F.sum("logterm").over(cum).cast("double")), 9))
        .alias("surv"),
    )
