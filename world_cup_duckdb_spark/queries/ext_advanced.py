"""Advanced analytics extensions rounding out the engine's query surface:
batch sessionization, exact quantiles, distribution windows, deterministic
sampling, fuzzy string matching, and PII masking.

These are the remaining shapes a 100 TB training-data / product-analytics
pipeline leans on beyond SURVEY.md §2's inventory (reference scope:
`README.md:1-3` — the schema exists to be queried; these are standard
DuckDB-SQL-expressible analytics over it, so each has a full value-hash
oracle).

Scale notes per query are on the functions; the common theme is "one
shuffle, then stay inside the partition" (sessionize, distribution windows)
or "no shuffle at all" (hash sampling — a pure scan filter that pushes to
parquet; fuzzy join — broadcast of a tiny dimension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from world_cup_duckdb_spark.functions.strings import dec
from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import table


@register(
    "ext_sessionize_batch",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                    OR CAST(ts AS TIMESTAMP)
                       > LAG(CAST(ts AS TIMESTAMP)) OVER w
                         + INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_nr
      FROM ordered
    )
    SELECT user_id, CAST(session_nr AS BIGINT) AS session_nr,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, session_nr
    """,
)
def ext_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: split each user's event stream into sessions
    at >30-minute gaps (lag → new-session flag → running sum = session id),
    then aggregate per session. The batch twin of
    ext_stream_session's `session_window`.

    Scale: one shuffle on user_id; both window passes and the final
    aggregate reuse that partitioning (Catalyst collapses them into a
    single sort+window stage), so cost is a single exchange of the events
    table regardless of session count. Tie-break on event_id makes session
    numbering deterministic under equal timestamps.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    is_new = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        e.select("user_id", "event_id", "ts")
        .withColumn("is_new", is_new)
        .withColumn("session_nr", F.sum("is_new").over(run).cast("bigint"))
        .groupBy("user_id", "session_nr")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "ext_quantiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 4)
             AS p25,
           ROUND(PERCENTILE_CONT(0.50) WITHIN GROUP (ORDER BY l_extendedprice), 4)
             AS p50,
           ROUND(PERCENTILE_CONT(0.95) WITHIN GROUP (ORDER BY l_extendedprice), 4)
             AS p95
    FROM lineitem GROUP BY l_returnflag
    """,
)
def ext_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (p25/p50/p95) of extended price per
    return flag — ANSI `PERCENTILE_CONT ... WITHIN GROUP`, identical
    linear-interpolation semantics in Spark and DuckDB (rounded to 4
    decimals to absorb last-ulp interpolation differences).

    Scale: exact percentiles need the group's values together — fine here
    because the group count is tiny (3 flags). At 100 TB with
    high-cardinality groups the right tool is `percentile_approx`
    (t-digest-style mergeable sketch, map-side partials); this query pins
    the exact semantics the approximate path is graded against.
    """
    li = table(spark, sf_dir, "lineitem")
    pc = (
        "ROUND(PERCENTILE_CONT({p}) WITHIN GROUP (ORDER BY l_extendedprice), 4)"
    )
    return li.groupBy("l_returnflag").agg(
        F.expr(pc.format(p="0.25")).alias("p25"),
        F.expr(pc.format(p="0.50")).alias("p50"),
        F.expr(pc.format(p="0.95")).alias("p95"),
    )


@register(
    "ext_window_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def ext_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — quartile bucket, percentile rank,
    and cumulative distribution of customers by account balance within
    their market segment. Completes the window-function surface beyond
    op45/op46 (rank/lag).

    Scale: one shuffle on c_mktsegment; all three functions share a single
    sort and window pass. The c_custkey tie-break pins NTILE's row order
    (PERCENT_RANK/CUME_DIST are rank-based and tie-stable anyway).
    """
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "ext_deterministic_sample",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
    FROM orders
    WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '10'
    GROUP BY o_orderpriority
    """,
)
def ext_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~6.25% sample of orders (md5(key) prefix < '10' keeps
    16/256 of the hash space) aggregated by priority — the
    reproducible-sampling primitive a training pipeline uses for eval
    holdouts and data audits: same rows selected on every engine, every
    run, every cluster size (unlike `df.sample`, which is seed- and
    partitioning-dependent).

    Scale: the predicate is a pure per-row function of the key — no
    shuffle, no coordination; Catalyst evaluates it inside the scan stage.
    Sampling rate tunes by hex-prefix threshold (two hex chars → 1/256
    granularity; use more chars for finer rates).
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) < "10")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(dec("o_totalprice")).cast("double").alias("sum_price"),
        )
    )


@register(
    "ext_upsert_latest",
    oracle="""
    SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value
    FROM (
      SELECT user_id, event_type, event_id, ts, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ) v WHERE rn = 1
    """,
)
def ext_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest upsert semantics: one surviving row per
    (user_id, event_type), the one with the newest timestamp — how a
    training pipeline collapses multiple versions of a record (latest
    document revision, current user state) without a transactional table
    format. Deterministic via the event_id tie-break.

    Scale: one shuffle on the key, one window pass, filter rn=1 — the
    same cost shape as a groupBy max-struct. For continuous upserts the
    streaming twin is dedup_within_watermark with reversed ordering.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.select("user_id", "event_type", "event_id", "ts", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "ext_stratified_sample",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_sampled
    FROM events
    WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 2)
          < CASE event_type WHEN 'purchase' THEN 'ff'
                            WHEN 'click' THEN '1a'
                            ELSE '0d' END
    GROUP BY event_type
    """,
)
def ext_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: different keep-rates per class
    (~100% of rare purchases, ~10% of clicks, ~5% of the rest) — the
    class-rebalancing primitive for training-set construction, with the
    same reproducibility guarantee as ext_deterministic_sample (md5 of
    the key, so membership is stable across engines, runs, and cluster
    sizes).

    Scale: per-row hash + branch-free CASE threshold inside the scan
    stage; the only shuffle is the final tiny count-by-class.
    """
    e = table(spark, sf_dir, "events")
    threshold = (
        F.when(F.col("event_type") == "purchase", "ff")
        .when(F.col("event_type") == "click", "1a")
        .otherwise("0d")
    )
    return (
        e.filter(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 2) < threshold
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


@register(
    "ext_fuzzy_join",
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           CAST(levenshtein(a.n_name, b.n_name) AS INT) AS edit_dist
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    WHERE levenshtein(a.n_name, b.n_name) <= 5
    """,
)
def ext_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-match of nation names within edit distance 5 —
    the entity-resolution primitive (near-identical names across sources).
    Both engines implement classic Levenshtein, so results hash-match.

    Scale: all-pairs edit distance is only sane on small dimensions
    (broadcast nested loop over 25×25 here). At corpus scale the engine's
    scalable variants apply first — ext_dedup_minhash / ext_dedup_ngram
    block candidate pairs down to near-duplicates, and Levenshtein runs
    only inside those buckets.
    """
    n = table(spark, sf_dir, "nation")
    a = n.select(F.col("n_nationkey").alias("key_a"), F.col("n_name").alias("name_a"))
    b = n.select(F.col("n_nationkey").alias("key_b"), F.col("n_name").alias("name_b"))
    return (
        a.join(F.broadcast(b), F.col("key_a") < F.col("key_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 5)
        .select("name_a", "name_b", F.col("edit_dist").cast("int"))
    )


@register(
    "ext_pii_mask",
    oracle="""
    SELECT doc_id,
           CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                AS BIGINT) AS n_digits,
           md5(regexp_replace(text, '[0-9]+', '<NUM>', 'g')) AS masked_md5
    FROM documents
    """,
)
def ext_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric-token masking over the documents corpus — the shape of a
    PII-scrub pass (mask digit runs, report how much was redacted).
    Returns the masked text's md5 (not the text) so the oracle hash
    compares full content without shipping megabytes through the harness.

    Scale: embarrassingly parallel scan — regexp + md5 run inside
    whole-stage codegen, no shuffle, no Python. A real scrub swaps the
    pattern set (emails, phones, SSNs) into the same plan shape.
    """
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        (
            F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))
        ).cast("bigint").alias("n_digits"),
        F.md5(F.regexp_replace("text", "[0-9]+", "<NUM>")).alias("masked_md5"),
    )


@register(
    "ext_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, CAST(rn AS INT) AS rn
    FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (
               PARTITION BY p_brand
               ORDER BY p_retailprice DESC, p_partkey
             ) AS rn
      FROM part
    ) r WHERE rn <= 3
    """,
)
def ext_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts per brand by retail price — per-group top-k, the
    group-scoped complement of op47's global TakeOrderedAndProject
    (deterministic via the p_partkey tie-break).

    Scale: one shuffle on the group key, then a rank window + filter;
    Spark pushes the rn<=3 predicate into the window as a
    WindowGroupLimit, so each partition keeps only k rows per group
    during the sort — no full per-group materialization.
    """
    p = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return (
        p.select("p_brand", "p_partkey", "p_retailprice")
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "ext_mode_per_group",
    oracle="""
    WITH c AS (
      SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
      FROM customer GROUP BY 1, 2
    )
    SELECT c_mktsegment, c_nationkey AS mode_nationkey,
           CAST(n AS BIGINT) AS n_customers
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY c_mktsegment ORDER BY n DESC, c_nationkey
      ) AS rn FROM c
    ) r WHERE rn = 1
    """,
)
def ext_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group: the most common nationality within
    each market segment (count-then-rank, ties to the smallest key) —
    the categorical summary aggregate SQL lacks natively.

    Scale: the count aggregate partial-combines map-side, so its
    exchange carries combined partials, and the window's second exchange
    carries only |segments × nations| aggregate-reduced rows. (Forcing a
    shared single exchange by pre-partitioning on segment alone would
    shuffle the RAW fact rows before any combining — strictly worse.)
    """
    c = table(spark, sf_dir, "customer")
    counts = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("n"), F.asc("c_nationkey")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("c_nationkey").alias("mode_nationkey"),
            F.col("n").alias("n_customers"),
        )
    )


@register(
    "ext_outlier_mad",
    oracle="""
    WITH med AS (
      SELECT l_returnflag,
             ROUND(PERCENTILE_CONT(0.5)
                   WITHIN GROUP (ORDER BY l_extendedprice), 4) AS med
      FROM lineitem GROUP BY l_returnflag
    ),
    dev AS (
      SELECT l.l_returnflag, l.l_orderkey, l.l_linenumber,
             l.l_extendedprice, m.med,
             ABS(l.l_extendedprice - m.med) AS adev
      FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
    ),
    mad AS (
      SELECT l_returnflag,
             ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY adev), 4)
               AS mad
      FROM dev GROUP BY l_returnflag
    )
    SELECT d.l_returnflag, d.l_orderkey, d.l_linenumber, d.l_extendedprice,
           ROUND((d.l_extendedprice - d.med) / (1.4826 * m2.mad), 4)
             AS robust_z
    FROM dev d JOIN mad m2 ON d.l_returnflag = m2.l_returnflag
    ORDER BY ABS(ROUND((d.l_extendedprice - d.med) / (1.4826 * m2.mad), 4))
             DESC, d.l_orderkey, d.l_linenumber
    LIMIT 20
    """,
)
def ext_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier ranking: the 20 line items whose extended price
    deviates most from their return-flag group's MEDIAN, in scaled-MAD
    units (median absolute deviation × 1.4826 ≈ a robust σ) — the
    data-quality screen that, unlike z-scores, is not dragged by the
    outliers it hunts. Medians round to 4 decimals so both engines rank
    identical values; order fully tie-broken by (orderkey, linenumber).

    Scale: two tiny per-group median aggregates (3 groups) broadcast back
    onto the fact scan — the fact table is read twice but never shuffled
    (both joins are broadcast), and the top-20 is TakeOrderedAndProject,
    not a global sort. At high-cardinality grouping swap PERCENTILE_CONT
    for percentile_approx partials, same shape as ext_quantiles documents.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    pc = "ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY {c}), 4)"
    med = li.groupBy("l_returnflag").agg(
        F.expr(pc.format(c="l_extendedprice")).alias("med")
    )
    dev = li.join(F.broadcast(med), "l_returnflag").withColumn(
        "adev", F.abs(F.col("l_extendedprice") - F.col("med"))
    )
    mad = dev.groupBy("l_returnflag").agg(
        F.expr(pc.format(c="adev")).alias("mad")
    )
    scaled = F.lit(1.4826) * F.col("mad")
    return (
        dev.join(F.broadcast(mad), "l_returnflag")
        .select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.round((F.col("l_extendedprice") - F.col("med")) / scaled, 4)
            .alias("robust_z"),
        )
        .orderBy(
            F.abs(F.col("robust_z")).desc(),
            F.asc("l_orderkey"),
            F.asc("l_linenumber"),
        )
        .limit(20)
    )


@register(
    "ext_null_profile",
    oracle="""
    SELECT 'o_orderstatus' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
    FROM orders
    """,
)
def ext_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the data-audit primitive): row count, null
    count, and distinct count per profiled column of `orders`, long-form.

    Scale: ONE scan computes every column's stats in a single aggregate
    (the oracle text scans per column for SQL clarity; Spark's plan
    reads the table once — multiple count-distincts expand inside one
    aggregation), then a map-side stack to long form. At 100 TB swap
    count_distinct for approx_count_distinct and keep the plan shape.
    """
    o = table(spark, sf_dir, "orders")
    cols = ["o_orderstatus", "o_orderpriority", "o_custkey"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("int")).cast("bigint").alias(f"nn_{c}")
        )
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    wide = o.agg(*aggs)
    stack = ", ".join(f"'{c}', nn_{c}, nd_{c}" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) AS (col_name, n_nulls, n_distinct)",
        "n_rows",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct")


@register(
    "ext_udtf_ngrams",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    pos AS (
      SELECT doc_id, l, unnest(range(1, len(l) - 1)) AS i
      FROM t WHERE len(l) >= 3
    )
    SELECT doc_id,
           CAST(i AS INT) AS pos,
           array_to_string(l[i:i+2], ' ') AS ngram
    FROM pos
    """,
)
def ext_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 3.5+/4.x user-defined TABLE function) in a
    LATERAL join: one input document row expands to (pos, trigram) rows.

    This exists to exercise the UDTF API surface — arrow-serialized,
    registered in the SQL catalog, lateral-joined per row. The engine's
    POLICY remains: expansion like this belongs in JVM-side builtins
    (exactly what ext_repetition's transform+explode trigrams do — same
    output, whole-stage codegen, no Python workers); reach for a UDTF
    only when per-row expansion logic genuinely cannot be expressed with
    higher-order array functions (e.g. a real BPE tokenizer). The 1-based
    `pos` makes the output order-insensitive and join-ready (winnowing,
    span labeling).

    Scale: map-side only — no shuffle; Python workers stream arrow
    batches, so cost is linear with a constant-factor serialization tax
    over the builtin form."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, ngram string", useArrow=True)
    class NgramSpans:
        def eval(self, text: str):  # noqa: ANN001 - UDTF protocol
            if text is None:  # NULL text yields no spans (string_split
                return  # of NULL propagates NULL in the oracle too)
            toks = text.split(" ")
            for i in range(len(toks) - 2):
                yield i + 1, " ".join(toks[i : i + 3])

    spark.udtf.register("ngram_spans", NgramSpans)
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    return spark.sql(
        """
        SELECT d.doc_id, g.pos, g.ngram
        FROM documents_v d, LATERAL ngram_spans(d.text) g
        """
    )


@register(
    "ext_winsorize",
    oracle="""
    WITH pct AS (
      SELECT event_type,
             PERCENTILE_CONT(0.05) WITHIN GROUP (ORDER BY value) AS p05,
             PERCENTILE_CONT(0.95) WITHIN GROUP (ORDER BY value) AS p95
      FROM events GROUP BY event_type
    ),
    clipped AS (
      SELECT e.event_type, e.value, pct.p05, pct.p95,
             LEAST(GREATEST(e.value, pct.p05), pct.p95) AS wv
      FROM events e JOIN pct USING (event_type)
    )
    SELECT event_type,
           ROUND(p05, 6) AS p05,
           ROUND(p95, 6) AS p95,
           CAST(SUM(CASE WHEN value < p05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_low,
           CAST(SUM(CASE WHEN value > p95 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_high,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
             AS avg_raw,
           CAST(SUM(CAST(wv AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
             AS avg_winsorized
    FROM clipped
    GROUP BY event_type, p05, p95
    """,
)
def ext_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clipped-tail) robust mean per event type: exact
    5th/95th percentiles, values clipped into [p05, p95], then mean
    before/after — the outlier-robust aggregation a metrics/feature
    pipeline applies before training on heavy-tailed values
    (complements ext_outlier_mad, which flags outliers instead of
    taming them).

    Scale: percentiles need a per-group sort — one shuffle on
    event_type (5 groups here; at billions of rows per group swap
    `percentile` for `approx_percentile`, same shape, bounded memory).
    The tiny percentile frame broadcasts back onto the fact scan, so
    clipping is map-side; the final rollup partial-aggregates. Parity:
    means go through DECIMAL(18,6) sums (order-independent), and both
    engines clip with the identical interpolated-percentile doubles."""
    e = table(spark, sf_dir, "events")
    pct = e.groupBy("event_type").agg(
        F.percentile("value", 0.05).alias("p05"),
        F.percentile("value", 0.95).alias("p95"),
    )
    wv = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    return (
        e.join(F.broadcast(pct), "event_type")
        .groupBy("event_type", "p05", "p95")
        .agg(
            F.sum(F.when(F.col("value") < F.col("p05"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_low"),
            F.sum(F.when(F.col("value") > F.col("p95"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_high"),
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_raw"),
            (F.sum(wv.cast("decimal(18,6)")).cast("double") / F.count(F.lit(1))).alias(
                "avg_winsorized"
            ),
        )
        .select(
            "event_type",
            F.round("p05", 6).alias("p05"),
            F.round("p95", 6).alias("p95"),
            "n_clipped_low",
            "n_clipped_high",
            "avg_raw",
            "avg_winsorized",
        )
    )


@register(
    "ext_standard_scaler",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(value AS DECIMAL(18,6))
                      * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s2
      FROM events GROUP BY event_type
    ),
    m AS (
      -- GREATEST(.., 0): for a (near-)constant group the cancellation
      -- s2/n - mean^2 can land a hair below zero; Spark sqrt would give
      -- NaN while DuckDB sqrt ERRORS — clamp on both engines
      SELECT event_type, n,
             s1 / n AS mean,
             sqrt(GREATEST(s2 / n - (s1 / n) * (s1 / n), 0.0)) AS std
      FROM stats
    )
    SELECT e.event_id, e.event_type,
           ROUND(m.mean, 8) AS type_mean,
           ROUND(m.std, 8) AS type_std,
           ROUND((CAST(e.value AS DECIMAL(18,6)) - m.mean) / m.std, 8) AS z
    FROM events e JOIN m USING (event_type)
    """,
)
def ext_standard_scaler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group standard scaling (z-score feature normalization): one
    aggregation pass computes each event type's mean and population
    std from exact decimal moment sums (SUM x, SUM x² — accumulation-
    order independent), then the tiny stats frame broadcasts back over
    the facts for a map-side transform — the classic two-pass scaler a
    feature pipeline runs before training, with the same broadcast-back
    shape as ext_winsorize.

    Determinism: both engines feed the identical decimal-quantized
    values into the identical double formula; sqrt is IEEE-exact;
    outputs ROUND-pinned."""
    e = table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,6)")
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(v).cast("double").alias("s1"),
        F.sum(v * v).cast("double").alias("s2"),
    )
    m = stats.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        # GREATEST(.., 0): cancellation on a (near-)constant group can
        # push the population variance a few ulps below zero; unclamped,
        # Spark returns NaN where the DuckDB oracle ERRORS on sqrt(<0)
        F.sqrt(
            F.greatest(
                F.col("s2") / F.col("n")
                - (F.col("s1") / F.col("n")) * (F.col("s1") / F.col("n")),
                F.lit(0.0),
            )
        ).alias("std"),
    )
    return e.join(F.broadcast(m), "event_type").select(
        "event_id",
        "event_type",
        F.round("mean", 8).alias("type_mean"),
        F.round("std", 8).alias("type_std"),
        F.round(
            (F.col("value").cast("decimal(18,6)") - F.col("mean")) / F.col("std"),
            8,
        ).alias("z"),
    )


@register(
    "ext_record_linkage",
    oracle="""
    WITH clean AS (
      SELECT c_custkey AS k, c_nationkey AS nat,
             substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8) AS name
      FROM customer
    ),
    dirty AS (
      SELECT k, nat,
             CASE
               WHEN k % 3 = 0 THEN
                 substr(name, 1, CAST(k % 8 AS INT))
                 || 'z' || substr(name, CAST(k % 8 AS INT) + 2)
               WHEN k % 3 = 1 THEN
                 substr(
                   substr(name, 1, CAST(k % 8 AS INT))
                   || 'z' || substr(name, CAST(k % 8 AS INT) + 2),
                   1, CAST((k + 3) % 8 AS INT))
                 || 'z'
                 || substr(
                      substr(name, 1, CAST(k % 8 AS INT))
                      || 'z' || substr(name, CAST(k % 8 AS INT) + 2),
                      CAST((k + 3) % 8 AS INT) + 2)
               ELSE name
             END AS name
      FROM clean
    ),
    scored AS (
      SELECT c.k AS clean_k, d.k AS dirty_k,
             levenshtein(c.name, d.name) AS dist
      FROM clean c JOIN dirty d ON c.nat = d.nat
    ),
    matched AS (SELECT * FROM scored WHERE dist <= 2)
    SELECT CAST((SELECT COUNT(*) FROM clean) AS BIGINT) AS n_entities,
           CAST((SELECT COUNT(*) FROM scored) AS BIGINT) AS n_candidate_pairs,
           CAST((SELECT COUNT(*) FROM matched) AS BIGINT) AS n_matched,
           CAST((SELECT COUNT(*) FROM matched WHERE clean_k = dirty_k)
                AS BIGINT) AS n_true,
           CAST((SELECT COUNT(*) FROM matched WHERE clean_k = dirty_k)
                AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM matched) AS DOUBLE) AS precision_,
           CAST((SELECT COUNT(*) FROM matched WHERE clean_k = dirty_k)
                AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM clean) AS DOUBLE) AS recall_
    """,
)
def ext_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution with blocking — the warehouse workload that
    reconciles a dirty feed against a master table: each customer gets
    an md5-derived entity name and a deterministic TYPO VARIANT (one
    substituted char for k%3==0, two for k%3==1, exact copy otherwise);
    candidate pairs are generated ONLY within nation blocks (never
    all-pairs), scored with Levenshtein distance, and matched at
    distance <= 2. The result row grades the linkage itself: candidate
    mass, matches, precision (chance hex collisions within a block are
    counted honestly), and recall (every variant is within 2 edits of
    its source, so recall is 1.0 by construction — the oracle proves
    the pipeline achieves it).

    Scale: blocking bounds the quadratic scoring to per-block pair
    mass — the knob a 100 TB deployment tunes by blocking on more
    selective keys (sorted-neighborhood or LSH blocking slots into the
    same join); Levenshtein is JVM-side codegen (no UDF). Determinism:
    md5 names, integer edit distances (same DP definition in both
    engines), exact counts, two final divides."""
    from world_cup_duckdb_spark.queries import tracked_persist

    c = table(spark, sf_dir, "customer")
    clean = c.select(
        F.col("c_custkey").alias("k"),
        F.col("c_nationkey").alias("nat"),
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 8).alias(
            "name"
        ),
    )
    p1 = (F.col("k") % 8).cast("int")
    one_sub = F.concat(
        F.expr("substr(name, 1, CAST(k % 8 AS INT))"),
        F.lit("z"),
        F.expr("substr(name, CAST(k % 8 AS INT) + 2)"),
    )
    two_sub = F.concat(
        F.expr(
            "substr(substr(name, 1, CAST(k % 8 AS INT)) || 'z' || "
            "substr(name, CAST(k % 8 AS INT) + 2), 1, "
            "CAST((k + 3) % 8 AS INT))"
        ),
        F.lit("z"),
        F.expr(
            "substr(substr(name, 1, CAST(k % 8 AS INT)) || 'z' || "
            "substr(name, CAST(k % 8 AS INT) + 2), "
            "CAST((k + 3) % 8 AS INT) + 2)"
        ),
    )
    dirty = clean.select(
        "k",
        "nat",
        F.when(F.col("k") % 3 == 0, one_sub)
        .when(F.col("k") % 3 == 1, two_sub)
        .otherwise(F.col("name"))
        .alias("name"),
    )
    scored = (
        clean.withColumnRenamed("k", "clean_k")
        .withColumnRenamed("name", "clean_name")
        .join(
            dirty.withColumnRenamed("k", "dirty_k").withColumnRenamed(
                "name", "dirty_name"
            ),
            "nat",
        )
        .select(
            "clean_k",
            "dirty_k",
            F.levenshtein("clean_name", "dirty_name").alias("dist"),
        )
    ).transform(tracked_persist)
    matched = scored.filter(F.col("dist") <= 2)
    n_entities = clean.count()
    stats = matched.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matched"),
        F.count_if(F.col("clean_k") == F.col("dirty_k"))
        .cast("bigint")
        .alias("n_true"),
    )
    pairs = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidate_pairs")
    )
    return stats.crossJoin(F.broadcast(pairs)).select(
        F.lit(n_entities).cast("bigint").alias("n_entities"),
        "n_candidate_pairs",
        "n_matched",
        "n_true",
        (F.col("n_true").cast("double") / F.col("n_matched").cast("double"))
        .alias("precision_"),
        (F.col("n_true").cast("double") / F.lit(n_entities).cast("double"))
        .alias("recall_"),
    )
