"""Fifth analytics batch (EXTENSION): BM25 full-text ranking, PSI
population-drift monitoring, and the Gini concentration coefficient.

Scale shape: BM25's per-term statistics are partial-combinable counts
with the query terms filtered before any join; PSI reduces both periods
to 10 bin counts before a single tiny join; Gini ranks at the
already-aggregated customer grain. Float discipline as in
ext_metrics.py: counts and decimal sums exact, libm (ln) quantized to
decimal pre-sum, final statistics ROUND()ed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from world_cup_duckdb_spark.operators.relational import (
    distributed_row_number,
    distributed_running_sum,
)
from world_cup_duckdb_spark.queries import register, tracked_persist
from world_cup_duckdb_spark.sources.catalog import load_tables

_Q = ("merge", "scan")  # the two-term ranked query
_K1 = 1.2
_B = 0.75


@register(
    "ext_bm25",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
    corpus AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len FROM dl
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM toks WHERE term IN ('{_Q[0]}', '{_Q[1]}')
      GROUP BY 1, 2
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id,
             CAST(
               CAST(ln(1 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
                    AS DECIMAL(20,12))
               * CAST(tf.tf * ({_K1} + 1)
                      / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl
                         / (CAST(corpus.total_len AS DOUBLE) / corpus.n_docs)))
                      AS DECIMAL(20,12))
               AS DECIMAL(26,15)) AS contrib
      FROM tf
      JOIN df USING (term)
      JOIN dl USING (doc_id), corpus
    )
    SELECT s.doc_id,
           ROUND(CAST(SUM(s.contrib) AS DOUBLE), 9) AS score,
           CAST(MAX(dl.dl) AS BIGINT) AS doc_len
    FROM scored s JOIN dl USING (doc_id)
    GROUP BY 1
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
)
def ext_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance ranking for a two-term query over the document
    corpus — the standard full-text scoring function (saturating term
    frequency, length normalization, rare-term idf boost) computed as a
    relational plan; the ranking companion to `ext_phrase_search` and
    the lexical sibling of `ext_ann_bruteforce`.

    Scale: ONE corpus pass — per-document length and the per-query-term
    frequencies fuse into a single hash aggregation (count_if per term),
    persisted so the corpus stats, document-frequency, and scoring
    consumers all read the cached per-doc relation (3 ints/doc) instead
    of re-running the explode (the unfused tf/dl/join-back form executed
    the corpus explode 4×). Determinism: tf/df/dl/N are exact integers;
    idf's ln and the tf-saturation factor are each quantized to
    DECIMAL(20,12), so every contribution — and the tiny per-doc sum — is
    accumulation-order exact; the final score rounds to 9 with a doc_id
    tie-break on the top-20."""
    d = load_tables(spark, sf_dir)["documents"]
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    perdoc = (
        toks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("dl"),
            *[
                F.count_if(F.col("term") == q).alias(f"tf{i}")
                for i, q in enumerate(_Q)
            ],
        )
        .transform(tracked_persist)
    )
    corpus = perdoc.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
    )
    stack_args = ", ".join(f"'{q}', tf{i}" for i, q in enumerate(_Q))
    tf = perdoc.selectExpr(
        "doc_id", "dl", f"stack({len(_Q)}, {stack_args}) AS (term, tf)"
    ).filter(F.col("tf") > 0)
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    ).cast("decimal(20,12)")
    sat = (
        F.col("tf")
        * (_K1 + 1)
        / (
            F.col("tf")
            + _K1 * (1 - _B + _B * F.col("dl") / avgdl)
        )
    ).cast("decimal(20,12)")
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            "dl",
            (idf * sat).cast("decimal(26,15)").alias("contrib"),
        )
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("contrib").cast("double"), 9).alias("score"),
            F.max("dl").cast("bigint").alias("doc_len"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(20)
    )


_N_BINS = 10
_SPLIT_DAY = "2024-01-16"  # reference = days before; current = days from


@register(
    "ext_psi_drift",
    oracle=f"""
    WITH e AS (
      SELECT value,
             CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '{_SPLIT_DAY} 00:00:00'
                  THEN 0 ELSE 1 END AS period
      FROM events
    ),
    ref_range AS (
      SELECT MIN(value) AS mn, MAX(value) AS mx FROM e WHERE period = 0
    ),
    binned AS (
      SELECT period,
             LEAST({_N_BINS} - 1, GREATEST(0, CAST(FLOOR(
               (value - mn) / ((mx - mn) / {_N_BINS})) AS INTEGER))) AS bin
      FROM e, ref_range
    ),
    spine AS (SELECT unnest(generate_series(0, {_N_BINS} - 1)) AS bin),
    c AS (
      SELECT spine.bin,
             COALESCE(SUM(CASE WHEN period = 0 THEN 1 END), 0) AS c_ref,
             COALESCE(SUM(CASE WHEN period = 1 THEN 1 END), 0) AS c_cur
      FROM spine LEFT JOIN binned ON spine.bin = binned.bin
      GROUP BY 1
    ),
    t AS (
      SELECT c_ref, c_cur,
             SUM(c_ref) OVER () AS n_ref, SUM(c_cur) OVER () AS n_cur
      FROM c
    ),
    terms AS (
      SELECT n_ref, n_cur,
             CAST(
               ((c_ref + 1) / CAST(n_ref + {_N_BINS} AS DOUBLE)
                - (c_cur + 1) / CAST(n_cur + {_N_BINS} AS DOUBLE))
               * CAST(ln(((c_ref + 1) / CAST(n_ref + {_N_BINS} AS DOUBLE))
                         / ((c_cur + 1) / CAST(n_cur + {_N_BINS} AS DOUBLE)))
                      AS DECIMAL(20,12))
               AS DECIMAL(26,15)) AS term
      FROM t
    )
    SELECT CAST(MAX(n_ref) AS BIGINT) AS n_ref,
           CAST(MAX(n_cur) AS BIGINT) AS n_cur,
           ROUND(CAST(SUM(term) AS DOUBLE), 9) AS psi
    FROM terms
    """,
)
def ext_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the month: bin the reference period's `value` distribution into 10
    fixed-width bins (edges from the reference min/max; out-of-range
    current values clamp into the edge bins), Laplace-smooth the shares,
    and sum (p−q)·ln(p/q) — the standard model-monitoring drift score
    (<0.1 stable, >0.25 drifted). The distributional sibling of
    `ext_chi_square`, aimed at continuous features.

    Scale: each period collapses to 10 bin counts via one partial-
    combinable aggregate (the reference min/max scalar broadcasts); the
    spine join and PSI sum touch 10 rows. Determinism: bin indexing is
    one subtract/divide/floor chain of exact inputs (identical IEEE ops
    both engines); smoothed shares are exact-integer divides; ln is
    quantized to DECIMAL(20,12), each term to DECIMAL(26,15) pre-sum;
    the final PSI rounds to 9."""
    e = load_tables(spark, sf_dir)["events"].select(
        "value",
        F.when(F.col("ts") < F.lit(f"{_SPLIT_DAY} 00:00:00").cast("timestamp"), 0)
        .otherwise(1)
        .alias("period"),
    )
    rng = e.filter(F.col("period") == 0).agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    binned = e.crossJoin(F.broadcast(rng)).select(
        "period",
        F.least(
            F.lit(_N_BINS - 1),
            F.greatest(
                F.lit(0),
                # try_divide: a constant reference period makes the bin
                # width 0 — DuckDB's /0 gives NULL and GREATEST(0,NULL)
                # clamps to bin 0 (both engines ignore NULL in greatest);
                # an unguarded divide is an ANSI crash instead
                F.floor(
                    F.try_divide(
                        F.col("value") - F.col("mn"),
                        (F.col("mx") - F.col("mn")) / _N_BINS,
                    )
                ).cast("int"),
            ),
        ).alias("bin"),
    )
    spine = spark.range(_N_BINS).select(F.col("id").cast("int").alias("bin"))
    c = (
        spine.join(binned, "bin", "left")
        .groupBy("bin")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("period") == 0, 1)), F.lit(0)
            ).alias("c_ref"),
            F.coalesce(
                F.sum(F.when(F.col("period") == 1, 1)), F.lit(0)
            ).alias("c_cur"),
        )
    )
    w = Window.partitionBy()
    t = c.select(
        "c_ref",
        "c_cur",
        F.sum("c_ref").over(w).alias("n_ref"),
        F.sum("c_cur").over(w).alias("n_cur"),
    )
    p = (F.col("c_ref") + 1) / (F.col("n_ref") + _N_BINS).cast("double")
    q = (F.col("c_cur") + 1) / (F.col("n_cur") + _N_BINS).cast("double")
    terms = t.select(
        "n_ref",
        "n_cur",
        ((p - q) * F.log(p / q).cast("decimal(20,12)"))
        .cast("decimal(26,15)")
        .alias("term"),
    )
    return terms.agg(
        F.max("n_ref").cast("bigint").alias("n_ref"),
        F.max("n_cur").cast("bigint").alias("n_cur"),
        F.round(F.sum("term").cast("double"), 9).alias("psi"),
    )


@register(
    "ext_gini",
    oracle="""
    WITH r AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS rev
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT rev,
             ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS i,
             COUNT(*) OVER () AS n,
             SUM(rev) OVER () AS tot
      FROM r
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
           CAST(CAST(MAX(tot) AS DECIMAL(18,2)) AS DOUBLE) AS total_revenue,
           ROUND(CAST(SUM((2 * i - n - 1) * rev) AS DOUBLE)
                 / (CAST(MAX(n) AS DOUBLE) * CAST(MAX(tot) AS DOUBLE)), 9)
             AS gini
    FROM ranked
    """,
)
def ext_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across customers
    (0 = perfectly equal, →1 = one customer is the whole book), via the
    rank formula G = Σ(2i−n−1)·xᵢ / (n·Σx) over ascending revenues —
    the Lorenz-curve summary that complements `ext_hhi_concentration`
    (HHI weights the head; Gini measures the whole inequality profile).

    Scale: the fact reduces to one revenue per customer first; the rank
    comes from distributed_row_number (operators/relational.py) — range
    shuffle + broadcast partition offsets — NOT a global ROW_NUMBER
    window, and the old global COUNT/SUM OVER () windows fold into the
    final aggregate via Σ(2i−n−1)·xᵢ = 2Σ(i·xᵢ) − (n+1)·Σxᵢ, so NOTHING
    in the plan sorts the customer table in one task (VERDICT r6 item
    4). Tied revenues contribute identical x under any tie order, so
    the (rev, custkey) tie-break affects nothing but determinism.
    Exactness: both Σ(i·rev) and Σrev are exact decimal sums and the
    identity is integer algebra, so the numerator equals the oracle's
    Σ(2i−n−1)·rev bit-for-bit; the single double division rounds to 9."""
    o = load_tables(spark, sf_dir)["orders"]
    r = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("rev")
    )
    ranked = distributed_row_number(
        r.select("o_custkey", "rev"), ["rev", "o_custkey"], out_col="i"
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev").cast("decimal(28,2)").alias("tot"),
        F.sum(F.col("i") * F.col("rev")).cast("decimal(38,2)").alias("s_irev"),
    )
    numer = (
        2 * F.col("s_irev") - (F.col("n") + 1) * F.col("tot")
    ).cast("double")
    return agg.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.col("tot").cast("decimal(18,2)").cast("double")
        .alias("total_revenue"),
        F.round(
            numer / (F.col("n").cast("double") * F.col("tot").cast("double")),
            9,
        ).alias("gini"),
    )


_SAMPLE_K = 100


@register(
    "ext_systematic_sample",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, lang, n_chars,
             SUM(CAST(n_chars AS BIGINT)) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(CAST(n_chars AS BIGINT)) OVER () AS tot
      FROM documents
    )
    SELECT doc_id, lang,
           CAST(n_chars AS BIGINT) AS weight,
           CAST((cum * {_SAMPLE_K}) // tot
                - ((cum - n_chars) * {_SAMPLE_K}) // tot AS INTEGER)
             AS n_hits
    FROM c
    WHERE (cum * {_SAMPLE_K}) // tot > ((cum - n_chars) * {_SAMPLE_K}) // tot
    """,
)
def ext_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional systematic sample of the corpus: lay the
    documents' char-count weights end to end on a line, drop k equally
    spaced selection points, and keep each document the points land in
    (heavy documents can be hit more than once — `n_hits` is its
    multiplicity, E[n_hits] = k·w/Σw exactly). The classic
    deterministic alternative to weighted reservoir sampling for corpus
    mixing: reproducible across engines, runs, AND cluster sizes,
    because selection depends only on the cumulative weights, never on
    a float RNG — every arithmetic step is exact integer division.

    Scale: the cumulative weights come from distributed_running_sum
    (operators/relational.py) — range shuffle on doc_id + partition-
    local cumsum + broadcast per-partition offsets — exactly the
    "partition-prefix + local cumsum" decomposition this docstring used
    to merely promise (`SUM OVER (ORDER BY doc_id)` over the corpus was
    a single-partition sort, the ext_vocab_growth scale-killer class,
    fixed r7); the grand total rides in as a broadcast 1-row aggregate."""
    d = load_tables(spark, sf_dir)["documents"]
    w = F.col("n_chars").cast("bigint")
    c = distributed_running_sum(
        d.select("doc_id", "lang", "n_chars"),
        ["doc_id"],
        w,
        out_col="cum",
        inclusive=True,
    ).crossJoin(F.broadcast(d.agg(F.sum(w).alias("tot"))))
    # tot = 0 (all-zero weights) must yield NULL bounds — the filter
    # then drops every row like the oracle's `// 0 → NULL`; a bare
    # `div` is an ANSI DIVIDE_BY_ZERO crash
    hi = F.expr(f"CASE WHEN tot > 0 THEN (cum * {_SAMPLE_K}) div tot END")
    lo = F.expr(
        f"CASE WHEN tot > 0 THEN ((cum - n_chars) * {_SAMPLE_K}) div tot END"
    )
    return c.filter(hi > lo).select(
        "doc_id",
        "lang",
        w.alias("weight"),
        (hi - lo).cast("int").alias("n_hits"),
    )
