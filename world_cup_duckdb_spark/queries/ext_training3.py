"""Training-data preparation extensions, part 3: temperature-based
mixture sampling and deterministic epoch shuffling — the two transforms
between "weighted corpus" and "the byte stream the trainer actually
reads" in an LLM data pipeline.

Reference scope: beyond the reference surface (its corpus is relational);
these extend the engine the way ext_training/ext_training2 do, over the
same `documents` fixture. Both are pure DataFrame compositions (no Python
in the row path) and carry full DuckDB value-hash oracles.

Bit-portability: every cross-engine double here is built only from
correctly-rounded IEEE-754 ops (integer->double cast, one division, one
sqrt, one multiply, floor) — no cross-row summation whose accumulation
order could differ between engines — so the hashed outputs are
bit-identical by construction, not by tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from world_cup_duckdb_spark.operators.training import (
    COIN_SPACE as _COIN_SPACE,
)
from world_cup_duckdb_spark.operators.training import (
    epoch_shuffle,
    temperature_mix,
)
from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import table

#: Upsampling cap: no source repeats more than this many times however
#: small its share — the standard guard against a tiny source being
#: recited hundreds of times (overfitting risk), and the bound that
#: keeps output size ≤ cap × input at any corpus composition. LEAST()
#: is exact, so the cap stays bit-portable. (Zero-weight groups are
#: handled separately: the operator pins their multiplier to 1.0 —
#: double/0 is IEEE Infinity in both engines, which the cap would
#: otherwise silently absorb into max_upsample.)
_MAX_UPSAMPLE = 8.0

#: Epochs materialized by the shuffle plan (trainers consume 1..N).
_N_EPOCHS = 2

#: Output shards per epoch: one writer task / output file per shard.
_N_SHARDS = 8


@register(
    "ext_temperature_mix",
    oracle=f"""
    WITH stats AS (
      SELECT source, SUM(n_chars) AS c FROM documents GROUP BY source
    ),
    mult AS (
      SELECT source,
             CASE WHEN c > 0 THEN
               LEAST({_MAX_UPSAMPLE},
                     sqrt(CAST((SELECT MAX(c) FROM stats) AS DOUBLE)
                          / CAST(c AS DOUBLE)))
             ELSE 1.0 END AS m
      FROM stats
    ),
    planned AS (
      SELECT d.source, d.doc_id,
             CAST(FLOOR(mult.m) AS BIGINT)
             + CASE WHEN CAST(('0x' || substring(
                        md5('tmix-' || CAST(d.doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT)
                     < CAST(FLOOR((mult.m - FLOOR(mult.m)) * {_COIN_SPACE})
                            AS BIGINT)
                    THEN 1 ELSE 0 END AS n_copies
      FROM documents d JOIN mult USING (source)
    )
    SELECT source, doc_id,
           CAST(unnest(range(1, n_copies + 1)) AS INT) AS copy_nr
    FROM planned WHERE n_copies > 0
    """,
)
def ext_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture sampling (alpha = 0.5): upsample every
    source toward the largest one by m_s = min(8.0, (c_max / c_s)^0.5)
    — capped so no source repeats more than 8x (_MAX_UPSAMPLE) however
    small its share — where c_s
    is the source's total CHARACTER budget (LLM mixes are weighed in
    tokens, not document counts — and the doc-count fixture is perfectly
    balanced, which would degenerate the op to the identity) — the
    multinomial temperature-smoothing recipe multilingual/multi-source
    LLM corpora use to keep rare sources represented without letting the
    head dominate. Unlike ext_corpus_mix (fixed hand-set weights), the
    multipliers here are COMPUTED FROM THE CORPUS, so the op needs an
    aggregate -> broadcast -> per-row realization plan, not just a CASE.
    The fractional part of m_s is realized per-document by a
    deterministic md5 coin, so the mix is reproducible across engines,
    runs, and cluster sizes.

    Scale: source stats are O(#sources) rows from one map-side-combined
    aggregate; the multiplier relation broadcasts; the corpus side is
    then map-only (hash coin + explode) with no second shuffle.
    Membership never depends on partitioning (unlike df.sample).
    Bit-portability: m_s = sqrt(cast / cast) is two correctly-rounded
    IEEE ops on exact integers — no cross-row float summation — so the
    coin threshold floor(frac * 2^32) is bit-identical in both engines.
    """
    d = table(spark, sf_dir, "documents")
    mixed = temperature_mix(
        d,
        weight_col="n_chars",
        group_col="source",
        id_col="doc_id",
        alpha=0.5,
        max_upsample=_MAX_UPSAMPLE,
        salt="tmix-",
    )
    return mixed.select("source", "doc_id", "copy_nr")


@register(
    "ext_epoch_shuffle",
    oracle=f"""
    WITH h AS (
      SELECT d.doc_id, e.epoch,
             md5(CAST(e.epoch AS VARCHAR) || '-'
                 || CAST(length(CAST(d.doc_id AS VARCHAR)) AS VARCHAR)
                 || ':' || CAST(d.doc_id AS VARCHAR)) AS hx
      FROM documents d,
           (SELECT unnest(range(0, {_N_EPOCHS})) AS epoch) e
    )
    SELECT CAST(epoch AS INT) AS epoch,
           CAST(CAST(('0x' || substring(hx, 1, 8)) AS BIGINT)
                % {_N_SHARDS} AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY epoch,
                          CAST(('0x' || substring(hx, 1, 8)) AS BIGINT)
                          % {_N_SHARDS}
             ORDER BY substring(hx, 9, 16), doc_id
           ) AS BIGINT) AS pos,
           doc_id
    FROM h
    """,
)
def ext_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: give every document, for each of
    2 training epochs (_N_EPOCHS), a (shard, position) under an
    epoch-salted md5 permutation — shard from the hash prefix, position
    by ranking the hash suffix within the shard. Trainers read shards
    in any order and stream each shard sequentially; every epoch sees
    the corpus in a different but fully reproducible order, with no
    RNG state to checkpoint.

    Scale: this is the pattern that replaces a 100 TB GLOBAL sort
    (TeraSort-style range partitioning) with 8 (_N_SHARDS) independent
    shard-local sorts: one hash-partition shuffle on (epoch, shard),
    then a local order-by inside each shard — no sampling pass, no
    range boundaries, no skew (md5 prefixes are uniform). Each shard is
    one writer task / one output file; raising _N_SHARDS to O(cluster
    cores) keeps every local sort in memory at any corpus size. The
    tie-break on doc_id makes ranks total even under md5 collisions.
    """
    d = table(spark, sf_dir, "documents")
    return epoch_shuffle(
        d, id_col="doc_id", n_epochs=_N_EPOCHS, n_shards=_N_SHARDS
    )


from pyspark.sql import functions as F  # noqa: E402

#: DSIR feature space: hashed-token buckets. 64 keeps the per-bucket
#: ratio table literal-broadcastable and the census oracle small; a
#: production run uses 10k–100k buckets — nothing below changes except
#: this constant (the collect is O(B), never corpus).
_DSIR_BUCKETS = 64
#: Fixed-point scale for the integer likelihood ratio.
_DSIR_SCALE = 1_000_000
#: The "target distribution" sources (the quality corpus DSIR reweights
#: the raw crawl toward). Deterministic subset of the fixture's sources.
_DSIR_TARGET = ("src0", "src1", "src2", "src3", "src4")


@register(
    "ext_importance_weights",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, source,
             CAST(('0x' || substring(md5(term), 1, 8))::BIGINT
                  % {_DSIR_BUCKETS} AS INT) AS bucket
      FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
            FROM documents)
    ),
    cr AS (SELECT bucket, COUNT(*) AS c FROM b GROUP BY 1),
    ct AS (SELECT bucket, COUNT(*) AS c FROM b
           WHERE source IN {str(tuple(_DSIR_TARGET))} GROUP BY 1),
    lr AS (
      SELECT cr.bucket,
             ((COALESCE(ct.c, 0) + 1) * {_DSIR_SCALE}) // (cr.c + 1) AS lr
      FROM cr LEFT JOIN ct USING (bucket)
    )
    SELECT doc_id, CAST(SUM(lr.lr) AS BIGINT) AS importance
    FROM b JOIN lr USING (bucket)
    GROUP BY doc_id
    ORDER BY importance DESC, doc_id
    LIMIT 50
    """,
)
def ext_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection with importance resampling (Xie et al.
    2023, arXiv:2302.03169): score every raw-corpus document by how much
    its hashed-token distribution looks like a TARGET corpus (here the
    src0–src4 slice standing in for the quality corpus), so the
    selection can keep the raw documents most target-like. Two passes,
    both bounded: (1) per-bucket token counts for raw and target — two
    hash aggregates whose map-side partials reduce to ≤ 64 rows each;
    (2) a map-only rescoring of every document against the 64-entry
    ratio table, collected to the driver (bounded by the bucket count,
    NEVER corpus size) and re-emitted as a literal array, so the scoring
    pass is pure in-row expression work — transform(tokens → ratio) +
    an int64 fold — with ZERO doc-grain exchanges before the final
    top-50 TakeOrderedAndProject (per-partition heaps, no global sort,
    no corpus-grain window).

    Determinism (the ext_linear_interp lesson applied in advance): DSIR's
    log-likelihood-ratio sum is engine-divergent (libm log + unordered
    float summation), so the ratio is kept in fixed-point INTEGER form —
    lr[b] = ((ct[b]+1)·10⁶) div (cr[b]+1), Laplace-smoothed, with the
    doc-constant normalizer (Σtarget+B)/(Σraw+B) dropped (affine in
    every document's score: rank-preserving, so the SELECTION is
    unchanged) — and each document's importance is an exact int64 sum
    of per-token table lookups: bit-identical in any engine.

    Scale: two corpus scans (DSIR is two-pass by nature), both map-side;
    state is O(buckets). At 100 TB raise _DSIR_BUCKETS and ship the
    ratio table as a broadcast join instead of a literal — same plan
    shape, same arithmetic."""
    d = table(spark, sf_dir, "documents")
    bkt = d.select(
        "doc_id",
        "source",
        F.explode(F.split("text", " ")).alias("term"),
    ).select(
        "doc_id",
        "source",
        (
            F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("bigint")
            % _DSIR_BUCKETS
        )
        .cast("int")
        .alias("bucket"),
    )
    cr = bkt.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    ct = (
        bkt.filter(F.col("source").isin(*_DSIR_TARGET))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    lr_rows = (
        cr.join(ct, "bucket", "left")
        .select(
            "bucket",
            F.expr(
                f"((coalesce(tc, 0) + 1) * {_DSIR_SCALE}) div (c + 1)"
            ).alias("lr"),
        )
        .collect()  # bounded: ≤ _DSIR_BUCKETS rows of two ints
    )
    table_lr = {r["bucket"]: r["lr"] for r in lr_rows}
    lr_arr = F.array(
        *[F.lit(int(table_lr.get(i, 0))).cast("bigint")
          for i in range(_DSIR_BUCKETS)]
    )
    score = F.aggregate(
        F.transform(
            F.split("text", " "),
            lambda t: F.element_at(
                lr_arr,
                (
                    (
                        F.conv(F.substring(F.md5(t), 1, 8), 16, 10)
                        .cast("bigint")
                        % _DSIR_BUCKETS
                    ).cast("int")
                    + 1
                ),
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        d.select("doc_id", score.alias("importance"))
        .orderBy(F.desc("importance"), F.asc("doc_id"))
        .limit(50)
    )


@register(
    "ext_domain_reweight",
    oracle="""
    WITH per_domain AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(sum_chars) AS BIGINT) AS t_chars,
             CAST(SUM(sum_tokens) AS BIGINT) AS t_tokens
      FROM per_domain
    ),
    scored AS (
      SELECT p.source, p.n_docs, p.sum_chars, p.sum_tokens,
             CAST(p.sum_chars AS DOUBLE) / CAST(p.sum_tokens AS DOUBLE)
               AS loss_cpt,
             CAST(p.sum_chars AS DOUBLE) / CAST(p.sum_tokens AS DOUBLE)
               - CAST(t.t_chars AS DOUBLE) / CAST(t.t_tokens AS DOUBLE)
               AS excess
      FROM per_domain p CROSS JOIN tot t
    ),
    raw AS (
      SELECT *,
             CASE WHEN excess > CAST(0 AS DOUBLE) THEN excess
                  ELSE CAST(0 AS DOUBLE) END + CAST('0.1' AS DOUBLE)
               AS w_raw
      FROM scored
    ),
    norm AS (
      SELECT CAST(list_reduce(
               list_transform(
                 list_sort(list([source, CAST(w_raw AS VARCHAR)])),
                 p -> CAST(p[2] AS DOUBLE)),
               (x, y) -> x + y) AS DOUBLE) AS w_sum
      FROM raw
    )
    SELECT r.source, r.n_docs, r.sum_chars, r.sum_tokens, r.loss_cpt,
           r.excess, r.w_raw,
           r.w_raw / n.w_sum AS weight,
           CAST(floor(r.w_raw / n.w_sum * CAST(1000000 AS DOUBLE))
                AS BIGINT) AS target_tokens_ppm
    FROM raw r CROSS JOIN norm n
    """,
)
def ext_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excess-loss domain reweighting (DoReMi-flavored, Xie et al. 2023):
    per training domain (``source``), measure a reference loss proxy —
    chars-per-token, an exact-integer compressibility stand-in for a
    reference model's bits-per-token — compare it to the corpus-wide
    baseline, and upweight domains with POSITIVE excess (harder than
    average under the proxy), with a uniform floor of 0.1 so no domain
    starves. Weights normalize to 1 and ship as parts-per-million of a
    token budget — the table a mixture sampler (ext_corpus_mix /
    ext_temperature_mix) consumes directly.

    Scale: one corpus pass folds to |domains| rows of exact int64
    counters (map-side partials); everything after runs on the bounded
    domain relation. The weight normalization — the only cross-row
    float sum — folds the ≤|domains| raw weights in SOURCE-ASCENDING
    order on both engines (sorted collect + seeded fold; DuckDB's
    unseeded list_reduce equals the 0.0-seeded fold because 0.0+x==x),
    so the divide-by-total is bit-identical. The w_raw doubles round-trip
    through VARCHAR in the oracle's sort step losslessly (shortest-repr
    parse is exact).

    Determinism: integer counters until exactly four float ops per
    domain (two divides, one subtract, one add), then one fixed-order
    fold and one divide."""
    from world_cup_duckdb_spark.queries import tracked_persist

    d = table(spark, sf_dir, "documents")
    # Persist the bounded per-domain counters: FOUR consumers (the
    # global total, the scored join, the normalizer fold, the final
    # projection) would otherwise each re-run the corpus aggregate.
    per_domain = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("sum_tokens"),
    ).transform(tracked_persist)
    tot = per_domain.agg(
        F.sum("sum_chars").cast("bigint").alias("t_chars"),
        F.sum("sum_tokens").cast("bigint").alias("t_tokens"),
    )
    loss = F.col("sum_chars").cast("double") / F.col("sum_tokens").cast("double")
    base = F.col("t_chars").cast("double") / F.col("t_tokens").cast("double")
    scored = per_domain.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "sum_chars",
        "sum_tokens",
        loss.alias("loss_cpt"),
        (loss - base).alias("excess"),
    )
    raw = scored.withColumn(
        "w_raw",
        F.when(F.col("excess") > 0.0, F.col("excess")).otherwise(
            F.lit(0.0).cast("double")
        )
        + F.lit(0.1).cast("double"),
    )
    # Fixed-order total: fold the bounded per-domain weights in
    # source-ascending order (sort_array on (source, w) structs), so the
    # float sum has ONE accumulation order in both engines.
    norm = raw.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("source", "w_raw"))),
            F.lit(0.0).cast("double"),
            lambda acc, s: acc + s["w_raw"],
        ).alias("w_sum")
    )
    return raw.crossJoin(F.broadcast(norm)).select(
        "source",
        "n_docs",
        "sum_chars",
        "sum_tokens",
        "loss_cpt",
        "excess",
        "w_raw",
        (F.col("w_raw") / F.col("w_sum")).alias("weight"),
        F.floor(F.col("w_raw") / F.col("w_sum") * F.lit(1000000.0))
        .cast("bigint")
        .alias("target_tokens_ppm"),
    )
