"""Distributed BPE tokenizer training (merge discovery) over `documents`.

Extension surface (not reference-derived): the missing piece of the
tokenizer story between ext_vocab_topk (vocabulary census) and
ext_pack_sequences (training batch prep) — learn the first N byte-pair
merge rules from the corpus, the Sennrich et al. 2016 subword algorithm
re-expressed relationally.

Scale design: corpus-sized work happens exactly once (the vocabulary
build — one explode + hash agg with map-side partial counts). Every merge
iteration then runs over the VOCABULARY relation (distinct words × freq),
which is orders of magnitude smaller than a 100 TB corpus and is
persisted in memory. Per iteration: one pair-count aggregation (shuffle
volume = distinct adjacent pairs, not corpus positions) reduced to a
single argmax row — the 1-row driver collect is the algorithm's inherent
synchronization point (the merge table IS the model being learned and is
driver-side state in every BPE trainer), then a map-only string replace
applies the rule. The per-symbol ``|s|`` wrapping makes one non-regex
replace() pass equal greedy left-to-right merge application with correct
overlap semantics in BOTH engines (operators/text.py:bpe_initial_repr).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from world_cup_duckdb_spark.operators.text import (
    bpe_apply_merge,
    bpe_initial_repr,
    bpe_pair_counts,
)
from world_cup_duckdb_spark.queries import register, tracked_persist
from world_cup_duckdb_spark.sources.catalog import load_tables

N_MERGES = 4

_MERGE_SCHEMA = T.StructType(
    [
        T.StructField("merge_rank", T.IntegerType(), False),
        T.StructField("lhs", T.StringType(), False),
        T.StructField("rhs", T.StringType(), False),
        T.StructField("merged", T.StringType(), False),
        T.StructField("pair_freq", T.LongType(), False),
    ]
)


def _bpe_ctes(n: int, per_source: bool = False) -> str:
    """Unrolled n-iteration DuckDB CTE chain: same vocab, same pair
    counts, same (freq DESC, lhs, rhs) argmax tie-break, same
    wrapped-string replace per iteration. With ``per_source`` the
    vocabulary is keyed (source, word) — pair counts stay GLOBAL (per-
    source frequencies sum to the global ones), so the learned rules are
    identical; the source key only survives for downstream stats."""
    src = "source, " if per_source else ""
    parts = [
        f"""
    WITH vocab AS (
      SELECT {src}token AS word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT {src}unnest(string_split(text, ' ')) AS token FROM documents)
      WHERE token <> '' AND token NOT LIKE '%|%'
      GROUP BY {"1, 2" if per_source else "1"}
    ),
    w0 AS (
      SELECT {src}word, freq,
             '|' || array_to_string(string_split(word, ''), '||') || '|' AS repr
      FROM vocab
    )"""
    ]
    for k in range(1, n + 1):
        parts.append(
            f""",
    s{k} AS (
      SELECT freq,
             string_split(substr(repr, 2, length(repr) - 2), '||') AS l
      FROM w{k - 1}
    ),
    t{k} AS (
      SELECT pr.a AS a, pr.b AS b, CAST(SUM(freq) AS BIGINT) AS pf
      FROM (
        SELECT freq,
               unnest(list_transform(range(1, len(l)),
                                     i -> {{'a': l[i], 'b': l[i + 1]}})) AS pr
        FROM s{k} WHERE len(l) >= 2
      )
      GROUP BY 1, 2
      ORDER BY pf DESC, a, b
      LIMIT 1
    ),
    w{k} AS (
      SELECT {src}word, freq,
             replace(repr,
                     '|' || (SELECT a FROM t{k}) || '||'
                         || (SELECT b FROM t{k}) || '|',
                     '|' || (SELECT a FROM t{k})
                         || (SELECT b FROM t{k}) || '|') AS repr
      FROM w{k - 1}
    )"""
        )
    return "".join(parts)


def _bpe_oracle(n: int) -> str:
    unions = "\n      UNION ALL\n".join(
        f"""      SELECT {k} AS merge_rank, a AS lhs, b AS rhs,
             a || b AS merged, pf AS pair_freq FROM t{k}"""
        for k in range(1, n + 1)
    )
    return (
        _bpe_ctes(n)
        + f"\n    SELECT * FROM (\n{unions}\n    ) ORDER BY merge_rank"
    )


def _bpe_encode_oracle(n: int) -> str:
    return (
        _bpe_ctes(n, per_source=True)
        + f"""
    SELECT source,
           CAST(SUM(freq * length(word)) AS BIGINT) AS symbols_before,
           CAST(SUM(freq * len(string_split(substr(repr, 2, length(repr) - 2),
                                            '||'))) AS BIGINT) AS symbols_after,
           CAST(SUM(freq * len(string_split(substr(repr, 2, length(repr) - 2),
                                            '||'))) AS DOUBLE)
             / SUM(freq * length(word)) AS compression
    FROM w{n}
    GROUP BY source
    """
    )


def _learn_merges(words: DataFrame, n: int) -> tuple[list, DataFrame]:
    """Run n merge-discovery iterations; return the learned rules and the
    vocabulary with all rules applied. Each iteration is one pair-count
    aggregation reduced to a single argmax row, then a map-only replace."""
    merges = []
    for rank in range(1, n + 1):
        top = (
            bpe_pair_counts(words)
            .orderBy(F.desc("pf"), "a", "b")
            .limit(1)
            .first()
        )
        if top is None:
            raise ValueError(
                f"BPE merge {rank}: corpus vocabulary has no adjacent "
                "symbol pairs left to merge"
            )
        merges.append((rank, top.a, top.b, top.a + top.b, top.pf))
        words = bpe_apply_merge(words, top.a, top.b)
    return merges, words


@register("ext_bpe_merges", oracle=_bpe_oracle(N_MERGES))
def ext_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-N BPE merge rules learned from the corpus: per iteration the
    highest-frequency adjacent symbol pair (ties: lexicographic) is merged
    across all word representations. Returns (merge_rank, lhs, rhs,
    merged, pair_freq) — N driver-hashable rows.

    The driver loop is the algorithm, not an anti-pattern: each
    ``.first()`` collects exactly one argmax row (the learned rule), and
    everything between barriers is declarative DataFrame work over the
    persisted vocabulary."""
    d = load_tables(spark, sf_dir)["documents"]
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter((F.col("word") != "") & (~F.col("word").contains("|")))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    words = vocab.select(
        "word", "freq", bpe_initial_repr("word").alias("repr")
    ).transform(tracked_persist)
    merges, _ = _learn_merges(words, N_MERGES)
    return spark.createDataFrame(merges, _MERGE_SCHEMA)


@register("ext_bpe_encode", oracle=_bpe_encode_oracle(N_MERGES))
def ext_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned merge table and report per-source encoding
    stats: total symbol count before (characters) and after the N merges,
    plus the compression ratio — the metric a tokenizer-training pipeline
    tracks per corpus slice.

    The vocabulary is keyed (source, word); pair counts stay global
    (per-source frequencies sum to the global counts), so the learned
    rules are identical to ext_bpe_merges' — encoding is the map-only
    replace chain over the vocab, and the stats are one small hash agg.
    The ratio is a plain double division of two exact BIGINTs, so it is
    bit-identical cross-engine without rounding."""
    from world_cup_duckdb_spark.operators.text import bpe_symbols

    d = load_tables(spark, sf_dir)["documents"]
    vocab = (
        d.select("source", F.explode(F.split("text", " ")).alias("word"))
        .filter((F.col("word") != "") & (~F.col("word").contains("|")))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    words = vocab.select(
        "source", "word", "freq", bpe_initial_repr("word").alias("repr")
    ).transform(tracked_persist)
    _, encoded = _learn_merges(words, N_MERGES)
    before = F.sum(F.col("freq") * F.length("word"))
    after = F.sum(F.col("freq") * F.size(bpe_symbols("repr")))
    return encoded.groupBy("source").agg(
        before.cast("long").alias("symbols_before"),
        after.cast("long").alias("symbols_after"),
        (after.cast("double") / before).alias("compression"),
    )
