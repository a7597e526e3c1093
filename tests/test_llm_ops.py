"""Vector-form twins of the CSV-projected LLM-pipeline queries.

ext_feature_hash and ext_mm_features emit their dense count vectors as
canonical CSV strings — the only cell shape the driver's pandas-sort
canonicalizer accepts (CORRECTNESS_r03 recorded TypeError: unhashable
type 'list' for the array form). The ARRAY form stays the real API for
model-input consumers; these tests pin that the two forms are the same
numbers and that the vectors obey their defining invariants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from world_cup_duckdb_spark.queries.ext_multimodal import (
    mm_feature_counts_vector,
)
from world_cup_duckdb_spark.queries.ext_training2 import (
    _N_FEATURES,
    feature_hash_vector,
)


def test_feature_hash_vector_matches_csv_and_token_count(spark, sf_dir):
    vec = feature_hash_vector(spark, sf_dir)
    rows = vec.collect()
    assert rows and all(len(r["features"]) == _N_FEATURES for r in rows)
    # The bucket counts are a partition of the document's token multiset:
    # per doc, sum(features) == number of whitespace tokens.
    from world_cup_duckdb_spark.sources.catalog import load_tables

    d = load_tables(spark, sf_dir)["documents"].select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    joined = vec.select(
        "doc_id",
        F.aggregate(
            "features", F.lit(0), lambda acc, x: acc + x
        ).alias("total"),
    ).join(d, "doc_id")
    bad = joined.filter(F.col("total") != F.col("n_tokens")).count()
    assert bad == 0


def test_mm_feature_vector_matches_registered_csv(spark, sf_dir):
    from world_cup_duckdb_spark.queries import REGISTRY

    vec = mm_feature_counts_vector(spark, sf_dir).select(
        "doc_id",
        F.array_join(
            F.transform("counts", lambda x: x.cast("string")), ","
        ).alias("counts"),
    )
    csv = REGISTRY["ext_mm_features"].fn(spark, sf_dir)
    assert (
        vec.exceptAll(csv).count() == 0 and csv.exceptAll(vec).count() == 0
    )


def test_bpe_merge_application_is_greedy_left_to_right(spark):
    """'aaaa' under rule (a,a) must become two 'aa' symbols — the wrapped
    per-symbol representation makes replace() equal greedy BPE merge
    application; shared-boundary encodings get this wrong ('aa','a','a')."""
    from world_cup_duckdb_spark.operators.text import (
        bpe_apply_merge,
        bpe_initial_repr,
        bpe_symbols,
    )

    df = spark.createDataFrame(
        [("aaaa", 1), ("aaa", 1), ("aba", 1)], ["word", "freq"]
    ).withColumn("repr", bpe_initial_repr("word"))
    out = {
        r.word: r.syms
        for r in bpe_apply_merge(df, "a", "a")
        .select("word", bpe_symbols("repr").alias("syms"))
        .collect()
    }
    assert out["aaaa"] == ["aa", "aa"]
    assert out["aaa"] == ["aa", "a"]
    assert out["aba"] == ["a", "b", "a"]


def test_bpe_pair_counts_weighted_by_word_frequency(spark):
    from world_cup_duckdb_spark.operators.text import (
        bpe_initial_repr,
        bpe_pair_counts,
    )

    df = spark.createDataFrame(
        [("ab", 3), ("abc", 2), ("x", 5)], ["word", "freq"]
    ).withColumn("repr", bpe_initial_repr("word"))
    counts = {(r.a, r.b): r.pf for r in bpe_pair_counts(df).collect()}
    # 'ab' appears in both words: 3 + 2; 'bc' only in 'abc'; single-symbol
    # words contribute nothing.
    assert counts == {("a", "b"): 5, ("b", "c"): 2}
