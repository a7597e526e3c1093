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


def test_band_plan_candidate_cost_is_monotone_in_bands(spark, sf_dir):
    """Every (b, r) banding refines the keys of the next-finer config's
    bands, so verification cost must be monotone: more bands (shorter
    keys) never costs less. threshold moves the opposite way."""
    from world_cup_duckdb_spark.queries import REGISTRY

    rows = {
        r.bands: r
        for r in REGISTRY["ext_lsh_band_plan"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {1, 2, 4, 8}
    assert (
        rows[8].candidate_checks
        >= rows[4].candidate_checks
        >= rows[2].candidate_checks
        >= rows[1].candidate_checks
    )
    assert rows[8].threshold < rows[4].threshold < rows[2].threshold
    assert rows[1].threshold == 1.0


def test_bpe_encode_compression_bounds(spark, sf_dir):
    """Merges only ever shorten representations: symbols_after is
    bounded by the character count, and at least one merge must have
    fired corpus-wide (the top pair always has frequency >= 1)."""
    from world_cup_duckdb_spark.queries import REGISTRY

    rows = REGISTRY["ext_bpe_encode"].fn(spark, sf_dir).collect()
    assert rows
    assert all(0 < r.symbols_after <= r.symbols_before for r in rows)
    assert all(0.0 < r.compression <= 1.0 for r in rows)
    assert sum(r.symbols_after for r in rows) < sum(
        r.symbols_before for r in rows
    )


def test_cluster_best_copy_covers_corpus_and_beats_members(spark, sf_dir):
    """Every cluster keeps exactly one member; n_members sums to the
    corpus size (singletons included); the recrawl twin corpus means
    every original doc shares a cluster with its copy, so at least half
    the clusters have >= 2 members."""
    from world_cup_duckdb_spark.queries import REGISTRY
    from world_cup_duckdb_spark.sources.catalog import load_tables

    out = REGISTRY["ext_cluster_best_copy"].fn(spark, sf_dir)
    rows = out.collect()
    n_corpus = 2 * load_tables(spark, sf_dir)["documents"].count()
    assert sum(r.n_members for r in rows) == n_corpus
    assert len({r.cluster_id for r in rows}) == len(rows)
    assert sum(1 for r in rows if r.n_members >= 2) >= len(rows) // 2


def test_bpe_learns_merges_of_already_merged_symbols(spark):
    """Iteration 2+ must merge multi-char symbols: with every word 'abab',
    merge 1 is (a,b) -> 'ab', and merge 2 must be ('ab','ab') — the
    wrapped-representation replace has to match multi-char symbols
    exactly, not substrings ('|ab||ab|' != any 1-char boundary)."""
    from world_cup_duckdb_spark.operators.text import bpe_initial_repr
    from world_cup_duckdb_spark.queries.ext_bpe import _learn_merges

    words = spark.createDataFrame(
        [("abab", 3), ("cd", 1)], ["word", "freq"]
    ).select("word", "freq", bpe_initial_repr("word").alias("repr"))
    merges, after = _learn_merges(words, 2)
    assert [(m[1], m[2], m[3]) for m in merges] == [
        ("a", "b", "ab"),
        ("ab", "ab", "abab"),
    ]
    # pair freq of (a,b) = 2 per word * 3 words; ('ab','ab') = 1 * 3
    assert [m[4] for m in merges] == [6, 3]
    reprs = {r.word: r.repr for r in after.collect()}
    assert reprs["abab"] == "|abab|"
    assert reprs["cd"] == "|c||d|"


def test_bpe_tie_break_is_lexicographic(spark):
    """Equal-frequency pairs resolve (lhs, rhs) ascending — 'xy' and 'ab'
    both appear once; 'ab' must win."""
    from world_cup_duckdb_spark.operators.text import bpe_initial_repr
    from world_cup_duckdb_spark.queries.ext_bpe import _learn_merges

    words = spark.createDataFrame(
        [("xy", 1), ("ab", 1)], ["word", "freq"]
    ).select("word", "freq", bpe_initial_repr("word").alias("repr"))
    merges, _ = _learn_merges(words, 1)
    assert (merges[0][1], merges[0][2]) == ("a", "b")


def test_split_leakage_cluster_mode_is_leak_free(spark, sf_dir):
    """Splitting on the cluster label is leak-free BY CONSTRUCTION
    (n_leaky = 0); the naive per-doc hash split must leak on the
    recrawl corpus (copies of one doc hash to different splits)."""
    from world_cup_duckdb_spark.queries import REGISTRY

    rows = {
        r.mode: r
        for r in REGISTRY["ext_split_leakage"].fn(spark, sf_dir).collect()
    }
    assert rows["by_cluster"].n_leaky == 0
    assert rows["by_cluster"].leak_rate == 0.0
    assert rows["by_doc_id"].n_leaky > 0
    assert (
        rows["by_doc_id"].n_clusters_multi
        == rows["by_cluster"].n_clusters_multi
    )


def test_epoch_shuffle_is_a_per_epoch_permutation(spark, sf_dir):
    """The shuffle must be a PERMUTATION of the corpus per epoch (every
    doc exactly once), positions within each (epoch, shard) must be
    contiguous 1..n, and the two epochs must order the corpus
    DIFFERENTLY (the salt works) while being identical across runs."""
    from world_cup_duckdb_spark.queries.ext_training3 import (
        _N_EPOCHS,
        ext_epoch_shuffle,
    )
    from world_cup_duckdb_spark.sources.catalog import table

    out = ext_epoch_shuffle(spark, sf_dir)
    n_docs = table(spark, sf_dir, "documents").count()
    rows = out.collect()
    assert len(rows) == n_docs * _N_EPOCHS
    by_epoch: dict[int, list] = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], []).append(r)
    for epoch, er in by_epoch.items():
        # permutation: every doc exactly once per epoch
        assert len({r["doc_id"] for r in er}) == n_docs
        # contiguous ranks within each shard
        shards: dict[int, list] = {}
        for r in er:
            shards.setdefault(r["shard"], []).append(r["pos"])
        for poss in shards.values():
            assert sorted(poss) == list(range(1, len(poss) + 1))
    # epochs produce different orders (salted hash actually varies)
    order0 = [
        r["doc_id"]
        for r in sorted(by_epoch[0], key=lambda r: (r["shard"], r["pos"]))
    ]
    order1 = [
        r["doc_id"]
        for r in sorted(by_epoch[1], key=lambda r: (r["shard"], r["pos"]))
    ]
    assert order0 != order1
    # determinism: a second evaluation reproduces the same assignment
    again = {
        (r["epoch"], r["doc_id"]): (r["shard"], r["pos"])
        for r in ext_epoch_shuffle(spark, sf_dir).collect()
    }
    assert all(
        again[(r["epoch"], r["doc_id"])] == (r["shard"], r["pos"])
        for r in rows
    )


def test_temperature_mix_balances_toward_largest_source(spark, sf_dir):
    """Defining invariants of alpha=0.5 temperature mixing: every doc
    keeps at least one copy; per-source realized copies land within 1
    doc-count of the planned sqrt multiplier; and the mix COMPRESSES
    imbalance — post-mix char shares are strictly more balanced than
    pre-mix (max/min share ratio shrinks ~ sqrt) without inverting the
    source order."""
    from world_cup_duckdb_spark.queries.ext_training3 import (
        ext_temperature_mix,
    )
    from world_cup_duckdb_spark.sources.catalog import table

    d = table(spark, sf_dir, "documents")
    pre = {
        r["source"]: (r["chars"], r["docs"])
        for r in d.groupBy("source")
        .agg(
            F.sum("n_chars").alias("chars"), F.count(F.lit(1)).alias("docs")
        )
        .collect()
    }
    out = ext_temperature_mix(spark, sf_dir)
    copies = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # every doc keeps >= 1 copy (m_s >= 1 by construction)
    kept = out.select("doc_id").distinct().count()
    assert kept == d.count()
    from world_cup_duckdb_spark.queries.ext_training3 import _MAX_UPSAMPLE

    cmax = max(c for c, _ in pre.values())
    for s, (c, n_docs) in pre.items():
        m = min(_MAX_UPSAMPLE, (cmax / c) ** 0.5)
        # realized copies within the coin's +/- n_docs envelope of n*m
        assert n_docs * int(m) <= copies[s] <= n_docs * (int(m) + 1)
        assert abs(copies[s] - n_docs * m) <= n_docs
    # imbalance compresses: expected post-mix char budget per source is
    # c * m = sqrt(c * cmax), so the max/min ratio should shrink from
    # (cmax/cmin) toward sqrt(cmax/cmin).
    post = {
        s: c * min(_MAX_UPSAMPLE, (cmax / c) ** 0.5)
        for s, (c, _) in pre.items()
    }
    pre_ratio = cmax / min(c for c, _ in pre.values())
    post_ratio = max(post.values()) / min(post.values())
    assert post_ratio < pre_ratio
    if pre_ratio < _MAX_UPSAMPLE**2:  # cap not binding -> exact sqrt law
        assert abs(post_ratio - pre_ratio**0.5) < 1e-9


def test_epoch_shuffle_parametrized_shards_and_epochs(spark, sf_dir):
    """The library form must stay a per-epoch permutation with
    contiguous shard ranks under non-default knobs (5 shards, 3
    epochs) — the 100 TB contract is 'set n_shards ~ cluster cores',
    so the invariants can't be artifacts of the 8/2 defaults."""
    from world_cup_duckdb_spark.operators.training import epoch_shuffle
    from world_cup_duckdb_spark.sources.catalog import table

    d = table(spark, sf_dir, "documents")
    n_docs = d.count()
    rows = epoch_shuffle(d, n_epochs=3, n_shards=5, salt="v2:").collect()
    assert len(rows) == n_docs * 3
    assert {r["epoch"] for r in rows} == {0, 1, 2}
    assert {r["shard"] for r in rows} <= set(range(5))
    per_es: dict[tuple, list] = {}
    for r in rows:
        per_es.setdefault((r["epoch"], r["shard"]), []).append(r["pos"])
    for poss in per_es.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # a different salt yields a different permutation of epoch 0
    other = epoch_shuffle(d, n_epochs=1, n_shards=5, salt="v3:").collect()
    key_v2 = {
        r["doc_id"]: (r["shard"], r["pos"]) for r in rows if r["epoch"] == 0
    }
    key_v3 = {r["doc_id"]: (r["shard"], r["pos"]) for r in other}
    assert key_v2 != key_v3


def test_temperature_mix_alpha_one_fully_balances(spark, sf_dir):
    """alpha=1.0 is full balancing: expected post-mix char budget per
    source is c * (cmax/c) = cmax — every source's realized char budget
    must land within one max-document of cmax (coin granularity), and
    the input columns must pass through (the library form returns rows,
    not a projection)."""
    from world_cup_duckdb_spark.operators.training import temperature_mix
    from world_cup_duckdb_spark.sources.catalog import table

    d = table(spark, sf_dir, "documents")
    out = temperature_mix(d, weight_col="n_chars", max_upsample=64.0, alpha=1.0)
    assert set(out.columns) == set(d.columns) | {"copy_nr"}
    post = {
        r["source"]: r["chars"]
        for r in out.groupBy("source").agg(F.sum("n_chars").alias("chars")).collect()
    }
    pre = {
        r["source"]: (r["c"], r["mx"], r["n"])
        for r in d.groupBy("source")
        .agg(
            F.sum("n_chars").alias("c"),
            F.max("n_chars").alias("mx"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    cmax = max(c for c, _, _ in pre.values())
    for s, (c, mx, n) in pre.items():
        # realized budget ≈ cmax; the md5 coin rounds per-document, so
        # the worst-case deviation is n docs x max doc chars -
        # bound loosely by n * mx coin slack on the fractional copy.
        assert abs(post[s] - cmax) <= n * mx


def test_training_operator_contract_guards(spark):
    """Out-of-contract knobs fail loudly, not with silent wrong output
    (sequence(0, -1) is a DESCENDING range in Spark)."""
    import pytest

    from world_cup_duckdb_spark.operators.training import (
        epoch_shuffle,
        temperature_mix,
    )

    df = spark.range(3).withColumnRenamed("id", "doc_id").withColumn(
        "source", F.lit("s")
    ).withColumn("n_chars", F.lit(10))
    with pytest.raises(ValueError, match="n_epochs"):
        epoch_shuffle(df, n_epochs=0)
    with pytest.raises(ValueError, match="n_shards"):
        epoch_shuffle(df, n_shards=0)
    with pytest.raises(ValueError, match="max_upsample"):
        temperature_mix(df, "n_chars", max_upsample=0.5)
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix(df, "n_chars", alpha=-1.0)


def test_temperature_mix_zero_weight_group_passes_through(spark):
    """A group whose weights sum to zero must pass through once per row
    (multiplier pinned to 1.0), not raise DIVIDE_BY_ZERO under the
    engine's ANSI session and not get capped-upsampled like the DuckDB
    inf->LEAST path would."""
    from world_cup_duckdb_spark.operators.training import temperature_mix

    df = spark.createDataFrame(
        [("big", 1, 100), ("big", 2, 300), ("empty", 3, 0), ("empty", 4, 0)],
        ["source", "doc_id", "n_chars"],
    )
    out = temperature_mix(df, "n_chars").collect()
    empties = [r for r in out if r["source"] == "empty"]
    assert sorted((r["doc_id"], r["copy_nr"]) for r in empties) == [
        (3, 1),
        (4, 1),
    ]
    # the big source is its own max: multiplier exactly 1.0
    bigs = [r for r in out if r["source"] == "big"]
    assert sorted((r["doc_id"], r["copy_nr"]) for r in bigs) == [(1, 1), (2, 1)]


def test_temperature_mix_rejects_nan_knobs(spark):
    """NaN compares False to everything, so a `x < bound` guard would
    silently admit it and least(cap, NaN) would cap-upsample EVERY
    source; the guard must reject NaN explicitly."""
    import pytest

    from world_cup_duckdb_spark.operators.training import temperature_mix

    df = spark.createDataFrame(
        [("s", 1, 10)], ["source", "doc_id", "n_chars"]
    )
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix(df, "n_chars", alpha=float("nan"))
    with pytest.raises(ValueError, match="max_upsample"):
        temperature_mix(df, "n_chars", max_upsample=float("nan"))


def test_epoch_shuffle_composite_id_decorrelates_copies(spark, sf_dir):
    """Shuffling temperature_mix output with the composite
    (doc_id, copy_nr) key must (a) keep the permutation property over
    copies and (b) actually separate copies — with a single-id hash all
    copies of a doc would land adjacent in one shard every epoch."""
    from world_cup_duckdb_spark.operators.training import (
        epoch_shuffle,
        temperature_mix,
    )
    from world_cup_duckdb_spark.sources.catalog import table

    d = table(spark, sf_dir, "documents")
    mixed = temperature_mix(d, "n_chars")
    n_rows = mixed.count()
    out = epoch_shuffle(
        mixed, id_col=["doc_id", "copy_nr"], n_epochs=1
    ).collect()
    assert len(out) == n_rows
    per_shard: dict[int, list] = {}
    for r in out:
        per_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in per_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # copies of the same doc spread: at least one doc with >= 2 copies
    # has its copies in different shards (md5 over the composite key).
    shards_by_doc: dict[int, set] = {}
    for r in out:
        shards_by_doc.setdefault(r["doc_id"], set()).add(r["shard"])
    multi = [s for s in shards_by_doc.values() if len(s) >= 2]
    assert multi, "no upsampled doc had copies in distinct shards"


def test_training_pipeline_composes_mix_shuffle_pack(spark, sf_dir):
    """End-to-end composition of the trainer-feed stages: temperature
    mix -> composite-key epoch shuffle -> fixed-budget packing by shard
    position. Invariants across the composed pipeline: total char mass
    equals the sum over realized copies; every (epoch, shard) packs its
    rows into contiguous budget bins with no pack over budget + one doc
    (contiguous fill places each row where its running offset starts);
    and the whole composition is deterministic across evaluations."""
    from pyspark.sql import Window

    from world_cup_duckdb_spark.operators.training import (
        epoch_shuffle,
        temperature_mix,
    )
    from world_cup_duckdb_spark.sources.catalog import table

    budget = 4096
    d = table(spark, sf_dir, "documents")
    mixed = temperature_mix(d, "n_chars")
    shuffled = epoch_shuffle(mixed, id_col=["doc_id", "copy_nr"], n_epochs=1)
    placed = (
        shuffled.join(
            mixed.select("doc_id", "copy_nr", "n_chars"),
            ["doc_id", "copy_nr"],
        )
        .withColumn(
            "start",
            F.sum("n_chars").over(
                Window.partitionBy("shard").orderBy("pos")
            )
            - F.col("n_chars"),
        )
        .withColumn("pack_id", F.floor(F.col("start") / budget))
    )
    packs = (
        placed.groupBy("shard", "pack_id")
        .agg(F.sum("n_chars").alias("chars"), F.max("n_chars").alias("mx"))
        .collect()
    )
    total_mix = mixed.agg(F.sum("n_chars")).collect()[0][0]
    assert sum(r["chars"] for r in packs) == total_mix
    # contiguous fill: a pack never exceeds budget + (its largest doc - 1)
    assert all(r["chars"] < budget + r["mx"] for r in packs)
    # determinism of the whole composition
    again = sorted(
        tuple(r) for r in placed.select("doc_id", "shard", "pos").collect()
    )
    first = sorted(
        tuple(r) for r in placed.select("doc_id", "shard", "pos").collect()
    )
    assert again == first


def test_compression_ratio_separates_repetition_noise_and_prose(spark):
    """The deflate signal must order the three text classes:
    repetitive boilerplate << natural prose < random-ish noise; empty
    text scores 1.0; and the band filter keeps exactly the prose."""
    from world_cup_duckdb_spark.operators.text import (
        compression_quality_filter,
        compression_ratio,
    )

    rep = "buy now click here " * 200
    prose = (
        "The tournament opened with a close match between the hosts and "
        "the defending champions, decided late by a penalty after a long "
        "review. Crowds filled the plaza despite the rain, and the "
        "broadcast reached a record audience across four continents. "
    )
    noise = "".join(
        chr(33 + ((i * 73 + (i * i) % 251) % 90)) for i in range(3000)
    )
    df = spark.createDataFrame(
        [(1, rep), (2, prose), (3, noise), (4, "")],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r["compress_ratio"]
        for r in compression_ratio(df).collect()
    }
    assert rows[1] < rows[2] < rows[3]
    assert rows[1] < 0.1 and rows[3] > 0.8
    assert rows[4] == 1.0
    kept = [
        r["doc_id"] for r in compression_quality_filter(df).collect()
    ]
    assert kept == [2]
    # determinism: zlib at a fixed level is bit-stable
    again = {
        r["doc_id"]: r["compress_ratio"]
        for r in compression_ratio(df).collect()
    }
    assert again == rows


def test_compression_ratio_on_fixture_is_map_only(spark, sf_dir):
    """Over the real corpus: every doc scored, scores in (0, 1.5]
    (tiny docs can exceed 1 — zlib header overhead), and the plan has
    no shuffle exchange (map-only contract)."""
    from world_cup_duckdb_spark.operators.text import compression_ratio
    from world_cup_duckdb_spark.sources.catalog import table

    d = table(spark, sf_dir, "documents")
    scored = compression_ratio(d)
    p = scored._sc._jvm.PythonSQLUtils.explainString(
        scored._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in p
    rows = scored.select("doc_id", "compress_ratio").collect()
    assert len(rows) == d.count()
    assert all(0.0 < r["compress_ratio"] <= 1.5 for r in rows)


def test_temperature_mix_rejects_overflowing_upsample_cap(spark):
    """floor(max_upsample)+1 copies must fit the INT the explode
    sequence is built on; a huge cap (e.g. 1e12) must fail the
    contract check instead of silently overflowing the cast."""
    import pytest

    from world_cup_duckdb_spark.operators.training import temperature_mix

    df = spark.createDataFrame(
        [("s", 1, 10)], ["source", "doc_id", "n_chars"]
    )
    with pytest.raises(ValueError, match="max_upsample"):
        temperature_mix(df, "n_chars", max_upsample=1e12)
    # the largest admissible cap still builds a plan
    temperature_mix(df, "n_chars", max_upsample=float(2**31 - 2))


def test_epoch_shuffle_composite_key_encoding_is_injective(spark):
    """Ids containing the delimiter must not collide: with a bare '-'
    join, ("a-1","2") and ("a","1-2") hash identically and the two rows
    draw correlated shard/position EVERY epoch. The length-prefixed
    encoding keeps distinct key tuples on independent md5 draws."""
    from world_cup_duckdb_spark.operators.training import epoch_shuffle

    df = spark.createDataFrame(
        [("a-1", "2"), ("a", "1-2")], ["k1", "k2"]
    )
    out = epoch_shuffle(
        df, id_col=["k1", "k2"], n_epochs=4, n_shards=1 << 20
    ).collect()
    by_epoch: dict[int, list] = {}
    for r in out:
        by_epoch.setdefault(r["epoch"], []).append(r["shard"])
    # 4 epochs x 2^20 shards: the chance all 4 draws collide by luck is
    # ~2^-80; identical draws every epoch means the encoding collided.
    assert any(len(set(shards)) == 2 for shards in by_epoch.values()), (
        "delimiter-bearing composite keys hashed identically in every "
        "epoch — the key encoding is not injective"
    )


def test_bpe_batched_equals_sequential_on_fixture(spark, sf_dir):
    """The batched trainer (operators/text.py:bpe_learn_merges) must
    produce EXACTLY the sequential trainer's rules — same pairs, same
    order, same frequencies — at a depth (16) where batches genuinely
    span multiple merges, and in strictly fewer corpus passes."""
    from world_cup_duckdb_spark.operators.text import (
        bpe_initial_repr,
        bpe_learn_merges,
        bpe_learn_merges_sequential,
    )
    from world_cup_duckdb_spark.sources.catalog import table

    d = table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter((F.col("word") != "") & (~F.col("word").contains("|")))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    words = vocab.select(
        "word", "freq", bpe_initial_repr("word").alias("repr")
    ).cache()
    seq, _ = bpe_learn_merges_sequential(words, 16)
    bat, _ = bpe_learn_merges(words, 16)
    assert bat == seq
    words.unpersist()


def test_bpe_batched_handles_merged_token_collision(spark):
    """A merge whose token already exists as a symbol folds counts into
    the existing symbol — the batch must degenerate to that single merge
    (no pre-count bound survives the inflation) and still match the
    sequential trainer exactly."""
    from world_cup_duckdb_spark.operators.text import (
        bpe_initial_repr,
        bpe_learn_merges,
        bpe_learn_merges_sequential,
    )

    # 'xy' appears both as a to-be-merged pair (x, y) and, after one
    # merge, as a symbol colliding with pairs in 'axy'-like words.
    df = spark.createDataFrame(
        [("xyxy", 50), ("xyz", 30), ("qr", 20), ("qrs", 10)],
        ["word", "freq"],
    ).select("word", "freq", bpe_initial_repr("word").alias("repr"))
    seq, _ = bpe_learn_merges_sequential(df, 5)
    bat, _ = bpe_learn_merges(df, 5)
    assert bat == seq


def test_bpe_batched_uses_fewer_passes(spark, sf_dir):
    """The whole point of batching: pass count (spark jobs from
    pair-count collects) must be sublinear in the merge count. Proxy:
    time 32 merges both ways and count aggregation barriers via a
    wrapped bpe_pair_counts."""
    import world_cup_duckdb_spark.operators.text as ot
    from world_cup_duckdb_spark.operators.text import bpe_initial_repr
    from world_cup_duckdb_spark.sources.catalog import table

    d = table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter((F.col("word") != "") & (~F.col("word").contains("|")))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    words = vocab.select(
        "word", "freq", bpe_initial_repr("word").alias("repr")
    ).cache()
    calls = {"n": 0}
    orig = ot.bpe_pair_counts

    def counting(w):
        calls["n"] += 1
        return orig(w)

    ot.bpe_pair_counts = counting
    try:
        merges, _ = ot.bpe_learn_merges(words, 32)
        exact_passes = calls["n"]
        calls["n"] = 0
        approx, _ = ot.bpe_learn_merges(words, 32, exact=False)
    finally:
        ot.bpe_pair_counts = orig
    words.unpersist()
    assert len(merges) == 32 and len(approx) == 32
    assert exact_passes < 32, (
        f"exact batched trainer took {exact_passes} passes for 32 "
        "merges — no better than sequential"
    )
    # the production approximation is the real lever: ~batch-size
    # merges per pass (sf0.1 measurement: 6 passes / 64 merges)
    assert calls["n"] <= 8, (
        f"approx batched trainer took {calls['n']} passes for 32 merges"
    )
    # the approximation stays a valid BPE run: ranks contiguous, every
    # merged token the concatenation of its pair, frequencies positive
    assert [m[0] for m in approx] == list(range(1, 33))
    assert all(m[3] == m[1] + m[2] and m[4] > 0 for m in approx)


def test_bpe_repersist_checkpoint_preserves_results(spark):
    """Periodic re-materialization (replace-chain reset) must not change
    the learned rules — same output with repersist_every=2 as with the
    chain never reset."""
    from world_cup_duckdb_spark.operators.text import (
        bpe_initial_repr,
        bpe_learn_merges,
    )

    df = spark.createDataFrame(
        [("abcdef", 60), ("abcd", 40), ("cdef", 30), ("ab", 20)],
        ["word", "freq"],
    ).select("word", "freq", bpe_initial_repr("word").alias("repr"))
    plain, _ = bpe_learn_merges(df, 5, repersist_every=10**9)
    chk, w = bpe_learn_merges(df, 5, repersist_every=2)
    assert chk == plain
    # applied representations identical too (the checkpoint carries state)
    assert sorted(r["repr"] for r in w.collect()) == sorted(
        r["repr"]
        for r in bpe_learn_merges(df, 5, repersist_every=10**9)[1].collect()
    )
    spark.catalog.clearCache()


import pytest


@pytest.mark.parametrize(
    "words,n",
    [
        # all-tie plateau with shared symbols: lexicographic tie-breaks
        # decide every pick; the cap forces near-singleton batches
        ([("ab", 10), ("bc", 10), ("ca", 10)], 4),
        # self-overlapping runs: greedy left-to-right replace semantics
        ([("aaaa", 7), ("aaab", 5)], 4),
        # created-pair overtake: merging (a,b) in 'abab' creates (ab,ab)
        # with pf 10 > (c,d)'s 9 — naive disjoint-top-k batching would
        # merge (c,d) second; sequential (and the cap rule) picks
        # (ab,ab). This fixture is the soundness cap's reason to exist.
        ([("abab", 10), ("cd", 9)], 3),
        # decreasing conflict: (x,a) outcounts everything but shares a
        # symbol with the head pick, so it caps the whole batch
        ([("xab", 6), ("ab", 5), ("cd", 4)], 3),
        # SELF-pick created-pair overtake (review finding r6): merging
        # (a,a) in 'aaaa' creates (aa,aa) with pf 10 > (c,d)'s 9, and
        # its boundary pair is the pick ITSELF — neither rejected nor
        # unseen, so only the self-pair cap fold keeps batched ==
        # sequential ([(1,a,a,aa,30),(2,aa,aa,aaaa,10)], never (c,d))
        ([("aaaa", 10), ("cd", 9)], 2),
        # non-head self-pick mid-batch: same bound, later position
        ([("xy", 20), ("aaaa", 4), ("cd", 3)], 3),
    ],
    ids=["tie-plateau", "self-overlap", "created-pair-overtake",
         "conflict-caps-batch", "self-pick-head", "self-pick-mid"],
)
def test_bpe_batched_equals_sequential_adversarial(spark, words, n):
    """Exact-mode batching must equal the sequential trainer on corpora
    engineered to break naive batch acceptance (ties, self-overlap,
    merge-created pairs overtaking, high-count conflicts)."""
    from world_cup_duckdb_spark.operators.text import (
        bpe_initial_repr,
        bpe_learn_merges,
        bpe_learn_merges_sequential,
    )

    df = spark.createDataFrame(words, ["word", "freq"]).select(
        "word", "freq", bpe_initial_repr("word").alias("repr")
    )
    try:
        seq, seq_w = bpe_learn_merges_sequential(df, n)
    except ValueError:
        with pytest.raises(ValueError):
            bpe_learn_merges(df, n)
        return
    bat, bat_w = bpe_learn_merges(df, n)
    assert bat == seq
    assert sorted(r["repr"] for r in bat_w.collect()) == sorted(
        r["repr"] for r in seq_w.collect()
    )


def test_bpe_allow_exhaustion_returns_learned_prefix(spark):
    """ADVICE r6: a corpus that fully merges before the budget must
    return the learned prefix under allow_exhaustion=True (the scaled
    production entry's contract is "up to N rules") and keep the hard
    ValueError by default (the oracled fixed-N entries assume exactly N
    rules exist)."""
    import pytest as _pytest

    from world_cup_duckdb_spark.operators.text import (
        bpe_initial_repr,
        bpe_learn_merges,
    )

    # 'ab'×3, 'cd' — exhausts after at most 3 merges (ab, cd, and
    # nothing else pairable), far below the requested budget of 10.
    df = spark.createDataFrame(
        [("ab", 3), ("cd", 1)], ["word", "freq"]
    ).select("word", "freq", bpe_initial_repr("word").alias("repr"))
    for exact in (True, False):
        merges, out = bpe_learn_merges(
            df, 10, exact=exact, allow_exhaustion=True
        )
        assert [m[3] for m in merges] == ["ab", "cd"], merges
        # every word is now a single symbol — nothing left to merge
        assert out.filter(F.col("repr").contains("||")).count() == 0
        with _pytest.raises(ValueError, match="no adjacent symbol pairs"):
            bpe_learn_merges(df, 10, exact=exact)


def test_lsh_bucket_cap_keeps_pair_output_linear(spark):
    """Adversarial boilerplate fixture for the LSH bucket-size cap
    (VERDICT r7 item 2): a 2,000-document identical-text block forms one
    bucket per band; uncapped, the pair join would emit C(2000, 2) ≈ 2M
    pairs — with the cap the block contributes ZERO pairs, surfaces in
    the flagged side-output, and its connectivity is recoverable through
    1,999 linear star edges. Two genuine near-dup docs outside the block
    must still pair (the cap only suppresses pathological buckets)."""
    from world_cup_duckdb_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_star_edges,
        minhash_bands,
        split_bands_by_bucket_size,
    )

    boiler = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "cookie policy accept all cookies site navigation home about"
        ).alias("text"),
    )
    real = spark.createDataFrame(
        [
            (100000, "the quick brown fox jumps over the lazy dog today"),
            (100001, "the quick brown fox jumps over the lazy dog today"),
        ],
        "doc_id long, text string",
    )
    bands = minhash_bands(boiler.unionByName(real), num_hashes=8, band_size=2)
    bands = bands.persist()
    try:
        capped, flagged = split_bands_by_bucket_size(bands, 64)
        # The boilerplate block is exactly one oversized bucket per band.
        fl = flagged.collect()
        assert len(fl) == 4
        assert all(r.bucket_size == 2000 for r in fl)
        # Capped pair output is linear: only the real near-dup pair.
        pairs = lsh_candidate_pairs(bands, max_bucket_size=64).collect()
        assert [(p.doc_a, p.doc_b) for p in pairs] == [(100000, 100001)]
        # Star edges over the flagged buckets recover the block's
        # connectivity with exactly n-1 edges, all hubbed on min(id).
        members = bands.join(
            flagged.select("band", "band_key"), ["band", "band_key"]
        )
        star = lsh_star_edges(members).collect()
        assert len(star) == 1999
        assert all(e.doc_a == 0 for e in star)
    finally:
        bands.unpersist()


def test_hard_negatives_labels_differ_and_ranks_total(spark, sf_dir):
    """Every mined hard negative must carry a label different from its
    anchor's, ranks must be exactly 1..k per anchor, and cos_sim must be
    non-increasing in rank (ties broken by neighbor_id, so equal sims
    are fine but an increase is a sort bug)."""
    from world_cup_duckdb_spark.queries import REGISTRY

    rows = REGISTRY["ext_hard_negatives"].fn(spark, sf_dir).collect()
    assert rows
    by_q = {}
    for r in rows:
        assert r.neighbor_label != r.query_label, r
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1)), (q, rs)
        sims = [r.cos_sim for r in rs]
        assert all(a >= b for a, b in zip(sims, sims[1:])), (q, sims)


def test_rrf_score_is_sum_of_arm_reciprocals(spark, sf_dir):
    """rrf_score must equal 1/(60+lex_rank) + 1/(60+sem_rank) with a
    missing arm contributing exactly 0, and fused_rank must order by
    (rrf_score DESC, neighbor_id ASC) within each query."""
    from world_cup_duckdb_spark.queries import REGISTRY

    rows = REGISTRY["ext_hybrid_rrf"].fn(spark, sf_dir).collect()
    assert rows
    by_q = {}
    for r in rows:
        want = (1.0 / (60 + r.lex_rank) if r.lex_rank is not None else 0.0) + (
            1.0 / (60 + r.sem_rank) if r.sem_rank is not None else 0.0
        )
        assert r.rrf_score == want, (r, want)
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.fused_rank)
        keys = [(-r.rrf_score, r.neighbor_id) for r in rs]
        assert keys == sorted(keys), (q, rs)


def test_kmv_overlap_estimates_true_token_jaccard(spark, sf_dir):
    """The KMV jaccard_est must (a) satisfy the sketch invariants
    (n_intersect <= n_union_k <= k, estimate in [0,1], one row per
    unordered source pair) and (b) land within the sketch's standard
    error envelope of the EXACT distinct-token Jaccard computed the
    slow way (k=128 -> se ~ 1/sqrt(128) ~ 0.09; we allow 3 se)."""
    from pyspark.sql import functions as F

    from world_cup_duckdb_spark.queries import REGISTRY
    from world_cup_duckdb_spark.sources.catalog import load_tables

    est = {
        (r.source_a, r.source_b): r
        for r in REGISTRY["ext_source_overlap_kmv"].fn(spark, sf_dir).collect()
    }
    assert est
    d = load_tables(spark, sf_dir)["documents"]
    toks = (
        d.select(
            "source",
            F.explode(F.array_distinct(F.split("text", " "))).alias("t"),
        )
        .filter(F.col("t") != "")
        .distinct()
        .collect()
    )
    sets = {}
    for r in toks:
        sets.setdefault(r.source, set()).add(r.t)
    srcs = sorted(sets)
    expected_pairs = {
        (a, b) for i, a in enumerate(srcs) for b in srcs[i + 1 :]
    }
    assert set(est) == expected_pairs
    for (a, b), row in est.items():
        assert 0 <= row.n_intersect <= row.n_union_k <= 128, row
        assert 0.0 <= row.jaccard_est <= 1.0, row
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        exact = inter / union
        assert abs(row.jaccard_est - exact) <= 3 / (128**0.5), (
            a,
            b,
            row.jaccard_est,
            exact,
        )


def test_agreement_kappa_matches_driver_side_recompute(spark, sf_dir):
    """kappa must equal the textbook (po - pe) / (1 - pe) recomputed
    driver-side from the raw per-document votes (same LFs), bit-exact —
    the aggregate plan may fold counters in any order because they are
    integers; the float ops happen once, in fixed order, at the end."""
    from world_cup_duckdb_spark.queries import REGISTRY
    from world_cup_duckdb_spark.queries.ext_text import _weak_lfs
    from world_cup_duckdb_spark.sources.catalog import load_tables

    got = {
        (r.lf_a, r.lf_b): r
        for r in REGISTRY["ext_agreement_kappa"].fn(spark, sf_dir).collect()
    }
    assert set(got) == {
        ("length", "diversity"),
        ("length", "digits"),
        ("diversity", "digits"),
    }
    d = load_tables(spark, sf_dir)["documents"]
    lfl, lfd, lfg = _weak_lfs()
    votes = d.select(
        lfl.alias("l"), lfd.alias("d"), lfg.alias("g")
    ).collect()
    n = len(votes)
    for a, b in got:
        ca, cb = {"length": "l", "diversity": "d", "digits": "g"}[a], {
            "length": "l",
            "diversity": "d",
            "digits": "g",
        }[b]
        agree = sum(1 for v in votes if v[ca] == v[cb])
        pe_num = sum(
            sum(1 for v in votes if v[ca] == j)
            * sum(1 for v in votes if v[cb] == j)
            for j in (-1, 0, 1)
        )
        po = agree / n
        pe = pe_num / (n * n)
        row = got[(a, b)]
        assert row.n_docs == n and row.n_agree == agree, row
        assert row.po == po and row.pe == pe, row
        assert row.kappa == (po - pe) / (1.0 - pe), row


def test_domain_reweight_weights_are_a_floored_distribution(spark, sf_dir):
    """Domain weights must (a) be a probability distribution (sum to 1
    within one fold's rounding), (b) give every domain at least the
    uniform floor's share (no starved domain), (c) be monotone in
    excess loss: a domain with higher positive excess gets a strictly
    larger weight, and zero-excess domains all get exactly the floor
    share."""
    from world_cup_duckdb_spark.queries import REGISTRY

    rows = REGISTRY["ext_domain_reweight"].fn(spark, sf_dir).collect()
    assert rows
    total = sum(r.weight for r in rows)
    assert abs(total - 1.0) < 1e-12
    floor_w = min(r.w_raw for r in rows)
    assert floor_w >= 0.1
    by_excess = sorted(rows, key=lambda r: max(r.excess, 0.0))
    for a, b in zip(by_excess, by_excess[1:]):
        if max(b.excess, 0.0) > max(a.excess, 0.0):
            assert b.weight > a.weight, (a, b)
        elif max(a.excess, 0.0) == 0.0 == max(b.excess, 0.0):
            assert a.weight == b.weight
    for r in rows:
        assert r.target_tokens_ppm == int(r.weight * 1_000_000 // 1), r


def test_mmr_diversify_matches_driver_side_greedy(spark, sf_dir):
    """The unrolled MMR plan must equal a straightforward driver-side
    greedy recomputation from the same candidate pool and pair sims:
    per query, step 1 picks max relevance, steps 2-3 pick
    argmax(0.7*rel - 0.3*max-sim-to-selected), ties by neighbor_id."""
    from pyspark.sql import functions as F

    from world_cup_duckdb_spark.operators.similarity import brute_force_topk
    from world_cup_duckdb_spark.queries import REGISTRY
    from world_cup_duckdb_spark.sources.catalog import load_tables

    got = {}
    for r in REGISTRY["ext_mmr_diversify"].fn(spark, sf_dir).collect():
        got.setdefault(r.query_id, {})[r.mmr_rank] = (r.neighbor_id, r.mmr)

    emb = load_tables(spark, sf_dir)["embeddings"]
    cand = brute_force_topk(
        emb.filter(F.col("vec_id") < 8), emb, k=10
    ).collect()
    pool = {}
    for r in cand:
        pool.setdefault(r.query_id, []).append((r.neighbor_id, r.cos_sim))
    # pairwise sims among candidates, exact same fold as the operator
    ids = sorted({r.neighbor_id for r in cand})
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id").isin(ids)).collect()
    }

    def cos(a, b):
        num = 0.0
        for x, y in zip(a, b):
            num = num + x * y
        na = 0.0
        nb = 0.0
        for x in a:
            na = na + x * x
        for y in b:
            nb = nb + y * y
        return num / (na**0.5 * nb**0.5)

    for q, cands in pool.items():
        sel = []
        remaining = dict(cands)
        # step 1: max relevance
        first = max(cands, key=lambda t: (t[1], -t[0]))
        sel.append(first[0])
        del remaining[first[0]]
        assert got[q][1][0] == first[0], (q, got[q], first)
        for step in (2, 3):
            best = None
            for nid, rel in sorted(remaining.items()):
                worst = max(cos(vecs[nid], vecs[s]) for s in sel)
                mmr = 0.7 * rel - 0.3 * worst
                if best is None or mmr > best[1] or (
                    mmr == best[1] and nid < best[0]
                ):
                    best = (nid, mmr)
            assert got[q][step][0] == best[0], (q, step, got[q], best)
            sel.append(best[0])
            del remaining[best[0]]


def test_span_islands_merge_rule_boundaries(spark):
    """_islands_to_spans' merge rule, pinned at the boundary: hit
    positions with gap <= 5 (spans overlap or touch) merge into one
    span; gap 6 (one clean token between spans) opens a new island.
    Spans are [start, max_pos + 5) and per-doc independent."""
    from world_cup_duckdb_spark.queries.ext_dedup import _islands_to_spans

    hits = spark.createDataFrame(
        # doc 1: 0,3 merge (gap 3); 8 merges with 3 (gap 5, touching);
        #        14 breaks (gap 6) -> spans [0,13) and [14,19)
        [(1, 0), (1, 3), (1, 8), (1, 14),
         # doc 2: single hit -> [7,12)
         (2, 7)],
        "doc_id bigint, pos int",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in _islands_to_spans(hits).collect()
    }
    assert got == {(1, 0, 13), (1, 14, 19), (2, 7, 12)}


def test_span_decontaminate_policies_nest(spark, sf_dir):
    """Policy lattice over the same corpus: remove-all cuts at least as
    much as keep-one from every document (keep-one spares one occurrence
    per gram), both leave eval-split docs out of scope for
    ext_eval_decontaminate (which emits only train docs), and every
    clean_text round-trips: n_tokens - n_removed equals the rebuilt
    token count (split on ' ' of the non-empty rebuilt text)."""
    from world_cup_duckdb_spark.queries import REGISTRY

    ra = {
        r["doc_id"]: r.asDict()
        for r in REGISTRY["ext_span_decontaminate"].fn(spark, sf_dir).collect()
    }
    ko = {
        r["doc_id"]: r.asDict()
        for r in REGISTRY["ext_span_decontaminate_keepone"]
        .fn(spark, sf_dir)
        .collect()
    }
    ev = {
        r["doc_id"]: r.asDict()
        for r in REGISTRY["ext_eval_decontaminate"].fn(spark, sf_dir).collect()
    }
    assert set(ra) == set(ko) and len(ra) > 0
    assert all(ko[d]["n_removed"] <= ra[d]["n_removed"] for d in ra)
    assert sum(k["n_removed"] for k in ko.values()) < sum(
        k["n_removed"] for k in ra.values()
    )
    # eval split absent from the decontaminated train output
    assert all(d % 17 != 0 for d in ev)
    for out in (ra, ko, ev):
        for d, row in out.items():
            n_kept = row["n_tokens"] - row["n_removed"]
            rebuilt = row["clean_text"].split(" ") if row["clean_text"] else []
            assert len(rebuilt) == n_kept, (d, row)


def test_hashed_span_variant_equals_textual_form(spark, sf_dir):
    """dup_spans_hashed (xxhash64 gram keys — the 100 TB shuffle-width
    form) must equal the textual-key pipeline exactly on the fixture
    corpus, for both policies. Textual keys stay the registered/oracled
    form; this pins that the hashed twin is a pure exchange-width
    optimization, not a semantic fork."""
    from world_cup_duckdb_spark.queries.ext_dedup import (
        _dup_spans,
        dup_spans_hashed,
    )

    for keep_one in (False, True):
        t = {
            tuple(r)
            for r in _dup_spans(spark, sf_dir, keep_one=keep_one)
            .select("doc_id", "span_start", "span_end")
            .collect()
        }
        h = {
            tuple(r)
            for r in dup_spans_hashed(spark, sf_dir, keep_one=keep_one)
            .select("doc_id", "span_start", "span_end")
            .collect()
        }
        assert t == h and len(t) > 0, keep_one
