#!/usr/bin/env python
"""Interleaved A/B (r13): FULL ext_corpus_prep_pipeline, r12 form vs the
current package — the r12 implementation (star edges via groupBy+join,
probe-per-round CC, Column-builder tail/stage_token_counts/quality/split
expressions) is replicated INLINE below from commit c3e97fd so both forms
run in one warm session under the bench posture.

Usage: python scripts/ab_r13_pipeline.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_OFFSET = 1_000_000
_BUDGET = 4096
_N_EPOCHS = 2
_N_SHARDS = 8
_MAX_UPSAMPLE = 8.0


# ---- r12 replicas -------------------------------------------------------

def old_stage_token_counts(df, keep, langs=("en",), text_col="text"):
    from world_cup_duckdb_spark.operators.text import STOPWORDS

    cols = list(keep)
    toks = F.split(F.col(text_col), " ")
    staged = df.select(*cols, toks.alias("__toks"))
    return staged.select(
        *cols,
        F.size("__toks").alias("n_tokens"),
        *[
            F.size(
                F.filter(
                    F.col("__toks"), lambda t: t.isin(*STOPWORDS[lang])
                )
            ).alias(f"{lang}_n")
            for lang in langs
        ],
    )


def old_quality_expr():
    stop_ratio = F.col("en_n") / F.col("n_tokens").cast("double")
    return (
        F.least(F.lit(1.0), F.col("n_tokens") / F.lit(200.0)) * 0.5
        + F.least(F.lit(1.0), stop_ratio * 8.0) * 0.5
    )


def old_split_bucket(key):
    from world_cup_duckdb_spark.functions.strings import hex_nibble, md5_bucket

    h = md5_bucket(F.col(key) if isinstance(key, str) else key)
    return (hex_nibble(h, 1) * 16 + hex_nibble(h, 2)) % 10


def old_lsh_star_edges(bands: DataFrame, id_col: str = "doc_id") -> DataFrame:
    m = bands.groupBy("band", "band_key").agg(F.min(id_col).alias("hub"))
    return (
        bands.join(m, ["band", "band_key"])
        .filter(F.col(id_col) != F.col("hub"))
        .select(F.col("hub").alias("doc_a"), F.col(id_col).alias("doc_b"))
        .distinct()
    )


def old_connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 15,
) -> DataFrame:
    half = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    spark = pairs.sparkSession
    n_part = int(str(spark.conf.get("spark.sql.shuffle.partitions", "32")))
    edges = (
        half.unionByName(
            half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .repartition(n_part, F.col("dst"))
        .localCheckpoint(eager=False)
    )
    labels = edges.groupBy(F.col("src").alias("node")).agg(
        F.least(F.min("dst"), F.min("src")).alias("label")
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(
                neighbor_min, labels["node"] == neighbor_min["src"], "left"
            )
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nlabel", F.col("label"))
                ).alias("label"),
                F.col("label").alias("old"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("label") != F.col("old")).count()
        labels = new_labels.drop("old")
        if changed == 0:
            break
    else:
        raise RuntimeError("old CC did not converge")
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def old_pipeline(spark, sf_dir: str) -> DataFrame:
    from world_cup_duckdb_spark.operators.dedup import (
        minhash_bands,
        with_recrawl,
    )
    from world_cup_duckdb_spark.operators.training import (
        epoch_shuffle,
        temperature_mix,
    )
    from world_cup_duckdb_spark.queries import tracked_persist
    from world_cup_duckdb_spark.sources.catalog import load_tables

    d = load_tables(spark, sf_dir)["documents"]
    corpus = with_recrawl(d.select("doc_id", "text"))
    bands = minhash_bands(corpus, num_hashes=8, band_size=2).transform(
        tracked_persist
    )
    clusters = old_connected_components(old_lsh_star_edges(bands))
    counted = old_stage_token_counts(corpus, keep=("doc_id",), langs=("en",))
    members = (
        corpus.select("doc_id")
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
        )
        .join(counted.select("doc_id", old_quality_expr().alias("q")), "doc_id")
    )
    best = members.groupBy("cluster_id").agg(
        F.max(
            F.struct(F.col("q"), (-F.col("doc_id")).alias("neg"))
        ).alias("m")
    )
    train = best.filter(old_split_bucket("cluster_id") < 8).select(
        (-F.col("m.neg")).cast("long").alias("kept_doc_id")
    )
    meta = with_recrawl(d.select("doc_id", "source", "n_chars"))
    survivors = (
        train.join(meta, train["kept_doc_id"] == meta["doc_id"])
        .select("kept_doc_id", "source", "n_chars")
        .transform(tracked_persist)
    )
    mixed = temperature_mix(
        survivors.select("kept_doc_id", "source", "n_chars"),
        weight_col="n_chars",
        group_col="source",
        id_col="kept_doc_id",
        alpha=0.5,
        max_upsample=_MAX_UPSAMPLE,
        salt="tmix-",
    )
    shuffled = epoch_shuffle(
        mixed.select("kept_doc_id", "copy_nr", "n_chars"),
        id_col=["kept_doc_id", "copy_nr"],
        n_epochs=_N_EPOCHS,
        n_shards=_N_SHARDS,
        carry=("n_chars",),
    )
    w = (
        Window.partitionBy("epoch", "shard")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = shuffled.select(
        "epoch",
        "shard",
        "pos",
        "n_chars",
        (F.sum("n_chars").over(w) - F.col("n_chars")).alias("off"),
    )
    return (
        placed.withColumn(
            "pack_id", F.floor(F.col("off") / F.lit(_BUDGET)).cast("long")
        )
        .groupBy("epoch", "shard", "pack_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("pack_chars"),
            F.min("pos").cast("long").alias("first_pos"),
        )
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from world_cup_duckdb_spark.queries import (
        REGISTRY,
        release_tracked_persists,
    )
    from world_cup_duckdb_spark.session import get_spark
    from world_cup_duckdb_spark.sources.catalog import warm_cache

    spark = get_spark(
        "wcdbs-ab-pipeline",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        extra_conf={
            "spark.sql.shuffle.partitions": os.environ.get(
                "SPARK_GRAFT_SHUFFLE", "8"
            ),
            "spark.sql.adaptive.enabled": os.environ.get(
                "SPARK_GRAFT_AQE", "false"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm_cache(spark, SF_DIR)

    new_fn = REGISTRY["ext_corpus_prep_pipeline"].fn
    variants = {
        "old_r12": lambda: old_pipeline(spark, SF_DIR),
        "new_r13": lambda: new_fn(spark, SF_DIR),
    }

    def once(fn) -> float:
        release_tracked_persists()
        t0 = time.perf_counter()
        df = fn()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    a = sorted(map(tuple, variants["old_r12"]().collect()))
    release_tracked_persists()
    b = sorted(map(tuple, variants["new_r13"]().collect()))
    release_tracked_persists()
    print(f"rows equal: {a == b} ({len(a)})")
    if a != b:
        sys.exit(1)

    for fn in variants.values():
        once(fn)
    times = {n: [] for n in variants}
    for _ in range(reps):
        for n, fn in variants.items():
            times[n].append(once(fn))
    print(f"== full corpus-prep old(r12) vs new(r13), interleaved, {reps} reps ==")
    for n, runs in times.items():
        s = sorted(runs)
        print(f"  {n:10s} min={s[0]:6.3f} med={s[len(s)//2]:6.3f}"
              f" all={[round(t,3) for t in runs]}")


if __name__ == "__main__":
    main()
