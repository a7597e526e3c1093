#!/usr/bin/env python
"""Interleaved A/B for the r13 connected-components rework (VERDICT r12
item 1): candidate variants defined INLINE so the package stays at the
baseline while both forms run in one warm session (the r12 measurement
protocol — this box's cross-run noise is ±25%, so decisions come from
same-session alternating draws, min of >=6).

Variants over the ext_corpus_prep_pipeline cluster graph at sf0.1:
  A  = baseline: groupBy+join star edges, CC probe-per-round loop
  B  = window star edges + self-loop-fused round + [1,2,2,...] schedule
  B1 = window star edges only (baseline CC)
  B2 = baseline star edges + fused/batched CC

Usage: python scripts/ab_r13_cc.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def star_edges_window(bands: DataFrame, id_col: str = "doc_id") -> DataFrame:
    hub = bands.selectExpr(
        f"`{id_col}`",
        f"min(`{id_col}`) OVER (PARTITION BY band, band_key) AS hub",
    )
    return (
        hub.where(f"`{id_col}` != hub")
        .selectExpr("hub AS doc_a", f"`{id_col}` AS doc_b")
        .distinct()
    )


def cc_fused(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 15,
) -> DataFrame:
    """Self-loop-fused round (1 join + 1 agg per round, old label from
    the self-loop) + probe schedule [1, 2, 2, ...]."""
    half = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    spark = pairs.sparkSession
    n_part = int(str(spark.conf.get("spark.sql.shuffle.partitions", "32")))
    u = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    edges = (
        u.unionByName(u.select("src", F.col("src").alias("dst")))
        .distinct()
        .repartition(n_part, F.col("dst"))
        .localCheckpoint(eager=False)
    )
    labels = edges.groupBy(F.col("src").alias("node")).agg(
        F.min("dst").alias("label")
    )
    rounds_left = max_iterations
    batch = 1
    converged = False
    while rounds_left > 0:
        k = min(batch, rounds_left)
        new_labels = labels
        for _ in range(k):
            new_labels = (
                edges.join(new_labels, edges["dst"] == new_labels["node"])
                .groupBy(F.col("src").alias("node"))
                .agg(
                    F.min("label").alias("label"),
                    F.max(
                        F.when(F.col("dst") == F.col("src"), F.col("label"))
                    ).alias("old"),
                )
                .localCheckpoint(eager=False)
            )
        changed = new_labels.filter(F.col("label") != F.col("old")).count()
        labels = new_labels.drop("old")
        rounds_left -= k
        batch = 2
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError("cc_fused did not converge")
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    from world_cup_duckdb_spark.operators.dedup import (
        connected_components,
        lsh_star_edges,
        minhash_bands,
        with_recrawl,
    )
    from world_cup_duckdb_spark.queries import (
        release_tracked_persists,
        tracked_persist,
    )
    from world_cup_duckdb_spark.session import get_spark
    from world_cup_duckdb_spark.sources.catalog import load_tables, warm_cache

    spark = get_spark(
        "wcdbs-ab-cc",
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

    variants = {
        "A_baseline": lambda bands: connected_components(
            lsh_star_edges(bands)
        ),
        "B_win+fused": lambda bands: cc_fused(star_edges_window(bands)),
        "B1_win_only": lambda bands: connected_components(
            star_edges_window(bands)
        ),
        "B2_fused_only": lambda bands: cc_fused(lsh_star_edges(bands)),
    }

    def once(fn) -> float:
        release_tracked_persists()
        d = load_tables(spark, SF_DIR)["documents"]
        corpus = with_recrawl(d.select("doc_id", "text"))
        bands = minhash_bands(corpus, num_hashes=8, band_size=2).transform(
            tracked_persist
        )
        t0 = time.perf_counter()
        clusters = fn(bands)
        clusters.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Equality check first: every variant must produce identical rows.
    rows = {}
    for name, fn in variants.items():
        release_tracked_persists()
        d = load_tables(spark, SF_DIR)["documents"]
        corpus = with_recrawl(d.select("doc_id", "text"))
        bands = minhash_bands(corpus, num_hashes=8, band_size=2).transform(
            tracked_persist
        )
        rows[name] = sorted(tuple(r) for r in fn(bands).collect())
    ok = all(rows[n] == rows["A_baseline"] for n in variants)
    print(f"row equality across variants: {ok} "
          f"({len(rows['A_baseline'])} rows)")
    if not ok:
        for n in variants:
            print(n, len(rows[n]), rows[n][:3])
        sys.exit(1)

    # Warm-up draw each, then interleaved reps.
    for name, fn in variants.items():
        once(fn)
    times: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(reps):
        for name, fn in variants.items():
            times[name].append(once(fn))
    print(f"== CC A/B at sf0.1, interleaved min of {reps} ==")
    for name in variants:
        runs = sorted(times[name])
        print(f"  {name:16s} min={runs[0]:6.3f}  med={runs[len(runs)//2]:6.3f}"
              f"  all={[round(t, 3) for t in times[name]]}")


# --- round-2 decomposition (appended): schedule vs fused, on window edges
def cc_sched(pairs, a_col="doc_a", b_col="doc_b", max_iterations=15):
    """Baseline round shape (2 joins + agg), batched [1,2,2,...] probes."""
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
    rounds_left = max_iterations
    batch = 1
    converged = False
    while rounds_left > 0:
        k = min(batch, rounds_left)
        new_labels = labels
        for _ in range(k):
            neighbor_min = (
                edges.join(new_labels, edges["dst"] == new_labels["node"])
                .groupBy("src")
                .agg(F.min("label").alias("nlabel"))
            )
            prev = new_labels
            new_labels = (
                prev.join(
                    neighbor_min, prev["node"] == neighbor_min["src"], "left"
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
        labels = new_labels.select("node", "label")
        rounds_left -= k
        batch = 2
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError("cc_sched did not converge")
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def main2() -> None:
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from world_cup_duckdb_spark.operators.dedup import (
        connected_components,
        minhash_bands,
        with_recrawl,
    )
    from world_cup_duckdb_spark.queries import (
        release_tracked_persists,
        tracked_persist,
    )
    from world_cup_duckdb_spark.session import get_spark
    from world_cup_duckdb_spark.sources.catalog import load_tables, warm_cache

    spark = get_spark(
        "wcdbs-ab-cc2",
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

    variants = {
        "W_base": lambda b: connected_components(star_edges_window(b)),
        "W_sched": lambda b: cc_sched(star_edges_window(b)),
        "W_fused": lambda b: cc_fused(star_edges_window(b)),
        "W_base_nopersist": None,  # filled below
    }

    def build_bands(persist: bool):
        release_tracked_persists()
        d = load_tables(spark, SF_DIR)["documents"]
        corpus = with_recrawl(d.select("doc_id", "text"))
        bands = minhash_bands(corpus, num_hashes=8, band_size=2)
        return bands.transform(tracked_persist) if persist else bands

    def once(name) -> float:
        persist = name != "W_base_nopersist"
        fn = variants[name] or (
            lambda b: connected_components(star_edges_window(b))
        )
        bands = build_bands(persist)
        t0 = time.perf_counter()
        fn(bands).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    rows = {}
    for name in variants:
        persist = name != "W_base_nopersist"
        fn = variants[name] or (
            lambda b: connected_components(star_edges_window(b))
        )
        rows[name] = sorted(tuple(r) for r in fn(build_bands(persist)).collect())
    ok = all(rows[n] == rows["W_base"] for n in variants)
    print(f"row equality: {ok} ({len(rows['W_base'])} rows)")
    if not ok:
        sys.exit(1)
    for name in variants:
        once(name)
    times = {n: [] for n in variants}
    for _ in range(reps):
        for name in variants:
            times[name].append(once(name))
    print(f"== CC schedule/fused decomposition, interleaved min of {reps} ==")
    for name in variants:
        runs = sorted(times[name])
        print(f"  {name:18s} min={runs[0]:6.3f}  med={runs[len(runs)//2]:6.3f}"
              f"  all={[round(t, 3) for t in times[name]]}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "phase2":
        main2()
    else:
        main()
