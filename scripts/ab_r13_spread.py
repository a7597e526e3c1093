#!/usr/bin/env python
"""Interleaved A/B (r13): is spread_for_cpu_work's hash repartition
redundant under the bench's warm cache (already sliced to the session
parallelism by warm_cache)?  Variants:

  on   = baseline spread_for_cpu_work
  off  = identity (no repartition)

over ext_dedup_minhash's band+pair path and ext_ann_bruteforce, bench
posture (warm cache, shuffle=8, AQE off). Also prints the probe cost of
the spread decision itself (inputFiles + getsize loop) to size the memo.

Usage: python scripts/ab_r13_spread.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import world_cup_duckdb_spark.operators.dedup as dedup_mod
    import world_cup_duckdb_spark.operators.scale as scale_mod
    import world_cup_duckdb_spark.operators.similarity as sim_mod
    from world_cup_duckdb_spark.queries import REGISTRY, release_tracked_persists
    from world_cup_duckdb_spark.session import get_spark
    from world_cup_duckdb_spark.sources.catalog import load_tables, warm_cache

    spark = get_spark(
        "wcdbs-ab-spread",
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

    real_spread = scale_mod.spread_for_cpu_work
    identity = lambda df, key_col: df  # noqa: E731

    def set_spread(fn) -> None:
        scale_mod.spread_for_cpu_work = fn
        dedup_mod.spread_for_cpu_work = fn

    # Probe cost of the decision itself (memo sizing): time the real
    # function on the narrow corpus select, repeated.
    d = load_tables(spark, SF_DIR)["documents"]
    narrow = dedup_mod.with_recrawl(d.select("doc_id", "text"))
    t0 = time.perf_counter()
    n_probe = 20
    for _ in range(n_probe):
        real_spread(narrow.select("doc_id", "text"), "doc_id")
    print(f"spread decision probe: {(time.perf_counter()-t0)/n_probe*1000:.1f} ms/call")
    # What do the cached inputs actually look like?
    print("narrow rdd partitions:", narrow.rdd.getNumPartitions(),
          "| inputFiles:", len(narrow.inputFiles()),
          "| defaultParallelism:", spark.sparkContext.defaultParallelism)

    queries = ["ext_dedup_minhash", "ext_ann_bruteforce"]

    def once(qname: str) -> float:
        release_tracked_persists()
        t0 = time.perf_counter()
        df = REGISTRY[qname].fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Row equality per query across variants.
    for q in queries:
        release_tracked_persists()
        set_spread(real_spread)
        a = sorted(map(tuple, REGISTRY[q].fn(spark, SF_DIR).collect()))
        release_tracked_persists()
        set_spread(identity)
        b = sorted(map(tuple, REGISTRY[q].fn(spark, SF_DIR).collect()))
        set_spread(real_spread)
        print(f"{q}: rows equal = {a == b} ({len(a)})")
        if a != b:
            sys.exit(1)

    times: dict[tuple, list] = {}
    for q in queries:
        for label, fn in (("on", real_spread), ("off", identity)):
            set_spread(fn)
            once(q)  # warm-up
    for _ in range(reps):
        for q in queries:
            for label, fn in (("on", real_spread), ("off", identity)):
                set_spread(fn)
                times.setdefault((q, label), []).append(once(q))
    set_spread(real_spread)
    print(f"== spread on/off, interleaved min of {reps} ==")
    for (q, label), runs in times.items():
        s = sorted(runs)
        print(f"  {q:22s} {label:3s} min={s[0]:6.3f} med={s[len(s)//2]:6.3f}"
              f" all={[round(t,3) for t in runs]}")


if __name__ == "__main__":
    main()
