#!/usr/bin/env python
"""Registry-wide physical-plan census: per-query operator counts, sorted
by (shuffles + scans) so the heaviest plans surface first.

This is the diagnostic that found the r10 graph-query smell (bounded
intermediates consumed by N branches re-executing the full fact join:
ext_triangles 45 planned scans, ext_pagerank 25, ext_apriori_triples
26 — fixed with tracked_persist cuts). Run it after adding operator
families; eyeball the top of the list for:

- scans >> the number of distinct tables the query reads → a shared
  subplan is re-planned per consumer (persist-cut candidate IF the
  intermediate is bounded; corpus-grain intermediates should stay
  recomputed);
- exch (non-broadcast Exchanges) far above the algorithm's own key
  count → a shuffle multiplied;
- nested (BroadcastNestedLoopJoin) on anything but 1-row/bounded
  broadcast scalars.

CAVEAT: counts come from the formatted plan TEXT. InMemoryTableScan
leaves stop execution, but the text still prints the cached subtree, so
scan counts OVER-COUNT for persisted plans — read `imts` alongside
`scans` before judging a cached query.

Usage:
    python scripts/plan_census.py [--sf-dir DIR] [--top N]
Prints one line per query (top N) plus a JSON file path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--out", default="/tmp/plan_census.json")
    args = ap.parse_args()

    from world_cup_duckdb_spark.queries import REGISTRY
    from world_cup_duckdb_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name in REGISTRY:
        try:
            spark.catalog.clearCache()
            df = REGISTRY[name].fn(spark, args.sf_dir)
            p = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            tree = p.split("\n\n")[0]
            rows.append(
                {
                    "key": name,
                    "exch": tree.count("Exchange")
                    - tree.count("BroadcastExchange"),
                    "bcast": tree.count("BroadcastExchange"),
                    "scans": tree.count("Scan parquet"),
                    "imts": tree.count("InMemoryTableScan"),
                    "windows": tree.count(" Window"),
                    "sorts": tree.count("Sort"),
                    "nested": tree.count("BroadcastNestedLoopJoin"),
                }
            )
        except Exception as ex:  # keep the census total even on breakage
            rows.append({"key": name, "err": str(ex)[:200]})
    rows.sort(key=lambda r: -(r.get("exch", 0) + r.get("scans", 0)))
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=0)
    hdr = f"{'key':40} exch bcast scans imts win sort nlj"
    print(hdr)
    for r in rows[: args.top]:
        if "err" in r:
            print(f"{r['key']:40} ERR {r['err'][:60]}")
            continue
        print(
            f"{r['key']:40} {r['exch']:4} {r['bcast']:5} {r['scans']:5} "
            f"{r['imts']:4} {r['windows']:3} {r['sorts']:4} {r['nested']:3}"
        )
    print(f"full census: {args.out} ({len(rows)} keys)")


if __name__ == "__main__":
    main()
