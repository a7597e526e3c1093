#!/usr/bin/env python
"""Recompute Spark/DuckDB pair ratios from two committed bench artifacts
(VERDICT r11 item 7: the ledger's ratios must be recomputable by a
script, not prose arithmetic).

Usage:
    python scripts/pair_ratio.py BENCH_PAIR_r12_spark.json BENCH_ORACLE_r12.json

Prints per-query ratios and the gated subtotals (core-10 = the first
ten headline queries, legacy-16 = headline minus ext_corpus_prep_
pipeline, full-17 = the whole headline set). Box-state labels from both
artifacts are echoed so a reader sees whether the pair is clean."""

from __future__ import annotations

import json
import sys


def main() -> None:
    spark = json.load(open(sys.argv[1]))
    oracle = json.load(open(sys.argv[2]))
    sq, oq = spark["queries"], oracle["queries"]
    shared = [q for q in sq if q in oq]
    print(
        f"spark busy_box={spark.get('busy_box')} load={spark.get('loadavg_before')} | "
        f"oracle busy_box={oracle.get('busy_box')} load={oracle.get('loadavg_before')}"
    )
    for q in shared:
        print(f"{q:34s} {sq[q]:8.3f} {oq[q]:8.3f} {sq[q] / oq[q]:7.2f}x")

    def subtotal(names, label):
        s = sum(sq[q] for q in names)
        o = sum(oq[q] for q in names)
        print(f"{label:34s} {s:8.3f} {o:8.3f} {s / o:7.2f}x")

    subtotal(shared[:10], "core-10")
    subtotal([q for q in shared if q != "ext_corpus_prep_pipeline"], "legacy-16")
    subtotal(shared, "full-17")


if __name__ == "__main__":
    main()
