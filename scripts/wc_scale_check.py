#!/usr/bin/env python
"""WC-pipeline scale check: build the full 27-table World-Cup DAG on an
R×-replicated raw corpus with the FACT-scale distributed surrogate key
switched on, and require the complete PK/FK/NOT-NULL validator gate to
pass at both scales.

The raw corpus replicates the way scripts/scale_check.py replicates the
TPC-H-ish fixtures: id-keyed frames grow R× with shifted keys (so PKs
hold and FK pairs shift together), derived dimensions stay bounded —
per-dim-key fan-in grows R×, the adversarial direction. The build runs
with ``distributed_keys=True``, so the event fact's key assignment is
the range-shuffle + Arrow-index + broadcast-offset decomposition, not a
single-task global window (plans/worldcup.py, operators/relational.py).

Usage:
    python scripts/wc_scale_check.py [--replication R] [--reps N]

Prints one JSON line:
    {"metric": "wc_scale_check", "replication": R,
     "base_sec": s, "scaled_sec": s, "growth": x,
     "rows": {"event": {...}, "match": {...}, ...},
     "validator_clean": true}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Fact tables whose row growth must track replication exactly — the
#: evidence that the id-suffix replication scales facts, not dims.
FACT_TABLES = ["event", "match", "team_appearance", "match_player"]


def build_and_validate(spark, raw) -> tuple[float, dict[str, int]]:
    """One timed build+validate pass. Raises if any validator fires —
    a scale check that silently skips the audit would prove nothing."""
    from world_cup_duckdb_spark.plans import build_worldcup, validate_worldcup

    t0 = time.perf_counter()
    tables = build_worldcup(spark, raw, distributed_keys=True)
    violations = validate_worldcup(tables)
    wall = time.perf_counter() - t0
    bad = {k: v for k, v in violations.items() if v}
    if bad:
        raise SystemExit(f"validator violations at scale: {bad}")
    counts = {
        name: tables[name].count() for name in FACT_TABLES if name in tables
    }
    return wall, counts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replication", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from world_cup_duckdb_spark import get_spark
    from world_cup_duckdb_spark.plans.fixtures import (
        raw_fixture,
        replicate_raw,
    )

    spark = get_spark("wcdbs-wc-scale-check")

    # Stage both corpora to parquet and read back: a replicated literal
    # frame is an R-way union of createDataFrame plans, and Catalyst
    # re-analyzes that whole tree inside every one of the 27 table
    # builds — staging collapses each source to one file scan, which is
    # also what a real corpus looks like. Base stages identically so the
    # comparison is data volume, not plan shape.
    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        f"wcscale-{uuid.uuid4().hex[:12]}",
    )

    def staged(rep: int) -> dict:
        d = os.path.join(scratch, f"x{rep}")
        frames = replicate_raw(raw_fixture(spark), rep)
        out = {}
        for name, df in frames.items():
            p = os.path.join(d, name)
            df.write.mode("overwrite").parquet(p)
            out[name] = spark.read.parquet(p)
        return out

    base_times, base_counts = [], {}
    scaled_times, scaled_counts = [], {}
    try:
        raw_base = staged(1)
        for _ in range(args.reps):
            w, base_counts = build_and_validate(spark, raw_base)
            base_times.append(w)
        raw_r = staged(args.replication)
        for _ in range(args.reps):
            w, scaled_counts = build_and_validate(spark, raw_r)
            scaled_times.append(w)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    base_sec, scaled_sec = min(base_times), min(scaled_times)
    report = {
        "metric": "wc_scale_check",
        "replication": args.replication,
        "reps": args.reps,
        "base_sec": round(base_sec, 3),
        "scaled_sec": round(scaled_sec, 3),
        "growth": round(scaled_sec / base_sec, 2) if base_sec else None,
        "rows": {
            n: {"base": base_counts.get(n), "scaled": scaled_counts.get(n)}
            for n in FACT_TABLES
            if n in base_counts
        },
        "validator_clean": True,
    }
    print(json.dumps(report))
    for n, rc in report["rows"].items():
        if rc["base"] and rc["scaled"] != rc["base"] * args.replication:
            print(
                f"WARNING: {n} rows {rc['scaled']} != "
                f"{rc['base']}x{args.replication} — replication not linear",
                file=sys.stderr,
            )
    if report["growth"] and report["growth"] > args.replication:
        print(
            f"WARNING: wall growth {report['growth']}x exceeds data growth",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
