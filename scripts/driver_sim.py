"""Driver-faithful correctness simulation.

Replicates the ROUND DRIVER's comparison pipeline — not tests/parity.py's
string canonicalization. The difference matters: the driver materializes
both results as pandas frames and canonicalizes with
``DataFrame.sort_values`` over every column, which *raises* on unhashable
cells (``TypeError: unhashable type: 'list'`` — see CORRECTNESS_r03
ext_feature_hash / ext_mm_features). The r3 simulator stringified values
first and therefore passed queries the driver then failed. This harness
keeps the driver's failure modes:

  1. pandas sort_values over all columns (object columns go through
     Categorical factorize -> unhashable cells crash, exactly like the
     driver's _canon);
  2. exact value equality after a minimal scalar canon (Decimal->str,
     datetime->isoformat, float->repr) applied AFTER the sort.

Usage:
    python scripts/driver_sim.py [--sf-dir DIR] [--head N] [key ...]

With no keys, runs the full registry in driver order (queries() order);
--head N limits to the first N keys of that order (the driver's per-round
sampling window is ~50). Prints one status line per key and a JSON summary.
"""

from __future__ import annotations

import argparse
import json
import sys
import traceback

sys.path.insert(0, ".")

# The canonicalization lives in tests/parity.py (canon_frame/canon_cell)
# so the pytest parity suite and this simulator share ONE implementation
# of the driver's comparator semantics.
from tests.parity import canon_frame as _canon_frame  # noqa: E402
from tests.parity import duck_connect  # noqa: E402
from world_cup_duckdb_spark.queries import REGISTRY, queries  # noqa: E402
from world_cup_duckdb_spark.session import get_spark  # noqa: E402


def run_one(spark, con, name: str, sf_dir: str) -> dict:
    rec: dict = {
        "rows_match": None, "schema_match": None, "hash_match": None,
        "spark_rows": None, "oracle_rows": None, "err": None,
    }
    try:
        sdf = REGISTRY[name].fn(spark, sf_dir).toPandas()
        oracle = REGISTRY[name].oracle
        if oracle is None:
            rec.update(spark_rows=len(sdf), rows_match=len(sdf) >= 0)
            _canon_frame(sdf)  # still exercise the driver-canon crash path
            return rec
        ddf = con.execute(oracle).df()
        rec["spark_rows"], rec["oracle_rows"] = len(sdf), len(ddf)
        rec["rows_match"] = len(sdf) == len(ddf)
        rec["schema_match"] = sorted(sdf.columns) == sorted(ddf.columns)
        s_rows = _canon_frame(sdf)
        d_rows = _canon_frame(ddf)
        rec["hash_match"] = s_rows == d_rows
        if not rec["hash_match"] and rec["rows_match"] and rec["schema_match"]:
            diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
            rec["err"] = f"value diff (first 3): {diffs}"
    except Exception:
        rec["err"] = traceback.format_exc(limit=3)
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--head", type=int, default=None)
    ap.add_argument(
        "--json-out",
        default=None,
        help="write the per-key records (driver CORRECTNESS format) here",
    )
    ap.add_argument("keys", nargs="*")
    a = ap.parse_args()

    order = list(queries())
    keys = a.keys or order
    if a.head:
        keys = [k for k in order if k in set(keys)][: a.head]

    spark = get_spark()
    con = duck_connect(a.sf_dir)
    results, n_green = {}, 0
    for k in keys:
        rec = run_one(spark, con, k, a.sf_dir)
        results[k] = rec
        ok = rec["err"] is None and rec["hash_match"] in (True, None) and rec["rows_match"]
        n_green += bool(ok)
        status = "GREEN" if ok else "FAIL"
        print(f"{status:5s} {k} rows={rec['spark_rows']}", flush=True)
        if not ok:
            print(f"      {str(rec['err'])[:500]}", flush=True)
    if a.json_out:
        with open(a.json_out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps({"green": n_green, "total": len(keys)}))
    return 0 if n_green == len(keys) else 1


if __name__ == "__main__":
    raise SystemExit(main())
