"""ANN quality tests (operators/similarity.py): IVF probe behavior —
exactness when probing everything, usable recall when probing a fraction.
(Value-level parity for brute force / LSH is covered by the DuckDB oracle
in the parity suite.)"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from world_cup_duckdb_spark.operators.similarity import (
    brute_force_topk,
    ivf_index,
    ivf_topk,
)
from world_cup_duckdb_spark.sources.catalog import table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return table(spark, sf_dir, "embeddings").cache()


def _topk_sets(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_full_probe_equals_brute_force(spark, emb):
    q = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(q, emb, k=5)
    full = ivf_topk(q, emb, k=5, n_lists=8, n_probe=8)
    e = sorted(tuple(r) for r in exact.collect())
    f = sorted(tuple(r) for r in full.collect())
    assert e == f


def test_ivf_partial_probe_recall(spark, emb):
    q = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(brute_force_topk(q, emb, k=5))
    approx = _topk_sets(ivf_topk(q, emb, k=5, n_lists=16, n_probe=4))
    hits = sum(len(exact[qid] & approx.get(qid, set())) for qid in exact)
    total = sum(len(v) for v in exact.values())
    recall = hits / total
    assert recall >= 0.5, f"recall@5 = {recall:.2f}"


def test_ivf_index_partitions_corpus(spark, emb):
    centroids, assigned = ivf_index(emb, n_lists=16)
    n_lists = centroids.count()
    assert n_lists == 16
    # every corpus vector lands in exactly one list
    assert assigned.count() == emb.count()
    lists = assigned.select("list_id").distinct().count()
    assert 1 <= lists <= 16
    # candidate work is a fraction of the corpus per probe on average
    sizes = [r["n"] for r in
             assigned.groupBy("list_id").agg(F.count(F.lit(1)).alias("n")).collect()]
    assert max(sizes) < emb.count()
