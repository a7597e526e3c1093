"""Differential test: every registry entry with an oracle must match DuckDB
on sf0.001 — the local mirror of the driver's sf0.01 gate."""

from __future__ import annotations

import pytest

from tests.parity import compare, duck_connect
from world_cup_duckdb_spark.queries import REGISTRY


def _oracle_keys():
    return [n for n, q in REGISTRY.items() if q.oracle is not None]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connect(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", _oracle_keys())
def test_parity(name, spark, sf_dir, con):
    q = REGISTRY[name]
    problems = compare(name, q.fn(spark, sf_dir), con, q.oracle)
    assert not problems, "\n".join(problems)


def _rows_only_keys():
    return [n for n, q in REGISTRY.items() if q.oracle is None]


@pytest.mark.parametrize("name", _rows_only_keys() or ["__none__"])
def test_rows_only_runs(name, spark, sf_dir):
    if name == "__none__":
        pytest.skip("all queries have oracles")
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
