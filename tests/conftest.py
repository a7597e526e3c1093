from __future__ import annotations

import os

import pytest

SF_SMOKE = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from world_cup_duckdb_spark import get_spark

    s = get_spark("wcdbs-tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
