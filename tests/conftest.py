from __future__ import annotations

import os

import pytest

SF_SMOKE = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

#: Suite tiers (VERDICT r10 item 6). Per-file walls measured 2026-08-16
#: on this box (local[8] test session, serial):
#:   slow tier — the 336-key DuckDB-oracle parity sweep (test_parity,
#:     ~12 min) and the adversarial replication harness (test_scale).
#:   integration tier — multi-minute end-to-end lifecycles:
#:     worldcup DAG 334 s, streaming 138 s, llm_ops 136 s,
#:     similarity 112 s, properties 115 s, determinism 76 s,
#:     dedup_index 70 s, harness 62 s, lakehouse 61 s.
#:   fast tier (everything else) — ~8 min: test_plans (every registry
#:     key's plan pins via one shared cold walk, ~250-300 s),
#:     test_operators 148 s, test_multimodal 19 s,
#:     test_cache_lifecycle 32 s, test_session 2 s.
#: Per-commit gate:  python -m pytest tests/ -m "not slow and not integration" -x -q
#: Pre-push gate:    python -m pytest tests/ -m "not slow" -x -q   (~20 min)
#: Round gate (driver/judge): no -m filter — nothing is deselected by
#: default; marking is purely additive.
_SLOW_FILES = {"test_parity.py", "test_scale.py"}
_INTEGRATION_FILES = {
    "test_worldcup.py",
    "test_streaming.py",
    "test_llm_ops.py",
    "test_similarity.py",
    "test_properties.py",
    "test_determinism.py",
    "test_dedup_index.py",
    "test_harness.py",
    "test_lakehouse.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = os.path.basename(str(item.fspath))
        if base in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)
        elif base in _INTEGRATION_FILES:
            item.add_marker(pytest.mark.integration)


@pytest.fixture(scope="session")
def spark():
    from world_cup_duckdb_spark import get_spark

    s = get_spark("wcdbs-tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
