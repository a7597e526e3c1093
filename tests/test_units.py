"""Millisecond-scale pure-unit tests (no SparkSession, no I/O).

This file is deliberately OUTSIDE conftest's slow/integration sets so
these run in the per-commit ``-m "not slow and not integration"`` gate
(ADVICE r11: tier marking is per-file, and parking a unit test in an
integration-tier file silently drops it from the fast gate).
"""

from __future__ import annotations

import pytest


def test_local_fs_path_uri_normalization():
    """ADVICE r10 (low): ``file:`` URIs must be parsed, not sliced —
    authority-form URIs previously became ``//host/path`` and silently
    mis-probed. (Moved from test_similarity.py, ADVICE r11 item 5.)"""
    from world_cup_duckdb_spark.operators.similarity import _local_fs_path

    assert _local_fs_path("/tmp/ivf") == "/tmp/ivf"
    assert _local_fs_path("file:/tmp/ivf") == "/tmp/ivf"
    assert _local_fs_path("file:///tmp/ivf") == "/tmp/ivf"
    assert _local_fs_path("file://localhost/tmp/ivf") == "/tmp/ivf"
    with pytest.raises(ValueError, match="authority"):
        _local_fs_path("file://otherhost/tmp/ivf")


def test_remote_path_guards_cover_every_mutating_entry_point():
    """ADVICE r11 (low): every index-mutating entry point must fail a
    remote URI LOUDLY via _require_local_path (the r9 contract), never
    deep inside _read_meta's open() with a misleading
    FileNotFoundError. Pure-Python: the guard fires before any I/O."""
    from world_cup_duckdb_spark.operators import dedup_index as dix

    remote = "s3://bucket/ix"
    for fn, args in [
        (dix.minhash_index_persist, (None, remote)),
        (dix.minhash_index_append, (None, remote, None)),
        (dix.minhash_index_delete, (None, remote, None)),
        (dix.minhash_index_compact, (None, remote)),
        (dix.gram_index_compact, (None, remote)),
    ]:
        with pytest.raises(ValueError, match="local"):
            fn(*args)
