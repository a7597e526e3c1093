"""Python Data Source API (Spark 4.0, `pyspark.sql.datasource`): the
engine's custom-connector extension point.

The reference's only ingest edge is files (CSV download + cache,
`scripts/build_db.py:33-52`); Spark covers files natively. What Spark 4
adds is user-defined sources in pure Python — the seam where a
proprietary feed (an internal API, a tick stream, a sharded KV export)
becomes a first-class, *partitioned* scan with its own pushdown-free but
fully parallel reader. This module ships a deterministic synthetic-events
source as the reference implementation of the pattern:

- `partitions()` declares the split: each `InputPartition` carries a row
  range, so a 1000-executor cluster reads 1000 disjoint slices with no
  coordination — parallelism is declared by the source, not inferred.
- `read(partition)` is a plain-Python generator per slice; rows stream
  out through Arrow batches (no JVM round-trip per row).
- Determinism: row content is a pure function of the row index, so scans
  are idempotent across retries (a task re-run reproduces its slice
  exactly — the property a distributed source MUST have, since Spark
  retries tasks at will).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: Knuth multiplicative-hash constant — mixes the row index into a
#: pseudo-random but exactly-reproducible value stream.
_MIX = 2654435761


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SyntheticReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        step = (self.n_rows + self.n_parts - 1) // self.n_parts
        return [
            _RangePartition(i * step, min((i + 1) * step, self.n_rows))
            for i in range(self.n_parts)
            if i * step < self.n_rows
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield (i, i % 7, ((i * _MIX) % 1000) / 10.0)


class SyntheticEventsSource(DataSource):
    """`spark.read.format("synthetic_events").option("rows", N)` after
    `spark.dataSource.register(SyntheticEventsSource)`."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "id bigint, grp int, val double"

    def reader(self, schema):
        return _SyntheticReader(self.options)
