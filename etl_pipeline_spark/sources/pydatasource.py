"""Custom Python data source (Spark 4 ``pyspark.sql.datasource``) —
SURVEY §2.1 extension: the modern way to plug a bespoke feed into Spark
WITHOUT a JVM connector, with real partition-parallel reads. The
reference's equivalent surface is its hand-rolled source adapters
(reference dataflow.py's file readers); here the engine-native extension
point is exercised end to end.

``synthetic_events`` generates a deterministic md5-derived event table:
- every row is a pure function of its global index (no RNG state), so
  any partitioning produces the identical dataset — re-reads, retries,
  and speculative tasks are all safe;
- ``partitions()`` splits the index range, so Spark schedules one task
  per split (real source parallelism, not a single-threaded iterator);
- batch and streaming readers share the generator: the stream emits the
  same rows in index order, micro-batch boundaries tracked by a plain
  integer offset — exactly how a cursor-paged API source behaves.

Scale: a production copy of this class wraps any cursor/offset-paged
system (API, queue, change feed); the determinism contract is what
makes retries idempotent on a 1000-executor cluster.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
SCHEMA = "event_id long, user_id long, event_type string, value double"


def _row(i: int) -> tuple[int, int, str, float]:
    """Row ``i`` of the synthetic feed — pure function of the index."""
    h = hashlib.md5(f"synth#{i}".encode()).hexdigest()
    user = int(h[:4], 16) % 100
    etype = EVENT_TYPES[int(h[4:6], 16) % len(EVENT_TYPES)]
    value = (int(h[6:12], 16) % 50_000) / 100.0
    return i, user, etype, value


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", N)`` after
    ``spark.dataSource.register(SyntheticEventsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)

    def streamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self) -> list[InputPartition]:
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        if partition is None:
            # rows=0 makes partitions() return []; PySpark's worker then
            # substitutes [None] (plan_data_source_read.py) — an empty
            # DataFrame must come back, not an AttributeError (r9 review)
            return
        for i in range(partition.start, partition.end):
            yield _row(i)


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Micro-batch stream over the same generator: the offset is the
    next unread index. ``latestOffset`` always reports the feed cap
    (``max_rows``) so that ``Trigger.AvailableNow`` — which snapshots
    latestOffset once — drains the whole feed; under a normal
    micro-batch trigger the first batch therefore also drains to the
    cap, and ``rows_per_batch`` sizes the *partitions within* a batch,
    not the batch itself. The same index always yields the same row, so
    replaying a batch after a crash reproduces it exactly (the
    source-side half of exactly-once)."""

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rows_per_batch", 50))
        self.max_rows = int(options.get("max_rows", 200))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        # everything up to the feed cap is available; Trigger.AvailableNow
        # reads latestOffset ONCE, so reporting a partial end would
        # silently truncate the drain — chunking happens in partitions()
        return {"index": self.max_rows}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        return [
            _RangePartition(lo, min(lo + self.rows_per_batch, end["index"]))
            for lo in range(start["index"], end["index"], self.rows_per_batch)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)

    def commit(self, end: dict) -> None:
        pass
