"""Shared micro-batch helpers for the streaming sinks."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def batch_fingerprint(df: DataFrame) -> str:
    """Order-independent content hash of a micro-batch: row count plus a
    commutative sum of per-row xxhash64 over every column. Cheap (one
    map-side-combined aggregate) and stable across partitionings — the
    key that distinguishes a TRUE crash replay (same batch id, same
    content) from a rebuilt checkpoint whose batch 0 bundles NEW files
    alongside replayed ones (batch ids restart at 0 on rebuild, so an
    id-only replay guard silently drops the new data — the r10 review
    class fixed in both the SCD2 and idempotent-writer sinks).

    Nulls are disambiguated per column BEFORE hashing (r10 advisor):
    xxhash64 skips null arguments positionally, so ('a', null) and
    (null, 'a') would otherwise hash identically; each null becomes a
    column-tagged sentinel (the NUL prefix cannot collide with real
    cast output). The commutative sum still admits cross-row
    cancellation in principle — accepted: the guard discriminates
    replay-vs-rebuilt batches, not adversarial input."""
    cols = [
        F.coalesce(F.col(c).cast("string"), F.lit(f"\x00null:{c}"))
        for c in df.columns
    ]
    # DECIMAL(38,0) accumulation: summing raw xxhash64 longs overflows
    # BIGINT (ANSI mode raises) after a handful of rows
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return f"{row['n']}:{row['h']}"
