"""Streaming SCD2 maintenance: the incrementally-maintained dimension
must equal the batch LEAD-window recompute over the full change history —
including across a stream restart with late-arriving files."""

from __future__ import annotations

import json
import os

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_pipeline_spark.streaming.scd2 import (
    DIM_SCHEMA,
    _read_latest,
    apply_scd2_batch,
    start_scd2_maintenance,
)


def _write_changes(path: str, rows: list[tuple[int, str, float]]) -> None:
    with open(path, "w") as fh:
        for uid, ts, val in rows:
            fh.write(json.dumps({"user_id": uid, "ts": ts, "value": val}) + "\n")


def _ground_truth(spark, all_rows):
    df = spark.createDataFrame(
        [(u, t, v) for u, t, v in all_rows], "user_id BIGINT, ts STRING, value DOUBLE"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    df = df.groupBy("user_id", "ts").agg(F.max("value").alias("value"))
    w = W.partitionBy("user_id").orderBy("ts")
    nxt = F.lead("ts").over(w)
    return df.select(
        "user_id",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        "value",
        nxt.isNull().alias("is_current"),
    )


def _snap(df):
    return sorted(
        (r.user_id, str(r.valid_from), str(r.valid_to), r.value, r.is_current)
        for r in df.collect()
    )


def test_streaming_scd2_equals_batch_recompute(spark, tmp_path):
    inp = tmp_path / "changes"
    dim = tmp_path / "dim"
    ckpt = tmp_path / "ckpt"
    for p in (inp, dim):
        os.makedirs(p, exist_ok=True)

    batch1 = [
        (1, "2024-01-01 10:00:00", 10.0),
        (1, "2024-01-03 10:00:00", 12.0),
        (2, "2024-01-02 09:00:00", 5.0),
    ]
    _write_changes(str(inp / "b1.json"), batch1)
    q = start_scd2_maintenance(spark, str(inp), str(dim), str(ckpt))
    q.awaitTermination(120)

    got = _read_latest(spark, str(dim), DIM_SCHEMA)
    assert _snap(got) == _snap(_ground_truth(spark, batch1))
    # user 1 has one closed and one open version
    u1 = {r.is_current for r in got.filter("user_id = 1").collect()}
    assert u1 == {True, False}

    # late batch touches user 1 (re-opens its history) and adds user 3;
    # the stream restarts from its checkpoint — only the new file runs
    batch2 = [
        (1, "2024-01-05 08:00:00", 20.0),
        (3, "2024-01-04 12:00:00", 7.0),
    ]
    _write_changes(str(inp / "b2.json"), batch2)
    q2 = start_scd2_maintenance(spark, str(inp), str(dim), str(ckpt))
    q2.awaitTermination(120)

    got2 = _read_latest(spark, str(dim), DIM_SCHEMA)
    assert _snap(got2) == _snap(_ground_truth(spark, batch1 + batch2))
    # untouched user 2 carried over verbatim; user 1 now has 3 versions
    assert got2.filter("user_id = 2").count() == 1
    assert got2.filter("user_id = 1").count() == 3
    assert got2.filter("user_id = 1 AND is_current").count() == 1


def test_scd2_batch_replay_is_idempotent(spark):
    """Replaying the same batch against the pre-batch snapshot yields the
    identical table — the property the crash-replay path relies on."""
    empty = spark.createDataFrame([], DIM_SCHEMA)
    batch = spark.createDataFrame(
        [(1, "2024-02-01 00:00:00", 1.0), (1, "2024-02-02 00:00:00", 2.0)],
        "user_id BIGINT, ts STRING, value DOUBLE",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    once = apply_scd2_batch(spark, empty, batch)
    twice = apply_scd2_batch(spark, empty, batch)
    assert _snap(once) == _snap(twice)
    # and folding a duplicate change stream collapses deterministically
    dup = batch.unionByName(batch)
    assert _snap(apply_scd2_batch(spark, empty, dup)) == _snap(once)


def test_scd2_late_change_older_than_open_row(spark):
    """r9 review find: a change OLDER than the key's open row must split
    the correct historical interval, not overlap it. The old
    open-row-only fold kept the closed [t1,t3) row verbatim while
    re-deriving [t2,t3) — two rows valid over [t2,t3)."""
    base = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-03 00:00:00", 3.0),
    ]
    dim = apply_scd2_batch(
        spark, spark.createDataFrame([], DIM_SCHEMA), _df(spark, base)
    )
    late = [(1, "2024-01-02 00:00:00", 2.0)]
    out = apply_scd2_batch(spark, dim, _df(spark, late))
    assert _snap(out) == _snap(_ground_truth(spark, base + late))
    # no overlapping validity: each row's valid_to equals the next's valid_from
    rows = sorted(out.collect(), key=lambda r: r.valid_from)
    for a, b in zip(rows, rows[1:]):
        assert str(a.valid_to) == str(b.valid_from)


def test_scd2_change_at_open_row_boundary_is_deterministic(spark):
    """r9 review find: a change whose ts EQUALS the open row's
    valid_from must resolve by the documented max-value rule (and never
    emit a zero-length interval), not by window tie order."""
    base = [(7, "2024-01-01 00:00:00", 5.0)]
    dim = apply_scd2_batch(
        spark, spark.createDataFrame([], DIM_SCHEMA), _df(spark, base)
    )
    tie = [(7, "2024-01-01 00:00:00", 9.0)]
    for _ in range(3):  # determinism: same result every evaluation
        out = apply_scd2_batch(spark, dim, _df(spark, tie))
        rows = out.collect()
        assert len(rows) == 1
        assert rows[0].value == 9.0 and rows[0].is_current
        assert rows[0].valid_to is None


def test_scd2_replay_after_publish_is_idempotent(spark, tmp_path):
    """r9 review find: a crash AFTER the _LATEST marker move but BEFORE
    the checkpoint commit re-delivers the batch against a snapshot that
    already contains it; the maintenance job must skip it, not fold it
    twice. Simulated by deleting the checkpoint and re-running the
    stream over the same input."""
    inp = tmp_path / "changes"
    dim = tmp_path / "dim"
    ckpt = tmp_path / "ckpt"
    for p in (inp, dim):
        os.makedirs(p, exist_ok=True)
    rows = [
        (1, "2024-01-01 10:00:00", 10.0),
        (1, "2024-01-02 10:00:00", 12.0),
    ]
    _write_changes(str(inp / "b1.json"), rows)
    q = start_scd2_maintenance(spark, str(inp), str(dim), str(ckpt))
    q.awaitTermination()
    first = _snap(_read_latest(spark, str(dim), DIM_SCHEMA))
    # crash window simulation: checkpoint lost, marker already moved
    import shutil

    shutil.rmtree(ckpt)
    q = start_scd2_maintenance(spark, str(inp), str(dim), str(ckpt) + "2")
    q.awaitTermination()
    assert _snap(_read_latest(spark, str(dim), DIM_SCHEMA)) == first
    assert first == _snap(_ground_truth(spark, rows))


def test_scd2_rebuilt_checkpoint_with_new_files_is_not_dropped(spark, tmp_path):
    """r10 review find: batch ids restart at 0 when the checkpoint is
    rebuilt, so the rebuilt stream's batch 0 bundles NEW change files
    alongside replayed ones. The old id-only replay guard (done >=
    batch_id) silently dropped that whole batch — data loss. The
    fingerprint-qualified guard must fold it instead."""
    inp = tmp_path / "changes"
    dim = tmp_path / "dim"
    ckpt = tmp_path / "ckpt"
    for p in (inp, dim):
        os.makedirs(p, exist_ok=True)
    batch1 = [
        (1, "2024-01-01 10:00:00", 10.0),
        (2, "2024-01-02 09:00:00", 5.0),
    ]
    _write_changes(str(inp / "b1.json"), batch1)
    q = start_scd2_maintenance(spark, str(inp), str(dim), str(ckpt))
    q.awaitTermination()
    # checkpoint rebuilt from scratch + a NEW file arrives: the restarted
    # stream's batch 0 contains b1.json AND b2.json
    import shutil

    shutil.rmtree(ckpt)
    batch2 = [
        (1, "2024-01-05 08:00:00", 20.0),
        (3, "2024-01-04 12:00:00", 7.0),
    ]
    _write_changes(str(inp / "b2.json"), batch2)
    q = start_scd2_maintenance(spark, str(inp), str(dim), str(ckpt))
    q.awaitTermination()
    got = _snap(_read_latest(spark, str(dim), DIM_SCHEMA))
    assert got == _snap(_ground_truth(spark, batch1 + batch2))


def _df(spark, rows):
    return spark.createDataFrame(
        [(u, t, v) for u, t, v in rows], "user_id BIGINT, ts STRING, value DOUBLE"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
