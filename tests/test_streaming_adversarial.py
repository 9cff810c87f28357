"""Adversarial inputs through the STREAMING surface (r9 judge #5): the
batch side has a mature adversarial fixture (35 crash classes), but the
micro-batch paths only had clean-input tests. Each test here pins a
class the r10 fuzz pass found or probed: NULL text / NULL keys through
the stateful near-dup buckets, corrupt JSON lines and partial records
through SCD2 and the anomaly monitor, and degenerate text lines through
the CMS maintenance stream."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "green turtles carry small lanterns across a wooden bridge at dusk "
    "and nobody in the village notices the parade passing quietly by"
)
NEAR = BASE.replace("lanterns", "candles")


def _run_neardup(spark, tmp, batches, **kw):
    from etl_pipeline_spark.streaming.neardup import streaming_neardup_flags

    schema = "doc_id long, text string"
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(tmp / "data"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp / "data"))
    )
    flags = streaming_neardup_flags(stream, **kw)
    name = f"t_advnd_{abs(hash(str(tmp))) % 10_000}"
    q = (
        flags.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(name).collect()


def test_neardup_null_text_neither_registers_nor_flags(spark, tmp_path_factory):
    """r10 fuzz find: a NULL text hashed identically to "" through the
    whole signature pipeline, so a missing-content row REGISTERED in
    every band bucket and claimed the genuinely-empty doc as its
    est-1.0 duplicate. NULL text / NULL doc_id rows must pass through
    silently; real near-dups in the same stream still flag."""
    tmp = tmp_path_factory.mktemp("adv_nd_null")
    rows = _run_neardup(
        spark,
        tmp,
        [
            [(1, None), (2, ""), (3, BASE)],     # null registers nothing
            [(4, ""), (None, BASE), (5, NEAR)],  # null id dropped too
        ],
    )
    per_doc = {}
    for r in rows:
        cur = per_doc.get(r["doc_id"])
        if cur is None or r["est_sim"] > cur[1]:
            per_doc[r["doc_id"]] = (r["matched_id"], r["est_sim"])
    # doc 4 ("") flags against doc 2 ("") — identical EMPTY content is a
    # real duplicate; doc 5 flags against 3; nothing involves 1 or None
    assert set(per_doc) == {4, 5}
    assert per_doc[4] == (2, 1.0)
    assert per_doc[5][0] == 3 and per_doc[5][1] >= 0.7


def test_neardup_weird_tokens_survive_and_match(spark, tmp_path_factory):
    """Currency/punctuation/unicode tokens and a pathological long
    repeat must flow through the stateful buckets without killing the
    query, and exact weird-text copies must still match at 1.0."""
    weird = "$123k revenue über café 50% 😀  nbsp end"
    longrep = ("spam " * 4000).strip()
    tmp = tmp_path_factory.mktemp("adv_nd_weird")
    rows = _run_neardup(
        spark,
        tmp,
        [[(10, weird), (11, longrep)], [(12, weird)]],
    )
    per_doc = {r["doc_id"]: (r["matched_id"], r["est_sim"]) for r in rows}
    assert set(per_doc) == {12}
    assert per_doc[12] == (10, 1.0)


def test_scd2_stream_drops_malformed_rows(spark, tmp_path):
    """r10 fuzz find: corrupt feed lines (all-null rows) and partial
    records (null user_id or null ts) were folded into the dimension —
    NULL-keyed rows and NULL-valid_from intervals that break the
    interval invariant. The fold must keep exactly the valid changes."""
    from etl_pipeline_spark.streaming.scd2 import (
        DIM_SCHEMA,
        _read_latest,
        start_scd2_maintenance,
    )

    inp = tmp_path / "chg"
    os.makedirs(inp)
    with open(inp / "b1.json", "w") as fh:
        fh.write(json.dumps({"user_id": 1, "ts": "2024-01-01 10:00:00", "value": 1.0}) + "\n")
        fh.write("THIS IS NOT JSON AT ALL\n")
        fh.write(json.dumps({"user_id": None, "ts": "2024-01-02 10:00:00", "value": 2.0}) + "\n")
        fh.write(json.dumps({"user_id": 2, "ts": None, "value": 3.0}) + "\n")
        fh.write(json.dumps({"user_id": 2, "ts": "2024-01-03 10:00:00", "value": 4.0}) + "\n")
    q = start_scd2_maintenance(
        spark, str(inp), str(tmp_path / "dim"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    rows = _read_latest(spark, str(tmp_path / "dim"), DIM_SCHEMA).collect()
    got = sorted((r.user_id, str(r.valid_from), r.value, r.is_current) for r in rows)
    assert got == [
        (1, "2024-01-01 10:00:00", 1.0, True),
        (2, "2024-01-03 10:00:00", 4.0, True),
    ]


def test_anomaly_stream_corrupt_burst_no_phantom_alert(spark, tmp_path):
    """r10 fuzz find: a burst of corrupt lines accumulated in a
    NULL-(date, type) cell with expected 0, firing a phantom NULL-keyed
    alert. Garbage must be unscored; real volume-drop alerts still fire."""
    from etl_pipeline_spark.streaming.anomaly import (
        read_alerts,
        seasonal_baseline,
        start_anomaly_alerts,
    )

    hist = spark.createDataFrame(
        [(i, "2024-01-01 10:00:00", 1, "click", 1.0) for i in range(48)],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).selectExpr(
        "event_id", "cast(ts as timestamp) ts", "user_id", "event_type", "value"
    )
    base = seasonal_baseline(hist)
    inp = tmp_path / "ev"
    os.makedirs(inp)
    with open(inp / "e1.json", "w") as fh:
        fh.write(
            json.dumps(
                {
                    "event_id": 1,
                    "ts": "2024-01-02 10:00:00",
                    "user_id": 5,
                    "event_type": "click",
                    "value": 2.0,
                }
            )
            + "\n"
        )
        for i in range(200):  # the burst that used to alert on NULL keys
            fh.write(f"GARBAGE LINE {i}\n")
        fh.write(
            json.dumps(
                {"event_id": 2, "ts": None, "user_id": 5, "event_type": "click", "value": 2.0}
            )
            + "\n"
        )
    q = start_anomaly_alerts(
        spark, str(inp), base, str(tmp_path / "alerts"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    alerts = read_alerts(spark, str(tmp_path / "alerts")).collect()
    assert all(r.event_date is not None and r.event_type is not None for r in alerts)
    # the real signal survives: 1 observed vs 48 expected at hour 10
    drop = [r for r in alerts if r.hour_of_day == 10 and r.n_observed == 1]
    assert len(drop) == 1 and drop[0].z_poisson < -3


def test_cms_stream_degenerate_lines_match_batch_recompute(spark, tmp_path):
    """Whitespace-only, unicode, and very long lines through the CMS
    maintenance stream: the merged counter grid must equal the batch
    cms_increments over the same surviving words."""
    from etl_pipeline_spark.operators.cms import cms_increments
    from etl_pipeline_spark.streaming.sketches import (
        read_cms_counters,
        start_cms_maintenance,
    )

    inp = tmp_path / "txt"
    os.makedirs(inp)
    lines = [
        "hello world hello",
        "   ",
        "",
        "über über café",
        "x " * 5000,
    ]
    with open(inp / "a.txt", "w") as fh:
        fh.write("\n".join(lines))
    q = start_cms_maintenance(
        spark, str(inp), str(tmp_path / "state"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = {
        (r.d, r.pos): r.counter
        for r in read_cms_counters(spark, str(tmp_path / "state")).collect()
    }
    words = (
        spark.read.text(str(inp))
        .select(F.explode(F.split(F.col("value"), " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    want = {(r.d, r.pos): r.counter for r in cms_increments(words).collect()}
    assert got == want and len(got) > 0


def test_windowed_aggs_ignore_corrupt_and_null_ts_rows(spark, tmp_path):
    """Corrupt JSONL lines parse to all-null rows (null event-time); the
    windowed aggregations must neither crash (a null event-time in a
    watermark pipeline) nor emit a NULL-window group — only real
    arrivals are counted."""
    from etl_pipeline_spark.streaming.windows import tumbling_counts

    inp = tmp_path / "ev"
    os.makedirs(inp)
    with open(inp / "e.json", "w") as fh:
        fh.write(json.dumps({"ts": "2024-01-01 10:05:00", "user_id": 1, "event_type": "click", "value": 1.0}) + "\n")
        fh.write(json.dumps({"ts": "2024-01-01 10:20:00", "user_id": 2, "event_type": "click", "value": 2.0}) + "\n")
        for i in range(50):
            fh.write(f"GARBAGE {i}\n")
        fh.write(json.dumps({"ts": None, "user_id": 3, "event_type": "view", "value": 9.0}) + "\n")
    stream = spark.readStream.schema(
        "ts timestamp, user_id long, event_type string, value double"
    ).json(str(inp))
    q = (
        tumbling_counts(stream)
        .writeStream.format("memory")
        .queryName("t_adv_win")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("t_adv_win").collect()
    assert all(r.window_start is not None for r in rows)
    got = {(str(r.window_start), r.event_type): (r.n_events, r.sum_value) for r in rows}
    assert got == {("2024-01-01 10:00:00", "click"): (2, 3.0)}


def test_idempotent_writer_rebuilt_checkpoint_batch_not_dropped(spark, tmp_path):
    """r10 review (the SCD2 class, found again in the idempotent batch
    writer): after a checkpoint rebuild, batch ids restart at 0 and the
    new batch 0 bundles NEW rows with replayed ones — the old
    _SUCCESS-only fast path silently dropped the whole batch. The
    fingerprint-qualified skip must rewrite on content mismatch and
    still skip a true (identical) replay."""
    from etl_pipeline_spark.streaming.ingest import idempotent_batch_writer

    out = str(tmp_path / "out")
    process = idempotent_batch_writer(out)
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    process(df1, 0)
    assert spark.read.parquet(out).count() == 2
    # true crash replay: identical content, same id -> skipped (the
    # directory's file set is not rewritten)
    import os

    files_before = sorted(os.listdir(out + "/batch_id=0"))
    process(df1, 0)
    assert sorted(os.listdir(out + "/batch_id=0")) == files_before
    # rebuilt checkpoint: batch 0 re-delivered WITH new rows -> rewritten
    df2 = df1.unionByName(
        spark.createDataFrame([(3, "c")], "id long, v string")
    )
    process(df2, 0)
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]


def test_batch_fingerprint_distinguishes_null_positions(spark):
    """r10 advisor: xxhash64 skips null arguments positionally, so rows
    differing only in WHICH column is null hashed identically — a
    rebuilt batch that moved a value across columns could masquerade as
    a true replay. Nulls are now coalesced to column-tagged sentinels
    before hashing."""
    from etl_pipeline_spark.streaming.util import batch_fingerprint

    a = spark.createDataFrame([("a", None)], "x string, y string")
    b = spark.createDataFrame([(None, "a")], "x string, y string")
    assert batch_fingerprint(a) != batch_fingerprint(b)
    # a genuine replay (same content, different row/partition order)
    # still matches
    c = spark.createDataFrame(
        [("a", None), (None, "b")], "x string, y string"
    ).repartition(4)
    d = spark.createDataFrame(
        [(None, "b"), ("a", None)], "x string, y string"
    ).coalesce(1)
    assert batch_fingerprint(c) == batch_fingerprint(d)
    # and the sentinel cannot collide with the literal string "\x00null:x"
    # appearing as DATA? it CAN by construction — accepted and documented;
    # what must not collide is null vs empty string:
    e = spark.createDataFrame([("", "b")], "x string, y string")
    f = spark.createDataFrame([(None, "b")], "x string, y string")
    assert batch_fingerprint(e) != batch_fingerprint(f)
