"""Streaming deduplication: dropDuplicates within a watermark — the
streaming form of exact dedup (X1) for continuously-arriving corpora."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_stream_drop_duplicates(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sdedup")
    df = spark.createDataFrame(
        [
            ("2024-01-01 00:01:00", 1, "alpha"),
            ("2024-01-01 00:02:00", 1, "alpha-dup"),     # same id -> dropped
            ("2024-01-01 00:03:00", 2, "beta"),
            ("2024-01-01 00:04:00", 3, "gamma"),
            ("2024-01-01 00:05:00", 2, "beta-dup"),      # same id -> dropped
        ],
        "ts_s string, doc_id long, text string",
    ).select(F.to_timestamp("ts_s").alias("ts"), "doc_id", "text")
    df.write.parquet(str(d / "data"))
    stream = spark.readStream.schema(df.schema).parquet(str(d / "data"))
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicates(["doc_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_sdedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("t_sdedup").collect()
    # exactly one survivor per key; WITHIN a micro-batch the surviving row
    # is arbitrary (only across batches does state guarantee first-wins),
    # so assert the dedup guarantee, not an ordering the API doesn't make
    assert sorted(r["doc_id"] for r in rows) == [1, 2, 3]
    kept = {r["doc_id"]: r["text"] for r in rows}
    assert kept[1] in ("alpha", "alpha-dup")
    assert kept[2] in ("beta", "beta-dup")
