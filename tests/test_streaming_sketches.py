"""Streaming count-min maintenance: counters equal the batch recompute,
estimates dominate true counts, and restarts only add new files."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_spark.operators.cms import cms_estimate, cms_increments
from etl_pipeline_spark.streaming.sketches import (
    read_cms_counters,
    start_cms_maintenance,
)

DOCS_A = ["spark shuffle join join", "scan filter scan", "join scan"]
DOCS_B = ["filter filter shuffle", "spark spark join"]


def _write(path, docs):
    path.write_text("\n".join(docs) + "\n")


def _grid(df):
    return {(r.d, r.pos): r.counter for r in df.collect()}


def test_cms_stream_matches_batch_and_restarts(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _write(inp / "a.txt", DOCS_A)

    q = start_cms_maintenance(spark, str(inp), state, ckpt)
    q.awaitTermination(120)

    all_words = [w for d in DOCS_A for w in d.split()]
    batch = cms_increments(
        spark.createDataFrame([(w,) for w in all_words], ["word"])
    )
    got = read_cms_counters(spark, state)
    assert _grid(got) == _grid(batch)

    # estimates dominate exact counts (CMS invariant) and are exact for
    # collision-free words
    probes = spark.createDataFrame([(w,) for w in set(all_words)], ["word"])
    est = {r.word: r.cms_est for r in cms_estimate(got, probes).collect()}
    from collections import Counter

    exact = Counter(all_words)
    for w, c in exact.items():
        assert est[w] >= c, (w, est[w], c)

    # restart with one new file: only the new words are added
    _write(inp / "b.txt", DOCS_B)
    q2 = start_cms_maintenance(spark, str(inp), state, ckpt)
    q2.awaitTermination(120)
    merged = read_cms_counters(spark, state)
    both = cms_increments(
        spark.createDataFrame(
            [(w,) for d in DOCS_A + DOCS_B for w in d.split()], ["word"]
        )
    )
    assert _grid(merged) == _grid(both)
    # total mass = DEPTH * total word count (each word hits DEPTH slots)
    total = sum(_grid(merged).values())
    n_words = len([w for d in DOCS_A + DOCS_B for w in d.split()])
    assert total == 3 * n_words
