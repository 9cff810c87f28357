"""S11 move-to-processed: the streaming source archives consumed files
(cleanSource=archive), replacing the reference's copy-to-processed/
delete-original lifecycle (README.md:67,132)."""

from __future__ import annotations

import time

from etl_pipeline_spark.streaming.ingest import start_file_ingest

CSV = "entity,Day,total_confirmed_deaths\nA,2021-01-01,10\n"


def test_archive_after_processing(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("arch")
    inp, out, ckpt, arch = base / "in", base / "out", base / "ckpt", base / "processed"
    inp.mkdir()
    (inp / "f1.csv").write_text(CSV)
    q = start_file_ingest(spark, str(inp), str(out), str(ckpt), archive_dir=str(arch))
    q.awaitTermination(120)
    assert spark.read.parquet(str(out / "main")).count() == 1
    # Spark archives lazily at the START of subsequent micro-batches; run a
    # second (empty) trigger so the cleanup task for batch 0 executes.
    (inp / "f2.csv").write_text(CSV)
    q2 = start_file_ingest(spark, str(inp), str(out), str(ckpt), archive_dir=str(arch))
    q2.awaitTermination(120)
    deadline = time.time() + 30
    archived = []
    while time.time() < deadline:
        archived = list(arch.rglob("f1.csv"))
        if archived:
            break
        time.sleep(1)
    assert archived, f"f1.csv not archived under {arch}"
    assert not (inp / "f1.csv").exists()
