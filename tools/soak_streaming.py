"""Streaming ingest soak at sf0.1-scale (VERDICT r2 #6): generate a
covid-shaped CSV corpus split into many files, run start_file_ingest end
to end, and prove checkpoint recovery semantics:

  1. throughput: availableNow over the full backlog (>=32 files);
  2. idempotent restart: re-run on the same checkpoint — zero rows
     reprocessed;
  3. incremental restart: add files, re-run — only the new files are
     processed.

Usage: python tools/soak_streaming.py [workdir]
Prints one JSON line with rows/sec and the recovery verdicts.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES = 48
ROWS_PER_FILE = 25_000  # 1.2M rows total ~ sf0.1 scale
DIRTY_EVERY = 97  # one quarantine row per ~97 clean rows


def write_input_files(input_dir: str, n_files: int, start_file: int = 0) -> int:
    os.makedirs(input_dir, exist_ok=True)
    total = 0
    for i in range(start_file, start_file + n_files):
        lines = ["entity,Day,total_confirmed_deaths"]
        for r in range(ROWS_PER_FILE):
            rid = i * ROWS_PER_FILE + r
            if rid % DIRTY_EVERY == 0:
                lines.append(f"entity_{rid % 211},not-a-date,xx")  # quarantine
            else:
                day = f"2021-{(rid % 12) + 1:02d}-{(rid % 28) + 1:02d}"
                lines.append(f"  entity_{rid % 211}:,{day},{rid % 5000}.0")
        with open(os.path.join(input_dir, f"covid_{i:04d}.csv"), "w") as f:
            f.write("\n".join(lines) + "\n")
        total += ROWS_PER_FILE
    return total


def run_ingest(spark, input_dir: str, output_dir: str, checkpoint_dir: str) -> float:
    from etl_pipeline_spark.streaming.ingest import start_file_ingest

    t0 = time.perf_counter()
    q = start_file_ingest(spark, input_dir, output_dir, checkpoint_dir)
    q.awaitTermination()
    return time.perf_counter() - t0


def count_outputs(spark, output_dir: str) -> tuple[int, int, int]:
    def cnt(sub: str) -> int:
        paths = glob.glob(os.path.join(output_dir, sub, "batch_id=*"))
        if not paths:
            return 0
        return spark.read.parquet(os.path.join(output_dir, sub)).count()

    return cnt("main"), cnt("quarantine"), cnt("audit")


def main() -> None:
    from etl_pipeline_spark.session import get_spark

    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/soak_streaming"
    shutil.rmtree(work, ignore_errors=True)
    input_dir = os.path.join(work, "incoming")
    output_dir = os.path.join(work, "out")
    checkpoint = os.path.join(work, "ckpt")

    spark = get_spark("soak-streaming")
    total_rows = write_input_files(input_dir, N_FILES)

    # phase 1: full backlog
    elapsed = run_ingest(spark, input_dir, output_dir, checkpoint)
    main1, quar1, audit1 = count_outputs(spark, output_dir)

    # phase 2: restart on the same checkpoint — nothing reprocessed
    t_restart = run_ingest(spark, input_dir, output_dir, checkpoint)
    main2, quar2, audit2 = count_outputs(spark, output_dir)
    idempotent = (main2, quar2) == (main1, quar1)

    # phase 3: add files, restart — only the delta is processed
    delta_rows = write_input_files(input_dir, 4, start_file=N_FILES)
    t_delta = run_ingest(spark, input_dir, output_dir, checkpoint)
    main3, quar3, audit3 = count_outputs(spark, output_dir)
    incremental = (main3 + quar3) - (main2 + quar2) == delta_rows

    print(
        json.dumps(
            {
                "metric": "streaming_ingest_soak",
                "input_rows": total_rows,
                "n_files": N_FILES,
                "backlog_sec": round(elapsed, 2),
                "rows_per_sec": round(total_rows / elapsed),
                "main_rows": main1,
                "quarantine_rows": quar1,
                "audit_batches": audit1,
                "conservation_ok": main1 + quar1 == total_rows,
                "restart_sec": round(t_restart, 2),
                "restart_reprocessed_nothing": idempotent,
                "delta_files_sec": round(t_delta, 2),
                "delta_only_new_files": incremental,
            }
        )
    )


if __name__ == "__main__":
    main()
