"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Query set: the flagship scan-agg, the join-heavy TPC-H-style queries,
windows, and one of each extension family (dedup / text / similarity) —
the mix a 100 TB training-data pipeline would run. Expensive quadratic
diagnostics (pairwise jaccard) are excluded by design: their scale path
is MinHash-LSH, benchmarked separately.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q06_revenue_delta",
    "q03_order_revenue_topk",
    "q05_nation_revenue",
    "q_join_outer_order_counts",
    "q_join_semi_big_orders",
    "q_window_rank_orders",
    "q_window_tumbling_events",
    "q_etl_clean_cast_filter",
    "q_dedup_exact",
    "q_text_quality_score",
    "q_knn_bruteforce_cosine",
]

# Second reported group (round 3+): the scale-representative composites.
# Kept OUT of the frozen core set above so round-over-round deltas on
# "value" stay comparable; reported separately as scale_value/scale_queries.
SCALE_QUERIES = [
    "q_dedup_minhash_lsh",
    "q_training_data_prep",
    "q_lm_bigram_score",
    "q_knn_pq",
    # session-5 families: graph wedge join, hashed linear scoring
    "q_triangle_count",
    "q_hashed_linear_score",
    # session-6: iterative integer PageRank over the co-purchase graph
    "q_pagerank",
    # r8 session-2: Gopher repetition rules (map-side n-gram stream)
    "q_text_gopher_repetition",
]


def _canary_sec() -> float:
    """Fixed CPU-bound workload (FNV-mix 10^7 ints, single thread) whose
    wall-clock depends only on host speed — never on Spark plans or data.
    A round-over-round shift in canary_sec explains a uniform shift in
    query times as host noise; a query regression with a flat canary is a
    real plan regression. (Motivated by r3's uniform 1.4x bench shift.)"""
    t0 = time.perf_counter()
    h = 0
    for i in range(10_000_000):
        h = ((h ^ i) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return time.perf_counter() - t0


def _mt_canary_sec(n_threads: int = 8) -> float:
    """Multi-threaded canary: the same FNV mix on n_threads
    subprocesses at once (processes, not threads — the GIL would
    serialize threads and measure nothing). Catches MULTI-CORE host
    contention that leaves the single-thread canary flat — exactly the
    session-6 failure mode where query wall-clock rose 30% while
    canary_sec fell. Compare mt_canary_sec across rounds the same way."""
    import subprocess

    code = (
        "h=0\n"
        "for i in range(10_000_000):\n"
        "    h=((h^i)*1099511628211)&0xFFFFFFFFFFFFFFFF\n"
    )
    t0 = time.perf_counter()
    procs = [
        subprocess.Popen([sys.executable, "-c", code])
        for _ in range(n_threads)
    ]
    for pr in procs:
        pr.wait()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from etl_pipeline_spark.queries.base import all_specs
    from etl_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    specs = all_specs()

    # Warm the JVM + parquet footer caches so timed queries measure query
    # execution, not session startup or first-touch file listing: one
    # trivial action per table the bench set reads.
    from etl_pipeline_spark.catalog import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.limit(1).count()

    def time_set(names: list[str]) -> dict[str, float]:
        timings: dict[str, float] = {}
        for name in names:
            # best-of-two: the first run can absorb one-off JIT/scheduling
            # noise on a shared host; the min is the query's real cost.
            # count() forces full execution without driver-side row transfer.
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                specs[name].fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        return timings

    sets = os.environ.get("SPARK_GRAFT_BENCH_SETS", "all")  # "core" skips scale set
    canary_before = _canary_sec()
    timings = time_set(BENCH_QUERIES)
    scale_timings = time_set(SCALE_QUERIES) if sets != "core" else {}
    # min of before/after: the fastest the host was during this run
    canary = round(min(canary_before, _canary_sec()), 3)
    mt_canary = round(_mt_canary_sec(), 3)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in timings.items()},
                "scale_value": round(sum(scale_timings.values()), 3),
                "scale_queries": {k: round(v, 3) for k, v in scale_timings.items()},
                "canary_sec": canary,
                "mt_canary_sec": mt_canary,
                "value_per_canary": round(total / canary, 3),
                # mt-canary-normalized totals and per-query times: divide
                # by the multi-core canary so cross-round deltas survive
                # host contention (the r4 1.53x "regression" was exactly
                # a contention artifact the single-thread canary missed).
                "value_per_mt_canary": round(total / mt_canary, 3),
                "queries_per_mt_canary": {
                    k: round(v / mt_canary, 3) for k, v in timings.items()
                },
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
