"""Interleaved A/B bench: HEAD engine code vs a pinned older checkout,
both driven by HEAD's bench.py (so mt_canary_sec exists on BOTH sides —
the r4 A/B lacked it, which is why the 1.53x driver-bench rise could
not be conclusively attributed to host contention).

Usage:
    git worktree add /tmp/r3code <commit>
    cp bench.py /tmp/r3code/bench.py      # HEAD harness, old engine
    python tools/bench_ab.py [--runs 3] [--old /tmp/r3code]

Runs bench.py (core set only, sf0.1) alternately old,new,old,new,... in
fresh subprocesses (each gets its own JVM), then reports per-side medians
of raw and mt-canary-normalized totals plus per-query normalized deltas.
Interleaving means any slow drift in host load hits both sides equally.
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys

REPO = "/root/repo"


def run_once(cwd: str) -> dict:
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=cwd,
        capture_output=True,
        text=True,
        env={
            **__import__("os").environ,
            "SPARK_GRAFT_BENCH_SETS": "core",
            "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
        },
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3, help="runs per side")
    ap.add_argument("--old", default="/tmp/r3code")
    args = ap.parse_args()

    results: dict[str, list[dict]] = {"old": [], "new": []}
    for i in range(args.runs):
        for side, cwd in (("old", args.old), ("new", REPO)):
            r = run_once(cwd)
            results[side].append(r)
            print(
                f"[{i + 1}/{args.runs}] {side}: value={r['value']} "
                f"mt_canary={r['mt_canary_sec']} "
                f"norm={r['value_per_mt_canary']}",
                flush=True,
            )

    def med(side: str, key: str) -> float:
        return round(statistics.median(r[key] for r in results[side]), 3)

    print("\n=== medians over", args.runs, "interleaved runs/side ===")
    for key in ("value", "mt_canary_sec", "value_per_mt_canary"):
        o, n = med("old", key), med("new", key)
        ratio = round(n / o, 3) if o else float("nan")
        print(f"{key:24s} old={o:8.3f} new={n:8.3f} new/old={ratio}")

    print("\nper-query mt-canary-normalized medians (new/old):")
    qs = results["new"][0]["queries_per_mt_canary"].keys()
    for q in qs:
        o = statistics.median(r["queries_per_mt_canary"][q] for r in results["old"])
        n = statistics.median(r["queries_per_mt_canary"][q] for r in results["new"])
        print(f"  {q:28s} old={o:7.3f} new={n:7.3f} new/old={round(n / o, 3) if o else 'n/a'}")

    out = {
        "runs_per_side": args.runs,
        "old": results["old"],
        "new": results["new"],
    }
    with open("/root/repo/BENCH_AB_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print("\nraw results -> BENCH_AB_r5.json")


if __name__ == "__main__":
    main()
