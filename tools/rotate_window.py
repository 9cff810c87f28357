"""Regenerate the CHECK_PRIORITY order for the next driver round.

Policy (r4, VERDICT #6 — the written rule):
  1. queries whose CODE changed this round (passed via --changed) come
     first: the driver must attest the shipped implementation, not a
     prior round's;
  2. then queries with NO driver attestation in any CORRECTNESS_r*.json;
  3. then backfill, oldest latest-attestation first (r1 before r2 before
     r3 ...), so the 50-slot window cycles through all queries in ~N/50
     rounds and every attestation stays fresh;
  4. everything else keeps registration order after the prefix.

Prints the full tuple body for queries/base.py plus a summary of what
landed inside the first-50 window. Run after registering new queries:

    python tools/rotate_window.py --changed q_foo q_bar ...

Also writes tools/attest_manifest.json — a per-query fingerprint
(sha256 of the query function's source + its oracle SQL) snapshotted at
rotation time. tests/test_round_close.py compares live fingerprints
against this manifest: any query whose implementation drifts after
rotation must re-appear in the first-50 window (re-run this tool with
--changed), so NOTES can never claim a rotation that didn't land
(judge r10 finding #1). The fingerprint covers the registered function
body and oracle only — a behavior change made purely in a shared helper
must still be declared via --changed by hand.
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import re
import sys

sys.path.insert(0, "/root/repo")

WINDOW = 50
MANIFEST = "/root/repo/tools/attest_manifest.json"


def query_fingerprint(spec) -> str:
    """sha256 over the query fn's source text + oracle SQL (or '-')."""
    src = inspect.getsource(spec.fn)
    return hashlib.sha256((src + "\x00" + (spec.oracle or "-")).encode()).hexdigest()


def main() -> None:
    changed = []
    if "--changed" in sys.argv:
        changed = sys.argv[sys.argv.index("--changed") + 1 :]

    from etl_pipeline_spark.queries.base import REGISTRY, all_specs

    all_specs()  # trigger registration imports
    names = list(REGISTRY)

    latest: dict[str, int] = {}
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        for q in json.load(open(path)):
            latest[q] = max(latest.get(q, 0), rnd)

    unknown = [q for q in changed if q not in REGISTRY]
    if unknown:
        raise SystemExit(f"--changed names not registered: {unknown}")

    never = [q for q in names if q not in latest and q not in changed]
    backfill = sorted(
        (q for q in names if q in latest and q not in changed),
        key=lambda q: (latest[q], names.index(q)),
    )
    order = list(dict.fromkeys(changed + never + backfill))

    print(f"# window={WINDOW}; changed={len(changed)} never-attested={len(never)}")
    print("CHECK_PRIORITY: tuple[str, ...] = (")
    for i, q in enumerate(order):
        marker = ""
        if i == 0 and changed:
            marker = "  # --- code changed this round: attest first ---"
        elif i == len(changed) and never:
            marker = "  # --- never driver-attested ---"
        elif i == len(changed) + len(never):
            marker = "  # --- backfill: oldest attestation first ---"
        elif i == WINDOW:
            marker = "  # ---------------- first-50 window ends above ----------------"
        print(f'    "{q}",{marker}')
    print(")")
    in_window = order[:WINDOW]
    print(f"\n# first-50 window: {len(in_window)} entries; "
          f"oldest-attested in window: r{min((latest.get(q, 99) for q in in_window), default=0)}; "
          f"left out: {len(order) - WINDOW}")

    manifest = {q: query_fingerprint(REGISTRY[q]) for q in names}
    with open(MANIFEST, "w") as fh:
        json.dump({"window": order[:WINDOW], "fingerprints": manifest}, fh, indent=1, sort_keys=True)
    print(f"# wrote {MANIFEST}: {len(manifest)} fingerprints", file=sys.stderr)

    # Round-close path for the approx-family sf0.1 sweep (r11 judge #4):
    # both r11 knee bugs were invisible at sf0.01 and the sweep that
    # caught them was manual. Re-run it here whenever any family query's
    # fingerprint no longer matches the last sweep artifact (or the
    # artifact is missing); tests/test_round_close.py independently
    # fails the suite on a stale/red artifact, so --skip-sweep only
    # defers the run, never dodges it.
    if "--skip-sweep" not in sys.argv:
        import os

        from tools.approx_sweep import ARTIFACT, family_queries, run_sweep

        sf01 = "/root/testdata/sf0.1"
        fam = family_queries()
        stale = []
        try:
            prev = json.load(open(ARTIFACT))["results"]
            stale = [
                q for q, s in fam.items()
                if prev.get(q, {}).get("fingerprint") != query_fingerprint(s)
            ]
        except (OSError, ValueError, KeyError):
            stale = list(fam)
        if not stale:
            print("# approx sweep artifact fresh — not re-run", file=sys.stderr)
        elif not os.path.isdir(sf01):
            print(f"# approx sweep STALE ({len(stale)}) but {sf01} missing — "
                  "run tools/approx_sweep.py where the fixture exists",
                  file=sys.stderr)
        else:
            print(f"# approx sweep stale for {sorted(stale)} — running at sf0.1",
                  file=sys.stderr)
            run_sweep(sf01)


if __name__ == "__main__":
    main()
