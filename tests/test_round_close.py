"""Mechanical round-close guard for the driver attestation window.

Judge r10 finding #1: NOTES_r10 claimed a CHECK_PRIORITY rotation that
never landed, so the driver burned its 50 attestation slots re-checking
the previous round's exact set while the round's new/changed queries
shipped unattested. These tests make that failure impossible to miss:

1. the spliced CHECK_PRIORITY[:50] must equal the window the rotation
   tool computed (catches "ran the tool, forgot the splice");
2. any registry query with NO attestation in any CORRECTNESS_r*.json
   must sit inside the first-50 window;
3. any query whose live fingerprint (fn source + oracle SQL) drifted
   from tools/attest_manifest.json — i.e. changed since the last
   rotation — must sit inside the first-50 window. Changing a query and
   not re-running tools/rotate_window.py --changed fails the suite.

No Spark session needed; pure registry/file checks.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

from etl_pipeline_spark.queries.base import CHECK_PRIORITY, REGISTRY, all_specs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST = os.path.join(REPO, "tools", "attest_manifest.json")
WINDOW = 50


@pytest.fixture(scope="module")
def registry():
    all_specs()
    return REGISTRY


@pytest.fixture(scope="module")
def manifest():
    with open(MANIFEST) as fh:
        return json.load(fh)


def _attested() -> set[str]:
    names: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        if re.search(r"r(\d+)", os.path.basename(path)):
            names.update(json.load(open(path)))
    return names


def test_window_matches_rotation_manifest(registry, manifest):
    """The spliced first-50 must be exactly what rotate_window computed."""
    assert list(CHECK_PRIORITY[:WINDOW]) == manifest["window"], (
        "CHECK_PRIORITY[:50] in queries/base.py does not match the window "
        "recorded by the last `python tools/rotate_window.py` run — the "
        "rotation was computed but never spliced (or base.py was hand-edited)."
    )


def test_never_attested_queries_inside_window(registry):
    attested = _attested()
    never = [q for q in registry if q not in attested]
    outside = [q for q in never if q not in CHECK_PRIORITY[:WINDOW]]
    assert not outside, (
        f"never-driver-attested queries outside the first-50 window: {outside}; "
        "re-run tools/rotate_window.py"
    )


def test_changed_queries_inside_window(registry, manifest):
    """Implementation drift since the last rotation forces re-rotation."""
    from tools.rotate_window import query_fingerprint

    fps = manifest["fingerprints"]
    unknown = [q for q in registry if q not in fps]
    assert not unknown, (
        f"queries registered after the last rotation: {unknown}; "
        "re-run tools/rotate_window.py --changed <new names>"
    )
    drifted = [
        q for q, spec in registry.items()
        if query_fingerprint(spec) != fps[q] and q not in CHECK_PRIORITY[:WINDOW]
    ]
    assert not drifted, (
        f"queries changed since the last rotation but outside the first-50 "
        f"attestation window: {drifted}; re-run tools/rotate_window.py "
        f"--changed {' '.join(drifted)} and splice the result into base.py"
    )


def test_attestation_drift_inside_window(registry, manifest):
    """Judge r14 finding #1: the rotation-keyed drift check (above) is
    evadable — re-rotating refreshes every fingerprint, so a query
    rewritten in one session and evicted by a later session's rotation
    shipped with the driver's attestation covering only its OLD code.
    This invariant keys off the last DRIVER ATTESTATION instead: any
    query whose live fingerprint differs from the fingerprint it had
    when the driver last attested it (manifest['attested'], harvested
    from each round-close tree in git) must sit inside the first-50
    window, no matter how many rotations happened in between. It stays
    red until the driver re-attests the new code."""
    import glob as _glob

    from tools.rotate_window import query_fingerprint

    attested = manifest.get("attested")
    assert attested, (
        "attest_manifest.json has no 'attested' map — re-run "
        "tools/rotate_window.py (r15+ schema)"
    )
    # the harvest must cover every driver round present in the repo,
    # else the attested map silently goes stale one round after landing
    rounds = [
        int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for p in _glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    ]
    assert manifest.get("attested_through", 0) >= max(rounds), (
        f"attested fingerprints harvested through "
        f"r{manifest.get('attested_through', 0)} but CORRECTNESS_r"
        f"{max(rounds)} exists — re-run tools/rotate_window.py"
    )
    unattested_drift = [
        q for q, spec in registry.items()
        if q in attested and query_fingerprint(spec) != attested[q]
        and q not in CHECK_PRIORITY[:WINDOW]
    ]
    assert not unattested_drift, (
        f"queries changed since their last DRIVER attestation but outside "
        f"the first-50 window: {unattested_drift}; re-run "
        f"tools/rotate_window.py (they are auto-prepended) and splice the "
        f"result into queries/base.py"
    )


def test_approx_family_sf01_sweep_fresh_and_green(registry):
    """r11 judge #4: both knee bugs were invisible at the driver's
    sf0.01 gate and the sf0.1 sweep that caught them was manual. The
    sweep is now a committed artifact (tools/approx_sweep.json, written
    by tools/approx_sweep.py, auto-run by rotate_window when stale);
    this test fails the suite when the artifact is missing, red, or
    STALE — i.e. any approximate-family query changed after its last
    sf0.1 sweep. Pure file/registry check: the sweep itself runs out of
    band, like the rotation tool."""
    from tools.approx_sweep import ARTIFACT, family_queries
    from tools.rotate_window import query_fingerprint

    fam = family_queries()
    assert fam, "approx family selector matched nothing — tags renamed?"
    assert os.path.exists(ARTIFACT), (
        "tools/approx_sweep.json missing — run python tools/approx_sweep.py"
    )
    with open(ARTIFACT) as fh:
        report = json.load(fh)
    assert report["all_ok"], (
        f"approx-family sf0.1 sweep is RED: "
        f"{[q for q, r in report['results'].items() if r['status'] == 'FAIL']}"
    )
    stale = [
        q for q, spec in fam.items()
        if report["results"].get(q, {}).get("fingerprint")
        != query_fingerprint(spec)
    ]
    assert not stale, (
        f"approx-family queries changed after their last sf0.1 sweep: "
        f"{stale}; re-run python tools/approx_sweep.py"
    )
