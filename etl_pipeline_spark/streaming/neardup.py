"""Streaming NEAR-duplicate detection — dedup-on-ingest for a
continuously-arriving corpus (X2's streaming form; the batch family
lives in queries/dedup.py).

Shape: each document gets a P-permutation MinHash signature over its
word-3-gram shingles (pure Column expressions — no ML fit, so the
operator needs no vocabulary and works on an unbounded stream), the
signature is banded LSH-style, and each (band, band_hash) bucket runs
``applyInPandasWithState``: the state holds the first ``cap``
signatures that landed in the bucket, and an arriving document is
flagged as a near-duplicate when its signature agrees with a stored one
on at least ``threshold`` of the P components (the unbiased MinHash
estimate of Jaccard similarity). First-seen documents register; later
near-copies emit (doc_id, matched_id, est_sim, band) rows.

Scale: the shuffle key is the band hash — uniform by construction, so
state spreads evenly across executors; per-bucket state is capped at
``cap`` signatures (cap * P longs), making total state linear in the
number of DISTINCT buckets touched, never in stream length. Exactly the
keyed-DoFn-with-state design the reference's Beam pipeline uses for
running counts (dataflow_transform.py:75-89), applied to LSH buckets.
For unbounded multi-day runs, ``state_ttl_minutes`` (r12 — wired, not
just named) ages out cold buckets via processing-time timeouts — dedup
then holds within the TTL horizon, the standard trade on an infinite
stream.

Tuning: P=32 permutations in B=16 bands of R=2 rows. A pair colliding
in some band has banded-LSH probability 1-(1-j^R)^B of being a
candidate (j = true Jaccard); the signature-agreement verify then
filters candidates to est >= threshold, so band collisions only GATE
which pairs are compared — they never flag on their own. The gate's
S-curve knee (1/B)^(1/R) must sit comfortably BELOW the verify
threshold or the gate silently eats true pairs: the original 8x4
banding put the knee at 0.595 against the 0.7 default threshold —
an 11 percent gating miss for a pair at exactly j=0.7 (r11
knee-vs-contract sweep, the same defect class as the batch md5
rebanding). 16x2 moves the knee to 0.25: gate miss 2.1e-5 at j=0.7,
at the cost of one extra state row per doc per band (16 buckets/doc
vs 8; per-bucket state is unchanged and still cap-bounded). r12 claws
back half that state growth by carrying signatures in a 31-bit
component domain (SIG_MASK below — identity for the md5 family), and
adds a stored geometry sentinel so a stale checkpoint fails loudly
instead of silently orphaning registered state (r11 advisor #2).
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

NUM_PERM = 32
BANDS = 16
ROWS_PER_BAND = NUM_PERM // BANDS
SHINGLE_WIDTH = 3

# Signature components are carried and stored in a 31-bit domain (r12
# state-cost cut, r11 verdict #6): each component is masked to its low
# 31 bits at the source, so the shuffled payload and the per-bucket
# state hold array<int> instead of array<bigint> — half the bytes per
# registered signature. Semantics: the md5 Carter-Wegman family
# (the batch-parity bridge) is ALREADY sub-2^31 (mod M = 2^31 - 1), so
# the mask is the identity there — flags, est values and the pytest
# parity with q_streaming_neardup_parity are bit-unchanged. For the
# xxhash family the mask adds a 2^-31 per-component false-agreement
# probability (est bias (1-j)*2^-31) and the same 2^-31 extra band
# collisions — collisions only ADD verify candidates; the agreement
# verify still gates every flag. Measured A/B in BASELINE.md r12.
SIG_MASK = (1 << 31) - 1

FLAG_SCHEMA = "doc_id long, matched_id long, est_sim double, band int"
_STATE_SCHEMA = "ids array<bigint>, sigs array<array<int>>, geom int"
# pre-r12 layout, kept ONLY for the equivalence pin + state-size A/B
_WIDE_STATE_SCHEMA = "ids array<bigint>, sigs array<array<bigint>>"

# Geometry sentinel stored in every state row (r11 advisor #2): a
# banding/permutation retune (like r11's silent 8x4 -> 16x2) leaves an
# old checkpoint's state keyed under band hashes the new geometry never
# probes — previously-registered docs silently stopped matching and the
# orphaned rows lived forever. Now a restart against mismatched state
# fails LOUDLY, through two layers: (a) the state SCHEMA changed in r12
# (sigs array<int> + this field), so any pre-r12 checkpoint fails
# Spark's state-schema compatibility validation (or the 3-tuple unpack)
# at restart; (b) any FUTURE retune changes this value, and the first
# bucket read under a stale checkpoint raises with instructions. Derived
# from the constants so no edit can forget to bump it.
_STATE_GEOM = NUM_PERM * 10_000 + BANDS * 100 + ROWS_PER_BAND


def minhash_signature(text: Column, family: str = "xxhash") -> Column:
    """P-permutation MinHash signature (array<bigint>, length NUM_PERM)
    of a text column's distinct word-3-gram shingle set. Permutation p
    is xxhash64(shingle, p) — the seed rides as a second hashed column —
    and the signature component is the min over shingles. Documents with
    fewer than SHINGLE_WIDTH words hash their whole text as a single
    shingle so short records still dedup exactly.

    ``family="md5"`` (r11) swaps in the engine-portable md5
    Carter-Wegman family (operators/minhash.py, 32 components) over the
    SAME shingles — the batch-parity bridge: the streaming operator
    under md5 is pytest-pinned equal to q_streaming_neardup_parity,
    whose DuckDB oracle the driver hashes."""
    from etl_pipeline_spark.operators.minhash import (
        md5_minhash_components,
        xxhash_minhash_components,
    )

    # The token array is BOUND as a lambda variable (one-element array
    # wrapper) instead of repeated as a plain expression: Catalyst
    # inlines a repeated split() into every element_at, making inline
    # shingling O(tokens^2) per doc (measured 3.2 s vs 0.45 s cold on
    # the sf0.01 shingle stream). A lambda variable is evaluated once.
    # This is the pure-Column twin of functions/shingles.py's tokenize-
    # once projection, usable where no projection boundary exists (this
    # function is called inside streaming selects).
    def _shingles(toks: Column) -> Column:
        idx = F.sequence(
            F.lit(0), F.greatest(F.size(toks) - SHINGLE_WIDTH, F.lit(0))
        )
        # try_element_at, NOT element_at: for docs shorter than
        # SHINGLE_WIDTH the idx sequence still emits i=0, and under
        # Spark 4's default ANSI mode element_at past the array end
        # throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT — one short record
        # would fail the whole micro-batch and kill the streaming
        # query. try_element_at returns NULL out of range and
        # concat_ws skips nulls, restoring the documented fallback
        # (whole short text as its single shingle).
        return F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                F.try_element_at(toks, i + 1),
                F.try_element_at(toks, i + 2),
                F.try_element_at(toks, i + 3),
            ),
        )

    shingles = F.array_distinct(
        F.flatten(F.transform(F.array(F.split(text, " ")), _shingles))
    )
    if family == "md5":
        return md5_minhash_components(shingles, NUM_PERM)
    return xxhash_minhash_components(shingles, NUM_PERM)


def band_hashes(sig: Column) -> Column:
    """LSH band keys (array<bigint>, length BANDS): band b hashes the
    b-th R-slice of the signature."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(BANDS - 1)),
        lambda b: F.xxhash64(F.slice(sig, b * ROWS_PER_BAND + 1, ROWS_PER_BAND)),
    )


def process_bucket_rows(
    rows: list[tuple[int, list[int]]],
    ids: list[int],
    sigs: list[list[int]],
    threshold: float,
    cap: int,
    n_perm: int = NUM_PERM,
) -> list[tuple[int, int, float]]:
    """The bucket register/flag induction, shared VERBATIM by the
    streaming state processor and the batch-parity oracle query
    (queries/dedup.py q_streaming_neardup_parity): process ``rows``
    (pre-sorted by doc_id) against the registered ``ids``/``sigs``
    (mutated in place); a doc flags against the EARLIEST registered doc
    with the maximal signature agreement >= threshold, flagged docs do
    not register, unflagged docs register while the bucket is under
    ``cap``. Returns the (doc_id, matched_id, est) flag rows."""
    out: list[tuple[int, int, float]] = []
    for did, sig in rows:
        best_id, best_est = None, 0.0
        for mid, msig in zip(ids, sigs):
            est = sum(a == b for a, b in zip(sig, msig)) / float(n_perm)
            if est >= threshold and est > best_est:
                best_id, best_est = mid, est
        if best_id is not None:
            # x/n_perm with n_perm a power of two is exact in <= 6
            # decimals
            out.append((did, best_id, round(best_est, 6)))
        elif len(ids) < cap:
            ids.append(did)
            sigs.append(sig)
        # bucket at cap: the doc neither registers nor flags here —
        # its other BANDS-1 buckets still get to match it
    return out


def _make_bucket_processor(
    threshold: float,
    cap: int,
    wide_state: bool = False,
    ttl_ms: int | None = None,
):
    def process(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            # cold-bucket expiry (state_ttl_minutes): drop the bucket's
            # registered signatures; a later near-copy of an expired doc
            # re-REGISTERS instead of flagging — the documented horizon
            # trade on an unbounded stream. No output rows here.
            state.remove()
            return
        if state.exists:
            if wide_state:
                ids, sigs = state.get
            else:
                ids, sigs, geom = state.get
                if geom != _STATE_GEOM:
                    raise ValueError(
                        "streaming near-dup state geometry mismatch: "
                        f"checkpoint state carries {geom}, this code is "
                        f"{_STATE_GEOM} (NUM_PERM*10000 + BANDS*100 + "
                        "ROWS_PER_BAND). A banding retune invalidates "
                        "registered state — restart the query from a "
                        "FRESH checkpoint/state directory."
                    )
        else:
            ids, sigs = [], []
        ids = list(ids)
        sigs = [list(s) for s in sigs]
        rows: list[tuple[int, list[int]]] = []
        for pdf in pdfs:
            for did, sig in zip(pdf["doc_id"], pdf["sig"]):
                rows.append((int(did), [int(x) for x in sig]))
        # doc_id order: within a micro-batch the LOWEST id registers
        # first, so batch boundaries never change who matches whom
        rows.sort(key=lambda r: r[0])
        n_before = len(ids)
        out = process_bucket_rows(rows, ids, sigs, threshold, cap)
        if len(ids) != n_before:
            # update only when the bucket actually grew (r9 review): a
            # steady-state bucket otherwise rewrites cap x NUM_PERM longs
            # of unchanged state to the store every micro-batch it
            # appears in — pure checkpoint write amplification
            state.update((ids, sigs) if wide_state else (ids, sigs, _STATE_GEOM))
        if ttl_ms is not None and (state.exists or len(ids) != n_before):
            # refresh the inactivity clock on EVERY touch (not only on
            # growth): a bucket that keeps matching incoming docs is hot
            # and must not expire under it. setTimeoutDuration is per
            # batch — unrefreshed (cold) buckets keep their old deadline
            # and get the hasTimedOut call above once it passes.
            state.setTimeoutDuration(ttl_ms)
        if out:
            yield pd.DataFrame(
                {
                    "doc_id": [o[0] for o in out],
                    "matched_id": [o[1] for o in out],
                    "est_sim": [o[2] for o in out],
                    "band": [int(key[0])] * len(out),
                }
            )

    return process


def streaming_neardup_flags(
    docs: DataFrame,
    threshold: float = 0.7,
    cap: int = 64,
    family: str = "xxhash",
    state_ttl_minutes: float | None = None,
    _wide_state: bool = False,
) -> DataFrame:
    """Streaming near-dup flags for docs(doc_id, text): one output row
    per (band, flagged doc) naming the registered document it collides
    with and the signature-agreement similarity estimate. A document
    flagged in ANY band is a near-duplicate; reduce per doc_id
    downstream (e.g. in foreachBatch: groupBy(doc_id).max(est_sim)) —
    the per-band rows are kept so the sink can audit which band fired.

    ``state_ttl_minutes`` (r12 — previously only NAMED in the module
    docstring) bounds total state on an UNBOUNDED stream: a bucket
    untouched for the TTL is dropped (processing-time timeout), so
    dedup holds exactly within the inactivity horizon — a later
    near-copy of an expired document re-registers instead of flagging,
    the standard trade on an infinite stream. The clock refreshes on
    every bucket touch (match or registration), so hot buckets never
    expire under their traffic. None (default) keeps state forever —
    equivalence with the TTL form inside the horizon is pytest-pinned.

    TTL is for CONTINUOUS triggers (processingTime) only — the
    unbounded-run deployment it exists for. Do NOT combine it with
    Trigger.AvailableNow/Once backfills: a processing-time-timeout
    stateful operator reports "needs another batch" whenever processing
    time advanced (which every batch does), so an availableNow query
    never terminates — it burns batches until externally stopped
    (measured: 83 empty micro-batches in the 120 s it was allowed).
    Bounded backfills don't outlive any sane TTL anyway; leave it None
    there.

    ``_wide_state=True`` runs the pre-r12 layout (unmasked bigint
    signatures in state) — kept ONLY so the compact/wide equivalence
    pin and the state-size A/B can execute both forms; never use it in
    production, and never point it at a compact-form checkpoint (the
    schema guard will refuse)."""
    # malformed-row guard (r10 adversarial fuzz): a NULL text hashes
    # identically to "" end-to-end, so a missing-content row would
    # REGISTER in every bucket and then claim each genuinely-empty doc
    # as its est-1.0 duplicate (and a NULL doc_id would crash the state
    # processor's int()). Missing content is not empty content — such
    # rows pass through unregistered and unflagged, same class as the
    # r9 NULL-text fix in the batch dedup library.
    docs = docs.filter(F.col("text").isNotNull() & F.col("doc_id").isNotNull())
    sig = minhash_signature(F.col("text"), family=family)
    if not _wide_state:
        # 31-bit component domain (see SIG_MASK): identity for the md5
        # family, half the shuffle + state bytes for both. The band
        # keys hash the masked slices, so the compact and wide forms
        # use DIFFERENT bucket keys — they are separate state universes
        # (fresh checkpoint each; the geometry/schema guards above make
        # a mix-up loud, not silent).
        sig = F.transform(sig, lambda x: x.bitwiseAND(F.lit(SIG_MASK)).cast("int"))
    banded = docs.select("doc_id", sig.alias("sig")).select(
        "doc_id", "sig", F.posexplode(band_hashes(F.col("sig"))).alias("band", "bh")
    )
    ttl_ms = (
        int(state_ttl_minutes * 60_000) if state_ttl_minutes is not None else None
    )
    return banded.groupBy("band", "bh").applyInPandasWithState(
        _make_bucket_processor(
            threshold, cap, wide_state=_wide_state, ttl_ms=ttl_ms
        ),
        outputStructType=FLAG_SCHEMA,
        stateStructType=_WIDE_STATE_SCHEMA if _wide_state else _STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
