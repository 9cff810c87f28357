"""Recall property of the banded MinHash-LSH candidate generator on a
SYNTHETIC controlled-overlap corpus — the fixture oracles pin recall
1.0 empirically, but only at the fixtures' similarity profile; this
builds documents at graded known Jaccard levels and asserts the
recall S-curve the banding math promises (queries/dedup.py:
minhash_docs_and_candidates).

Construction: each base document is WORDS unique tokens (so word
3-gram shingle sets across different bases are disjoint); a near-copy
replaces a contiguous block of tokens with fresh ones, giving a
closed-form shingle-Jaccard that the test computes exactly rather
than assumes. Pairs with exact Jaccard >= 0.7 must ALL be candidates:
at j=0.7 the per-pair miss probability is (1-j^2)^8 ~ 4.5e-3, so 60
planted pairs miss with probability ~0.24 under INDEPENDENT hashing —
but the hash family is fixed and seed-free, so this test is
DETERMINISTIC: it either passes forever or flags a family change
(same epistemics as the exact-recall oracles)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

WORDS = 120
N_BASES = 60


def _doc(base: int, tokens: list[str]) -> str:
    return " ".join(tokens)


def _tokens(base: int, tag: str = "o") -> list[str]:
    return [f"b{base}{tag}w{i}" for i in range(WORDS)]


@pytest.fixture(scope="module")
def synth_sf(tmp_path_factory):
    """A documents.parquet with N_BASES (original, near-copy) pairs at
    graded replacement rates."""
    rows = []
    doc_id = 0
    pairs = []  # (orig_id, copy_id, exact_jaccard)
    for b in range(N_BASES):
        orig = _tokens(b)
        rows.append({"doc_id": doc_id, "text": _doc(b, orig)})
        oid = doc_id
        doc_id += 1
        # replace a block of `k` tokens in the middle with fresh ones
        k = 2 + (b % 12)  # 2..13 replaced tokens
        start = 30
        copy = orig[:start] + [f"b{b}xw{i}" for i in range(k)] + orig[start + k :]
        rows.append({"doc_id": doc_id, "text": _doc(b, copy)})
        # exact word-3-gram Jaccard of the two token sequences: a block
        # replacement of k tokens perturbs k+2 shingles on each side
        n = WORDS - 2  # shingles per doc (all distinct by construction)
        inter = n - (k + 2)
        j = inter / (2 * n - inter)
        pairs.append((oid, doc_id, j))
        doc_id += 1
    d = tmp_path_factory.mktemp("synth_sf")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
                "text": pa.array([r["text"] for r in rows]),
                "lang": pa.array(["en"] * len(rows)),
                "source": pa.array(["synth"] * len(rows)),
                "n_chars": pa.array([len(r["text"]) for r in rows], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d), pairs


def test_banded_candidates_recall_known_jaccard_pairs(spark, synth_sf):
    from etl_pipeline_spark.queries.dedup import minhash_docs_and_candidates

    sf_dir, pairs = synth_sf
    _, cand = minhash_docs_and_candidates(spark, sf_dir)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in cand.select("doc_a", "doc_b").collect()
    }
    must_recall = [(a, b, j) for a, b, j in pairs if j >= 0.7]
    assert must_recall, "construction error: no high-jaccard pairs planted"
    missed = [(a, b, round(j, 3)) for a, b, j in must_recall if (a, b) not in got]
    assert missed == [], (
        f"banded LSH missed high-jaccard planted pairs {missed} — the "
        "hash family or banding changed; re-derive the S-curve in "
        "minhash_docs_and_candidates"
    )
    # cross-base pairs share no shingles; candidates must stay sparse
    # (no full cross-product blowup from the band join)
    assert len(got) <= len(pairs) * 4


def test_minhash_lsh_query_matches_exact_pairs_on_synth(spark, synth_sf):
    """End-to-end on the synthetic corpus: the candidate+verify query
    must emit exactly the >=0.5-Jaccard planted pairs (its oracle
    contract, exercised off-fixture)."""
    import __spark_entry__ as contract

    sf_dir, pairs = synth_sf
    out = contract.queries()["q_dedup_minhash_lsh"](spark, sf_dir)
    got = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    expected = {(a, b) for a, b, j in pairs if j >= 0.5}
    assert got == expected
