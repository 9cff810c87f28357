"""Behavioral + plan tests for the round-4 additions: containment dedup,
bigram-LM scoring, weighted sampling, Bloom decontamination, PQ-ADC kNN,
and the TF-IDF keyword/sparse-similarity pair. The oracle gate checks
value parity with DuckDB; these tests pin the SEMANTIC invariants the
oracle cannot state (cross-query relationships, plan shapes, identities).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import __spark_entry__ as contract

from etl_pipeline_spark import plans
from etl_pipeline_spark.catalog import load_tables

SF = "/root/testdata/sf0.001"


def _q(name):
    return contract.queries()[name]


# --- containment dedup ----------------------------------------------------


def test_containment_covers_every_jaccard_pair(spark):
    """J(a,b) = n/|A∪B| <= n/|A| = C(a,b), so every symmetric near-dup
    pair must appear in the containment report in BOTH directions."""
    jac = {
        (r.doc_a, r.doc_b)
        for r in _q("q_dedup_ngram_jaccard")(spark, SF).collect()
    }
    cont = {
        (r.contained_doc, r.container_doc)
        for r in _q("q_dedup_containment")(spark, SF).collect()
    }
    for a, b in jac:
        assert (a, b) in cont and (b, a) in cont


def test_containment_values_are_valid_fractions(spark):
    rows = _q("q_dedup_containment")(spark, SF).collect()
    assert rows, "fixture should contain at least one containment pair"
    for r in rows:
        assert 0.5 <= r.containment <= 1.0 + 1e-9
        assert r.n_inter >= 1


# --- bigram LM scoring ----------------------------------------------------


def test_lm_bigram_scores_every_multi_token_doc(spark):
    d = load_tables(spark, SF, ("documents",))["documents"]
    n_scorable = d.filter(
        F.size(F.filter(F.split("text", " "), lambda t: t != "")) >= 2
    ).count()
    out = _q("q_lm_bigram_score")(spark, SF).collect()
    assert len(out) == n_scorable
    for r in out:
        assert r.nll_bits > 0  # smoothed probs are < 1, so -log2 > 0
        # ppl is 2^nll (both rounded independently — allow rounding slack)
        assert abs(r.ppl - 2.0 ** r.nll_bits) <= 0.01 * max(r.ppl, 1.0)


# --- weighted sampling ----------------------------------------------------


def test_weighted_sample_partial_topk_below_shuffle(spark):
    """The per-stratum top-k must compile to WindowGroupLimit (partial
    rank pruning on the map side) — the property that keeps a hot stratum
    from shipping its whole membership through the exchange."""
    df = _q("q_weighted_sample")(spark, SF)
    plan = plans.executed(df)
    assert plan.count("WindowGroupLimit") >= 2  # Partial + Final


def test_weighted_sample_is_deterministic_and_bounded(spark):
    df = _q("q_weighted_sample")(spark, SF)
    first = sorted(map(tuple, df.collect()))
    second = sorted(map(tuple, df.collect()))
    assert first == second
    per_source: dict[str, int] = {}
    for src, _doc, _chars, _prio, rank in first:
        assert 1 <= rank <= 3
        per_source[src] = per_source.get(src, 0) + 1
    assert per_source and all(v <= 3 for v in per_source.values())


# --- Bloom decontamination ------------------------------------------------


def test_bloom_has_no_false_negatives(spark):
    """A Bloom filter can only over-report: every exactly-contaminated doc
    must be flagged, so n_false_positives == n_bloom_flagged - n_exact."""
    rows = _q("q_bloom_decontaminate")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_bloom_flagged >= r.n_exact_contaminated
        assert r.n_false_positives == r.n_bloom_flagged - r.n_exact_contaminated
        assert r.n_train_docs >= r.n_bloom_flagged


# --- PQ-ADC kNN -----------------------------------------------------------


def test_pq_ranks_are_permutations_and_distances_valid(spark):
    rows = _q("q_knn_pq")(spark, SF).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    for q_id, cands in by_q.items():
        k = len(cands)
        assert sorted(c.adc_rank for c in cands) == list(range(1, k + 1))
        assert sorted(c.exact_rank for c in cands) == list(range(1, k + 1))
        for c in cands:
            assert c.adc_d2 >= 0 and c.exact_d2 >= 0
            assert c.neighbor_id != q_id


def test_pq_adc_approximates_exact_distance(spark):
    """ADC uses quantized corpus vectors against exact query subvectors —
    on this fixture the relative gap should be modest in aggregate (the
    codebook has ~10 centroids per subspace)."""
    rows = _q("q_knn_pq")(spark, SF).collect()
    rel = [abs(r.adc_d2 - r.exact_d2) / r.exact_d2 for r in rows if r.exact_d2 > 0]
    assert rel and sum(rel) / len(rel) < 0.75


# --- TF-IDF ---------------------------------------------------------------


def test_tfidf_weights_recompute(spark):
    d = load_tables(spark, SF, ("documents",))["documents"]
    n_docs = d.count()
    rows = _q("q_tfidf_top_terms")(spark, SF).collect()
    assert rows
    for r in rows[:200]:
        expect = round(r.tf * math.log(n_docs / r.df), 4)
        assert abs(r.tfidf - expect) < 1e-9
        assert 1 <= r.rank <= 3


def test_tfidf_nearest_docs_stay_within_source_block(spark):
    d = load_tables(spark, SF, ("documents",))["documents"]
    src = {r.doc_id: r.source for r in d.select("doc_id", "source").collect()}
    rows = _q("q_tfidf_nearest_docs")(spark, SF).collect()
    assert rows
    for r in rows:
        assert src[r.q_doc] == src[r.nn_doc]
        assert -1.0 - 1e-9 <= r.cos_sim <= 1.0 + 1e-9
        assert 1 <= r.rank <= 3
        assert r.q_doc % 20 == 0 and r.q_doc != r.nn_doc


# --- SQL surfaces (LATERAL, recursive CTE) --------------------------------


def test_lateral_decorrelates_to_window_topk(spark):
    df = _q("q_lateral_top_orders")(spark, SF)
    plan = plans.executed(df)
    assert "WindowGroupLimit" in plan and "NestedLoop" not in plan
    rows = df.collect()
    per_cust: dict[int, int] = {}
    for r in rows:
        per_cust[r.c_custkey] = per_cust.get(r.c_custkey, 0) + 1
    assert per_cust and all(v <= 2 for v in per_cust.values())


def test_recursive_spine_is_contiguous(spark):
    rows = sorted(_q("q_recursive_month_spine")(spark, SF).collect(),
                  key=lambda r: r.month_start)
    assert rows
    for a, b in zip(rows, rows[1:]):
        # consecutive first-of-month dates, no gaps
        assert (b.month_start.year - a.month_start.year) * 12 + (
            b.month_start.month - a.month_start.month
        ) == 1
        assert a.month_start.day == 1
    assert all(r.n_orders >= 0 for r in rows)


# --- span corruption ------------------------------------------------------


def test_span_corruption_invariants(spark):
    rows = _q("q_span_corruption_plan")(spark, SF).collect()
    assert rows
    total_masked = sum(r.n_masked for r in rows)
    total_tokens = sum(r.n_tokens for r in rows)
    for r in rows:
        # every contiguous run holds >=1 masked token; chained overlapping
        # starts can merge runs beyond the base span length, so the only
        # hard upper bound is the token count itself
        if r.n_masked > 0:
            assert 1 <= r.n_sentinels <= r.n_masked
        else:
            assert r.n_sentinels == 0
        assert r.n_masked <= r.n_tokens
        assert 0 <= r.mask_ratio <= 1
    # corpus-level realized ratio near the 1/16-start * ~3-len expectation
    assert 0.05 < total_masked / total_tokens < 0.35


def test_simhash_pigeonhole_exactness_on_planted_signatures(spark):
    """r11 knee-vs-contract sweep: 4 equality bands GUARANTEE a candidate
    only for Hamming distance <= 3 (pigeonhole); the old MAX_HAMMING=6
    silently exceeded that and missed fixture truth pairs at d in 4..6
    (1/25 at sf0.01 — both engines agreeing, invisible to the oracle).
    The threshold now equals the guarantee. Planted signatures prove the
    theorem edge: every pair at d <= 3 is emitted REGARDLESS of which
    bits differ, and a d=4 pair whose diffs hit all four bands — the
    exact shape the old contract missed — is excluded by contract."""
    import duckdb

    from etl_pipeline_spark.operators.simhash import (
        BAND_BITS,
        MAX_HAMMING,
        N_BANDS,
        pairs_over_signatures_sql,
    )

    assert MAX_HAMMING == N_BANDS - 1  # the theorem's precondition

    base = 0x2F_5A3C_9E14  # arbitrary 48-bit signature
    rows = [(0, base)]
    # d=1..3 partners: flip d bits spread across DIFFERENT bands (the
    # adversarial placement for small d)
    for d in (1, 2, 3):
        sig = base
        for b in range(d):
            sig ^= 1 << (b * BAND_BITS + 5)
        rows.append((d, sig))
    # d=4 partner with one flipped bit in EVERY band: no band matches
    sig4 = base
    for b in range(4):
        sig4 ^= 1 << (b * BAND_BITS + 7)
    rows.append((4, sig4))

    # Spark side
    spark.createDataFrame(rows, "doc_id long, simhash long").createOrReplaceTempView(
        "planted_sim"
    )
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in spark.sql(pairs_over_signatures_sql("planted_sim", "spark")).collect()
    }
    want_with_base = {(0, 1, 1), (0, 2, 2), (0, 3, 3)}
    assert want_with_base <= got
    assert not any(4 in (a, b) and h > MAX_HAMMING for a, b, h in got)
    assert (0, 4, 4) not in got  # all-bands-touched pair excluded by contract

    # DuckDB twin over the same planted relation: identical rows
    con = duckdb.connect()
    con.execute("CREATE TABLE planted_sim(doc_id BIGINT, simhash BIGINT)")
    con.executemany("INSERT INTO planted_sim VALUES (?, ?)", rows)
    duck = set(
        (a, b, h)
        for a, b, h in con.execute(
            pairs_over_signatures_sql("planted_sim", "duckdb")
        ).fetchall()
    )
    assert duck == got


def test_simhash_recall_exact_on_fixtures(spark):
    """Truth audit on the real fixtures: every document pair within the
    Hamming radius (computed ALL-PAIRS, no banding) is emitted by the
    banded operator at sf0.001 and sf0.01 — the structural-recall claim
    the pigeonhole contract makes, checked empirically where the old
    threshold measurably failed. DuckDB computes both sides (the banded
    SQL is engine-identical by construction; the oracle sweep pins
    Spark==DuckDB on the registered query separately)."""
    import duckdb

    from etl_pipeline_spark.operators.simhash import (
        MAX_HAMMING,
        simhash_pairs_sql,
        simhash_sql,
    )

    for sf in ("sf0.001", "sf0.01"):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('/root/testdata/{sf}/documents.parquet')"
        )
        truth = set(
            (a, b)
            for a, b in con.execute(
                f"""WITH s AS ({simhash_sql('duckdb')})
                SELECT a.doc_id, b.doc_id FROM s a JOIN s b
                ON a.doc_id < b.doc_id
                WHERE bit_count(xor(a.simhash, b.simhash)) <= {MAX_HAMMING}"""
            ).fetchall()
        )
        got = set(
            (a, b) for a, b, _ in con.execute(simhash_pairs_sql("duckdb")).fetchall()
        )
        assert got == truth, (sf, truth - got, got - truth)
        assert truth  # fixture carries in-radius pairs; the test is not vacuous
