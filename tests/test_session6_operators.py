"""Semantics invariants for the session-6 operators, beyond the DuckDB
oracle: conservation laws, closed-form-vs-sequential equivalence, and
structural properties at sf0.001."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

import __spark_entry__ as contract
from etl_pipeline_spark.catalog import load_tables

SF = "/root/testdata/sf0.001"


def test_gaps_islands_conserves_active_days(spark):
    e = load_tables(spark, SF, ("events",))["events"]
    n_days = (
        e.select("user_id", F.to_date("ts").alias("d")).distinct().count()
    )
    rows = contract.queries()["q_gaps_islands"](spark, SF).collect()
    assert sum(r.n_active_days for r in rows) == n_days
    for r in rows:
        assert r.longest_streak <= r.n_active_days
        assert r.n_islands >= 1


def test_pagerank_mass_approximately_conserved(spark):
    """Integer truncation only ever drops mass, bounded by one unit per
    truncating div — summed over the FULL rank vector (pagerank_ranks,
    the un-limited core behind q_pagerank), total rank stays within the
    loss envelope of the initial 1e12 mass: < n units at init, then per
    iteration < one unit per directed edge (the r div od split) plus
    ~3 per node (the two damping divisions and the PR_SCALE div n)."""
    from etl_pipeline_spark.queries.analytics_ml import (
        PR_ITERS,
        PR_SCALE,
        pagerank_ranks,
    )

    li = load_tables(spark, SF, ("lineitem",))["lineitem"]
    full = pagerank_ranks(li).agg(
        F.count("*").alias("n_nodes"),
        F.sum("degree").alias("n_edges_directed"),
        F.sum("rank_scaled").alias("total_mass"),
    ).collect()[0]
    envelope = full.n_nodes + PR_ITERS * (full.n_edges_directed + 3 * full.n_nodes)
    assert full.total_mass <= PR_SCALE
    assert full.total_mass >= PR_SCALE - envelope

    rows = contract.queries()["q_pagerank"](spark, SF).collect()
    assert len(rows) == 20
    assert all(r.rank_scaled > 0 for r in rows)
    ranks = [r.rank_scaled for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_equidepth_bins_partition_orders(spark):
    o = load_tables(spark, SF, ("orders",))["orders"]
    rows = contract.queries()["q_equidepth_histogram"](spark, SF).collect()
    assert sum(r.n_orders for r in rows) == o.count()
    # equal depth within 1 (NTILE guarantee), contiguous value ranges
    sizes = [r.n_orders for r in rows]
    assert max(sizes) - min(sizes) <= 1
    by_bin = sorted(rows, key=lambda r: r.bin)
    for a, b in zip(by_bin, by_bin[1:]):
        assert a.hi <= b.lo


def test_clamped_balance_matches_sequential_fold(spark):
    """The Lindley closed form must equal the literal sequential
    recurrence b_t = max(0, b_{t-1} + x_t) replayed in Python."""
    e = load_tables(spark, SF, ("events",))["events"]
    tx = (
        e.filter(F.col("event_type").isin("purchase", "view"))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100 + 0.5).cast("long"),
            )
            .otherwise(-F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .alias("delta"),
        )
        .orderBy("user_id", "ts", "event_id")
        .collect()
    )
    state: dict[int, dict] = {}
    for r in tx:
        s = state.setdefault(
            r.user_id, {"bal": 0, "peak": 0, "clamps": 0, "n": 0}
        )
        raw = s["bal"] + r.delta
        if raw < 0:
            s["clamps"] += 1
        s["bal"] = max(0, raw)
        s["peak"] = max(s["peak"], s["bal"])
        s["n"] += 1
    rows = contract.queries()["q_clamped_running_balance"](spark, SF).collect()
    assert len(rows) == len(state)
    for r in rows:
        exp = state[r.user_id]
        assert (r.n_tx, r.final_cents, r.peak_cents, r.n_clamps) == (
            exp["n"],
            exp["bal"],
            exp["peak"],
            exp["clamps"],
        ), r.user_id


def test_lindley_identity_randomized():
    """Property check of the closed form itself: for random walks,
    S_t - min(0, min_prefix S) == the clamped sequential fold."""
    rng = random.Random(7)
    for _ in range(200):
        xs = [rng.randint(-50, 50) for _ in range(rng.randint(1, 40))]
        bal, s, mn = 0, 0, 0
        for x in xs:
            bal = max(0, bal + x)
            s += x
            mn = min(mn, s)
            assert bal == s - min(0, mn)


def test_wordpiece_roundtrip_and_greedy():
    from etl_pipeline_spark.operators.wordpiece import wordpiece

    assert wordpiece("batch") == ["bat", "##ch"]
    assert wordpiece("spark") == ["spark"]
    assert wordpiece("customer") == ["cust", "##omer"]
    # unseen-but-coverable word falls back to single chars after the
    # longest matching prefix
    for word in ("zzz", "sparkle", "joinx"):
        pieces = wordpiece(word)
        assert "".join(p.removeprefix("##") for p in pieces) == word


def test_frame_intensity_matches_synthesis(spark):
    """Every frame of every synthesized video decodes to its known
    constant intensity (ASCII code of the md5-hex char)."""
    from etl_pipeline_spark.operators.multimodal import (
        frame_intensity_stats,
        synthesize_video,
    )

    stats = frame_intensity_stats(synthesize_video(spark, SF))
    docs = load_tables(spark, SF, ("documents",))["documents"]
    expect = docs.select(
        F.col("doc_id").alias("media_id"),
        F.md5("text").alias("hx"),
        (2 + F.col("doc_id") % 5).alias("nf"),
    )
    joined = stats.join(expect, "media_id")
    bad = joined.filter(
        (F.col("n_pixel_bytes") != 96)
        | (
            F.col("mean_milli")
            != F.ascii(
                F.substring(
                    "hx", (F.col("frame_idx") % 32 + 1).cast("int"), 1
                )
            ).cast("long")
            * 1000
        )
    ).count()
    assert bad == 0
    n_frames = stats.groupBy("media_id").count()
    mismatch = n_frames.join(expect, "media_id").filter(
        F.col("count") != F.col("nf")
    ).count()
    assert mismatch == 0


def test_dbscan_classes_partition_points(spark):
    e = load_tables(spark, SF, ("embeddings",))["embeddings"]
    rows = contract.queries()["q_dbscan_classify"](spark, SF).collect()
    assert sum(r.n_points for r in rows) == e.count()
    by_cls = {r.classification: r for r in rows}
    if "core" in by_cls:
        assert by_cls["core"].min_nbrs >= 8
    if "noise" in by_cls:
        assert by_cls["noise"].max_nbrs < 8


def test_survival_monotone_nonincreasing(spark):
    rows = sorted(
        contract.queries()["q_survival_km"](spark, SF).collect(),
        key=lambda r: r.t,
    )
    surv = [r.survival for r in rows]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    assert all(0.0 <= s <= 1.0 for s in surv)
    # risk sets shrink by exactly the events+censored leaving at each t
    for a, b in zip(rows, rows[1:]):
        assert b.n_risk == a.n_risk - a.n_events - a.n_censored


def test_fifo_allocation_conserves_units(spark):
    rows = contract.queries()["q_fifo_allocation"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.matched_units + r.unmatched_units == r.demand_units
        assert 0 <= r.matched_units <= r.supply_units
        assert r.unmatched_units >= 0


def test_revenue_decomposition_identity(spark):
    """q0 * delta == volume_effect_x_q0 + price_effect_x_q0 EXACTLY —
    the integer scaling leaves no unexplained residual."""
    rows = contract.queries()["q_revenue_delta_decomposition"](spark, SF).collect()
    checked = 0
    for r in rows:
        if r.volume_effect_x_q0 is None:
            continue
        assert r.q0 * r.delta_cents == r.volume_effect_x_q0 + r.price_effect_x_q0
        checked += 1
    assert checked > 0


def test_interval_merge_bounds(spark):
    from etl_pipeline_spark.catalog import load_tables
    e = load_tables(spark, SF, ("events",))["events"]
    n_events = e.groupBy("user_id").count().collect()
    by_user = {r.user_id: r["count"] for r in n_events}
    rows = contract.queries()["q_interval_merge"](spark, SF).collect()
    for r in rows:
        assert 1 <= r.n_merged_spans <= by_user[r.user_id]
        # each span covers at least one interval's length
        assert r.covered_ms >= 600_000
        assert r.longest_span_ms <= r.covered_ms


def test_psi_terms_are_nonnegative(spark):
    rows = contract.queries()["q_psi_drift"](spark, SF).collect()
    assert all(r.psi_term >= 0 for r in rows)  # (p-q)ln(p/q) >= 0 always


def test_interval_merge_matches_python_sweep(spark):
    """The window-based merge must equal a literal sweep-line merge of
    each user's [ts, ts+10min) intervals replayed in Python: same span
    count, same covered time, same longest span — per user."""
    from etl_pipeline_spark.queries.analytics_ts import IVM_SPAN_MS

    e = load_tables(spark, SF, ("events",))["events"]
    raw = e.select("user_id", F.unix_millis("ts").alias("s")).collect()
    by_user: dict[int, list[int]] = {}
    for r in raw:
        by_user.setdefault(r.user_id, []).append(r.s)
    want = {}
    for uid, starts in by_user.items():
        spans = []
        for s in sorted(starts):
            e_ms = s + IVM_SPAN_MS
            if spans and s <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], e_ms)
            else:
                spans.append([s, e_ms])
        want[uid] = (
            len(spans),
            sum(b - a for a, b in spans),
            max(b - a for a, b in spans),
        )
    got = {
        r.user_id: (r.n_merged_spans, r.covered_ms, r.longest_span_ms)
        for r in contract.queries()["q_interval_merge"](spark, SF).collect()
    }
    assert got == want


def test_co_occurrence_pairs_match_self_join_and_survive_mega_basket(spark):
    """VERDICT r5 #3: the map-side pair generation must (a) produce the
    exact multiset of counted pairs the order-keyed self-join produces,
    and (b) stream a 10k-item mega-basket without materializing the
    O(basket^2) pair array in one row — the r6 double-explode keeps peak
    per-row memory O(basket), so this passes where the r5 single-explode
    form would allocate one ~50M-struct array."""
    from etl_pipeline_spark.queries.analytics_ml import co_occurrence_pairs

    rng = random.Random(6)
    rows = [
        (o, rng.randrange(200))
        for o in range(120)
        for _ in range(rng.randrange(1, 9))
    ]
    # one mega-basket: 10k distinct items in a single order
    rows += [(99999, p) for p in range(10_000)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")

    # mega-basket pairs are checked by aggregate below; only the small-key
    # slice is collected (the full pair set is ~50M rows — driver-side
    # collection of that would itself be the anti-pattern)
    got = {
        (r.u, r.v, r.cnt)
        for r in co_occurrence_pairs(li, 1)
        .filter((F.col("u") < 200) & (F.col("v") < 200))
        .collect()
    }
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("u"))
    b = items.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("v"))
    want = {
        (r.u, r.v, r.cnt)
        for r in a.join(b, "o")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("cnt"))
        .filter((F.col("u") < 200) & (F.col("v") < 200))
        .collect()
    }
    assert got == want

    # only the mega-basket touches keys >= 200 (u < v, so such a pair has
    # v >= 200): exactly C(10000, 2) - C(200, 2) pairs, each seen once
    mega = (
        co_occurrence_pairs(li, 1)
        .filter(F.col("v") >= 200)
        .agg(F.count("*").alias("n"), F.sum("cnt").alias("s"))
        .collect()[0]
    )
    assert mega.n == 10_000 * 9_999 // 2 - 200 * 199 // 2
    assert mega.s == mega.n  # each mega pair occurs exactly once


def test_pagerank_releases_edge_cache(spark):
    """pagerank_ranks owns its edge cache: the big persisted edge frame
    must be unpersisted before the function returns (ADVICE r7 — without
    this, every invocation leaked an edge-sized cache for the session
    lifetime). Checkpoint blocks of the node-sized result may remain;
    the DataFrame CacheManager must be empty."""
    from etl_pipeline_spark.queries.analytics_ml import pagerank_ranks

    spark.catalog.clearCache()
    li = load_tables(spark, SF, ("lineitem",))["lineitem"]
    out = pagerank_ranks(li)
    assert out.count() > 0
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
