"""Scale-claim regression tests via the plans helpers: pushdown reaches
the scans, dimensions broadcast, top-k compiles to heap selection."""

from __future__ import annotations

import __spark_entry__ as contract

from etl_pipeline_spark import plans

SF = "/root/testdata/sf0.001"


def test_q06_filters_pushed(spark):
    df = contract.queries()["q06_revenue_delta"](spark, SF)
    plans.assert_pushed_filters(df, "l_shipdate", "l_discount", "l_quantity")


def test_q05_broadcasts_dimensions(spark):
    df = contract.queries()["q05_nation_revenue"](spark, SF)
    plans.assert_broadcast_join(df)


def test_topk_is_take_ordered(spark):
    df = contract.queries()["q_topk_expensive_orders"](spark, SF)
    plans.assert_take_ordered(df)


def test_narrow_etl_chain_has_no_shuffle(spark):
    df = contract.queries()["q_etl_clean_cast_filter"](spark, SF)
    plans.assert_no_shuffle(df)


def test_contamination_broadcasts_eval_side(spark):
    """The train/eval n-gram join must broadcast the (small) eval shingle
    set — a shuffle join here would move the full training shingle set."""
    df = contract.queries()["q_contamination_check"](spark, SF)
    plans.assert_broadcast_join(df)


def test_stratified_sample_filter_before_agg(spark):
    """The md5-nibble filter is a narrow map: the only exchange in the
    plan is the final per-lang aggregate (and AQE coalescing), never a
    pre-filter shuffle of the corpus."""
    df = contract.queries()["q_stratified_sample"](spark, SF)
    plan = plans.executed(df)
    assert plan.count("Exchange hashpartitioning") <= 1, plan[:800]


def test_ivf_index_scan_is_partition_pruned(spark, tmp_path_factory):
    """The IVF scale claim as an asserted fact: searching the cell-
    partitioned index reads only probed ``cell=...`` partitions
    (PartitionFilters on cell), and returns exactly what the
    unpartitioned oracle-checked ivf_topk returns."""
    from pyspark.sql import functions as F

    from etl_pipeline_spark.operators.ivf import ivf_topk, ivf_topk_indexed, write_ivf_index

    idx = str(tmp_path_factory.mktemp("ivf") / "index")
    write_ivf_index(spark, SF, idx)
    # the probed-cell scan itself prunes partitions
    cells = [r["cell"] for r in spark.read.parquet(idx).select("cell").distinct().limit(2).collect()]
    pruned_scan = spark.read.parquet(idx).filter(F.col("cell").isin(cells))
    plans.assert_partition_pruned(pruned_scan, "cell")

    got = ivf_topk_indexed(spark, SF, idx)
    plans.assert_partition_pruned(got, "cell")
    want = {tuple(r) for r in ivf_topk(spark, SF).collect()}
    assert {tuple(r) for r in got.collect()} == want


def test_aqe_splits_skewed_join(spark, tmp_path_factory):
    """AQE's runtime skew-join split as an asserted fact (r4, VERDICT #3):
    with broadcast disabled and the skew detector scaled to fixture size,
    a 90%-single-key join plans SortMergeJoin(skew=true) after execution.

    Three conditions are load-bearing (each found empirically; violating
    any one silently disables the split — the exact cases where
    operators/skew.py salting remains necessary):
    - the consumer must aggregate the payload column, else Catalyst
      column-prunes the wide column out of the join and the skew is gone;
    - BOTH join inputs must be plain shuffles: a dim derived via
      .distinct() puts a HashAggregate between Sort and the shuffle
      stage, breaking the SMJ(Sort(Shuffle),Sort(Shuffle)) pattern
      OptimizeSkewedJoin matches — so the dim is written to parquet;
    - the shuffle needs >1 mapper (the split unit is a per-mapper block):
      small-file coalescing (openCostInBytes) must be defeated locally."""
    from pyspark.sql import functions as F

    from etl_pipeline_spark.catalog import load_tables

    base = tmp_path_factory.mktemp("skew")
    d, ddim = str(base / "big"), str(base / "dim")
    ev = load_tables(spark, SF, ("events",))["events"]
    big = (
        ev.crossJoin(spark.range(20).select(F.col("id").alias("rep")))
        .withColumn(
            "skew_key",
            F.when(F.col("event_id") % 10 != 0, F.lit("hot")).otherwise(F.col("event_type")),
        )
        .withColumn(
            "payload",
            F.concat(*[F.md5(F.concat_ws("-", "event_id", "rep", F.lit(j))) for j in range(4)]),
        )
        .select("skew_key", "payload")
    )
    big.repartition(16).write.mode("overwrite").parquet(d)
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.files.maxPartitionBytes",
            "spark.sql.files.openCostInBytes",
        )
    }
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "128k")
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        b = spark.read.parquet(d)
        b.select("skew_key").distinct().withColumn(
            "dim_payload", F.md5("skew_key")
        ).write.mode("overwrite").parquet(ddim)
        dim = spark.read.parquet(ddim)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32k")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        out = b.join(dim, "skew_key").select(
            F.count(F.lit(1)).alias("n"), F.sum(F.length("payload")).alias("bytes")
        )
        n = out.collect()[0]["n"]
        plan = plans.executed(out)
        assert n == b.count()
        assert "skew=true" in plan, "AQE did not split the skewed join:\n" + plan[:1200]
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def test_ivf_probe_guard_semi_join_branch(spark, tmp_path_factory):
    """Above the probe-collect cap the index restriction must stay
    distributed: no driver collect, a semi-join on the partition column
    instead, and identical results to the isin branch."""
    from etl_pipeline_spark.operators.ivf import ivf_topk, ivf_topk_indexed, write_ivf_index

    idx = str(tmp_path_factory.mktemp("ivf_guard") / "index")
    write_ivf_index(spark, SF, idx)
    got = ivf_topk_indexed(spark, SF, idx, probe_collect_cap=0)  # force join branch
    plan = plans.executed(got)
    assert "LeftSemi" in plan, "semi-join branch not taken:\n" + plan[:800]
    want = {tuple(r) for r in ivf_topk(spark, SF).collect()}
    assert {tuple(r) for r in got.collect()} == want


def test_partitioned_window_twins_have_no_global_sort(spark):
    """The round-3 partition-scoped window twins must plan every Window
    node with a partition spec (no 'No Partition Defined' WindowExec)."""
    df = contract.queries()["q_window_range_frame_partitioned"](spark, SF)
    plans.assert_partitioned_window(df, "o_custkey")
    df2 = contract.queries()["q_window_distribution_ranks_partitioned"](spark, SF)
    plans.assert_partitioned_window(df2, "o_custkey")


def test_doc_chunking_is_shuffle_free(spark):
    """Chunk explosion is a narrow per-row op: the whole plan must run
    without a single exchange — the property that makes chunking free at
    100 TB."""
    df = contract.queries()["q_doc_chunking"](spark, SF)
    plans.assert_no_shuffle(df)


def test_agg_families_single_exchange(spark):
    """The aggregate-family queries are one map-side-combined shuffle on
    a low-cardinality key (regression adds a 3-row broadcast for the
    mode subaggregate, never a second hash exchange of the fact table)."""
    for name in ("q_agg_extrema_by", "q_agg_bitwise", "q_histogram_values"):
        plan = plans.executed(contract.queries()[name](spark, SF))
        assert plan.count("Exchange hashpartitioning") <= 1, (name, plan[:800])


def test_full_outer_reconcile_preaggregates_ledger(spark):
    """The ledger side must aggregate per orderkey BEFORE the full-outer
    join (one-row-per-key sides, no row explosion): the plan joins two
    aggregates rather than joining raw lineitem."""
    plan = plans.executed(contract.queries()["q_join_full_outer_reconcile"](spark, SF))
    assert "FullOuter" in plan, plan[:800]
    # two aggregation levels: per-orderkey ledger rollup (below the join)
    # plus the final per-status fold — raw lineitem never reaches the join
    assert plan.count("HashAggregate") >= 4, plan[:800]  # partial+final x2


def test_tfidf_topk_partial_window_limit(spark):
    df = contract.queries()["q_tfidf_top_terms"](spark, SF)
    assert plans.executed(df).count("WindowGroupLimit") >= 2


def test_bloom_bit_table_broadcasts(spark):
    df = contract.queries()["q_bloom_decontaminate"](spark, SF)
    plans.assert_broadcast_join(df)


def test_hard_negatives_query_side_broadcasts(spark):
    df = contract.queries()["q_hard_negatives"](spark, SF)
    plans.assert_broadcast_join(df)


def test_mad_group_stats_broadcast(spark):
    df = contract.queries()["q_dq_outlier_mad"](spark, SF)
    plans.assert_broadcast_join(df)


def test_pq_corpus_side_has_no_extra_shuffle(spark):
    """The ADC scoring pass must join broadcast lookup tables — the only
    exchanges allowed in the whole PQ plan are the per-(vec,subspace)
    argmin, the codes aggregate, and the top-k/rerank windows."""
    df = contract.queries()["q_knn_pq"](spark, SF)
    plan = plans.executed(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_market_basket_topk_is_take_ordered(spark):
    """Top-k rules by lift compile to heap selection, never a full sort."""
    df = contract.queries()["q_market_basket_rules"](spark, SF)
    plans.assert_take_ordered(df)


def test_bpe_topk_is_take_ordered(spark):
    df = contract.queries()["q_bpe_merge_candidates"](spark, SF)
    plans.assert_take_ordered(df)


def test_semdedup_centroids_broadcast(spark):
    """Cluster assignment must be a broadcast join of the k-row centroid
    table — shuffling the corpus to meet 8 centroids would be the
    scale-killer."""
    df = contract.queries()["q_semdedup_clusters"](spark, SF)
    plans.assert_broadcast_join(df)


def test_interval_join_is_equi_not_nested_loop(spark):
    """The binned interval join must plan as a hash/sort-merge EQUI join
    on the bin key — a BroadcastNestedLoopJoin would mean the range
    predicate leaked into the join condition."""
    df = contract.queries()["q_interval_window_join"](spark, SF)
    plan = plans.executed(df)
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan[:800]


def test_attribution_has_no_self_join(spark):
    """Last-touch attribution is ONE window pass over events — the plan
    must contain no join at all (the oracle's naive purchase x touch
    join is exactly what the implementation avoids)."""
    df = contract.queries()["q_attribution_last_touch"](spark, SF)
    plan = plans.executed(df)
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin", "NestedLoop"):
        assert node not in plan, (node, plan[:800])


def test_cms_counters_broadcast_to_probes(spark):
    """Heavy-hitter estimation joins the DEPTH*WIDTH counter grid as a
    broadcast — the grid is sketch-sized by construction."""
    df = contract.queries()["q_cms_heavy_hitters"](spark, SF)
    plans.assert_broadcast_join(df)


def test_rrf_lists_use_partial_window_limit(spark):
    """Both retrieved lists' per-query top-10 filters must compile to
    WindowGroupLimit (partial top-k below the exchange), not full
    per-partition sorts of every candidate."""
    df = contract.queries()["q_hybrid_rrf_search"](spark, SF)
    plan = plans.executed(df)
    assert plan.count("WindowGroupLimit") >= 2, plan[:800]


def test_dbscan_neighbor_search_is_equi_join(spark):
    """Grid-blocked DBSCAN must plan the neighbor search as a hash EQUI
    join on the cell key — a nested-loop/cartesian plan would mean the
    distance predicate leaked into the join condition and the search
    went quadratic."""
    df = contract.queries()["q_dbscan_classify"](spark, SF)
    plan = plans.executed(df)
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan[:800]


def test_target_encoding_prior_broadcasts(spark):
    """The 1-row global prior must broadcast — shuffling the fact table
    to meet it would add a pointless exchange."""
    df = contract.queries()["q_target_encoding"](spark, SF)
    plans.assert_broadcast_join(df)


def test_mmr_candidate_pool_topk_is_take_ordered(spark):
    """Candidate retrieval (top-20 by relevance) must compile to heap
    selection, not a global sort of the corpus."""
    df = contract.queries()["q_mmr_rerank"](spark, SF)
    plans.assert_take_ordered(df)


def test_rake_phrase_window_is_doc_partitioned(spark):
    """RAKE's phrase segmentation window partitions by doc_id — a global
    (unpartitioned) window would serialize the corpus through one task."""
    df = contract.queries()["q_rake_keywords"](spark, SF)
    plan = plans.executed(df)
    assert "partitionBy: [doc_id" in plan.replace("Window [", "Window [").replace(
        "], orderBy", "], orderBy"
    ) or "hashpartitioning(doc_id" in plan, plan[:1200]


def test_wordpiece_udf_runs_on_distinct_words_only(spark):
    """The tokenizer UDF stage must sit ABOVE the word-frequency
    aggregate (ArrowEvalPython after HashAggregate), so Python touches
    vocabulary-sized data, never the corpus token stream."""
    df = contract.queries()["q_wordpiece_tokenize"](spark, SF)
    plan = plans.executed(df)
    assert "ArrowEvalPython" in plan, plan[:800]
    assert plan.index("HashAggregate") < plan.index("ArrowEvalPython"), (
        "UDF must run on the aggregated distinct-word table"
    )


def test_minhash_lsh_bucket_join_excludes_shingle_arrays(spark):
    """The r5 LSH optimization contract: the 8-table bucket-explode
    self-join must carry only (doc_id, features) — the shingle arrays
    (the widest column) may appear in the plan only downstream, re-joined
    onto the narrow candidate set. If `shingles` leaks back into the
    explode side the 35% wall-clock saving silently reverts. Asserted on
    the shipped candidate builder (minhash_docs_and_candidates) because
    the query checkpoints the candidate set, which truncates the explode
    out of the final plan."""
    from etl_pipeline_spark.queries.dedup import minhash_docs_and_candidates

    _, cand = minhash_docs_and_candidates(spark, SF)
    plan = cand._jdf.queryExecution().optimizedPlan().toString()
    # the explode of the hash tables marks the bucket-join side
    explode_lines = [
        ln for ln in plan.splitlines() if "explode" in ln.lower() and "hashes" in ln
    ]
    assert explode_lines, "expected the LSH bucket explode in the plan"
    for ln in explode_lines:
        assert "shingles" not in ln, f"shingle arrays on the explode side: {ln}"


def test_minhash_lsh_verify_broadcasts_only_narrow_ids(spark):
    """The r6 sf10 incident contract: the verify re-attach must never
    put an array column inside a BroadcastExchange — membership is
    restricted by broadcasting the NARROW candidate-id set (a semi-join)
    and the shingle arrays only ever cross candidate-keyed shuffles.
    (AQE broadcasting the candidate-with-arrays intermediate exhausted
    the 8g driver at sf10.)"""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from plan_audit import extract_plan_tree, wide_broadcast_findings

    df = contract.queries()["q_dedup_minhash_lsh"](spark, SF)
    tree = extract_plan_tree(df._jdf.queryExecution().executedPlan())
    # the audit's own detector, not a re-implementation — so the test and
    # the gate can never disagree about the same plan (r6 review finding)
    assert wide_broadcast_findings(tree) == []


def test_persist_preserves_partitioning_checkpoint_does_not(spark):
    """The q_pagerank exchange-budget contract rests on a Spark behavior
    measured in this build (4.1.x): a cached InMemoryRelation reports its
    child's outputPartitioning, so a same-key aggregate above
    `repartition(k).persist()` re-uses the repartition — while
    localCheckpoint scans a bare ExistingRDD whose partitioning is
    UNKNOWN, so the identical aggregate re-exchanges. pagerank's edge
    frame is persisted (not checkpointed) for exactly this reason; if a
    Spark upgrade changes either side, revisit that choice."""
    from pyspark.sql import functions as F

    base = spark.range(2000).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("x")
    )

    cached = base.repartition(F.col("k")).persist()
    try:
        agg_c = cached.groupBy("k").agg(F.sum("x").alias("s"))
        agg_c.collect()
        final_c = plans.executed(agg_c).split("== Initial Plan ==")[0]
        # the only exchange in the final plan is the cached REPARTITION_BY_COL
        # inside the InMemoryRelation — no ENSURE_REQUIREMENTS re-shuffle above it
        assert "InMemoryTableScan" in final_c
        ensure = [
            ln
            for ln in final_c.splitlines()
            if "Exchange hashpartitioning" in ln and "ENSURE_REQUIREMENTS" in ln
        ]
        assert ensure == [], f"cached partitioning not reused: {ensure}"
    finally:
        cached.unpersist()

    ckpt = base.repartition(F.col("k")).localCheckpoint(eager=True)
    agg_k = ckpt.groupBy("k").agg(F.sum("x").alias("s"))
    agg_k.collect()
    final_k = plans.executed(agg_k).split("== Initial Plan ==")[0]
    assert "Exchange hashpartitioning" in final_k, (
        "localCheckpoint now PRESERVES partitioning — pagerank (and the "
        "other repartition+checkpoint sites) can drop their persist "
        "workaround: " + final_k[:500]
    )


def test_pagerank_edges_are_persisted_and_reuse_partitioning(spark):
    """Companion to the partitioning test above, on the SHIPPED edge
    builder (the final q_pagerank plan is checkpoint-truncated, so the
    cache is invisible there): pagerank_edges is a cached relation whose
    source-key partitioning a same-key consumer re-uses — the out-degree
    aggregate, the exact shape every power iteration's join requires,
    plans with no ENSURE_REQUIREMENTS re-exchange above the cache."""
    from pyspark.sql import functions as F

    from etl_pipeline_spark.catalog import load_tables
    from etl_pipeline_spark.queries.analytics_ml import pagerank_edges

    li = load_tables(spark, SF, ("lineitem",))["lineitem"]
    edges = pagerank_edges(li)
    try:
        outdeg = edges.groupBy("u").agg(F.count("*").alias("od"))
        outdeg.collect()
        final = plans.executed(outdeg).split("== Initial Plan ==")[0]
        assert "InMemoryTableScan" in final or "TableCacheQueryStage" in final, (
            final[:800]
        )
        above_cache = final.split("InMemoryRelation")[0]
        ensure = [
            ln
            for ln in above_cache.splitlines()
            if "Exchange hashpartitioning" in ln and "ENSURE_REQUIREMENTS" in ln
        ]
        assert ensure == [], f"edge partitioning not reused: {ensure}"
    finally:
        edges.unpersist()


def test_sorted_persist_elides_per_round_big_side_sort(spark):
    """r14 optimization round: the WCC/pagerank iteration frames persist
    SORTED by their join key, so each round's sort-merge join (the
    at-scale strategy once the node side outgrows the broadcast
    threshold) reads the cached ordering instead of re-sorting the
    edge-sized side every round. Pin: with broadcast disabled, the round
    join's cache side has NO Sort between the InMemoryTableScan and the
    SortMergeJoin — the only Sort in the round plans the node-sized
    label side."""
    from pyspark.sql import functions as F

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select("dst"))
        .distinct()
    )
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .union(nodes.select(F.col("node").alias("src"), F.col("node").alias("dst")))
        .repartition(F.col("dst"))
        .sortWithinPartitions("dst")
        .persist()
    )
    try:
        sym.count()
        labels = nodes.select(F.col("node"), F.col("node").alias("label"))
        out = (
            sym.join(labels, F.col("dst") == labels.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("label").alias("label"))
        )
        out.collect()
        final = out._jdf.queryExecution().executedPlan().toString()
        # the top-level (round) plan: everything above the cached
        # relation's own build plan
        round_part = final.split("InMemoryRelation")[0]
        assert "SortMergeJoin" in round_part, round_part[:800]
        cache_side = round_part.split("SortMergeJoin")[1]
        # between the join and the cache scan: a Filter is fine, a Sort
        # means the cached ordering was not picked up
        upto_cache = cache_side.split("InMemoryTableScan")[0]
        assert "Sort [" not in upto_cache, round_part[:1200]
    finally:
        sym.unpersist()
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_ngram_jaccard_merge_hint_scoped_to_self_join(spark):
    """r15: the merge hint guards the static-broadcast hazard only where
    the checkpointed posting frame feeds a join DIRECTLY (the inverted-
    index self-join — no exchange below it, so its strategy is fixed at
    static-planning time). The two size joins sit above exchanges on
    both sides and are AQE-planned from runtime stats; pinning them to
    sort-merge cost two corpus-pair-table sorts (measured 1.327 ->
    0.944 s at sf0.1). Assert: the self-join on `shingle` stays
    SortMergeJoin, and no Sort-Merge machinery is forced onto the
    doc-keyed size joins at fixture scale (they plan as broadcast)."""
    for name in ("q_dedup_ngram_jaccard", "q_dedup_ngram_jaccard_capped"):
        df = contract.queries()[name](spark, SF)
        plan = plans.executed(df)
        smj = plan.count("SortMergeJoin")
        assert smj == 1, f"{name}: expected exactly the posting self-join as SMJ, got {smj}:\n{plan[:1200]}"
        # the SMJ must be the shingle-keyed join, not a size join
        smj_line = [ln for ln in plan.splitlines() if "SortMergeJoin" in ln][0]
        assert "shingle" in smj_line, smj_line


def test_verify_first_attach_builds_pair_side(spark):
    """r15: in the minhash-LSH and prefix-filter verifies, the FIRST
    array attach is a shuffled hash join whose build side is the narrow
    candidate-pair frame (left) — arrays stream, never sorted, never
    hash-built; the SECOND attach (both sides carry arrays) stays
    sort-merge, the r14-documented heap-safe choice."""
    for name in ("q_dedup_minhash_lsh", "q_dedup_prefix_filter"):
        df = contract.queries()[name](spark, SF)
        plan = plans.executed(df)
        assert "ShuffledHashJoin" in plan and "BuildLeft" in plan, (
            f"{name}: expected a ShuffledHashJoin building the pair side:\n{plan[:900]}"
        )
        assert "SortMergeJoin" in plan, f"{name}: second attach must stay SMJ"
        # arrays must never sit under a BroadcastExchange (r6 incident class)
        import re as _re
        for m in _re.finditer(r"BroadcastExchange", plan):
            window = plan[m.start():m.start() + 400]
            assert not _re.search(r"\b(hsh|shset|sh_a|sh_b|h_a|h_b|shingles)\b", window), (
                f"{name}: array column near a BroadcastExchange:\n{window}"
            )
