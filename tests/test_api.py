"""Library-API tests: the operator surface over arbitrary user DataFrames
(not the fixture tables), including agreement with the registry queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_spark import api

SF = "/root/testdata/sf0.001"


def test_dedupe_exact_on_custom_df(spark):
    df = spark.createDataFrame(
        [
            (1, "hello   world"),
            (2, "Hello World"),      # case-folded by normalization -> dup of 1
            (3, "hello world"),      # whitespace-normalized dup of 1
            (4, "something else"),
        ],
        "doc_id long, text string",
    )
    kept = api.dedupe_exact(df)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 4]


def test_jaccard_pairs_and_clustering(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g x"),   # near-dup of 1
            (3, "p q r s t u v w"),
            (4, "p q r s t u v y"),   # near-dup of 3
            (5, "totally different words here now"),
        ],
        "doc_id long, text string",
    )
    pairs = api.jaccard_near_dup_pairs(df, threshold=0.4)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert got == {(1, 2), (3, 4)}
    clusters = api.cluster_near_dups(df, pairs)
    by_id = {r["doc_id"]: r for r in clusters.collect()}
    assert by_id[2]["cluster_id"] == 1 and not by_id[2]["is_keeper"]
    assert by_id[4]["cluster_id"] == 3 and not by_id[4]["is_keeper"]
    assert by_id[5]["is_keeper"]


def test_df_cap_drops_stop_shingles(spark):
    # a shingle present in every doc is a stop-shingle under cap=2
    df = spark.createDataFrame(
        [(i, f"common trigram here unique{i} token{i} extra{i}") for i in range(5)],
        "doc_id long, text string",
    )
    uncapped = api.jaccard_near_dup_pairs(df, threshold=0.1)
    capped = api.jaccard_near_dup_pairs(df, threshold=0.1, df_cap=2)
    assert uncapped.count() > 0
    assert capped.count() == 0  # only the shared stop-shingle linked them


def test_quality_and_sampling(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    feats = api.text_quality_features(docs)
    assert {"n_tokens", "punct_ratio", "passes_quality"} <= set(feats.columns)
    n = docs.count()
    sampled = api.hash_sample(docs, "doc_id", fraction_16ths=8).count()
    assert 0 < sampled < n
    # determinism: same rows every time
    assert api.hash_sample(docs, "doc_id", 8).count() == sampled


def test_knn_matches_registry_query(spark):
    import __spark_entry__ as contract

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    via_api = {
        (r["q_id"], r["rnk"]): r["neighbor_id"]
        for r in api.knn_cosine_topk(emb, n_queries=5, k=3).collect()
    }
    via_query = {
        (r["q_id"], r["rnk"]): r["neighbor_id"]
        for r in contract.queries()["q_knn_bruteforce_cosine"](spark, SF).collect()
        if r["q_id"] < 5 and r["rnk"] <= 3
    }
    assert via_api == via_query


def test_quantize_stats(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    stats = api.quantize_int8_stats(emb)
    row = stats.limit(1).collect()[0]
    assert row["int8_scale"] > 0
    assert row["mse_ppm"] >= 0


def test_scrub_pii_and_audit(spark):
    df = spark.createDataFrame(
        [
            (1, "write to alice@example.org or call 555-1234 now"),
            (2, "no pii here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in api.scrub_pii(df).collect()}
    assert "<EMAIL>" in out[1]["text"] and "<PHONE>" in out[1]["text"]
    assert "alice@" not in out[1]["text"] and "555-1234" not in out[1]["text"]
    assert out[1]["_n_emails"] == 1 and out[1]["_n_phones"] == 1
    assert out[2]["text"] == "no pii here" and out[2]["_n_emails"] == 0


def test_stratified_hash_sample_rates(spark):
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("fr").alias("lang"),
    )
    kept = api.stratified_hash_sample(df, "doc_id", "lang", {"en": 8, "fr": 2})
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # 1000 per stratum; md5 nibbles are uniform: expect ~500 en, ~125 fr
    assert 400 < counts["en"] < 600
    assert 60 < counts["fr"] < 190
    # determinism: the same call yields the same rows
    again = api.stratified_hash_sample(df, "doc_id", "lang", {"en": 8, "fr": 2})
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_contamination_report_detects_overlap(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"), (2, "completely different text body here with words")],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [(100, "quick brown fox jumps over the lazy dog"), (101, "nothing shared at all whatsoever in this one")],
        "doc_id long, text string",
    )
    rep = {r["eval_doc_id"]: r for r in api.contamination_report(train, evals).collect()}
    assert 100 in rep and rep[100]["n_contaminating_docs"] == 1
    assert rep[100]["n_shared_ngrams"] >= 4  # shared 5-gram run
    assert 101 not in rep


def test_pack_sequences_and_repetition(spark):
    docs = spark.createDataFrame(
        [(i, "en", 100) for i in range(10)], "doc_id long, lang string, n_tok long"
    )
    packed = api.pack_sequences(docs, "n_tok", budget=250)
    chunks = {r["doc_id"]: r["chunk_id"] for r in packed.collect()}
    # offsets 0,100,...,900 / 250 -> chunks 0,0,0,1,1,2,2,2,3,3
    assert [chunks[i] for i in range(10)] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]

    rep = api.repetition_score(
        spark.createDataFrame([(1, "a a a a"), (2, "w x y z")], "doc_id long, text string")
    )
    vals = {r["doc_id"]: r["repetition"] for r in rep.collect()}
    assert vals[1] == 0.75 and vals[2] == 0.0


def test_dedupe_incremental_splits_batch(spark):
    corpus = spark.createDataFrame(
        [(1, "existing document one"), (2, "existing document two")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "existing  DOCUMENT one"),   # dup of corpus doc 1 (normalized)
            (11, "a brand new document"),
            (12, "a brand new document"),     # intra-batch dup of 11
        ],
        "doc_id long, text string",
    )
    fresh, dups = api.dedupe_incremental(batch, corpus)
    assert [r["doc_id"] for r in fresh.collect()] == [11]
    assert [r["doc_id"] for r in dups.collect()] == [10]
