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
