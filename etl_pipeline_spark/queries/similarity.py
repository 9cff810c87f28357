"""Similarity search over embeddings — SURVEY.md §2.12 X3.

Brute-force cosine top-k as the exact baseline (oracle-checked against
DuckDB's list functions), and a bucketed-random-projection LSH variant as
the sub-linear scale path, in candidate-generation + exact-re-rank form
so the exact-kNN SQL is its oracle as well (a candidate-recall miss
fails the hash).

Numeric determinism: cosine is computed in DOUBLE with a strictly
sequential left-to-right fold over the array in both engines, then rounded
to 4 decimals before ranking, with vec_id as tie-break — so the top-k sets
match across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_pipeline_spark.catalog import load_tables
from etl_pipeline_spark.queries.base import query

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors


def _cosine(a, b):
    """Sequential-fold cosine similarity in double precision.

    ``F.zip_with`` + ``F.aggregate`` evaluate element-by-element in array
    order — same accumulation order as DuckDB's list_dot_product — so the
    doubles agree to the last ulp in practice.
    """
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return dot / (na * nb)


@query(
    "q_knn_bruteforce_cosine",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
        WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
        SELECT q.q_id, e.vec_id AS neighbor_id, e.label AS neighbor_label,
               ROUND(
                 list_dot_product(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]) /
                 (SQRT(list_dot_product(q.q_emb::DOUBLE[], q.q_emb::DOUBLE[])) *
                  SQRT(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
                 4) AS cos_sim
        FROM q, embeddings e
        WHERE e.vec_id <> q.q_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id ASC
        ) AS rnk
        FROM scored
    )
    SELECT q_id, neighbor_id, neighbor_label, cos_sim, rnk
    FROM ranked WHERE rnk <= {TOP_K}
    """,
    tags=("similarity", "X3", "knn"),
)
def q_knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact kNN: brute-force cosine top-k for each query vector.

    Scale: query set broadcasts; each executor scores its corpus slice and
    the window top-k shuffles only (n_queries x corpus_partition) survivors.
    For a large query set, switch to the block-matrix Pandas-UDF variant
    (see operators/similarity.py) — same semantics, BLAS throughput.
    """
    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            F.round(_cosine(F.col("q_emb"), F.col("embedding")), 4).alias("cos_sim"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "neighbor_id", "neighbor_label", "cos_sim", "rnk")
    )


@query(
    "q_knn_lsh_approx",
    # Self-verifying form (round 2): LSH generates CANDIDATES only; the
    # exact cosine re-rank of candidates is what gets emitted, so the
    # exact-kNN SQL is the oracle. A candidate miss (recall < 1) would
    # surface as a hash mismatch — the check IS the recall assertion.
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
        WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
        SELECT q.q_id, e.vec_id AS neighbor_id, e.label AS neighbor_label,
               ROUND(
                 list_dot_product(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]) /
                 (SQRT(list_dot_product(q.q_emb::DOUBLE[], q.q_emb::DOUBLE[])) *
                  SQRT(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
                 4) AS cos_sim
        FROM q, embeddings e
        WHERE e.vec_id <> q.q_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id ASC
        ) AS rnk
        FROM scored
    )
    SELECT q_id, neighbor_id, neighbor_label, cos_sim, rnk
    FROM ranked WHERE rnk <= {TOP_K}
    """,
    tags=("similarity", "X3", "lsh", "approx", "exact-recall-oracle", "params-tuned-sf0.001-0.1"),
)
def q_knn_lsh_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate kNN, candidate-generation + exact re-rank: bucketed
    random projections (Spark ML LSH, seeded) produce the candidate set,
    then candidates are re-scored with exact cosine and top-k'd with the
    same rounding/tie-break as the brute-force twin. Output therefore
    equals exact kNN whenever candidate recall is 1.0 — which the oracle
    (the exact-kNN SQL) verifies directly.

    Scale: candidates come from hash-bucket joins instead of the full
    cross product; recall tunes with numHashTables/bucketLength. The
    re-rank touches only candidates, so the exact-cosine cost stays
    sub-linear in the corpus.

    Oracle coupling (tag ``exact-recall-oracle``): numHashTables=12,
    bucketLength=4.0, L2 threshold 15.0 were tuned for candidate recall
    1.0 on the sf0.001-0.1 fixtures, so the exact-kNN SQL doubles as the
    oracle. A hash mismatch at a NEW scale factor / fixture / Spark hash
    version therefore signals recall < 1 (retune params), not an engine
    bug.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    # One materialization, lazy (see dedup module docstring): fit, the
    # query side, and the corpus side otherwise each re-run the
    # vectorization; eager=False keeps query construction job-free.
    vecs = e.select(
        "vec_id", "label", "embedding", array_to_vector("embedding").alias("features")
    ).localCheckpoint(eager=False)
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", numHashTables=12, bucketLength=4.0, seed=42
    )
    model = lsh.fit(vecs)
    q = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"), "features"
    )
    cand = (
        model.approxSimilarityJoin(q, vecs, 15.0, distCol="l2_dist")
        .filter(F.col("datasetA.q_id") != F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.q_id").alias("q_id"),
            F.col("datasetA.q_emb").alias("q_emb"),
            F.col("datasetB.vec_id").alias("neighbor_id"),
            F.col("datasetB.label").alias("neighbor_label"),
            F.col("datasetB.embedding").alias("emb"),
        )
    )
    rescored = cand.select(
        "q_id",
        "neighbor_id",
        "neighbor_label",
        F.round(_cosine(F.col("q_emb"), F.col("emb")), 4).alias("cos_sim"),
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        rescored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "neighbor_id", "neighbor_label", "cos_sim", "rnk")
    )
