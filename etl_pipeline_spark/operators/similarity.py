"""Block-matrix similarity search — SURVEY.md §2.12 X3 scale path.

Exact cosine top-k computed per partition with numpy (Arrow-batched
``mapInPandas``): the query matrix broadcasts to every executor, each
batch of corpus vectors is scored as ONE BLAS matmul, and only each
batch's scores survive to the global window top-k. Same semantics as the
pure-Column brute force (q_knn_bruteforce_cosine) — this is the
throughput path when vectors * queries stops being expression-friendly.

At 100 TB scale: corpus stays partitioned (never collected), queries
broadcast once, matmul is O(batch x k) memory, and the final top-k is a
window over (n_queries x n_batches x k) rows, not the full score matrix.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_pipeline_spark.catalog import embedding_door, load_tables


def knn_block_matrix(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 10,
    top_k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for query vectors (vec_id < n_queries)
    via per-partition numpy matmul + global window top-k.

    embedding_door: np.stack hard-requires rectangular input — one NULL
    or off-dimension drift vector in a batch would kill the whole UDF
    task, so only contract-conforming rows enter the matmul."""
    e = embedding_door(load_tables(spark, sf_dir, ("embeddings",))["embeddings"])
    q_rows = (
        e.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((q_ids, q_norm))

    out_schema = "q_id long, neighbor_id long, neighbor_label int, cos_sim double"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, qn = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ qn.T  # (batch, n_queries) — one BLAS call
            n_b, n_q = sims.shape
            yield pd.DataFrame(
                {
                    "q_id": np.repeat(ids, n_b),
                    "neighbor_id": np.tile(pdf["vec_id"].to_numpy(), n_q),
                    "neighbor_label": np.tile(pdf["label"].to_numpy(), n_q),
                    "cos_sim": np.round(sims.T.ravel(), 4),
                }
            )

    scored = e.select("vec_id", "label", "embedding").mapInPandas(score, out_schema)
    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.filter(F.col("neighbor_id") != F.col("q_id"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select("q_id", "neighbor_id", "neighbor_label", "cos_sim", "rnk")
    )
