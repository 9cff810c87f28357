"""The flagship LLM-training-data preparation flow as ONE oracle-checked
query — the composition the BASELINE.json north star describes, built
from pieces that are each individually verified:

  documents
    -> exact dedup        (md5 fingerprint, keep min doc_id)
    -> near-dup pruning   (greedy: drop the higher-id member of every
                           n-gram-Jaccard near-dup pair)
    -> quality gate       (token count in [10, 1000], punct ratio < 0.2)
    -> token accounting   (BPE-ish regex tokens)
    -> deterministic 50% sample (md5 nibble)
    -> per-language corpus stats

Scale: dedup shuffles on the fingerprint, near-dup pruning is an
anti-join against the LSH-verified pair list, everything else is narrow —
the standard shape of a 100 TB corpus build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_pipeline_spark.catalog import load_tables
from etl_pipeline_spark.queries.base import REGISTRY, query
from etl_pipeline_spark.queries.dedup import q_dedup_ngram_jaccard
from etl_pipeline_spark.queries.text import TOKEN_RE


def _oracle() -> str:
    pairs_sql = REGISTRY["q_dedup_ngram_jaccard"].oracle
    return f"""
    WITH pairs AS ({pairs_sql}),
    fp AS (
        SELECT doc_id, lang, text,
               MD5(LOWER(REGEXP_REPLACE(TRIM(text), '\\s+', ' ', 'g'))) AS fingerprint
        FROM documents
    ),
    exact_kept AS (
        SELECT doc_id, lang, text FROM (
            SELECT doc_id, lang, text,
                   ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
            FROM fp
        ) WHERE rn = 1
    ),
    neardup_kept AS (
        SELECT e.* FROM exact_kept e
        WHERE NOT EXISTS (SELECT 1 FROM pairs p WHERE p.doc_b = e.doc_id)
    ),
    scored AS (
        SELECT doc_id, lang,
               LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+'))     AS n_tok,
               LEN(REGEXP_EXTRACT_ALL(text, '{TOKEN_RE}'))     AS bpe_tokens,
               CAST(LEN(REGEXP_EXTRACT_ALL(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
                   / GREATEST(LENGTH(text), 1)                 AS punct_ratio
        FROM neardup_kept
    ),
    final AS (
        SELECT * FROM scored
        WHERE n_tok BETWEEN 10 AND 1000 AND punct_ratio < 0.2
          AND SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 1) IN
              ('0','1','2','3','4','5','6','7')
    )
    SELECT lang,
           COUNT(*)                      AS n_docs,
           CAST(SUM(bpe_tokens) AS BIGINT) AS total_tokens,
           ROUND(AVG(bpe_tokens), 2)     AS avg_tokens,
           ROUND(AVG(punct_ratio), 4)    AS avg_punct_ratio
    FROM final
    GROUP BY lang
    """


@query(
    "q_training_data_prep",
    oracle=_oracle(),
    tags=("pipeline", "X1", "X2", "X4", "flagship", "composition"),
)
def q_training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus build: exact dedup -> near-dup prune -> quality
    gate -> token accounting -> deterministic sample -> per-lang stats."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    wfp = W.partitionBy(F.md5(norm)).orderBy("doc_id")
    exact_kept = (
        d.withColumn("rn", F.row_number().over(wfp)).filter(F.col("rn") == 1).drop("rn")
    )
    drop_ids = q_dedup_ngram_jaccard(spark, sf_dir).select(
        F.col("doc_b").alias("doc_id")
    ).distinct()
    neardup_kept = exact_kept.join(drop_ids, "doc_id", "left_anti")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    bpe = F.size(F.regexp_extract_all("text", F.lit(TOKEN_RE), 0))
    punct_ratio = (
        F.size(F.regexp_extract_all("text", F.lit(r"[^A-Za-z0-9\s]"), 0)).cast("double")
        / F.greatest(F.length("text"), F.lit(1))
    )
    sampled = (
        neardup_kept.select(
            "doc_id",
            "lang",
            n_tok.alias("n_tok"),
            bpe.alias("bpe_tokens"),
            punct_ratio.alias("punct_ratio"),
        )
        .filter(F.col("n_tok").between(10, 1000) & (F.col("punct_ratio") < 0.2))
        .filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
                *"01234567"
            )
        )
    )
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("bpe_tokens").alias("total_tokens"),
        F.round(F.avg("bpe_tokens"), 2).alias("avg_tokens"),
        F.round(F.avg("punct_ratio"), 4).alias("avg_punct_ratio"),
    )
