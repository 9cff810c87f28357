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

from etl_pipeline_spark.catalog import (
    EMB_DOOR_SQL,
    emb_door_sql,
    embedding_door,
    load_tables,
    scan_parallel,
)
from etl_pipeline_spark.functions.grid import stable_round, stable_round_sql
from etl_pipeline_spark.queries.base import query

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors


def _cosine(a, b):
    """Sequential-fold cosine similarity in double precision.

    ``F.zip_with`` + ``F.aggregate`` evaluate element-by-element in array
    order — same accumulation order as DuckDB's list_dot_product — so the
    doubles agree to the last ulp in practice.

    Zero-norm vectors: cosine is undefined, and under Spark 4's default
    ANSI mode a plain ``/`` THROWS on the zero denominator — one
    all-zeros embedding row would kill the whole job (adversarial-fixture
    find, r8). ``try_divide`` yields NULL instead, which is exactly what
    DuckDB's double division by zero returns, so both engines agree:
    the row ranks last (NULLS LAST in DESC on both) instead of crashing.
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
    return F.try_divide(dot, na * nb)


@query(
    "q_knn_bruteforce_cosine",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
        WHERE vec_id < {N_QUERIES} AND {EMB_DOOR_SQL}
    ),
    scored AS (
        SELECT q.q_id, e.vec_id AS neighbor_id, e.label AS neighbor_label,
               ROUND(
                 list_dot_product(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]) /
                 (SQRT(list_dot_product(q.q_emb::DOUBLE[], q.q_emb::DOUBLE[])) *
                  SQRT(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
                 4) AS cos_sim
        FROM q, embeddings e
        WHERE e.vec_id <> q.q_id AND {emb_door_sql('e.embedding')}
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
    # scan_parallel: the cosine scoring runs in the scan stage (the
    # query side broadcasts), so a single-split test fixture would score
    # the whole corpus in one task.
    e = scan_parallel(
        embedding_door(load_tables(spark, sf_dir, ("embeddings",))["embeddings"]),
        spark,
        "vec_id",
    )

    # r14 optimization round (guide §1.2 per-task work): norms hoisted
    # out of the pair projection — the corpus row's ||e|| was recomputed
    # once PER QUERY after the crossJoin, and the broadcast row's ||q||
    # once per corpus row; each is now computed once on its own side.
    # Bit-identical values: the sqrt-of-sequential-fold expression and
    # the na * nb product are unchanged, only evaluated earlier, so the
    # rounded cos_sim (and the oracle hash) cannot move. Per-pair float
    # work drops from 3 to ~1 array folds (the dot product).
    def _norm(col):
        return F.sqrt(
            F.aggregate(
                col, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
            )
        )

    en = e.select(
        "vec_id", "label", "embedding", _norm(F.col("embedding")).alias("e_norm")
    )
    q = en.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("e_norm").alias("q_norm"),
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("q_emb"),
            F.col("embedding"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        en.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            F.round(
                F.try_divide(dot, F.col("q_norm") * F.col("e_norm")), 4
            ).alias("cos_sim"),
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
        WHERE vec_id < {N_QUERIES} AND {EMB_DOOR_SQL}
    ),
    scored AS (
        SELECT q.q_id, e.vec_id AS neighbor_id, e.label AS neighbor_label,
               ROUND(
                 list_dot_product(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]) /
                 (SQRT(list_dot_product(q.q_emb::DOUBLE[], q.q_emb::DOUBLE[])) *
                  SQRT(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
                 4) AS cos_sim
        FROM q, embeddings e
        WHERE e.vec_id <> q.q_id AND {emb_door_sql('e.embedding')}
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
    sub-linear in the corpus. The corpus side of the bucket join carries
    ONLY (vec_id, features) — label and the raw embedding re-join onto
    the narrow candidate set afterwards (the r5 MinHash-LSH contract:
    wide columns never ride the explode shuffle; ~15% at sf0.1, more at
    corpus scale where candidates << corpus).

    Oracle coupling (tag ``exact-recall-oracle``): numHashTables=12,
    bucketLength=4.0, L2 threshold 15.0 were tuned for candidate recall
    1.0 on the sf0.001-0.1 fixtures, so the exact-kNN SQL doubles as the
    oracle. A hash mismatch at a NEW scale factor / fixture / Spark hash
    version therefore signals recall < 1 (retune params), not an engine
    bug.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    # embedding_door: array_to_vector on a NULL / drift-dimension vector
    # would kill the fit; only contract-conforming rows are indexed
    e = embedding_door(load_tables(spark, sf_dir, ("embeddings",))["embeddings"])
    # One materialization, lazy (see dedup module docstring): fit, the
    # query side, and the corpus side otherwise each re-run the
    # vectorization; eager=False keeps query construction job-free.
    vecs = e.select(
        "vec_id", "label", "embedding", array_to_vector("embedding").alias("features")
    ).localCheckpoint(eager=False)
    corpus = vecs.select("vec_id", "features").localCheckpoint(eager=False)
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", numHashTables=12, bucketLength=4.0, seed=42
    )
    model = lsh.fit(corpus)
    q = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"), "features"
    )
    cand = (
        model.approxSimilarityJoin(q, corpus, 15.0, distCol="l2_dist")
        .filter(F.col("datasetA.q_id") != F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.q_id").alias("q_id"),
            F.col("datasetA.q_emb").alias("q_emb"),
            F.col("datasetB.vec_id").alias("neighbor_id"),
        )
    )
    nb = vecs.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("embedding").alias("emb"),
    )
    rescored = cand.join(nb, "neighbor_id").select(
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


PQ_M = 8  # subspaces
PQ_DSUB = 8  # dims per subspace (8 x 8 = 64-dim embeddings)
PQ_CENT_MOD = 53  # vec_id % 53 == 0 -> codebook vector (deterministic "training")
PQ_CENT_CAP = 53 * 256  # codebook is FIXED-SIZE: at most 256 centroids per subspace,
# so the encode cost stays O(corpus x 256) — linear — at any scale

_PQ_SUBD2 = (
    "list_sum(list_transform(GENERATE_SERIES(1, {n}), "
    "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
)


@query(
    "q_knn_pq",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        WHERE {EMB_DOOR_SQL}
    ),
    ms AS (SELECT UNNEST(GENERATE_SERIES(0, {PQ_M - 1})) AS m),
    cent AS (
        SELECT e.vec_id AS cent_id, m,
               emb[m * {PQ_DSUB} + 1 : m * {PQ_DSUB} + {PQ_DSUB}] AS csub
        FROM e, ms WHERE e.vec_id % {PQ_CENT_MOD} = 0 AND e.vec_id < {PQ_CENT_CAP}
    ),
    sub AS (
        SELECT e.vec_id, m,
               emb[m * {PQ_DSUB} + 1 : m * {PQ_DSUB} + {PQ_DSUB}] AS sub
        FROM e, ms
    ),
    assign AS (
        SELECT vec_id, m, cent_id,
               ROW_NUMBER() OVER (
                   PARTITION BY vec_id, m ORDER BY d2r, cent_id
               ) AS rn
        FROM (
            SELECT s.vec_id, s.m, c.cent_id,
                   ROUND({_PQ_SUBD2.format(n=PQ_DSUB, a='s.sub', b='c.csub')}, 4) AS d2r
            FROM sub s JOIN cent c ON s.m = c.m
        ) x
    ),
    codes AS (SELECT vec_id, m, cent_id AS code FROM assign WHERE rn = 1),
    dtab AS (
        SELECT s.vec_id AS q_id, c.m, c.cent_id,
               ROUND({_PQ_SUBD2.format(n=PQ_DSUB, a='s.sub', b='c.csub')}, 4) AS d2q
        FROM sub s JOIN cent c ON s.m = c.m
        WHERE s.vec_id < {N_QUERIES}
    ),
    adc AS (
        SELECT d.q_id, k.vec_id AS neighbor_id, ROUND(SUM(d.d2q), 4) AS adc_d2
        FROM codes k JOIN dtab d ON d.m = k.m AND d.cent_id = k.code
        WHERE k.vec_id <> d.q_id
        GROUP BY d.q_id, k.vec_id
    ),
    cand AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY q_id ORDER BY adc_d2, neighbor_id
            ) AS adc_rank
            FROM adc
        ) r WHERE adc_rank <= {TOP_K}
    ),
    exact AS (
        SELECT c.q_id, c.neighbor_id, c.adc_d2, c.adc_rank,
               ROUND({_PQ_SUBD2.format(n=PQ_M * PQ_DSUB, a='eq.emb', b='en.emb')}, 4)
                   AS exact_d2
        FROM cand c
        JOIN e eq ON eq.vec_id = c.q_id
        JOIN e en ON en.vec_id = c.neighbor_id
    )
    SELECT q_id, neighbor_id, adc_d2, exact_d2, adc_rank,
           ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY exact_d2, neighbor_id
           ) AS exact_rank
    FROM exact
    """,
    tags=("similarity", "X3", "pq", "quantization"),
)
def q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (the IVF-PQ compression half): embeddings
    are split into 8 subspaces of 8 dims; a deterministic codebook (every
    53rd vector's subvectors, capped at 256 centroids so the encode cost
    stays linear in the corpus — training-free, so both engines derive
    the SAME codebook) quantizes each subvector to its nearest centroid; query
    distance is the classic Asymmetric Distance Computation — a per-query
    lookup table of query-to-centroid subdistances, summed over the 8
    stored codes — followed by an exact L2 re-rank of the ADC top-k.
    Emits ADC and exact distances plus both rank orders, so the oracle
    checks the quantized geometry itself, not just the final ids.

    Scale: this is the memory-bound ANN path — each corpus vector is
    represented by 8 small codes (8 bytes here vs 256 bytes of floats), and
    scoring is table lookups, no float math over the corpus. The plan keeps
    the corpus shuffle-free: codebook (tiny) broadcasts to the encode step;
    the per-query lookup tables (n_queries x n_centroids x 8 rounded
    doubles) broadcast as map literals; ADC is a per-row array fold; the
    only shuffles are the per-(vec,subspace) argmin and the top-k window
    (WindowGroupLimit partial). At 100 TB you'd precompute+store the codes
    column once (rollup-maintenance pattern) and re-use it for every query
    batch; combine with the IVF routing operator to restrict candidates.
    """
    # scan_parallel: the subspace explode + centroid-distance math runs
    # in the scan stage (codebook broadcasts), single-task on a
    # single-split fixture otherwise.
    e = scan_parallel(
        embedding_door(load_tables(spark, sf_dir, ("embeddings",))["embeddings"]),
        spark,
        "vec_id",
    )
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    ed = e.select("vec_id", emb_d.alias("emb"))
    m_col = F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("m")
    sub_expr = F.slice(F.col("emb"), F.col("m") * PQ_DSUB + 1, PQ_DSUB)

    sub = ed.select("vec_id", "emb", m_col).select("vec_id", "m", sub_expr.alias("sub"))
    cent = (
        ed.filter((F.col("vec_id") % PQ_CENT_MOD == 0) & (F.col("vec_id") < PQ_CENT_CAP))
        .select(F.col("vec_id").alias("cent_id"), m_col, "emb")
        .select("cent_id", "m", sub_expr.alias("csub"))
    )

    def _d2(a, b):  # strictly sequential fold, same order as the oracle
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    # r14 optimization round (guide §2.4 — remove shuffles outright):
    # the encode step's per-(vec, subspace) argmin was a corpus-wide
    # window (row_number over (vec_id, m) ORDER BY d2r, cent_id) — the
    # full n_vec x PQ_M x n_cent assign stream crossed an exchange and a
    # sort, then a second exchange rebuilt the per-vec code map. The
    # codebook is metadata-sized BY CONSTRUCTION (<= PQ_CENT_CAP /
    # PQ_CENT_MOD centroids), so it now rides a one-row broadcast as a
    # map m -> sorted [(cent_id, csub)...], and each corpus row computes
    # all PQ_M codes in the scan stage: array_min over
    # struct(round(d2, 4), cent_id) is EXACTLY the window's
    # (d2r asc, cent_id asc) comparator — lexicographic struct order —
    # so the assigned codes are identical and the corpus never shuffles
    # for encoding (plans/r14/q_knn_pq_{before,after}.txt: the encode
    # window, its sort, and two corpus-sized exchanges are gone).
    cbmap = (
        cent.groupBy("m")
        .agg(F.array_sort(F.collect_list(F.struct("cent_id", "csub"))).alias("cents"))
        .groupBy()
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("m").cast("int"), F.col("cents")))
            ).alias("cb")
        )
    )

    def _code(m):  # argmin centroid of subspace m for the row's emb
        return F.array_min(
            F.transform(
                F.element_at(F.col("cb"), m.cast("int")),
                lambda c: F.struct(
                    F.round(
                        _d2(
                            F.slice(F.col("emb"), m * PQ_DSUB + 1, PQ_DSUB),
                            c["csub"],
                        ),
                        4,
                    ).alias("d2r"),
                    c["cent_id"].alias("cent_id"),
                ),
            )
        )["cent_id"]

    codes = ed.crossJoin(F.broadcast(cbmap)).select(
        "vec_id",
        F.map_from_entries(
            F.transform(
                F.sequence(F.lit(0), F.lit(PQ_M - 1)),
                lambda m: F.struct(m.cast("int"), _code(m)),
            )
        ).alias("codes"),
    )
    dtab = (
        sub.filter(F.col("vec_id") < N_QUERIES)
        .join(F.broadcast(cent), "m")
        .select(
            F.col("vec_id").alias("q_id"),
            (F.col("cent_id") * PQ_M + F.col("m")).alias("k"),
            F.round(_d2(F.col("sub"), F.col("csub")), 4).alias("d2q"),
        )
    )
    qmaps = dtab.groupBy("q_id").agg(
        F.map_from_entries(F.collect_list(F.struct("k", "d2q"))).alias("dmap")
    )
    adc_expr = F.aggregate(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        F.lit(0.0),
        lambda acc, m: acc
        + F.element_at(
            F.col("dmap"),
            F.element_at(F.col("codes"), m.cast("int")) * PQ_M + m,
        ),
    )
    cand = (
        codes.crossJoin(F.broadcast(qmaps))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("neighbor_id"), F.round(adc_expr, 4).alias("adc_d2"))
    )
    wk = W.partitionBy("q_id").orderBy("adc_d2", "neighbor_id")
    topk = cand.withColumn("adc_rank", F.row_number().over(wk)).filter(
        F.col("adc_rank") <= TOP_K
    )
    eq = ed.select(F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb"))
    en = ed.select(F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("n_emb"))
    exact = (
        topk.join(F.broadcast(eq), "q_id")
        .join(en, "neighbor_id")
        .select(
            "q_id",
            "neighbor_id",
            "adc_d2",
            F.round(_d2(F.col("q_emb"), F.col("n_emb")), 4).alias("exact_d2"),
            "adc_rank",
        )
    )
    we = W.partitionBy("q_id").orderBy("exact_d2", "neighbor_id")
    return exact.withColumn("exact_rank", F.row_number().over(we))


HARD_NEG_K = 3


@query(
    "q_hard_negatives",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS q_id, label AS q_label, embedding AS q_emb
        FROM embeddings WHERE vec_id < {N_QUERIES} AND {EMB_DOOR_SQL}
    ),
    scored AS (
        SELECT q.q_id, q.q_label, e.vec_id AS neg_id, e.label AS neg_label,
               ROUND(
                 list_dot_product(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]) /
                 (SQRT(list_dot_product(q.q_emb::DOUBLE[], q.q_emb::DOUBLE[])) *
                  SQRT(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
                 4) AS cos_sim
        FROM q, embeddings e
        WHERE e.vec_id <> q.q_id AND e.label <> q.q_label
          AND {emb_door_sql('e.embedding')}
    )
    SELECT q_id, q_label, neg_id, neg_label, cos_sim, rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY q_id ORDER BY cos_sim DESC, neg_id ASC
        ) AS rank
        FROM scored
    ) r
    WHERE rank <= {HARD_NEG_K}
    """,
    tags=("similarity", "X3", "training-pairs", "hard-negatives"),
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for retrieval/embedding training: for each
    query vector, the top-k most cosine-similar vectors with a DIFFERENT
    label — the near-miss examples contrastive training needs (easy
    random negatives teach nothing; hard negatives carry the gradient).
    The label-inequality predicate is the only difference from plain kNN,
    which is exactly how a production miner runs: same index, inverted
    filter.

    Scale: identical to the brute-force kNN plan — query set broadcasts,
    corpus scores map-side, top-k survives per partition before the
    exchange; swap in the IVF/LSH/PQ index paths for large corpora, with
    the label filter applied to candidates before the exact re-rank.
    """
    e = embedding_door(load_tables(spark, sf_dir, ("embeddings",))["embeddings"])
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter((F.col("vec_id") != F.col("q_id")) & (F.col("label") != F.col("q_label")))
        .select(
            "q_id",
            "q_label",
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            F.round(_cosine(F.col("q_emb"), F.col("embedding")), 4).alias("cos_sim"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neg_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= HARD_NEG_K)
        .select("q_id", "q_label", "neg_id", "neg_label", "cos_sim", "rank")
    )


@query(
    "q_embedding_centroid_health",
    oracle=f"""
    WITH dims AS (
        SELECT vec_id, label, i AS dim, embedding[i]::DOUBLE AS x
        FROM embeddings, UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS g(i)
    ),
    cent AS (
        SELECT label, dim, AVG(x) AS c
        FROM dims GROUP BY label, dim
    ),
    dist AS (
        SELECT d.vec_id, d.label,
               SQRT(SUM((d.x - c.c) * (d.x - c.c))) AS dist_to_centroid
        FROM dims d JOIN cent c ON d.label = c.label AND d.dim = c.dim
        GROUP BY d.vec_id, d.label
    ),
    cnorm AS (
        SELECT label, SQRT(SUM(c * c)) AS centroid_norm FROM cent GROUP BY label
    )
    SELECT d.label,
           COUNT(*) AS n_vecs,
           {stable_round_sql("ANY_VALUE(cn.centroid_norm)")} AS centroid_norm,
           {stable_round_sql("AVG(d.dist_to_centroid)")} AS avg_dist,
           {stable_round_sql("MAX(d.dist_to_centroid)")} AS max_dist
    FROM dist d JOIN cnorm cn ON d.label = cn.label
    GROUP BY d.label
    """,
    tags=("similarity", "X3", "embedding-qa"),
)
def q_embedding_centroid_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space health check: per-label centroid norm and the
    dispersion of members around it (mean/max L2 distance) — the drift
    monitor an embedding pipeline runs after each encoder change or
    re-index: collapsing clusters (avg_dist -> 0), exploding ones, or a
    centroid wandering toward the origin all show up here before ANN
    recall degrades.

    Scale: two shuffles on bounded keys — (label, dim) for the centroid
    (cardinality = labels x 64, tiny) and (vec_id) for the per-vector
    distance fold; the centroid table broadcasts back. The explode is
    64 rows per vector but never leaves the map stage before its
    aggregate; the array-fold alternative (zip_with against a broadcast
    centroid array) halves shuffle bytes at cluster scale and is the
    documented upgrade path.

    Determinism contract (r12): stable_round — plain 4-decimal rounding
    in the sane region (|x| < 1e6, bit-identical to the pre-r12 report),
    float32-grid snap beyond it. Summation-order low bits (~1e-12
    relative on a 1e30-dominated fold) are absorbed by whichever grid
    applies, so the report is engine-identical at EVERY magnitude — the
    pre-r12 form was the registry's one documented cross-engine hash
    exception, retired per the r11 verdict (#3).
    """
    # DELIBERATELY un-doored and un-quantized: applying sat_quantize or
    # embedding_door here would CLAMP or DROP the very 1e30-magnitude
    # outliers this health check exists to surface. stable_round keeps
    # the magnitude (a planted 1e30 still explodes max_dist — pinned by
    # tests/test_adversarial_inputs.py::
    # test_centroid_health_order_stable_and_still_detecting) while
    # making the fold-order noise sub-grid on both engines.
    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    dims = e.select(
        "vec_id",
        "label",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))),
    ).select("vec_id", "label", (F.col("pos") + 1).alias("dim"), F.col("col").alias("x"))
    cent = dims.groupBy("label", "dim").agg(F.avg("x").alias("c"))
    dist = (
        dims.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(F.sqrt(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))).alias("dist_to_centroid"))
    )
    cnorm = cent.groupBy("label").agg(F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("centroid_norm"))
    return (
        dist.join(F.broadcast(cnorm), "label")
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            stable_round(F.any_value("centroid_norm")).alias("centroid_norm"),
            stable_round(F.avg("dist_to_centroid")).alias("avg_dist"),
            stable_round(F.max("dist_to_centroid")).alias("max_dist"),
        )
    )


# --- Embedding ingest contract validation ------------------------------------

EMB_GRID_BOUND = 1_000_000.0  # |component| beyond this saturates the int grid


@query(
    "q_dq_embedding_contract",
    # The validator an embedding pipeline runs AT INGEST — it surfaces
    # exactly the poison rows the r8 adversarial campaign hunted: NULL
    # payloads, dimension drift (vs the corpus's modal dim), zero-norm
    # vectors (undefined cosine), non-finite components, and components
    # beyond the integer-grid saturation bound (functions/grid.py).
    # Downstream consumers (kNN, PQ, IVF, SemDeDup) keep their
    # fixed-dim contract because this gate runs first.
    oracle=f"""
    WITH dims AS (
        SELECT LEN(embedding) AS d, COUNT(*) AS n FROM embeddings
        WHERE embedding IS NOT NULL GROUP BY 1
    ),
    modal AS (SELECT d FROM dims ORDER BY n DESC, d ASC LIMIT 1),
    checks AS (
        SELECT e.vec_id,
               e.embedding IS NULL AS is_null,
               e.embedding IS NOT NULL AND LEN(e.embedding) <> m.d AS dim_violation,
               e.embedding IS NOT NULL AND COALESCE(list_bool_or(
                   list_transform(e.embedding, x -> isnan(x) OR isinf(x))
               ), FALSE) AS nonfinite,
               e.embedding IS NOT NULL AND COALESCE(NOT list_bool_or(
                   list_transform(e.embedding, x -> x <> 0)
               ), TRUE) AS zero_norm,
               e.embedding IS NOT NULL AND COALESCE(list_bool_or(
                   list_transform(e.embedding, x -> ABS(x) > {EMB_GRID_BOUND})
               ), FALSE) AS out_of_grid
        FROM embeddings e CROSS JOIN modal m
    )
    SELECT CAST(COUNT(*) AS BIGINT)                                   AS n_vecs,
           CAST((SELECT d FROM modal) AS BIGINT)                      AS modal_dim,
           CAST(SUM(CASE WHEN is_null THEN 1 ELSE 0 END) AS BIGINT)   AS n_null,
           CAST(SUM(CASE WHEN dim_violation THEN 1 ELSE 0 END) AS BIGINT) AS n_dim_violations,
           CAST(SUM(CASE WHEN nonfinite THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
           CAST(SUM(CASE WHEN zero_norm THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_norm,
           CAST(SUM(CASE WHEN out_of_grid THEN 1 ELSE 0 END) AS BIGINT) AS n_out_of_grid,
           CAST(SUM(CASE WHEN NOT (is_null OR dim_violation OR nonfinite
                                   OR zero_norm OR out_of_grid)
                         THEN 1 ELSE 0 END) AS BIGINT)                AS n_clean
    FROM checks
    """,
    tags=("similarity", "X3", "dq", "embedding-qa", "contract"),
)
def q_dq_embedding_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding ingest-contract report: one row of corpus-level counts
    for every vector defect class that would otherwise surface as a
    mid-job crash or silent ranking corruption downstream — NULL
    embeddings, dimension drift vs the modal dim, non-finite
    components, zero-norm vectors (cosine undefined; excluded by the
    try_divide NULL convention), and components past the integer-grid
    saturation bound. Run this BEFORE the kNN/PQ/IVF/SemDeDup family;
    their fixed-dim, finite-value contract is enforced here, once.

    Scale: one narrow map pass over the corpus (every check is a
    per-row array fold) plus a dimension histogram whose cardinality is
    the number of distinct dims (~1); the final aggregate is a single
    row. No shuffle of vector payloads.
    """
    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    emb = F.col("embedding")
    dims = (
        e.filter(emb.isNotNull())
        .groupBy(F.size(emb).alias("d"))
        .agg(F.count("*").alias("n"))
    )
    modal = dims.orderBy(F.desc("n"), F.asc("d")).limit(1).select("d")
    isfinite_bad = F.exists(
        emb, lambda x: F.isnan(x.cast("double")) | (F.abs(x) > F.lit(float("1e308")))
    )
    checks = e.crossJoin(F.broadcast(modal)).select(
        F.col("d"),
        emb.isNull().alias("is_null"),
        (emb.isNotNull() & (F.size(emb) != F.col("d"))).alias("dim_violation"),
        (emb.isNotNull() & F.coalesce(isfinite_bad, F.lit(False))).alias("nonfinite"),
        (
            emb.isNotNull()
            & F.coalesce(~F.exists(emb, lambda x: x != 0), F.lit(True))
        ).alias("zero_norm"),
        (
            emb.isNotNull()
            & F.coalesce(
                F.exists(emb, lambda x: F.abs(x) > F.lit(EMB_GRID_BOUND)),
                F.lit(False),
            )
        ).alias("out_of_grid"),
    )
    flag = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0)).cast("long")  # noqa: E731
    return checks.agg(
        F.count("*").alias("n_vecs"),
        F.first(F.col("d")).cast("long").alias("modal_dim"),
        flag("is_null").alias("n_null"),
        flag("dim_violation").alias("n_dim_violations"),
        flag("nonfinite").alias("n_nonfinite"),
        flag("zero_norm").alias("n_zero_norm"),
        flag("out_of_grid").alias("n_out_of_grid"),
        F.sum(
            F.when(
                ~(
                    F.col("is_null")
                    | F.col("dim_violation")
                    | F.col("nonfinite")
                    | F.col("zero_norm")
                    | F.col("out_of_grid")
                ),
                1,
            ).otherwise(0)
        ).cast("long").alias("n_clean"),
    )


# --- Per-dimension embedding profile ------------------------------------------

from etl_pipeline_spark.functions.grid import sat_quantize_sql  # noqa: E402

DIMP_SCALE = 1000  # milli-unit grid for the per-dim sums


@query(
    "q_embedding_dim_profile",
    # The per-DIMENSION companion to q_dq_embedding_contract's per-row
    # gate: corpus statistics for every embedding dimension on the
    # saturating milli-unit grid (exact integer sums -> deterministic
    # moments), flagging dead (constant) dimensions — the degenerate
    # axes that silently waste PQ codebook bits and IVF cell resolution.
    oracle=f"""
    WITH comp AS (
        SELECT i AS dim,
               {sat_quantize_sql("embedding[i]", DIMP_SCALE)} AS q
        FROM embeddings, UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS s(i)
        WHERE embedding IS NOT NULL
    ),
    agg AS (
        SELECT dim,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(q) AS BIGINT) AS sx,
               -- HUGEINT accumulation (Spark: DECIMAL(38,0)): saturated
               -- q=1e6 squares to 1e12, so n*sxx ~ n^2*1e12 ANSI-overflows
               -- BIGINT past ~3M vectors (advisor find, r8)
               SUM(CAST(q AS HUGEINT) * q) AS sxx,
               CAST(MIN(q) AS BIGINT) AS min_milli,
               CAST(MAX(q) AS BIGINT) AS max_milli,
               CAST(SUM(CASE WHEN q = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
        FROM comp GROUP BY dim
    )
    SELECT CAST(dim AS BIGINT) AS dim, n,
           ROUND(sx / (1.0 * n), 4)                              AS mean_milli,
           -- NULLIF: a dimension observed in exactly one vector (drift)
           -- must yield NULL on both engines, not Spark-NaN vs DuckDB-NULL
           ROUND(SQRT((n * sxx - CAST(sx AS HUGEINT) * sx)
                      / NULLIF(1.0 * n * (n - 1), 0)), 4)
                                                                  AS std_milli,
           min_milli, max_milli,
           ROUND(n_zero / (1.0 * n), 4)                          AS zero_frac,
           (min_milli = max_milli)                                AS dead_dim
    FROM agg
    """,
    tags=("similarity", "X3", "dq", "embedding-qa"),
)
def q_embedding_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding profile: count, mean/std (milli-unit
    saturating grid — integer sums, so the moments are exact and
    engine-identical), min/max, zero fraction, and a dead-dimension
    flag for every embedding axis. Dead or near-constant dimensions
    waste PQ codebook bits and IVF cell resolution; this is the
    column-wise companion the per-row contract gate
    (q_dq_embedding_contract) cannot see.

    Scale: one posexplode map pass over the embedding column and a
    dim-keyed aggregate — the group count equals the dimensionality
    (~64), so the shuffle is a few integer sums per partition per dim.
    """
    from etl_pipeline_spark.functions.grid import sat_quantize

    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    comp = e.filter(F.col("embedding").isNotNull()).select(
        F.posexplode("embedding").alias("pos", "x")
    ).select((F.col("pos") + 1).alias("dim"), sat_quantize(F.col("x"), DIMP_SCALE).alias("q"))
    agg = comp.groupBy("dim").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("q").cast("long").alias("sx"),
        # DECIMAL(38,0) accumulation (oracle: HUGEINT): saturated q=1e6
        # squares to 1e12, so n*sxx ~ n^2*1e12 ANSI-overflows BIGINT past
        # ~3M vectors (advisor find, r8)
        F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("sxx"),
        F.min("q").cast("long").alias("min_milli"),
        F.max("q").cast("long").alias("max_milli"),
        F.sum(F.when(F.col("q") == 0, 1).otherwise(0)).cast("long").alias("n_zero"),
    )
    # try_divide: a dimension observed in exactly one vector (drift) has
    # n*(n-1)=0 — must yield NULL on both engines, not Spark-NaN vs
    # DuckDB-NULL (advisor find, r8)
    var = F.try_divide(
        F.col("n").cast("decimal(38,0)") * F.col("sxx")
        - F.col("sx").cast("decimal(38,0)") * F.col("sx"),
        1.0 * F.col("n") * (F.col("n") - 1),
    )
    return agg.select(
        F.col("dim").cast("long").alias("dim"),
        "n",
        F.round(F.col("sx") / (1.0 * F.col("n")), 4).alias("mean_milli"),
        F.round(F.sqrt(var), 4).alias("std_milli"),
        "min_milli",
        "max_milli",
        F.round(F.col("n_zero") / (1.0 * F.col("n")), 4).alias("zero_frac"),
        (F.col("min_milli") == F.col("max_milli")).alias("dead_dim"),
    )
