"""SemDeDup building blocks (Abbas et al. 2023): deterministic centroid
construction, argmax-cosine cluster assignment, and centroid-aware
near-duplicate pruning — reusable over any (id, vector) DataFrame.
queries/dedup.py:q_semdedup_clusters composes these against the fixture
embeddings and oracle-checks every step.

Determinism contract (what makes the pipeline engine-reproducible):
- centroids are means of deterministic seed groups (id % k), computed
  from HALF-UP-QUANTIZED integer sums — integer addition is
  order-independent where double AVG is not;
- dot products are sequential folds over the vector, identical in any
  engine that folds left-to-right;
- assignment ties break on the cluster id.

Scale: centroids are k x dims and broadcast; assignment is a map-side
broadcast join (the corpus never shuffles for it); the quadratic pair
stage is confined within clusters, with k as the knob that bounds
cluster size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from etl_pipeline_spark.functions.grid import sat_quantize

SEM_QUANT = 10000  # centroid quantization denominator


def vec_dot(x: Column, y: Column) -> Column:
    """Sequential-fold dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, v: acc + v
    )


def vec_cosine(x: Column, y: Column) -> Column:
    # try_divide: a zero-norm vector makes cosine undefined — NULL (ranks
    # last, matching DuckDB's double-div-by-zero), not an ANSI crash that
    # would kill the job on one degenerate row (adversarial-fixture find).
    return F.try_divide(vec_dot(x, y), F.sqrt(vec_dot(x, x)) * F.sqrt(vec_dot(y, y)))


def seed_centroids(
    emb: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "v"
) -> DataFrame:
    """Per-seed-group (id % k) dimension-wise means as (seed, cv) rows,
    bit-reproducible via quantized integer sums."""
    comp = emb.select(
        (F.col(id_col) % k).alias("seed"), F.posexplode(vec_col).alias("pos0", "val")
    )
    # sat_quantize (functions/grid.py): saturate extreme components on
    # the shared grid instead of overflowing the long sum under ANSI
    cent = comp.groupBy("seed", "pos0").agg(
        F.sum(sat_quantize(F.col("val"), SEM_QUANT)).alias("qsum"),
        F.count("*").alias("n"),
    )
    return (
        cent.select(
            "seed",
            F.struct(
                "pos0", (F.col("qsum") / (float(SEM_QUANT) * F.col("n"))).alias("c")
            ).alias("pc"),
        )
        .groupBy("seed")
        .agg(F.array_sort(F.collect_list("pc")).alias("pcs"))
        .select("seed", F.transform("pcs", lambda s: s["c"]).alias("cv"))
    )


def semdedup_assign(
    emb: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "v"
) -> DataFrame:
    """Assign each vector to its argmax-cosine centroid: returns
    (id, v, cluster, cosc) with cosc rounded to 6 decimals."""
    cvec = seed_centroids(emb, k, id_col, vec_col)
    cosc = vec_cosine(F.col(vec_col), F.col("cv"))
    wr = W.partitionBy(id_col).orderBy(F.col("raw_cos").desc(), F.col("seed").asc())
    return (
        emb.crossJoin(F.broadcast(cvec))
        .select(id_col, vec_col, "seed", cosc.alias("raw_cos"))
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") == 1)
        .select(
            id_col,
            vec_col,
            F.col("seed").alias("cluster"),
            F.round("raw_cos", 6).alias("cosc"),
        )
    )


def semdedup_pairs(
    assign: DataFrame, id_col: str = "vec_id", vec_col: str = "v"
) -> DataFrame:
    """Within-cluster candidate pairs with their cosine (rounded to 4)
    and both members' centroid cosines — the blocked quadratic stage.

    r6 derivation: the cluster-keyed SELF-JOIN shuffled every embedding
    vector through the join exchange TWICE (the wide-shuffle audit flag,
    tools/plan_audit.py); instead, each cluster's members are gathered
    once (one shuffle of the vectors) and 2-combinations stream out of
    two chained explodes — posexplode anchors a member, the tail slice
    explodes its partners — so peak per-row memory is O(cluster size),
    never O(cluster^2). Cluster size is the SemDeDup design knob (K
    grows with the corpus to hold it constant), so the gathered-members
    row is bounded; the quadratic pair WORK is inherent to the
    algorithm and unchanged. Members sort by (id, cosc, vec), ids are
    unique, so anchor < partner reproduces the vec_a < vec_b contract."""
    grouped = assign.groupBy("cluster").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(id_col).alias("i"),
                    F.col("cosc").alias("c"),
                    F.col(vec_col).alias("w"),
                )
            )
        ).alias("ms")
    )
    anchored = grouped.select("cluster", "ms", F.posexplode("ms").alias("ix", "ma"))
    pairs = anchored.select(
        "cluster",
        "ma",
        F.explode(F.slice("ms", F.col("ix") + F.lit(2), F.size("ms"))).alias("mb"),
    )
    return pairs.select(
        "cluster",
        F.col("ma.i").alias("vec_a"),
        F.col("mb.i").alias("vec_b"),
        F.col("ma.c").alias("cosc_a"),
        F.col("mb.c").alias("cosc_b"),
        F.round(vec_cosine(F.col("ma.w"), F.col("mb.w")), 4).alias("cos_ab"),
    )


def semdedup_pruned(pairs: DataFrame, tau: float) -> DataFrame:
    """Vectors pruned by the SemDeDup rule: in every near-dup pair
    (cos >= tau) drop the member CLOSER to the centroid (keep the "edge"
    example; ties drop the higher id). Returns distinct (cluster, pruned)."""
    return (
        pairs.filter(F.col("cos_ab") >= tau)
        .select(
            "cluster",
            F.when(F.col("cosc_a") > F.col("cosc_b"), F.col("vec_a"))
            .when(F.col("cosc_b") > F.col("cosc_a"), F.col("vec_b"))
            .otherwise(F.greatest("vec_a", "vec_b"))
            .alias("pruned"),
        )
        .distinct()
    )
