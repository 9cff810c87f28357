"""IVF-style approximate nearest neighbor — SURVEY.md §2.12 X3 scale path.

Classic inverted-file search: coarse-quantize the corpus into cells,
route each query to its nearest cells (nprobe=2), run exact cosine only
inside the probed cells. Here the cells are the embedding table's label
partitions and the coarse quantizer is the per-cell centroid.

Deterministic by construction — centroid components and distances are
rounded before any ranking, ties break on ids — so the WHOLE pipeline
(centroid build -> cell routing -> in-cell exact search) is
oracle-checkable in DuckDB, unusual for an ANN index.

Scale: centroids are tiny (cells x dims) and broadcast; the corpus is
scanned once per query batch WITHIN probed cells only (a partition-pruned
scan when the table is partitioned by cell); the final top-k is a window
over candidates, not the full corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_pipeline_spark.catalog import EMB_DOOR_SQL, emb_door_sql, embedding_door, load_tables

N_QUERIES = 10
N_PROBE = 2
TOP_K = 5
CENTROID_ROUND = 6
DIST_ROUND = 4

# Above this many (q_id, cell) probe pairs the driver-side collect that
# feeds the static isin partition filter is no longer cheap; switch to a
# broadcast semi-join on the partition column, which Spark's dynamic
# partition pruning turns into a runtime partition filter instead.
PROBE_COLLECT_CAP = 10_000


def _probed_index_scan(
    spark: SparkSession,
    index_path: str,
    probed: DataFrame,
    expected_pairs: int,
    cap: int = PROBE_COLLECT_CAP,
) -> DataFrame:
    """Scan of the cell-partitioned index restricted to probed cells.

    Small probe sets (the common case: queries x nprobe pairs) collect the
    distinct cell list and push a static ``isin`` partition filter — fully
    pruned at plan time. Probe sets above ``cap`` never touch the driver:
    a broadcast LEFT SEMI join on the partition column filters the scan,
    and dynamic partition pruning applies the same directory-level skip at
    runtime."""
    if expected_pairs <= cap:
        cells = sorted(r["cell"] for r in probed.select("cell").distinct().collect())
        return spark.read.parquet(index_path).filter(F.col("cell").isin(cells))
    return spark.read.parquet(index_path).join(
        F.broadcast(probed.select("cell").distinct()), "cell", "leftsemi"
    )


def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = embedding_door(load_tables(spark, sf_dir, ("embeddings",))["embeddings"])
    exploded = e.select(
        "vec_id",
        "label",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias("pos", "val"),
    )
    centroids = exploded.groupBy("label", "pos").agg(
        F.round(F.avg("val"), CENTROID_ROUND).alias("cval")
    )
    qv = exploded.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "pos", "val"
    )
    # squared L2 of each query to each cell centroid
    dists = (
        qv.join(centroids.withColumnRenamed("label", "cell"), "pos")
        .groupBy("q_id", "cell")
        .agg(F.round(F.sum((F.col("val") - F.col("cval")) ** 2), DIST_ROUND).alias("d2"))
    )
    wprobe = W.partitionBy("q_id").orderBy(F.col("d2").asc(), F.col("cell").asc())
    probed = dists.withColumn("cell_rank", F.row_number().over(wprobe)).filter(
        F.col("cell_rank") <= N_PROBE
    )
    # exact cosine only inside probed cells
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    emb_d = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(emb_d(a), emb_d(b), lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    cand = (
        e.withColumnRenamed("label", "cell")
        .join(probed.select("q_id", "cell"), "cell")
        .join(q, "q_id")
        .filter(F.col("vec_id") != F.col("q_id"))
    )
    scored = cand.select(
        "q_id",
        F.col("vec_id").alias("neighbor_id"),
        F.col("cell").alias("neighbor_cell"),
        F.round(
            # try_divide: zero-norm embedding -> NULL cos (ranks last,
            # = DuckDB's double 0/0), not an ANSI job kill
            F.try_divide(
                dot(F.col("q_emb"), F.col("embedding")),
                F.sqrt(dot(F.col("q_emb"), F.col("q_emb")))
                * F.sqrt(dot(F.col("embedding"), F.col("embedding"))),
            ),
            DIST_ROUND,
        ).alias("cos_sim"),
    )
    wk = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "neighbor_id", "neighbor_cell", "cos_sim", "rnk")
    )


def write_ivf_index(spark: SparkSession, sf_dir: str, index_path: str) -> None:
    """Materialize the on-disk IVF layout: the embedding table written
    partitioned by cell (Hive ``cell=<label>`` directories), so a probed
    search scans ONLY the probed cells' files — partition pruning turns
    the 'scan within probed cells' claim into a physical fact at any
    scale. One shuffle at build time buys pruned scans on every query."""
    e = embedding_door(load_tables(spark, sf_dir, ("embeddings",))["embeddings"])
    (
        e.withColumnRenamed("label", "cell")
        .repartition("cell")  # one output file per cell, not files*cells
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(index_path)
    )


def ivf_topk_indexed(
    spark: SparkSession,
    sf_dir: str,
    index_path: str,
    probe_collect_cap: int = PROBE_COLLECT_CAP,
) -> DataFrame:
    """IVF search against the partitioned index: identical semantics (and
    results) to :func:`ivf_topk`, but the in-cell candidate scan reads the
    ``cell=...`` partitions of ``index_path`` restricted to the probed
    cells — a partition-pruned scan (assertable via
    ``plans.assert_partition_pruned``) instead of a full-corpus read.

    The probed-cell restriction is size-guarded (``probe_collect_cap``):
    small probe sets collect to a static isin filter, large ones stay
    distributed via a broadcast semi-join (see :func:`_probed_index_scan`)."""
    e = embedding_door(load_tables(spark, sf_dir, ("embeddings",))["embeddings"])
    exploded = e.select(
        "vec_id",
        "label",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias("pos", "val"),
    )
    centroids = exploded.groupBy("label", "pos").agg(
        F.round(F.avg("val"), CENTROID_ROUND).alias("cval")
    )
    qv = exploded.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "pos", "val"
    )
    dists = (
        qv.join(centroids.withColumnRenamed("label", "cell"), "pos")
        .groupBy("q_id", "cell")
        .agg(F.round(F.sum((F.col("val") - F.col("cval")) ** 2), DIST_ROUND).alias("d2"))
    )
    wprobe = W.partitionBy("q_id").orderBy(F.col("d2").asc(), F.col("cell").asc())
    probed = dists.withColumn("cell_rank", F.row_number().over(wprobe)).filter(
        F.col("cell_rank") <= N_PROBE
    )
    # the partition-pruned scan: only cell=<probed> directories are read
    index = _probed_index_scan(
        spark, index_path, probed, expected_pairs=N_QUERIES * N_PROBE, cap=probe_collect_cap
    )

    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    emb_d = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(emb_d(a), emb_d(b), lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    cand = (
        index.join(probed.select("q_id", "cell"), "cell")
        .join(F.broadcast(q), "q_id")
        .filter(F.col("vec_id") != F.col("q_id"))
    )
    scored = cand.select(
        "q_id",
        F.col("vec_id").alias("neighbor_id"),
        F.col("cell").alias("neighbor_cell"),
        F.round(
            # try_divide: zero-norm embedding -> NULL cos (ranks last,
            # = DuckDB's double 0/0), not an ANSI job kill
            F.try_divide(
                dot(F.col("q_emb"), F.col("embedding")),
                F.sqrt(dot(F.col("q_emb"), F.col("q_emb")))
                * F.sqrt(dot(F.col("embedding"), F.col("embedding"))),
            ),
            DIST_ROUND,
        ).alias("cos_sim"),
    )
    wk = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "neighbor_id", "neighbor_cell", "cos_sim", "rnk")
    )


IVF_ORACLE = f"""
WITH exploded AS (
    SELECT vec_id, label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS val
    FROM embeddings, UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS t(i)
    WHERE {EMB_DOOR_SQL}
),
centroids AS (
    SELECT label AS cell, pos, ROUND(AVG(val), {CENTROID_ROUND}) AS cval
    FROM exploded GROUP BY label, pos
),
qv AS (
    SELECT vec_id AS q_id, pos, val FROM exploded WHERE vec_id < {N_QUERIES}
),
dists AS (
    SELECT qv.q_id, c.cell, ROUND(SUM((qv.val - c.cval) * (qv.val - c.cval)), {DIST_ROUND}) AS d2
    FROM qv JOIN centroids c ON qv.pos = c.pos
    GROUP BY qv.q_id, c.cell
),
probed AS (
    SELECT q_id, cell FROM (
        SELECT q_id, cell,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY d2 ASC, cell ASC) AS cell_rank
        FROM dists
    ) WHERE cell_rank <= {N_PROBE}
),
q AS (
    SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
    WHERE vec_id < {N_QUERIES} AND {EMB_DOOR_SQL}
),
scored AS (
    SELECT p.q_id, e.vec_id AS neighbor_id, e.label AS neighbor_cell,
           ROUND(
             list_dot_product(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]) /
             (SQRT(list_dot_product(q.q_emb::DOUBLE[], q.q_emb::DOUBLE[])) *
              SQRT(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
             {DIST_ROUND}) AS cos_sim
    FROM probed p
    JOIN embeddings e ON e.label = p.cell AND {emb_door_sql('e.embedding')}
    JOIN q ON q.q_id = p.q_id
    WHERE e.vec_id <> p.q_id
)
SELECT q_id, neighbor_id, neighbor_cell, cos_sim, rnk FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id ASC
    ) AS rnk
    FROM scored
) WHERE rnk <= {TOP_K}
"""
