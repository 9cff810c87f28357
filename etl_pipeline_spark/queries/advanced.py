"""Advanced relational surface, batch 2 — as-of join, grouping sets,
RANGE window frames, first/last/nth, ordered string aggregation,
deterministic hash sampling, posexplode, union-by-name with missing
columns. Fills the remaining SURVEY.md §2.5-2.7 / custom-operator rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_pipeline_spark.catalog import load_tables
from etl_pipeline_spark.queries.base import query


@query(
    "q_asof_last_signup",
    oracle="""
    SELECT event_id, user_id, event_type,
           epoch_us(MAX(CASE WHEN event_type = 'signup' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )) AS last_signup_us
    FROM events
    """,
    tags=("asof", "window", "custom-op"),
)
def q_asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (an operator Spark lacks natively), expressed as a
    composition of built-ins (SURVEY custom-op preference (a)): for every
    event, the most recent at-or-before 'signup' of the same user — a
    running filtered-max window instead of a per-row lookup join.

    Scale: one shuffle on user_id; state is one timestamp per partition
    row — strictly better than the sort-merge-with-lookback an as-of
    join would otherwise need. (DuckDB's native ASOF JOIN is the oracle's
    alternative spelling; the window form is used for both here.)
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    last_signup = F.max(F.when(F.col("event_type") == "signup", F.unix_micros(F.col("ts")))).over(w)
    return e.select("event_id", "user_id", "event_type", last_signup.alias("last_signup_us"))


@query(
    "q_grouping_sets_revenue",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL')  AS returnflag,
           COALESCE(l_linestatus, 'ALL')  AS linestatus,
           ROUND((CAST(SUM(CAST(ROUND((l_extendedprice) * 100) AS DECIMAL(38,0))) AS DOUBLE) / 100), 2) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("agg", "grouping-sets"),
)
def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): per-flag, per-status,
    and grand-total rows in one pass."""
    load_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL')  AS returnflag,
               COALESCE(l_linestatus, 'ALL')  AS linestatus,
               ROUND((CAST(SUM(CAST(ROUND((l_extendedprice) * 100) AS DECIMAL(38,0))) AS DOUBLE) / 100), 2) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT o_orderkey,
           ROUND(o_totalprice, 2) AS totalprice,
           COUNT(*) OVER (
               ORDER BY o_totalprice
               RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW
           ) AS n_within_1000
    FROM orders
    WHERE o_custkey < 50
    """,
    tags=("window", "range-frame"),
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-based) window frame — peers counted by price distance,
    not row position. Unpartitioned global ordering kept small by the
    filter; at scale a partition key bounds the sort. (SQL form: the
    DataFrame ``rangeBetween`` API only accepts integer offsets through
    py4j, so fractional-capable RANGE frames go through Spark SQL.)"""
    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey,
               ROUND(o_totalprice, 2) AS totalprice,
               COUNT(*) OVER (
                   ORDER BY o_totalprice
                   RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW
               ) AS n_within_1000
        FROM orders
        WHERE o_custkey < 50
        """
    )


@query(
    "q_window_range_frame_partitioned",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           ROUND(o_totalprice, 2) AS totalprice,
           COUNT(*) OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice
               RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW
           ) AS n_within_1000
    FROM orders
    WHERE o_custkey < 500
    """,
    tags=("window", "range-frame", "partitioned", "new-r3"),
)
def q_window_range_frame_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped twin of q_window_range_frame: the same value-based
    RANGE frame, but PARTITION BY o_custkey bounds each sort to one
    customer's orders — no single-partition WindowExec, so the plan holds
    at any scale (the global variant needs its selective filter to stay
    viable; this one needs nothing). Plan-asserted partitioned in
    tests/test_plan_assertions.py."""
    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_custkey,
               o_orderkey,
               ROUND(o_totalprice, 2) AS totalprice,
               COUNT(*) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice
                   RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW
               ) AS n_within_1000
        FROM orders
        WHERE o_custkey < 500
        """
    )


@query(
    "q_window_first_last_nth",
    oracle="""
    SELECT DISTINCT o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey)  OVER w AS last_order,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WHERE o_custkey < 200
    WINDOW w AS (
        PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
    tags=("window", "first-last"),
)
def q_window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value/nth_value over a full-partition frame —
    deterministic because the frame is UNBOUNDED..UNBOUNDED and the
    ordering is total (orderkey tie-break)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        o.filter(F.col("o_custkey") < 200)
        .select(
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w).alias("last_order"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        )
        .distinct()
    )


@query(
    "q_ordered_string_agg",
    oracle="""
    SELECT n_regionkey AS regionkey,
           STRING_AGG(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n_nations
    FROM nation
    GROUP BY n_regionkey
    """,
    tags=("agg", "collect"),
)
def q_ordered_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect_list is unordered in a
    distributed engine, so determinism comes from array_sort before the
    join — equivalent to STRING_AGG(... ORDER BY)."""
    n = load_tables(spark, sf_dir, ("nation",))["nation"]
    return n.groupBy(F.col("n_regionkey").alias("regionkey")).agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
        F.count("*").alias("n_nations"),
    )


@query(
    "q_sample_hash_10pct",
    oracle="""
    SELECT COUNT(*) AS n_sampled,
           ROUND(AVG(o_totalprice), 2) AS avg_price
    FROM orders
    WHERE SUBSTR(MD5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
    tags=("sample",),
)
def q_sample_hash_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~12.5% hash sample (first md5 nibble in {0,1}) — the
    reproducible, engine-portable alternative to df.sample(), which draws
    from engine-specific RNG streams. Hash sampling also survives
    re-partitioning and incremental loads (same rows always sampled)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    nibble = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
    return o.filter(nibble.isin("0", "1")).agg(
        F.count("*").alias("n_sampled"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
    )


@query(
    "q_posexplode_tokens",
    oracle="""
    SELECT doc_id, i - 1 AS pos, STRING_SPLIT(text, ' ')[i] AS token
    FROM documents, UNNEST(GENERATE_SERIES(1, LEN(STRING_SPLIT(text, ' ')))) AS t(i)
    WHERE doc_id < 20
    """,
    tags=("explode", "S4"),
)
def q_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (UDTF surface, SURVEY §2.10): token stream with
    positions — the row-per-element form the JSON-array source (S4)
    needs after a multiLine read."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        d.filter(F.col("doc_id") < 20)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "token")
    )


@query(
    "q_union_by_name_missing",
    oracle="""
    SELECT party_key, acctbal, segment FROM (
        SELECT c_custkey AS party_key, ROUND(c_acctbal, 2) AS acctbal,
               c_mktsegment AS segment
        FROM customer WHERE c_acctbal > 9990
        UNION ALL
        SELECT s_suppkey AS party_key, ROUND(s_acctbal, 2) AS acctbal,
               CAST(NULL AS VARCHAR) AS segment
        FROM supplier WHERE s_acctbal > 9990
    )
    """,
    tags=("setop", "union-by-name"),
)
def q_union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): schema-mismatched sources
    conformed by name, absent columns null-filled — the schema-drift-safe
    union for evolving sources."""
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    c = t["customer"].filter(F.col("c_acctbal") > 9990).select(
        F.col("c_custkey").alias("party_key"),
        F.round("c_acctbal", 2).alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )
    s = t["supplier"].filter(F.col("s_acctbal") > 9990).select(
        F.col("s_suppkey").alias("party_key"),
        F.round("s_acctbal", 2).alias("acctbal"),
    )
    return c.unionByName(s, allowMissingColumns=True)


@query(
    "q_embedding_norms",
    oracle="""
    SELECT vec_id, label,
           CAST(LEN(embedding) AS BIGINT) AS n_dims,
           ROUND(SQRT(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 4)
               AS l2_norm,
           ROUND(list_max(list_transform(embedding::DOUBLE[], x -> ABS(x))), 4)
               AS max_abs
    FROM embeddings
    """,
    tags=("similarity", "X3", "array"),
)
def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector hygiene stats (norm, max component) — the pre-flight checks
    of an embedding pipeline, as pure array expressions."""
    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(emb_d, emb_d, lambda x, y: x * y), F.lit(0.0), lambda a, v: a + v
    )
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("n_dims"),
        F.round(F.sqrt(dot), 4).alias("l2_norm"),
        F.round(F.array_max(F.transform(emb_d, lambda x: F.abs(x))), 4).alias("max_abs"),
    )


# Block-matrix kNN (operators/similarity.py): Pandas-UDF numpy path whose
# exact results must equal the pure-expression brute force — same oracle.
from etl_pipeline_spark.operators.similarity import knn_block_matrix  # noqa: E402
from etl_pipeline_spark.queries.similarity import N_QUERIES, TOP_K  # noqa: E402


@query(
    "q_knn_block_matrix",
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
    tags=("similarity", "X3", "pandas-udf"),
    doc=knn_block_matrix.__doc__ or "",
)
def q_knn_block_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return knn_block_matrix(spark, sf_dir, n_queries=N_QUERIES, top_k=TOP_K)


# IVF ANN (operators/ivf.py): deterministic coarse-quantized search whose
# full pipeline — centroids, cell routing, in-cell exact top-k — the
# DuckDB oracle reproduces.
from etl_pipeline_spark.operators.ivf import IVF_ORACLE, ivf_topk  # noqa: E402

query(
    "q_knn_ivf",
    oracle=IVF_ORACLE,
    tags=("similarity", "X3", "ivf", "ann"),
    doc=ivf_topk.__doc__ or "IVF-style ANN with nprobe=2 over label cells.",
)(ivf_topk)


@query(
    "q_window_sliding_events",
    oracle="""
    WITH offsets AS (SELECT UNNEST([0, 1]) AS k),
    assigned AS (
        SELECT DATE_TRUNC('hour', e.ts) - TO_HOURS(o.k) AS wstart,
               e.value
        FROM events e CROSS JOIN offsets o
        WHERE e.ts >= DATE_TRUNC('hour', e.ts) - TO_HOURS(o.k)
          AND e.ts <  DATE_TRUNC('hour', e.ts) - TO_HOURS(o.k) + INTERVAL 2 HOUR
    )
    SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events, ROUND((CAST(SUM(CAST(ROUND((value) * 100) AS DECIMAL(38,0))) AS DOUBLE) / 100), 2) AS sum_value
    FROM assigned
    GROUP BY wstart
    """,
    tags=("window", "streaming", "sliding"),
)
def q_window_sliding_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (2h window, 1h slide): every event lands
    in two overlapping frames — Spark's window(ts, '2 hours', '1 hour')
    operator; the oracle reproduces the assignment by exploding the two
    hour-aligned candidate starts per event (§2.9)."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.round(F.col("value") * 100).cast("decimal(38,0)")).cast("double") / 100, 2
            ).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_session_windows_batch",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ) > 300000000 OR LAG(ts) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ) IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts, event_id,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           epoch_us(MIN(ts)) AS session_start_us,
           epoch_us(MAX(ts)) AS session_end_us,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tags=("window", "streaming", "session", "gaps-islands"),
)
def q_session_windows_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (5-minute inactivity gap) in batch form — the
    gaps-and-islands pattern: flag gap-starts with LAG, number sessions
    with a running sum, aggregate per island. Semantically the batch twin
    of session_window()/streaming sessionization (§2.9), and fully
    oracle-checkable.

    Gap test and session bounds are in epoch MICROseconds on both engines:
    ``cast(ts as long)`` truncates to seconds, so a 300.4 s gap would read
    as "same session" while the oracle's interval compare says "new" —
    and raw timestamp output hashes differently under the driver's
    ns-preserving DuckDB fetch than under Spark's µs truncation."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    worder = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    us = F.unix_micros(F.col("ts"))
    prev_us = F.lag(us).over(worder)
    new_session = (prev_us.isNull() | (us - prev_us > 300_000_000)).cast("long")
    sessions = e.select(
        "user_id",
        us.alias("ts_us"),
        "event_id",
        F.sum(new_session).over(
            worder.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).alias("session_id"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.count("*").alias("n_events"),
    )


@query(
    "q_embedding_quantization",
    oracle="""
    WITH q AS (
        SELECT vec_id, label,
               list_max(list_transform(embedding::DOUBLE[], x -> ABS(x))) / 127.0 AS scale
        FROM embeddings
    ),
    err AS (
        SELECT e.vec_id, e.label, q.scale,
               list_sum(list_transform(
                   e.embedding::DOUBLE[],
                   x -> POW(x - FLOOR(x / q.scale + 0.5) * q.scale, 2)
               )) / LEN(e.embedding) AS mse
        FROM embeddings e JOIN q ON e.vec_id = q.vec_id
    )
    SELECT vec_id, label,
           ROUND(scale, 6)       AS int8_scale,
           ROUND(mse * 1e6, 4)   AS mse_ppm
    FROM err
    """,
    tags=("similarity", "X3", "quantization"),
)
def q_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization accounting: per-vector scale
    (max|x|/127) and reconstruction MSE of round-trip quantization — the
    pre-flight check before shipping a quantized ANN index. Rounding is an
    explicit FLOOR(x/scale + 0.5) so both engines quantize identically
    (library 'round' functions disagree on half-way ties)."""
    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(emb_d, lambda x: F.abs(x))) / 127.0
    with_scale = e.select("vec_id", "label", emb_d.alias("emb"), scale.alias("scale"))
    sq_err = F.aggregate(
        F.transform(
            F.col("emb"),
            lambda x: F.pow(
                x - F.floor(x / F.col("scale") + 0.5) * F.col("scale"), F.lit(2)
            ),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return with_scale.select(
        "vec_id",
        "label",
        F.round("scale", 6).alias("int8_scale"),
        F.round(sq_err / F.size("emb") * 1e6, 4).alias("mse_ppm"),
    )


@query(
    "q_approx_aggregates",
    # Self-verifying form (round 2): sketch estimates are engine-specific
    # by design, so the query emits its own error-bound verdicts computed
    # against the exact aggregates inside Spark; the oracle recomputes the
    # exact side and asserts the verdicts are all true. A sketch drifting
    # outside its contract (HLL++ rsd=2% given 3 sigma; KLL accuracy=10000
    # given 0.5% rank error on price) fails the hash.
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS hll_within_3rsd,
           TRUE AS median_within_rank_band
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "approx", "sketch"),
)
def q_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based aggregates — the 100 TB substitutes for exact distinct
    counts and percentiles: approx_count_distinct (HyperLogLog++) and
    approx_percentile (KLL-style), each verified in-query against its exact
    twin so the result is oracle-checkable despite engine-specific sketch
    internals."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median"),
        F.expr("percentile_cont(0.45) WITHIN GROUP (ORDER BY l_extendedprice)").alias("p45"),
        F.expr("percentile_cont(0.55) WITHIN GROUP (ORDER BY l_extendedprice)").alias("p55"),
    )
    hll_ok = (
        F.abs(F.col("approx_parts") - F.col("exact_parts"))
        <= 3 * 0.02 * F.col("exact_parts") + F.lit(1)
    )
    med_ok = F.col("approx_median").between(F.col("p45"), F.col("p55"))
    return agg.select(
        "l_returnflag",
        "exact_parts",
        hll_ok.alias("hll_within_3rsd"),
        med_ok.alias("median_within_rank_band"),
    )


@query(
    "q_hll_sketch_union",
    # Same self-verifying pattern as q_approx_aggregates: the sketch bytes
    # are engine-specific, so the query asserts its own error bound
    # in-engine and the oracle recomputes the exact side + TRUE verdicts.
    oracle="""
    SELECT n.n_regionkey AS n_regionkey,
           COUNT(*) AS exact_customers,
           TRUE AS hll_union_within_tol
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_regionkey
    """,
    tags=("agg", "approx", "sketch", "mergeable"),
)
def q_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches via hll_sketch_agg /
    hll_union_agg) — the 100 TB distinct-count pattern the scalar
    approx_count_distinct can't do: build per-nation sketch PARTIALS once,
    then re-aggregate them to any coarser grain (here region) by sketch
    UNION without touching the raw data again. At scale the partials are a
    few KB per group and live in a rollup table; every downstream
    distinct-count over any group-by subset is a driver-light merge.

    Exact twin: custkeys are unique, so per-region COUNT(*) is the true
    distinct count. Default lgConfigK=12 gives rsd ~1.6%; the verdict
    allows 3 sigma (+2 absolute for tiny groups)."""
    t = load_tables(spark, sf_dir, ("customer", "nation"))
    per_nation = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_regionkey", "n_nationkey")
        .agg(
            F.hll_sketch_agg("c_custkey").alias("sketch"),
            F.count("*").alias("exact_in_nation"),
        )
    )
    per_region = per_nation.groupBy("n_regionkey").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"),
        F.sum("exact_in_nation").alias("exact_customers"),
    )
    tol_ok = (
        F.abs(F.col("est") - F.col("exact_customers"))
        <= 3 * 0.016 * F.col("exact_customers") + F.lit(2)
    )
    return per_region.select(
        "n_regionkey",
        F.col("exact_customers").cast("long").alias("exact_customers"),
        tol_ok.alias("hll_union_within_tol"),
    )


@query(
    "q_unpivot_balance_metrics",
    oracle="""
    WITH wide AS (
        SELECT c_mktsegment,
               ROUND(MIN(c_acctbal), 2) AS min_bal,
               ROUND(AVG(c_acctbal), 2) AS avg_bal,
               ROUND(MAX(c_acctbal), 2) AS max_bal
        FROM customer GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, metric, value FROM (
        SELECT c_mktsegment, 'min_bal' AS metric, min_bal AS value FROM wide
        UNION ALL
        SELECT c_mktsegment, 'avg_bal', avg_bal FROM wide
        UNION ALL
        SELECT c_mktsegment, 'max_bal', max_bal FROM wide
    )
    """,
    tags=("unpivot", "melt"),
)
def q_unpivot_balance_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (the inverse of pivot): wide per-segment balance
    metrics into (segment, metric, value) long form via DataFrame.unpivot
    — the oracle spells it as the portable UNION ALL."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    wide = c.groupBy("c_mktsegment").agg(
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )
    return wide.unpivot(
        ids=["c_mktsegment"],
        values=["min_bal", "avg_bal", "max_bal"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "q_funnel_conversion",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup'   THEN ts END) AS t_signup,
               MIN(CASE WHEN event_type = 'click'    THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id
    ),
    staged AS (
        SELECT user_id,
               CASE
                 WHEN t_signup IS NOT NULL AND t_click > t_signup
                      AND t_purchase > t_click THEN 'signup>click>purchase'
                 WHEN t_signup IS NOT NULL AND t_click > t_signup THEN 'signup>click'
                 WHEN t_signup IS NOT NULL THEN 'signup'
                 ELSE 'no_signup'
               END AS funnel_stage
        FROM firsts
    )
    SELECT funnel_stage, COUNT(*) AS n_users
    FROM staged GROUP BY funnel_stage
    """,
    tags=("events", "funnel", "analytics"),
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: users' furthest ordered stage
    (signup -> later click -> later purchase), computed from per-type
    first-occurrence timestamps — one shuffle on user_id, conditional-min
    aggregation, no self-joins."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    stage = (
        F.when(
            F.col("t_signup").isNotNull()
            & (F.col("t_click") > F.col("t_signup"))
            & (F.col("t_purchase") > F.col("t_click")),
            "signup>click>purchase",
        )
        .when(
            F.col("t_signup").isNotNull() & (F.col("t_click") > F.col("t_signup")),
            "signup>click",
        )
        .when(F.col("t_signup").isNotNull(), "signup")
        .otherwise("no_signup")
    )
    return (
        firsts.select(stage.alias("funnel_stage"))
        .groupBy("funnel_stage")
        .agg(F.count("*").alias("n_users"))
    )


@query(
    "q_retention_cohorts",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, CAST(MIN(DATE_TRUNC('day', ts)) AS DATE) AS cohort_day
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_day,
               DATE_DIFF('day', f.cohort_day, CAST(DATE_TRUNC('day', e.ts) AS DATE))
                   AS day_offset
        FROM events e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT cohort_day, day_offset, COUNT(*) AS n_active
    FROM activity
    WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    """,
    tags=("events", "retention", "analytics"),
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users grouped by first-seen day, counted
    as active per day-offset within the first week — the standard cohort
    triangle, one agg for cohorts + one distinct-join pass."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    first_seen = e.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts"))).cast("date").alias("cohort_day")
    )
    activity = (
        e.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(
                F.date_trunc("day", F.col("ts")).cast("date"), F.col("cohort_day")
            ).alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_active"))
    )


@query(
    "q_window_distribution_ranks",
    oracle="""
    SELECT o_orderkey,
           NTILE(4) OVER w                      AS quartile,
           ROUND(PERCENT_RANK() OVER w, 4)      AS pct_rank,
           ROUND(CUME_DIST() OVER w, 4)         AS cume,
           DENSE_RANK() OVER (
               ORDER BY CAST(FLOOR(o_totalprice / 100000) AS BIGINT) DESC
           )                                     AS price_band_rank
    FROM orders
    WHERE o_custkey < 40
    WINDOW w AS (ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
    tags=("window", "ranking"),
)
def q_window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-ranking functions: NTILE quartiles, percent_rank,
    cume_dist, and dense_rank over a derived banding — completing the
    ranking-function family (§2.5)."""
    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey,
               NTILE(4) OVER w                      AS quartile,
               ROUND(PERCENT_RANK() OVER w, 4)      AS pct_rank,
               ROUND(CUME_DIST() OVER w, 4)         AS cume,
               DENSE_RANK() OVER (
                   ORDER BY CAST(FLOOR(o_totalprice / 100000) AS BIGINT) DESC
               )                                     AS price_band_rank
        FROM orders
        WHERE o_custkey < 40
        WINDOW w AS (ORDER BY o_totalprice ASC, o_orderkey ASC)
        """
    )


@query(
    "q_window_distribution_ranks_partitioned",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           NTILE(4) OVER w                  AS quartile,
           ROUND(PERCENT_RANK() OVER w, 4)  AS pct_rank,
           ROUND(CUME_DIST() OVER w, 4)     AS cume
    FROM orders
    WHERE o_custkey < 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
    tags=("window", "ranking", "partitioned", "new-r3"),
)
def q_window_distribution_ranks_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped twin of q_window_distribution_ranks: NTILE /
    percent_rank / cume_dist computed within each customer's own orders
    (PARTITION BY o_custkey) — the distribution-rank semantics without the
    global single-partition sort, scaling with customer cardinality.
    Plan-asserted partitioned in tests/test_plan_assertions.py."""
    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_custkey,
               o_orderkey,
               NTILE(4) OVER w                  AS quartile,
               ROUND(PERCENT_RANK() OVER w, 4)  AS pct_rank,
               ROUND(CUME_DIST() OVER w, 4)     AS cume
        FROM orders
        WHERE o_custkey < 200
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC)
        """
    )


@query(
    "q_scalar_dates_extended",
    oracle="""
    SELECT o_orderkey,
           LAST_DAY(CAST(o_orderdate AS DATE))                        AS month_end,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE)               AS plus_3_months,
           ROUND(DATE_DIFF('day', CAST(o_orderdate AS DATE),
                           DATE '2000-01-01') / 30.4375, 2)           AS approx_months_to_y2k,
           EXTRACT(QUARTER FROM o_orderdate)                          AS qtr,
           EXTRACT(DOW FROM o_orderdate)                              AS dow_sun0,
           CAST(EXTRACT(EPOCH FROM o_orderdate) AS BIGINT)            AS epoch_s
    FROM orders
    WHERE o_orderkey < 300
    """,
    tags=("scalar", "F6", "F12", "dates"),
)
def q_scalar_dates_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended date family: last_day, add_months, quarter, day-of-week
    (normalized to DuckDB's Sunday=0 convention — Spark's dayofweek is
    Sunday=1), and epoch seconds."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.filter(F.col("o_orderkey") < 300).select(
        "o_orderkey",
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.add_months(F.col("o_orderdate").cast("date"), 3).alias("plus_3_months"),
        F.round(
            F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date"))
            / 30.4375,
            2,
        ).alias("approx_months_to_y2k"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow_sun0"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@query(
    "q_timeseries_gapfill",
    oracle="""
    WITH bounds AS (
        SELECT event_type,
               DATE_TRUNC('hour', MIN(ts)) AS h_min,
               DATE_TRUNC('hour', MAX(ts)) AS h_max
        FROM events GROUP BY event_type
    ),
    grid AS (
        SELECT b.event_type, t.h AS hour
        FROM bounds b, UNNEST(GENERATE_SERIES(b.h_min, b.h_max, INTERVAL 1 HOUR)) AS t(h)
    ),
    actual AS (
        SELECT event_type, DATE_TRUNC('hour', ts) AS hour, COUNT(*) AS n
        FROM events GROUP BY event_type, DATE_TRUNC('hour', ts)
    )
    SELECT g.event_type,
           strftime(g.hour, '%Y-%m-%d %H:%M:%S') AS hour,
           COALESCE(a.n, 0) AS n_events,
           CASE WHEN a.n IS NULL THEN TRUE ELSE FALSE END AS gap_filled
    FROM grid g LEFT JOIN actual a
      ON g.event_type = a.event_type AND g.hour = a.hour
    """,
    tags=("timeseries", "gapfill", "custom-op"),
)
def q_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill — an operator Spark lacks natively (SURVEY
    custom-op preference (a): composition of built-ins): densify each
    event_type's hourly series between its first and last event, zero-
    filling missing hours and flagging them. The dense grid is generated
    with sequence() + explode from per-group bounds — no driver loop, no
    UDF.

    Scale: bounds is one tiny aggregate (rows = event types); the grid
    explode is proportional to OUTPUT size (hours x types), not input;
    the left join shuffles on (type, hour) — both sides already
    aggregated. This is the continuous-aggregate densification a
    dashboard/rollup layer runs at any scale.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    hour = F.date_trunc("hour", F.col("ts"))
    bounds = e.groupBy("event_type").agg(
        F.min(hour).alias("h_min"), F.max(hour).alias("h_max")
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.sequence("h_min", "h_max", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    actual = e.groupBy("event_type", hour.alias("hour")).agg(F.count("*").alias("n"))
    return (
        grid.join(actual, ["event_type", "hour"], "left_outer")
        .select(
            "event_type",
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.col("n").isNull().alias("gap_filled"),
        )
    )


@query(
    "q_udaf_trimmed_mean",
    oracle="""
    WITH q AS (
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.1) AS lo,
               quantile_cont(l_extendedprice, 0.9) AS hi
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           ROUND(AVG(l.l_extendedprice), 2) AS trimmed_mean_price,
           CAST(COUNT(*) AS BIGINT)         AS n_kept
    FROM lineitem l JOIN q ON l.l_returnflag = q.l_returnflag
    WHERE l.l_extendedprice BETWEEN q.lo AND q.hi
    GROUP BY l.l_returnflag
    """,
    tags=("udaf", "pandas-udf", "agg"),
)
def q_udaf_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate as a GROUPED_AGG Pandas UDAF — the §2.10 UDF
    flavor beyond mapInPandas/applyInPandasWithState: per-group 10-90%
    trimmed mean of extended price, computed vectorized in Arrow batches.
    pandas' linear-interpolation quantile matches DuckDB quantile_cont,
    so the oracle replays the trim exactly.

    Scale: grouped-agg pandas UDAFs get a full shuffle of the group's
    values (no partial aggregation) — acceptable for bounded groups like
    returnflag; for high-cardinality keys prefer the two-pass built-in
    percentile_approx + filtered AVG, which keeps map-side combine.
    """
    from etl_pipeline_spark.operators.udafs import trimmed_count_10_90, trimmed_mean_10_90

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.round(trimmed_mean_10_90("l_extendedprice"), 2).alias("trimmed_mean_price"),
        trimmed_count_10_90("l_extendedprice").alias("n_kept"),
    )


@query(
    "q_ratio_to_report",
    oracle="""
    WITH nat AS (
        SELECT n.n_regionkey AS regionkey, n.n_name AS nation,
               ROUND((CAST(SUM(CAST(ROUND((o.o_totalprice) * 100) AS DECIMAL(38,0))) AS DOUBLE) / 100), 2) AS nation_total
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY n.n_regionkey, n.n_name
    )
    SELECT regionkey, nation, nation_total,
           ROUND(nation_total / SUM(nation_total) OVER (PARTITION BY regionkey), 4)
               AS region_share,
           ROUND(nation_total / SUM(nation_total) OVER (), 4) AS global_share
    FROM nat
    """,
    tags=("window", "ratio-to-report", "agg"),
)
def q_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report — a window OVER an aggregate (each nation's share
    of its region's and of global order value): the grouped total feeds
    two windowed sums with no second scan of the fact table.

    Scale: the expensive part is the grouped aggregate (one fact
    shuffle); the share windows then run over nation-level rows (tiny).
    The region partition window shuffles only those aggregate rows; the
    global window coalesces them to one partition — both bounded by
    |nations|, never by |orders|.
    """
    t = load_tables(spark, sf_dir, ("customer", "nation", "orders"))
    nat = (
        t["customer"]
        .join(F.broadcast(t["nation"]), t["customer"].c_nationkey == t["nation"].n_nationkey)
        .join(t["orders"], t["orders"].o_custkey == t["customer"].c_custkey)
        .groupBy(F.col("n_regionkey").alias("regionkey"), F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("decimal(38,0)")).cast("double")
                / 100,
                2,
            ).alias("nation_total")
        )
    )
    w_region = W.partitionBy("regionkey")
    w_global = W.partitionBy()
    return nat.select(
        "regionkey",
        "nation",
        "nation_total",
        F.round(F.col("nation_total") / F.sum("nation_total").over(w_region), 4).alias(
            "region_share"
        ),
        F.round(F.col("nation_total") / F.sum("nation_total").over(w_global), 4).alias(
            "global_share"
        ),
    )


@query(
    "q_scd2_user_values",
    oracle="""
    SELECT user_id,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           STRFTIME(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    '%Y-%m-%d %H:%M:%S')     AS valid_to,
           ROUND(value, 2)                   AS value,
           CASE WHEN LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN TRUE ELSE FALSE END     AS is_current
    FROM events
    WHERE event_type = 'purchase'
    """,
    tags=("window", "scd2", "dimension"),
)
def q_scd2_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build — turn a change stream into
    validity intervals: each user's purchase event opens a version row
    valid from its timestamp until the next purchase (LEAD), the last
    version flagged current with an open end. This is the standard
    dimension-table construction a warehouse runs from CDC feeds.

    Scale: one shuffle on user_id for the LEAD window — per-user
    partitions are change-stream sized (bounded), never corpus-sized. A
    continuously-maintained SCD2 would run the same plan per batch over
    the delta plus each key's current row.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return (
        e.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
            F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
            F.round("value", 2).alias("value"),
            nxt.isNull().alias("is_current"),
        )
    )


@query(
    "q_kll_quantile_merge",
    # Self-verifying sketch pattern (see q_approx_aggregates): sketch
    # bytes are engine-specific, so Spark computes its own rank-band
    # verdict against the exact percentile twins and the oracle
    # recomputes the exact side + TRUE verdicts.
    oracle="""
    SELECT n.n_regionkey AS n_regionkey,
           COUNT(*) AS exact_customers,
           -- 3 decimals: medians of 2-decimal data are exact at 3dp (midpoint
           -- interpolation), so 3dp rounding never lands on a tie boundary
           ROUND(QUANTILE_CONT(c.c_acctbal, 0.5), 3) AS exact_median_bal,
           TRUE AS kll_median_within_band
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_regionkey
    """,
    tags=("agg", "approx", "sketch", "mergeable", "quantile"),
)
def q_kll_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketches (Apache DataSketches KLL via
    kll_sketch_agg_double / kll_merge_agg_double) — the 100 TB
    percentile pattern exact sorts can't do: build per-nation sketch
    PARTIALS once, re-aggregate them to any coarser grain (here region)
    by sketch-merge without touching raw data again, then read any
    quantile off the merged sketch. The rollup-table twin of
    q_hll_sketch_union, for distributions instead of distinct counts.

    Verdict: the default-k KLL normalized rank error is ~1.7%, so the
    merged median estimate must land between the exact 45th and 55th
    percentiles of the region's balance distribution (3x margin).
    """
    t = load_tables(spark, sf_dir, ("customer", "nation"))
    joined = t["customer"].join(
        F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
    )
    per_nation = joined.groupBy("n_regionkey", "n_nationkey").agg(
        F.kll_sketch_agg_double("c_acctbal").alias("sketch"),
        F.count("*").alias("n_in_nation"),
    )
    merged = per_nation.groupBy("n_regionkey").agg(
        F.expr(
            "kll_sketch_get_quantile_double(kll_merge_agg_double(sketch), 0.5)"
        ).alias("est_median"),
        F.sum("n_in_nation").alias("exact_customers"),
    )
    exact = joined.groupBy("n_regionkey").agg(
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY c_acctbal)").alias("exact_median"),
        F.expr("percentile_cont(0.45) WITHIN GROUP (ORDER BY c_acctbal)").alias("p45"),
        F.expr("percentile_cont(0.55) WITHIN GROUP (ORDER BY c_acctbal)").alias("p55"),
    )
    out = merged.join(exact, "n_regionkey")
    band_ok = F.col("est_median").between(F.col("p45"), F.col("p55"))
    return out.select(
        "n_regionkey",
        F.col("exact_customers").cast("long").alias("exact_customers"),
        F.round("exact_median", 3).alias("exact_median_bal"),
        band_ok.alias("kll_median_within_band"),
    )


@query(
    "q_theta_set_ops",
    # Self-verifying sketch pattern: theta sketch bytes are
    # engine-specific; Spark asserts its own error-bound verdicts against
    # exact set counts and the oracle recomputes the exact side + TRUEs.
    oracle="""
    WITH a AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'),
    b AS (SELECT DISTINCT o_custkey FROM orders
          WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
    SELECT (SELECT COUNT(*) FROM a) AS exact_1996,
           (SELECT COUNT(*) FROM b) AS exact_1997,
           (SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b)) AS exact_union,
           (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS exact_both,
           (SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS exact_only_1996,
           TRUE AS union_within_tol,
           TRUE AS intersection_within_tol,
           TRUE AS difference_within_tol
    """,
    tags=("agg", "approx", "sketch", "set-ops"),
)
def q_theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketches (Apache DataSketches) — distinct-set ALGEBRA at
    sketch cost, the operation HLL fundamentally can't do: estimate the
    union, intersection, and difference of the 1996 vs 1997 active
    customer sets from two per-slice sketches, no re-scan of the raw
    data. At 100 TB this answers "how many customers overlap between any
    two segments" from a sketch rollup table in milliseconds.

    Verdicts: all three estimates (union, intersection, difference) are
    checked against the exact counts with one uniform band — 6% relative
    plus 2 absolute (the absolute slack keeps tiny sets from failing on
    integer-granularity noise). Union error is typically much tighter
    (~2%-class at default lgK); intersection/difference error grows with
    the Jaccard distance of the operands, which is why the shared band is
    sized for the worst of the three rather than differentiated.
    """
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    # Half-open year bounds, identical to the sketch CASE expressions and
    # the DuckDB oracle — an inclusive between(..., '23:59:59') would
    # silently drop sub-second timestamps from the exact side only.
    y96 = (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")) & (
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    y97 = (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")) & (
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    sketches = o.agg(
        F.expr(
            "theta_sketch_agg(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01' THEN o_custkey END)"
        ).alias("sk_a"),
        F.expr(
            "theta_sketch_agg(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01' "
            "AND o_orderdate < TIMESTAMP '1998-01-01' THEN o_custkey END)"
        ).alias("sk_b"),
        F.countDistinct(F.when(y96, F.col("o_custkey"))).alias("exact_1996"),
        F.countDistinct(F.when(y97, F.col("o_custkey"))).alias("exact_1997"),
    )
    ests = sketches.select(
        "exact_1996",
        "exact_1997",
        F.expr("theta_sketch_estimate(theta_union(sk_a, sk_b))").alias("est_union"),
        F.expr("theta_sketch_estimate(theta_intersection(sk_a, sk_b))").alias("est_both"),
        F.expr("theta_sketch_estimate(theta_difference(sk_a, sk_b))").alias("est_only_a"),
    )
    # exact set counts for the verdicts (one distinct-pair aggregate)
    keys = o.select(
        "o_custkey",
        F.max(y96.cast("int")).over(W.partitionBy("o_custkey")).alias("in_a"),
        F.max(y97.cast("int")).over(W.partitionBy("o_custkey")).alias("in_b"),
    ).distinct()
    exact = keys.agg(
        F.sum(((F.col("in_a") == 1) | (F.col("in_b") == 1)).cast("long")).alias("exact_union"),
        F.sum(((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("long")).alias("exact_both"),
        F.sum(((F.col("in_a") == 1) & (F.col("in_b") == 0)).cast("long")).alias(
            "exact_only_1996"
        ),
    )
    out = ests.crossJoin(exact)
    tol = lambda est, ex, rel: F.abs(F.col(est) - F.col(ex)) <= rel * F.col(ex) + 2  # noqa: E731
    return out.select(
        "exact_1996",
        "exact_1997",
        "exact_union",
        "exact_both",
        F.col("exact_only_1996").cast("long").alias("exact_only_1996"),
        tol("est_union", "exact_union", 0.06).alias("union_within_tol"),
        tol("est_both", "exact_both", 0.06).alias("intersection_within_tol"),
        tol("est_only_a", "exact_only_1996", 0.06).alias("difference_within_tol"),
    )


RFM_TILES = 4


@query(
    "q_rfm_segments",
    oracle=f"""
    WITH base AS (
        SELECT o_custkey,
               MAX(o_orderdate)  AS last_order,
               COUNT(*)          AS frequency,
               ROUND(SUM(o_totalprice), 2) AS monetary
        FROM orders GROUP BY o_custkey
    ),
    anchor AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
    scored AS (
        SELECT b.o_custkey,
               DATE_DIFF('day', b.last_order, a.maxd) AS recency_days,
               b.frequency, b.monetary,
               NTILE({RFM_TILES}) OVER (ORDER BY DATE_DIFF('day', b.last_order, a.maxd), b.o_custkey) AS r_score,
               NTILE({RFM_TILES}) OVER (ORDER BY b.frequency DESC, b.o_custkey) AS f_score,
               NTILE({RFM_TILES}) OVER (ORDER BY b.monetary DESC, b.o_custkey) AS m_score
        FROM base b CROSS JOIN anchor a
    )
    SELECT r_score, f_score, m_score,
           COUNT(*) AS n_customers,
           ROUND(AVG(monetary), 2) AS avg_monetary,
           ROUND(AVG(recency_days), 2) AS avg_recency_days
    FROM scored
    GROUP BY r_score, f_score, m_score
    """,
    tags=("agg", "window", "segmentation"),
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic recency/frequency/monetary customer
    quartiling, as segment-level counts: each customer scored 1-4 on days
    since last order, order count, and lifetime spend (quartile 1 = best),
    then grouped into the 4x4x4 segment grid marketing/analytics reads.
    NTILE ties broken by custkey so both engines build identical tiles;
    monetary is rounded before tiling (exact-decimal sum order hazard).

    Scale: one grouped aggregate over orders (shuffle on custkey), a
    1-row anchor broadcast, three global NTILEs — the scale trap here is
    the global sort per NTILE; the cluster form computes quartile
    boundaries from the grouped table (tiny relative to orders) or uses
    the two-pass boundary broadcast, and the segment grid is invariant.
    """
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    base = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    anchor = o.agg(F.max("o_orderdate").alias("maxd"))
    scored = (
        base.crossJoin(F.broadcast(anchor))
        .withColumn("recency_days", F.datediff("maxd", "last_order"))
        .withColumn(
            "r_score",
            F.ntile(RFM_TILES).over(W.orderBy(F.col("recency_days"), F.col("o_custkey"))),
        )
        .withColumn(
            "f_score",
            F.ntile(RFM_TILES).over(W.orderBy(F.col("frequency").desc(), F.col("o_custkey"))),
        )
        .withColumn(
            "m_score",
            F.ntile(RFM_TILES).over(W.orderBy(F.col("monetary").desc(), F.col("o_custkey"))),
        )
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").alias("n_customers"),
        F.round(F.avg("monetary"), 2).alias("avg_monetary"),
        F.round(F.avg("recency_days"), 2).alias("avg_recency_days"),
    )


_LATERAL_SQL = """
    SELECT c.c_custkey,
           l.o_orderkey,
           ROUND(l.o_totalprice, 2) AS totalprice,
           CAST(l.o_orderdate AS DATE) AS orderdate
    FROM {customer} c,
    LATERAL (
        SELECT o_orderkey, o_totalprice, o_orderdate
        FROM {orders} o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) l
    WHERE c.c_acctbal > 9000
"""


@query(
    "q_lateral_top_orders",
    oracle=_LATERAL_SQL.format(customer="customer", orders="orders"),
    tags=("sql-surface", "lateral", "topk"),
)
def q_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:2016 lateral derived table): each
    high-balance customer's two most expensive orders, expressed as a
    per-row dependent subquery with ORDER BY ... LIMIT — the form BI tools
    and migrated warehouse SQL emit. Catalyst decorrelates it into the
    same join+window plan the DataFrame top-k uses, so supporting the
    SYNTAX costs nothing at scale; deterministic via the orderkey
    tie-break.

    Scale: decorrelation rewrites the per-customer LIMIT into a
    partitioned rank filter — one shuffle on custkey, no per-row
    re-execution. Same plan family as q_window_rank_orders.
    """
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    t["customer"].createOrReplaceTempView("v_lat_customer")
    t["orders"].createOrReplaceTempView("v_lat_orders")
    return spark.sql(_LATERAL_SQL.format(customer="v_lat_customer", orders="v_lat_orders"))


_SPINE_SQL = """
    WITH RECURSIVE spine(month_start, hi) AS (
        SELECT CAST(DATE_TRUNC('month', MIN(o_orderdate)) AS DATE),
               CAST(DATE_TRUNC('month', MAX(o_orderdate)) AS DATE)
        FROM {orders}
        UNION ALL
        SELECT CAST(month_start + INTERVAL '1' MONTH AS DATE), hi
        FROM spine WHERE month_start < hi
    ),
    monthly AS (
        SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM {orders}
        GROUP BY CAST(DATE_TRUNC('month', o_orderdate) AS DATE)
    )
    SELECT s.month_start,
           COALESCE(m.n_orders, 0) AS n_orders,
           COALESCE(m.revenue, 0.0) AS revenue
    FROM spine s LEFT JOIN monthly m ON s.month_start = m.month_start
"""


@query(
    "q_recursive_month_spine",
    oracle=_SPINE_SQL.format(orders="orders"),
    tags=("sql-surface", "recursive-cte", "gapfill"),
)
def q_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, Spark 4.x): generate the complete
    month spine between the first and last order date, then left-join the
    monthly order aggregate — the calendar-dimension/gap-filling pattern
    that keeps zero-activity months in the report (the sequence()-based
    twin is q_timeseries_gapfill; this one exercises the recursive SQL
    surface warehouse migrations expect). Acyclic recursion, so Spark's
    UNION ALL-only recursive CTE restriction is satisfied; both engines
    iterate to the identical spine.

    Scale: the recursion produces one row per month (tiny, driver-side
    growth only in iteration count, bounded by the date range); the heavy
    side is the one grouped aggregate over orders. The spine broadcasts
    into the join at any corpus size.
    """
    t = load_tables(spark, sf_dir, ("orders",))
    t["orders"].createOrReplaceTempView("v_spine_orders")
    return spark.sql(_SPINE_SQL.format(orders="v_spine_orders")).select(
        "month_start", "n_orders", "revenue"
    )


@query(
    "q_event_transitions",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ),
    pairs AS (
        SELECT event_type AS from_type, next_type AS to_type
        FROM ordered WHERE next_type IS NOT NULL
    ),
    totals AS (
        SELECT from_type, COUNT(*) AS n_from FROM pairs GROUP BY from_type
    )
    SELECT p.from_type, p.to_type,
           COUNT(*) AS n_transitions,
           ROUND(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(t.n_from), 4) AS prob
    FROM pairs p JOIN totals t ON p.from_type = t.from_type
    GROUP BY p.from_type, p.to_type
    """,
    tags=("window", "behavioral", "markov"),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for each
    consecutive event pair within a user's timeline (LEAD over ts with
    event_id tie-break), the transition count and conditional probability
    P(next | current) — the clickstream model behind next-action
    prediction features and funnel-anomaly alerts.

    Scale: one shuffle on user_id for the LEAD window (per-user
    partitions, bounded), then a bounded aggregate on the (from, to) type
    grid; the per-from totals broadcast back. Nothing scales with more
    than the event count.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select("user_id", "event_type", F.lead("event_type").over(w).alias("next_type"))
        .filter(F.col("next_type").isNotNull())
        .select(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
    )
    totals = pairs.groupBy("from_type").agg(F.count("*").alias("n_from"))
    return (
        pairs.groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_transitions"))
        .join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            F.round(F.col("n_transitions").cast("double") / F.col("n_from"), 4).alias("prob"),
        )
    )


# --- Markov stationary distribution (power iteration) -----------------------

MARKOV_ITERS = 3


def _markov_pi_sql() -> str:
    """Unrolled power-iteration CTE chain shared by the oracle."""
    base = """
    ordered AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ),
    pairs AS (
        SELECT event_type AS from_type, next_type AS to_type
        FROM ordered WHERE next_type IS NOT NULL
    ),
    totals AS (
        SELECT from_type, COUNT(*) AS n_from FROM pairs GROUP BY from_type
    ),
    trans AS (
        SELECT p.from_type, p.to_type,
               CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(t.n_from) AS prob
        FROM pairs p JOIN totals t ON p.from_type = t.from_type
        GROUP BY p.from_type, p.to_type
    ),
    pi0 AS (
        SELECT event_type AS type,
               CAST(1.0 AS DOUBLE) / (SELECT COUNT(DISTINCT event_type) FROM events) AS p
        FROM (SELECT DISTINCT event_type FROM events)
    )"""
    steps = "".join(
        f""",
    pi{t + 1} AS (
        SELECT tr.to_type AS type,
               list_reduce(LIST(pi.p * tr.prob ORDER BY tr.from_type), (a, b) -> a + b) AS p
        FROM trans tr JOIN pi{t} pi ON pi.type = tr.from_type
        GROUP BY tr.to_type
    )"""
        for t in range(MARKOV_ITERS)
    )
    return base + steps


@query(
    "q_markov_stationary",
    # Power iteration is floating-point-order-sensitive, so each step
    # sums its terms with an ORDERED left fold (LIST(.. ORDER BY
    # from_type) + list_reduce in DuckDB; array_sort + aggregate in
    # Spark) — both engines fold the identical term sequence, making the
    # iterate bit-reproducible before the final ROUND.
    oracle=f"""
    WITH {_markov_pi_sql()}
    SELECT p3.type AS event_type,
           ROUND(p3.p, 6) AS stationary_prob,
           ROUND(ABS(p3.p - p2.p), 6) AS step_delta
    FROM pi{MARKOV_ITERS} p3 JOIN pi{MARKOV_ITERS - 1} p2 ON p3.type = p2.type
    """,
    tags=("behavioral", "markov", "iterative", "graph"),
)
def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate stationary distribution of the user-behavior Markov
    chain: {ITERS} synchronous power-iteration steps from the uniform
    vector over the q_event_transitions matrix, reporting each event
    type's stationary mass and the last-step delta (the convergence
    monitor a PageRank-style job exposes). This is the iterative-job
    pattern — the same loop shape as connected components
    (operators/cluster.py) applied to a dense stochastic matrix.

    Scale: the transition matrix is |types|^2 and BROADCASTS; each
    iteration is a broadcast join + bounded aggregate over the vector,
    so iterating at 100 TB costs |types| rows per step after the single
    event-stream pass that builds the matrix. Sum order inside each
    step is pinned (sorted fold) so results are engine- and
    partitioning-independent.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select("user_id", "event_type", F.lead("event_type").over(w).alias("next_type"))
        .filter(F.col("next_type").isNotNull())
        .select(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
    )
    totals = pairs.groupBy("from_type").agg(F.count("*").alias("n_from"))
    trans = (
        pairs.groupBy("from_type", "to_type")
        .agg(F.count("*").alias("c"))
        .join(F.broadcast(totals), "from_type")
        .select("from_type", "to_type", (F.col("c").cast("double") / F.col("n_from")).alias("prob"))
    )
    # 1-row count joined in lazily: query construction stays job-free
    # (the lazy-builder discipline from the dedup module).
    n_types = e.agg(F.countDistinct("event_type").alias("n_types"))
    pi = (
        e.select("event_type").distinct()
        .crossJoin(F.broadcast(n_types))
        .select(F.col("event_type").alias("type"), (F.lit(1.0) / F.col("n_types")).alias("p"))
    )

    def step(pi_t: DataFrame) -> DataFrame:
        terms = trans.join(F.broadcast(pi_t), trans["from_type"] == pi_t["type"]).select(
            "to_type",
            F.struct(F.col("from_type"), (F.col("p") * F.col("prob")).alias("term")).alias("ft"),
        )
        return (
            terms.groupBy("to_type")
            .agg(F.array_sort(F.collect_list("ft")).alias("fts"))
            .select(
                F.col("to_type").alias("type"),
                F.aggregate(
                    F.transform("fts", lambda s: s["term"]),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("p"),
            )
        )

    prev = pi
    for _ in range(MARKOV_ITERS):
        prev, pi = pi, step(pi)
    return pi.alias("p3").join(
        prev.select(F.col("type").alias("type2"), F.col("p").alias("p_prev")),
        F.col("type") == F.col("type2"),
    ).select(
        F.col("type").alias("event_type"),
        F.round("p", 6).alias("stationary_prob"),
        F.round(F.abs(F.col("p") - F.col("p_prev")), 6).alias("step_delta"),
    )


q_markov_stationary.__doc__ = q_markov_stationary.__doc__.format(ITERS=MARKOV_ITERS)


# --- Interval analytics: sweep-line concurrency + binned overlap join -------

IV_BASE_SEC = 60  # every event interval lasts at least a minute
IV_WINDOW_US = 21600 * 1_000_000  # 6-hour maintenance windows

_IV_SQL = f"""
    SELECT event_id, event_type, value,
           EPOCH_US(ts) AS s_us,
           EPOCH_US(ts) + (CAST(TRUNC(value * 60) AS BIGINT) + {IV_BASE_SEC}) * 1000000 AS e_us
    FROM events
"""


def _intervals(e: DataFrame) -> DataFrame:
    """Half-open event intervals [s_us, e_us) in epoch micros: start = ts,
    duration = trunc(value*60) + base seconds. Integer micros everywhere,
    so bin and overlap arithmetic is exact in both engines."""
    s_us = F.unix_micros(F.col("ts"))
    dur_us = (F.floor(F.col("value") * 60).cast("long") + IV_BASE_SEC) * 1_000_000
    return e.select(
        "event_id", "event_type", "value", s_us.alias("s_us"), (s_us + dur_us).alias("e_us")
    )


@query(
    "q_interval_concurrency",
    oracle=f"""
    WITH iv AS ({_IV_SQL}),
    pts AS (
        SELECT event_type, s_us AS t, 1 AS delta FROM iv
        UNION ALL
        SELECT event_type, e_us AS t, -1 AS delta FROM iv
    ),
    net AS (
        SELECT event_type, t, CAST(SUM(delta) AS BIGINT) AS net
        FROM pts GROUP BY event_type, t
    ),
    run AS (
        SELECT event_type, t,
               SUM(net) OVER (
                   PARTITION BY event_type ORDER BY t ROWS UNBOUNDED PRECEDING
               ) AS running
        FROM net
    ),
    mx AS (SELECT event_type, MAX(running) AS max_concurrent FROM run GROUP BY event_type)
    SELECT r.event_type,
           CAST(m.max_concurrent AS BIGINT) AS max_concurrent,
           CAST(MIN(r.t) AS BIGINT) AS first_peak_us
    FROM run r JOIN mx m
      ON r.event_type = m.event_type AND r.running = m.max_concurrent
    GROUP BY r.event_type, m.max_concurrent
    """,
    tags=("interval", "sweep-line", "window", "custom-op"),
)
def q_interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type via the sweep-line trick: each
    interval emits a +1 at its start and a -1 at its end; deltas at the
    same instant are NETTED (so concurrency is sampled after applying
    all of an instant's starts and ends — a total, deterministic order),
    and a running sum over the netted points yields the active-interval
    count, reported as its per-type maximum and the first instant that
    attains it. This is how "max concurrent sessions/connections/jobs"
    is computed without expanding intervals into per-second rows.

    Scale: 2 rows per interval, one (type, t) aggregate, one window
    partitioned by type ordered by time — the window state is a single
    counter, and the partition key caps skew at the per-type event
    volume. A 100 TB sweep needs no more memory than any running-total
    window; types with huge timelines can sub-partition by day and
    seed each day with the prior day's closing sum (the standard
    prefix-sum split).
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    iv = _intervals(e)
    pts = iv.select(
        "event_type", F.col("s_us").alias("t"), F.lit(1).alias("delta")
    ).unionAll(iv.select("event_type", F.col("e_us").alias("t"), F.lit(-1).alias("delta")))
    net = pts.groupBy("event_type", "t").agg(F.sum("delta").alias("net"))
    w = (
        W.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    run = net.select("event_type", "t", F.sum("net").over(w).alias("running"))
    mx = run.groupBy("event_type").agg(F.max("running").alias("max_concurrent"))
    return (
        run.join(mx, "event_type")
        .filter(F.col("running") == F.col("max_concurrent"))
        .groupBy("event_type", "max_concurrent")
        .agg(F.min("t").alias("first_peak_us"))
        .select("event_type", "max_concurrent", "first_peak_us")
    )


@query(
    "q_interval_window_join",
    # Oracle states the SEMANTICS as a naive range join (overlap
    # predicate against every window); the Spark side implements the
    # scalable BINNED form and must produce identical results.
    oracle=f"""
    WITH iv AS ({_IV_SQL}),
    b AS (SELECT MIN(s_us) AS lo, MAX(e_us) AS hi FROM iv),
    w AS (
        SELECT UNNEST(GENERATE_SERIES(lo // {IV_WINDOW_US}, (hi - 1) // {IV_WINDOW_US})) AS wbin
        FROM b
    )
    SELECT strftime(make_timestamp(wbin * {IV_WINDOW_US}), '%Y-%m-%d %H:%M:%S') AS w_start,
           COUNT(iv.event_id) AS n_events,
           ROUND(COALESCE(SUM(iv.value), 0), 2) AS sum_value
    FROM w LEFT JOIN iv
      ON iv.s_us < (wbin + 1) * {IV_WINDOW_US} AND iv.e_us > wbin * {IV_WINDOW_US}
    GROUP BY wbin
    """,
    tags=("interval", "range-join", "binned", "custom-op"),
)
def q_interval_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join against a 6-hour maintenance-window grid,
    implemented as a BINNED equi-join: each interval explodes into the
    window bins it touches and joins on the bin key — turning a
    non-equi range join (which Spark would execute as a broadcast
    nested loop) into a plain shuffled equi-join. Bins equal the window
    grid here, so bin membership IS the overlap predicate; with a
    coarser predicate a residual filter after the equi-join finishes
    the job (the q_join_range_value_buckets pattern). Empty windows are
    kept via the left join from the generated grid.

    Scale: rows-per-interval = touched bins (duration/bin, small by
    construction); the join shuffles on uniformly-distributed time
    bins, so no skew and no quadratic blowup — this is THE standard
    time-interval join at warehouse scale. The window grid derives from
    a 1-row min/max aggregate, lazily cross-joined (no driver action).
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    iv = _intervals(e)
    bounds = iv.agg(F.min("s_us").alias("lo"), F.max("e_us").alias("hi"))
    windows = bounds.select(
        F.explode(
            F.sequence(
                F.expr(f"lo div {IV_WINDOW_US}"), F.expr(f"(hi - 1) div {IV_WINDOW_US}")
            )
        ).alias("wbin")
    )
    binned = iv.select(
        "event_id",
        "value",
        F.explode(
            F.sequence(
                F.expr(f"s_us div {IV_WINDOW_US}"), F.expr(f"(e_us - 1) div {IV_WINDOW_US}")
            )
        ).alias("wbin"),
    )
    return (
        windows.join(binned, "wbin", "left")
        .groupBy("wbin")
        .agg(
            F.count("event_id").alias("n_events"),
            F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 2).alias("sum_value"),
        )
        .select(
            F.date_format(
                F.timestamp_micros(F.col("wbin") * IV_WINDOW_US), "yyyy-MM-dd HH:mm:ss"
            ).alias("w_start"),
            "n_events",
            "sum_value",
        )
    )


# --- Z-order clustering locality --------------------------------------------

from etl_pipeline_spark.operators.zorder import Z_BITS, zorder_key, zorder_sql  # noqa: E402

ZP_BITS = 8  # prefix bits used as the clustering/pruning unit


@query(
    "q_zorder_locality",
    oracle=f"""
    WITH keyed AS (
        SELECT {zorder_sql("(o_custkey % 256)", "CAST(FLOOR(o_totalprice * 256 / 600000) AS BIGINT)")}
                   AS z_key,
               (o_custkey % 256) AS a,
               CAST(FLOOR(o_totalprice * 256 / 600000) AS BIGINT) AS b
        FROM orders
    )
    SELECT z_key >> {2 * Z_BITS - ZP_BITS} AS z_prefix,
           COUNT(*) AS n_orders,
           CAST(MIN(a) AS BIGINT) AS min_a, CAST(MAX(a) AS BIGINT) AS max_a,
           CAST(MIN(b) AS BIGINT) AS min_b, CAST(MAX(b) AS BIGINT) AS max_b,
           CAST(MAX(a) - MIN(a) AS BIGINT) AS a_span,
           CAST(MAX(b) - MIN(b) AS BIGINT) AS b_span
    FROM keyed GROUP BY 1
    """,
    tags=("zorder", "data-skipping", "layout", "custom-op"),
)
def q_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering audit over orders keyed by (customer bucket,
    price band): per z-key prefix (the clustering/pruning unit of
    operators/zorder.py), the row count and the min/max span of EACH
    dimension. The spans are bounded by construction (a prefix fixes
    the top bits of both dimensions), which is exactly the property
    that makes one clustered layout prune two-dimensional predicates —
    the audit a lakehouse runs before adopting a z-order layout.

    Scale: a narrow per-row bit expression plus one aggregate on the
    256-prefix grid. The write-side counterpart (write_zordered /
    read_box with a static covering-prefix IN list, planning-time
    PartitionFilters) is exercised in tests/test_zorder.py.
    """
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    a = F.col("o_custkey") % 256
    b = F.floor(F.col("o_totalprice") * 256 / 600000).cast("long")
    keyed = o.select(
        zorder_key(a, b).alias("z_key"), a.alias("a"), b.alias("b")
    )
    return (
        keyed.groupBy(F.shiftright("z_key", 2 * Z_BITS - ZP_BITS).alias("z_prefix"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min("a").alias("min_a"),
            F.max("a").alias("max_a"),
            F.min("b").alias("min_b"),
            F.max("b").alias("max_b"),
            (F.max("a") - F.min("a")).alias("a_span"),
            (F.max("b") - F.min("b")).alias("b_span"),
        )
    )


# --- Truncated EWMA smoothing ------------------------------------------------

EWMA_WIN = 16  # exact window: alpha decay over the last 16 events
EWMA_ALPHA = 0.5  # power of two => every weight is IEEE-exact


@query(
    "q_ewma_smoothing",
    # alpha = 0.5 makes every weight 2^-k (exact); the weighted sum is an
    # ORDERED fold over the frame list (oldest -> newest in both
    # engines), and the denominator's geometric closed form 2 - 2^-(n-1)
    # is exactly what the sequential fold of exact binary fractions
    # produces — so the smoothed value is bit-reproducible pre-ROUND.
    oracle=f"""
    WITH framed AS (
        SELECT user_id, event_id, value,
               LIST(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {EWMA_WIN - 1} PRECEDING AND CURRENT ROW
               ) AS l
        FROM events
    )
    SELECT user_id, event_id, value,
           ROUND(
             list_reduce(
                 list_transform(GENERATE_SERIES(1, LEN(l)), i -> l[i] * POW(0.5, LEN(l) - i)),
                 (a, b) -> a + b
             ) / (2 - POW(0.5, LEN(l) - 1)),
             4) AS ewma
    FROM framed
    """,
    tags=("window", "timeseries", "ewma", "custom-op"),
)
def q_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's event values,
    TRUNCATED to the last {WIN} events — the recursive EWMA
    s_t = alpha*x_t + (1-alpha)*s_(t-1) re-expressed as a bounded-frame
    weighted sum so it runs as a plain window aggregate instead of a
    sequential recurrence (the residual tail the truncation drops is
    <= 2^-{WIN} of the mass — below the output rounding). Smoothing,
    anomaly baselines, and rate limiters all consume this shape.

    Scale: one window shuffle on user_id; per-row state is the
    {WIN}-element frame list regardless of timeline length — a recurrence
    would serialize the whole partition, the truncated form stays a
    streaming frame aggregate. Weights are powers of two and the fold
    order is pinned, so results don't depend on partitioning or engine.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_WIN - 1), W.currentRow)
    )
    framed = e.select(
        "user_id", "event_id", "value", F.collect_list("value").over(w).alias("l")
    )
    n = F.size("l")
    num = F.aggregate(
        F.transform("l", lambda x, i: x * F.pow(F.lit(0.5), n - 1 - i)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    den = F.lit(2.0) - F.pow(F.lit(0.5), n - 1)
    return framed.select(
        "user_id", "event_id", "value", F.round(num / den, 4).alias("ewma")
    )


q_ewma_smoothing.__doc__ = q_ewma_smoothing.__doc__.format(WIN=EWMA_WIN)


# --- Last-touch attribution --------------------------------------------------

ATTR_WINDOW_US = 3600 * 1_000_000  # 1-hour lookback


@query(
    "q_attribution_last_touch",
    # Oracle states the semantics as the naive form (join every purchase
    # to all prior same-user touches in the window, keep the latest);
    # Spark computes the same thing with a single IGNORE-NULLS window —
    # no self-join — and must agree.
    oracle=f"""
    WITH ev AS (
        SELECT event_id, user_id, event_type, value, EPOCH_US(ts) AS us FROM events
    ),
    p AS (SELECT * FROM ev WHERE event_type = 'purchase'),
    lt AS (
        SELECT p.event_id AS pid, p.value AS pval, t.event_type AS touch_type,
               ROW_NUMBER() OVER (
                   PARTITION BY p.event_id ORDER BY t.us DESC, t.event_id DESC
               ) AS rn
        FROM p LEFT JOIN ev t
          ON t.user_id = p.user_id AND t.event_type <> 'purchase'
         AND (t.us < p.us OR (t.us = p.us AND t.event_id < p.event_id))
         AND t.us >= p.us - {ATTR_WINDOW_US}
    )
    SELECT COALESCE(touch_type, 'direct') AS touch_type,
           COUNT(*) AS n_purchases,
           ROUND(SUM(pval), 2) AS attributed_value
    FROM lt WHERE rn = 1 GROUP BY 1
    """,
    tags=("behavioral", "attribution", "window", "asof"),
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: each purchase credits the most
    recent non-purchase event by the same user within the preceding
    hour (else the 'direct' bucket), reported as purchase counts and
    attributed value per touch channel. The classic marketing /
    conversion-funnel join, which is really a per-user as-of lookup.

    Scale: implemented WITHOUT a self-join — one user_id window pass
    carries the last non-purchase (ignore-nulls last over preceding
    rows) to every purchase row, then the 1-hour recency gate is a
    per-row comparison; if the latest touch is stale, every touch is.
    Cost is the user-partitioned sort the timeline queries already pay,
    versus the naive purchase x touch join the oracle spells out.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    ev = e.select(
        "event_id", "user_id", "event_type", "value", F.unix_micros("ts").alias("us")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(
            F.col("event_type") != "purchase",
            F.struct(F.col("us").alias("tus"), F.col("event_type").alias("ttype")),
        ),
        ignorenulls=True,
    ).over(w)
    attributed = (
        ev.withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .select(
            "value",
            F.when(
                F.col("touch").isNotNull()
                & (F.col("touch.tus") >= F.col("us") - ATTR_WINDOW_US),
                F.col("touch.ttype"),
            )
            .otherwise("direct")
            .alias("touch_type"),
        )
    )
    return attributed.groupBy("touch_type").agg(
        F.count("*").alias("n_purchases"),
        F.round(F.sum("value"), 2).alias("attributed_value"),
    )


# --- Triangle counting on the co-purchase graph ------------------------------

TRI_SUPPORT = 2  # parts must co-occur in >= this many orders to form an edge


@query(
    "q_triangle_count",
    oracle=f"""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {TRI_SUPPORT}
    ),
    deg AS (
        SELECT k, COUNT(*) AS d FROM (
            SELECT u AS k FROM edges UNION ALL SELECT v FROM edges
        ) GROUP BY k
    ),
    tri AS (
        SELECT COUNT(*) AS n_triangles
        FROM edges e1
        JOIN edges e2 ON e2.u = e1.v
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT (SELECT COUNT(*) FROM deg)                          AS n_vertices,
           (SELECT COUNT(*) FROM edges)                        AS n_edges,
           (SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) FROM deg) AS n_wedges,
           (SELECT CAST(n_triangles AS BIGINT) FROM tri)       AS n_triangles,
           ROUND(3.0 * (SELECT n_triangles FROM tri) /
                 (SELECT SUM(d * (d - 1) / 2) FROM deg), 6)    AS global_clustering
    """,
    tags=("graph", "triangle", "join", "custom-op"),
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph (edges = part pairs
    co-ordered in >= {SUP} orders): vertex/edge/wedge/triangle counts and
    the global clustering coefficient — the connectivity profile behind
    related-item recommendations and community detection, and the classic
    distributed-graph benchmark beyond connected components
    (operators/cluster.py).

    Scale: edges are canonically oriented u < v, so each triangle is
    enumerated exactly once by the wedge join (e1 ⨝ e2 on the middle
    vertex) closed by a hash semi-probe (e3). Wedge volume — the real
    cost — is sum(d^2); at 100 TB the standard mitigations apply
    unchanged: orient by DEGREE instead of id (caps wedge fan-out at
    sqrt-degree), cap or sample hub vertices, and pre-filter edges by
    support as done here (support >= {SUP} drops the accidental-co-order
    noise that makes retail graphs dense).
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("u"))
    b = items.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "o")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= TRI_SUPPORT)
        .select("u", "v")
        .localCheckpoint(eager=False)
    )
    deg = (
        edges.select(F.col("u").alias("k"))
        .unionAll(edges.select(F.col("v").alias("k")))
        .groupBy("k")
        .agg(F.count("*").alias("d"))
    )
    e1 = edges.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = edges.select(F.col("u").alias("y"), F.col("v").alias("z"))
    e3 = edges.select(F.col("u").alias("x"), F.col("v").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"]).agg(F.count("*").alias("n_triangles"))
    stats = deg.agg(
        F.count("*").alias("n_vertices"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges"),
    )
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    return (
        stats.crossJoin(n_edges)
        .crossJoin(tri)
        .select(
            "n_vertices",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6).alias(
                "global_clustering"
            ),
        )
    )


q_triangle_count.__doc__ = q_triangle_count.__doc__.format(SUP=TRI_SUPPORT)


# --- Market-basket association rules -----------------------------------------

MB_MIN_PAIR = 2  # pair must co-occur in >= this many orders
MB_TOPK = 15


@query(
    "q_market_basket_rules",
    oracle=f"""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
    cnt AS (SELECT l_partkey, COUNT(*) AS c FROM items GROUP BY l_partkey),
    pair AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS cuv
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {MB_MIN_PAIR}
    ),
    rules AS (
        SELECT u AS antecedent, v AS consequent, cuv, cu.c AS ca, cv.c AS cc
        FROM pair JOIN cnt cu ON cu.l_partkey = pair.u
                  JOIN cnt cv ON cv.l_partkey = pair.v
        UNION ALL
        SELECT v, u, cuv, cv.c, cu.c
        FROM pair JOIN cnt cu ON cu.l_partkey = pair.u
                  JOIN cnt cv ON cv.l_partkey = pair.v
    )
    SELECT antecedent, consequent,
           CAST(cuv AS BIGINT) AS n_both,
           ROUND(CAST(cuv AS DOUBLE) / n.n_orders, 6) AS support,
           ROUND(CAST(cuv AS DOUBLE) / ca, 6)         AS confidence,
           ROUND(CAST(cuv AS DOUBLE) * n.n_orders / (ca * cc), 4) AS lift
    FROM rules CROSS JOIN n
    ORDER BY lift DESC, antecedent ASC, consequent ASC
    LIMIT {MB_TOPK}
    """,
    tags=("graph", "association-rules", "market-basket", "custom-op"),
)
def q_market_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over order baskets: for directed part
    pairs co-ordered at least {MIN} times, the support, confidence, and
    lift of "antecedent => consequent", top-{K} by lift — the
    related-item recommendation table, and the metric layer over the
    same co-occurrence graph the triangle census walks.

    Scale: the pair count is the inverted-index self-join on the order
    key (bounded by per-basket size squared, not corpus size); item
    marginals and the order total are dimension-sized broadcasts; the
    top-k is a TakeOrderedAndProject. All ratios derive from exact
    integer counts, so both engines rank identically.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    items = li.select("l_orderkey", "l_partkey").distinct().localCheckpoint(eager=False)
    n = items.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    cnt = items.groupBy("l_partkey").agg(F.count("*").alias("c"))
    a = items.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("u"))
    b = items.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("v"))
    pair = (
        a.join(b, "o")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("cuv"))
        .filter(F.col("cuv") >= MB_MIN_PAIR)
    )
    enriched = (
        pair.join(F.broadcast(cnt.select(F.col("l_partkey").alias("u"), F.col("c").alias("ca"))), "u")
        .join(F.broadcast(cnt.select(F.col("l_partkey").alias("v"), F.col("c").alias("cc"))), "v")
    )
    rules = enriched.select(
        F.col("u").alias("antecedent"), F.col("v").alias("consequent"),
        "cuv", "ca", "cc",
    ).unionAll(
        enriched.select(
            F.col("v").alias("antecedent"), F.col("u").alias("consequent"),
            "cuv", F.col("cc").alias("ca"), F.col("ca").alias("cc"),
        )
    )
    return (
        rules.crossJoin(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            F.col("cuv").alias("n_both"),
            F.round(F.col("cuv").cast("double") / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("cuv").cast("double") / F.col("ca"), 6).alias("confidence"),
            F.round(
                F.col("cuv").cast("double") * F.col("n_orders") / (F.col("ca") * F.col("cc")), 4
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), F.col("antecedent").asc(), F.col("consequent").asc())
        .limit(MB_TOPK)
    )


q_market_basket_rules.__doc__ = q_market_basket_rules.__doc__.format(MIN=MB_MIN_PAIR, K=MB_TOPK)


# --- Welch two-sample t-test -------------------------------------------------


@query(
    "q_ab_test_ttest",
    oracle="""
    WITH assigned AS (
        SELECT event_type, value,
               CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm
        FROM events
    ),
    arms AS (
        SELECT event_type, arm, COUNT(*) AS n, AVG(value) AS m, VAR_SAMP(value) AS s2
        FROM assigned GROUP BY event_type, arm
    ),
    wide AS (
        SELECT a.event_type,
               a.n AS n_a, a.m AS m_a, a.s2 AS s2_a,
               b.n AS n_b, b.m AS m_b, b.s2 AS s2_b
        FROM arms a JOIN arms b
          ON a.event_type = b.event_type AND a.arm = 'A' AND b.arm = 'B'
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND(m_a, 4) AS mean_a, ROUND(m_b, 4) AS mean_b,
           ROUND((m_a - m_b) / SQRT(s2_a / n_a + s2_b / n_b), 4) AS t_stat,
           ROUND(POW(s2_a / n_a + s2_b / n_b, 2) /
                 (POW(s2_a / n_a, 2) / (n_a - 1) + POW(s2_b / n_b, 2) / (n_b - 1)),
                 2) AS welch_df,
           CASE WHEN ABS((m_a - m_b) / SQRT(s2_a / n_a + s2_b / n_b)) > 1.96
                THEN 1 ELSE 0 END AS significant
    FROM wide
    """,
    tags=("statistics", "ab-test", "agg"),
)
def q_ab_test_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test per event type, arms assigned by user
    parity: sample sizes, means, the t statistic, Welch-Satterthwaite
    degrees of freedom, and a 5%-level verdict — the experiment-readout
    query every A/B platform runs, next to the KS drift and MAD outlier
    checks in the statistical-DQ family.

    Scale: one map-combinable aggregate on the (type, arm) grid; the
    t arithmetic is per-group scalar expressions on the tiny result.
    Nothing beyond the aggregate touches row volume.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    assigned = e.select(
        "event_type",
        "value",
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
    )
    arms = assigned.groupBy("event_type", "arm").agg(
        F.count("*").alias("n"), F.avg("value").alias("m"), F.var_samp("value").alias("s2")
    )
    a = arms.filter(F.col("arm") == "A").select(
        "event_type", F.col("n").alias("n_a"), F.col("m").alias("m_a"), F.col("s2").alias("s2_a")
    )
    b = arms.filter(F.col("arm") == "B").select(
        "event_type", F.col("n").alias("n_b"), F.col("m").alias("m_b"), F.col("s2").alias("s2_b")
    )
    se2 = F.col("s2_a") / F.col("n_a") + F.col("s2_b") / F.col("n_b")
    t = (F.col("m_a") - F.col("m_b")) / F.sqrt(se2)
    df = F.pow(se2, 2) / (
        F.pow(F.col("s2_a") / F.col("n_a"), 2) / (F.col("n_a") - 1)
        + F.pow(F.col("s2_b") / F.col("n_b"), 2) / (F.col("n_b") - 1)
    )
    return a.join(b, "event_type").select(
        "event_type",
        "n_a",
        "n_b",
        F.round("m_a", 4).alias("mean_a"),
        F.round("m_b", 4).alias("mean_b"),
        F.round(t, 4).alias("t_stat"),
        F.round(df, 2).alias("welch_df"),
        F.when(F.abs(t) > 1.96, 1).otherwise(0).alias("significant"),
    )


# --- Referential-integrity audit ---------------------------------------------

_RI_RELATIONS = [
    # (label, child table, child key, parent table, parent key)
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
]


def _ri_oracle() -> str:
    parts = []
    for label, ct, ck, pt, pk in _RI_RELATIONS:
        parts.append(f"""
    SELECT '{label}' AS relation,
           (SELECT COUNT(*) FROM {ct}) AS n_child_rows,
           (SELECT COUNT(*) FROM {ct} c
             WHERE NOT EXISTS (SELECT 1 FROM {pt} p WHERE p.{pk} = c.{ck}))
               AS n_orphan_rows,
           (SELECT COUNT(*) FROM {pt}) AS n_parent_rows,
           (SELECT COUNT(*) FROM {pt} p
             WHERE NOT EXISTS (SELECT 1 FROM {ct} c WHERE c.{ck} = p.{pk}))
               AS n_unreferenced_parents""")
    return "\n    UNION ALL\n".join(parts)


@query(
    "q_dq_referential_integrity",
    oracle=_ri_oracle(),
    tags=("dq", "referential-integrity", "anti-join"),
)
def q_dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across every foreign-key relation in
    the star schema: child row counts, orphaned children (FK with no
    parent — the hard violation a load gate must block on), parent
    counts, and unreferenced parents (the soft signal: dimensions
    nothing points at). One standing query instead of six ad-hoc
    anti-join notebooks; the DQ family's relational complement to the
    statistical checks (KS/MAD/Benford).

    Scale: each relation costs one left-anti join per direction, both
    on the FK key; dimension sides broadcast. Orphan checks at 100 TB
    run on exactly this plan — anti-join against a broadcast dimension
    is a map-side filter.
    """
    tables = load_tables(
        spark, sf_dir,
        ("lineitem", "orders", "part", "supplier", "customer", "nation", "events"),
    )
    rows = []
    for label, ct, ck, pt, pk in _RI_RELATIONS:
        child = tables[ct].select(F.col(ck).alias("k"))
        parent = tables[pt].select(F.col(pk).alias("k"))
        n_child = child.agg(F.count("*").alias("n_child_rows"))
        n_orphan = child.join(F.broadcast(parent.distinct()), "k", "left_anti").agg(
            F.count("*").alias("n_orphan_rows")
        )
        n_parent = parent.agg(F.count("*").alias("n_parent_rows"))
        n_unref = parent.join(child.distinct(), "k", "left_anti").agg(
            F.count("*").alias("n_unreferenced_parents")
        )
        rows.append(
            n_child.crossJoin(n_orphan)
            .crossJoin(n_parent)
            .crossJoin(n_unref)
            .select(
                F.lit(label).alias("relation"),
                "n_child_rows",
                "n_orphan_rows",
                "n_parent_rows",
                "n_unreferenced_parents",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# --- Cohort lifetime value ----------------------------------------------------


@query(
    "q_cohort_ltv",
    # Revenue is folded in integer CENTS (half-up quantization) so the
    # cumulative window sum is order-independent and exact in both
    # engines; division back to currency happens only at the edge, and
    # the per-user LTV rounds via explicit FLOOR(x+0.5) — cents/users
    # rationals land on exact .00005 halves where library ROUNDs diverge.
    oracle="""
    WITH ev AS (
        SELECT user_id, event_type, CAST(ts AS DATE) AS d,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    cohorts AS (SELECT user_id, MIN(d) AS cohort_day FROM ev GROUP BY user_id),
    sizes AS (SELECT cohort_day, COUNT(*) AS cohort_users FROM cohorts GROUP BY cohort_day),
    cells AS (
        SELECT c.cohort_day, DATEDIFF('day', c.cohort_day, e.d) AS age_days,
               COUNT(DISTINCT e.user_id) AS active_users,
               CAST(SUM(CASE WHEN e.event_type = 'purchase' THEN e.cents ELSE 0 END) AS BIGINT)
                   AS rev_cents
        FROM ev e JOIN cohorts c ON e.user_id = c.user_id
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT cohort_day, age_days, active_users, rev_cents,
               SUM(rev_cents) OVER (
                   PARTITION BY cohort_day ORDER BY age_days
                   ROWS UNBOUNDED PRECEDING
               ) AS cum_cents
        FROM cells
    )
    SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
           c.age_days,
           CAST(c.active_users AS BIGINT) AS active_users,
           ROUND(c.rev_cents / 100.0, 2) AS revenue,
           ROUND(c.cum_cents / 100.0, 2) AS cum_revenue,
           FLOOR(c.cum_cents * 100.0 / s.cohort_users + 0.5) / 10000.0 AS ltv_per_user
    FROM cum c JOIN sizes s ON c.cohort_day = s.cohort_day
    """,
    tags=("behavioral", "cohort", "ltv", "window"),
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users cohorted by first-seen day;
    for each (cohort, age-in-days) cell the active users, purchase
    revenue, cumulative revenue, and cumulative LTV per cohort user —
    the retention table's revenue twin, and the curve a data platform
    publishes to compare acquisition cohorts.

    Scale: one shuffle to find first-seen per user, one aggregate on the
    bounded (cohort, age) grid, one running-sum window per cohort over
    at most the observation span in days. Money folds as integer cents,
    so cumulative sums are exact and engine-independent at any scale.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    ev = e.select(
        "user_id",
        "event_type",
        F.to_date("ts").alias("d"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    cohorts = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    sizes = cohorts.groupBy("cohort_day").agg(F.count("*").alias("cohort_users"))
    cells = (
        ev.join(F.broadcast(cohorts), "user_id")
        .groupBy("cohort_day", F.datediff("d", "cohort_day").alias("age_days"))
        .agg(
            F.countDistinct("user_id").alias("active_users"),
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("cents")).otherwise(0)
            ).alias("rev_cents"),
        )
    )
    w = (
        W.partitionBy("cohort_day")
        .orderBy("age_days")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = cells.withColumn("cum_cents", F.sum("rev_cents").over(w))
    return cum.join(F.broadcast(sizes), "cohort_day").select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        "age_days",
        "active_users",
        F.round(F.col("rev_cents") / 100.0, 2).alias("revenue"),
        F.round(F.col("cum_cents") / 100.0, 2).alias("cum_revenue"),
        (
            F.floor(F.col("cum_cents") * 100.0 / F.col("cohort_users") + 0.5) / 10000.0
        ).alias("ltv_per_user"),
    )


# --- Skyline (Pareto frontier) -----------------------------------------------


@query(
    "q_skyline_parts",
    # Oracle is the naive NOT-EXISTS dominance check (quadratic, the
    # SEMANTICS); Spark computes the same frontier with the sort +
    # prefix-min algorithm (n log n) and must agree exactly. Dominance:
    # q <= p on both axes and strictly < on at least one; equal points
    # do not dominate each other, so duplicates of a frontier point all
    # survive.
    oracle="""
    SELECT p.p_partkey, p.p_retailprice AS price, p.p_size AS size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)
    )
    """,
    tags=("skyline", "pareto", "window", "custom-op"),
)
def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-dimensional skyline of the part catalog (minimize price AND
    size): the Pareto-optimal parts no other part beats on both axes —
    the multi-criteria "best offers" operator behind product search and
    query-optimization literature benchmarks.

    Scale: instead of the oracle's quadratic dominance join, the
    frontier falls out of sort + prefix-min: per distinct price, the min
    size; a running strict-min over lower prices; a price group
    survives iff its min size undercuts every cheaper group's, and its
    survivors are the rows AT that min size. The window runs over
    DISTINCT PRICES (catalog-bounded, orders of magnitude below row
    count); at 100 TB the same prefix-min splits into per-range minima +
    a broadcast prefix combine — the standard distributed-scan
    decomposition, no quadratic stage anywhere.
    """
    p = load_tables(spark, sf_dir, ("part",))["part"]
    grp = p.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.min("p_size").alias("m")
    )
    w = W.orderBy("price").rowsBetween(W.unboundedPreceding, -1)
    keep = (
        grp.withColumn("prev_min", F.min("m").over(w))
        .filter(F.col("prev_min").isNull() | (F.col("m") < F.col("prev_min")))
        .select("price", "m")
    )
    return (
        p.join(
            F.broadcast(keep),
            (F.col("p_retailprice") == F.col("price")) & (F.col("p_size") == F.col("m")),
        )
        .select("p_partkey", "price", F.col("p_size").alias("size"))
    )


# --- Sequential path mining --------------------------------------------------

PATHS_TOPK = 10


@query(
    "q_top_paths",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type, 1) OVER w AS t2,
               LEAD(event_type, 2) OVER w AS t3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
        SELECT event_type || '>' || t2 || '>' || t3 AS path
        FROM seq WHERE t3 IS NOT NULL
    )
    SELECT path, COUNT(*) AS n_occurrences
    FROM paths GROUP BY path
    ORDER BY n_occurrences DESC, path ASC
    LIMIT {PATHS_TOPK}
    """,
    tags=("behavioral", "sequence-mining", "window"),
)
def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common 3-step behavior paths across user timelines (sliding
    trigram of event types per user) — the sequence-mining table behind
    Sankey funnels and next-action models, one level up from the
    pairwise q_event_transitions matrix.

    Scale: the double LEAD shares ONE user-partitioned sort (same
    window spec), the path aggregate keys on a |types|^3-bounded
    domain, and the top-k is heap selection. Longer paths are the same
    plan with more LEADs — state stays per-row.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "event_type", "t2", "t3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("path").asc())
        .limit(PATHS_TOPK)
    )


# --- Column profiler ---------------------------------------------------------

_PROFILE_COLS = [
    # (name, kind): kind drives which min/max slot is populated
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_totalprice", "num"),
    ("o_orderstatus", "txt"),
    ("o_orderpriority", "txt"),
    ("o_orderdate", "date"),
]


def _profile_oracle() -> str:
    parts = []
    for name, kind in _PROFILE_COLS:
        if kind == "num":
            mn, mx = f"ROUND(MIN({name}), 2)", f"ROUND(MAX({name}), 2)"
            mt, xt = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
        elif kind == "txt":
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            mt, xt = f"MIN({name})", f"MAX({name})"
        else:  # date
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            mt, xt = (
                f"strftime(MIN(CAST({name} AS DATE)), '%Y-%m-%d')",
                f"strftime(MAX(CAST({name} AS DATE)), '%Y-%m-%d')",
            )
        parts.append(f"""
    SELECT '{name}' AS col_name,
           COUNT({name}) AS n_nonnull,
           COUNT(DISTINCT {name}) AS n_distinct,
           {mn} AS min_num, {mx} AS max_num,
           {mt} AS min_txt, {xt} AS max_txt
    FROM orders""")
    return "\n    UNION ALL\n".join(parts)


@query(
    "q_table_profile",
    oracle=_profile_oracle(),
    tags=("dq", "profiling", "agg"),
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass-per-column data profile of the orders table — non-null
    and distinct counts plus typed min/max (numeric, text, and ISO-date
    slots) — the Deequ/profiler summary a platform materializes before
    writing expectations. Doubles stay numeric and dates render as ISO
    strings so the profile is engine-portable (raw double->string
    formatting is not).

    Scale: each column profile is one map-combinable aggregate;
    COUNT(DISTINCT) becomes approx_count_distinct/HLL at 100 TB (the
    sketch substitution q_approx_aggregates demonstrates) without
    changing the report's shape.
    """
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    rows = []
    for name, kind in _PROFILE_COLS:
        base = [
            F.count(name).alias("n_nonnull"),
            F.countDistinct(name).alias("n_distinct"),
        ]
        if kind == "num":
            base += [
                F.round(F.min(name), 2).cast("double").alias("min_num"),
                F.round(F.max(name), 2).cast("double").alias("max_num"),
                F.lit(None).cast("string").alias("min_txt"),
                F.lit(None).cast("string").alias("max_txt"),
            ]
        elif kind == "txt":
            base += [
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
                F.min(name).alias("min_txt"),
                F.max(name).alias("max_txt"),
            ]
        else:
            base += [
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
                F.date_format(F.min(F.col(name).cast("date")), "yyyy-MM-dd").alias("min_txt"),
                F.date_format(F.max(F.col(name).cast("date")), "yyyy-MM-dd").alias("max_txt"),
            ]
        rows.append(o.agg(*base).select(F.lit(name).alias("col_name"), "*"))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# --- Rolling distinct active users -------------------------------------------

ROLL_DAYS = 7


@query(
    "q_rolling_active_users",
    # Oracle is the naive day-grid range join with COUNT(DISTINCT); the
    # Spark side uses the scalable explode-into-covered-days form.
    oracle=f"""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    grid AS (SELECT DISTINCT d FROM ud)
    SELECT strftime(g.d, '%Y-%m-%d') AS day,
           COUNT(DISTINCT u.user_id) AS rolling_{ROLL_DAYS}d_users
    FROM grid g JOIN ud u
      ON u.d <= g.d AND u.d > g.d - {ROLL_DAYS}
    GROUP BY g.d
    """,
    tags=("window", "distinct", "rolling", "custom-op"),
)
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {N}-day distinct active users per day — the DAU/WAU
    metric. COUNT(DISTINCT) over a sliding frame is NOT expressible as
    a window aggregate (distinctness doesn't decompose), so the
    scalable form explodes each (user, active-day) pair into the <=
    {N} window-end days it covers and counts distinct users per day —
    turning an unbounded-state window into a plain bounded-fan-out
    aggregate. Reported only for days present in the data (the oracle's
    grid), matching the naive range join the oracle spells out.

    Scale: fan-out is exactly {N} rows per (user, day) pair after the
    first distinct — corpus-independent; both shuffles key on uniform
    (user, day) / day grids. The (user, day) distinct is the only
    corpus-sized pass. HLL sketches per day replace the exact distinct
    at 100 TB (mergeable across days — q_hll_sketch_union) with the
    same fan-out shape.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    ud = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    grid = ud.select("d").distinct()
    covered = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), ROLL_DAYS - 1))
        ).alias("day"),
    )
    return (
        covered.join(grid.select(F.col("d").alias("day")), "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias(f"rolling_{ROLL_DAYS}d_users"))
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), f"rolling_{ROLL_DAYS}d_users")
    )


q_rolling_active_users.__doc__ = q_rolling_active_users.__doc__.format(N=ROLL_DAYS)


# --- Funnel latency -----------------------------------------------------------


@query(
    "q_funnel_time_to_convert",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN EPOCH_US(ts) END) AS first_signup,
               MIN(CASE WHEN event_type = 'purchase' THEN EPOCH_US(ts) END) AS first_purchase
        FROM events GROUP BY user_id
    ),
    conv AS (
        SELECT user_id, (first_purchase - first_signup) / 3600000000.0 AS hours
        FROM firsts
        WHERE first_signup IS NOT NULL AND first_purchase > first_signup
    )
    SELECT COUNT(*) AS n_converted,
           ROUND(MIN(hours), 4) AS min_hours,
           ROUND(MEDIAN(hours), 4) AS median_hours,
           ROUND(QUANTILE_CONT(hours, 0.9), 4) AS p90_hours,
           ROUND(MAX(hours), 4) AS max_hours
    FROM conv
    """,
    tags=("behavioral", "funnel", "latency", "percentile"),
)
def q_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup-to-first-purchase latency distribution: for users whose
    first purchase follows their first signup, the conversion-delay
    min/median/p90/max in hours — the time-dimension companion to
    q_funnel_conversion's rate table.

    Scale: one conditional-min aggregate per user (map-combinable),
    then percentiles over the converted-user set; at 100 TB the exact
    percentile becomes the KLL sketch (q_kll_quantile_merge) on the
    same per-user latencies. Epoch-microsecond integer arithmetic keeps
    the hours exact until the final rounding.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    firsts = e.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.unix_micros("ts"))
        ).alias("first_signup"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("first_purchase"),
    )
    conv = firsts.filter(
        F.col("first_signup").isNotNull()
        & (F.col("first_purchase") > F.col("first_signup"))
    ).select(
        ((F.col("first_purchase") - F.col("first_signup")) / 3600000000.0).alias("hours")
    )
    return conv.agg(
        F.count("*").alias("n_converted"),
        F.round(F.min("hours"), 4).alias("min_hours"),
        F.round(F.median("hours"), 4).alias("median_hours"),
        F.round(F.percentile("hours", 0.9), 4).alias("p90_hours"),
        F.round(F.max("hours"), 4).alias("max_hours"),
    )


# --- Seasonal hour-of-day profile --------------------------------------------


@query(
    "q_seasonal_hour_profile",
    oracle="""
    WITH cells AS (
        -- avg from integer cents with explicit half-up: tiny groups put
        -- the mean on exact .00005 halves where library ROUNDs diverge
        SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour_of_day,
               COUNT(*) AS n_events,
               FLOOR(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) * 100.0 / COUNT(*) + 0.5)
                   / 10000.0 AS avg_value
        FROM events GROUP BY 1, 2
    ),
    peaks AS (
        SELECT event_type, MAX(n_events) AS peak_n FROM cells GROUP BY event_type
    )
    SELECT c.event_type, c.hour_of_day, c.n_events, c.avg_value,
           CASE WHEN c.n_events = p.peak_n THEN 1 ELSE 0 END AS is_peak_hour
    FROM cells c JOIN peaks p ON c.event_type = p.event_type
    """,
    tags=("behavioral", "timeseries", "seasonality"),
)
def q_seasonal_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile per event type — volume and mean
    value per hour with the peak hour flagged — the baseline table that
    anomaly detection and capacity planning normalize against (a day
    with traffic far off its hour profile trips the KS drift check).

    Scale: one aggregate on the types x 24 grid plus a broadcast of the
    per-type peaks. Nothing scales beyond the event count's single pass.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    cells = e.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hour_of_day")
    ).agg(
        F.count("*").alias("n_events"),
        (F.floor(F.sum(cents) * 100.0 / F.count("*") + 0.5) / 10000.0).alias("avg_value"),
    )
    peaks = cells.groupBy("event_type").agg(F.max("n_events").alias("peak_n"))
    return cells.join(F.broadcast(peaks), "event_type").select(
        "event_type",
        "hour_of_day",
        "n_events",
        "avg_value",
        F.when(F.col("n_events") == F.col("peak_n"), 1).otherwise(0).alias("is_peak_hour"),
    )


# --- Seasonal-baseline forecast backtest (MASE) ------------------------------


@query(
    "q_seasonal_forecast_eval",
    # Backtest of the hour-profile forecaster: predict the LAST day's
    # hourly counts per type from the average over all prior days,
    # score MAE against the actuals on the full 24-hour grid (absent
    # hours are zero), and scale by the naive previous-day forecast
    # (MASE). All errors reduce to integer sums — |total - actual*n| and
    # |prev - actual| — so the metrics are exact until the final ROUND.
    oracle="""
    WITH ev AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h
        FROM events
    ),
    bounds AS (
        SELECT MAX(d) AS test_day,
               COUNT(DISTINCT CASE WHEN d < (SELECT MAX(d) FROM ev) THEN d END) AS n_train_days
        FROM ev
    ),
    grid AS (
        SELECT t.event_type, g.h
        FROM (SELECT DISTINCT event_type FROM ev) t,
             (SELECT UNNEST(GENERATE_SERIES(0, 23)) AS h) g
    ),
    train AS (
        SELECT e.event_type, e.h, COUNT(*) AS tc
        FROM ev e, bounds b WHERE e.d < b.test_day GROUP BY e.event_type, e.h
    ),
    prev AS (
        SELECT e.event_type, e.h, COUNT(*) AS pc
        FROM ev e, bounds b WHERE e.d = b.test_day - 1 GROUP BY e.event_type, e.h
    ),
    actual AS (
        SELECT e.event_type, e.h, COUNT(*) AS ac
        FROM ev e, bounds b WHERE e.d = b.test_day GROUP BY e.event_type, e.h
    ),
    cells AS (
        SELECT g.event_type,
               COALESCE(t.tc, 0) AS tc, COALESCE(p.pc, 0) AS pc, COALESCE(a.ac, 0) AS ac,
               b.n_train_days AS n
        FROM grid g
        LEFT JOIN train t ON g.event_type = t.event_type AND g.h = t.h
        LEFT JOIN prev p ON g.event_type = p.event_type AND g.h = p.h
        LEFT JOIN actual a ON g.event_type = a.event_type AND g.h = a.h
        CROSS JOIN bounds b
    )
    SELECT event_type,
           ROUND(SUM(ABS(tc - ac * n)) / (24.0 * ANY_VALUE(n)), 4) AS mae_model,
           ROUND(SUM(ABS(pc - ac)) / 24.0, 4) AS mae_naive,
           ROUND(CAST(SUM(ABS(tc - ac * n)) AS DOUBLE) /
                 (ANY_VALUE(n) * NULLIF(SUM(ABS(pc - ac)), 0)), 4) AS mase
    FROM cells GROUP BY event_type
    """,
    tags=("timeseries", "forecast", "evaluation", "statistics"),
)
def q_seasonal_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest with MASE: the hour-of-day profile
    (q_seasonal_hour_profile's shape, trained on all days before the
    last) predicts the final day's hourly event counts; the report
    scores model MAE against the naive previous-day forecast per event
    type. MASE < 1 means seasonality beats persistence — the go/no-go
    every baseline forecaster must clear before anything fancier ships.

    Scale: three bounded (type, hour) aggregates off one event pass, a
    24 x types grid join, and integer-exact error sums (|total -
    actual*n_days| avoids materializing fractional predictions). The
    backtest at 100 TB slides the same query across days.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    ev = e.select(
        "event_type", F.to_date("ts").alias("d"), F.hour("ts").cast("long").alias("h")
    ).localCheckpoint(eager=False)
    mx = ev.agg(F.max("d").alias("test_day"))
    bounds = (
        ev.crossJoin(F.broadcast(mx))
        .select("d", "test_day")
        .filter(F.col("d") < F.col("test_day"))
        .agg(F.countDistinct("d").alias("n_train_days"))
        .crossJoin(F.broadcast(mx))
    )
    types = ev.select("event_type").distinct()
    hours = types.sparkSession.range(0, 24).select(F.col("id").alias("h"))
    grid = types.crossJoin(F.broadcast(hours))
    wb = ev.crossJoin(F.broadcast(bounds))
    train = (
        wb.filter(F.col("d") < F.col("test_day"))
        .groupBy("event_type", "h")
        .agg(F.count("*").alias("tc"))
    )
    prev = (
        wb.filter(F.col("d") == F.date_sub("test_day", 1))
        .groupBy("event_type", "h")
        .agg(F.count("*").alias("pc"))
    )
    actual = (
        wb.filter(F.col("d") == F.col("test_day"))
        .groupBy("event_type", "h")
        .agg(F.count("*").alias("ac"))
    )
    cells = (
        grid.join(train, ["event_type", "h"], "left")
        .join(prev, ["event_type", "h"], "left")
        .join(actual, ["event_type", "h"], "left")
        .crossJoin(F.broadcast(bounds.select("n_train_days")))
        .select(
            "event_type",
            F.coalesce("tc", F.lit(0)).alias("tc"),
            F.coalesce("pc", F.lit(0)).alias("pc"),
            F.coalesce("ac", F.lit(0)).alias("ac"),
            F.col("n_train_days").alias("n"),
        )
    )
    return cells.groupBy("event_type").agg(
        F.round(F.sum(F.abs(F.col("tc") - F.col("ac") * F.col("n"))) / (24.0 * F.first("n")), 4).alias("mae_model"),
        F.round(F.sum(F.abs(F.col("pc") - F.col("ac"))) / 24.0, 4).alias("mae_naive"),
        F.round(
            F.sum(F.abs(F.col("tc") - F.col("ac") * F.col("n"))).cast("double")
            / (F.first("n") * F.nullif(F.sum(F.abs(F.col("pc") - F.col("ac"))), F.lit(0))),
            4,
        ).alias("mase"),
    )


# --- Multi-touch attribution --------------------------------------------------


@query(
    "q_attribution_multi_touch",
    # Linear multi-touch with EXACT cent allocation: every non-purchase
    # touch strictly before the purchase and within the 1-hour window
    # shares the purchase's integer cents by the largest-remainder rule
    # (floor(cents/n) each; the earliest cents-mod-n touches get the
    # extra cent) — how billing systems split money, and what keeps the
    # whole query integer-exact (a naive value/n split produces exact
    # half-cent credits where engine ROUNDs diverge — measured).
    # Purchases with no touch credit 'direct'.
    oracle=f"""
    WITH ev AS (
        SELECT event_id, user_id, event_type,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
               EPOCH_US(ts) AS us
        FROM events
    ),
    p AS (SELECT * FROM ev WHERE event_type = 'purchase'),
    touches AS (
        SELECT p.event_id AS pid, p.cents AS pcents, t.event_type AS touch_type,
               COUNT(*) OVER (PARTITION BY p.event_id) AS n_touches,
               ROW_NUMBER() OVER (
                   PARTITION BY p.event_id ORDER BY t.us, t.event_id
               ) - 1 AS k
        FROM p JOIN ev t
          ON t.user_id = p.user_id AND t.event_type <> 'purchase'
         AND t.us < p.us AND t.us >= p.us - {ATTR_WINDOW_US}
    ),
    credited AS (
        SELECT touch_type,
               pcents // n_touches +
               CASE WHEN k < pcents % n_touches THEN 1 ELSE 0 END AS credit_cents
        FROM touches
        UNION ALL
        SELECT 'direct', p.cents FROM p
        WHERE NOT EXISTS (SELECT 1 FROM touches t WHERE t.pid = p.event_id)
    )
    SELECT touch_type,
           COUNT(*) AS n_credits,
           ROUND(CAST(SUM(credit_cents) AS BIGINT) / 100.0, 2) AS attributed_value
    FROM credited GROUP BY touch_type
    """,
    tags=("behavioral", "attribution", "window", "multi-touch"),
)
def q_attribution_multi_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch revenue attribution: a purchase's cents split
    across ALL of the user's non-purchase touches in the preceding hour
    by the largest-remainder rule (the fairness-over-recency
    counterpart to q_attribution_last_touch), with untouched purchases
    crediting 'direct'. Money stays integer cents end to end, so the
    split conserves every purchase exactly and the report is
    engine-independent.

    Scale: the touch set per purchase comes from ONE user-partitioned
    window with a RANGE frame over epoch-micros — per-row state is the
    hour's touches (rate-bounded), and no purchase x touch self-join
    exists anywhere in the plan. The explode fans out exactly
    n_touches rows per purchase, which the naive join pays anyway.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    ev = e.select(
        "event_id",
        "user_id",
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        F.unix_micros("ts").alias("us"),
    )
    w = W.partitionBy("user_id").orderBy("us").rangeBetween(-ATTR_WINDOW_US, -1)
    touches = F.collect_list(
        F.when(
            F.col("event_type") != "purchase",
            F.struct(F.col("us"), F.col("event_id"), F.col("event_type").alias("t")),
        )
    ).over(w)
    purchases = (
        ev.withColumn("touches", touches)
        .filter(F.col("event_type") == "purchase")
        .select(
            "cents",
            F.array_sort("touches").alias("touches"),
            F.size("touches").alias("n_touches"),
        )
    )
    credited = purchases.filter(F.col("n_touches") > 0).select(
        "cents",
        "n_touches",
        F.posexplode("touches").alias("k", "touch"),
    ).select(
        F.col("touch.t").alias("touch_type"),
        (
            F.floor(F.col("cents") / F.col("n_touches")).cast("long")
            + F.when(F.col("k") < F.col("cents") % F.col("n_touches"), 1).otherwise(0)
        ).alias("credit_cents"),
    ).unionByName(
        purchases.filter(F.col("n_touches") == 0).select(
            F.lit("direct").alias("touch_type"), F.col("cents").alias("credit_cents")
        )
    )
    return credited.groupBy("touch_type").agg(
        F.count("*").alias("n_credits"),
        F.round(F.sum("credit_cents") / 100.0, 2).alias("attributed_value"),
    )


# --- Change-point detection (single mean shift) ------------------------------


@query(
    "q_changepoint_mean_shift",
    # Binary-segmentation step 1, exact arithmetic: per event type, every
    # event boundary is a candidate split; prefix sums of integer cents
    # give both segment means, and the score |meanL - meanR| weighted by
    # the balanced size factor sqrt(nL*nR/n) picks the strongest shift.
    # All candidate scores derive from the same integers in the same
    # per-row formula, so both engines compute bit-identical doubles and
    # the argmax (score DESC, ts ASC) agrees without rounding tricks.
    oracle="""
    WITH ev AS (
        SELECT event_type, event_id, EPOCH_US(ts) AS us,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    pre AS (
        SELECT event_type, event_id, us,
               SUM(cents) OVER w AS pref_cents,
               ROW_NUMBER() OVER w AS k,
               SUM(cents) OVER (PARTITION BY event_type) AS tot_cents,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM ev
        WINDOW w AS (PARTITION BY event_type ORDER BY us, event_id
                     ROWS UNBOUNDED PRECEDING)
    ),
    scored AS (
        SELECT event_type, us, k, n,
               pref_cents / (100.0 * k) AS mean_left,
               (tot_cents - pref_cents) / (100.0 * (n - k)) AS mean_right,
               ABS(pref_cents / (100.0 * k) - (tot_cents - pref_cents) / (100.0 * (n - k)))
                 * SQRT(CAST(k AS DOUBLE) * (n - k) / n) AS score
        FROM pre WHERE k < n
    ),
    best AS (
        SELECT event_type, us, k, n, mean_left, mean_right, score,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY score DESC, us ASC
               ) AS rn
        FROM scored
    )
    SELECT event_type,
           CAST(us AS BIGINT) AS split_us,
           CAST(k AS BIGINT) AS n_left,
           CAST(n - k AS BIGINT) AS n_right,
           ROUND(mean_left, 4) AS mean_left,
           ROUND(mean_right, 4) AS mean_right,
           ROUND(score, 4) AS shift_score
    FROM best WHERE rn = 1
    """,
    tags=("timeseries", "changepoint", "statistics", "custom-op"),
)
def q_changepoint_mean_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point detection per event type: the event boundary
    that maximizes the size-weighted mean shift |mean_left - mean_right|
    * sqrt(nL*nR/n) — the first step of binary segmentation, which is
    how a monitoring pipeline localizes "when did this metric change".
    Iterating on each side finds further breaks with the same plan.

    Scale: one per-type ordered window builds prefix sums (integer
    cents — exact), every row scores its own split in closed form, and
    a per-type argmax picks the break: no per-candidate scan, O(n)
    total. The prefix-sum window splits by day with carried offsets at
    100 TB like every running-total here.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    ev = e.select(
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wp = W.partitionBy("event_type")
    pre = ev.select(
        "event_type",
        "us",
        F.sum("cents").over(w).alias("pref_cents"),
        F.row_number().over(
            W.partitionBy("event_type").orderBy("us", "event_id")
        ).alias("k"),
        F.sum("cents").over(wp).alias("tot_cents"),
        F.count("*").over(wp).alias("n"),
    )
    mean_l = F.col("pref_cents") / (100.0 * F.col("k"))
    mean_r = (F.col("tot_cents") - F.col("pref_cents")) / (100.0 * (F.col("n") - F.col("k")))
    score = F.abs(mean_l - mean_r) * F.sqrt(
        F.col("k").cast("double") * (F.col("n") - F.col("k")) / F.col("n")
    )
    scored = pre.filter(F.col("k") < F.col("n")).select(
        "event_type", "us", "k", "n",
        mean_l.alias("mean_left"), mean_r.alias("mean_right"), score.alias("score"),
    )
    wr = W.partitionBy("event_type").orderBy(F.col("score").desc(), F.col("us").asc())
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("us").alias("split_us"),
            F.col("k").alias("n_left"),
            (F.col("n") - F.col("k")).alias("n_right"),
            F.round("mean_left", 4).alias("mean_left"),
            F.round("mean_right", 4).alias("mean_right"),
            F.round("score", 4).alias("shift_score"),
        )
    )


# --- Strict three-step funnel -------------------------------------------------

FUNNEL3_STEPS = ("signup", "click", "purchase")


@query(
    "q_funnel_three_step",
    # Strict ordering: step 2 must be the user's first click AFTER their
    # first signup; step 3 the first purchase AFTER that click. The
    # composite order key rebases epoch micros to 2023-11 and packs a
    # bounded id component so it stays inside int64 in BOTH engines
    # (raw us * 1e7 overflowed — caught by ANSI mode).
    oracle="""
    WITH ev AS (
        SELECT user_id, event_type,
               (EPOCH_US(ts) - 1700000000000000) * 1000000 + event_id % 1000000 AS k
        FROM events
    ),
    s1 AS (
        SELECT user_id, MIN(k) AS k1
        FROM ev WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.k) AS k2
        FROM ev e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.k > s1.k1
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.k) AS k3
        FROM ev e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.k > s2.k2
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(DISTINCT user_id) FROM ev) AS n_users,
           (SELECT COUNT(*) FROM s1) AS n_signup,
           (SELECT COUNT(*) FROM s2) AS n_then_click,
           (SELECT COUNT(*) FROM s3) AS n_then_purchase,
           ROUND((SELECT COUNT(*) FROM s3) /
                 CAST(NULLIF((SELECT COUNT(*) FROM s1), 0) AS DOUBLE), 4)
               AS full_conversion
    """,
    tags=("behavioral", "funnel", "sequence"),
)
def q_funnel_three_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-sequence three-step funnel (signup -> then click -> then
    purchase): users counted at each stage only if the NEXT step
    strictly follows their previous step's first occurrence — the
    product-analytics funnel where step order matters, not just step
    membership (contrast q_funnel_conversion's any-order pairs).

    Scale: three conditional-min aggregates keyed on user_id — each
    stage reuses the previous stage's (small) first-occurrence table as
    a broadcast; the event stream is scanned per stage with a pushed
    type filter. The composite us*1e7+event_id key keeps ordering total
    and integer-exact.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    ev = e.select(
        "user_id",
        "event_type",
        (
            (F.unix_micros("ts") - 1_700_000_000_000_000) * 1_000_000
            + F.col("event_id") % 1_000_000
        ).alias("k"),
    ).localCheckpoint(eager=False)
    s1 = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("k").alias("k1")
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(s1), "user_id")
        .filter(F.col("k") > F.col("k1"))
        .groupBy("user_id")
        .agg(F.min("k").alias("k2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(s2), "user_id")
        .filter(F.col("k") > F.col("k2"))
        .groupBy("user_id")
        .agg(F.min("k").alias("k3"))
    )
    n_users = ev.agg(F.countDistinct("user_id").alias("n_users"))
    c1 = s1.agg(F.count("*").alias("n_signup"))
    c2 = s2.agg(F.count("*").alias("n_then_click"))
    c3 = s3.agg(F.count("*").alias("n_then_purchase"))
    return (
        n_users.crossJoin(c1).crossJoin(c2).crossJoin(c3)
        .select(
            "n_users",
            "n_signup",
            "n_then_click",
            "n_then_purchase",
            F.round(
                F.col("n_then_purchase") / F.nullif(F.col("n_signup"), F.lit(0)).cast("double"),
                4,
            ).alias("full_conversion"),
        )
    )


# --- PCA top component via integer power iteration ----------------------------

PCA_ITERS = 3
PCA_QUANT = 10000  # embedding quantization grid
PCA_VGRID = 1000  # iterate quantization grid


def _pca_oracle() -> str:
    """Unrolled integer power iteration over the Gram operator, shared
    construction with the Spark side: s_i = q_i . u (exact int), numer_a
    = sum_i q_ia * s_i (exact int), u' = floor(numer/max|numer|*grid+.5)."""
    base = f"""
    q AS (
        SELECT vec_id,
               LIST(CAST(FLOOR(val * {PCA_QUANT} + 0.5) AS BIGINT) ORDER BY pos) AS qv
        FROM (
            SELECT vec_id, g AS pos, embedding[g]::DOUBLE AS val
            FROM embeddings, UNNEST(GENERATE_SERIES(1, LEN(embedding))) t(g)
        ) GROUP BY vec_id
    ),
    u0 AS (
        SELECT LIST(CAST({PCA_VGRID} AS BIGINT) ORDER BY g) AS uv
        FROM UNNEST(GENERATE_SERIES(1, 64)) t(g)
    )"""
    steps = ""
    prev = "u0"
    for t in range(PCA_ITERS):
        steps += f""",
    s{t} AS (
        SELECT q.vec_id, q.qv, list_dot_product(q.qv, {prev}.uv) AS s
        FROM q CROSS JOIN {prev}
    ),
    n{t} AS (
        SELECT pos, CAST(SUM(qv[pos] * s) AS BIGINT) AS numer
        FROM s{t}, UNNEST(GENERATE_SERIES(1, 64)) t(pos)
        GROUP BY pos
    ),
    m{t} AS (SELECT MAX(ABS(numer)) AS mx FROM n{t}),
    u{t + 1} AS (
        SELECT LIST(CAST(FLOOR(CAST(numer AS DOUBLE) / mx * {PCA_VGRID} + 0.5) AS BIGINT)
                    ORDER BY pos) AS uv
        FROM n{t} CROSS JOIN m{t}
    )"""
        prev = f"u{t + 1}"
    return base + steps


@query(
    "q_pca_top_component",
    # Every iterate is integer-exact: dot products and the per-dimension
    # accumulations are sums of bounded BIGINTs (order-free), and the
    # rescale divides exact integers (identical doubles in both engines)
    # before an explicit half-up floor. Only the final Rayleigh/loading
    # outputs touch order-sensitive double sums, and those carry ROUND.
    oracle=f"""
    WITH {_pca_oracle()},
    sf AS (
        SELECT q.vec_id, list_dot_product(q.qv, u.uv) AS s,
               list_dot_product(q.qv, q.qv) AS qq
        FROM q CROSS JOIN u{PCA_ITERS} u
    ),
    uu AS (SELECT list_dot_product(uv, uv) AS udot, uv FROM u{PCA_ITERS}),
    lam AS (
        SELECT SUM(CAST(s AS DOUBLE) * s) / ANY_VALUE(uu.udot) AS lam_raw,
               SUM(CAST(s AS DOUBLE) * s) / ANY_VALUE(uu.udot) / SUM(CAST(qq AS DOUBLE))
                   AS explained
        FROM sf CROSS JOIN uu
    )
    SELECT g AS dim,
           ROUND(uu.uv[g] / SQRT(uu.udot), 4) AS loading,
           ROUND(lam.lam_raw / ({PCA_QUANT}.0 * {PCA_QUANT}), 4) AS lambda_top,
           ROUND(lam.explained, 4) AS explained_ratio
    FROM uu CROSS JOIN lam, UNNEST(GENERATE_SERIES(1, 64)) t(g)
    """,
    tags=("similarity", "X3", "pca", "iterative", "linear-algebra"),
)
def q_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus by {N} power-
    iteration steps against the Gram operator — WITHOUT materializing
    the Gram matrix: each step is one corpus pass computing s_i = q_i.u
    then one bounded per-dimension accumulation sum_i q_ia*s_i (the
    matrix-free matvec). Embeddings and iterates live on integer grids,
    so every iterate is bit-identical across engines and partitionings;
    the output is the 64 loadings plus the Rayleigh eigenvalue and the
    explained-variance ratio — the dominant-direction health check
    (anisotropy / collapsed-embedding detection) next to
    q_embedding_centroid_health.

    Scale: per step, one narrow pass (s is a per-row fold) and a
    64-group aggregate of exact integers; the iterate broadcasts. That
    is the textbook distributed power iteration, and the integer
    formulation removes the floating-point nondeterminism that
    otherwise makes iterative linear algebra unreproducible across
    cluster sizes.
    """
    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    q = e.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * PCA_QUANT + 0.5).cast("long")
        ).alias("qv"),
    ).localCheckpoint(eager=False)
    idot = lambda x, y: F.aggregate(  # integer dot product  # noqa: E731
        F.zip_with(x, y, lambda p, r: p * r), F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    u = spark.range(1).select(
        F.transform(F.sequence(F.lit(1), F.lit(64)), lambda _: F.lit(PCA_VGRID).cast("long")).alias("uv")
    )
    for _ in range(PCA_ITERS):
        s = q.crossJoin(F.broadcast(u)).select(
            "qv", idot(F.col("qv"), F.col("uv")).alias("s")
        )
        numer = (
            s.select(F.posexplode("qv").alias("pos0", "qa"), "s")
            .groupBy("pos0")
            .agg(F.sum(F.col("qa") * F.col("s")).alias("numer"))
        )
        mx = numer.agg(F.max(F.abs("numer")).alias("mx"))
        u = (
            numer.crossJoin(F.broadcast(mx))
            .select(
                "pos0",
                F.floor(F.col("numer").cast("double") / F.col("mx") * PCA_VGRID + 0.5)
                .cast("long")
                .alias("u"),
            )
            .groupBy()
            .agg(F.array_sort(F.collect_list(F.struct("pos0", "u"))).alias("pu"))
            .select(F.transform("pu", lambda st: st["u"]).alias("uv"))
        )
    sf = q.crossJoin(F.broadcast(u)).select(
        idot(F.col("qv"), F.col("uv")).alias("s"),
        idot(F.col("qv"), F.col("qv")).alias("qq"),
    )
    uu = u.select("uv", idot(F.col("uv"), F.col("uv")).alias("udot"))
    lam = (
        sf.crossJoin(F.broadcast(uu.select("udot")))
        .agg(
            (F.sum(F.col("s").cast("double") * F.col("s")) / F.first("udot")).alias("lam_raw"),
            (
                F.sum(F.col("s").cast("double") * F.col("s"))
                / F.first("udot")
                / F.sum(F.col("qq").cast("double"))
            ).alias("explained"),
        )
    )
    dims = uu.select(
        F.posexplode(F.col("uv")).alias("pos0", "ua"), F.col("udot")
    ).select((F.col("pos0") + 1).alias("dim"), "ua", "udot")
    return dims.crossJoin(F.broadcast(lam)).select(
        "dim",
        F.round(F.col("ua") / F.sqrt(F.col("udot")), 4).alias("loading"),
        F.round(F.col("lam_raw") / (float(PCA_QUANT) * PCA_QUANT), 4).alias("lambda_top"),
        F.round("explained", 4).alias("explained_ratio"),
    )


# --- Two-proportion z-test ----------------------------------------------------


@query(
    "q_ab_test_proportions",
    # Conversion-rate counterpart of q_ab_test_ttest: arms by user
    # parity, "conversion" = value over the global median (a per-arm
    # proportion); pooled two-proportion z with the 1.96 verdict. All
    # inputs are integer counts; the median threshold is computed once
    # and is exact-rational, so both engines classify identically.
    oracle="""
    WITH med AS (SELECT MEDIAN(value) AS m FROM events),
    assigned AS (
        SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
               CASE WHEN value > (SELECT m FROM med) THEN 1 ELSE 0 END AS conv
        FROM events
    ),
    arms AS (
        SELECT arm, COUNT(*) AS n, CAST(SUM(conv) AS BIGINT) AS x
        FROM assigned GROUP BY arm
    ),
    wide AS (
        SELECT a.n AS n_a, a.x AS x_a, b.n AS n_b, b.x AS x_b
        FROM arms a JOIN arms b ON a.arm = 'A' AND b.arm = 'B'
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, x_a,
           CAST(n_b AS BIGINT) AS n_b, x_b,
           ROUND(CAST(x_a AS DOUBLE) / n_a, 6) AS rate_a,
           ROUND(CAST(x_b AS DOUBLE) / n_b, 6) AS rate_b,
           ROUND((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b) /
                 SQRT((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)) *
                      (1 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)) *
                      (1.0 / n_a + 1.0 / n_b)), 4) AS z_stat,
           CASE WHEN ABS((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b) /
                 SQRT((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)) *
                      (1 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)) *
                      (1.0 / n_a + 1.0 / n_b))) > 1.96
                THEN 1 ELSE 0 END AS significant
    FROM wide
    """,
    tags=("statistics", "ab-test", "proportions"),
)
def q_ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test readout: arms by user parity, conversion
    defined as an above-median event value, pooled-proportion z
    statistic with the 5%-level verdict — the conversion-rate
    experiment table beside the means-based Welch readout
    (q_ab_test_ttest).

    Scale: a global median (KLL sketch at 100 TB) broadcast as a
    threshold, then one (arm) aggregate of integer counts; the z
    arithmetic is a scalar epilogue.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    med = e.agg(F.median("value").alias("m"))
    assigned = e.crossJoin(F.broadcast(med)).select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
        F.when(F.col("value") > F.col("m"), 1).otherwise(0).alias("conv"),
    )
    arms = assigned.groupBy("arm").agg(
        F.count("*").alias("n"), F.sum("conv").alias("x")
    )
    a = arms.filter(F.col("arm") == "A").select(
        F.col("n").alias("n_a"), F.col("x").alias("x_a")
    )
    b = arms.filter(F.col("arm") == "B").select(
        F.col("n").alias("n_b"), F.col("x").alias("x_b")
    )
    w = a.crossJoin(b)
    p_a = F.col("x_a").cast("double") / F.col("n_a")
    p_b = F.col("x_b").cast("double") / F.col("n_b")
    pool = (F.col("x_a") + F.col("x_b")).cast("double") / (F.col("n_a") + F.col("n_b"))
    z = (p_a - p_b) / F.sqrt(pool * (1 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    return w.select(
        "n_a", "x_a", "n_b", "x_b",
        F.round(p_a, 6).alias("rate_a"),
        F.round(p_b, 6).alias("rate_b"),
        F.round(z, 4).alias("z_stat"),
        F.when(F.abs(z) > 1.96, 1).otherwise(0).alias("significant"),
    )


# --- Winsorized robust statistics ---------------------------------------------


@query(
    "q_winsorized_stats",
    # Clamp thresholds are exact percentiles (identical interpolated
    # doubles in both engines over the same inputs); clamped values fold
    # to integer cents with explicit half-up before averaging, so the
    # robust mean is exact until the final edge division.
    oracle="""
    WITH th AS (
        SELECT event_type,
               QUANTILE_CONT(value, 0.05) AS lo,
               QUANTILE_CONT(value, 0.95) AS hi
        FROM events GROUP BY event_type
    ),
    clamped AS (
        SELECT e.event_type,
               CAST(FLOOR(LEAST(GREATEST(e.value, t.lo), t.hi) * 100 + 0.5) AS BIGINT)
                   AS cents
        FROM events e JOIN th t ON e.event_type = t.event_type
    )
    SELECT c.event_type,
           COUNT(*) AS n_events,
           ROUND(ANY_VALUE(t.lo), 2) AS p05,
           ROUND(ANY_VALUE(t.hi), 2) AS p95,
           FLOOR(SUM(c.cents) * 100.0 / COUNT(*) + 0.5) / 10000.0 AS winsorized_mean
    FROM clamped c JOIN th t ON c.event_type = t.event_type
    GROUP BY c.event_type
    """,
    tags=("statistics", "robust", "winsorize", "dq"),
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5/95 winsorized mean per event type: values clamp to the exact
    5th/95th percentiles before averaging — the robust central estimate
    that tolerates heavy tails without discarding rows (trimming's
    gentler sibling; compare q_udaf_trimmed_mean, which drops instead
    of clamping).

    Scale: thresholds per group come from the percentile pass (KLL
    sketch at 100 TB) and broadcast; the clamp is a narrow expression
    and the mean folds integer cents — one extra map pass over the
    column, no new shuffle shape.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    th = e.groupBy("event_type").agg(
        F.percentile("value", 0.05).alias("lo"),
        F.percentile("value", 0.95).alias("hi"),
    )
    clamped = e.join(F.broadcast(th), "event_type").select(
        "event_type",
        "lo",
        "hi",
        F.floor(
            F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")) * 100 + 0.5
        )
        .cast("long")
        .alias("cents"),
    )
    return clamped.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.first("lo"), 2).alias("p05"),
        F.round(F.first("hi"), 2).alias("p95"),
        (F.floor(F.sum("cents") * 100.0 / F.count("*") + 0.5) / 10000.0).alias(
            "winsorized_mean"
        ),
    )


# --- Audience membership flags ------------------------------------------------


@query(
    "q_audience_flags",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CASE WHEN o.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS has_orders,
           CAST(SUM(CASE WHEN e.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS has_events,
           CAST(SUM(CASE WHEN o.k IS NOT NULL AND e.k IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS has_both,
           CAST(SUM(CASE WHEN o.k IS NULL AND e.k IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS inactive
    FROM customer c
    LEFT JOIN (SELECT DISTINCT o_custkey AS k FROM orders) o ON c.c_custkey = o.k
    LEFT JOIN (SELECT DISTINCT user_id AS k FROM events) e ON c.c_custkey = e.k
    GROUP BY c.c_mktsegment
    """,
    tags=("behavioral", "segmentation", "anti-join"),
)
def q_audience_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience segmentation by cross-table membership: per market
    segment, how many customers have orders, have events, have both,
    or are fully inactive — the multi-source membership matrix behind
    audience builders and reactivation campaigns, computed as two
    distinct-key left joins folded into existence flags (no exploding
    fact join).

    Scale: each membership source reduces to its DISTINCT key set
    first (fact-sized pass, key-sized output) and then joins
    broadcast-style against the dimension; flags aggregate on the
    bounded segment grid.
    """
    t = load_tables(spark, sf_dir, ("customer", "orders", "events"))
    ok = t["orders"].select(F.col("o_custkey").alias("k")).distinct().withColumn("has_o", F.lit(1))
    ek = t["events"].select(F.col("user_id").alias("k")).distinct().withColumn("has_e", F.lit(1))
    flags = (
        t["customer"]
        .join(F.broadcast(ok), t["customer"]["c_custkey"] == ok["k"], "left")
        .drop("k")
        .join(F.broadcast(ek), t["customer"]["c_custkey"] == ek["k"], "left")
        .drop("k")
        .select(
            "c_mktsegment",
            F.coalesce("has_o", F.lit(0)).alias("has_o"),
            F.coalesce("has_e", F.lit(0)).alias("has_e"),
        )
    )
    return flags.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.sum("has_o").alias("has_orders"),
        F.sum("has_e").alias("has_events"),
        F.sum(F.col("has_o") * F.col("has_e")).alias("has_both"),
        F.sum((1 - F.col("has_o")) * (1 - F.col("has_e"))).alias("inactive"),
    )


# --- Order-to-ship latency percentiles ---------------------------------------


@query(
    "q_ship_latency_percentiles",
    oracle="""
    WITH lat AS (
        SELECT o.o_orderpriority,
               DATEDIFF('day', CAST(o.o_orderdate AS DATE), MAX(CAST(l.l_shipdate AS DATE)))
                   AS days_to_full_ship
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(QUANTILE_CONT(days_to_full_ship, 0.5), 1) AS p50_days,
           ROUND(QUANTILE_CONT(days_to_full_ship, 0.9), 1) AS p90_days,
           ROUND(QUANTILE_CONT(days_to_full_ship, 0.99), 1) AS p99_days,
           CAST(MAX(days_to_full_ship) AS BIGINT) AS max_days
    FROM lat GROUP BY o_orderpriority
    """,
    tags=("relational", "latency", "percentile", "sla"),
)
def q_ship_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-complete-shipment latency SLA table: days from order
    date to the LAST line item's ship date, summarized per priority as
    p50/p90/p99/max — the fulfillment-SLA readout, and the pattern for
    any "time to fully complete a multi-part job" metric. Latencies are
    integer day differences, so the percentile inputs are exact.

    Scale: one (order) aggregate for the completion date, one bounded
    (priority) aggregate of percentiles (KLL at 100 TB); the join
    shuffles on the order key it would shuffle on anyway.
    """
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    lat = (
        t["orders"]
        .join(t["lineitem"], t["orders"]["o_orderkey"] == t["lineitem"]["l_orderkey"])
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(
            F.datediff(
                F.max(F.col("l_shipdate").cast("date")), F.col("o_orderdate").cast("date")
            ).alias("days_to_full_ship")
        )
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.percentile("days_to_full_ship", 0.5), 1).alias("p50_days"),
        F.round(F.percentile("days_to_full_ship", 0.9), 1).alias("p90_days"),
        F.round(F.percentile("days_to_full_ship", 0.99), 1).alias("p99_days"),
        F.max("days_to_full_ship").alias("max_days"),
    )


# --- Tolerance-bounded bidirectional as-of join -------------------------------

ASOF_TOL_US = 1800 * 1_000_000  # 30-minute tolerance


@query(
    "q_asof_tolerance",
    # pandas merge_asof parity: for each purchase, the nearest same-user
    # 'view' BACKWARD and FORWARD, each only within the 30-minute
    # tolerance (else null) — plus which direction won. Windows carry
    # the neighbors (ignore-nulls last/first over prior/following rows);
    # the oracle spells the same thing as naive min/max lookups.
    oracle=f"""
    WITH ev AS (
        SELECT event_id, user_id, event_type, EPOCH_US(ts) AS us FROM events
    ),
    p AS (SELECT * FROM ev WHERE event_type = 'purchase'),
    bwd AS (
        SELECT p.event_id AS pid, MAX(v.us) AS b_us
        FROM p JOIN ev v
          ON v.user_id = p.user_id AND v.event_type = 'view'
         AND (v.us < p.us OR (v.us = p.us AND v.event_id < p.event_id))
         AND v.us >= p.us - {ASOF_TOL_US}
        GROUP BY p.event_id
    ),
    fwd AS (
        SELECT p.event_id AS pid, MIN(v.us) AS f_us
        FROM p JOIN ev v
          ON v.user_id = p.user_id AND v.event_type = 'view'
         AND (v.us > p.us OR (v.us = p.us AND v.event_id > p.event_id))
         AND v.us <= p.us + {ASOF_TOL_US}
        GROUP BY p.event_id
    )
    SELECT p.event_id,
           CAST(p.us - b.b_us AS BIGINT) AS backward_gap_us,
           CAST(f.f_us - p.us AS BIGINT) AS forward_gap_us,
           CASE
             WHEN b.b_us IS NULL AND f.f_us IS NULL THEN 'none'
             WHEN f.f_us IS NULL THEN 'backward'
             WHEN b.b_us IS NULL THEN 'forward'
             WHEN p.us - b.b_us <= f.f_us - p.us THEN 'backward'
             ELSE 'forward'
           END AS nearest_direction
    FROM p
    LEFT JOIN bwd b ON p.event_id = b.pid
    LEFT JOIN fwd f ON p.event_id = f.pid
    """,
    tags=("asof", "window", "custom-op", "temporal"),
)
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded bidirectional AS-OF lookup (pandas merge_asof
    with direction='nearest' semantics, decomposed): for each purchase,
    the gap to the nearest same-user 'view' backward and forward within
    a 30-minute tolerance, and which direction is nearer (ties prefer
    backward, merge_asof's rule). The missing-side nulls are part of
    the contract — a purchase with no view inside the window reports
    'none'.

    Scale: ONE user-partitioned sort serves both directions —
    ignore-nulls last over preceding rows and first over following
    rows — versus the oracle's two naive join+aggregate passes; state
    per row is one timestamp per direction. The tolerance is a per-row
    comparison after the window, exactly like q_attribution_last_touch.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    ev = e.select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    base = W.partitionBy("user_id").orderBy("us", "event_id")
    wb = base.rowsBetween(W.unboundedPreceding, -1)
    wf = base.rowsBetween(1, W.unboundedFollowing)
    view_us = F.when(F.col("event_type") == "view", F.col("us"))
    b_us = F.last(view_us, ignorenulls=True).over(wb)
    f_us = F.first(view_us, ignorenulls=True).over(wf)
    p = (
        ev.withColumn("b_us", b_us)
        .withColumn("f_us", f_us)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            F.when(
                F.col("b_us").isNotNull() & (F.col("b_us") >= F.col("us") - ASOF_TOL_US),
                F.col("us") - F.col("b_us"),
            ).alias("backward_gap_us"),
            F.when(
                F.col("f_us").isNotNull() & (F.col("f_us") <= F.col("us") + ASOF_TOL_US),
                F.col("f_us") - F.col("us"),
            ).alias("forward_gap_us"),
        )
    )
    return p.select(
        "event_id",
        "backward_gap_us",
        "forward_gap_us",
        F.when(
            F.col("backward_gap_us").isNull() & F.col("forward_gap_us").isNull(), "none"
        )
        .when(F.col("forward_gap_us").isNull(), "backward")
        .when(F.col("backward_gap_us").isNull(), "forward")
        .when(F.col("backward_gap_us") <= F.col("forward_gap_us"), "backward")
        .otherwise("forward")
        .alias("nearest_direction"),
    )


# --- Time-weighted average ----------------------------------------------------


@query(
    "q_time_weighted_average",
    # TWAP: each observation holds until the next one, so its weight is
    # that duration. Weights are integer MILLISECONDS and values integer
    # cents, so the weighted sum is exact (microsecond weights would
    # overflow int64 at sf1); the plain mean sits beside it to show the
    # sampling-bias correction.
    oracle="""
    WITH seq AS (
        SELECT event_type,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
               (LEAD(EPOCH_US(ts)) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
               ) - EPOCH_US(ts)) // 1000 AS hold_ms
        FROM events
    ),
    held AS (SELECT * FROM seq WHERE hold_ms IS NOT NULL AND hold_ms > 0)
    SELECT event_type,
           COUNT(*) AS n_intervals,
           CAST(SUM(hold_ms) AS BIGINT) AS total_ms,
           FLOOR(SUM(cents * hold_ms) * 100.0 / SUM(hold_ms) + 0.5) / 10000.0
               AS twap,
           FLOOR(SUM(cents) * 100.0 / COUNT(*) + 0.5) / 10000.0 AS plain_mean
    FROM held GROUP BY event_type
    """,
    tags=("timeseries", "twap", "window", "custom-op"),
)
def q_time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per event type (TWAP): each
    observation is weighted by how long it "held" until the next one —
    the correct average for irregularly-sampled state (prices, gauge
    metrics, inventory levels), where the plain mean over-counts bursts
    of rapid updates. Both averages are reported so the sampling bias
    is visible.

    Scale: one LEAD window per type (the timeline sort every
    sequential-op here shares) and one integer-exact aggregate —
    millisecond weights times cent values stay inside int64 at any
    fixture scale. At 100 TB the window splits by day with carried
    boundary rows, like every timeline operator in this repo.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    seq = e.select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        F.expr(
            "(lead(unix_micros(ts)) OVER (PARTITION BY event_type ORDER BY ts, event_id)"
            " - unix_micros(ts)) div 1000"
        ).alias("hold_ms"),
    )
    held = seq.filter(F.col("hold_ms").isNotNull() & (F.col("hold_ms") > 0))
    return held.groupBy("event_type").agg(
        F.count("*").alias("n_intervals"),
        F.sum("hold_ms").alias("total_ms"),
        (
            F.floor(F.sum(F.col("cents") * F.col("hold_ms")) * 100.0 / F.sum("hold_ms") + 0.5)
            / 10000.0
        ).alias("twap"),
        (F.floor(F.sum("cents") * 100.0 / F.count("*") + 0.5) / 10000.0).alias("plain_mean"),
    )
