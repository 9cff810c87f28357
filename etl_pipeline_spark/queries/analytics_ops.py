"""Ops/data-quality analytics: shuffle-key skew report,
join-cardinality audit, URL canonicalization dedup, dataset card,
spatial radius join, Fellegi-Sunter entity resolution, price/volume
decomposition, FIFO allocation, and exact Shapley attribution.

Split from the former queries/analytics.py along its five documented
groups. Cross-engine determinism follows the house rules
(queries/base.py): money and counts fold as integers, rational scores
are scaled-integer ``div`` folds, and the only floating-point steps are
final single divisions rounded to a fixed number of decimals.
Reference parity: the reference delegates all transformation beyond
ingest to warehouse SQL, and the only SQL its DAG submits is a single
filtered INSERT (reference airflow.py:104-122) — this module is
strictly beyond-reference: the analytics a user of that warehouse would
run downstream, expressed Spark-first with a DuckDB oracle per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_spark.catalog import load_tables
from etl_pipeline_spark.queries.base import query


# --- URL canonicalization dedup ----------------------------------------------


@query(
    "q_url_canonical_dedup",
    # Raw URLs are synthesized deterministically from (source, doc_id)
    # with the messiness web crawls actually carry — mixed case, default
    # :443 port, tracking query params, fragments, trailing slashes —
    # then canonicalized by shared literal-pattern regexp steps (no
    # engine-specific backreference syntax).
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END)
               || '://'
               || (CASE WHEN doc_id % 2 = 0 THEN source || '.example.com'
                        ELSE UPPER(source) || '.EXAMPLE.COM' END)
               || (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END)
               || '/docs/' || CAST(doc_id % 35 AS VARCHAR)
               || (CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END)
               || (CASE WHEN doc_id % 5 = 0
                        THEN '?utm_source=feed&utm_campaign=x' ELSE '' END)
               || (CASE WHEN doc_id % 4 = 0 THEN '#top' ELSE '' END) AS url
        FROM documents
    ),
    canon AS (
        SELECT doc_id, url,
               REGEXP_REPLACE(
                 REGEXP_REPLACE(
                   REGEXP_REPLACE(
                     LOWER(REGEXP_REPLACE(REGEXP_REPLACE(url, '#.*$', '', 'g'),
                                          '\\?.*$', '', 'g')),
                     ':443/', '/', 'g'),
                   ':443$', '', 'g'),
                 '/$', '', 'g') AS canonical_url
        FROM raw
    )
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_variants,
           CAST(COUNT(DISTINCT url) AS BIGINT) AS n_distinct_raw,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc
    FROM canon GROUP BY canonical_url
    """,
    tags=("dedup", "X2", "url", "canonicalization"),
)
def q_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup — the FIRST dedup pass of any web-crawl
    corpus build (before content hashing): lowercase scheme/host, drop
    the default :443 port, strip tracking query params and fragments,
    normalize trailing slashes, then group by canonical form keeping the
    smallest doc_id. The synthesized raw URLs carry every variant class;
    canonical groups collapse up to 4 raw variants each (ids congruent mod lcm(20,35)=140 share source and path) by construction, so the
    op is verified against real collisions, not no-ops.

    Scale: canonicalization is a narrow per-row expression chain
    (regexp on bounded strings, no UDF); the dedup is one shuffle keyed
    by canonical URL — the same plan as q_dedup_exact at any volume.
    """
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, "https").otherwise("HTTPS"),
        F.lit("://"),
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.col("source"), F.lit(".example.com"))
        ).otherwise(F.concat(F.upper("source"), F.lit(".EXAMPLE.COM"))),
        F.when(F.col("doc_id") % 3 == 0, ":443").otherwise(""),
        F.lit("/docs/"),
        F.expr("CAST(doc_id % 35 AS STRING)"),
        F.when(F.col("doc_id") % 2 == 1, "/").otherwise(""),
        F.when(F.col("doc_id") % 5 == 0, "?utm_source=feed&utm_campaign=x").otherwise(
            ""
        ),
        F.when(F.col("doc_id") % 4 == 0, "#top").otherwise(""),
    )
    raw = d.select("doc_id", url.alias("url"))
    canon = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.lower(
                    F.regexp_replace(
                        F.regexp_replace(F.col("url"), "#.*$", ""), r"\?.*$", ""
                    )
                ),
                ":443/",
                "/",
            ),
            ":443$",
            "",
        ),
        "/$",
        "",
    )
    return (
        raw.withColumn("canonical_url", canon)
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_variants"),
            F.countDistinct("url").alias("n_distinct_raw"),
            F.min("doc_id").alias("keeper_doc"),
        )
    )


# --- Dataset card ------------------------------------------------------------


@query(
    "q_dataset_card",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, source,
               LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t <> '')) AS n_tok,
               MD5(LOWER(TRIM(text))) AS fp
        FROM documents
    ),
    langs AS (
        SELECT lang, COUNT(*) AS c FROM toks GROUP BY lang
    ),
    top_lang AS (
        SELECT lang FROM langs ORDER BY c DESC, lang LIMIT 1
    ),
    dup AS (
        SELECT CAST(SUM(cnt - 1) AS BIGINT) AS n_dupes FROM (
            SELECT COUNT(*) AS cnt FROM toks GROUP BY fp
        )
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM toks) AS n_docs,
           (SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) FROM toks) AS n_langs,
           (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) FROM toks) AS n_sources,
           (SELECT CAST(SUM(n_tok) AS BIGINT) FROM toks) AS total_tokens,
           (SELECT CAST(SUM(n_tok) AS BIGINT) // COUNT(*) FROM toks)
               AS mean_tokens,
           (SELECT lang FROM top_lang) AS top_lang,
           (SELECT n_dupes FROM dup) AS n_exact_dupes,
           (SELECT CAST(10000 * n_dupes AS BIGINT)
                   // (SELECT COUNT(*) FROM toks) FROM dup) AS dupe_rate_bp
    """,
    tags=("llm-ops", "X4", "dataset-card", "composition"),
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card in one row — the summary block a corpus release
    ships with (HuggingFace dataset-card / Datasheets-for-Datasets
    shape): document and token counts, language/source breadth, the
    dominant language, and the exact-duplicate rate in basis points
    (fingerprint = md5 of lower/trimmed text, q_dedup_exact's key).
    Integer ``div`` folds keep every figure engine-exact.

    Scale: one corpus pass computes tokens+fingerprints map-side; the
    summary is a handful of scalar aggregates over that pass. This is
    the cheap always-on report that gates corpus publication.
    """
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = d.select(
        "doc_id",
        "lang",
        "source",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("n_tok"),
        F.md5(F.lower(F.trim("text"))).alias("fp"),
    ).localCheckpoint(eager=False)
    base = toks.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_tok").alias("total_tokens"),
        F.expr("CAST(sum(n_tok) AS BIGINT) div count(*)").alias("mean_tokens"),
    )
    top_lang = (
        toks.groupBy("lang")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "lang")
        .limit(1)
        .select(F.col("lang").alias("top_lang"))
    )
    dup = (
        toks.groupBy("fp")
        .agg(F.count("*").alias("cnt"))
        .agg(F.sum(F.col("cnt") - 1).alias("n_exact_dupes"))
    )
    return (
        base.crossJoin(F.broadcast(top_lang))
        .crossJoin(F.broadcast(dup))
        .select(
            "n_docs",
            "n_langs",
            "n_sources",
            "total_tokens",
            "mean_tokens",
            "top_lang",
            "n_exact_dupes",
            F.expr("CAST(10000 * n_exact_dupes AS BIGINT) div n_docs").alias(
                "dupe_rate_bp"
            ),
        )
    )


# --- Data-skew report --------------------------------------------------------


@query(
    "q_data_skew_report",
    # Key-size distribution stats per candidate shuffle key — the
    # numbers that decide between a plain shuffle, AQE skew splitting,
    # and salting/hybrid broadcast (operators/skew.py). Scaled-integer
    # div folds keep every ratio engine-exact.
    oracle="""
    WITH ks AS (
        SELECT 'l_partkey' AS key_col, l_partkey AS k, COUNT(*) AS c
        FROM lineitem GROUP BY 2
        UNION ALL
        SELECT 'l_suppkey', l_suppkey, COUNT(*) FROM lineitem GROUP BY 2
        UNION ALL
        SELECT 'l_orderkey', l_orderkey, COUNT(*) FROM lineitem GROUP BY 2
    ),
    r AS (
        SELECT key_col, k, c,
               ROW_NUMBER() OVER (
                   PARTITION BY key_col ORDER BY c DESC, k) AS rn,
               CAST(SUM(c) OVER (PARTITION BY key_col) AS BIGINT) AS tot,
               COUNT(*) OVER (PARTITION BY key_col) AS nk
        FROM ks
    )
    SELECT key_col,
           CAST(MIN(nk) AS BIGINT) AS n_keys,
           CAST(MIN(tot) AS BIGINT) AS n_rows,
           CAST(MAX(c) AS BIGINT) AS max_key_rows,
           CAST(MIN(CASE WHEN rn = 1 THEN 10000 * c END) AS BIGINT)
               // CAST(MIN(tot) AS BIGINT) AS top_key_bp,
           (10000 * CAST(MAX(c) AS BIGINT) * CAST(MIN(nk) AS BIGINT))
               // CAST(MIN(tot) AS BIGINT) AS max_over_mean_x10000
    FROM r GROUP BY key_col
    """,
    tags=("profile", "skew", "ops"),
)
def q_data_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew report for the fact table's candidate join/agg
    keys: key cardinality, hottest-key share (basis points), and the
    max/mean key-size ratio (x10000) — the exact numbers that decide
    between a plain shuffle, AQE skew-join splitting, salting, and the
    hybrid hot/cold broadcast (operators/skew.py, SKEW_COMPARE.md).
    Run this BEFORE the big join, not after it times out.

    Scale: one aggregate per candidate key plus a per-key window over
    the aggregated key-size table — cost is key cardinality, not fact
    rows; at 100 TB swap the exact counts for the CMS sketch
    (operators/cms.py) with the same report schema.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    parts = []
    for key in ("l_partkey", "l_suppkey", "l_orderkey"):
        parts.append(
            li.groupBy(F.col(key).alias("k"))
            .agg(F.count("*").alias("c"))
            .select(F.lit(key).alias("key_col"), "k", "c")
        )
    ks = parts[0].unionByName(parts[1]).unionByName(parts[2])
    wk = Window.partitionBy("key_col")
    r = ks.select(
        "key_col",
        "c",
        F.row_number()
        .over(Window.partitionBy("key_col").orderBy(F.desc("c"), "k"))
        .alias("rn"),
        F.sum("c").over(wk).alias("tot"),
        F.count("*").over(wk).alias("nk"),
    )
    return r.groupBy("key_col").agg(
        F.min("nk").cast("long").alias("n_keys"),
        F.min("tot").cast("long").alias("n_rows"),
        F.max("c").cast("long").alias("max_key_rows"),
        F.expr(
            "CAST(min(CASE WHEN rn = 1 THEN 10000 * c END) AS BIGINT)"
            " div CAST(min(tot) AS BIGINT)"
        ).alias("top_key_bp"),
        F.expr(
            "(10000 * CAST(max(c) AS BIGINT) * CAST(min(nk) AS BIGINT))"
            " div CAST(min(tot) AS BIGINT)"
        ).alias("max_over_mean_x10000"),
    )


# --- Join-cardinality audit --------------------------------------------------


@query(
    "q_join_cardinality_audit",
    oracle="""
    WITH l AS (
        SELECT l_orderkey AS k, COUNT(*) AS fan FROM lineitem GROUP BY 1
    ),
    o AS (
        SELECT o_orderkey AS k, COUNT(*) AS fan FROM orders GROUP BY 1
    ),
    j AS (
        SELECT COALESCE(l.k, o.k) AS k,
               COALESCE(l.fan, 0) AS lf, COALESCE(o.fan, 0) AS orf
        FROM l FULL OUTER JOIN o ON l.k = o.k
    )
    SELECT CAST(SUM(lf * orf) AS BIGINT) AS est_join_rows,
           CAST(MAX(lf) AS BIGINT) AS max_left_fanout,
           CAST(MAX(orf) AS BIGINT) AS max_right_fanout,
           CAST(MAX(lf * orf) AS BIGINT) AS max_key_output,
           CAST(SUM(CASE WHEN lf > 0 AND orf = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS left_orphan_keys,
           CAST(SUM(CASE WHEN orf > 0 AND lf = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS right_orphan_keys,
           CAST(SUM(CASE WHEN lf > 1 AND orf > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS many_to_many_keys
    FROM j
    """,
    tags=("profile", "join-audit", "dq", "ops"),
)
def q_join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join cardinality audit of lineitem x orders on the order key:
    the EXACT output size the join would produce (sum of per-key fanout
    products), the worst single-key blowup, orphan keys on each side,
    and many-to-many keys — the 30-second check that catches accidental
    row explosions and broken referential assumptions before a
    multi-hour join runs. Complements q_dq_referential_integrity (which
    checks FK validity, not volume).

    Scale: aggregates both sides to per-key fanouts FIRST, then joins
    the two key tables — the audit's join is key-cardinality-sized, not
    fact-sized, and the estimate needs no sampling because per-key
    products are exact.
    """
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    li = t["lineitem"].groupBy(F.col("l_orderkey").alias("lk")).agg(
        F.count("*").alias("lf")
    )
    o = t["orders"].groupBy(F.col("o_orderkey").alias("ok")).agg(
        F.count("*").alias("orf")
    )
    j = li.join(o, li["lk"] == o["ok"], "full_outer").select(
        F.coalesce("lf", F.lit(0)).alias("lf"),
        F.coalesce("orf", F.lit(0)).alias("orf"),
    )
    return j.agg(
        F.sum(F.col("lf") * F.col("orf")).alias("est_join_rows"),
        F.max("lf").alias("max_left_fanout"),
        F.max("orf").alias("max_right_fanout"),
        F.max(F.col("lf") * F.col("orf")).alias("max_key_output"),
        F.sum(
            F.when((F.col("lf") > 0) & (F.col("orf") == 0), 1).otherwise(0)
        ).alias("left_orphan_keys"),
        F.sum(
            F.when((F.col("orf") > 0) & (F.col("lf") == 0), 1).otherwise(0)
        ).alias("right_orphan_keys"),
        F.sum(
            F.when((F.col("lf") > 1) & (F.col("orf") > 1), 1).otherwise(0)
        ).alias("many_to_many_keys"),
    )


# --- Price/volume/mix revenue decomposition ----------------------------------


@query(
    "q_revenue_delta_decomposition",
    # Laspeyres-style decomposition per part brand between the two
    # order-date periods: volume effect (qty delta at old price), price
    # effect (price delta at new qty), computed from integer cents and
    # integer quantities — per-unit prices stay RATIONAL (cents*qty
    # products), so no division ever happens and the decomposition adds
    # up EXACTLY: delta = volume_effect + price_effect per group.
    oracle="""
    WITH li AS (
        SELECT p.p_brand AS brand,
               CASE WHEN l.l_shipdate < TIMESTAMP '1997-01-01'
                    THEN 'old' ELSE 'new' END AS period,
               CAST(FLOOR(l.l_quantity + 0.5) AS BIGINT) AS qty,
               CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    g AS (
        SELECT brand, period,
               CAST(SUM(qty) AS BIGINT) AS q,
               CAST(SUM(cents) AS BIGINT) AS r
        FROM li GROUP BY 1, 2
    ),
    w AS (
        SELECT brand,
               CAST(SUM(CASE WHEN period = 'old' THEN q ELSE 0 END) AS BIGINT) AS q0,
               CAST(SUM(CASE WHEN period = 'old' THEN r ELSE 0 END) AS BIGINT) AS r0,
               CAST(SUM(CASE WHEN period = 'new' THEN q ELSE 0 END) AS BIGINT) AS q1,
               CAST(SUM(CASE WHEN period = 'new' THEN r ELSE 0 END) AS BIGINT) AS r1
        FROM g GROUP BY brand
    )
    SELECT brand, q0, q1, r0 AS rev0_cents, r1 AS rev1_cents,
           r1 - r0 AS delta_cents,
           -- volume effect at old avg price, kept rational via q0-scaling:
           -- ve = (q1 - q0) * (r0/q0); scaled by q0: ve_x_q0 = (q1-q0)*r0
           CASE WHEN q0 > 0 THEN (q1 - q0) * r0 ELSE NULL END AS volume_effect_x_q0,
           -- price effect at new volume: pe = q1 * (r1/q1 - r0/q0);
           -- scaled by q0*q1... keep q0-scale: pe_x_q0 = q0*r1 - q1*r0
           CASE WHEN q0 > 0 THEN q0 * r1 - q1 * r0 ELSE NULL END
               AS price_effect_x_q0
    FROM w
    """,
    tags=("analytics", "decomposition", "business"),
)
def q_revenue_delta_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price/volume revenue-delta decomposition per part brand across
    two shipping periods — the 'why did revenue move' report. Effects
    are carried SCALED BY q0 (volume effect = (q1-q0)*r0, price effect
    = q0*r1 - q1*r0), so everything stays an exact integer and the
    identity q0*delta = volume + price holds EXACTLY per group — no
    rounded per-unit prices that leave an unexplained residual.

    Scale: one join to the part dimension (broadcastable), one
    (brand, period) aggregate, one brand pivot — all map-combined.
    """
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li = (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("p_brand").alias("brand"),
            F.when(F.col("l_shipdate") < "1997-01-01", "old")
            .otherwise("new")
            .alias("period"),
            F.floor(F.col("l_quantity") + 0.5).cast("long").alias("qty"),
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("cents"),
        )
    )
    g = li.groupBy("brand", "period").agg(
        F.sum("qty").alias("q"), F.sum("cents").alias("r")
    )
    w = g.groupBy("brand").agg(
        F.sum(F.when(F.col("period") == "old", F.col("q")).otherwise(0)).alias("q0"),
        F.sum(F.when(F.col("period") == "old", F.col("r")).otherwise(0)).alias("r0"),
        F.sum(F.when(F.col("period") == "new", F.col("q")).otherwise(0)).alias("q1"),
        F.sum(F.when(F.col("period") == "new", F.col("r")).otherwise(0)).alias("r1"),
    )
    return w.select(
        "brand",
        "q0",
        "q1",
        F.col("r0").alias("rev0_cents"),
        F.col("r1").alias("rev1_cents"),
        (F.col("r1") - F.col("r0")).alias("delta_cents"),
        F.when(F.col("q0") > 0, (F.col("q1") - F.col("q0")) * F.col("r0")).alias(
            "volume_effect_x_q0"
        ),
        F.when(
            F.col("q0") > 0, F.col("q0") * F.col("r1") - F.col("q1") * F.col("r0")
        ).alias("price_effect_x_q0"),
    )


# --- FIFO allocation (returns matched against shipments) ---------------------


@query(
    "q_fifo_allocation",
    # Classic FIFO matching via cumulative-interval overlap: supply i
    # covers [S_{i-1}, S_i) of cumulative units, demand j covers
    # [D_{j-1}, D_j); the allocation of j to i is the overlap length.
    # FIFO order is (shipdate, orderkey, linenumber) — fully tied. All
    # integers, and the overlap staircase yields O(n+m) matches per key.
    oracle="""
    WITH base AS (
        SELECT l_partkey AS pk, l_returnflag = 'R' AS is_demand,
               CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qty,
               l_shipdate, l_orderkey, l_linenumber
        FROM lineitem
    ),
    s AS (
        SELECT pk, qty,
               COALESCE(SUM(qty) OVER (
                   PARTITION BY pk ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo,
               SUM(qty) OVER (
                   PARTITION BY pk ORDER BY l_shipdate, l_orderkey, l_linenumber
               ) AS hi
        FROM base WHERE NOT is_demand
    ),
    d AS (
        SELECT pk, qty,
               COALESCE(SUM(qty) OVER (
                   PARTITION BY pk ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo,
               SUM(qty) OVER (
                   PARTITION BY pk ORDER BY l_shipdate, l_orderkey, l_linenumber
               ) AS hi
        FROM base WHERE is_demand
    ),
    alloc AS (
        SELECT s.pk,
               LEAST(s.hi, d.hi) - GREATEST(s.lo, d.lo) AS units
        FROM s JOIN d ON s.pk = d.pk AND s.lo < d.hi AND d.lo < s.hi
    ),
    dem AS (SELECT pk, CAST(SUM(qty) AS BIGINT) AS demand_units FROM d GROUP BY pk),
    sup AS (SELECT pk, CAST(SUM(qty) AS BIGINT) AS supply_units FROM s GROUP BY pk)
    SELECT a.pk AS partkey,
           CAST(COUNT(*) AS BIGINT) AS n_allocations,
           CAST(SUM(a.units) AS BIGINT) AS matched_units,
           CAST(MIN(dem.demand_units) AS BIGINT) AS demand_units,
           CAST(MIN(dem.demand_units) - SUM(a.units) AS BIGINT)
               AS unmatched_units,
           CAST(MIN(sup.supply_units) AS BIGINT) AS supply_units
    FROM alloc a
    JOIN dem ON dem.pk = a.pk
    JOIN sup ON sup.pk = a.pk
    GROUP BY a.pk
    """,
    tags=("window", "fifo", "allocation", "business"),
)
def q_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO allocation: per part, returned quantities ('R' lines) are
    matched against shipped quantities in strict first-in-first-out
    order — the cost-basis / lot-matching shape (inventory COGS, tax
    lots, warranty attribution). The sequential 'consume the oldest
    remaining lot' loop becomes a JOIN: cumulative-unit intervals per
    side overlap exactly where FIFO allocates, so the match list is the
    staircase of interval intersections — O(n+m) pairs per key, no
    iteration, all integers.

    Scale: two windows sharing one (part, shipdate) sort, then an
    equi-join on the part key with an overlap filter — the same binned
    pattern as q_interval_window_join if per-key line counts ever grow
    unbounded.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    base = li.select(
        F.col("l_partkey").alias("pk"),
        (F.col("l_returnflag") == "R").alias("is_demand"),
        F.floor(F.col("l_quantity") + 0.5).cast("long").alias("qty"),
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
    )
    wo = Window.partitionBy("pk").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    wprev = wo.rowsBetween(Window.unboundedPreceding, -1)

    def spans(df):
        return df.select(
            "pk",
            "qty",
            F.coalesce(F.sum("qty").over(wprev), F.lit(0)).alias("lo"),
            F.sum("qty").over(wo).alias("hi"),
        )

    s = spans(base.filter(~F.col("is_demand"))).localCheckpoint(eager=False)
    d = spans(base.filter(F.col("is_demand"))).localCheckpoint(eager=False)
    ss = s.select(F.col("pk"), F.col("lo").alias("slo"), F.col("hi").alias("shi"))
    dd = d.select(F.col("pk"), F.col("lo").alias("dlo"), F.col("hi").alias("dhi"))
    alloc = (
        ss.join(dd, "pk")
        .filter((F.col("slo") < F.col("dhi")) & (F.col("dlo") < F.col("shi")))
        .select(
            "pk",
            (
                F.least("shi", "dhi") - F.greatest("slo", "dlo")
            ).alias("units"),
        )
    )
    dem = d.groupBy("pk").agg(F.sum("qty").alias("demand_units"))
    sup = s.groupBy("pk").agg(F.sum("qty").alias("supply_units"))
    return (
        alloc.groupBy(F.col("pk").alias("partkey"))
        .agg(
            F.count("*").alias("n_allocations"),
            F.sum("units").alias("matched_units"),
        )
        .join(dem.withColumnRenamed("pk", "partkey"), "partkey")
        .join(sup.withColumnRenamed("pk", "partkey"), "partkey")
        .select(
            "partkey",
            "n_allocations",
            "matched_units",
            "demand_units",
            (F.col("demand_units") - F.col("matched_units")).alias(
                "unmatched_units"
            ),
            "supply_units",
        )
    )


# --- Exact Shapley-value attribution -----------------------------------------


def _shapley_oracle() -> str:
    # v(S) = converters whose pre-purchase touch set is a subset of S;
    # m0..m7 are converter counts per exact touch mask (bit0=view,
    # bit1=click, bit2=signup). With 3 players the Shapley weights are
    # {2,1,1,2}/6 by coalition size — carried x6 as exact integers.
    vs = {
        S: " + ".join(f"m{m}" for m in range(8) if (m & ~S) == 0)
        for S in range(8)
    }
    def phi(i: int) -> str:
        bit = 1 << i
        terms = []
        for S in range(8):
            if S & bit:
                continue
            size = bin(S).count("1")
            w6 = {0: 2, 1: 1, 2: 2}[size]
            terms.append(f"{w6} * (({vs[S | bit]}) - ({vs[S]}))")
        return " + ".join(terms)
    return f"""
    WITH fp AS (
        SELECT user_id, MIN(ts) AS first_purchase
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    masks AS (
        SELECT fp.user_id,
               CAST(SUM(DISTINCT CASE e.event_type
                    WHEN 'view' THEN 1 WHEN 'click' THEN 2
                    WHEN 'signup' THEN 4 ELSE 0 END) AS BIGINT) AS mask
        FROM fp LEFT JOIN events e
          ON e.user_id = fp.user_id AND e.ts < fp.first_purchase
         AND e.event_type IN ('view', 'click', 'signup')
        GROUP BY fp.user_id
    ),
    mc AS (
        SELECT {", ".join(
            f"CAST(SUM(CASE WHEN mask = {m} THEN 1 ELSE 0 END) AS BIGINT) AS m{m}"
            for m in range(8))}
        FROM masks
    )
    SELECT channel, phi_x6, v_full, v_empty FROM (
        SELECT 'view' AS channel, CAST({phi(0)} AS BIGINT) AS phi_x6,
               CAST(({vs[7]}) AS BIGINT) AS v_full,
               CAST(({vs[0]}) AS BIGINT) AS v_empty FROM mc
        UNION ALL
        SELECT 'click', CAST({phi(1)} AS BIGINT),
               CAST(({vs[7]}) AS BIGINT), CAST(({vs[0]}) AS BIGINT) FROM mc
        UNION ALL
        SELECT 'signup', CAST({phi(2)} AS BIGINT),
               CAST(({vs[7]}) AS BIGINT), CAST(({vs[0]}) AS BIGINT) FROM mc
    )
    """


@query(
    "q_shapley_attribution",
    oracle=_shapley_oracle(),
    tags=("attribution", "shapley", "game-theory", "behavioral"),
)
def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value attribution over the three pre-purchase touch
    channels (view / click / signup): each channel's credit is its
    average marginal contribution across all 3! coalition orders — the
    game-theoretically fair split that last-touch
    (q_attribution_last_touch) and linear multi-touch
    (q_attribution_multi_touch) approximate. Coalition value v(S) =
    converters whose touch set is inside S; with 3 players the 8
    coalition values come from one mask-count pivot and the Shapley
    weights {{2,1,1,2}}/6 are carried x6, so every credit is an exact
    integer (sum of credits = v(full) - v(empty), checkable).

    Scale: one pass computes each converter's touch mask (join bounded
    by converters x their events), one 8-cell aggregate, then constant
    arithmetic — channel count is the only exponential factor, and
    marketing stacks keep it small; for many channels the standard
    sampling estimator replaces the exact enumeration.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    touches = e.filter(
        F.col("event_type").isin("view", "click", "signup")
    ).select(
        F.col("user_id").alias("tu"),
        "ts",
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .otherwise(4)
        .alias("bit"),
    )
    masks = (
        fp.join(
            touches,
            (fp["user_id"] == touches["tu"])
            & (touches["ts"] < fp["first_purchase"]),
            "left",
        )
        .groupBy("user_id")
        .agg(F.coalesce(F.sum_distinct("bit"), F.lit(0)).alias("mask"))
    )
    mc = masks.agg(
        *[
            F.sum(F.when(F.col("mask") == m, 1).otherwise(0)).alias(f"m{m}")
            for m in range(8)
        ]
    ).localCheckpoint(eager=False)

    def v(S: int):
        cols = [F.col(f"m{m}") for m in range(8) if (m & ~S) == 0]
        out = cols[0]
        for c in cols[1:]:
            out = out + c
        return out

    def phi(i: int):
        bit = 1 << i
        out = F.lit(0).cast("long")
        for S in range(8):
            if S & bit:
                continue
            w6 = {0: 2, 1: 1, 2: 2}[bin(S).count("1")]
            out = out + w6 * (v(S | bit) - v(S))
        return out

    parts = []
    for i, name in enumerate(("view", "click", "signup")):
        parts.append(
            mc.select(
                F.lit(name).alias("channel"),
                phi(i).cast("long").alias("phi_x6"),
                v(7).cast("long").alias("v_full"),
                v(0).cast("long").alias("v_empty"),
            )
        )
    return parts[0].unionByName(parts[1]).unionByName(parts[2])


# --- Spatial radius join -----------------------------------------------------

GEO_SPAN = 1_000_000  # synthetic planar world: coordinates in [0, 1e6)
GEO_R = 100_000  # neighborhood radius


def _geo_hex32(arg: str) -> str:
    return "(" + " + ".join(
        f"(INSTR('0123456789abcdef', SUBSTR(MD5({arg}), {i + 1}, 1)) - 1)"
        f" * CAST({16 ** (8 - 1 - i)} AS BIGINT)"
        for i in range(8)
    ) + ")"


@query(
    "q_spatial_radius_join",
    # Deterministic planar coordinates from md5 (the engine-portable
    # coordinate synthesis); the join is the DBSCAN grid trick applied
    # across TWO point sets: R-sized cells, 3x3 probe, exact integer
    # distance filter. Geographic deployments swap the synthesis for
    # projected coordinates; the plan is identical.
    oracle=f"""
    WITH c AS (
        SELECT c_custkey AS ck,
               {_geo_hex32("CAST(c_custkey AS VARCHAR) || '#gx'")} % {GEO_SPAN} AS x,
               {_geo_hex32("CAST(c_custkey AS VARCHAR) || '#gy'")} % {GEO_SPAN} AS y
        FROM customer
    ),
    s AS (
        SELECT s_suppkey AS sk,
               {_geo_hex32("CAST(s_suppkey AS VARCHAR) || '#sx'")} % {GEO_SPAN} AS x,
               {_geo_hex32("CAST(s_suppkey AS VARCHAR) || '#sy'")} % {GEO_SPAN} AS y
        FROM supplier
    ),
    probes AS (
        SELECT c.ck, c.x, c.y,
               c.x // {GEO_R} + dx.d AS cx, c.y // {GEO_R} + dy.d AS cy
        FROM c,
             (SELECT UNNEST(GENERATE_SERIES(-1, 1)) AS d) dx,
             (SELECT UNNEST(GENERATE_SERIES(-1, 1)) AS d) dy
    ),
    nbrs AS (
        SELECT p.ck, s.sk,
               (p.x - s.x) * (p.x - s.x) + (p.y - s.y) * (p.y - s.y) AS d2
        FROM probes p JOIN s
          ON p.cx = s.x // {GEO_R} AND p.cy = s.y // {GEO_R}
        WHERE (p.x - s.x) * (p.x - s.x) + (p.y - s.y) * (p.y - s.y)
              <= {GEO_R * GEO_R}
    )
    SELECT ck AS custkey,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers_within,
           CAST(MIN(d2) AS BIGINT) AS nearest_d2,
           CAST(MIN(CASE WHEN d2 = md2 THEN sk END) AS BIGINT) AS nearest_supp
    FROM (SELECT ck, sk, d2, MIN(d2) OVER (PARTITION BY ck) AS md2 FROM nbrs)
    GROUP BY ck
    """,
    tags=("spatial", "radius-join", "custom-op", "join"),
)
def q_spatial_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius join: customers matched to all suppliers within
    radius R on a synthetic planar grid (deterministic md5 coordinates)
    — the store-catchment / nearest-facility shape. Grid blocking makes
    it exact AND linear: R-sized cells, each customer probes its 3x3
    cell neighborhood (an equi-join on the cell key), and the integer
    distance filter runs only on candidates — the two-table version of
    q_dbscan_classify's neighbor search, which is exactly how
    geospatial engines (and GeoSpark/Sedona) execute distance joins.

    Scale: constant 9x probe expansion + ONE cell-keyed equi-join; cell
    occupancy bounds the candidate volume, and R is the knob. Output
    aggregates per customer (count, nearest with tie-break), all
    integers.
    """
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    return spatial_radius_join(spark, t["customer"], t["supplier"], radius=GEO_R)


def spatial_radius_join(
    spark: SparkSession, customer: DataFrame, supplier: DataFrame, *, radius: int
) -> DataFrame:
    """Parameterized core of q_spatial_radius_join: radius is an explicit
    argument (the density knob the sf1 soak turns) instead of module
    state, mirroring dbscan_classify(..., eps=...)."""
    hx = lambda col, tag: (  # noqa: E731
        F.conv(
            F.substring(F.md5(F.concat(col.cast("string"), F.lit(tag))), 1, 8),
            16,
            10,
        ).cast("long")
        % GEO_SPAN
    )
    c = customer.select(
        F.col("c_custkey").alias("ck"),
        hx(F.col("c_custkey"), "#gx").alias("x"),
        hx(F.col("c_custkey"), "#gy").alias("y"),
    )
    s = supplier.select(
        F.col("s_suppkey").alias("sk"),
        hx(F.col("s_suppkey"), "#sx").alias("sx"),
        hx(F.col("s_suppkey"), "#sy").alias("sy"),
        (hx(F.col("s_suppkey"), "#sx") / radius).cast("long").alias("cx"),
        (hx(F.col("s_suppkey"), "#sy") / radius).cast("long").alias("cy"),
    )
    off = spark.range(-1, 2).select(F.col("id").alias("d"))
    probes = (
        c.crossJoin(F.broadcast(off.select(F.col("d").alias("dx"))))
        .crossJoin(F.broadcast(off.select(F.col("d").alias("dy"))))
        .select(
            "ck",
            "x",
            "y",
            (F.expr(f"x div {radius}") + F.col("dx")).alias("cx"),
            (F.expr(f"y div {radius}") + F.col("dy")).alias("cy"),
        )
    )
    d2 = (F.col("x") - F.col("sx")) * (F.col("x") - F.col("sx")) + (
        F.col("y") - F.col("sy")
    ) * (F.col("y") - F.col("sy"))
    nbrs = (
        probes.join(s, ["cx", "cy"])
        .filter(d2 <= radius * radius)
        .select("ck", "sk", d2.alias("d2"))
    )
    m = nbrs.withColumn("md2", F.min("d2").over(Window.partitionBy("ck")))
    return m.groupBy(F.col("ck").alias("custkey")).agg(
        F.count("*").alias("n_suppliers_within"),
        F.min("d2").alias("nearest_d2"),
        F.min(F.when(F.col("d2") == F.col("md2"), F.col("sk"))).alias(
            "nearest_supp"
        ),
    )


# --- Fellegi-Sunter entity resolution ----------------------------------------

# Agreement weights (log-odds scaled x1000). The synthesis corrupts the
# dirty copy deterministically: name rotated for key%3==0, segment
# wiped for key%5==0, balance band shifted for key%7==0 — so m-rates
# are known (2/3, 4/5, 6/7) and the weights below are their rounded
# log2(m/u) with u from the field's match-by-chance rate.
ER_W = {
    "name": (9000, -1500),
    "seg": (2000, -1200),
    "band": (2500, -1300),
}
ER_MATCH, ER_POSSIBLE = 8000, 2000


@query(
    "q_entity_resolution_fs",
    oracle=f"""
    WITH clean AS (
        SELECT c_custkey AS k, c_name AS name, c_nationkey AS nat,
               c_mktsegment AS seg,
               CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS band
        FROM customer
    ),
    dirty AS (
        SELECT k + 10000000 AS dk, k AS truth,
               CASE WHEN k % 3 = 0
                    THEN SUBSTR(name, 2, 100) || SUBSTR(name, 1, 1)
                    ELSE name END AS name,
               nat,
               CASE WHEN k % 5 = 0 THEN 'CORRUPTED' ELSE seg END AS seg,
               CASE WHEN k % 7 = 0 THEN band + 1 ELSE band END AS band
        FROM clean
    ),
    cand AS (
        SELECT c.k, d.dk, d.truth, c.name = d.name AS name_eq,
               c.seg = d.seg AS seg_eq, c.band = d.band AS band_eq
        FROM clean c JOIN dirty d ON c.nat = d.nat AND c.band = d.band
        UNION
        SELECT c.k, d.dk, d.truth, c.name = d.name,
               c.seg = d.seg, c.band = d.band
        FROM clean c JOIN dirty d ON c.nat = d.nat AND c.seg = d.seg
    ),
    scored AS (
        SELECT k, dk, truth,
               (CASE WHEN name_eq THEN {ER_W["name"][0]} ELSE {ER_W["name"][1]} END
                + CASE WHEN seg_eq THEN {ER_W["seg"][0]} ELSE {ER_W["seg"][1]} END
                + CASE WHEN band_eq THEN {ER_W["band"][0]} ELSE {ER_W["band"][1]} END)
                   AS score
        FROM cand
    ),
    labeled AS (
        SELECT CASE WHEN score >= {ER_MATCH} THEN 'match'
                    WHEN score >= {ER_POSSIBLE} THEN 'possible'
                    ELSE 'non-match' END AS verdict,
               CASE WHEN k = truth THEN 1 ELSE 0 END AS is_true
        FROM scored
    ),
    n AS (SELECT COUNT(*) AS n_true FROM clean)
    SELECT verdict,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(is_true) AS BIGINT) AS n_true_pairs,
           (10000 * CAST(SUM(is_true) AS BIGINT)) // COUNT(*) AS precision_bp,
           (10000 * CAST(SUM(is_true) AS BIGINT))
               // (SELECT n_true FROM n) AS recall_bp
    FROM labeled GROUP BY verdict
    """,
    tags=("entity-resolution", "fellegi-sunter", "dedup", "X2"),
)
def q_entity_resolution_fs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage on a LABELED
    benchmark: a deterministically-corrupted copy of every customer
    (rotated name for 1/3, wiped segment for 1/5, shifted balance band
    for 1/7) is re-linked to the clean table via MULTI-PASS blocking
    (nation+band UNION nation+segment — a record survives unless both
    pass keys are corrupted), field-agreement scoring with log-odds
    weights, and match/possible/non-match banding. Because truth is
    known by construction, the output IS the precision/recall report
    per verdict band — the ER evaluation loop in one query, exact
    integers throughout.

    Scale: each blocking pass is an equi-join on its composite key
    (block sizes bound the candidate volume — the knob); scoring is a
    narrow expression; the union dedups on the pair key. This is the
    standard production ER shape (multi-pass blocked candidates ->
    vectorized compare -> score bands), with SNM (q_snm_recall_report)
    as the sorted-blocking alternative.
    """
    c0 = load_tables(spark, sf_dir, ("customer",))["customer"]
    clean = c0.select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("band"),
    ).localCheckpoint(eager=False)
    dirty = clean.select(
        (F.col("k") + 10_000_000).alias("dk"),
        F.col("k").alias("truth"),
        F.when(
            F.col("k") % 3 == 0,
            F.concat(F.expr("SUBSTR(name, 2, 100)"), F.expr("SUBSTR(name, 1, 1)")),
        )
        .otherwise(F.col("name"))
        .alias("dname"),
        F.col("nat").alias("dnat"),
        F.when(F.col("k") % 5 == 0, "CORRUPTED").otherwise(F.col("seg")).alias(
            "dseg"
        ),
        F.when(F.col("k") % 7 == 0, F.col("band") + 1)
        .otherwise(F.col("band"))
        .alias("dband"),
    )

    def block(cond):
        return clean.join(dirty, cond).select(
            "k",
            "dk",
            "truth",
            (F.col("name") == F.col("dname")).alias("name_eq"),
            (F.col("seg") == F.col("dseg")).alias("seg_eq"),
            (F.col("band") == F.col("dband")).alias("band_eq"),
        )

    cand = block(
        (F.col("nat") == F.col("dnat")) & (F.col("band") == F.col("dband"))
    ).union(
        block((F.col("nat") == F.col("dnat")) & (F.col("seg") == F.col("dseg")))
    ).distinct()
    score = (
        F.when(F.col("name_eq"), ER_W["name"][0]).otherwise(ER_W["name"][1])
        + F.when(F.col("seg_eq"), ER_W["seg"][0]).otherwise(ER_W["seg"][1])
        + F.when(F.col("band_eq"), ER_W["band"][0]).otherwise(ER_W["band"][1])
    )
    labeled = cand.select(
        F.when(score >= ER_MATCH, "match")
        .when(score >= ER_POSSIBLE, "possible")
        .otherwise("non-match")
        .alias("verdict"),
        F.when(F.col("k") == F.col("truth"), 1).otherwise(0).alias("is_true"),
    )
    n = clean.agg(F.count("*").alias("n_true"))
    return (
        labeled.groupBy("verdict")
        .agg(F.count("*").alias("n_pairs"), F.sum("is_true").alias("n_true_pairs"))
        .crossJoin(F.broadcast(n))
        .select(
            "verdict",
            "n_pairs",
            "n_true_pairs",
            F.expr("(10000 * CAST(n_true_pairs AS BIGINT)) div n_pairs").alias(
                "precision_bp"
            ),
            F.expr("(10000 * CAST(n_true_pairs AS BIGINT)) div n_true").alias(
                "recall_bp"
            ),
        )
    )


