"""Statistical / bitwise / positional aggregate families — the SQL:2023
aggregate surface a warehouse user expects beyond plain SUM/AVG (SURVEY.md
§2.4 A5 extensions): linear-regression aggregates, mode/median, min_by/
max_by positional extrema, boolean and bitwise reductions, and an
equi-width histogram via width_bucket.

All JVM-side built-ins (pyspark.sql.functions has had the regr_* family
since 3.4/3.5), so every query here stays inside whole-stage codegen with
one map-side-combinable shuffle on a low-cardinality group key — the plan
shape that holds unchanged at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_spark.catalog import load_tables
from etl_pipeline_spark.queries.base import query


@query(
    "q_agg_regression",
    oracle="""
    WITH stats AS (
        SELECT l_returnflag,
               CAST(REGR_COUNT(l_extendedprice, l_quantity) AS BIGINT) AS n,
               ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4)       AS slope,
               ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4)   AS intercept,
               ROUND(REGR_R2(l_extendedprice, l_quantity), 6)          AS r2,
               ROUND(CORR(l_extendedprice, l_quantity), 6)             AS price_qty_corr,
               ROUND(MEDIAN(l_quantity), 1)                            AS median_qty
        FROM lineitem
        GROUP BY l_returnflag
    ),
    modes AS (
        SELECT l_returnflag,
               ARG_MAX(l_quantity, c * 1024 - l_quantity) AS mode_qty
        FROM (
            SELECT l_returnflag, l_quantity, COUNT(*) AS c
            FROM lineitem GROUP BY l_returnflag, l_quantity
        ) qc
        GROUP BY l_returnflag
    )
    SELECT s.*, m.mode_qty
    FROM stats s JOIN modes m USING (l_returnflag)
    """,
    tags=("aggregates", "regression", "A5"),
)
def q_agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag least-squares fit of extendedprice on quantity using
    the SQL regression aggregates (regr_count/slope/intercept/r2) plus
    corr, median, and a deterministic mode — the one-pass bivariate-stats
    family.

    The mode is computed as count-then-smallest-value over a counted
    subaggregate rather than the built-in mode(): under a frequency tie
    the built-in's answer is engine- and partition-order-dependent (the
    sf0.001 fixture has such a tie), while max_by on the single integer
    key ``count * 1024 - quantity`` (1024 > the 1-50 quantity domain)
    picks the most-frequent-then-smallest quantity identically on every
    engine.

    Scale: all algebraic/sketchable aggregates with map-side partial
    combine; the mode subaggregate shuffles on the bounded
    (returnflag, quantity) domain, then a 3-row broadcast join.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    stats = li.groupBy("l_returnflag").agg(
        F.regr_count("l_extendedprice", "l_quantity").cast("long").alias("n"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("price_qty_corr"),
        F.round(F.median("l_quantity"), 1).alias("median_qty"),
    )
    modes = (
        li.groupBy("l_returnflag", "l_quantity")
        .agg(F.count("*").alias("c"))
        .groupBy("l_returnflag")
        .agg(
            F.max_by(
                "l_quantity", F.col("c") * 1024 - F.col("l_quantity")
            ).alias("mode_qty")
        )
    )
    return stats.join(F.broadcast(modes), "l_returnflag")


@query(
    "q_agg_extrema_by",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*)                                 AS n_orders,
           ARG_MIN(o_orderkey, o_totalprice)        AS cheapest_order,
           ARG_MAX(o_orderkey, o_totalprice)        AS priciest_order,
           ROUND(MIN(o_totalprice), 2)              AS min_price,
           ROUND(MAX(o_totalprice), 2)              AS max_price,
           BOOL_AND(o_totalprice > 0)               AS all_positive,
           BOOL_OR(o_orderstatus = 'F')             AS any_finished
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("aggregates", "extrema", "A5"),
)
def q_agg_extrema_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional extrema per order priority: which order is cheapest /
    priciest (min_by/max_by — the ``ARG_MIN`` family), plus boolean
    reductions over the group.

    min_by/max_by tie-break is engine-defined; safe here because the
    extreme o_totalprice is unique within every priority group at all
    three fixture SFs (verified — no two orders share a group's min or
    max price).

    Scale: min_by carries one (key, value) pair per partition per group
    through the partial aggregate — same cost as plain MIN at any scale.
    """
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
    )


@query(
    "q_agg_bitwise",
    oracle="""
    SELECT event_type,
           BIT_AND(user_id % 256)  AS flags_and,
           BIT_OR(user_id % 256)   AS flags_or,
           BIT_XOR(user_id % 256)  AS flags_xor,
           BOOL_AND(value > 0)     AS all_value_positive,
           BOOL_OR(value > 400)    AS any_value_over_400
    FROM events
    GROUP BY event_type
    """,
    tags=("aggregates", "bitwise", "A5"),
)
def q_agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise reductions per event type over a synthetic 8-bit flag word
    (user_id % 256) — the permission-mask / feature-flag fold pattern —
    alongside the boolean aggregate twins.

    Scale: bitwise AND/OR/XOR are associative+commutative, so the partial
    aggregate is a single long per group per partition.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    flags = F.col("user_id") % 256
    return e.groupBy("event_type").agg(
        F.bit_and(flags).alias("flags_and"),
        F.bit_or(flags).alias("flags_or"),
        F.bit_xor(flags).alias("flags_xor"),
        F.bool_and(F.col("value") > 0).alias("all_value_positive"),
        F.bool_or(F.col("value") > 400).alias("any_value_over_400"),
    )


HIST_MIN, HIST_MAX, HIST_BUCKETS = 0.0, 500.0, 10


@query(
    "q_histogram_values",
    oracle=f"""
    SELECT event_type, bucket,
           COUNT(*)               AS n_events,
           ROUND(MIN(value), 2)   AS bucket_min,
           ROUND(MAX(value), 2)   AS bucket_max
    FROM (
        SELECT event_type, value,
               CASE WHEN value < {HIST_MIN} THEN 0
                    WHEN value >= {HIST_MAX} THEN {HIST_BUCKETS + 1}
                    ELSE CAST(FLOOR((value - {HIST_MIN}) * {HIST_BUCKETS} / ({HIST_MAX} - {HIST_MIN})) AS BIGINT) + 1
               END AS bucket
        FROM events
    ) b
    GROUP BY event_type, bucket
    """,
    tags=("aggregates", "histogram", "A5"),
)
def q_histogram_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event values per event type via
    width_bucket (10 buckets over [0, 500), underflow bucket 0 and
    overflow bucket 11 per the SQL spec) with per-bucket extremes.

    The DuckDB oracle spells out width_bucket's defining formula —
    floor((v - min) * n / (max - min)) + 1 — with the same all-exact
    double constants, so both engines bucket identically.

    Scale: a per-row expression plus one aggregate on a (type, bucket)
    key with at most types x 12 groups — histogram of a 100 TB column is
    one map-combine pass.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    bucket = F.width_bucket(
        F.col("value"), F.lit(HIST_MIN), F.lit(HIST_MAX), F.lit(HIST_BUCKETS)
    )
    return (
        e.select("event_type", "value", bucket.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.min("value"), 2).alias("bucket_min"),
            F.round(F.max("value"), 2).alias("bucket_max"),
        )
    )


# --- Count-min sketch heavy hitters -----------------------------------------

from etl_pipeline_spark.operators.cms import (  # noqa: E402
    CMS_DEPTH,
    CMS_WIDTH,
    cms_slots,
)

CMS_TOPK = 20  # heavy hitters reported


def _cms_pos_sql(expr: str, d: int) -> str:
    """DuckDB 32-bit md5 slot for hash row ``d`` (same digit-sum wording as
    llm_ops._hex32_sql, inlined to keep this module import-light)."""
    md5 = f"MD5({expr} || '#cms{d}')"
    digits = " + ".join(
        f"(INSTR('0123456789abcdef', SUBSTR({md5}, {i + 1}, 1)) - 1)"
        f" * CAST({16 ** (8 - 1 - i)} AS BIGINT)"
        for i in range(8)
    )
    return f"(({digits}) % {CMS_WIDTH})"


@query(
    "q_cms_heavy_hitters",
    # Approx-exactly-checked (the Bloom pattern): the count-min sketch is
    # built from md5-derived slots, so BOTH engines materialize the exact
    # same counter table and the oracle checks every estimate, including
    # the collision-induced overestimates the small width provokes. The
    # CMS invariant est >= exact is part of the hashed output.
    oracle=f"""
    WITH words AS (
        SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents
    ),
    counts AS (
        SELECT word, COUNT(*) AS cnt FROM words GROUP BY word
    ),
    slots AS (
        SELECT word, cnt, d,
               CASE d {' '.join(f"WHEN {d} THEN {_cms_pos_sql('word', d)}" for d in range(CMS_DEPTH))} END AS pos
        FROM counts, (SELECT UNNEST(GENERATE_SERIES(0, {CMS_DEPTH - 1})) AS d) seeds
    ),
    counters AS (
        SELECT d, pos, CAST(SUM(cnt) AS BIGINT) AS counter
        FROM slots GROUP BY d, pos
    ),
    top AS (
        SELECT word, cnt FROM counts ORDER BY cnt DESC, word ASC LIMIT {CMS_TOPK}
    )
    SELECT t.word,
           CAST(t.cnt AS BIGINT)                AS exact_cnt,
           CAST(MIN(c.counter) AS BIGINT)       AS cms_est,
           CAST(MIN(c.counter) - t.cnt AS BIGINT) AS overest
    FROM top t
    JOIN slots s ON s.word = t.word
    JOIN counters c ON c.d = s.d AND c.pos = s.pos
    GROUP BY t.word, t.cnt
    """,
    tags=("agg", "sketch", "cms", "approx-exactly-checked"),
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over the document word stream: the
    sketch is a DEPTH x WIDTH counter grid keyed by md5 slots; a word's
    estimate is the min of its DEPTH counters; the report compares the
    estimates for the top-k exact heavy hitters against their true counts
    so the overestimate each collision admits is visible (and checked).

    Scale: at 100 TB the exact `counts` CTE is replaced by the sketch
    alone — counters are built in ONE map-side-combinable aggregation on
    (d, slot) with at most DEPTH*WIDTH groups (here 768), a table that
    broadcasts anywhere; point estimates are O(DEPTH) lookups. The exact
    side here exists to oracle the sketch, exactly like the Bloom and
    HLL/KLL/theta queries. Mergeability: counter grids from shards ADD —
    the same property the KLL/HLL merge queries exercise.
    """
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    slot_arr = cms_slots(F.col("word"))
    slots = counts.select("word", "cnt", F.explode(slot_arr).alias("s")).select(
        "word", "cnt", F.col("s.d").alias("d"), F.col("s.pos").alias("pos")
    )
    counters = slots.groupBy("d", "pos").agg(F.sum("cnt").alias("counter"))
    top = counts.orderBy(F.col("cnt").desc(), F.col("word").asc()).limit(CMS_TOPK)
    top_slots = top.select("word", "cnt", F.explode(slot_arr).alias("s")).select(
        "word", "cnt", F.col("s.d").alias("d"), F.col("s.pos").alias("pos")
    )
    return (
        top_slots.join(F.broadcast(counters), ["d", "pos"])
        .groupBy("word", "cnt")
        .agg(F.min("counter").alias("cms_est"))
        .select(
            "word",
            F.col("cnt").alias("exact_cnt"),
            "cms_est",
            (F.col("cms_est") - F.col("cnt")).alias("overest"),
        )
    )
