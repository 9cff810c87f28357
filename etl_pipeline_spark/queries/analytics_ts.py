"""Time-series analytics: autocorrelation, SAX symbolization, additive
seasonal decomposition + anomaly days, linear-interpolation gap fill,
and overlapping-interval merge.

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
from etl_pipeline_spark.queries.base import EPOCH, query


# --- Autocorrelation of the daily event series -------------------------------

ACF_MAX_LAG = 7


@query(
    "q_autocorr_daily",
    oracle=f"""
    WITH daily AS (
        SELECT DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
               COUNT(*) AS x
        FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    b AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM daily),
    spine AS (SELECT UNNEST(GENERATE_SERIES(mn, mx)) AS d FROM b),
    series AS (
        SELECT s.d, COALESCE(daily.x, 0) AS x
        FROM spine s LEFT JOIN daily ON s.d = daily.d
    ),
    st AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s FROM series),
    y AS (SELECT d, CAST(n * x - s AS BIGINT) AS y, n FROM series, st),
    den AS (SELECT CAST(SUM(y * y) AS BIGINT) AS den FROM y),
    lags AS (SELECT UNNEST(GENERATE_SERIES(1, {ACF_MAX_LAG})) AS k),
    num AS (
        SELECT k, CAST(SUM(a.y * bb.y) AS BIGINT) AS num
        FROM y a JOIN lags ON TRUE JOIN y bb ON bb.d = a.d + k
        GROUP BY k
    )
    SELECT CAST(k AS BIGINT) AS lag,
           (SELECT CAST(n AS BIGINT) FROM st) AS n_days,
           num,
           ROUND(num * 1.0 / (SELECT den FROM den), 6) AS acf
    FROM num
    """,
    tags=("timeseries", "autocorrelation", "profile"),
)
def q_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the daily event-count series at lags
    1..{K} — the seasonality/burstiness profile that picks window sizes
    for the seasonal baseline (q_seasonal_hour_profile) and flags
    weekly cycles. Using n-scaled centered values y_t = n*x_t - S keeps
    numerator and denominator exact integers; the single final division
    is rounded to 6 decimals (the EWMA/KS idiom).

    Scale: the series is one day-keyed aggregate (map-combined); the
    lag join touches n_days x {K} rows — trivially small no matter the
    fact-table size, because autocorrelation operates on the already
    aggregated series.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    daily = (
        e.filter(F.col("ts").isNotNull())
        .groupBy(F.datediff(F.to_date("ts"), F.lit(EPOCH)).cast("long").alias("d"))
        .agg(F.count("*").alias("x"))
    )
    bounds = daily.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    spine = bounds.select(F.explode(F.sequence("mn", "mx")).alias("d"))
    series = (
        spine.join(daily, "d", "left")
        .select("d", F.coalesce("x", F.lit(0)).alias("x"))
        .localCheckpoint(eager=False)
    )
    st = series.agg(F.count("*").alias("n"), F.sum("x").alias("s"))
    y = (
        series.crossJoin(F.broadcast(st))
        .select("d", (F.col("n") * F.col("x") - F.col("s")).alias("y"), "n")
        .localCheckpoint(eager=False)
    )
    den = y.agg(F.sum(F.col("y") * F.col("y")).alias("den"))
    lags = (
        spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").alias("k"))
    )
    a = y.select(F.col("d").alias("ad"), F.col("y").alias("ay"), "n")
    bb = y.select(F.col("d").alias("bd"), F.col("y").alias("by"))
    num = (
        a.crossJoin(F.broadcast(lags))
        .join(bb, F.col("bd") == F.col("ad") + F.col("k"))
        .groupBy("k", "n")
        .agg(F.sum(F.col("ay") * F.col("by")).alias("num"))
    )
    return num.crossJoin(F.broadcast(den)).select(
        F.col("k").alias("lag"),
        F.col("n").cast("long").alias("n_days"),
        "num",
        F.round(F.col("num") / F.col("den"), 6).alias("acf"),
    )


q_autocorr_daily.__doc__ = q_autocorr_daily.__doc__.format(K=ACF_MAX_LAG)


# --- SAX symbolization of the daily series -----------------------------------

SAX_SEG_DAYS = 5  # days per PAA segment
SAX_ALPHA = 4  # alphabet size (a-d)


@query(
    "q_sax_symbols",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
               COUNT(*) AS x
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    seg AS (
        SELECT event_type, d // {SAX_SEG_DAYS} AS seg,
               CAST(SUM(x) AS BIGINT) AS segsum
        FROM daily GROUP BY 1, 2
    ),
    sym AS (
        SELECT event_type, seg, segsum,
               NTILE({SAX_ALPHA}) OVER (
                   PARTITION BY event_type ORDER BY segsum, seg) AS lvl
        FROM seg
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           STRING_AGG(chr(CAST(96 + lvl AS INTEGER)), '' ORDER BY seg) AS sax,
           CAST(SUM(segsum) AS BIGINT) AS total_events
    FROM sym GROUP BY event_type
    """,
    tags=("timeseries", "sax", "symbolization"),
)
def q_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX-style symbolization of each event type's daily series:
    piecewise aggregation over {S}-day segments, then each segment maps
    to one of {A} alphabet levels by its within-series NTILE rank (the
    rank-based discretization variant — exactly engine-portable where
    the Gaussian-breakpoint original depends on float z-scores). The
    output symbol strings feed motif discovery and cheap series
    similarity (compare strings instead of series).

    Scale: two map-combined aggregations plus one window partitioned by
    event_type over n_segments rows — the series is already tiny after
    the first aggregate regardless of fact-table size.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    # a timestamp-less event has no place in a daily series; NULL d
    # would also ORDER differently across engines (Spark NULLS FIRST
    # asc vs DuckDB NULLS LAST) — exclude identically on both sides
    daily = e.filter(F.col("ts").isNotNull()).groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit(EPOCH)).cast("long").alias("d"),
    ).agg(F.count("*").alias("x"))
    seg = daily.groupBy(
        "event_type", F.expr(f"d div {SAX_SEG_DAYS}").alias("seg")
    ).agg(F.sum("x").alias("segsum"))
    sym = seg.withColumn(
        "lvl",
        F.ntile(SAX_ALPHA).over(
            Window.partitionBy("event_type").orderBy("segsum", "seg")
        ),
    )
    return sym.groupBy("event_type").agg(
        F.count("*").alias("n_segments"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg", "lvl"))),
                lambda s: F.chr(96 + s["lvl"]),
            ),
            "",
        ).alias("sax"),
        F.sum("segsum").alias("total_events"),
    )


# --- Additive seasonal decomposition ----------------------------------------


@query(
    "q_seasonal_decompose",
    oracle="""
    WITH daily AS (
        SELECT DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
               COUNT(*) AS x
        FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    tr AS (
        SELECT d, x,
               CAST(SUM(x) OVER (
                   ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
               ) AS BIGINT) AS s7,
               COUNT(*) OVER (
                   ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
               ) AS c7
        FROM daily
    ),
    dt AS (
        SELECT d, x, (1000 * s7) // 7 AS trend_milli,
               1000 * x - (1000 * s7) // 7 AS detr_milli
        FROM tr WHERE c7 = 7
    ),
    seas AS (
        SELECT d % 7 AS wd,
               CAST(SUM(detr_milli) AS BIGINT) // COUNT(*) AS seasonal_milli
        FROM dt GROUP BY 1
    )
    SELECT CAST(dt.d AS BIGINT) AS d,
           CAST(dt.x AS BIGINT) AS x,
           dt.trend_milli,
           s.seasonal_milli,
           dt.detr_milli - s.seasonal_milli AS resid_milli
    FROM dt JOIN seas s ON dt.d % 7 = s.wd
    """,
    tags=("timeseries", "seasonal-decompose"),
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of the daily event series:
    trend = centered 7-day moving average (exact-integer milli-units,
    emitted only where the full window exists), weekly seasonal =
    per-weekday mean of the detrended series, residual = remainder.
    Every component is integer ``div`` arithmetic — the decomposition is
    bit-identical across engines, unlike float STL.

    Scale: the series is day-keyed after one map-combined aggregate;
    the trend window and the 7-row seasonal join are negligible no
    matter the fact-table volume.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    daily = e.filter(F.col("ts").isNotNull()).groupBy(
        F.datediff(F.to_date("ts"), F.lit(EPOCH)).cast("long").alias("d")
    ).agg(F.count("*").alias("x"))
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d",
        "x",
        F.sum("x").over(w7).alias("s7"),
        F.count("*").over(w7).alias("c7"),
    )
    dt = (
        tr.filter(F.col("c7") == 7)
        .select(
            "d",
            "x",
            F.expr("(1000 * s7) div 7").alias("trend_milli"),
            (F.lit(1000) * F.col("x") - F.expr("(1000 * s7) div 7")).alias(
                "detr_milli"
            ),
        )
        .localCheckpoint(eager=False)
    )
    seas = dt.groupBy((F.col("d") % 7).alias("wd")).agg(
        F.expr("CAST(sum(detr_milli) AS BIGINT) div count(*)").alias(
            "seasonal_milli"
        )
    )
    return (
        dt.join(F.broadcast(seas), dt["d"] % 7 == seas["wd"])
        .select(
            "d",
            "x",
            "trend_milli",
            "seasonal_milli",
            (F.col("detr_milli") - F.col("seasonal_milli")).alias("resid_milli"),
        )
    )


# --- Overlapping-interval merge ----------------------------------------------

IVM_SPAN_MS = 600_000  # each event opens a 10-minute interval


@query(
    "q_interval_merge",
    oracle=f"""
    WITH iv AS (
        SELECT user_id,
               CAST(epoch_ms(ts) AS BIGINT) AS s,
               CAST(epoch_ms(ts) AS BIGINT) + {IVM_SPAN_MS} AS e,
               event_id
        FROM events
    ),
    m AS (
        SELECT user_id, s, e,
               COALESCE(MAX(e) OVER (
                   PARTITION BY user_id ORDER BY s, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), -1) AS prev_max_e
        FROM iv
    ),
    isl AS (
        SELECT user_id, s, e,
               CAST(SUM(CASE WHEN s > prev_max_e THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS span_id
        FROM m
    ),
    spans AS (
        SELECT user_id, span_id,
               MIN(s) AS span_start, MAX(e) AS span_end
        FROM isl GROUP BY user_id, span_id
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_merged_spans,
           CAST(SUM(span_end - span_start) AS BIGINT) AS covered_ms,
           CAST(MAX(span_end - span_start) AS BIGINT) AS longest_span_ms
    FROM spans GROUP BY user_id
    """,
    tags=("window", "intervals", "merge", "behavioral"),
)
def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-interval merge: each event opens a 10-minute activity
    interval; per user, overlapping/touching intervals coalesce into
    maximal spans (the continuous-time gaps-and-islands — uptime
    stitching, session coverage, on-call windows). A span break occurs
    exactly where an interval starts after the running max end of all
    predecessors; integer epoch-ms arithmetic keeps it engine-exact.
    Completes the interval toolbox next to q_interval_concurrency
    (peak overlap) and q_interval_window_join (interval joins).

    Scale: one user-keyed window sort shared by the running-max and the
    span-id prefix sum, then two aggregates on the same partitioning.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    iv = e.select(
        "user_id",
        F.unix_millis("ts").alias("s"),
        (F.unix_millis("ts") + IVM_SPAN_MS).alias("e"),
        "event_id",
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = iv.withColumn(
        "prev_max_e", F.coalesce(F.max("e").over(wprev), F.lit(-1))
    )
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl = m.withColumn(
        "span_id",
        F.sum(F.when(F.col("s") > F.col("prev_max_e"), 1).otherwise(0)).over(wcum),
    )
    spans = isl.groupBy("user_id", "span_id").agg(
        F.min("s").alias("span_start"), F.max("e").alias("span_end")
    )
    return spans.groupBy("user_id").agg(
        F.count("*").alias("n_merged_spans"),
        F.sum(F.col("span_end") - F.col("span_start")).alias("covered_ms"),
        F.max(F.col("span_end") - F.col("span_start")).alias("longest_span_ms"),
    )


# --- Linear-interpolation gap fill -------------------------------------------


@query(
    "q_linear_interp_gapfill",
    # Known points: purchase-day mean cents (integer). Missing days
    # interpolate linearly between bracketing knowns in exact integer
    # milli-cents: v = 1000*prev + (1000*(next-prev)*(d-pd)) div (nd-pd).
    oracle="""
    WITH daily AS (
        SELECT DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
               CAST(SUM(CAST(FLOOR(LEAST(GREATEST((value) * 100.0 + 0.5, -1000000000000.0), 1000000000000.0)) AS BIGINT)) AS BIGINT)
                   // COUNT(*) AS v
        FROM events WHERE event_type = 'purchase' AND user_id % 5 = 0
        GROUP BY 1
    ),
    b AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM daily),
    spine AS (SELECT UNNEST(GENERATE_SERIES(mn, mx)) AS d FROM b),
    g AS (
        SELECT s.d, daily.v,
               MAX(CASE WHEN daily.v IS NOT NULL THEN s.d END) OVER (
                   ORDER BY s.d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS pd,
               MIN(CASE WHEN daily.v IS NOT NULL THEN s.d END) OVER (
                   ORDER BY s.d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS nd
        FROM spine s LEFT JOIN daily ON s.d = daily.d
    ),
    pv AS (
        SELECT g.d, g.v, g.pd, g.nd,
               (SELECT v FROM daily WHERE daily.d = g.pd) AS pval,
               (SELECT v FROM daily WHERE daily.d = g.nd) AS nval
        FROM g
    )
    SELECT d,
           CASE WHEN v IS NOT NULL THEN 0 ELSE 1 END AS interpolated,
           CASE
               WHEN v IS NOT NULL THEN 1000 * v
               WHEN pval IS NULL THEN 1000 * nval
               WHEN nval IS NULL THEN 1000 * pval
               ELSE 1000 * pval
                    + (1000 * (nval - pval) * (d - pd)) // (nd - pd)
           END AS value_milli
    FROM pv
    """,
    tags=("timeseries", "interpolation", "gapfill"),
)
def q_linear_interp_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill of a sparse daily series (mean
    purchase cents of a user cohort): missing days take the straight
    line between their bracketing known points, edges extend the
    nearest known — the third fill strategy beside zero-fill
    (q_timeseries_gapfill) and LOCF (q_asof_tolerance family), and the
    one dashboards and feature pipelines usually want. Interpolated
    values are exact integer milli-cents (``div`` by the bracket
    width), so the fill is engine-identical.

    Scale: two frame-bounded windows over the densified spine find the
    bracketing knowns (no self-join); the spine is horizon-sized, not
    event-sized.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    daily = (
        e.filter((F.col("event_type") == "purchase") & (F.col("user_id") % 5 == 0))
        .groupBy(F.datediff(F.to_date("ts"), F.lit(EPOCH)).cast("long").alias("d"))
        .agg(
            F.expr(
                "CAST(sum(CAST(FLOOR(LEAST(GREATEST((value) * 100.0 + 0.5, -1000000000000.0), 1000000000000.0)) AS BIGINT)) AS BIGINT)"
                " div count(*)"
            ).alias("v")
        )
        .localCheckpoint(eager=False)
    )
    bounds = daily.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    spine = bounds.select(F.explode(F.sequence("mn", "mx")).alias("d"))
    g = spine.join(daily, "d", "left")
    wb = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wf = Window.orderBy("d").rowsBetween(0, Window.unboundedFollowing)
    # carry the bracketing day AND value in one pass (struct max/min)
    pd_ = F.max(F.when(F.col("v").isNotNull(), F.struct("d", "v"))).over(wb)
    nd_ = F.min(F.when(F.col("v").isNotNull(), F.struct("d", "v"))).over(wf)
    pv = g.select(
        "d",
        "v",
        pd_["d"].alias("pd"),
        pd_["v"].alias("pval"),
        nd_["d"].alias("nd"),
        nd_["v"].alias("nval"),
    )
    interp = (
        F.lit(1000) * F.col("pval")
        + F.expr("(1000 * (nval - pval) * (d - pd)) div (nd - pd)")
    )
    return pv.select(
        "d",
        F.when(F.col("v").isNotNull(), 0).otherwise(1).alias("interpolated"),
        F.when(F.col("v").isNotNull(), 1000 * F.col("v"))
        .when(F.col("pval").isNull(), 1000 * F.col("nval"))
        .when(F.col("nval").isNull(), 1000 * F.col("pval"))
        .otherwise(interp)
        .alias("value_milli"),
    )


# --- Seasonal anomaly days ---------------------------------------------------


@query(
    "q_seasonal_anomaly_days",
    # Recomputes q_seasonal_decompose's integer residuals, then flags
    # days where |residual| exceeds 3x the residual MAD — every
    # quantity including the MAD is an exact integer, so the flagging
    # itself is engine-exact (no float threshold).
    oracle="""
    WITH daily AS (
        SELECT DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
               COUNT(*) AS x
        FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    tr AS (
        SELECT d, x,
               CAST(SUM(x) OVER (
                   ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
               ) AS BIGINT) AS s7,
               COUNT(*) OVER (
                   ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
               ) AS c7
        FROM daily
    ),
    dt AS (
        SELECT d, x, 1000 * x - (1000 * s7) // 7 AS detr_milli
        FROM tr WHERE c7 = 7
    ),
    seas AS (
        SELECT d % 7 AS wd,
               CAST(SUM(detr_milli) AS BIGINT) // COUNT(*) AS sm
        FROM dt GROUP BY 1
    ),
    resid AS (
        SELECT dt.d, dt.x, dt.detr_milli - s.sm AS r
        FROM dt JOIN seas s ON dt.d % 7 = s.wd
    ),
    med AS (
        SELECT r AS m FROM (
            SELECT r, ROW_NUMBER() OVER (ORDER BY r, d) AS rn,
                   COUNT(*) OVER () AS cnt
            FROM resid
        ) WHERE rn = (cnt + 1) // 2
    ),
    mad AS (
        SELECT ad AS mad FROM (
            SELECT ABS(r - m) AS ad,
                   ROW_NUMBER() OVER (ORDER BY ABS(r - m), d) AS rn,
                   COUNT(*) OVER () AS cnt
            FROM resid, med
        ) WHERE rn = (cnt + 1) // 2
    )
    SELECT resid.d, CAST(resid.x AS BIGINT) AS x, resid.r AS resid_milli,
           (SELECT m FROM med) AS median_resid_milli,
           (SELECT mad FROM mad) AS mad_milli
    FROM resid, med, mad
    WHERE ABS(resid.r - med.m) > 3 * mad.mad
    """,
    tags=("timeseries", "anomaly", "seasonal", "robust"),
)
def q_seasonal_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal anomaly detection: days whose decomposition residual
    (q_seasonal_decompose's exact integer remainder) deviates from the
    residual median by more than 3 MADs — trend and weekly cycle are
    removed FIRST, so a busy Monday isn't an anomaly but a busy Sunday
    is. Median and MAD are exact integer order statistics, making the
    flag decision itself engine-exact rather than float-thresholded.
    The streaming twin is streaming/anomaly.py's Poisson-z scorer.

    Scale: identical to the decomposition (day-keyed after one
    map-combined pass) plus two order-statistic picks on the ~30-row
    residual series.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    daily = e.filter(F.col("ts").isNotNull()).groupBy(
        F.datediff(F.to_date("ts"), F.lit(EPOCH)).cast("long").alias("d")
    ).agg(F.count("*").alias("x"))
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d", "x", F.sum("x").over(w7).alias("s7"), F.count("*").over(w7).alias("c7")
    )
    dt = (
        tr.filter(F.col("c7") == 7)
        .select(
            "d",
            "x",
            (F.lit(1000) * F.col("x") - F.expr("(1000 * s7) div 7")).alias(
                "detr_milli"
            ),
        )
        .localCheckpoint(eager=False)
    )
    seas = dt.groupBy((F.col("d") % 7).alias("wd")).agg(
        F.expr("CAST(sum(detr_milli) AS BIGINT) div count(*)").alias("sm")
    )
    resid = (
        dt.join(F.broadcast(seas), dt["d"] % 7 == seas["wd"])
        .select("d", "x", (F.col("detr_milli") - F.col("sm")).alias("r"))
        .localCheckpoint(eager=False)
    )
    med = (
        resid.select(
            "r",
            F.row_number().over(Window.orderBy("r", "d")).alias("rn"),
            F.count("*").over(Window.partitionBy()).alias("cnt"),
        )
        .filter(F.col("rn") == F.expr("(cnt + 1) div 2"))
        .select(F.col("r").alias("m"))
    )
    mad = (
        resid.crossJoin(F.broadcast(med))
        .select(
            F.abs(F.col("r") - F.col("m")).alias("ad"),
            "d",
        )
        .select(
            "ad",
            F.row_number().over(Window.orderBy("ad", "d")).alias("rn"),
            F.count("*").over(Window.partitionBy()).alias("cnt"),
        )
        .filter(F.col("rn") == F.expr("(cnt + 1) div 2"))
        .select(F.col("ad").alias("mad"))
    )
    return (
        resid.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .filter(F.abs(F.col("r") - F.col("m")) > 3 * F.col("mad"))
        .select(
            "d",
            F.col("x").cast("long").alias("x"),
            F.col("r").alias("resid_milli"),
            F.col("m").alias("median_resid_milli"),
            F.col("mad").alias("mad_milli"),
        )
    )


