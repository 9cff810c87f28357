"""Statistical analytics: exact-moment profiles, Poisson bootstrap CI,
rank tests (Mann-Whitney, Cliff's delta), chi-square, correlation
matrix, ANOVA + pairwise Welch/Bonferroni, Kaplan-Meier, Theil-Sen,
A/B power analysis, and the vocabulary-richness profiles (hapax,
Heaps' law).

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
from etl_pipeline_spark.functions.grid import sat_cents, sat_quantize, sat_quantize_sql
from etl_pipeline_spark.queries.base import EPOCH, query


# --- Poisson-bootstrap confidence interval -----------------------------------

BOOT_B = 40  # resamples; 95% CI picks ranks 2 and 39
# Poisson(1) CDF thresholds (P(X<=0..4)); u beyond the last -> weight 5
POIS_CDF = (0.3678794412, 0.7357588823, 0.9196986029, 0.9810118431, 0.9963401532)


def _boot_weight_sql(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {p!r} THEN {w}" for w, p in enumerate(POIS_CDF)
    )
    return f"CASE {cases} ELSE 5 END"


@query(
    "q_poisson_bootstrap_ci",
    oracle=f"""
    WITH t AS (
        SELECT o_orderkey,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    ),
    draws AS (
        SELECT b.b, t.cents,
               {_boot_weight_sql(
                   "(("
                   + " + ".join(
                       f"(INSTR('0123456789abcdef', SUBSTR(MD5(CAST(t.o_orderkey AS VARCHAR) || '#' || CAST(b.b AS VARCHAR)), {i + 1}, 1)) - 1)"
                       f" * CAST({16 ** (8 - 1 - i)} AS BIGINT)"
                       for i in range(8)
                   )
                   + ") / 4294967296.0)"
               )} AS w
        FROM t, (SELECT UNNEST(GENERATE_SERIES(0, {BOOT_B - 1})) AS b) b
    ),
    means AS (
        SELECT b, CAST(SUM(w * cents) AS BIGINT) // CAST(SUM(w) AS BIGINT)
                   AS mean_cents
        FROM draws GROUP BY b
    ),
    ranked AS (
        SELECT mean_cents,
               ROW_NUMBER() OVER (ORDER BY mean_cents, b) AS rn
        FROM means
    )
    SELECT (SELECT CAST(SUM(cents) AS BIGINT) // COUNT(*) FROM t) AS est_cents,
           MIN(CASE WHEN rn = 2 THEN mean_cents END) AS ci_lo_cents,
           MIN(CASE WHEN rn = {BOOT_B - 1} THEN mean_cents END) AS ci_hi_cents,
           CAST({BOOT_B} AS BIGINT) AS n_resamples
    FROM ranked
    """,
    tags=("statistics", "bootstrap", "sampling"),
)
def q_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap confidence interval for mean order value via the
    POISSON bootstrap — the resampling scheme that works on distributed
    data because each row draws its own independent Poisson(1)
    multiplicity (no global sample-with-replacement index). Draws are
    md5-derived uniforms mapped through the Poisson(1) inverse CDF, so
    both engines draw the SAME {B} resamples (the q_weighted_sample /
    q_dp_noisy_counts reproducibility idiom); resample means fold as
    integer cents and the CI picks exact order statistics (ranks 2 and
    {B1}).

    Scale: one pass over orders x {B} cheap hash draws, map-combined
    into {B} running (sum, weight) pairs — the classic way to put error
    bars on 100 TB aggregates without moving data.
    """
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    t = o.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    bspine = spark.range(BOOT_B).select(F.col("id").alias("b"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("o_orderkey").cast("string"),
                        F.lit("#"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    w = F.lit(5)
    for wt, p in reversed(list(enumerate(POIS_CDF))):
        w = F.when(u < p, wt).otherwise(w)
    draws = t.crossJoin(F.broadcast(bspine)).select("b", "cents", w.alias("w"))
    means = draws.groupBy("b").agg(
        F.expr("CAST(sum(w * cents) AS BIGINT) div CAST(sum(w) AS BIGINT)").alias(
            "mean_cents"
        )
    )
    ranked = means.withColumn(
        "rn", F.row_number().over(Window.orderBy("mean_cents", "b"))
    )
    est = t.agg(
        F.expr("CAST(sum(cents) AS BIGINT) div count(*)").alias("est_cents")
    )
    return (
        ranked.agg(
            F.min(F.when(F.col("rn") == 2, F.col("mean_cents"))).alias("ci_lo_cents"),
            F.min(F.when(F.col("rn") == BOOT_B - 1, F.col("mean_cents"))).alias(
                "ci_hi_cents"
            ),
        )
        .crossJoin(F.broadcast(est))
        .select(
            "est_cents",
            "ci_lo_cents",
            "ci_hi_cents",
            F.lit(BOOT_B).cast("long").alias("n_resamples"),
        )
    )


q_poisson_bootstrap_ci.__doc__ = q_poisson_bootstrap_ci.__doc__.format(
    B=BOOT_B, B1=BOOT_B - 1
)


# --- Kaplan-Meier survival ---------------------------------------------------

KM_CENSOR_FROM = 27  # users still active in the last 3 fixture days are censored


@query(
    "q_survival_km",
    oracle=f"""
    WITH u AS (
        SELECT user_id,
               MIN(DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE))) AS fd,
               MAX(DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE))) AS ld
        FROM events WHERE ts IS NOT NULL GROUP BY user_id
    ),
    lt AS (
        SELECT user_id, ld - fd AS t,
               CASE WHEN ld >= {KM_CENSOR_FROM} THEN 1 ELSE 0 END AS censored
        FROM u
    ),
    g AS (
        SELECT t,
               CAST(SUM(1 - censored) AS BIGINT) AS d,
               CAST(SUM(censored) AS BIGINT) AS c
        FROM lt GROUP BY t
    ),
    r AS (
        SELECT t, d, c,
               (SELECT COUNT(*) FROM lt)
                 - COALESCE(SUM(d + c) OVER (
                       ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS n_risk
        FROM g
    ),
    f AS (
        SELECT t, d, c, n_risk,
               (n_risk - d) * 1.0 / n_risk AS factor
        FROM r
    ),
    s AS (
        SELECT t, d, c, n_risk,
               MIN(factor) OVER (ORDER BY t) AS minfac,
               SUM(CASE WHEN factor > 0 THEN LN(factor) END)
                   OVER (ORDER BY t) AS logsum
        FROM f
    )
    SELECT CAST(t AS BIGINT) AS t,
           CAST(n_risk AS BIGINT) AS n_risk,
           d AS n_events,
           c AS n_censored,
           CASE WHEN minfac = 0 THEN 0.0
                ELSE ROUND(EXP(logsum), 6) END AS survival
    FROM s
    """,
    tags=("statistics", "survival", "kaplan-meier"),
)
def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of user lifetime (days between first
    and last event), right-censoring users still active in the fixture's
    final 3 days — the churn-analysis estimator. Risk sets and event
    counts are exact integers; the survival product is the only float
    step, computed in log space with a zero-factor guard and rounded to
    6 decimals (the q_dp_noisy_counts tolerance class for the single
    ln/exp round-trip).

    Scale: one user-keyed aggregate, then windows over the DISTINCT
    lifetime values — the curve's length is bounded by the observation
    horizon, not the user count, so a 100 TB event log reduces to the
    same ~30-row series after the first map-combined pass.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    day = F.datediff(F.to_date("ts"), F.lit(EPOCH)).cast("long")
    # NULL ts rows are excluded on both sides: a user with only
    # timestamp-less events has no lifetime, and a NULL t would sort
    # differently across engines (r8 wave-2 find)
    u = (
        e.filter(F.col("ts").isNotNull())
        .groupBy("user_id")
        .agg(F.min(day).alias("fd"), F.max(day).alias("ld"))
    )
    lt = u.select(
        (F.col("ld") - F.col("fd")).alias("t"),
        F.when(F.col("ld") >= KM_CENSOR_FROM, 1).otherwise(0).alias("censored"),
    )
    g = lt.groupBy("t").agg(
        F.sum(1 - F.col("censored")).alias("d"),
        F.sum("censored").alias("c"),
    )
    total = lt.agg(F.count("*").alias("n_total"))
    wprev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    r = (
        g.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            F.col("n_total")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wprev), F.lit(0)),
        )
        .withColumn("factor", (F.col("n_risk") - F.col("d")) * 1.0 / F.col("n_risk"))
    )
    wcum = Window.orderBy("t")
    s = r.withColumn("minfac", F.min("factor").over(wcum)).withColumn(
        "logsum",
        F.sum(F.when(F.col("factor") > 0, F.log("factor"))).over(wcum),
    )
    return s.select(
        "t",
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.when(F.col("minfac") == 0, F.lit(0.0))
        .otherwise(F.round(F.exp("logsum"), 6))
        .alias("survival"),
    )


# --- Higher-moment profile (skewness / kurtosis from exact raw moments) ------


@query(
    "q_moments_skew_kurtosis",
    # Raw moments are exact BIGINT sums of the 0-10 integer discount
    # grid; the closing skew/kurtosis formulas are identical double
    # expressions over those integers in both engines, rounded to 6.
    oracle="""
    WITH g AS (
        SELECT l_returnflag,
               CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS d
        FROM lineitem
    ),
    m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(d) AS BIGINT) AS s1,
               CAST(SUM(d * d) AS BIGINT) AS s2,
               CAST(SUM(d * d * d) AS BIGINT) AS s3,
               CAST(SUM(d * d * d * d) AS BIGINT) AS s4
        FROM g GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           ROUND(s1 * 1.0 / n, 4) AS mean_pct,
           ROUND((s2 * 1.0 / n - (s1 * 1.0 / n) * (s1 * 1.0 / n)), 4) AS var_pct,
           ROUND((s3 * 1.0 / n
                   - 3 * (s1 * 1.0 / n) * (s2 * 1.0 / n)
                   + 2 * (s1 * 1.0 / n) * (s1 * 1.0 / n) * (s1 * 1.0 / n))
                 / POW(s2 * 1.0 / n - (s1 * 1.0 / n) * (s1 * 1.0 / n), 1.5),
                 6) AS skewness,
           ROUND((s4 * 1.0 / n
                   - 4 * (s1 * 1.0 / n) * (s3 * 1.0 / n)
                   + 6 * (s1 * 1.0 / n) * (s1 * 1.0 / n) * (s2 * 1.0 / n)
                   - 3 * (s1 * 1.0 / n) * (s1 * 1.0 / n) * (s1 * 1.0 / n)
                       * (s1 * 1.0 / n))
                 / POW(s2 * 1.0 / n - (s1 * 1.0 / n) * (s1 * 1.0 / n), 2)
                 - 3, 6) AS excess_kurtosis
    FROM m
    """,
    tags=("agg", "moments", "statistics", "profile"),
)
def q_moments_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis of the discount
    distribution per return flag, computed from EXACT integer raw
    moments (the discount lives on a 0-10 percent grid, so sums of
    powers stay in BIGINT) — the portable alternative to built-in
    skewness()/kurtosis(), whose sample-vs-population conventions
    differ across engines. Distribution-shape drift (skew flips,
    heavy tails) is a standard data-quality monitor next to
    q_dq_ks_drift.

    Scale: one map-combined aggregate carrying five integers per group;
    the double math happens on the tiny grouped result.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    g = li.select(
        "l_returnflag",
        F.floor(F.col("l_discount") * 100 + 0.5).cast("long").alias("d"),
    )
    m = g.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("d").alias("s1"),
        F.sum(F.col("d") * F.col("d")).alias("s2"),
        F.sum(F.col("d") * F.col("d") * F.col("d")).alias("s3"),
        F.sum(F.col("d") * F.col("d") * F.col("d") * F.col("d")).alias("s4"),
    )
    mean = F.col("s1") * 1.0 / F.col("n")
    m2r = F.col("s2") * 1.0 / F.col("n")
    m3r = F.col("s3") * 1.0 / F.col("n")
    m4r = F.col("s4") * 1.0 / F.col("n")
    var = m2r - mean * mean
    skew = (m3r - 3 * mean * m2r + 2 * mean * mean * mean) / F.pow(var, 1.5)
    kurt = (
        m4r - 4 * mean * m3r + 6 * mean * mean * m2r - 3 * mean * mean * mean * mean
    ) / F.pow(var, 2) - 3
    return m.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.round(mean, 4).alias("mean_pct"),
        F.round(var, 4).alias("var_pct"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("excess_kurtosis"),
    )


# --- Theil-Sen robust trend --------------------------------------------------


@query(
    "q_theil_sen_trend",
    oracle="""
    WITH daily AS (
        SELECT DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
               COUNT(*) AS x
        FROM events GROUP BY 1
    ),
    b AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM daily),
    spine AS (SELECT UNNEST(GENERATE_SERIES(mn, mx)) AS d FROM b),
    series AS (
        SELECT s.d, COALESCE(daily.x, 0) AS x
        FROM spine s LEFT JOIN daily ON s.d = daily.d
    ),
    slopes AS (
        SELECT a.d AS i, bb.d AS j,
               (1000 * (bb.x - a.x)) // (bb.d - a.d) AS slope_milli
        FROM series a JOIN series bb ON bb.d > a.d
    ),
    ranked AS (
        SELECT slope_milli,
               ROW_NUMBER() OVER (ORDER BY slope_milli, i, j) AS rn,
               COUNT(*) OVER () AS cnt
        FROM slopes
    ),
    med AS (
        SELECT slope_milli AS ts_slope_milli FROM ranked
        WHERE rn = (cnt + 1) // 2
    ),
    resid AS (
        SELECT 1000 * s.x - m.ts_slope_milli * s.d AS ic, s.d
        FROM series s, med m
    ),
    icr AS (
        SELECT ic, ROW_NUMBER() OVER (ORDER BY ic, d) AS rn,
               COUNT(*) OVER () AS cnt
        FROM resid
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM series) AS n_days,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM slopes) AS n_pairs,
           (SELECT CAST(ts_slope_milli AS BIGINT) FROM med) AS slope_milli,
           CAST(ic AS BIGINT) AS intercept_milli
    FROM icr WHERE rn = (cnt + 1) // 2
    """,
    tags=("timeseries", "robust", "theil-sen", "statistics"),
)
def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of the daily event series: the (lower)
    median of all pairwise slopes, plus the median intercept — the
    outlier-resistant alternative to least-squares (q_agg_regression)
    for drift monitoring. Slopes are integer ``div`` milli-units and
    medians are exact order statistics with full tie-breaks, so the
    estimate is engine-identical.

    Scale: pairwise slopes are O(n_days^2) on the ALREADY-AGGREGATED
    series (bounded by the horizon, never the event volume) — ~400
    pairs per month of data. For multi-year series the standard
    repeated-median / sampling variants bound the pair count.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit(EPOCH)).cast("long").alias("d")
    ).agg(F.count("*").alias("x"))
    bounds = daily.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    spine = bounds.select(F.explode(F.sequence("mn", "mx")).alias("d"))
    series = (
        spine.join(daily, "d", "left")
        .select("d", F.coalesce("x", F.lit(0)).alias("x"))
        .localCheckpoint(eager=False)
    )
    a = series.select(F.col("d").alias("i"), F.col("x").alias("xi"))
    bb = series.select(F.col("d").alias("j"), F.col("x").alias("xj"))
    slopes = (
        a.join(bb, F.col("j") > F.col("i"))
        .select(
            "i",
            "j",
            F.expr("(1000 * (xj - xi)) div (j - i)").alias("slope_milli"),
        )
        .localCheckpoint(eager=False)
    )
    wr = Window.orderBy("slope_milli", "i", "j")
    ranked = slopes.select(
        "slope_milli",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("cnt"),
    )
    med = ranked.filter(
        F.col("rn") == F.expr("(cnt + 1) div 2")
    ).select(F.col("slope_milli").alias("ts_slope_milli"))
    resid = series.crossJoin(F.broadcast(med)).select(
        (F.lit(1000) * F.col("x") - F.col("ts_slope_milli") * F.col("d")).alias("ic"),
        "d",
    )
    icr = resid.select(
        "ic",
        F.row_number().over(Window.orderBy("ic", "d")).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("cnt"),
    )
    n_days = series.agg(F.count("*").alias("n_days"))
    n_pairs = slopes.agg(F.count("*").alias("n_pairs"))
    return (
        icr.filter(F.col("rn") == F.expr("(cnt + 1) div 2"))
        .crossJoin(F.broadcast(n_days))
        .crossJoin(F.broadcast(n_pairs))
        .crossJoin(F.broadcast(med))
        .select(
            F.col("n_days").cast("long"),
            F.col("n_pairs").cast("long"),
            F.col("ts_slope_milli").cast("long").alias("slope_milli"),
            F.col("ic").cast("long").alias("intercept_milli"),
        )
    )


# --- Mann-Whitney U (rank-sum) test ------------------------------------------


@query(
    "q_mann_whitney",
    # Average tie ranks are carried DOUBLED (2*avgrank = 2*cnt_before +
    # cnt_tie + 1, an integer), the q_corpus_gini rank-sum idiom; only
    # the final z-score is floating point, rounded to 6.
    oracle="""
    WITH v AS (
        SELECT event_type AS grp,
               CAST(FLOOR(LEAST(GREATEST((value) * 100.0 + 0.5, -1000000000000.0), 1000000000000.0)) AS BIGINT) AS cents
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    dv AS (
        SELECT cents, COUNT(*) AS t,
               CAST(SUM(CASE WHEN grp = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
                   AS ta
        FROM v GROUP BY cents
    ),
    rk AS (
        SELECT cents, t, ta,
               COALESCE(SUM(t) OVER (
                   ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cb
        FROM dv
    ),
    agg AS (
        SELECT CAST(SUM(ta * (2 * cb + t + 1)) AS BIGINT) AS r2a,
               CAST(SUM(ta) AS BIGINT) AS na,
               CAST(SUM(t - ta) AS BIGINT) AS nb,
               CAST(SUM(t * t * t - t) AS BIGINT) AS tie3
        FROM rk
    )
    SELECT na, nb,
           r2a - na * (na + 1) AS u2_a,
           ROUND(
               (r2a - na * (na + 1) - na * nb * 1.0)
               / (2.0 * SQRT(
                   (na * 1.0 * nb / 12.0)
                   * ((na + nb + 1) - tie3 * 1.0
                      / ((na + nb) * (na + nb - 1.0))))),
               6) AS z_score
    FROM agg
    """,
    tags=("statistics", "rank-test", "nonparametric"),
)
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test comparing purchase vs view event
    values — the nonparametric complement to Welch's t
    (q_ab_test_ttest) for skewed metrics. Rank sums use doubled average
    tie ranks (exact integers), the U statistic is exact, and the
    normal approximation carries the standard tie correction; only the
    final z is floating point, rounded to 6.

    Scale: collapse to distinct values (value-keyed aggregate), one
    cumulative window over the collapsed table, one global fold —
    identical shape at any volume because rank arithmetic happens on
    value cardinality, not row count.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    v = e.filter(F.col("event_type").isin("purchase", "view")).select(
        F.col("event_type").alias("grp"),
        sat_cents(F.col("value")).alias("cents"),
    )
    dv = v.groupBy("cents").agg(
        F.count("*").alias("t"),
        F.sum(F.when(F.col("grp") == "purchase", 1).otherwise(0)).alias("ta"),
    )
    wc = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    rk = dv.withColumn("cb", F.coalesce(F.sum("t").over(wc), F.lit(0)))
    agg = rk.agg(
        F.sum(F.col("ta") * (2 * F.col("cb") + F.col("t") + 1)).alias("r2a"),
        F.sum("ta").alias("na"),
        F.sum(F.col("t") - F.col("ta")).alias("nb"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie3"),
    )
    na, nb, r2a, tie3 = F.col("na"), F.col("nb"), F.col("r2a"), F.col("tie3")
    u2a = r2a - na * (na + 1)
    z = (u2a - na * nb * 1.0) / (
        2.0
        * F.sqrt(
            (na * 1.0 * nb / 12.0)
            * ((na + nb + 1) - tie3 * 1.0 / ((na + nb) * (na + nb - 1.0)))
        )
    )
    return agg.select(
        "na",
        "nb",
        u2a.alias("u2_a"),
        F.round(z, 6).alias("z_score"),
    )


# --- Pairwise correlation matrix from exact co-moments -----------------------

CORR_COLS = ("qty", "dollars", "disc_pct", "tax_pct")


def _corr_pairs_sql() -> str:
    pairs = []
    for i, a in enumerate(CORR_COLS):
        for b in CORR_COLS[i + 1:]:
            pairs.append(f"""
    SELECT '{a}' AS var_a, '{b}' AS var_b,
           ROUND((n * s_{a}_{b} - s_{a} * s_{b})
                 / (SQRT(n * s_{a}_{a} - s_{a} * s_{a})
                    * SQRT(n * s_{b}_{b} - s_{b} * s_{b})), 6) AS pearson_r
    FROM m""")
    return "\n    UNION ALL".join(pairs)


@query(
    "q_correlation_matrix",
    # Sums and co-moment sums are exact BIGINTs on integer grids (whole
    # quantities, truncated dollars, percent grids), so the only float
    # step is the final normalized ratio, rounded to 6.
    oracle=f"""
    WITH g AS (
        SELECT CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qty,
               CAST(TRUNC(l_extendedprice) AS BIGINT) AS dollars,
               CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS disc_pct,
               CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT) AS tax_pct
        FROM lineitem
    ),
    m AS (
        SELECT COUNT(*) * 1.0 AS n,
               {", ".join(f"CAST(SUM({a}) AS BIGINT) * 1.0 AS s_{a}" for a in CORR_COLS)},
               {", ".join(
                   f"CAST(SUM({a} * {b}) AS BIGINT) * 1.0 AS s_{a}_{b}"
                   for i, a in enumerate(CORR_COLS)
                   for b in CORR_COLS[i:]
               )}
        FROM g
    )
    {_corr_pairs_sql()}
    """,
    tags=("statistics", "correlation", "profile"),
)
def q_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix of the lineitem numeric
    columns (quantity, truncated dollars, discount%, tax%) from EXACT
    integer co-moments — one pass computes all sums and cross-products
    map-side, and only the final normalized ratios are floating point
    (rounded to 6). The feature-redundancy screen run before model
    training, engine-portable where built-in corr() conventions drift.

    Scale: a single map-combined aggregate carrying 4 sums + 10
    co-moments; the 6-row matrix assembles from the 1-row result. The
    100 TB plan is identical.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    g = li.select(
        F.floor(F.col("l_quantity") + 0.5).cast("long").alias("qty"),
        F.col("l_extendedprice").cast("long").alias("dollars"),  # Spark cast truncates
        F.floor(F.col("l_discount") * 100 + 0.5).cast("long").alias("disc_pct"),
        F.floor(F.col("l_tax") * 100 + 0.5).cast("long").alias("tax_pct"),
    )
    aggs = [F.count("*").cast("double").alias("n")]
    for a in CORR_COLS:
        aggs.append(F.sum(a).cast("double").alias(f"s_{a}"))
    for i, a in enumerate(CORR_COLS):
        for b in CORR_COLS[i:]:
            aggs.append(
                F.sum(F.col(a) * F.col(b)).cast("double").alias(f"s_{a}_{b}")
            )
    m = g.agg(*aggs).localCheckpoint(eager=False)
    parts = []
    for i, a in enumerate(CORR_COLS):
        for b in CORR_COLS[i + 1:]:
            r = (
                F.col("n") * F.col(f"s_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
            ) / (
                F.sqrt(
                    F.col("n") * F.col(f"s_{a}_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
                )
                * F.sqrt(
                    F.col("n") * F.col(f"s_{b}_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
                )
            )
            parts.append(
                m.select(
                    F.lit(a).alias("var_a"),
                    F.lit(b).alias("var_b"),
                    F.round(r, 6).alias("pearson_r"),
                )
            )
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out


# --- Chi-square contingency test ---------------------------------------------


@query(
    "q_chi_square_contingency",
    oracle="""
    WITH o AS (
        SELECT l_returnflag AS rf, l_linestatus AS ls, COUNT(*) AS obs
        FROM lineitem GROUP BY 1, 2
    ),
    mr AS (SELECT rf, CAST(SUM(obs) AS BIGINT) AS row_tot FROM o GROUP BY rf),
    mc AS (SELECT ls, CAST(SUM(obs) AS BIGINT) AS col_tot FROM o GROUP BY ls),
    t AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM o),
    cells AS (
        SELECT o.rf, o.ls, o.obs,
               mr.row_tot * mc.col_tot * 1.0 / t.n AS expected
        FROM o JOIN mr ON o.rf = mr.rf JOIN mc ON o.ls = mc.ls, t
    )
    SELECT (SELECT CAST(COUNT(DISTINCT rf) AS BIGINT) FROM o) AS n_rows_dim,
           (SELECT CAST(COUNT(DISTINCT ls) AS BIGINT) FROM o) AS n_cols_dim,
           (SELECT n FROM t) AS n_total,
           ROUND(SUM((obs - expected) * (obs - expected) / expected), 6)
               AS chi_square
    FROM cells
    """,
    tags=("statistics", "chi-square", "contingency"),
)
def q_chi_square_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between return flag and line
    status — the categorical-association screen beside the numeric
    correlation matrix. Observed counts and marginals are exact
    integers; expected counts and the statistic are identical double
    expressions rounded to 6.

    Scale: one contingency aggregate (bounded by category-domain cross
    product, not row count) plus broadcast marginals.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    o = (
        li.groupBy(F.col("l_returnflag").alias("rf"), F.col("l_linestatus").alias("ls"))
        .agg(F.count("*").alias("obs"))
        .localCheckpoint(eager=False)
    )
    mr = o.groupBy("rf").agg(F.sum("obs").alias("row_tot"))
    mc = o.groupBy("ls").agg(F.sum("obs").alias("col_tot"))
    t = o.agg(
        F.sum("obs").alias("n"),
        F.countDistinct("rf").alias("n_rows_dim"),
        F.countDistinct("ls").alias("n_cols_dim"),
    )
    cells = (
        o.join(F.broadcast(mr), "rf")
        .join(F.broadcast(mc), "ls")
        .crossJoin(F.broadcast(t))
        .withColumn(
            "expected", F.col("row_tot") * F.col("col_tot") * 1.0 / F.col("n")
        )
    )
    return cells.groupBy("n_rows_dim", "n_cols_dim", F.col("n").alias("n_total")).agg(
        F.round(
            F.sum(
                (F.col("obs") - F.col("expected"))
                * (F.col("obs") - F.col("expected"))
                / F.col("expected")
            ),
            6,
        ).alias("chi_square")
    ).select("n_rows_dim", "n_cols_dim", "n_total", "chi_square")


# --- A/B sample-size (power analysis) ----------------------------------------


@query(
    "q_sample_size_power",
    # Two-proportion power analysis at alpha=0.05 (two-sided), power=0.8:
    # n per arm = (z_a * sqrt(2 p (1-p)) + z_b * sqrt(p1 q1 + p2 q2))^2
    # / delta^2, computed from the OBSERVED purchase-conversion baseline
    # and a +10% relative MDE. z constants are shared literals; the
    # formula is one identical double expression, ceil'd to integer n.
    oracle="""
    WITH base AS (
        SELECT CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                        THEN user_id END) AS BIGINT) AS conv,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
        FROM events
    ),
    p AS (
        SELECT conv, users,
               conv * 1.0 / users AS p1,
               LEAST(conv * 1.0 / users * 1.1, 0.999999) AS p2
        FROM base
    )
    SELECT conv AS baseline_converters, users AS baseline_users,
           ROUND(p1, 6) AS p1, ROUND(p2, 6) AS p2,
           CASE WHEN p1 = 0 THEN NULL ELSE CAST(CEIL(
               POW(1.959964 * SQRT(2 * ((p1 + p2) / 2) * (1 - (p1 + p2) / 2))
                   + 0.841621 * SQRT(p1 * (1 - p1) + p2 * (1 - p2)), 2)
               / POW(p2 - p1, 2)) AS BIGINT) END AS n_per_arm
    FROM p
    """,
    tags=("statistics", "power-analysis", "ab-test"),
)
def q_sample_size_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B sample-size calculator: users per arm needed to detect a +10%
    relative lift on the OBSERVED purchase-conversion baseline at
    alpha=0.05 (two-sided), power=0.80 — the planning step before
    q_ab_test_proportions reads the result out. The baseline comes from
    exact distinct-user counts; the closed-form n uses shared z
    literals and identical double arithmetic, ceil'd to an integer.

    Scale: two distinct-count aggregates; the formula runs on one row.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    base = e.agg(
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("conv"),
        F.countDistinct("user_id").alias("users"),
    )
    p1 = F.col("conv") * 1.0 / F.col("users")
    p2 = F.least(p1 * 1.1, F.lit(0.999999))
    pbar = (p1 + p2) / 2
    n = F.ceil(
        F.pow(
            F.lit(1.959964) * F.sqrt(2 * pbar * (1 - pbar))
            + F.lit(0.841621) * F.sqrt(p1 * (1 - p1) + p2 * (1 - p2)),
            2,
        )
        / F.pow(p2 - p1, 2)
    ).cast("long")
    return base.select(
        F.col("conv").alias("baseline_converters"),
        F.col("users").alias("baseline_users"),
        F.round(p1, 6).alias("p1"),
        F.round(p2, 6).alias("p2"),
        # a zero baseline has no detectable relative lift — NULL, not /0
        F.when(F.col("conv") == 0, F.lit(None).cast("long"))
        .otherwise(n)
        .alias("n_per_arm"),
    )


# --- Cliff's delta effect size -----------------------------------------------


@query(
    "q_cliffs_delta",
    # delta = P(X>Y) - P(X<Y) = (2*U_a - t_adj) ... computed directly
    # from the doubled rank-sum U (q_mann_whitney's integers):
    # 2*na*nb*delta = 2*(u2_a - na*nb) + (ties counted zero), all exact;
    # reported as a 10000x scaled integer div plus the magnitude label.
    oracle="""
    WITH v AS (
        SELECT event_type AS grp,
               CAST(FLOOR(LEAST(GREATEST((value) * 100.0 + 0.5, -1000000000000.0), 1000000000000.0)) AS BIGINT) AS cents
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    dv AS (
        SELECT cents, COUNT(*) AS t,
               CAST(SUM(CASE WHEN grp = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
                   AS ta
        FROM v GROUP BY cents
    ),
    rk AS (
        SELECT cents, t, ta,
               COALESCE(SUM(t) OVER (
                   ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cb
        FROM dv
    ),
    agg AS (
        SELECT CAST(SUM(ta * (2 * cb + t + 1)) AS BIGINT) AS r2a,
               CAST(SUM(ta) AS BIGINT) AS na,
               CAST(SUM(t - ta) AS BIGINT) AS nb
        FROM rk
    ),
    d AS (
        SELECT na, nb,
               -- 2*U_a = r2a - na*(na+1); delta = (2*U_a - na*nb)/(na*nb)
               (10000 * ((r2a - na * (na + 1)) - na * nb)) // (na * nb)
                   AS delta_x10000
        FROM agg
    )
    SELECT na, nb, delta_x10000,
           CASE WHEN ABS(delta_x10000) < 1470 THEN 'negligible'
                WHEN ABS(delta_x10000) < 3300 THEN 'small'
                WHEN ABS(delta_x10000) < 4740 THEN 'medium'
                ELSE 'large' END AS magnitude
    FROM d
    """,
    tags=("statistics", "effect-size", "nonparametric"),
)
def q_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta effect size between purchase and view values —
    the magnitude readout that belongs next to q_mann_whitney's
    significance: P(X>Y) - P(X<Y), derived exactly from the same
    doubled tie-rank integers (delta = (2U - n_a n_b)/(n_a n_b), ties
    contributing zero), reported as a 10000x scaled-integer with the
    standard negligible/small/medium/large bands (0.147/0.33/0.474).
    Significance without magnitude misleads at scale — a billion rows
    make trivial differences 'significant'; delta doesn't inflate.

    Scale: identical plan to q_mann_whitney — distinct-value collapse,
    one cumulative window over value cardinality, one fold.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    v = e.filter(F.col("event_type").isin("purchase", "view")).select(
        F.col("event_type").alias("grp"),
        sat_cents(F.col("value")).alias("cents"),
    )
    dv = v.groupBy("cents").agg(
        F.count("*").alias("t"),
        F.sum(F.when(F.col("grp") == "purchase", 1).otherwise(0)).alias("ta"),
    )
    wc = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    rk = dv.withColumn("cb", F.coalesce(F.sum("t").over(wc), F.lit(0)))
    agg = rk.agg(
        F.sum(F.col("ta") * (2 * F.col("cb") + F.col("t") + 1)).alias("r2a"),
        F.sum("ta").alias("na"),
        F.sum(F.col("t") - F.col("ta")).alias("nb"),
    )
    d = agg.select(
        "na",
        "nb",
        F.expr(
            "(10000 * ((r2a - na * (na + 1)) - na * nb)) div (na * nb)"
        ).alias("delta_x10000"),
    )
    return d.select(
        "na",
        "nb",
        "delta_x10000",
        F.when(F.abs("delta_x10000") < 1470, "negligible")
        .when(F.abs("delta_x10000") < 3300, "small")
        .when(F.abs("delta_x10000") < 4740, "medium")
        .otherwise("large")
        .alias("magnitude"),
    )


# --- One-way ANOVA -----------------------------------------------------------


@query(
    "q_anova_weekday",
    # Sums/squared-sums per weekday are exact BIGINTs (daily counts);
    # SSB/SSW assemble from them in identical double expressions,
    # rounded to 6 — the ANOVA F completing the test family (t, z,
    # chi-square, KS, Mann-Whitney).
    oracle="""
    WITH daily AS (
        SELECT DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
               COUNT(*) AS x
        FROM events GROUP BY 1
    ),
    g AS (
        SELECT d % 7 AS wd,
               COUNT(*) AS ng,
               CAST(SUM(x) AS BIGINT) AS sg,
               CAST(SUM(x * x) AS BIGINT) AS qg
        FROM daily GROUP BY 1
    ),
    t AS (
        SELECT CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(sg) AS BIGINT) AS s,
               CAST(SUM(qg) AS BIGINT) AS q, COUNT(*) AS k,
               SUM(sg * sg * 1.0 / ng) AS sum_sg2_over_ng
        FROM g
    )
    SELECT CAST(k AS BIGINT) AS k_groups,
           n AS n_days,
           ROUND(sum_sg2_over_ng - s * s * 1.0 / n, 4) AS ss_between,
           ROUND(q - sum_sg2_over_ng, 4) AS ss_within,
           ROUND(((sum_sg2_over_ng - s * s * 1.0 / n) / (k - 1))
                 / ((q - sum_sg2_over_ng) / (n - k)), 6) AS f_stat
    FROM t
    """,
    tags=("statistics", "anova", "seasonal"),
)
def q_anova_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of daily event volume across weekday groups — the
    'does day-of-week matter at all' gate before fitting the seasonal
    profile (q_seasonal_hour_profile / q_seasonal_decompose). Group
    sums and squared sums are exact integers; between/within sums of
    squares and the F statistic are identical double expressions over
    them, rounded (the q_moments idiom).

    Scale: one map-combined aggregate to the day grid, one 7-group
    fold — volume-independent.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit(EPOCH)).cast("long").alias("d")
    ).agg(F.count("*").alias("x"))
    g = daily.groupBy((F.col("d") % 7).alias("wd")).agg(
        F.count("*").alias("ng"),
        F.sum("x").alias("sg"),
        F.sum(F.col("x") * F.col("x")).alias("qg"),
    )
    t = g.agg(
        F.sum("ng").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("qg").alias("q"),
        F.count("*").alias("k"),
        F.sum(F.col("sg") * F.col("sg") * 1.0 / F.col("ng")).alias(
            "sum_sg2_over_ng"
        ),
    )
    ssb = F.col("sum_sg2_over_ng") - F.col("s") * F.col("s") * 1.0 / F.col("n")
    ssw = F.col("q") - F.col("sum_sg2_over_ng")
    return t.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("n").cast("long").alias("n_days"),
        F.round(ssb, 4).alias("ss_between"),
        F.round(ssw, 4).alias("ss_within"),
        F.round((ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 6).alias(
            "f_stat"
        ),
    )


# --- Pairwise Welch tests with Bonferroni correction -------------------------


@query(
    "q_pairwise_tests_bonferroni",
    # All 10 event-type pairs tested at once: Welch t from exact
    # integer moments; naive significance at |t| > 1.96 vs the
    # Bonferroni-corrected threshold 2.807 (alpha 0.05/10, two-sided
    # normal) — the family-wise correction that keeps a 10-test sweep
    # from manufacturing discoveries.
    oracle="""
    WITH m AS (
        SELECT event_type AS g, COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(LEAST(GREATEST((value) * 100.0 + 0.5, -1000000000000.0), 1000000000000.0)) AS BIGINT)) AS BIGINT) AS s,
               -- squares accumulate in HUGEINT: a saturated cent value is
               -- 1e12, its square 1e24 — past BIGINT (Spark mirrors with
               -- DECIMAL(38,0); both convert to identical doubles below)
               SUM(CAST(CAST(FLOOR(LEAST(GREATEST((value) * 100.0 + 0.5, -1000000000000.0), 1000000000000.0)) AS BIGINT) AS HUGEINT)
                   * CAST(FLOOR(LEAST(GREATEST((value) * 100.0 + 0.5, -1000000000000.0), 1000000000000.0)) AS BIGINT)) AS q
        FROM events GROUP BY 1
    ),
    pairs AS (
        SELECT a.g AS g1, b.g AS g2,
               a.n AS n1, a.s AS s1, a.q AS q1,
               b.n AS n2, b.s AS s2, b.q AS q2
        FROM m a JOIN m b ON a.g < b.g
    ),
    t AS (
        SELECT g1, g2,
               (s1 * 1.0 / n1 - s2 * 1.0 / n2)
               / SQRT(
                   ((q1 - s1 * (s1 * 1.0 / n1)) / (n1 - 1)) / n1
                   + ((q2 - s2 * (s2 * 1.0 / n2)) / (n2 - 1)) / n2
               ) AS tt
        FROM pairs
    )
    SELECT g1, g2, ROUND(tt, 6) AS t_stat,
           CASE WHEN ABS(tt) > 1.96 THEN 1 ELSE 0 END AS naive_significant,
           CASE WHEN ABS(tt) > 2.807 THEN 1 ELSE 0 END AS bonferroni_significant
    FROM t
    """,
    tags=("statistics", "multiple-testing", "bonferroni", "ab-test"),
)
def q_pairwise_tests_bonferroni(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs Welch t-tests over the five event types' value
    distributions with naive vs Bonferroni-corrected significance —
    the multiple-comparison discipline a metrics sweep needs: at 10
    simultaneous tests, |t| > 1.96 alone manufactures ~40% family-wise
    false-positive risk; the corrected threshold (alpha/10) controls
    it. Group moments are exact integers (the q_moments idiom); each t
    is one rounded double expression.

    Scale: one map-combined moment pass, then a 5x5 pair join on the
    5-row moment table — test count, not data volume, is the only
    growth axis.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    cents = sat_cents(F.col("value"))
    m = e.groupBy(F.col("event_type").alias("g")).agg(
        F.count("*").alias("n"),
        F.sum(cents).alias("s"),
        # squares in DECIMAL(38,0): saturated cents (±1e12) square to 1e24,
        # past BIGINT — the oracle mirrors with HUGEINT; both sides feed the
        # t-statistic through the same exact-integer → double conversion
        F.sum(cents.cast("decimal(38,0)") * cents).alias("q"),
    )
    a = m.select(
        F.col("g").alias("g1"), F.col("n").alias("n1"),
        F.col("s").alias("s1"), F.col("q").alias("q1"),
    )
    b = m.select(
        F.col("g").alias("g2"), F.col("n").alias("n2"),
        F.col("s").alias("s2"), F.col("q").alias("q2"),
    )
    pairs = a.join(b, F.col("g1") < F.col("g2"))
    mean1 = F.col("s1") * 1.0 / F.col("n1")
    mean2 = F.col("s2") * 1.0 / F.col("n2")
    # try_divide throughout the t-statistic: a singleton group (n=1) or
    # two constant groups (pooled se 0) must yield NULL like DuckDB's
    # double division, not an ANSI DIVIDE_BY_ZERO job kill
    var1 = F.try_divide(F.col("q1") - F.col("s1") * mean1, F.col("n1") - 1)
    var2 = F.try_divide(F.col("q2") - F.col("s2") * mean2, F.col("n2") - 1)
    tt = F.try_divide(
        mean1 - mean2, F.sqrt(var1 / F.col("n1") + var2 / F.col("n2"))
    )
    return pairs.select(
        "g1",
        "g2",
        F.round(tt, 6).alias("t_stat"),
        F.when(F.abs(tt) > 1.96, 1).otherwise(0).alias("naive_significant"),
        F.when(F.abs(tt) > 2.807, 1).otherwise(0).alias("bonferroni_significant"),
    )


# --- Hapax / vocabulary profile ----------------------------------------------


@query(
    "q_hapax_vocabulary",
    oracle="""
    WITH tok AS (
        SELECT lang, token, COUNT(*) AS c FROM (
            SELECT lang, UNNEST(STRING_SPLIT(text, ' ')) AS token
            FROM documents
        ) WHERE token <> '' GROUP BY lang, token
    )
    SELECT lang,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS dis_legomena,
           (10000 * CAST(COUNT(*) AS BIGINT)) // CAST(SUM(c) AS BIGINT)
               AS ttr_bp,
           (10000 * CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT))
               // COUNT(*) AS hapax_share_bp
    FROM tok GROUP BY lang
    """,
    tags=("text", "vocabulary", "hapax", "X4"),
)
def q_hapax_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary richness profile per language: type-token ratio,
    hapax and dis legomena counts and shares — the Good-Turing mass
    estimate's raw inputs and the standard lexical-diversity monitor
    (a collapsing hapax share flags templated/duplicated text before
    the dedup pass even runs). All-integer basis-point folds.

    Scale: one (lang, token)-keyed aggregate then a lang fold — the
    count-of-counts trick keeps everything vocabulary-sized.
    """
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    tok = (
        d.select("lang", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("lang", "token")
        .agg(F.count("*").alias("c"))
    )
    return tok.groupBy("lang").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("vocab"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("hapax"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("dis_legomena"),
        F.expr("(10000 * CAST(count(*) AS BIGINT)) div CAST(sum(c) AS BIGINT)").alias(
            "ttr_bp"
        ),
        F.expr(
            "(10000 * CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT))"
            " div count(*)"
        ).alias("hapax_share_bp"),
    )


# --- Heaps' law fit ----------------------------------------------------------


@query(
    "q_heaps_law_fit",
    # log-log OLS over the 20 per-source (tokens, vocab) points:
    # beta = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), K = exp((Sy - beta*Sx)/n)
    # — integer token/vocab counts into ln sums, rounded to 6.
    oracle="""
    WITH tok AS (
        SELECT source, token, COUNT(*) AS c FROM (
            SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS token
            FROM documents
        ) WHERE token <> '' GROUP BY source, token
    ),
    pts AS (
        SELECT source,
               LN(CAST(SUM(c) AS BIGINT)) AS lx,
               LN(CAST(COUNT(*) AS BIGINT)) AS ly
        FROM tok GROUP BY source
    ),
    fit AS (
        SELECT COUNT(*) AS n, SUM(lx) AS sx, SUM(ly) AS sy,
               SUM(lx * lx) AS sxx, SUM(lx * ly) AS sxy
        FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_sources,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS heaps_beta,
           ROUND(EXP((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n),
                 6) AS heaps_k
    FROM fit
    """,
    tags=("text", "heaps-law", "vocabulary", "statistics"),
)
def q_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps' law fit V = K * n^beta over the per-source (token count,
    vocabulary) points — the vocabulary-growth exponent that predicts
    how a tokenizer's OOV rate and the dedup index size scale with
    corpus growth (the lexical twin of q_text_zipf_fit's rank-frequency
    slope). Counts are exact; the log-log OLS is one rounded closed
    form.

    Scale: the same (source, token) aggregate as the hapax profile,
    then a 20-point regression — corpus volume only affects the first
    map-combined pass.
    """
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    tok = (
        d.select("source", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count("*").alias("c"))
    )
    pts = tok.groupBy("source").agg(
        F.log(F.sum("c").cast("double")).alias("lx"),
        F.log(F.count("*").cast("double")).alias("ly"),
    )
    fit = pts.agg(
        F.count("*").alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
    )
    beta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return fit.select(
        F.col("n").cast("long").alias("n_sources"),
        F.round(beta, 6).alias("heaps_beta"),
        F.round(F.exp((F.col("sy") - beta * F.col("sx")) / F.col("n")), 6).alias(
            "heaps_k"
        ),
    )
