"""ETL-pipeline-semantics queries — SURVEY.md §2.2 (P2-P8), §2.11 (Q5/Q6).

The reference's core job is parse -> validate -> clean/type -> filter ->
load-with-audit (dataflow_transform.py:163-214, airflow.py:104-122). These
queries replay those exact semantics over the shared fixture tables so the
oracle can check them value-by-value; the file-based pipeline (CSV in,
quarantine + audit out) lives in etl_pipeline_spark.pipelines and is
exercised by pytest with golden fixtures.

The events table stands in for the raw staging table: ``event_type`` plays
'entity', ``ts`` plays 'Day', ``value`` plays 'total_confirmed_deaths' —
stringified first, like a CSV would deliver them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_pipeline_spark.catalog import load_tables
from etl_pipeline_spark.functions.cleaning import (
    non_empty,
    parse_strict_date,
    truncating_int_cast,
)
from etl_pipeline_spark.queries.base import query


def _staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stringify events into the all-strings shape a CSV reader delivers
    (S2 schema-on-read analog)."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    return e.select(
        "event_id",
        F.col("event_type").cast("string").alias("entity"),
        F.date_format("ts", "yyyy-MM-dd").alias("day_raw"),
        F.col("value").cast("string").alias("deaths_raw"),
    )


_STAGED_SQL = """
        SELECT event_id,
               CAST(event_type AS VARCHAR)  AS entity,
               STRFTIME(ts, '%Y-%m-%d')     AS day_raw,
               CAST(value AS VARCHAR)       AS deaths_raw
        FROM events
"""


@query(
    "q_etl_clean_cast_filter",
    oracle=f"""
    WITH staged AS ({_STAGED_SQL}),
    typed AS (
        SELECT event_id,
               TRIM(entity)                                          AS entity,
               TRY_STRPTIME(day_raw, '%Y-%m-%d')::DATE               AS day,
               CAST(TRUNC(TRY_CAST(deaths_raw AS DOUBLE)) AS BIGINT) AS total_confirmed_deaths
        FROM staged
        WHERE entity IS NOT NULL AND TRIM(entity) <> ''
          AND day_raw IS NOT NULL AND TRIM(day_raw) <> ''
          AND deaths_raw IS NOT NULL AND TRIM(deaths_raw) <> ''
    )
    SELECT event_id, entity, day, total_confirmed_deaths
    FROM typed
    WHERE day IS NOT NULL
      AND total_confirmed_deaths IS NOT NULL
      AND total_confirmed_deaths > 0
    """,
    tags=("etl", "P2", "P4", "P7", "P8", "P5"),
)
def q_etl_clean_cast_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole transform chain (P2 map ->
    P4 required-fields -> P7 castability -> P8 date-validity -> P5
    SQL WHERE) as one declarative plan:
    dataflow_transform.py:32-73 + airflow.py:110-115.

    Scale: narrow ops only — no shuffle; every predicate is a Column
    expr eligible for pushdown/codegen. The reference ran this row-by-row
    in Python dicts.
    """
    staged = _staged(spark, sf_dir)
    typed = staged.filter(
        non_empty(F.col("entity")) & non_empty(F.col("day_raw")) & non_empty(F.col("deaths_raw"))
    ).select(
        "event_id",
        F.trim("entity").alias("entity"),
        parse_strict_date(F.col("day_raw")).alias("day"),
        truncating_int_cast(F.col("deaths_raw")).alias("total_confirmed_deaths"),
    )
    return typed.filter(
        F.col("day").isNotNull()
        & F.col("total_confirmed_deaths").isNotNull()
        & (F.col("total_confirmed_deaths") > 0)
    )


@query(
    "q_etl_quarantine_conservation",
    oracle=f"""
    WITH staged AS ({_STAGED_SQL}),
    flagged AS (
        SELECT CASE WHEN entity IS NOT NULL AND TRIM(entity) <> ''
                     AND day_raw IS NOT NULL AND TRY_STRPTIME(day_raw, '%Y-%m-%d') IS NOT NULL
                     AND TRY_CAST(deaths_raw AS DOUBLE) IS NOT NULL
                     AND CAST(TRUNC(TRY_CAST(deaths_raw AS DOUBLE)) AS BIGINT) > 0
               THEN 1 ELSE 0 END AS ok
        FROM staged
    )
    SELECT COUNT(*)                           AS input_rows,
           CAST(SUM(ok) AS BIGINT)            AS output_rows,
           CAST(COUNT(*) - SUM(ok) AS BIGINT) AS quarantined_rows
    FROM flagged
    """,
    tags=("etl", "Q6"),
)
def q_etl_quarantine_conservation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantine conservation law (Q6 <- dataflow_transform.py:40-61):
    every input row is either output or quarantined — input = output +
    quarantined. The reference silently drops invalid rows; the engine
    keeps both sides countable in one pass with conditional aggregation."""
    staged = _staged(spark, sf_dir)
    ok = (
        non_empty(F.col("entity"))
        & parse_strict_date(F.col("day_raw")).isNotNull()
        & F.col("deaths_raw").try_cast("double").isNotNull()
        & (truncating_int_cast(F.col("deaths_raw")) > 0)
    ).cast("long")
    return staged.agg(
        F.count("*").alias("input_rows"),
        F.sum(ok).alias("output_rows"),
        (F.count("*") - F.sum(ok)).alias("quarantined_rows"),
    )


@query(
    "q_etl_audit_row",
    oracle="""
    SELECT 'events.parquet' AS file_name,
           COUNT(*)         AS record_count,
           'completed'      AS pipeline_status
    FROM events
    """,
    tags=("etl", "Q5", "A1"),
)
def q_etl_audit_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit-record synthesis (Q5 <- dataflow_transform.py:91-106): one row
    of lineage metadata built from the global count (A1) + literals. The
    timestamp fields of the real audit row are non-deterministic and are
    covered by pytest, not the oracle."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    return e.agg(
        F.lit("events.parquet").alias("file_name"),
        F.count("*").alias("record_count"),
        F.lit("completed").alias("pipeline_status"),
    )


@query(
    "q_etl_dirty_input_quarantine",
    oracle="""
    WITH dirty AS (
        SELECT doc_id,
               CASE doc_id % 5
                 WHEN 0 THEN ''
                 WHEN 1 THEN 'not-a-number'
                 ELSE CAST(n_chars AS VARCHAR)
               END AS deaths_raw,
               CASE doc_id % 4
                 WHEN 0 THEN '2024/01/15'
                 WHEN 1 THEN '2024-1-15'
                 ELSE '2024-01-15'
               END AS day_raw
        FROM documents
    )
    SELECT COUNT(*) AS input_rows,
           COUNT(*) FILTER (
             WHERE TRIM(deaths_raw) <> ''
               AND TRY_CAST(deaths_raw AS DOUBLE) IS NOT NULL
               AND LENGTH(day_raw) = 10
               AND TRY_STRPTIME(day_raw, '%Y-%m-%d') IS NOT NULL
           ) AS valid_rows,
           COUNT(*) FILTER (WHERE TRIM(deaths_raw) = '') AS empty_field_rows,
           COUNT(*) FILTER (
             WHERE TRIM(deaths_raw) <> '' AND TRY_CAST(deaths_raw AS DOUBLE) IS NULL
           ) AS bad_number_rows,
           COUNT(*) FILTER (
             WHERE LENGTH(day_raw) <> 10 OR TRY_STRPTIME(day_raw, '%Y-%m-%d') IS NULL
           ) AS bad_date_rows
    FROM dirty
    """,
    tags=("etl", "Q6", "P7", "P8"),
)
def q_etl_dirty_input_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized dirty input (empty fields, non-numeric numbers,
    wrong-format dates incl. the '2024-1-15' short form the reference's
    len==10 pre-check rejects, dataflow_transform.py:53-58) with per-cause
    quarantine counts."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    dirty = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, "")
        .when(F.col("doc_id") % 5 == 1, "not-a-number")
        .otherwise(F.col("n_chars").cast("string"))
        .alias("deaths_raw"),
        F.when(F.col("doc_id") % 4 == 0, "2024/01/15")
        .when(F.col("doc_id") % 4 == 1, "2024-1-15")
        .otherwise("2024-01-15")
        .alias("day_raw"),
    )
    num_ok = F.col("deaths_raw").try_cast("double").isNotNull()
    not_blank = F.trim("deaths_raw") != ""
    date_ok = parse_strict_date(F.col("day_raw")).isNotNull()
    return dirty.agg(
        F.count("*").alias("input_rows"),
        F.count(F.when(not_blank & num_ok & date_ok, 1)).alias("valid_rows"),
        F.count(F.when(~not_blank, 1)).alias("empty_field_rows"),
        F.count(F.when(not_blank & ~num_ok, 1)).alias("bad_number_rows"),
        F.count(F.when(~date_ok, 1)).alias("bad_date_rows"),
    )


@query(
    "q_dq_outlier_zscore",
    oracle="""
    WITH stats AS (
        SELECT c_mktsegment,
               AVG(c_acctbal)          AS mu,
               STDDEV_SAMP(c_acctbal)  AS sigma
        FROM customer GROUP BY c_mktsegment
    )
    SELECT c.c_custkey, c.c_mktsegment,
           ROUND(c.c_acctbal, 2) AS acctbal,
           ROUND((c.c_acctbal - s.mu) / s.sigma, 4) AS zscore,
           ABS((c.c_acctbal - s.mu) / s.sigma) > 1.8 AS is_outlier
    FROM customer c JOIN stats s ON c.c_mktsegment = s.c_mktsegment
    WHERE ABS((c.c_acctbal - s.mu) / s.sigma) > 1.6
    """,
    tags=("etl", "dq", "anomaly"),
)
def q_dq_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributional data-quality check: per-segment z-scores flag
    anomalous balances (the statistical upgrade of the reference's
    static range checks, dataflow.py:317-321).

    Scale: group stats are a tiny broadcast; the scoring pass is narrow.
    """
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    stats = c.groupBy("c_mktsegment").agg(
        F.avg("c_acctbal").alias("mu"), F.stddev_samp("c_acctbal").alias("sigma")
    )
    z = (F.col("c_acctbal") - F.col("mu")) / F.col("sigma")
    return (
        c.join(F.broadcast(stats), "c_mktsegment")
        .filter(F.abs(z) > 1.6)
        .select(
            "c_custkey",
            "c_mktsegment",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.round(z, 4).alias("zscore"),
            (F.abs(z) > 1.8).alias("is_outlier"),
        )
    )


MAD_SCALE = 0.6745  # Phi^-1(0.75): makes MAD comparable to sigma for normal data
MAD_CUTOFF = 3.5  # Iglewicz-Hoaglin modified-z outlier threshold


@query(
    "q_dq_outlier_mad",
    oracle=f"""
    WITH med AS (
        SELECT event_type, MEDIAN(value) AS med
        FROM events GROUP BY event_type
    ),
    mad AS (
        SELECT e.event_type, MEDIAN(ABS(e.value - m.med)) AS mad
        FROM events e JOIN med m ON e.event_type = m.event_type
        GROUP BY e.event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n_events,
           ROUND(ANY_VALUE(m.med), 4) AS med,
           ROUND(ANY_VALUE(a.mad), 4) AS mad,
           CAST(SUM(CASE WHEN ABS({MAD_SCALE} * (e.value - m.med) / a.mad) > {MAD_CUTOFF}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           ROUND(SUM(CASE WHEN ABS({MAD_SCALE} * (e.value - m.med) / a.mad) > {MAD_CUTOFF}
                          THEN 1.0 ELSE 0.0 END) / COUNT(*), 4) AS outlier_share
    FROM events e
    JOIN med m ON e.event_type = m.event_type
    JOIN mad a ON e.event_type = a.event_type
    GROUP BY e.event_type
    """,
    tags=("etl", "dq", "anomaly", "robust"),
)
def q_dq_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by median absolute deviation: per
    event_type, the Iglewicz-Hoaglin modified z-score
    0.6745*(x - median)/MAD with the standard 3.5 cutoff — the DQ check
    that survives the heavy-tailed metrics where mean/stddev z-scores
    (q_dq_outlier_zscore) are dragged by the very outliers they hunt.
    Exact medians (both engines interpolate identically), not approximate.

    Scale: two grouped exact medians + one scoring pass, all keyed on the
    low-cardinality event_type; the med/mad tables broadcast. At extreme
    group sizes exact median becomes approx_percentile with a documented
    error budget, or the two-pass exact selection (count, then narrow
    range scan) — the report schema is unchanged.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    med = e.groupBy("event_type").agg(F.median("value").alias("med"))
    mad = (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"))
    )
    # try_divide: a singleton/constant group has MAD 0 — its modified
    # z-score is undefined (NULL, matching DuckDB's double division),
    # not an ANSI DIVIDE_BY_ZERO job kill (r8 adversarial find)
    rz = F.try_divide(F.lit(MAD_SCALE) * (F.col("value") - F.col("med")), F.col("mad"))
    is_out = F.abs(rz) > MAD_CUTOFF
    return (
        e.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.any_value("med"), 4).alias("med"),
            F.round(F.any_value("mad"), 4).alias("mad"),
            # when/otherwise, not a bare cast: an undefined z-score (MAD
            # 0 -> NULL rz) counts as NOT an outlier, matching the
            # oracle's CASE ... ELSE 0 — a bare cast propagates NULL
            # into the sums instead
            F.sum(F.when(is_out, 1).otherwise(0).cast("long")).alias("n_outliers"),
            F.round(
                F.sum(F.when(is_out, 1.0).otherwise(0.0)) / F.count("*"), 4
            ).alias("outlier_share"),
        )
    )


KS_CUTOFF = "2024-01-16 00:00:00"  # events fixture spans Jan 2024 at every SF
KS_CRIT = 1.36  # ~95% two-sample Kolmogorov-Smirnov critical coefficient


@query(
    "q_dq_ks_drift",
    oracle=f"""
    WITH sided AS (
        SELECT event_type, value,
               CASE WHEN ts < TIMESTAMP '{KS_CUTOFF}' THEN 1 ELSE 0 END AS in_a
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    grouped AS (
        SELECT event_type, value,
               SUM(in_a) AS a_cnt, SUM(1 - in_a) AS b_cnt
        FROM sided GROUP BY event_type, value
    ),
    cum AS (
        SELECT event_type, value,
               SUM(a_cnt) OVER (PARTITION BY event_type ORDER BY value) AS ca,
               SUM(b_cnt) OVER (PARTITION BY event_type ORDER BY value) AS cb,
               SUM(a_cnt) OVER (PARTITION BY event_type) AS na,
               SUM(b_cnt) OVER (PARTITION BY event_type) AS nb
        FROM grouped
    )
    SELECT event_type,
           CAST(ANY_VALUE(na) AS BIGINT) AS n_first_half,
           CAST(ANY_VALUE(nb) AS BIGINT) AS n_second_half,
           ROUND(MAX(ABS(CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)), 4) AS ks_stat,
           MAX(ABS(CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)) >
               {KS_CRIT} * SQRT(CAST(ANY_VALUE(na) + ANY_VALUE(nb) AS DOUBLE)
                                / (ANY_VALUE(na) * ANY_VALUE(nb))) AS drifted
    FROM cum
    GROUP BY event_type
    """,
    tags=("etl", "dq", "drift", "statistics"),
)
def q_dq_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test per event_type: the max
    ECDF gap between the month's first and second half of `value`, with
    the 95% critical-band verdict — the distribution-shift monitor a
    pipeline runs between ingestion windows before models retrain on the
    new slice. Exact ECDFs from integer cumulative counts (no sampling,
    no binning), so both engines agree to the last ulp before rounding.

    Scale: one grouped count keyed on (event_type, value) with map-side
    combine, then a cumulative window per event_type — the sort is
    per-type, bounded by distinct values, not events. For continuous
    high-cardinality values the binned/quantile-sketch KS variant caps
    the distinct count; the verdict column is unchanged.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    # exclude NULL ts (cannot be assigned a half: Spark's NULL predicate
    # would drop it from both counts while the oracle's CASE ELSE puts
    # it in the second half) and NULL value (unrankable in an ECDF;
    # engines disagree on NULL sort position) — r8 wave-2 find
    e = e.filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
    in_a = (F.col("ts") < F.lit(KS_CUTOFF).cast("timestamp")).cast("long")
    grouped = (
        e.select("event_type", "value", in_a.alias("in_a"))
        .groupBy("event_type", "value")
        .agg(F.sum("in_a").alias("a_cnt"), F.sum(1 - F.col("in_a")).alias("b_cnt"))
    )
    wcum = W.partitionBy("event_type").orderBy("value")
    wall = W.partitionBy("event_type")
    cum = grouped.select(
        "event_type",
        F.sum("a_cnt").over(wcum).alias("ca"),
        F.sum("b_cnt").over(wcum).alias("cb"),
        F.sum("a_cnt").over(wall).alias("na"),
        F.sum("b_cnt").over(wall).alias("nb"),
    )
    # try_divide: a type with all its rows in one half has an empty ECDF
    # on the other side — the KS statistic is undefined (NULL, matching
    # DuckDB), not an ANSI DIVIDE_BY_ZERO job kill (r8 adversarial find)
    d = F.abs(
        F.try_divide(F.col("ca").cast("double"), F.col("na"))
        - F.try_divide(F.col("cb").cast("double"), F.col("nb"))
    )
    crit = F.lit(KS_CRIT) * F.sqrt(
        F.try_divide(
            (F.any_value("na") + F.any_value("nb")).cast("double"),
            F.any_value("na") * F.any_value("nb"),
        )
    )
    return cum.groupBy("event_type").agg(
        F.any_value("na").alias("n_first_half"),
        F.any_value("nb").alias("n_second_half"),
        F.round(F.max(d), 4).alias("ks_stat"),
        (F.max(d) > crit).alias("drifted"),
    )


@query(
    "q_dq_benford_check",
    oracle="""
    WITH digits AS (
        SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR), 1, 1)
                    AS INT) AS d
        FROM orders WHERE o_totalprice > 0
    ),
    n AS (SELECT COUNT(*) AS n FROM digits)
    SELECT d.d AS digit,
           COUNT(*) AS n_obs,
           ROUND(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(n.n), 4) AS obs_freq,
           ROUND(LOG10(1.0 + 1.0 / d.d), 4) AS benford_freq,
           ROUND(POW(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(n.n) - LOG10(1.0 + 1.0 / d.d), 2)
                 / LOG10(1.0 + 1.0 / d.d) * ANY_VALUE(n.n), 4) AS chi2_term
    FROM digits d CROSS JOIN n
    GROUP BY d.d
    """,
    tags=("etl", "dq", "forensic", "benford"),
)
def q_dq_benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the forensic DQ
    check for fabricated or truncated monetary data: observed frequency of
    each leading significant digit vs log10(1+1/d), with per-digit
    chi-square contributions (synthetic uniform prices WILL flag — that is
    the point of running it on a fixture). The leading digit comes from
    the integer cents string, not floating log10, so there is no
    power-of-ten boundary ulp hazard between engines.

    Scale: a per-row map to a 9-value key and one tiny aggregate —
    map-side combine makes the shuffle 9 rows per task.
    """
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    digits = o.filter(F.col("o_totalprice") > 0).select(digit.alias("digit"))
    n = digits.agg(F.count("*").alias("n"))
    obs = F.col("n_obs").cast("double") / F.col("n")
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        digits.groupBy("digit")
        .agg(F.count("*").alias("n_obs"))
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            "n_obs",
            F.round(obs, 4).alias("obs_freq"),
            F.round(benford, 4).alias("benford_freq"),
            F.round(F.pow(obs - benford, F.lit(2)) / benford * F.col("n"), 4).alias("chi2_term"),
        )
    )


# --- Primary-key uniqueness audit --------------------------------------------

# Declared logical key per fixture table. Every deterministic tie-break
# in the registry (ORDER BY ..., <key>) and every keyed MERGE/dedup
# assumes these are unique — this audit is where that assumption is
# CHECKED instead of silently violated by a botched ingest (duplicate
# ids break cross-engine tie-break determinism unfixably, because no
# column distinguishes the copies).
PK_COLUMNS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("region", ("r_regionkey",)),
    ("nation", ("n_nationkey",)),
    ("customer", ("c_custkey",)),
    ("supplier", ("s_suppkey",)),
    ("part", ("p_partkey",)),
    ("orders", ("o_orderkey",)),
    # lineitem declares the TPC-H key; the SYNTHETIC fixture violates it
    # (line numbers are not unique per order) and the audit truthfully
    # reports that — the one fixture table no tie-break may lean on
    ("lineitem", ("l_orderkey", "l_linenumber")),
    ("events", ("event_id",)),
    ("documents", ("doc_id",)),
    ("embeddings", ("vec_id",)),
)


def _pk_oracle() -> str:
    parts = []
    for t, cols in PK_COLUMNS:
        key = ", ".join(cols)
        parts.append(f"""
    SELECT '{t}' AS table_name,
           CAST(SUM(c) AS BIGINT)                          AS n_rows,
           CAST(COUNT(*) AS BIGINT)                        AS n_keys,
           CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
           CAST(SUM(c) - COUNT(*) AS BIGINT)               AS n_extra_rows
    FROM (SELECT {key}, COUNT(*) AS c FROM {t} GROUP BY {key})""")
    return "\n    UNION ALL".join(parts)


@query(
    "q_dq_pk_uniqueness",
    oracle=_pk_oracle(),
    tags=("etl", "dq", "contract", "uniqueness"),
)
def q_dq_pk_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit over every fixture table: per table,
    row count, distinct declared-key count, number of duplicated keys,
    and the surplus rows those duplicates carry. The third ingest gate
    (with q_dq_embedding_contract and the staged-CSV quarantine):
    duplicate ids don't crash anything downstream, but they silently
    break keep-first dedup semantics and make ORDER BY tie-breaks
    nondeterministic across engines — catch them at the door.

    Scale: one grouped count per table keyed on its PK (map-combined;
    the duplicate summary aggregates the GROUPED table, never raw
    rows), 10 independent single-row results unioned — each table scan
    prunes to the key columns only.
    """
    tables = load_tables(spark, sf_dir, tuple(t for t, _ in PK_COLUMNS))
    out = None
    for t, cols in PK_COLUMNS:
        per_key = tables[t].groupBy(*[F.col(c) for c in cols]).agg(
            F.count("*").alias("c")
        )
        agg = per_key.agg(
            F.lit(t).alias("table_name"),
            F.sum("c").alias("n_rows"),
            F.count("*").alias("n_keys"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).cast("long").alias("n_dup_keys"),
            (F.sum("c") - F.count("*")).alias("n_extra_rows"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out
