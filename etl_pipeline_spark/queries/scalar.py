"""Scalar-function queries — SURVEY.md §2.8 (F1-F17), oracle-checked.

Each query exercises a family of scalar functions over the fixture tables
so the DuckDB oracle verifies value-level semantics (not just plumbing):
string cleaning, null-on-fail casts, truncating numeric casts, strict and
multi-format date/timestamp parsing, JSON extraction, regex, math, and
array functions. Everything is a built-in Column expression — zero Python
UDFs — so the whole layer stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_spark.catalog import load_tables
from etl_pipeline_spark.functions.cleaning import (
    clean_special_chars,
    multi_format_timestamp,
    non_empty,
    strip_trailing_colons,
    truncating_int_cast,
)
from etl_pipeline_spark.queries.base import query


@query(
    "q_scalar_string_cleaning",
    oracle="""
    SELECT doc_id,
           TRIM(text)                                            AS trimmed,
           UPPER(source)                                         AS source_uc,
           REGEXP_REPLACE(source, ':+$', '')                     AS no_trailing_colons,
           REGEXP_REPLACE(text, '[^0-9A-Za-z ,.-]', '', 'g')     AS cleaned,
           LENGTH(text)                                          AS text_len,
           SUBSTR(text, 1, 20)                                   AS prefix20,
           CONCAT(lang, '/', source)                             AS lang_source
    FROM documents
    WHERE doc_id < 50
    """,
    tags=("scalar", "F1", "F2", "F3"),
)
def q_scalar_string_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String cleaning family (F1 trim <- dataflow_transform.py:65,
    F3 trailing-colon/special-char strip <- README.md:34, plus
    length/substr/concat). DuckDB regexp_replace needs the 'g' flag to
    match Spark's replace-all semantics."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return d.filter(F.col("doc_id") < 50).select(
        "doc_id",
        F.trim("text").alias("trimmed"),
        F.upper("source").alias("source_uc"),
        strip_trailing_colons(F.col("source")).alias("no_trailing_colons"),
        clean_special_chars(F.col("text")).alias("cleaned"),
        F.length("text").alias("text_len"),
        F.substring("text", 1, 20).alias("prefix20"),
        F.concat_ws("/", "lang", "source").alias("lang_source"),
    )


@query(
    "q_scalar_casts",
    oracle="""
    SELECT event_id,
           CAST(TRUNC(value) AS BIGINT)                 AS value_int,
           TRY_CAST(CAST(value AS VARCHAR) AS DOUBLE)   AS value_roundtrip,
           TRY_CAST(event_type AS DOUBLE)               AS bad_parse,
           CAST(user_id AS VARCHAR)                     AS user_str
    FROM events
    WHERE event_id < 200
    """,
    tags=("scalar", "F4", "F5"),
)
def q_scalar_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast semantics: the reference's ``int(float(x))`` truncating cast
    (F4 <- dataflow_transform.py:45 — Spark double->long truncates toward
    zero; ANSI engines round, hence TRUNC in the oracle) and null-on-fail
    numeric parse (F5 <- dataflow.py:317-321: 'event_type' never parses,
    so ``bad_parse`` is all-NULL in both engines)."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    return e.filter(F.col("event_id") < 200).select(
        "event_id",
        truncating_int_cast(F.col("value")).alias("value_int"),
        F.col("value").cast("string").cast("double").alias("value_roundtrip"),
        F.col("event_type").try_cast("double").alias("bad_parse"),
        F.col("user_id").cast("string").alias("user_str"),
    )


@query(
    "q_scalar_dates",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(YEAR FROM o_orderdate)                       AS order_year,
           EXTRACT(MONTH FROM o_orderdate)                      AS order_month,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE)       AS month_start,
           STRFTIME(o_orderdate, '%Y-%m-%d')                    AS order_day_str,
           DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE)          AS due_date
    FROM orders
    WHERE o_orderkey < 500
    """,
    tags=("scalar", "F6", "F12"),
)
def q_scalar_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extraction, truncation, formatting (F6 <-
    dataflow_transform.py:55), day arithmetic (F12 <- dataflow.py:178-180)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day_str"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_y2k"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
    )


@query(
    "q_scalar_multiformat_ts",
    oracle="""
    WITH raw AS (
        SELECT event_id,
               CASE event_id % 6
                 WHEN 0 THEN STRFTIME(ts, '%Y-%m-%dT%H:%M:%S.%fZ')
                 WHEN 1 THEN STRFTIME(ts, '%Y-%m-%dT%H:%M:%S.%f')
                 WHEN 2 THEN STRFTIME(ts, '%Y-%m-%dT%H:%M:%SZ')
                 WHEN 3 THEN STRFTIME(ts, '%Y-%m-%dT%H:%M:%S')
                 WHEN 4 THEN STRFTIME(ts, '%Y-%m-%d %H:%M:%S')
                 ELSE STRFTIME(ts, '%Y-%m-%d')
               END AS ts_str
        FROM events WHERE event_id < 1000
    )
    SELECT event_id, ts_str,
           epoch_us(COALESCE(
             TRY_STRPTIME(ts_str, '%Y-%m-%dT%H:%M:%S.%fZ'),
             TRY_STRPTIME(ts_str, '%Y-%m-%dT%H:%M:%S.%f'),
             TRY_STRPTIME(ts_str, '%Y-%m-%dT%H:%M:%SZ'),
             TRY_STRPTIME(ts_str, '%Y-%m-%dT%H:%M:%S'),
             TRY_STRPTIME(ts_str, '%Y-%m-%d %H:%M:%S'),
             TRY_STRPTIME(ts_str, '%Y-%m-%d')
           )) AS parsed_us
    FROM raw
    """,
    tags=("scalar", "F7"),
)
def q_scalar_multiformat_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-format timestamp parse, first-match-wins (F7 <-
    dataflow.py:367-382): serialize each event's ts into one of the six
    accepted formats (the reference's five plus fraction+Z, see
    TIMESTAMP_FORMATS), then recover it with the coalesce-of-try-parses."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    raw = e.filter(F.col("event_id") < 1000).select(
        "event_id",
        F.when(F.col("event_id") % 6 == 0, F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"))
        .when(F.col("event_id") % 6 == 1, F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
        .when(F.col("event_id") % 6 == 2, F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"))
        .when(F.col("event_id") % 6 == 3, F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"))
        .when(F.col("event_id") % 6 == 4, F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd"))
        .alias("ts_str"),
    )
    return raw.select(
        "event_id",
        "ts_str",
        F.unix_micros(multi_format_timestamp(F.col("ts_str"))).alias("parsed_us"),
    )


@query(
    "q_scalar_json_props",
    # json_valid guard + TRY_CAST: DuckDB's json_extract_string THROWS
    # on malformed JSON and CAST('[]') throws on non-numeric extracts,
    # where Spark's get_json_object/try_cast quietly yield NULL — the
    # guarded form makes both engines agree that bad rows contribute
    # nothing (adversarial-fixture find, r8)
    oracle="""
    WITH ex AS (
        SELECT event_type,
               TRY_CAST(CASE WHEN json_valid(props)
                             THEN json_extract_string(props, '$.k') END
                        AS BIGINT) AS k
        FROM events
    )
    SELECT event_type,
           COUNT(*)               AS n_events,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           MIN(k)                 AS min_k,
           MAX(k)                 AS max_k
    FROM ex
    GROUP BY event_type
    """,
    tags=("scalar", "F14"),
)
def q_scalar_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (F14 <- dataflow.py:212
    ``json.loads``): ``get_json_object`` keeps the parse JVM-side.
    try_cast, not cast: a non-scalar '$.k' (e.g. ``{"k": []}``) must
    yield NULL, not an ANSI CAST_INVALID_INPUT job kill."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    k = F.get_json_object("props", "$.k").try_cast("long")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "q_scalar_regexp_extract",
    oracle="""
    SELECT source,
           TRY_CAST(REGEXP_EXTRACT(source, 'src([0-9]+)', 1) AS BIGINT) AS src_num,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY source
    """,
    tags=("scalar", "regex"),
)
def q_scalar_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex group extraction + cast (F10-style id-from-name parsing).
    try_cast: a non-matching source yields '' from regexp_extract, and
    casting that must give NULL, not an ANSI job kill."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs")
    ).select(
        "source",
        F.regexp_extract("source", r"src([0-9]+)", 1).try_cast("long").alias("src_num"),
        "n_docs",
    )


@query(
    "q_scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_extendedprice - l_quantity * 1000)         AS abs_gap,
           ROUND(SQRT(l_extendedprice), 4)                  AS sqrt_price,
           ROUND(LN(l_extendedprice + 1), 4)                AS ln_price,
           ROUND(POW(1 - l_discount, 2), 4)                 AS disc_sq,
           CAST(FLOOR(l_quantity / 10) AS BIGINT)           AS qty_decile,
           CAST(CEIL(l_tax * 100) AS BIGINT)                AS tax_pct_ceil,
           l_orderkey % 7                                   AS key_mod7
    FROM lineitem
    WHERE l_orderkey < 300
    """,
    tags=("scalar", "F17", "math"),
)
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family (F17): abs/sqrt/ln/pow/floor/ceil/mod.
    Transcendentals rounded to 4 decimals — libm implementations may
    differ in the last ulp across engines."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.filter(F.col("l_orderkey") < 300).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000).alias("abs_gap"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("sqrt_price"),
        F.round(F.log(F.col("l_extendedprice") + 1), 4).alias("ln_price"),
        F.round(F.pow(1 - F.col("l_discount"), 2), 4).alias("disc_sq"),
        F.floor(F.col("l_quantity") / 10).cast("long").alias("qty_decile"),
        F.ceil(F.col("l_tax") * 100).cast("long").alias("tax_pct_ceil"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
    )


@query(
    "q_scalar_arrays",
    oracle="""
    SELECT doc_id,
           LEN(STRING_SPLIT(text, ' '))                               AS n_tokens,
           ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT(text, ' '), 1, 3), ' ') AS first3,
           LIST_CONTAINS(STRING_SPLIT(text, ' '), 'spark')            AS has_spark,
           LEN(LIST_DISTINCT(STRING_SPLIT(text, ' ')))                AS n_distinct_tokens
    FROM documents
    WHERE doc_id < 100
    """,
    tags=("scalar", "F17", "array"),
)
def q_scalar_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family (F17): split/size/slice/contains/distinct.
    The JSON-array explode path (S4) is exercised in the source tests."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = F.split("text", " ")
    return d.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
    )


@query(
    "q_scalar_conditional_nonempty",
    oracle="""
    SELECT doc_id,
           (text IS NOT NULL AND TRIM(text) <> '')  AS text_present,
           CASE
             WHEN n_chars >= 300 THEN 'long'
             WHEN n_chars >= 100 THEN 'medium'
             ELSE 'short'
           END                                      AS size_class,
           COALESCE(NULLIF(TRIM(source), ''), 'unknown') AS source_clean
    FROM documents
    """,
    tags=("scalar", "P4", "case"),
)
def q_scalar_conditional_nonempty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: the required-field presence predicate (P4 <-
    dataflow_transform.py:39-41), CASE bucketing, NULLIF/COALESCE defaults."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return d.select(
        "doc_id",
        non_empty(F.col("text")).alias("text_present"),
        F.when(F.col("n_chars") >= 300, "long")
        .when(F.col("n_chars") >= 100, "medium")
        .otherwise("short")
        .alias("size_class"),
        F.coalesce(F.nullif(F.trim("source"), F.lit("")), F.lit("unknown")).alias(
            "source_clean"
        ),
    )


@query(
    "q_scalar_file_lineage",
    oracle="""
    SELECT doc_id,
           'documents.parquet' AS source_file,
           TRUE                AS has_lineage
    FROM documents
    WHERE doc_id < 30
    """,
    tags=("scalar", "F9", "F10", "lineage"),
)
def q_scalar_file_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit/lineage columns (F9/F10 <- dataflow_transform.py:64-69,93):
    source file basename from input_file_name() — checked end-to-end
    because the oracle pins the expected basename."""
    from etl_pipeline_spark.catalog import load_tables
    from etl_pipeline_spark.functions.cleaning import basename

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return d.filter(F.col("doc_id") < 30).select(
        "doc_id",
        basename(F.input_file_name()).alias("source_file"),
        F.input_file_name().isNotNull().alias("has_lineage"),
    )


@query(
    "q_scalar_string_extras",
    oracle="""
    SELECT doc_id,
           TRANSLATE(source, 'src', 'SRC')     AS translated,
           LPAD(CAST(doc_id AS VARCHAR), 6, '0') AS padded_id,
           REVERSE(lang)                       AS lang_rev,
           REPEAT(lang, 2)                     AS lang_x2,
           LEFT(text, 10)                      AS head10,
           RIGHT(text, 10)                     AS tail10,
           SPLIT_PART(source, 'c', 2)          AS after_c,
           LEVENSHTEIN(lang, 'en')             AS dist_to_en,
           STARTS_WITH(text, 'the')            AS starts_the,
           CONTAINS(text, 'spark')             AS has_spark,
           ASCII(lang)                         AS first_cp
    FROM documents
    WHERE doc_id < 100
    """,
    tags=("scalar", "F17", "string"),
)
def q_scalar_string_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string family (F17): translate, padding, reverse, repeat,
    left/right, split_part, Levenshtein edit distance, prefix/containment
    predicates, codepoints — all cross-engine built-ins."""
    from etl_pipeline_spark.catalog import load_tables

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return d.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.translate("source", "src", "SRC").alias("translated"),
        F.lpad(F.col("doc_id").cast("string"), 6, "0").alias("padded_id"),
        F.reverse("lang").alias("lang_rev"),
        F.repeat("lang", 2).alias("lang_x2"),
        F.substring("text", 1, 10).alias("head10"),
        F.expr("right(text, 10)").alias("tail10"),
        F.split_part("source", F.lit("c"), F.lit(2)).alias("after_c"),
        F.levenshtein("lang", F.lit("en")).cast("long").alias("dist_to_en"),
        F.startswith("text", F.lit("the")).alias("starts_the"),
        F.contains("text", F.lit("spark")).alias("has_spark"),
        F.ascii("lang").cast("long").alias("first_cp"),
    )


@query(
    "q_hof_array_pipeline",
    oracle="""
    SELECT vec_id,
           LEN(list_filter(embedding, x -> x > 0))                    AS n_pos,
           ROUND(list_sum(list_transform(embedding,
                 x -> ABS(CAST(x AS DOUBLE)))), 4)                    AS l1_norm,
           ROUND(list_max(list_transform(embedding,
                 x -> ABS(CAST(x AS DOUBLE)))), 4)                    AS max_abs,
           ROUND(list_sum(list_transform(
                 list_zip(embedding, list_reverse(embedding)),
                 s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE))), 4) AS self_rev_dot,
           LEN(list_filter(embedding, x -> ABS(x) > 2)) > 0           AS any_big,
           LEN(list_filter(embedding, x -> NOT ABS(x) < 10)) = 0      AS all_small
    FROM embeddings
    """,
    tags=("scalar", "F17", "higher-order", "arrays"),
)
def q_hof_array_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as a vector-math pipeline — the F17
    lambda family (filter / transform / aggregate / zip_with / exists /
    forall) applied to the embedding column without ever exploding it:
    positive-component count, L1 norm, max magnitude, dot product with
    the reversed self (zip_with), and magnitude predicates.

    Scale: all lambdas run inside codegen per row — no explode, no
    shuffle, no UDF; this is the idiomatic Spark form for elementwise
    vector work and the reason the engine's similarity ops stay JVM-side.
    Both engines fold the array left-to-right (float->double per element),
    so 4-decimal rounding is exact-stable.
    """
    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    emb = F.col("embedding")
    dbl = lambda c: c.cast("double")  # noqa: E731
    abs_arr = F.transform(emb, lambda x: F.abs(dbl(x)))
    return e.select(
        "vec_id",
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        F.round(F.aggregate(abs_arr, F.lit(0.0), lambda a, x: a + x), 4).alias("l1_norm"),
        F.round(F.array_max(abs_arr), 4).alias("max_abs"),
        F.round(
            F.aggregate(
                F.zip_with(emb, F.reverse(emb), lambda a, b: dbl(a) * dbl(b)),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            4,
        ).alias("self_rev_dot"),
        F.exists(emb, lambda x: F.abs(x) > 2).alias("any_big"),
        F.forall(emb, lambda x: F.abs(x) < 10).alias("all_small"),
    )


# --- VARIANT semi-structured path --------------------------------------------


@query(
    "q_variant_json_stats",
    oracle="""
    SELECT event_type,
           COUNT(k) AS n_with_k,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(MAX(k) AS BIGINT) AS max_k,
           CAST(SUM(k) AS BIGINT) AS sum_k
    FROM (
        SELECT event_type,
               TRY_CAST(CASE WHEN json_valid(props)
                             THEN json_extract_string(props, '$.k') END
                        AS BIGINT) AS k
        FROM events
    )
    GROUP BY event_type
    """,
    tags=("scalar", "json", "variant", "semi-structured"),
)
def q_variant_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation through the VARIANT type (Spark 4):
    ``parse_json`` ingests the props payload ONCE into the binary
    variant encoding, and ``try_variant_get`` path-extracts with a
    target type — the open-schema path that replaces per-access string
    re-parsing (compare q_scalar_json_props' get_json_object, which
    re-parses the JSON text on every extraction).

    Scale: variant parse + path access are JVM intrinsics over a binary
    encoding; shredding the parse to a columnar variant once and
    extracting many paths is the 100 TB semi-structured pattern. The
    aggregate itself is a bounded (event_type) grid.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    # try_parse_json: malformed props must ingest as NULL variant, not
    # throw — parse_json on one bad payload kills the job (r8 find);
    # try_variant_get then propagates NULL for missing/mistyped paths
    v = F.try_parse_json("props")
    k = F.try_variant_get(v, "$.k", "long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
    )


# --- Null semantics ----------------------------------------------------------


@query(
    "q_null_semantics",
    # Deterministic nulls are synthesized (orderkey % 7 -> status NULL,
    # % 5 -> price NULL) so every null-handling rule is exercised on
    # identical data: COUNT(*) vs COUNT(col), DISTINCT's null-exclusion,
    # null-skipping SUM, null-SAFE equality (IS NOT DISTINCT FROM /
    # eqNullSafe), and NULLS FIRST window ordering.
    oracle="""
    WITH t AS (
        SELECT o_orderpriority,
               o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END AS status_n,
               CASE WHEN o_orderkey % 5 = 0 THEN NULL
                    ELSE CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) END AS cents_n
        FROM orders
    ),
    firsts AS (
        SELECT o_orderpriority, o_orderkey AS first_nulls_first_key
        FROM (
            SELECT o_orderpriority, o_orderkey,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY status_n ASC NULLS FIRST, o_orderkey ASC
                   ) AS rn
            FROM t
        ) WHERE rn = 1
    )
    SELECT t.o_orderpriority,
           COUNT(*) AS n_rows,
           COUNT(t.status_n) AS n_status_nonnull,
           COUNT(*) - COUNT(t.status_n) AS n_status_null,
           COUNT(DISTINCT t.status_n) AS n_distinct_status,
           CAST(SUM(t.cents_n) AS BIGINT) AS sum_cents_nullskip,
           CAST(SUM(CASE WHEN t.status_n IS NOT DISTINCT FROM 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_nullsafe_eq_f,
           CAST(SUM(CASE WHEN t.status_n IS DISTINCT FROM 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_nullsafe_neq_f,
           ANY_VALUE(f.first_nulls_first_key) AS first_nulls_first_key
    FROM t JOIN firsts f ON t.o_orderpriority = f.o_orderpriority
    GROUP BY t.o_orderpriority
    """,
    tags=("scalar", "null-semantics", "sql-surface"),
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL null-semantics conformance on one table: COUNT(*) vs
    COUNT(col), DISTINCT excluding nulls, null-skipping SUM, null-SAFE
    (three-valued-logic-free) equality and inequality, and NULLS FIRST
    window ordering — the rules every migrated query silently depends
    on, pinned as one cross-engine-checked report per order priority.

    Scale: one aggregate on the priority grid plus one per-priority
    window; the null synthesis is a narrow expression.
    """
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    t = o.select(
        "o_orderpriority",
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_orderstatus"))
        .alias("status_n"),
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
        .alias("cents_n"),
    )
    from pyspark.sql import Window as W

    wf = W.partitionBy("o_orderpriority").orderBy(
        F.col("status_n").asc_nulls_first(), F.col("o_orderkey").asc()
    )
    firsts = (
        t.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") == 1)
        .select("o_orderpriority", F.col("o_orderkey").alias("first_nulls_first_key"))
    )
    agg = t.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_rows"),
        F.count("status_n").alias("n_status_nonnull"),
        (F.count("*") - F.count("status_n")).alias("n_status_null"),
        F.countDistinct("status_n").alias("n_distinct_status"),
        F.sum("cents_n").alias("sum_cents_nullskip"),
        F.sum(
            F.when(F.col("status_n").eqNullSafe(F.lit("F")), 1).otherwise(0)
        ).alias("n_nullsafe_eq_f"),
        F.sum(
            F.when(~F.col("status_n").eqNullSafe(F.lit("F")), 1).otherwise(0)
        ).alias("n_nullsafe_neq_f"),
    )
    return agg.join(F.broadcast(firsts), "o_orderpriority")


# --- Map-typed column surface -------------------------------------------------

MAP_BIG_CUTOFF = 100  # statuses with at least this many orders are "big"


@query(
    "q_scalar_maps",
    # The Spark side genuinely runs the MAP column surface
    # (map_from_entries -> map_filter -> transform_values -> map_entries);
    # the oracle states the equivalent result relationally (grouped
    # counts + ordered STRING_AGG) — maps render as deterministic sorted
    # "k=v" strings and shares as integer basis points, so no map-order
    # or double-formatting hazard crosses engines.
    oracle=f"""
    WITH counts AS (
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
        FROM orders GROUP BY 1, 2
    ),
    totals AS (
        SELECT o_orderpriority, SUM(cnt) AS total FROM counts GROUP BY 1
    ),
    enriched AS (
        SELECT c.o_orderpriority, c.o_orderstatus, c.cnt,
               CAST(FLOOR(c.cnt * 10000.0 / t.total + 0.5) AS BIGINT) AS bps
        FROM counts c JOIN totals t ON c.o_orderpriority = t.o_orderpriority
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_statuses,
           STRING_AGG(o_orderstatus || '=' || cnt, ',' ORDER BY o_orderstatus)
               AS status_counts,
           COALESCE(STRING_AGG(
               CASE WHEN cnt >= {MAP_BIG_CUTOFF} THEN o_orderstatus || '=' || cnt END,
               ',' ORDER BY o_orderstatus), '') AS big_statuses,
           STRING_AGG(o_orderstatus || '=' || CAST(bps AS VARCHAR),
                      ',' ORDER BY o_orderstatus) AS share_bps
    FROM enriched
    GROUP BY o_orderpriority
    """,
    tags=("scalar", "map", "sql-surface"),
)
def q_scalar_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed column operations end to end: per order priority the
    status->count map is BUILT (map_from_entries over a sorted entry
    array), FILTERED (map_filter keeps the big statuses), and
    TRANSFORMED (transform_values to basis-point shares), then rendered
    through map_entries as deterministic sorted k=v strings — the
    semi-structured aggregation surface (feature maps, tag bags,
    per-key metrics) exercised as maps rather than exploded rows.

    Scale: one bounded (priority, status) aggregate; maps live per-row
    with at most |status| entries. Map columns at 100 TB behave like
    structs-of-bounded-width, not like exploded rows — that is the
    point of keeping them maps.
    """
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    counts = o.groupBy("o_orderpriority", "o_orderstatus").agg(F.count("*").alias("cnt"))
    per_prio = counts.groupBy("o_orderpriority").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("o_orderstatus", "cnt")))
        ).alias("m"),
        F.sum("cnt").alias("total"),
    )
    big = F.map_filter(F.col("m"), lambda k, v: v >= MAP_BIG_CUTOFF)
    bps = F.transform_values(
        F.col("m"),
        lambda k, v: F.floor(v * 10000.0 / F.col("total") + 0.5).cast("long"),
    )
    render = lambda m: F.array_join(  # noqa: E731
        F.transform(
            F.map_entries(m),
            lambda e: F.concat(e["key"], F.lit("="), e["value"].cast("string")),
        ),
        ",",
    )
    return per_prio.select(
        "o_orderpriority",
        F.size("m").cast("long").alias("n_statuses"),
        render(F.col("m")).alias("status_counts"),
        render(big).alias("big_statuses"),
        render(bps).alias("share_bps"),
    )
