"""Warehouse SQL surfaces beyond the core registry: gaps-and-islands,
equi-depth histogram, weighted median, bag-semantics set operations,
ANSI try-arithmetic, nested JSON assembly, collation-aware grouping,
CDC snapshot diff, and the Python UDTF surface.

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

from etl_pipeline_spark.catalog import load_tables, scan_parallel
from etl_pipeline_spark.queries.base import EPOCH, query


# --- Gaps and islands --------------------------------------------------------


@query(
    "q_gaps_islands",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id,
               DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d
        FROM events
    ),
    isl AS (
        SELECT user_id, d,
               d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
        FROM days
    ),
    islands AS (
        SELECT user_id, MIN(d) AS start_d, COUNT(*) AS len
        FROM isl GROUP BY user_id, grp
    ),
    marked AS (
        SELECT *, MAX(len) OVER (PARTITION BY user_id) AS mx FROM islands
    )
    SELECT user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(MIN(CASE WHEN len = mx THEN start_d END) AS BIGINT)
               AS longest_start_day
    FROM marked GROUP BY user_id
    """,
    tags=("window", "gaps-islands", "behavioral"),
)
def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user runs of consecutive active days (the
    classic streak/retention shape — login streaks, uninterrupted SLA
    windows, sensor uptime). The island key is the textbook
    ``day - row_number()`` trick: constant within a consecutive run,
    strictly increasing across gaps. Output is the per-user streak
    profile with the longest streak's start day (min-start tie-break).

    Scale: one shuffle on user_id for the row_number, then island and
    user aggregations reuse the same partitioning — Catalyst collapses
    them into the window stage's exchange. No global sort, no UDFs.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    days = (
        e.select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit(EPOCH)).cast("long").alias("d"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn("grp", F.col("d") - F.row_number().over(w))
    islands = isl.groupBy("user_id", "grp").agg(
        F.min("d").alias("start_d"), F.count("*").alias("len")
    )
    marked = islands.withColumn(
        "mx", F.max("len").over(Window.partitionBy("user_id"))
    )
    return marked.groupBy("user_id").agg(
        F.sum("len").alias("n_active_days"),
        F.count("*").alias("n_islands"),
        F.max("len").alias("longest_streak"),
        F.min(F.when(F.col("len") == F.col("mx"), F.col("start_d"))).alias(
            "longest_start_day"
        ),
    )


# --- Equi-depth histogram ----------------------------------------------------

ED_BINS = 8


@query(
    "q_equidepth_histogram",
    oracle=f"""
    WITH c AS (
        SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
               o_orderkey
        FROM orders
    ),
    b AS (
        SELECT cents, NTILE({ED_BINS}) OVER (ORDER BY cents, o_orderkey) AS bin
        FROM c
    )
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(MIN(cents) / 100.0, 2) AS lo,
           ROUND(MAX(cents) / 100.0, 2) AS hi,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM b GROUP BY bin
    """,
    tags=("histogram", "ntile", "profile"),
)
def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-frequency) histogram of order value — the
    complement of q_histogram_values' equi-width bins and the shape
    optimizers and drift monitors prefer for skewed money columns.
    NTILE over the total order (cents, orderkey) makes bin assignment
    deterministic and engine-portable.

    Scale: the exact NTILE needs a global sort — this query is the
    small-N conformance baseline. At 100 TB the same report comes from
    the mergeable KLL sketch (q_kll_quantile_merge) whose bin edges
    approximate these exactly-computed ones.
    """
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    c = o.select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        "o_orderkey",
    )
    b = c.withColumn("bin", F.ntile(ED_BINS).over(Window.orderBy("cents", "o_orderkey")))
    return b.groupBy("bin").agg(
        F.count("*").alias("n_orders"),
        F.round(F.min("cents") / 100.0, 2).alias("lo"),
        F.round(F.max("cents") / 100.0, 2).alias("hi"),
        F.sum("cents").alias("sum_cents"),
    )


# --- Python UDTF surface -----------------------------------------------------


@query(
    "q_udtf_span_days",
    oracle="""
    WITH u AS (
        SELECT user_id,
               MIN(DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE))) AS fd,
               MAX(DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE))) AS ld
        FROM events WHERE ts IS NOT NULL GROUP BY user_id
    ),
    expanded AS (
        SELECT user_id, UNNEST(GENERATE_SERIES(fd, ld)) AS day
        FROM u
    )
    SELECT CAST(day AS BIGINT) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_users_in_span
    FROM expanded GROUP BY day
    """,
    tags=("udtf", "S4", "python-udtf", "behavioral"),
)
def q_udtf_span_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (Spark 4 ``@udtf``): a table function expands
    each user's [first_day, last_day] activity span into one row per
    covered day (the lifetime-coverage expansion behind concurrency and
    tenure reports), then a day-keyed aggregate counts users in span.
    The UDTF runs via the LATERAL-join path; the oracle is the
    GENERATE_SERIES equivalent, so the table function's emitted rows are
    value-hash-verified.

    Scale: the UDTF input is the per-user span table (one row per user,
    post-aggregation), never the raw event stream; the expansion factor
    is bounded by the observation horizon. Pure-SQL twins exist
    (F.sequence + explode, q_rolling_active_users) — this query pins the
    Python UDTF API itself so custom generators that DON'T have a
    Column-expression form are covered.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id long, day long", useArrow=True)
    class SpanDays:
        def eval(self, user_id: int, fd: int, ld: int):
            # a user with no timestamped events has no span; a None
            # bound must not crash the UDTF worker (r8 wave-2 find)
            if fd is None or ld is None:
                return
            for day in range(fd, ld + 1):
                yield user_id, day

    e = load_tables(spark, sf_dir, ("events",))["events"]
    day = F.datediff(F.to_date("ts"), F.lit(EPOCH)).cast("long")
    # NULL ts rows excluded on both sides (oracle: WHERE ts IS NOT NULL)
    u = (
        e.filter(F.col("ts").isNotNull())
        .groupBy("user_id")
        .agg(F.min(day).alias("fd"), F.max(day).alias("ld"))
    )
    # UDTF lateral application: register + SQL form keeps the plan explicit
    spark.udtf.register("span_days", SpanDays)
    u.createOrReplaceTempView("user_spans")
    out = spark.sql(
        """
        SELECT t.day, COUNT(*) AS n_users_in_span
        FROM user_spans u, LATERAL span_days(u.user_id, u.fd, u.ld) t
        GROUP BY t.day
        """
    )
    return out.select(F.col("day").cast("long"), F.col("n_users_in_span").cast("long"))


# --- Weighted median ---------------------------------------------------------


@query(
    "q_weighted_median",
    oracle="""
    WITH g AS (
        SELECT l_returnflag,
               CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
               CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS w
        FROM lineitem
    ),
    v AS (
        SELECT l_returnflag, cents, CAST(SUM(w) AS BIGINT) AS w
        FROM g GROUP BY 1, 2
    ),
    c AS (
        SELECT l_returnflag, cents, w,
               CAST(SUM(w) OVER (
                   PARTITION BY l_returnflag ORDER BY cents) AS BIGINT) AS cum,
               CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
        FROM v
    )
    SELECT l_returnflag,
           CAST(MIN(CASE WHEN 2 * cum >= tot THEN cents END) AS BIGINT)
               AS median_cents,
           CAST(MIN(tot) AS BIGINT) AS total_weight
    FROM c GROUP BY l_returnflag
    """,
    tags=("agg", "weighted-median", "statistics"),
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median price per return flag — the lower
    weighted median (smallest value whose cumulative weight reaches half
    the total), all-integer so both engines agree bit-for-bit. The
    unweighted percentile surface is q_agg_percentiles; weighting is
    what price/volume analytics actually need.

    Scale: collapse to distinct values first (value-keyed aggregate),
    then one partitioned cumulative window over the collapsed table —
    the window input is bounded by value cardinality, not row count.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    g = li.select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("cents"),
        F.floor(F.col("l_quantity") + 0.5).cast("long").alias("w"),
    )
    v = g.groupBy("l_returnflag", "cents").agg(F.sum("w").alias("w"))
    wcum = Window.partitionBy("l_returnflag").orderBy("cents")
    wall = Window.partitionBy("l_returnflag")
    c = v.select(
        "l_returnflag",
        "cents",
        F.sum("w").over(wcum).alias("cum"),
        F.sum("w").over(wall).alias("tot"),
    )
    return c.groupBy("l_returnflag").agg(
        F.min(F.when(2 * F.col("cum") >= F.col("tot"), F.col("cents"))).alias(
            "median_cents"
        ),
        F.min("tot").alias("total_weight"),
    )


# --- Snapshot diff (CDC) -----------------------------------------------------


@query(
    "q_snapshot_diff",
    # Snapshot B is derived deterministically from A (orders): keys
    # %13 deleted, %7 repriced +$1.00, %11 cloned as inserts at key
    # +10^9 — so every change class exists and the diff totals are
    # analytically known.
    oracle="""
    WITH a AS (
        SELECT o_orderkey AS k,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    ),
    b AS (
        SELECT k,
               CASE WHEN k % 7 = 0 THEN cents + 100 ELSE cents END AS cents
        FROM a WHERE k % 13 <> 0
        UNION ALL
        SELECT k + 1000000000 AS k, cents FROM a WHERE k % 11 = 0
    ),
    d AS (
        SELECT COALESCE(a.k, b.k) AS k, a.cents AS ac, b.cents AS bc,
               CASE WHEN a.k IS NULL THEN 'inserted'
                    WHEN b.k IS NULL THEN 'deleted'
                    WHEN a.cents <> b.cents THEN 'updated'
                    ELSE 'unchanged' END AS change_type
        FROM a FULL OUTER JOIN b ON a.k = b.k
    )
    SELECT change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(COALESCE(bc, 0) - COALESCE(ac, 0)) AS BIGINT)
               AS cents_delta
    FROM d GROUP BY change_type
    """,
    tags=("etl", "cdc", "diff", "join"),
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot differencing (CDC): classify every key across two table
    versions as inserted / deleted / updated / unchanged with the net
    value delta — the change-feed a warehouse emits when upstream
    can't. Snapshot B derives deterministically from A so all four
    classes exist and the totals are analytically known.

    Scale: one full-outer hash join on the key plus a narrow compare —
    the standard diff plan. At 100 TB, bucket both snapshots on the key
    (sources/sinks.py write_bucketed) and the join is exchange-free;
    compare column hashes instead of full rows for wide tables.
    """
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    a = o.select(
        F.col("o_orderkey").alias("k"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    ).localCheckpoint(eager=False)
    b = (
        a.filter(F.col("k") % 13 != 0)
        .select(
            "k",
            F.when(F.col("k") % 7 == 0, F.col("cents") + 100)
            .otherwise(F.col("cents"))
            .alias("cents"),
        )
        .unionAll(
            a.filter(F.col("k") % 11 == 0).select(
                (F.col("k") + 1000000000).alias("k"), "cents"
            )
        )
    )
    aa = a.select(F.col("k").alias("ak"), F.col("cents").alias("ac"))
    bb = b.select(F.col("k").alias("bk"), F.col("cents").alias("bc"))
    d = aa.join(bb, aa["ak"] == bb["bk"], "full_outer").select(
        F.when(F.col("ak").isNull(), "inserted")
        .when(F.col("bk").isNull(), "deleted")
        .when(F.col("ac") != F.col("bc"), "updated")
        .otherwise("unchanged")
        .alias("change_type"),
        F.col("ac"),
        F.col("bc"),
    )
    return d.groupBy("change_type").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.coalesce("bc", F.lit(0)) - F.coalesce("ac", F.lit(0))).alias(
            "cents_delta"
        ),
    )


# --- Bag-semantics set operations --------------------------------------------


@query(
    "q_setop_bag_semantics",
    # INTERSECT ALL / EXCEPT ALL on the (priority, status) multiset of
    # two order-date halves: bag semantics keep per-value multiplicity
    # min(a,b) / max(a-b,0) where the DISTINCT variants collapse to 0/1
    # (those are covered by q_setop_intersect/except_nations).
    oracle="""
    WITH a AS (
        SELECT o_orderpriority AS pri, o_orderstatus AS st FROM orders
        WHERE o_orderdate < TIMESTAMP '1998-01-01'
    ),
    b AS (
        SELECT o_orderpriority AS pri, o_orderstatus AS st FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    ),
    i AS (SELECT pri, st FROM a INTERSECT ALL SELECT pri, st FROM b),
    x AS (SELECT pri, st FROM a EXCEPT ALL SELECT pri, st FROM b)
    SELECT pri, st,
           CAST(SUM(CASE WHEN src = 'i' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_intersect_all,
           CAST(SUM(CASE WHEN src = 'x' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_except_all
    FROM (
        SELECT pri, st, 'i' AS src FROM i
        UNION ALL
        SELECT pri, st, 'x' AS src FROM x
    ) GROUP BY pri, st
    """,
    tags=("setop", "bag-semantics", "conformance"),
)
def q_setop_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL —
    ``intersectAll``/``exceptAll``): per-value multiplicities of the
    (priority, status) multiset across two order-date halves. The ALL
    variants preserve duplicate counts (min / truncated difference)
    where the DISTINCT forms collapse them — the semantics data-recon
    jobs actually need when comparing row feeds.

    Scale: both operators plan as a single hash aggregate computing
    per-value counts on each side — one shuffle each, no joins of raw
    rows.
    """
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    cutoff = "1998-01-01"
    a = o.filter(F.col("o_orderdate") < cutoff).select(
        F.col("o_orderpriority").alias("pri"), F.col("o_orderstatus").alias("st")
    )
    b = o.filter(F.col("o_orderdate") >= cutoff).select(
        F.col("o_orderpriority").alias("pri"), F.col("o_orderstatus").alias("st")
    )
    i = a.intersectAll(b).withColumn("src", F.lit("i"))
    x = a.exceptAll(b).withColumn("src", F.lit("x"))
    return (
        i.unionByName(x)
        .groupBy("pri", "st")
        .agg(
            F.sum(F.when(F.col("src") == "i", 1).otherwise(0)).alias(
                "n_intersect_all"
            ),
            F.sum(F.when(F.col("src") == "x", 1).otherwise(0)).alias(
                "n_except_all"
            ),
        )
    )


# --- ANSI-safe arithmetic (try_* surface) ------------------------------------


@query(
    "q_try_arithmetic_safe",
    # Spark 4 runs ANSI mode: bare x/0 throws. try_divide returns NULL —
    # the oracle models that NULL explicitly (DuckDB integer division by
    # zero also errors, so the CASE guard is the shared semantics).
    oracle="""
    WITH g AS (
        SELECT o_orderkey,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
               CASE WHEN o_orderkey % 17 = 0 THEN 0
                    ELSE CAST(o_orderkey % 7 + 1 AS BIGINT) END AS parts
        FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN parts = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_splits,
           CAST(SUM(CASE WHEN parts = 0 THEN NULL ELSE cents // parts END)
               AS BIGINT) AS sum_split_cents
    FROM g
    """,
    tags=("scalar", "ansi", "try-arithmetic", "conformance"),
)
def q_try_arithmetic_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic surface: under Spark 4's ANSI mode a bare
    x/0 THROWS mid-job; ``try_divide`` degrades to NULL instead — here
    splitting order value across a part count that is deterministically
    zero for every 17th key. The report counts the null results and
    folds the rest, proving the fallible path stays declarative (no
    pre-filter pass needed).

    Scale: narrow per-row expressions plus one map-combined fold — the
    point is semantics (job survives bad denominators at any volume),
    not plan shape.
    """
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    g = o.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        F.when(F.col("o_orderkey") % 17 == 0, 0)
        .otherwise((F.col("o_orderkey") % 7 + 1).cast("long"))
        .alias("parts"),
    )
    split = F.expr("try_divide(cents, parts)")  # NULL on /0 under ANSI
    return g.agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(F.col("parts") == 0, 1).otherwise(0)).alias("n_null_splits"),
        F.sum(F.floor(split)).cast("long").alias("sum_split_cents"),
    )


# --- Nested JSON document assembly -------------------------------------------


@query(
    "q_nested_json_assembly",
    # Integer fields only inside the JSON (cents, not doubles), so the
    # rendered text is byte-identical across engines; line order pinned
    # by linenumber in both aggregates.
    oracle="""
    WITH li AS (
        SELECT l_orderkey, l_linenumber,
               CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qty,
               CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        FROM lineitem
    )
    SELECT l_orderkey,
           '[' || STRING_AGG(
               '{"ln":' || l_linenumber || ',"qty":' || qty
               || ',"cents":' || cents || '}',
               ',' ORDER BY l_linenumber, qty, cents) || ']' AS lines_json,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM li GROUP BY l_orderkey
    """,
    tags=("json", "nested", "S17", "export"),
)
def q_nested_json_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-document assembly: each order's line items rendered as an
    ordered JSON array of objects — the denormalized export shape API
    backends and training-data writers need (S17's dict->JSON surface,
    one level deeper). Line order is pinned by (linenumber, qty, cents) — linenumber alone is NOT unique in the fixture — and every
    field is an integer, so the JSON text is byte-identical across
    engines; a Spark-side ``from_json`` round-trip re-derives the line
    count from the rendered text, proving losslessness inside the same
    plan.

    Scale: one order-keyed aggregate; the JSON render is a narrow
    per-group expression. Bucket by order key to make the groupBy
    exchange-free on a 100 TB fact table.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    # r15 optimization round (the r14 edge-build rule applied): the
    # per-order collect_list is an OBJECT aggregate whose map-side
    # partial otherwise builds the whole 150k-order hash map inside the
    # single serial scan task of a one-row-group fixture. Routing the
    # raw rows through scan_parallel's layout-adaptive hash repartition
    # on the GROUPING key moves both aggregate phases past the exchange
    # — the exchange the repartition adds IS the exchange the groupBy
    # needed, so the exchange count is unchanged, and at production
    # scale (many-split scans) scan_parallel is a pass-through and the
    # map-side partial stays where it pays.
    rows = scan_parallel(li, spark, key="l_orderkey").select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_quantity") + 0.5).cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    assembled = rows.groupBy("l_orderkey").agg(
        F.to_json(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("l_linenumber", "qty", "cents"))
                ),
                lambda s: F.struct(
                    s["l_linenumber"].alias("ln"),
                    s["qty"].alias("qty"),
                    s["cents"].alias("cents"),
                ),
            )
        ).alias("lines_json"),
        F.sum("cents").alias("total_cents"),
    )
    reparsed = F.size(
        F.from_json(
            F.col("lines_json"), "array<struct<ln:int,qty:bigint,cents:bigint>>"
        )
    ).cast("long")
    return assembled.select(
        "l_orderkey",
        "lines_json",
        reparsed.alias("n_lines"),
        "total_cents",
    )


# --- Collation-aware grouping (Spark 4 collations) ---------------------------


@query(
    "q_collation_groupby",
    # Mixed-case variants are synthesized deterministically; Spark
    # groups on a UTF8_LCASE-collated key (the Spark 4 collation
    # surface), the oracle on LOWER() — equivalent for this data. The
    # emitted group key is MIN(raw) under binary collation, so the
    # output never depends on which variant the engine picked as the
    # group representative.
    oracle="""
    WITH v AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN UPPER(source)
                    WHEN doc_id % 3 = 1
                        THEN UPPER(SUBSTR(source, 1, 1)) || SUBSTR(source, 2, 100)
                    ELSE source END AS src_mixed
        FROM documents
    )
    SELECT MIN(src_mixed) AS canonical_variant,
           LOWER(MIN(src_mixed)) AS key_lower,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT src_mixed) AS BIGINT) AS n_case_variants
    FROM v GROUP BY LOWER(src_mixed)
    """,
    tags=("scalar", "collation", "spark4", "conformance"),
)
def q_collation_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 collations): mixed-case source
    labels grouped under the UTF8_LCASE collation — the declarative
    alternative to sprinkling LOWER() through every predicate, and the
    surface migrations from collation-aware warehouses expect. The
    group key in the output is the binary-collation MIN of the raw
    variants (engine-stable), plus the variant count per group.

    Scale: collation participates in hashing, so the groupBy stays one
    ordinary shuffle; no expression wrapping means scan-level column
    stats survive for the optimizer.
    """
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    v = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.upper("source"))
        .when(F.col("doc_id") % 3 == 1, F.initcap("source"))
        .otherwise(F.col("source"))
        .alias("src_mixed"),
    )
    return (
        v.groupBy(F.collate("src_mixed", "UTF8_LCASE").alias("k"))
        .agg(
            F.min(F.collate("src_mixed", "UTF8_BINARY")).alias("canonical_variant"),
            F.count("*").alias("n_docs"),
            F.countDistinct(F.collate("src_mixed", "UTF8_BINARY")).alias(
                "n_case_variants"
            ),
        )
        .select(
            "canonical_variant",
            F.lower("canonical_variant").alias("key_lower"),
            "n_docs",
            "n_case_variants",
        )
    )


