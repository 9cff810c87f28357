"""Session-6 analytics operators — the warehouse-migration and
training-data surfaces beyond the core registry, grouped roughly as:

- SQL surfaces: gaps-and-islands, equi-depth histogram, weighted
  median, bag-semantics set ops, ANSI try-arithmetic, nested JSON
  assembly, collations, CDC snapshot diff, Python UDTF;
- statistics: moments/skew/kurtosis, Poisson bootstrap CI,
  Mann-Whitney + Cliff's delta, chi-square, correlation matrix, ANOVA,
  Kaplan-Meier, Theil-Sen, A/B power analysis;
- time series: ACF, seasonal decomposition + anomaly days, SAX,
  linear-interpolation gap fill, interval merge;
- graph/ML: PageRank, k-means Lloyd, DBSCAN classification, MMR
  re-rank, item-item CF, degree power-law, BOM explosion, RAKE,
  WordPiece tokenization + fertility, target/WOE encodings, PSI,
  rare-category bucketing, Lindley clamped balance;
- ops/DQ: shuffle-key skew report, join-cardinality audit, URL
  canonicalization dedup, dataset card, spatial radius join,
  Fellegi-Sunter entity resolution, price/volume decomposition,
  FIFO allocation, Shapley attribution.

Cross-engine determinism follows the house rules (queries/base.py):
money and counts fold as integers, rational scores are scaled-integer
``div`` folds (both engines truncate toward zero on positive operands),
and the only floating-point steps are final single divisions rounded to a
fixed number of decimals.

Reference parity: the reference delegates all transformation beyond
ingest to warehouse SQL, and the only SQL its DAG submits is a single
filtered INSERT (``WHERE total_confirmed_deaths > 0``, reference
airflow.py:104-122) — it has no analytics surface of its own. This
module is therefore strictly beyond-reference: the analytics a user of
that warehouse would run downstream, expressed Spark-first with a DuckDB
oracle per query.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_spark.catalog import load_tables
from etl_pipeline_spark.queries.base import query

EPOCH = datetime.date(2024, 1, 1)  # fixture event horizon starts here

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


# --- Leave-one-out target encoding ------------------------------------------

TE_SMOOTH = 10  # pseudo-observations of the global prior


@query(
    "q_target_encoding",
    oracle=f"""
    WITH t AS (
        SELECT o.o_orderkey, c.c_nationkey,
               CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    g AS (
        SELECT CAST(SUM(cents) AS BIGINT) // COUNT(*) AS prior_cents FROM t
    ),
    w AS (
        SELECT o_orderkey, c_nationkey, cents,
               CAST(SUM(cents) OVER (PARTITION BY c_nationkey) AS BIGINT) AS s,
               COUNT(*) OVER (PARTITION BY c_nationkey) AS n
        FROM t
    )
    SELECT o_orderkey, c_nationkey,
           CAST((s - cents + {TE_SMOOTH} * prior_cents)
                // (n - 1 + {TE_SMOOTH}) AS BIGINT) AS enc_cents
    FROM w, g
    """,
    tags=("feature-prep", "target-encoding", "window"),
)
def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out smoothed target encoding of customer nation against
    order value — the standard categorical-feature encoder for training
    tables. Each order's encoding is the nation's mean target EXCLUDING
    the row itself (no target leakage), shrunk toward the global prior
    with {M} pseudo-observations. All arithmetic is integer cents with
    ``div`` folds, so both engines produce bit-identical encodings.

    Scale: one shuffle on the category key for the window sums, one
    broadcast of the 1-row global prior. The encoding of a 100 TB fact
    table is the same two-pass plan; high-cardinality categories don't
    skew because the window carries only two running integers.
    """
    t_ = load_tables(spark, sf_dir, ("orders", "customer"))
    t = (
        t_["orders"]
        .join(t_["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "o_orderkey",
            "c_nationkey",
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        )
    )
    g = t.agg(
        F.expr("CAST(sum(cents) AS BIGINT) div count(*)").alias("prior_cents")
    )
    wn = Window.partitionBy("c_nationkey")
    w = t.select(
        "o_orderkey",
        "c_nationkey",
        "cents",
        F.sum("cents").over(wn).alias("s"),
        F.count("*").over(wn).alias("n"),
    )
    return w.crossJoin(F.broadcast(g)).select(
        "o_orderkey",
        "c_nationkey",
        F.expr(
            f"CAST((s - cents + {TE_SMOOTH} * prior_cents)"
            f" div (n - 1 + {TE_SMOOTH}) AS BIGINT)"
        ).alias("enc_cents"),
    )


q_target_encoding.__doc__ = q_target_encoding.__doc__.format(M=TE_SMOOTH)


# --- Autocorrelation of the daily event series -------------------------------

ACF_MAX_LAG = 7


@query(
    "q_autocorr_daily",
    oracle=f"""
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
        e.groupBy(
            F.datediff(F.to_date("ts"), F.lit(EPOCH)).cast("long").alias("d")
        ).agg(F.count("*").alias("x"))
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


# --- PageRank over the part co-purchase graph --------------------------------

PR_SUPPORT = 2  # co-order support threshold for an edge (q_triangle_count's)
PR_SCALE = 10**12  # rank mass carried as integer units of 1e-12
PR_ITERS = 3
PR_TOPK = 20


def _pr_oracle() -> str:
    """Unrolled {PR_ITERS}-iteration integer PageRank in DuckDB SQL."""
    lines = [
        f"""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    und AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {PR_SUPPORT}
    ),
    edges AS (SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und),
    outdeg AS (SELECT u, COUNT(*) AS od FROM edges GROUP BY u),
    nn AS (SELECT COUNT(*) AS n FROM outdeg),
    r0 AS (
        SELECT u AS node, CAST({PR_SCALE} AS BIGINT) // n AS r
        FROM outdeg, nn
    )"""
    ]
    for i in range(1, PR_ITERS + 1):
        lines.append(
            f""",
    c{i} AS (
        SELECT e.v AS node, CAST(SUM(r{i - 1}.r // d.od) AS BIGINT) AS sc
        FROM edges e
        JOIN r{i - 1} ON r{i - 1}.node = e.u
        JOIN outdeg d ON d.u = e.u
        GROUP BY e.v
    ),
    r{i} AS (
        SELECT o.u AS node,
               CAST((15 * (CAST({PR_SCALE} AS BIGINT) // n)) // 100
                    + (85 * COALESCE(c{i}.sc, 0)) // 100 AS BIGINT) AS r
        FROM outdeg o CROSS JOIN nn LEFT JOIN c{i} ON c{i}.node = o.u
    )"""
        )
    lines.append(
        f"""
    SELECT CAST(rr.node AS BIGINT) AS node,
           CAST(d.od AS BIGINT) AS degree,
           rr.r AS rank_scaled
    FROM r{PR_ITERS} rr JOIN outdeg d ON d.u = rr.node
    ORDER BY rr.r DESC, rr.node
    LIMIT {PR_TOPK}
    """
    )
    return "".join(lines)


@query(
    "q_pagerank",
    oracle=_pr_oracle(),
    tags=("graph", "pagerank", "iterative", "custom-op"),
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph (q_triangle_count's
    edges, both directions): {I} power iterations with damping 0.85,
    returning the top-{K} parts by rank. Rank mass is carried as
    integer units of 1e-12 and every step is an integer ``div`` fold,
    so iterates are bit-identical across engines and partitionings —
    the oracle unrolls the identical recurrence as chained CTEs.

    Scale: the per-iteration plan is the canonical distributed PageRank
    — join ranks to edges on the source key, aggregate contributions on
    the destination key. Edges are localCheckpointed once (reused by
    every iteration without recomputing the co-purchase self-join) and
    each iterate truncates lineage so the DAG stays constant-depth. At
    100 TB: pre-partition edges and ranks on the node key so the join
    reuses one exchange, and handle hubs with the hybrid hot/cold
    broadcast join (operators/skew.py).
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        pagerank_ranks(li)
        .orderBy(F.desc("rank_scaled"), "node")
        .limit(PR_TOPK)
    )


def pagerank_ranks(li: DataFrame) -> DataFrame:
    """Full (un-limited) rank table behind q_pagerank: every node with
    its degree and final integer rank. Exposed separately so invariants
    over the WHOLE vector — e.g. the truncation-loss mass-conservation
    envelope tests/test_session6_operators.py asserts — can be checked
    without the top-k cut."""
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("u"))
    b = items.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("v"))
    und = (
        a.join(b, "o")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= PR_SUPPORT)
        .select("u", "v")
    )
    edges = (
        und.unionAll(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .localCheckpoint(eager=False)
    )
    outdeg = edges.groupBy("u").agg(F.count("*").alias("od"))
    nn = outdeg.agg(F.count("*").alias("n"))
    r = (
        outdeg.select(F.col("u").alias("node"))
        .crossJoin(F.broadcast(nn))
        .select("node", F.expr(f"CAST({PR_SCALE} AS BIGINT) div n").alias("r"))
    )
    for _ in range(PR_ITERS):
        contrib = (
            r.join(outdeg, r["node"] == outdeg["u"])
            .select(F.col("node"), F.expr("r div od").alias("c"))
        )
        inc = (
            edges.join(contrib, edges["u"] == contrib["node"])
            .groupBy(edges["v"])
            .agg(F.sum("c").alias("sc"))
        )
        r = (
            outdeg.select(F.col("u").alias("node"))
            .join(inc, F.col("node") == inc["v"], "left")
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                F.expr(
                    f"CAST((15 * (CAST({PR_SCALE} AS BIGINT) div n)) div 100"
                    " + (85 * COALESCE(sc, 0)) div 100 AS BIGINT)"
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    return r.join(outdeg, r["node"] == outdeg["u"]).select(
        "node", F.col("od").cast("long").alias("degree"), F.col("r").alias("rank_scaled")
    )


q_pagerank.__doc__ = q_pagerank.__doc__.format(I=PR_ITERS, K=PR_TOPK)


# --- RAKE keyword extraction -------------------------------------------------

RAKE_STOPWORDS = ("the", "a")
RAKE_MAX_PHRASE = 4
RAKE_TOPK = 20
RAKE_WSCALE = 1_000_000


@query(
    "q_rake_keywords",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, i - 1 AS pos, STRING_SPLIT(text, ' ')[i] AS token
        FROM documents,
             UNNEST(GENERATE_SERIES(1, LEN(STRING_SPLIT(text, ' ')))) AS t(i)
    ),
    nonstop AS (
        SELECT doc_id, pos, token,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM toks
        WHERE token <> '' AND token NOT IN {RAKE_STOPWORDS!r}
    ),
    phrases AS (
        SELECT doc_id, grp,
               COUNT(*) AS plen,
               STRING_AGG(token, ' ' ORDER BY pos) AS phrase
        FROM nonstop GROUP BY doc_id, grp
        HAVING COUNT(*) <= {RAKE_MAX_PHRASE}
    ),
    members AS (
        SELECT n.doc_id, n.grp, n.token, p.plen, p.phrase
        FROM nonstop n JOIN phrases p
          ON n.doc_id = p.doc_id AND n.grp = p.grp
    ),
    wordstats AS (
        SELECT token,
               CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(plen) AS BIGINT) AS deg
        FROM members GROUP BY token
    ),
    wscore AS (
        SELECT token, ({RAKE_WSCALE} * deg) // freq AS ws FROM wordstats
    ),
    inst AS (
        SELECT m.doc_id, m.grp, m.phrase,
               CAST(SUM(w.ws) AS BIGINT) AS iscore
        FROM members m JOIN wscore w ON m.token = w.token
        GROUP BY m.doc_id, m.grp, m.phrase
    )
    SELECT phrase,
           CAST(LEN(STRING_SPLIT(phrase, ' ')) AS BIGINT) AS n_words,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           MAX(iscore) AS score_scaled
    FROM inst GROUP BY phrase
    ORDER BY score_scaled DESC, phrase
    LIMIT {RAKE_TOPK}
    """,
    tags=("text", "keywords", "rake", "X4"),
)
def q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction over the corpus: candidate phrases are
    maximal stopword-free token runs (capped at {P} words), scored by
    the sum of member word scores degree/frequency — degree counts
    phrase co-membership, so words that appear inside longer phrases
    outrank isolated frequent words. Word scores are scaled-integer
    ``div`` folds ({S}x), making the whole ranking engine-exact; top-{K}
    phrases with (score, phrase) tie-break.

    Scale: phrase segmentation is the gaps-islands window keyed by
    doc_id (one shuffle, partition-local); word stats and phrase scores
    are token-keyed aggregations. Nothing is quadratic — the corpus
    streams through 3 shuffles (doc window, word agg, phrase agg).
    """
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )
    nonstop = (
        toks.filter((F.col("token") != "") & ~F.col("token").isin(*RAKE_STOPWORDS))
        .withColumn(
            "grp",
            F.col("pos")
            - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
        )
        .localCheckpoint(eager=False)
    )
    phrases = (
        nonstop.groupBy("doc_id", "grp")
        .agg(
            F.count("*").alias("plen"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "token"))),
                    lambda s: s["token"],
                ),
                " ",
            ).alias("phrase"),
        )
        .filter(F.col("plen") <= RAKE_MAX_PHRASE)
    )
    members = nonstop.join(phrases, ["doc_id", "grp"]).select(
        "doc_id", "grp", "token", "plen", "phrase"
    ).localCheckpoint(eager=False)
    wscore = (
        members.groupBy("token")
        .agg(F.count("*").alias("freq"), F.sum("plen").alias("deg"))
        .select("token", F.expr(f"({RAKE_WSCALE} * deg) div freq").alias("ws"))
    )
    inst = (
        members.join(wscore, "token")
        .groupBy("doc_id", "grp", "phrase")
        .agg(F.sum("ws").alias("iscore"))
    )
    return (
        inst.groupBy("phrase")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.max("iscore").alias("score_scaled"),
        )
        .select(
            "phrase",
            F.size(F.split("phrase", " ")).cast("long").alias("n_words"),
            "n_occurrences",
            "score_scaled",
        )
        .orderBy(F.desc("score_scaled"), "phrase")
        .limit(RAKE_TOPK)
    )


q_rake_keywords.__doc__ = q_rake_keywords.__doc__.format(
    P=RAKE_MAX_PHRASE, S=RAKE_WSCALE, K=RAKE_TOPK
)


# --- k-means (Lloyd) on the integer embedding grid ---------------------------

KM_K = 8
KM_QUANT = 1000  # embedding quantization grid (the PCA idiom)
KM_ITERS = 2


def _km_oracle() -> str:
    """Unrolled 2-iteration integer Lloyd in DuckDB SQL: quantize,
    seed centroids from id % k, assign by exact integer squared
    distance (cluster-id tie-break), recompute integer centroids."""
    base = f"""
    WITH q AS (
        SELECT vec_id, g - 1 AS pos,
               CAST(FLOOR(embedding[g]::DOUBLE * {KM_QUANT} + 0.5) AS BIGINT) AS qd
        FROM embeddings, UNNEST(GENERATE_SERIES(1, LEN(embedding))) t(g)
    ),
    c0 AS (
        SELECT vec_id % {KM_K} AS cluster, pos,
               CAST(SUM(qd) AS BIGINT) // COUNT(*) AS cd
        FROM q GROUP BY 1, pos
    )"""
    steps = ""
    prev = "c0"
    for i in range(1, KM_ITERS + 1):
        steps += f""",
    d{i} AS (
        SELECT q.vec_id, c.cluster,
               CAST(SUM((q.qd - c.cd) * (q.qd - c.cd)) AS BIGINT) AS dist
        FROM q JOIN {prev} c ON q.pos = c.pos
        GROUP BY 1, 2
    ),
    a{i} AS (
        SELECT vec_id, cluster, dist FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY dist, cluster) AS rn
            FROM d{i}
        ) WHERE rn = 1
    ),
    c{i} AS (
        SELECT a.cluster, q.pos, CAST(SUM(q.qd) AS BIGINT) // COUNT(*) AS cd
        FROM q JOIN a{i} a ON q.vec_id = a.vec_id
        GROUP BY 1, 2
    )"""
        prev = f"c{i}"
    final = f"""
    SELECT a.cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(a.dist) AS BIGINT) AS inertia,
           (SELECT CAST(SUM(cd * (pos + 1)) AS BIGINT)
            FROM c{KM_ITERS} c WHERE c.cluster = a.cluster) AS centroid_checksum
    FROM a{KM_ITERS} a GROUP BY a.cluster
    """
    return base + steps + final


@query(
    "q_kmeans_lloyd",
    oracle=_km_oracle(),
    tags=("clustering", "kmeans", "iterative", "X3", "custom-op"),
)
def q_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means ({K} clusters, {I} Lloyd iterations) over the embedding
    corpus on an integer grid: vectors quantize half-up to 1e-3 units,
    seed centroids are integer means of the id%{K} groups, assignment is
    exact integer squared distance (cluster-id tie-break), and centroid
    updates are integer ``div`` means — every iterate is bit-identical
    across engines and partitionings, the same determinism contract as
    q_pca_top_component. Output: per-cluster size, inertia (sum of
    assigned squared distances), and a centroid checksum.

    Scale: the canonical distributed Lloyd — centroids (k x dims
    integers) broadcast; assignment is a map-side argmin over the
    broadcast array (corpus never shuffles for it); the update is one
    (cluster, dim)-keyed aggregation. localCheckpoints keep the
    iteration DAG constant-depth.
    """
    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    qv = e.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * KM_QUANT + 0.5).cast("long"),
        ).alias("qv"),
    ).localCheckpoint(eager=False)

    def to_arrays(cent: DataFrame) -> DataFrame:
        return (
            cent.groupBy("cluster")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "cd"))).alias("pcs")
            )
            .select("cluster", F.transform("pcs", lambda s: s["cd"]).alias("cv"))
        )

    comp = qv.select("vec_id", F.posexplode("qv").alias("pos", "qd"))
    carr = to_arrays(
        comp.withColumn("cluster", F.col("vec_id") % KM_K)
        .groupBy("cluster", "pos")
        .agg(F.expr("CAST(sum(qd) AS BIGINT) div count(*)").alias("cd"))
    )
    assign = None
    sqdist = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    for _ in range(KM_ITERS):
        dist = qv.crossJoin(F.broadcast(carr)).select(
            "vec_id", "qv", "cluster", sqdist.alias("dist")
        )
        wr = Window.partitionBy("vec_id").orderBy("dist", "cluster")
        assign = (
            dist.withColumn("rn", F.row_number().over(wr))
            .filter(F.col("rn") == 1)
            .select("vec_id", "qv", "cluster", "dist")
            .localCheckpoint(eager=False)
        )
        carr = to_arrays(
            assign.select("cluster", F.posexplode("qv").alias("pos", "qd"))
            .groupBy("cluster", "pos")
            .agg(F.expr("CAST(sum(qd) AS BIGINT) div count(*)").alias("cd"))
        )
    checksum = F.expr(
        "aggregate(zip_with(cv, sequence(1, size(cv)),"
        " (c, i) -> c * CAST(i AS BIGINT)), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    return (
        assign.groupBy("cluster")
        .agg(F.count("*").alias("n_members"), F.sum("dist").alias("inertia"))
        .join(carr.select("cluster", checksum.alias("centroid_checksum")), "cluster")
        .select("cluster", "n_members", "inertia", "centroid_checksum")
    )


q_kmeans_lloyd.__doc__ = q_kmeans_lloyd.__doc__.format(K=KM_K, I=KM_ITERS)


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
        FROM events GROUP BY 1, 2
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
    daily = e.groupBy(
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


# --- DBSCAN core/border/noise classification ---------------------------------

DB_QUANT = 1000  # projection quantization grid
DB_EPS = 30  # epsilon in quantized units (0.03 embedding units)
DB_MINPTS = 8  # neighbors (incl. self) required for a core point


@query(
    "q_dbscan_classify",
    oracle=f"""
    WITH p AS (
        SELECT vec_id,
               CAST(FLOOR(embedding[1]::DOUBLE * {DB_QUANT} + 0.5) AS BIGINT) AS qx,
               CAST(FLOOR(embedding[2]::DOUBLE * {DB_QUANT} + 0.5) AS BIGINT) AS qy
        FROM embeddings
    ),
    c AS (SELECT vec_id, qx, qy, qx // {DB_EPS} AS cx, qy // {DB_EPS} AS cy FROM p),
    probes AS (
        SELECT c.vec_id, c.qx, c.qy, c.cx + dx.d AS cx, c.cy + dy.d AS cy
        FROM c,
             (SELECT UNNEST(GENERATE_SERIES(-1, 1)) AS d) dx,
             (SELECT UNNEST(GENERATE_SERIES(-1, 1)) AS d) dy
    ),
    nbrs AS (
        SELECT a.vec_id AS va, b.vec_id AS vb
        FROM probes a JOIN c b ON a.cx = b.cx AND a.cy = b.cy
        WHERE (a.qx - b.qx) * (a.qx - b.qx)
              + (a.qy - b.qy) * (a.qy - b.qy) <= {DB_EPS * DB_EPS}
    ),
    cnt AS (SELECT va AS vec_id, COUNT(*) AS n_nbrs FROM nbrs GROUP BY va),
    core AS (SELECT vec_id, n_nbrs, n_nbrs >= {DB_MINPTS} AS is_core FROM cnt),
    border AS (
        SELECT DISTINCT n.va AS vec_id
        FROM nbrs n JOIN core k ON n.vb = k.vec_id
        WHERE k.is_core AND n.va <> n.vb
    ),
    cls AS (
        SELECT c.vec_id, c.n_nbrs,
               CASE WHEN c.is_core THEN 'core'
                    WHEN b.vec_id IS NOT NULL THEN 'border'
                    ELSE 'noise' END AS classification
        FROM core c LEFT JOIN border b ON c.vec_id = b.vec_id
    )
    SELECT classification,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(MIN(n_nbrs) AS BIGINT) AS min_nbrs,
           CAST(MAX(n_nbrs) AS BIGINT) AS max_nbrs
    FROM cls GROUP BY classification
    """,
    tags=("clustering", "dbscan", "X3", "custom-op"),
)
def q_dbscan_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN density classification (core / border / noise) of the
    embedding cloud's leading 2-D projection on an integer grid —
    the density screen that precedes density-based cluster extraction
    (the cluster step itself is the certified connected-components
    operator, operators/cluster.py, over core-core neighbor edges).
    Exact epsilon-neighborhoods come from GRID BLOCKING: each point
    probes its 3x3 neighborhood of eps-sized cells, an equi-join on the
    cell key — cell width >= eps guarantees no true neighbor is missed,
    so the result is exact, never approximate.

    Scale: the probe fan-out is a constant 9x map-side expansion
    followed by ONE equi-join shuffle on the cell key and two
    aggregations — the standard way to make DBSCAN's neighbor search
    linear instead of quadratic. Hot cells (dense regions) are bounded
    by cell occupancy; like SemDeDup's k, epsilon is the density knob —
    it shrinks as density grows (the sf1 soak runs eps=10), keeping
    per-cell occupancy and the candidate volume flat.
    """
    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return dbscan_classify(spark, e)


def dbscan_classify(
    spark: SparkSession, e: DataFrame, eps: int = DB_EPS, minpts: int = DB_MINPTS
) -> DataFrame:
    """Parameterized core of q_dbscan_classify over any (vec_id,
    embedding) DataFrame — the soak harness scales eps with density."""
    p = e.select(
        "vec_id",
        F.floor(F.col("embedding").getItem(0).cast("double") * DB_QUANT + 0.5)
        .cast("long")
        .alias("qx"),
        F.floor(F.col("embedding").getItem(1).cast("double") * DB_QUANT + 0.5)
        .cast("long")
        .alias("qy"),
    )
    c = p.select(
        "vec_id", "qx", "qy",
        F.expr(f"qx div {eps}").alias("cx"),
        F.expr(f"qy div {eps}").alias("cy"),
    ).localCheckpoint(eager=False)
    off = spark.range(-1, 2).select(F.col("id").alias("d"))
    probes = (
        c.crossJoin(F.broadcast(off.select(F.col("d").alias("dx"))))
        .crossJoin(F.broadcast(off.select(F.col("d").alias("dy"))))
        .select(
            F.col("vec_id").alias("va"),
            F.col("qx").alias("qxa"),
            F.col("qy").alias("qya"),
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
    )
    b = c.select(
        F.col("vec_id").alias("vb"),
        F.col("qx").alias("qxb"),
        F.col("qy").alias("qyb"),
        "cx",
        "cy",
    )
    d2 = (F.col("qxa") - F.col("qxb")) * (F.col("qxa") - F.col("qxb")) + (
        F.col("qya") - F.col("qyb")
    ) * (F.col("qya") - F.col("qyb"))
    nbrs = (
        probes.join(b, ["cx", "cy"])
        .filter(d2 <= eps * eps)
        .select("va", "vb")
        .localCheckpoint(eager=False)
    )
    core = (
        nbrs.groupBy("va")
        .agg(F.count("*").alias("n_nbrs"))
        .select(
            F.col("va").alias("vec_id"),
            "n_nbrs",
            (F.col("n_nbrs") >= minpts).alias("is_core"),
        )
    )
    border = (
        nbrs.filter(F.col("va") != F.col("vb"))
        .join(
            core.filter("is_core").select(F.col("vec_id").alias("vb")),
            "vb",
            "left_semi",
        )
        .select(F.col("va").alias("vec_id"))
        .distinct()
        .withColumn("is_border", F.lit(True))
    )
    cls = core.join(border, "vec_id", "left").select(
        "n_nbrs",
        F.when(F.col("is_core"), "core")
        .when(F.col("is_border").isNotNull(), "border")
        .otherwise("noise")
        .alias("classification"),
    )
    return cls.groupBy("classification").agg(
        F.count("*").alias("n_points"),
        F.min("n_nbrs").alias("min_nbrs"),
        F.max("n_nbrs").alias("max_nbrs"),
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
        FROM events GROUP BY user_id
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
    u = e.groupBy("user_id").agg(F.min(day).alias("fd"), F.max(day).alias("ld"))
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


# --- Clamped running balance (Lindley recursion) -----------------------------


@query(
    "q_clamped_running_balance",
    # The clamp-at-zero recurrence b_t = max(0, b_{t-1} + x_t) has the
    # Lindley closed form b_t = S_t - min(0, min_{j<=t} S_j), which IS
    # window-expressible — no sequential scan needed. A clamp fires at t
    # iff S_t < min(0, min_{j<t} S_j) (the raw balance would go negative).
    oracle="""
    WITH tx AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                    ELSE -CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END AS delta
        FROM events
        WHERE event_type IN ('purchase', 'view')
    ),
    s AS (
        SELECT user_id, ts, event_id, delta,
               SUM(delta) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS s
        FROM tx
    ),
    m AS (
        SELECT user_id, s,
               LEAST(0, MIN(s) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) AS m,
               LEAST(0, COALESCE(MIN(s) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
                   AS mprev,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
                   AS rn_last
        FROM s
    ),
    bal AS (
        SELECT user_id, s - m AS balance,
               CASE WHEN s < mprev THEN 1 ELSE 0 END AS clamped, rn_last
        FROM m
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_tx,
           CAST(MIN(CASE WHEN rn_last = 1 THEN balance END) AS BIGINT)
               AS final_cents,
           CAST(MAX(balance) AS BIGINT) AS peak_cents,
           CAST(SUM(clamped) AS BIGINT) AS n_clamps
    FROM bal GROUP BY user_id
    """,
    tags=("window", "lindley", "behavioral"),
)
def q_clamped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped-at-zero running balance per user (purchases credit, views
    debit, integer cents): final balance, peak balance, and the number
    of clamp events (attempted overdraws). The naive formulation is a
    sequential per-key scan; the Lindley-recursion closed form
    b_t = S_t - min(0, running-min S_t) turns it into two stacked
    window aggregates — fully distributed, no applyInPandas state.

    Scale: all windows share one user-keyed sort — a single shuffle;
    the final per-user aggregate reuses the same partitioning. This is
    the pattern for any reflected/clamped cumulative process (queue
    depth, inventory with floor, credit drawdown).
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    tx = e.filter(F.col("event_type").isin("purchase", "view")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", cents).otherwise(-cents).alias(
            "delta"
        ),
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wprev = wo.rowsBetween(Window.unboundedPreceding, -1)
    wlast = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    s = tx.withColumn("s", F.sum("delta").over(wo))
    m = s.select(
        "user_id",
        "s",
        F.least(F.lit(0), F.min("s").over(wo)).alias("m"),
        F.least(F.lit(0), F.coalesce(F.min("s").over(wprev), F.lit(0))).alias(
            "mprev"
        ),
        F.row_number().over(wlast).alias("rn_last"),
    )
    bal = m.select(
        "user_id",
        (F.col("s") - F.col("m")).alias("balance"),
        F.when(F.col("s") < F.col("mprev"), 1).otherwise(0).alias("clamped"),
        "rn_last",
    )
    return bal.groupBy("user_id").agg(
        F.count("*").alias("n_tx"),
        F.min(F.when(F.col("rn_last") == 1, F.col("balance"))).alias("final_cents"),
        F.max("balance").alias("peak_cents"),
        F.sum("clamped").alias("n_clamps"),
    )


# --- WordPiece subword tokenization ------------------------------------------


def _wp_oracle() -> str:
    from etl_pipeline_spark.operators.wordpiece import vocab_values_sql

    return f"""
    WITH RECURSIVE words AS (
        SELECT token AS word, COUNT(*) AS wc FROM (
            SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
        ) WHERE token <> '' GROUP BY token
    ),
    vocab(frag, is_cont) AS (VALUES {vocab_values_sql()}),
    step AS (
        SELECT word, word AS rest, 0 AS pos, CAST(NULL AS VARCHAR) AS piece
        FROM words
        UNION ALL
        SELECT s.word, SUBSTR(s.rest, LEN(v.frag) + 1, 100000),
               s.pos + LEN(v.frag),
               CASE WHEN s.pos = 0 THEN v.frag ELSE '##' || v.frag END
        FROM step s JOIN vocab v
          ON v.is_cont = CASE WHEN s.pos = 0 THEN 0 ELSE 1 END
         AND SUBSTR(s.rest, 1, LEN(v.frag)) = v.frag
        WHERE s.rest <> ''
          AND LEN(v.frag) = (
              SELECT MAX(LEN(v2.frag)) FROM vocab v2
              WHERE v2.is_cont = CASE WHEN s.pos = 0 THEN 0 ELSE 1 END
                AND SUBSTR(s.rest, 1, LEN(v2.frag)) = v2.frag)
    )
    SELECT piece,
           CAST(SUM(w.wc) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT s.word) AS BIGINT) AS n_words
    FROM step s JOIN words w ON s.word = w.word
    WHERE s.piece IS NOT NULL
    GROUP BY piece
    """


@query(
    "q_wordpiece_tokenize",
    oracle=_wp_oracle(),
    tags=("text", "tokenizer", "wordpiece", "pandas-udf", "X4"),
)
def q_wordpiece_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece subword tokenization of the corpus — greedy
    longest-match-first against the shared vocabulary
    (operators/wordpiece.py), reported as per-piece corpus frequencies.
    The Spark side runs the REAL tokenizer as an Arrow-batched pandas
    UDF over the DISTINCT word table and weights by word frequency; the
    oracle replays the identical greedy recurrence as a recursive CTE,
    so the UDF output is value-hash-verified piece by piece.

    Scale: the UDF touches only distinct words (vocabulary-sized);
    corpus weight arrives by joining word counts — tokenizing 100 TB
    costs one word-frequency aggregate, a tiny UDF stage, and one
    piece-keyed aggregate. This is the canonical "precompute on the
    vocabulary, broadcast-join to the corpus" shape.
    """
    from etl_pipeline_spark.operators.wordpiece import wordpiece_udf

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )
    pieces = words.select(
        "word", "wc", F.explode(wordpiece_udf()("word")).alias("piece")
    )
    return pieces.groupBy("piece").agg(
        F.sum("wc").alias("n_tokens"),
        F.countDistinct("word").alias("n_words"),
    )


# --- Python UDTF surface -----------------------------------------------------


@query(
    "q_udtf_span_days",
    oracle="""
    WITH u AS (
        SELECT user_id,
               MIN(DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE))) AS fd,
               MAX(DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE))) AS ld
        FROM events GROUP BY user_id
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
            for day in range(fd, ld + 1):
                yield user_id, day

    e = load_tables(spark, sf_dir, ("events",))["events"]
    day = F.datediff(F.to_date("ts"), F.lit(EPOCH)).cast("long")
    u = e.groupBy("user_id").agg(F.min(day).alias("fd"), F.max(day).alias("ld"))
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


# --- Additive seasonal decomposition ----------------------------------------


@query(
    "q_seasonal_decompose",
    oracle="""
    WITH daily AS (
        SELECT DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
               COUNT(*) AS x
        FROM events GROUP BY 1
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
    daily = e.groupBy(
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


# --- Maximal Marginal Relevance re-ranking -----------------------------------

MMR_QID = 1  # fixture query vector
MMR_POOL = 20
MMR_K = 5
# lambda = 0.7 as the integer split mmr = 7*rel - 3*maxsim (x10 scale)


def _mmr_oracle() -> str:
    sel_union = "SELECT vec_id FROM s1"
    steps = ""
    for k in range(2, MMR_K + 1):
        steps += f""",
    s{k} AS (
        SELECT c.vec_id, c.rel, 7 * c.rel - 3 * MAX(d.dp) AS mmr,
               {k} AS step
        FROM cands c
        JOIN dots d ON d.va = c.vec_id
        WHERE d.vb IN ({sel_union})
          AND c.vec_id NOT IN ({sel_union})
        GROUP BY c.vec_id, c.rel
        ORDER BY mmr DESC, c.vec_id LIMIT 1
    )"""
        sel_union += f" UNION ALL SELECT vec_id FROM s{k}"
    selects = "\n    UNION ALL\n    ".join(
        f"SELECT CAST(step AS BIGINT) AS step, vec_id,"
        f" CAST(rel AS BIGINT) AS rel_scaled,"
        f" CAST(mmr AS BIGINT) AS mmr_scaled FROM s{k}"
        for k in range(1, MMR_K + 1)
    )
    return f"""
    WITH qv AS MATERIALIZED (
        SELECT vec_id,
               LIST(CAST(FLOOR(embedding[g]::DOUBLE * 1000 + 0.5) AS BIGINT)
                    ORDER BY g) AS v
        FROM embeddings, UNNEST(GENERATE_SERIES(1, LEN(embedding))) t(g)
        GROUP BY vec_id
    ),
    qry AS (SELECT v FROM qv WHERE vec_id = {MMR_QID}),
    rel AS (
        SELECT qv.vec_id, list_dot_product(qv.v, qry.v) AS rel, qv.v
        FROM qv, qry WHERE qv.vec_id <> {MMR_QID}
    ),
    cands AS MATERIALIZED (SELECT * FROM rel ORDER BY rel DESC, vec_id LIMIT {MMR_POOL}),
    dots AS MATERIALIZED (
        SELECT a.vec_id AS va, b.vec_id AS vb, list_dot_product(a.v, b.v) AS dp
        FROM cands a JOIN cands b ON a.vec_id <> b.vec_id
    ),
    s1 AS (
        SELECT vec_id, rel, 7 * rel AS mmr, 1 AS step
        FROM cands ORDER BY rel DESC, vec_id LIMIT 1
    ){steps}
    {selects}
    """


@query(
    "q_mmr_rerank",
    oracle=_mmr_oracle(),
    tags=("similarity", "X3", "mmr", "rerank", "iterative"),
)
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking: from the top-{P} cosine
    candidates for the fixture query vector, greedily select {K} results
    trading relevance against redundancy (lambda=0.7; score =
    7*rel - 3*max-sim-to-selected on the x10 integer scale) — the
    diversification step retrieval pipelines (and RAG context builders)
    run after ANN search. Vectors live on the integer grid (the PCA
    idiom) so relevance, similarity, and every greedy argmax are exact
    and engine-identical; the oracle unrolls the same {K} selection
    steps as chained CTEs.

    Scale: the expensive part is candidate retrieval, delegated to the
    certified ANN paths (LSH/IVF/PQ); MMR itself touches only the
    candidate pool ({P} rows, {P}x{P} dots) regardless of corpus size —
    per-query constant work, embarrassingly parallel across queries.
    """
    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    qv = e.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * 1000 + 0.5).cast("long")
        ).alias("v"),
    )
    idot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda p, r: p * r),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    qry = qv.filter(F.col("vec_id") == MMR_QID).select(F.col("v").alias("query_v"))
    rel = (
        qv.filter(F.col("vec_id") != MMR_QID)
        .crossJoin(F.broadcast(qry))
        .select("vec_id", "v", idot(F.col("v"), F.col("query_v")).alias("rel"))
    )
    cands = (
        rel.orderBy(F.desc("rel"), "vec_id").limit(MMR_POOL).localCheckpoint(eager=False)
    )
    a = cands.select(F.col("vec_id").alias("va"), F.col("v").alias("av"))
    b = cands.select(F.col("vec_id").alias("vb"), F.col("v").alias("bv"))
    dots = (
        a.crossJoin(b)
        .filter(F.col("va") != F.col("vb"))
        .select("va", "vb", idot(F.col("av"), F.col("bv")).alias("dp"))
        .localCheckpoint(eager=False)
    )
    selected = (
        cands.orderBy(F.desc("rel"), "vec_id")
        .limit(1)
        .select(
            F.lit(1).cast("long").alias("step"),
            "vec_id",
            F.col("rel").alias("rel_scaled"),
            (7 * F.col("rel")).alias("mmr_scaled"),
        )
    )
    for k in range(2, MMR_K + 1):
        sel_ids = selected.select(F.col("vec_id").alias("vb"))
        maxsim = (
            dots.join(sel_ids, "vb")
            .groupBy("va")
            .agg(F.max("dp").alias("ms"))
        )
        rem = cands.join(
            selected.select("vec_id"), "vec_id", "left_anti"
        )
        pick = (
            rem.join(maxsim, rem["vec_id"] == maxsim["va"])
            .select(
                F.lit(k).cast("long").alias("step"),
                rem["vec_id"],
                F.col("rel").alias("rel_scaled"),
                (7 * F.col("rel") - 3 * F.col("ms")).alias("mmr_scaled"),
            )
            .orderBy(F.desc("mmr_scaled"), "vec_id")
            .limit(1)
        )
        selected = selected.unionByName(pick)
        if k < MMR_K:  # keep the final pick's plan visible (TakeOrdered)
            selected = selected.localCheckpoint(eager=False)
    return selected


q_mmr_rerank.__doc__ = q_mmr_rerank.__doc__.format(P=MMR_POOL, K=MMR_K)


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
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
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
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
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
    rows = li.select(
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


# --- Linear-interpolation gap fill -------------------------------------------


@query(
    "q_linear_interp_gapfill",
    # Known points: purchase-day mean cents (integer). Missing days
    # interpolate linearly between bracketing knowns in exact integer
    # milli-cents: v = 1000*prev + (1000*(next-prev)*(d-pd)) div (nd-pd).
    oracle="""
    WITH daily AS (
        SELECT DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
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
                "CAST(sum(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)"
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
        FROM events GROUP BY 1
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
    daily = e.groupBy(
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


# --- Rare-category bucketing -------------------------------------------------

RARE_MIN_SHARE_BP = 300  # categories under 3% of rows collapse to OTHER


@query(
    "q_rare_category_other",
    oracle=f"""
    WITH c AS (
        SELECT p_type AS cat, COUNT(*) AS n FROM part GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM c),
    m AS (
        SELECT CASE WHEN 10000 * n >= {RARE_MIN_SHARE_BP} * tot
                    THEN cat ELSE 'OTHER' END AS bucket, n
        FROM c, t
    )
    SELECT bucket,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_source_categories
    FROM m GROUP BY bucket
    """,
    tags=("feature-prep", "categorical", "long-tail"),
)
def q_rare_category_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-tail category bucketing: part types below a 3% row share
    collapse into OTHER — the standard cardinality cap applied before
    one-hot/target encoding so rare levels don't overfit or blow up
    the feature width. Thresholding uses exact integer basis points
    (10000*n >= bp*total), no float shares.

    Scale: two category-keyed aggregates with a broadcast 1-row total;
    cost is category cardinality. The encoder downstream
    (q_target_encoding) consumes the bucketed column unchanged.
    """
    p = load_tables(spark, sf_dir, ("part",))["part"]
    c = p.groupBy(F.col("p_type").alias("cat")).agg(F.count("*").alias("n"))
    t = c.agg(F.sum("n").alias("tot"))
    m = c.crossJoin(F.broadcast(t)).select(
        F.when(
            10000 * F.col("n") >= RARE_MIN_SHARE_BP * F.col("tot"), F.col("cat")
        )
        .otherwise("OTHER")
        .alias("bucket"),
        "n",
    )
    return m.groupBy("bucket").agg(
        F.sum("n").alias("n_rows"),
        F.count("*").alias("n_source_categories"),
    )


# --- Weight-of-evidence encoding ---------------------------------------------

WOE_BINS = 6


@query(
    "q_woe_encoding",
    # Target: order was fulfilled (o_orderstatus = 'F'). Bins: NTILE
    # over (cents, orderkey). WOE = ln(good_share / bad_share), exact
    # integer counts into one ln, rounded to 6; Laplace +1 smoothing
    # keeps empty cells finite (and is part of the definition here).
    oracle=f"""
    WITH t AS (
        SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
               o_orderkey,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS good
        FROM orders
    ),
    b AS (
        SELECT good, NTILE({WOE_BINS}) OVER (ORDER BY cents, o_orderkey) AS bin,
               cents
        FROM t
    ),
    g AS (
        SELECT bin,
               CAST(SUM(good) AS BIGINT) AS goods,
               CAST(SUM(1 - good) AS BIGINT) AS bads,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(MIN(cents) / 100.0, 2) AS lo
        FROM b GROUP BY bin
    ),
    tot AS (
        SELECT CAST(SUM(goods) AS BIGINT) AS tg, CAST(SUM(bads) AS BIGINT) AS tb
        FROM g
    )
    SELECT bin, n, goods, bads, lo,
           ROUND(LN(((goods + 1.0) / (tg + {WOE_BINS}))
                    / ((bads + 1.0) / (tb + {WOE_BINS}))), 6) AS woe
    FROM g, tot
    """,
    tags=("feature-prep", "woe", "encoding", "statistics"),
)
def q_woe_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence encoding of order value against fulfillment:
    equi-depth bins (deterministic NTILE) scored by
    ln(good_share/bad_share) with Laplace smoothing — the
    credit-scoring-style monotone encoder that complements the mean
    encoder (q_target_encoding). Counts are exact integers; the single
    ln per bin is rounded to 6 (the q_dp_noisy_counts tolerance class).

    Scale: the exact NTILE is the small-N conformance form; at volume
    the SAME report runs off KLL bin edges (q_kll_quantile_merge) with
    identical downstream arithmetic.
    """
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    t = o.select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("good"),
    )
    b = t.withColumn(
        "bin", F.ntile(WOE_BINS).over(Window.orderBy("cents", "o_orderkey"))
    )
    g = b.groupBy("bin").agg(
        F.sum("good").alias("goods"),
        F.sum(1 - F.col("good")).alias("bads"),
        F.count("*").alias("n"),
        F.round(F.min("cents") / 100.0, 2).alias("lo"),
    )
    tot = g.agg(F.sum("goods").alias("tg"), F.sum("bads").alias("tb"))
    woe = F.round(
        F.log(
            ((F.col("goods") + 1.0) / (F.col("tg") + WOE_BINS))
            / ((F.col("bads") + 1.0) / (F.col("tb") + WOE_BINS))
        ),
        6,
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .select("bin", "n", "goods", "bads", "lo", woe.alias("woe"))
    )


# --- Population stability index ----------------------------------------------

PSI_BINS = 8
PSI_LO, PSI_HI = 0.0, 60_000_000.0  # cents domain for the fixed-width bins


@query(
    "q_psi_drift",
    # Fixed-width bins over a pinned domain (the q_histogram_values
    # band arithmetic) so bin edges are scale- and period-independent;
    # +1 smoothing keeps empty bins finite. Expected = 1995-1997
    # orders, actual = 1998+.
    oracle=f"""
    WITH t AS (
        SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
               CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 'e' ELSE 'a'
                   END AS period
        FROM orders
    ),
    b AS (
        SELECT period,
               LEAST(CAST(FLOOR((cents - {PSI_LO}) * {PSI_BINS}
                                / ({PSI_HI} - {PSI_LO})) AS BIGINT),
                     {PSI_BINS - 1}) AS bin
        FROM t
    ),
    g AS (
        SELECT bin,
               CAST(SUM(CASE WHEN period = 'e' THEN 1 ELSE 0 END) AS BIGINT)
                   AS ne,
               CAST(SUM(CASE WHEN period = 'a' THEN 1 ELSE 0 END) AS BIGINT)
                   AS na
        FROM b GROUP BY bin
    ),
    tot AS (
        SELECT CAST(SUM(ne) AS BIGINT) AS te, CAST(SUM(na) AS BIGINT) AS ta
        FROM g
    )
    SELECT bin, ne, na,
           ROUND(((na + 1.0) / (ta + {PSI_BINS}) - (ne + 1.0) / (te + {PSI_BINS}))
                 * LN(((na + 1.0) / (ta + {PSI_BINS}))
                      / ((ne + 1.0) / (te + {PSI_BINS}))), 6) AS psi_term
    FROM g, tot
    """,
    tags=("dq", "drift", "psi", "statistics"),
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of order value, expected period
    (pre-1998) vs actual (1998+): per-bin PSI terms
    (p_a - p_e) * ln(p_a/p_e) with Laplace smoothing — the model-ops
    drift gate (rule of thumb: total PSI > 0.2 blocks deployment).
    Bins are fixed-width over a pinned domain so the SAME edges apply
    to every scoring period; counts are exact and only the per-bin
    ln is floating point (rounded to 6). Complements q_dq_ks_drift
    (exact ECDF distance) with the binned, additive industry metric.

    Scale: one map-combined conditional aggregate per bin + a 1-row
    broadcast of the totals — volume-independent plan.
    """
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    t = o.select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        F.when(F.col("o_orderdate") < "1998-01-01", "e").otherwise("a").alias(
            "period"
        ),
    )
    b = t.select(
        "period",
        F.least(
            F.floor((F.col("cents") - PSI_LO) * PSI_BINS / (PSI_HI - PSI_LO)).cast(
                "long"
            ),
            F.lit(PSI_BINS - 1).cast("long"),
        ).alias("bin"),
    )
    g = b.groupBy("bin").agg(
        F.sum(F.when(F.col("period") == "e", 1).otherwise(0)).alias("ne"),
        F.sum(F.when(F.col("period") == "a", 1).otherwise(0)).alias("na"),
    )
    tot = g.agg(F.sum("ne").alias("te"), F.sum("na").alias("ta"))
    pe = (F.col("ne") + 1.0) / (F.col("te") + PSI_BINS)
    pa = (F.col("na") + 1.0) / (F.col("ta") + PSI_BINS)
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "ne",
            "na",
            F.round((pa - pe) * F.log(pa / pe), 6).alias("psi_term"),
        )
    )


# --- Item-item collaborative filtering ---------------------------------------

CF_MIN_COOC = 2
CF_TOPK = 5


@query(
    "q_item_cf_similar",
    oracle=f"""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    deg AS (SELECT l_partkey AS p, COUNT(*) AS n FROM items GROUP BY 1),
    cooc AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS c
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {CF_MIN_COOC}
    ),
    bidir AS (
        SELECT u AS item, v AS partner, c FROM cooc
        UNION ALL
        SELECT v, u, c FROM cooc
    ),
    scored AS (
        SELECT b.item, b.partner, b.c,
               ROUND(b.c / SQRT(di.n * dp.n), 6) AS cosine
        FROM bidir b JOIN deg di ON di.p = b.item JOIN deg dp ON dp.p = b.partner
    ),
    ranked AS (
        SELECT item, partner, c, cosine,
               ROW_NUMBER() OVER (
                   PARTITION BY item ORDER BY cosine DESC, partner) AS rnk
        FROM scored
    )
    SELECT item, CAST(rnk AS BIGINT) AS rnk, partner,
           CAST(c AS BIGINT) AS cooc, cosine
    FROM ranked WHERE rnk <= {CF_TOPK}
    """,
    tags=("recommender", "item-cf", "similarity", "graph"),
)
def q_item_cf_similar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: for each part, the top-{K}
    co-purchased partners by cosine similarity over order baskets
    (cooc / sqrt(n_a * n_b), support >= {S}) — the "customers also
    bought" recommender beside the lift-ranked association rules
    (q_market_basket_rules ranks rules; this ranks neighbors per item).
    Counts are exact; the cosine is one rounded division per pair with
    full tie-breaks, so the neighbor lists are engine-identical.

    Scale: the basket self-join is the q_triangle_count edge builder
    (support-thresholded, canonically oriented); degree joins broadcast
    the item-count table; per-item top-k is a partitioned window
    (WindowGroupLimit). Hub items bound fan-out via the support floor.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    items = li.select("l_orderkey", "l_partkey").distinct().localCheckpoint(eager=False)
    deg = items.groupBy(F.col("l_partkey").alias("p")).agg(F.count("*").alias("n"))
    a = items.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("u"))
    b = items.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("v"))
    cooc = (
        a.join(b, "o")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= CF_MIN_COOC)
    )
    both = cooc.select(F.col("u").alias("item"), F.col("v").alias("partner"), "c").unionAll(
        cooc.select(F.col("v").alias("item"), F.col("u").alias("partner"), "c")
    )
    di = deg.select(F.col("p").alias("item"), F.col("n").alias("ni"))
    dp = deg.select(F.col("p").alias("partner"), F.col("n").alias("np"))
    scored = (
        both.join(F.broadcast(di), "item")
        .join(F.broadcast(dp), "partner")
        .select(
            "item",
            "partner",
            "c",
            F.round(F.col("c") / F.sqrt(F.col("ni") * F.col("np")), 6).alias(
                "cosine"
            ),
        )
    )
    ranked = scored.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("item").orderBy(F.desc("cosine"), "partner")
        ),
    )
    return (
        ranked.filter(F.col("rnk") <= CF_TOPK)
        .select("item", F.col("rnk").cast("long"), "partner", F.col("c").alias("cooc"), "cosine")
    )


q_item_cf_similar.__doc__ = q_item_cf_similar.__doc__.format(K=CF_TOPK, S=CF_MIN_COOC)


# --- Degree distribution + power-law fit -------------------------------------


@query(
    "q_degree_powerlaw",
    # Continuous-MLE alpha = 1 + n / sum(ln(d / (dmin - 0.5))) over
    # degrees >= dmin — exact integer histogram, one ln-sum rounded 6.
    oracle=f"""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    und AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    deg AS (
        SELECT k, COUNT(*) AS d FROM (
            SELECT u AS k FROM und UNION ALL SELECT v FROM und
        ) GROUP BY k
    ),
    hist AS (SELECT d, COUNT(*) AS n_nodes FROM deg GROUP BY d),
    fit AS (
        SELECT COUNT(*) AS n_tail,
               ROUND(1.0 + COUNT(*) / SUM(LN(d / 1.5)), 6) AS alpha_mle
        FROM deg WHERE d >= 2
    )
    SELECT hist.d AS degree, CAST(hist.n_nodes AS BIGINT) AS n_nodes,
           (SELECT CAST(n_tail AS BIGINT) FROM fit) AS n_tail,
           (SELECT alpha_mle FROM fit) AS alpha_mle
    FROM hist
    """,
    tags=("graph", "degree-distribution", "power-law"),
)
def q_degree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph with the
    continuous-MLE power-law exponent (Clauset-Shalizi-Newman form,
    dmin=2) — the hub-structure profile that predicts wedge-join cost
    (q_triangle_count) and decides degree-capping. The histogram is
    exact; alpha is one ln-sum rounded to 6, the word-frequency twin of
    q_text_zipf_fit on the graph side.

    Scale: degree computation is one edge-keyed aggregate; the
    histogram and fit run on the degree table (node-cardinality-sized).
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("u"))
    b = items.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("v"))
    und = (
        a.join(b, "o")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("u", "v")
    )
    deg = (
        und.select(F.col("u").alias("k"))
        .unionAll(und.select(F.col("v").alias("k")))
        .groupBy("k")
        .agg(F.count("*").alias("d"))
        .localCheckpoint(eager=False)
    )
    hist = deg.groupBy(F.col("d").alias("degree")).agg(
        F.count("*").alias("n_nodes")
    )
    fit = deg.filter(F.col("d") >= 2).agg(
        F.count("*").alias("n_tail"),
        F.round(1.0 + F.count("*") / F.sum(F.log(F.col("d") / 1.5)), 6).alias(
            "alpha_mle"
        ),
    )
    return hist.crossJoin(F.broadcast(fit)).select(
        "degree", "n_nodes", F.col("n_tail").cast("long"), "alpha_mle"
    )


# --- Tokenizer fertility -----------------------------------------------------


@query(
    "q_tokenizer_fertility",
    # Fertility = subword pieces per whitespace word, the tokenizer
    # quality metric (high fertility = wasted context window). Reuses the
    # WordPiece recurrence per distinct word, weighted by per-language
    # corpus counts; 10000x scaled-integer div keeps it exact.
    oracle="""
    WITH RECURSIVE words AS (
        SELECT lang, token AS word, COUNT(*) AS wc FROM (
            SELECT lang, UNNEST(STRING_SPLIT(text, ' ')) AS token
            FROM documents
        ) WHERE token <> '' GROUP BY lang, token
    ),
    uw AS (SELECT DISTINCT word FROM words),
    vocab(frag, is_cont) AS (VALUES __VOCAB__),
    step AS (
        SELECT word, word AS rest, 0 AS pos, 0 AS emitted FROM uw
        UNION ALL
        SELECT s.word, SUBSTR(s.rest, LEN(v.frag) + 1, 100000),
               s.pos + LEN(v.frag), 1
        FROM step s JOIN vocab v
          ON v.is_cont = CASE WHEN s.pos = 0 THEN 0 ELSE 1 END
         AND SUBSTR(s.rest, 1, LEN(v.frag)) = v.frag
        WHERE s.rest <> ''
          AND LEN(v.frag) = (
              SELECT MAX(LEN(v2.frag)) FROM vocab v2
              WHERE v2.is_cont = CASE WHEN s.pos = 0 THEN 0 ELSE 1 END
                AND SUBSTR(s.rest, 1, LEN(v2.frag)) = v2.frag)
    ),
    wp AS (
        SELECT word, CAST(SUM(emitted) AS BIGINT) AS n_pieces
        FROM step GROUP BY word
    )
    SELECT w.lang,
           CAST(SUM(w.wc) AS BIGINT) AS n_words,
           CAST(SUM(w.wc * p.n_pieces) AS BIGINT) AS n_pieces,
           (10000 * CAST(SUM(w.wc * p.n_pieces) AS BIGINT))
               // CAST(SUM(w.wc) AS BIGINT) AS fertility_x10000
    FROM words w JOIN wp p ON w.word = p.word
    GROUP BY w.lang
    """,
    tags=("text", "tokenizer", "fertility", "X4", "pandas-udf"),
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: subword pieces emitted per
    whitespace word under the WordPiece vocabulary — THE metric for
    vocabulary fit (fertility near 1 = efficient context use; high
    fertility = the vocab fragments that language, a known multilingual
    fairness issue). The tokenizer runs once per DISTINCT word (pandas
    UDF) and weights by per-language counts; fertility is a 10000x
    scaled-integer div, engine-exact.

    Scale: identical to q_wordpiece_tokenize — vocabulary-sized UDF
    work, corpus weight via one word-keyed aggregate.
    """
    from etl_pipeline_spark.operators.wordpiece import wordpiece_udf

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    words = (
        d.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("lang", "word")
        .agg(F.count("*").alias("wc"))
        .localCheckpoint(eager=False)
    )
    uw = words.select("word").distinct()
    wp = uw.select("word", F.size(wordpiece_udf()("word")).cast("long").alias("n_pieces"))
    j = words.join(F.broadcast(wp), "word")
    return j.groupBy("lang").agg(
        F.sum("wc").alias("n_words"),
        F.sum(F.col("wc") * F.col("n_pieces")).alias("n_pieces"),
        F.expr(
            "(10000 * CAST(sum(wc * n_pieces) AS BIGINT))"
            " div CAST(sum(wc) AS BIGINT)"
        ).alias("fertility_x10000"),
    )


# inject the shared vocabulary into the fertility oracle
def _patch_fertility_oracle() -> None:
    from etl_pipeline_spark.operators.wordpiece import vocab_values_sql
    from etl_pipeline_spark.queries.base import REGISTRY

    spec = REGISTRY["q_tokenizer_fertility"]
    spec.oracle = spec.oracle.replace("__VOCAB__", vocab_values_sql())


_patch_fertility_oracle()


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
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
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
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
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


# --- Bill-of-materials explosion ---------------------------------------------

BOM_MAX_DEPTH = 3
BOM_ROOT_MOD = 97  # parts with key % 97 == 0 are the exploded assemblies


@query(
    "q_bom_explosion",
    # Synthetic acyclic BOM: every part p >= 10 is assembled from
    # components p//7 (qty p%5+1) and p//11 (qty p%3+1) — components
    # always have smaller keys, so the graph is a DAG by construction.
    # Path quantities multiply; multiple paths to the same component
    # accumulate. The oracle walks the identical recurrence with a
    # depth counter.
    oracle=f"""
    WITH RECURSIVE edges AS (
        SELECT p_partkey AS asm, p_partkey // 7 AS comp,
               CAST(p_partkey % 5 + 1 AS BIGINT) AS qty
        FROM part WHERE p_partkey >= 10
        UNION ALL
        SELECT p_partkey, p_partkey // 11, CAST(p_partkey % 3 + 1 AS BIGINT)
        FROM part WHERE p_partkey >= 10
    ),
    walk AS (
        SELECT p_partkey AS root, p_partkey AS node,
               CAST(1 AS BIGINT) AS mult, 0 AS depth
        FROM part WHERE p_partkey % {BOM_ROOT_MOD} = 0 AND p_partkey > 0
        UNION ALL
        SELECT w.root, e.comp, w.mult * e.qty, w.depth + 1
        FROM walk w JOIN edges e ON e.asm = w.node
        WHERE w.depth < {BOM_MAX_DEPTH}
    )
    SELECT root, node AS component,
           CAST(SUM(mult) AS BIGINT) AS total_qty,
           CAST(COUNT(*) AS BIGINT) AS n_paths,
           CAST(MIN(depth) AS BIGINT) AS min_depth
    FROM walk WHERE depth > 0
    GROUP BY root, node
    """,
    tags=("graph", "recursive", "bom", "hierarchy"),
)
def q_bom_explosion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bill-of-materials explosion: each root assembly expands through
    {D} levels of its (synthetic, acyclic) component DAG, MULTIPLYING
    quantities along every path and summing across parallel paths — the
    manufacturing requirements / cost-rollup shape that plain
    transitive closure (operators/cluster.py) doesn't cover because
    paths carry weights. Exact integer multiplicities; the oracle is
    the identical WITH RECURSIVE walk.

    Scale: the frontier expansion is one join per level on the
    assembly key (the PageRank iteration shape); real BOMs bound depth,
    and the per-level frontier is checkpointed so the DAG stays
    constant-depth. Multiple-path accumulation happens in the final
    aggregate, not by deduplicating mid-walk.
    """
    p = load_tables(spark, sf_dir, ("part",))["part"]
    base = p.filter(F.col("p_partkey") >= 10)
    edges = (
        base.select(
            F.col("p_partkey").alias("asm"),
            F.expr("p_partkey div 7").alias("comp"),
            (F.col("p_partkey") % 5 + 1).cast("long").alias("qty"),
        )
        .unionAll(
            base.select(
                F.col("p_partkey").alias("asm"),
                F.expr("p_partkey div 11").alias("comp"),
                (F.col("p_partkey") % 3 + 1).cast("long").alias("qty"),
            )
        )
        .localCheckpoint(eager=False)
    )
    frontier = p.filter(
        (F.col("p_partkey") % BOM_ROOT_MOD == 0) & (F.col("p_partkey") > 0)
    ).select(
        F.col("p_partkey").alias("root"),
        F.col("p_partkey").alias("node"),
        F.lit(1).cast("long").alias("mult"),
    )
    levels = []
    for depth in range(1, BOM_MAX_DEPTH + 1):
        frontier = (
            frontier.join(edges, frontier["node"] == edges["asm"])
            .select(
                "root",
                F.col("comp").alias("node"),
                (F.col("mult") * F.col("qty")).alias("mult"),
            )
            .localCheckpoint(eager=False)
        )
        levels.append(frontier.withColumn("depth", F.lit(depth)))
    walk = levels[0]
    for lv in levels[1:]:
        walk = walk.unionByName(lv)
    return walk.groupBy("root", F.col("node").alias("component")).agg(
        F.sum("mult").alias("total_qty"),
        F.count("*").alias("n_paths"),
        F.min("depth").cast("long").alias("min_depth"),
    )


q_bom_explosion.__doc__ = q_bom_explosion.__doc__.format(D=BOM_MAX_DEPTH)


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
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                        * CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS q
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
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    m = e.groupBy(F.col("event_type").alias("g")).agg(
        F.count("*").alias("n"),
        F.sum(cents).alias("s"),
        F.sum(cents * cents).alias("q"),
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
    var1 = (F.col("q1") - F.col("s1") * mean1) / (F.col("n1") - 1)
    var2 = (F.col("q2") - F.col("s2") * mean2) / (F.col("n2") - 1)
    tt = (mean1 - mean2) / F.sqrt(var1 / F.col("n1") + var2 / F.col("n2"))
    return pairs.select(
        "g1",
        "g2",
        F.round(tt, 6).alias("t_stat"),
        F.when(F.abs(tt) > 1.96, 1).otherwise(0).alias("naive_significant"),
        F.when(F.abs(tt) > 2.807, 1).otherwise(0).alias("bonferroni_significant"),
    )


# --- kNN classifier evaluation -----------------------------------------------

KNN_EVAL_K = 5


@query(
    "q_knn_classifier_eval",
    # Leave-one-out 5-NN label prediction on a deterministic ~0.8%
    # md5-sampled eval set, scored against the full corpus with EXACT
    # integer dot products (the PCA quantization idiom) — neighbor sets,
    # votes, and the accuracy report are engine-identical. Majority
    # vote ties break toward the smaller label.
    oracle=f"""
    WITH qv AS MATERIALIZED (
        SELECT vec_id, label,
               LIST(CAST(FLOOR(embedding[g]::DOUBLE * 1000 + 0.5) AS BIGINT)
                    ORDER BY g) AS v
        FROM embeddings, UNNEST(GENERATE_SERIES(1, LEN(embedding))) t(g)
        GROUP BY vec_id, label
    ),
    ev AS MATERIALIZED (
        SELECT * FROM qv
        WHERE SUBSTR(MD5(CAST(vec_id AS VARCHAR)), 1, 2) IN ('00', '01')
    ),
    nn AS (
        SELECT e.vec_id AS qid, e.label AS true_label,
               c.label AS nbr_label,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_dot_product(e.v, c.v) DESC, c.vec_id
               ) AS rnk
        FROM ev e JOIN qv c ON c.vec_id <> e.vec_id
    ),
    votes AS (
        SELECT qid, true_label, nbr_label, COUNT(*) AS cnt
        FROM nn WHERE rnk <= {KNN_EVAL_K}
        GROUP BY qid, true_label, nbr_label
    ),
    pred AS (
        SELECT qid, true_label, nbr_label AS predicted FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY qid ORDER BY cnt DESC, nbr_label) AS vr
            FROM votes
        ) WHERE vr = 1
    )
    SELECT CAST(true_label AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(SUM(CASE WHEN predicted = true_label THEN 1 ELSE 0 END)
               AS BIGINT) AS n_correct,
           (10000 * CAST(SUM(CASE WHEN predicted = true_label THEN 1 ELSE 0 END)
               AS BIGINT)) // COUNT(*) AS accuracy_bp
    FROM pred GROUP BY true_label
    """,
    tags=("similarity", "X3", "knn", "evaluation", "ml-eval"),
)
def q_knn_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out kNN classification accuracy of the embedding space
    per label: each md5-sampled eval vector is labeled by the majority
    of its {K} nearest corpus neighbors (itself excluded) — the
    embedding-quality eval that complements the retrieval-side recall
    reports (q_lsh_recall_report): does proximity in this space
    actually predict the label? Integer-grid dot products make
    neighbor sets and votes exact, so the accuracy table is
    engine-identical, not approximately reproduced.

    Scale: the eval set is a fixed hash fraction, so cost is
    eval x corpus with the corpus never shuffling (broadcast or
    block-matrix the eval side — operators/similarity.py's BLAS path
    runs this same shape); the ANN indexes (IVF/LSH/PQ) substitute for
    the exact scan when the corpus is 100 TB.
    """
    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    qv = e.select(
        "vec_id",
        "label",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * 1000 + 0.5).cast("long")
        ).alias("v"),
    ).localCheckpoint(eager=False)
    ev = qv.filter(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 2).isin("00", "01")
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("true_label"),
        F.col("v").alias("qvv"),
    )
    idot = F.aggregate(
        F.zip_with("qvv", "v", lambda p, r: p * r),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    nn = (
        qv.crossJoin(F.broadcast(ev))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "true_label",
            "vec_id",
            F.col("label").alias("nbr_label"),
            idot.alias("s"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("s"), "vec_id")
            ),
        )
    )
    votes = (
        nn.filter(F.col("rnk") <= KNN_EVAL_K)
        .groupBy("qid", "true_label", "nbr_label")
        .agg(F.count("*").alias("cnt"))
    )
    pred = (
        votes.withColumn(
            "vr",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("cnt"), "nbr_label")
            ),
        )
        .filter(F.col("vr") == 1)
        .select("qid", "true_label", F.col("nbr_label").alias("predicted"))
    )
    return pred.groupBy(F.col("true_label").cast("long").alias("label")).agg(
        F.count("*").alias("n_eval"),
        F.sum(
            F.when(F.col("predicted") == F.col("true_label"), 1).otherwise(0)
        ).alias("n_correct"),
        F.expr(
            "(10000 * CAST(sum(CASE WHEN predicted = true_label THEN 1 ELSE 0 END)"
            " AS BIGINT)) div count(*)"
        ).alias("accuracy_bp"),
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
