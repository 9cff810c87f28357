"""Privacy / governance operators — the audit surface a training-data
platform needs before releasing aggregates or sharing user-derived
tables: k-anonymity / l-diversity equivalence-class auditing over
quasi-identifiers, and a differential-privacy Laplace mechanism whose
noise draw is md5-derived so the whole mechanism is bit-reproducible and
oracle-checked (the Bloom/CMS "approximate-exactly-checked" pattern
applied to DP).

Scale: both queries are single map-combinable aggregations on bounded
key grids (quasi-identifier cells; the DP group-by key), the plan shape
that holds unchanged at 100 TB. No UDFs, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_spark.catalog import load_tables
from etl_pipeline_spark.queries.base import query

K_ANON = 3  # classes smaller than this violate k-anonymity
L_DIV = 2  # classes with fewer distinct sensitive values violate l-diversity
BAL_MIN, BAL_MAX, BAL_BANDS = -1000.0, 10000.0, 8

DP_EPSILON = 0.5  # Laplace scale = sensitivity/epsilon = 2.0 for counts


@query(
    "q_k_anonymity",
    # Equivalence classes over the quasi-identifier triple
    # (nation, segment, balance band). The bucket arithmetic is the
    # explicit floor((v - min) * n / (max - min)) + 1 form so both
    # engines band identically (the q_histogram_values idiom).
    oracle=f"""
    WITH classes AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(FLOOR((c_acctbal - ({BAL_MIN})) * {BAL_BANDS} / ({BAL_MAX} - ({BAL_MIN}))) + 1 AS BIGINT)
                   AS bal_band,
               COUNT(*) AS class_size,
               COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS l_distinct
        FROM customer
        GROUP BY 1, 2, 3
    )
    SELECT c_nationkey, c_mktsegment, bal_band,
           CAST(class_size AS BIGINT) AS class_size,
           CAST(l_distinct AS BIGINT) AS l_distinct,
           CASE WHEN class_size < {K_ANON} THEN 1 ELSE 0 END AS k_violation,
           CASE WHEN l_distinct < {L_DIV} THEN 1 ELSE 0 END AS l_violation
    FROM classes
    """,
    tags=("privacy", "k-anonymity", "governance"),
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit: every equivalence class of the
    quasi-identifier triple (nation, market segment, account-balance
    band) with its size, the number of distinct sensitive values it
    carries (sensitive attribute: is-in-debt), and violation flags
    against k={K} / l={L}. The release decision (suppress, generalize,
    or publish) consumes this table.

    Scale: one aggregation keyed by the quasi grid (bounded by the
    attribute domains, ~1k cells here, never by row count) — a 100 TB
    audit is a single map-combine pass.
    """
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    band = (
        F.floor((F.col("c_acctbal") - F.lit(BAL_MIN)) * BAL_BANDS / (BAL_MAX - BAL_MIN)) + 1
    ).cast("long")
    sensitive = F.when(F.col("c_acctbal") < 0, 1).otherwise(0)
    return (
        c.select("c_nationkey", "c_mktsegment", band.alias("bal_band"), sensitive.alias("s"))
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(
            F.count("*").alias("class_size"),
            F.countDistinct("s").alias("l_distinct"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "bal_band",
            "class_size",
            "l_distinct",
            F.when(F.col("class_size") < K_ANON, 1).otherwise(0).alias("k_violation"),
            F.when(F.col("l_distinct") < L_DIV, 1).otherwise(0).alias("l_violation"),
        )
    )


q_k_anonymity.__doc__ = q_k_anonymity.__doc__.format(K=K_ANON, L=L_DIV)


def _hex32_sql(md5_arg: str) -> str:
    """32-bit integer from the first 8 hex chars of MD5(md5_arg) — the
    shared digit-sum wording (operators/simhash.py, queries/llm_ops.py)."""
    return "(" + " + ".join(
        f"(INSTR('0123456789abcdef', SUBSTR(MD5({md5_arg}), {i + 1}, 1)) - 1)"
        f" * CAST({16 ** (8 - 1 - i)} AS BIGINT)"
        for i in range(8)
    ) + ")"


@query(
    "q_dp_noisy_counts",
    # Laplace mechanism with a DETERMINISTIC draw: u = md5_32(key)/2^32
    # - 0.5 maps through the Laplace inverse CDF -b*sign(u)*ln(1-2|u|).
    # Both engines derive the identical u, so the noisy release is
    # reproducible and the oracle checks the mechanism end to end
    # (production swaps u for a secure RNG; everything else is the same
    # plan). ln() is the only non-IEEE-exact step; ROUND(4) of values
    # O(1) makes a cross-engine ulp flip vanishingly improbable.
    oracle=f"""
    WITH g AS (
        SELECT o_orderpriority, COUNT(*) AS cnt FROM orders GROUP BY o_orderpriority
    ),
    u AS (
        SELECT o_orderpriority, cnt,
               ({_hex32_sql("o_orderpriority || '#dp'")} / 4294967296.0) - 0.5 AS u
        FROM g
    )
    SELECT o_orderpriority,
           CAST(cnt AS BIGINT) AS exact_cnt,
           ROUND(-(1.0 / {DP_EPSILON}) * SIGN(u) * LN(1 - 2 * ABS(u)), 4) AS laplace_noise,
           ROUND(cnt - (1.0 / {DP_EPSILON}) * SIGN(u) * LN(1 - 2 * ABS(u)), 4) AS noisy_cnt
    FROM u
    """,
    tags=("privacy", "differential-privacy", "approx-exactly-checked"),
)
def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private order counts by priority via the Laplace
    mechanism (sensitivity 1, epsilon {EPS}): exact count, the Laplace
    noise drawn through the inverse CDF from an md5-uniform, and the
    noisy release. The deterministic draw exists so the mechanism is
    testable — swap it for a secure RNG per release in production.

    Scale: a count per group plus a per-group scalar expression — the
    noise add is free at any scale; the group key bounds the output.
    """
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    g = o.groupBy("o_orderpriority").agg(F.count("*").alias("cnt"))
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("o_orderpriority"), F.lit("#dp"))), 1, 8),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
        - 0.5
    )
    noise = -(1.0 / DP_EPSILON) * F.signum(u) * F.log(1 - 2 * F.abs(u))
    return g.select(
        "o_orderpriority",
        F.col("cnt").alias("exact_cnt"),
        F.round(noise, 4).alias("laplace_noise"),
        F.round(F.col("cnt") + noise, 4).alias("noisy_cnt"),
    )


q_dp_noisy_counts.__doc__ = q_dp_noisy_counts.__doc__.format(EPS=DP_EPSILON)


# --- Consistent pseudonymization ---------------------------------------------

PSEUDO_SALT = "corp-2026"  # deployment-secret salt; fixed here for the oracle


@query(
    "q_pseudonymize_consistent",
    # The tokenization audit: the same salted-hash token function applied
    # independently on both sides of a relation must preserve join
    # cardinalities exactly — the property that makes pseudonymized data
    # shareable without the key table. Verified per event_type against
    # the raw-key join counts.
    oracle=f"""
    WITH tok_e AS (
        SELECT SUBSTR(MD5('{PSEUDO_SALT}' || CAST(user_id AS VARCHAR)), 1, 16) AS utoken,
               event_type
        FROM events
    ),
    tok_c AS (
        SELECT SUBSTR(MD5('{PSEUDO_SALT}' || CAST(c_custkey AS VARCHAR)), 1, 16) AS utoken
        FROM customer
    ),
    tok_join AS (
        SELECT e.event_type, COUNT(*) AS n_tok
        FROM tok_e e JOIN tok_c c ON e.utoken = c.utoken
        GROUP BY e.event_type
    ),
    raw_join AS (
        SELECT e.event_type, COUNT(*) AS n_raw
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY e.event_type
    )
    SELECT t.event_type,
           CAST(t.n_tok AS BIGINT) AS n_joined_tokenized,
           CAST(r.n_raw AS BIGINT) AS n_joined_raw,
           CASE WHEN t.n_tok = r.n_raw THEN 1 ELSE 0 END AS cardinality_preserved
    FROM tok_join t JOIN raw_join r ON t.event_type = r.event_type
    """,
    tags=("privacy", "pseudonymization", "governance"),
)
def q_pseudonymize_consistent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymization consistency audit: user keys are replaced by
    salted-hash tokens independently in the fact (events) and dimension
    (customer) tables, and the audit proves the tokenized join
    reproduces the raw join's cardinalities per event type — the
    invariant that lets two parties share pseudonymized extracts and
    still join them. Production holds the salt in a secret store; the
    fixed salt here exists so the oracle can reproduce the tokens.

    Scale: tokenization is a narrow per-row expression (no shuffle); the
    audit joins are the same broadcast-dimension equi-joins the raw keys
    take — tokens are uniform 64-bit-entropy strings, so no skew is
    introduced.
    """
    t = load_tables(spark, sf_dir, ("events", "customer"))
    tok = lambda c: F.substring(F.md5(F.concat(F.lit(PSEUDO_SALT), c.cast("string"))), 1, 16)  # noqa: E731
    tok_e = t["events"].select(tok(F.col("user_id")).alias("utoken"), "event_type")
    tok_c = t["customer"].select(tok(F.col("c_custkey")).alias("utoken"))
    tok_join = (
        tok_e.join(F.broadcast(tok_c), "utoken")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_joined_tokenized"))
    )
    raw_join = (
        t["events"]
        .join(
            F.broadcast(t["customer"].select(F.col("c_custkey").alias("user_id"))),
            "user_id",
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("n_joined_raw"))
    )
    return tok_join.join(raw_join, "event_type").select(
        "event_type",
        "n_joined_tokenized",
        "n_joined_raw",
        F.when(F.col("n_joined_tokenized") == F.col("n_joined_raw"), 1)
        .otherwise(0)
        .alias("cardinality_preserved"),
    )


# --- Erasure-cascade audit ----------------------------------------------------

ERASE_MOD = 97  # fixture stand-in for the erasure-request list


@query(
    "q_erasure_cascade",
    # Deletion propagation through the FK graph: erasure subjects are
    # customers with c_custkey % 97 == 0 (a deterministic stand-in for
    # the request table); orders cascade by custkey, lineitem cascades
    # THROUGH orders, events match on user_id. The audit is the
    # before/after row accounting a data-protection officer signs off.
    oracle=f"""
    WITH subjects AS (
        SELECT c_custkey AS k FROM customer WHERE c_custkey % {ERASE_MOD} = 0
    ),
    doomed_orders AS (
        SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT k FROM subjects)
    )
    SELECT 'customer' AS table_name,
           (SELECT COUNT(*) FROM customer) AS n_rows,
           (SELECT COUNT(*) FROM customer WHERE c_custkey IN (SELECT k FROM subjects)) AS n_erased,
           (SELECT COUNT(*) FROM customer WHERE c_custkey NOT IN (SELECT k FROM subjects)) AS n_remaining
    UNION ALL
    SELECT 'orders',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM doomed_orders),
           (SELECT COUNT(*) FROM orders) - (SELECT COUNT(*) FROM doomed_orders)
    UNION ALL
    SELECT 'lineitem',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM doomed_orders)),
           (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM doomed_orders))
    UNION ALL
    SELECT 'events',
           (SELECT COUNT(*) FROM events),
           (SELECT COUNT(*) FROM events WHERE user_id IN (SELECT k FROM subjects)),
           (SELECT COUNT(*) FROM events WHERE user_id NOT IN (SELECT k FROM subjects))
    """,
    tags=("privacy", "erasure", "governance", "anti-join"),
)
def q_erasure_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure cascade audit: given the erasure-subject list,
    the rows each table loses — directly (customer, events), via the FK
    (orders), and transitively through two hops (lineitem via orders) —
    with before/after counts per table. Run BEFORE the delete as the
    blast-radius report and AFTER (expecting n_erased = 0) as the
    compliance proof.

    Scale: subjects and the doomed-order key set are broadcast
    semi-/anti-join filters — the delete itself uses the identical
    plan shape with a rewrite sink. Nothing scans more than once per
    table; the two-hop cascade reuses the doomed-orders key set.
    """
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem", "events"))
    subjects = (
        t["customer"]
        .filter(F.col("c_custkey") % ERASE_MOD == 0)
        .select(F.col("c_custkey").alias("k"))
        .localCheckpoint(eager=False)
    )
    doomed_orders = (
        t["orders"]
        .join(F.broadcast(subjects), t["orders"]["o_custkey"] == subjects["k"], "left_semi")
        .select("o_orderkey")
        .localCheckpoint(eager=False)
    )

    def audit(label: str, df, key_col: str, keys, keys_col: str):
        erased = df.join(
            F.broadcast(keys), df[key_col] == keys[keys_col], "left_semi"
        ).agg(F.count("*").alias("n_erased"))
        total = df.agg(F.count("*").alias("n_rows"))
        return (
            total.crossJoin(erased)
            .select(
                F.lit(label).alias("table_name"),
                "n_rows",
                "n_erased",
                (F.col("n_rows") - F.col("n_erased")).alias("n_remaining"),
            )
        )

    rows = [
        audit("customer", t["customer"], "c_custkey", subjects, "k"),
        audit("orders", t["orders"], "o_custkey", subjects, "k"),
        audit("lineitem", t["lineitem"], "l_orderkey", doomed_orders, "o_orderkey"),
        audit("events", t["events"], "user_id", subjects, "k"),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
