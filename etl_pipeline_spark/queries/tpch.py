"""TPC-H-shaped deep-relational batch — correlated and scalar subqueries,
disjunctive pushdown, having-gated semijoins, percentile aggregates.

Adapted to the fixture schema (no partsupp table; p_retailprice*0.6
stands in for ps_supplycost, p_type values are single words). These rows
extend SURVEY §2.3-2.4 with the subquery shapes the reference's warehouse
(BigQuery) would have handled — now Catalyst's job: correlated scalar
subqueries decorrelate into aggregated joins, IN/EXISTS become semijoins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_spark.catalog import load_tables
from etl_pipeline_spark.queries.base import query


def _sql(spark: SparkSession, sf_dir: str, tables: tuple[str, ...], text: str) -> DataFrame:
    load_tables(spark, sf_dir, tables)
    return spark.sql(text)


_Q07 = """
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           EXTRACT(YEAR FROM l.l_shipdate) AS l_year,
           ROUND((CAST(SUM(CAST(ROUND((l.l_extendedprice * (1 - l.l_discount)) * 10000) AS DECIMAL(38,0))) AS DOUBLE) / 10000), 2) AS revenue
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation ns   ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc   ON c.c_nationkey = nc.n_nationkey
    WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY ns.n_name, nc.n_name, EXTRACT(YEAR FROM l.l_shipdate)
"""


@query("q07_nation_volume", oracle=_Q07, tags=("join", "tpch"))
def q07_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral shipping volume between two nations by
    year — double nation join with a symmetric pair predicate.

    Scale: nation broadcasts twice under different aliases; the fact-side
    shuffles are the usual orderkey/custkey pair.
    """
    return _sql(
        spark, sf_dir, ("lineitem", "orders", "customer", "supplier", "nation"), _Q07
    )


_Q09 = """
    SELECT n.n_name AS nation,
           EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
           ROUND((CAST(SUM(CAST(ROUND((l.l_extendedprice * (1 - l.l_discount) - p.p_retailprice * 0.6 * l.l_quantity) * 10000) AS DECIMAL(38,0))) AS DOUBLE) / 10000), 2) AS profit
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%o%'
    GROUP BY n.n_name, EXTRACT(YEAR FROM o.o_orderdate)
"""


@query("q09_product_profit", oracle=_Q09, tags=("join", "tpch"))
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per nation per year over a 5-way join with a
    LIKE filter on part names (cost proxied at 60% of retail — the
    fixtures carry no partsupp table)."""
    return _sql(spark, sf_dir, ("lineitem", "orders", "part", "supplier", "nation"), _Q09)


_Q14 = """
    SELECT ROUND(
             100.0 * (CAST(SUM(CAST(ROUND((CASE WHEN p.p_type LIKE 'PROMO%' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END) * 10000) AS DECIMAL(38,0))) AS DOUBLE) / 10000)
             / (CAST(SUM(CAST(ROUND((l.l_extendedprice * (1 - l.l_discount)) * 10000) AS DECIMAL(38,0))) AS DOUBLE) / 10000), 4) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
"""


@query("q14_promo_revenue", oracle=_Q14, tags=("join", "tpch"))
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotional revenue share — conditional aggregation over
    a broadcast part join within one shipdate month."""
    return _sql(spark, sf_dir, ("lineitem", "part"), _Q14)


_Q17 = """
    SELECT ROUND((CAST(SUM(CAST(ROUND((l.l_extendedprice) * 100) AS DECIMAL(38,0))) AS DOUBLE) / 100) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (
          SELECT 0.5 * AVG(l2.l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = p.p_partkey
      )
"""


@query("q17_small_quantity_revenue", oracle=_Q17, tags=("subquery", "tpch"))
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: CORRELATED scalar subquery (per-part average
    quantity) gating the outer scan — Catalyst decorrelates it into an
    aggregate + join, which is exactly the plan you would hand-write at
    scale."""
    return _sql(spark, sf_dir, ("lineitem", "part"), _Q17)


_Q18 = """
    SELECT c.c_name, o.o_orderkey, CAST(o.o_orderdate AS DATE) AS o_orderdate,
           ROUND(o.o_totalprice, 2) AS totalprice,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 180
    )
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
    LIMIT 20
"""


@query("q18_large_orders", oracle=_Q18, tags=("subquery", "tpch", "topk"))
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: IN-subquery with HAVING — an aggregate-filtered semijoin
    feeding a grouped top-k."""
    return _sql(spark, sf_dir, ("customer", "orders", "lineitem"), _Q18)


_Q19 = """
    SELECT ROUND((CAST(SUM(CAST(ROUND((l.l_extendedprice * (1 - l.l_discount)) * 10000) AS DECIMAL(38,0))) AS DOUBLE) / 10000), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 15 AND 35)
       OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 25 AND 50)
"""


@query("q19_disjunctive_predicates", oracle=_Q19, tags=("join", "tpch", "pushdown"))
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs across both join sides — the classic test of
    disjunctive predicate handling (Catalyst derives the common
    brand/size IN-bounds and pushes them below the join)."""
    return _sql(spark, sf_dir, ("lineitem", "part"), _Q19)


_Q22 = """
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_customers,
           ROUND((CAST(SUM(CAST(ROUND((c.c_acctbal) * 100) AS DECIMAL(38,0))) AS DOUBLE) / 100), 2) AS total_balance
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
    GROUP BY c.c_mktsegment
"""


@query("q22_idle_high_balance", oracle=_Q22, tags=("subquery", "tpch"))
def q22_idle_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global positive-balance average)
    + anti-joined NOT EXISTS with a date filter — sales-opportunity
    analysis for rich-but-recently-idle customers."""
    return _sql(spark, sf_dir, ("customer", "orders"), _Q22)


@query(
    "q_agg_percentiles",
    oracle="""
    SELECT c_mktsegment,
           ROUND(MEDIAN(c_acctbal), 2)              AS median_bal,
           ROUND(QUANTILE_CONT(c_acctbal, 0.9), 2)  AS p90_bal,
           ROUND(QUANTILE_CONT(c_acctbal, 0.1), 2)  AS p10_bal,
           ROUND(CORR(c_acctbal, c_custkey), 4)     AS corr_bal_key,
           ROUND(COVAR_SAMP(c_acctbal, c_custkey), 2) AS covar_bal_key
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("agg", "percentile", "stats"),
)
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median/p10/p90) and bivariate stats
    (corr, covar_samp) per segment — Spark's percentile() and DuckDB's
    quantile_cont share linear-interpolation semantics, verified
    bit-equal after rounding."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    return c.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 2).alias("median_bal"),
        F.round(F.expr("percentile(c_acctbal, 0.9)"), 2).alias("p90_bal"),
        F.round(F.expr("percentile(c_acctbal, 0.1)"), 2).alias("p10_bal"),
        F.round(F.corr("c_acctbal", "c_custkey"), 4).alias("corr_bal_key"),
        F.round(F.covar_samp("c_acctbal", "c_custkey"), 2).alias("covar_bal_key"),
    )


_Q08 = """
    SELECT o_year,
           ROUND((CAST(SUM(CAST(ROUND((CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) * 10000) AS DECIMAL(38,0))) AS DOUBLE) / 10000)
                 / (CAST(SUM(CAST(ROUND((volume) * 10000) AS DECIMAL(38,0))) AS DOUBLE) / 10000), 4) AS mkt_share
    FROM (
        SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               ns.n_name AS nation
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
        JOIN region r   ON nc.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) AS shares
    GROUP BY o_year
"""


@query("q08_market_share", oracle=_Q08, tags=("join", "tpch"))
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier-nation's revenue share of a region's
    market per year — ratio of conditional sums over a 7-way join."""
    return _sql(
        spark, sf_dir,
        ("lineitem", "orders", "customer", "nation", "region", "supplier"),
        _Q08,
    )


_Q10 = """
    SELECT c.c_custkey, c.c_name,
           ROUND((CAST(SUM(CAST(ROUND((l.l_extendedprice * (1 - l.l_discount)) * 10000) AS DECIMAL(38,0))) AS DOUBLE) / 10000), 2) AS revenue,
           n.n_name AS nation,
           ROUND(c.c_acctbal, 2) AS acctbal
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
"""


@query("q10_returned_revenue", oracle=_Q10, tags=("join", "tpch", "topk"))
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned the most value in a half-year —
    returned-lineitem join + grouped top-20 with full customer detail."""
    return _sql(spark, sf_dir, ("customer", "orders", "lineitem", "nation"), _Q10)


_Q12 = """
    SELECT o.o_orderpriority,
           COUNT(*) FILTER (
               WHERE DATE_DIFF('day', CAST(o.o_orderdate AS DATE),
                               CAST(l.l_shipdate AS DATE)) > 90
           ) AS late_count,
           COUNT(*) AS total_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
"""

_Q12_SPARK = """
    SELECT o.o_orderpriority,
           COUNT(CASE WHEN DATEDIFF(CAST(l.l_shipdate AS DATE),
                                    CAST(o.o_orderdate AS DATE)) > 90
                      THEN 1 END) AS late_count,
           COUNT(*) AS total_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
"""


@query("q12_late_shipments", oracle=_Q12, tags=("join", "tpch"))
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late-shipment counts per priority class (ship
    date more than 90 days after order date) — conditional counting over
    a date-arithmetic predicate. DuckDB spells day deltas DATE_DIFF('day',
    a, b); Spark DATEDIFF(b, a)."""
    return _sql(spark, sf_dir, ("orders", "lineitem"), _Q12_SPARK)


_Q15 = """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               ROUND((CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000) AS DECIMAL(38,0))) AS DOUBLE) / 10000), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@query("q15_top_supplier", oracle=_Q15, tags=("subquery", "tpch"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the quarter's top revenue supplier via a CTE reused in
    both the join and a scalar-subquery MAX over it."""
    return _sql(spark, sf_dir, ("lineitem", "supplier"), _Q15)


_Q16 = """
    SELECT p.p_brand, p.p_type,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 5, 10, 15, 20, 25)
    GROUP BY p.p_brand, p.p_type
"""


@query("q16_supplier_diversity", oracle=_Q16, tags=("join", "tpch"))
def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per part attribute
    bucket with exclusion filters (partsupp replaced by observed
    lineitem supply relationships)."""
    return _sql(spark, sf_dir, ("part", "lineitem"), _Q16)


_Q11 = """
    WITH value_by_part AS (
        SELECT l.l_partkey,
               ROUND((CAST(SUM(CAST(ROUND((p.p_retailprice * l.l_quantity) * 100) AS DECIMAL(38,0))) AS DOUBLE) / 100), 2) AS part_value
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY l.l_partkey
    )
    SELECT l_partkey, part_value
    FROM value_by_part
    WHERE part_value > (SELECT SUM(part_value) * 0.0008 FROM value_by_part)
"""


@query("q11_value_concentration", oracle=_Q11, tags=("subquery", "tpch"))
def q11_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose flowed value exceeds a fraction of
    the total — HAVING-against-scalar-subquery over the same aggregate."""
    return _sql(spark, sf_dir, ("lineitem", "part"), _Q11)


_Q02 = """
    SELECT p.p_partkey, p.p_name, l.l_suppkey,
           -- explicit half-up: price/quantity lands on exact half-cents
           -- (e.g. x.xx5 for even quantities) where library ROUNDs
           -- diverge across engines; FLOOR(x*100 + 0.5)/100 is identical
           -- IEEE arithmetic in both (first diverged at sf0.1)
           FLOOR(l.l_extendedprice / l.l_quantity * 100 + 0.5) / 100 AS unit_price
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_size BETWEEN 40 AND 50
      AND l.l_extendedprice / l.l_quantity = (
          SELECT MIN(l2.l_extendedprice / l2.l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = p.p_partkey
      )
"""


@query("q02_min_cost_supplier", oracle=_Q02, tags=("subquery", "tpch"))
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each part, the supplier(s) offering the minimal
    observed unit price — a correlated MIN subquery that Catalyst
    decorrelates into an aggregate joined back to the outer query."""
    return _sql(spark, sf_dir, ("part", "lineitem"), _Q02)


_Q20 = """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_name LIKE 'red%'
        GROUP BY l.l_suppkey
        HAVING SUM(l.l_quantity) > (
            SELECT 0.012 * SUM(l3.l_quantity)
            FROM lineitem l3 JOIN part p3 ON l3.l_partkey = p3.p_partkey
            WHERE p3.p_name LIKE 'red%'
        )
    )
"""


@query("q20_excess_shippers", oracle=_Q20, tags=("subquery", "tpch"))
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN-subquery whose HAVING compares a
    per-supplier aggregate against a scalar subquery over the same
    filtered universe (suppliers moving an outsized share of 'red'
    parts)."""
    return _sql(spark, sf_dir, ("supplier", "lineitem", "part"), _Q20)


_Q21 = """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY s.s_name
"""


@query("q21_sole_late_shipper", oracle=_Q21, tags=("subquery", "tpch"))
def q21_sole_late_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: double-correlated EXISTS + NOT EXISTS — suppliers
    who were the ONLY late shipper (>90 days after order) in
    multi-supplier finished orders. Both subqueries correlate on the
    outer lineitem's order AND reference the outer order's date."""
    return _sql(spark, sf_dir, ("supplier", "lineitem", "orders"), _Q21)


_Q04 = """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
"""


@query("q04_order_priority", oracle=_Q04, tags=("subquery", "tpch", "exists"))
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS whose predicate compares columns
    across the outer and inner tables (lineitem shipped >60 days after its
    order's date — the fixture has no commit/receipt dates, so ship-lag
    stands in for the late-delivery test). Catalyst rewrites the EXISTS
    into a left-semi join on orderkey with the lag filter above it."""
    return _sql(spark, sf_dir, ("orders", "lineitem"), _Q04)


_Q13 = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey AS c_custkey,
               COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
"""


@query("q13_order_count_distribution", oracle=_Q13, tags=("join", "tpch", "outer"))
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (the last of the 22): customer order-count
    distribution — LEFT OUTER join with a predicate INSIDE the join
    condition (non-urgent orders only; the fixture has no o_comment, so
    priority stands in for the comment anti-pattern), then a two-level
    aggregate. The outer join must preserve zero-order customers, so the
    filter cannot be pushed below the join as a WHERE.

    Scale: one shuffle on custkey for the join+first groupBy (Catalyst
    reuses the partitioning), then a tiny second agg over ~distinct
    counts; no broadcast (both sides are fact-sized at 100 TB, orders
    side map-side-filtered by the join predicate).
    """
    return _sql(spark, sf_dir, ("customer", "orders"), _Q13)
