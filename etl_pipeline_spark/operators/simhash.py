"""SimHash near-duplicate detection — SURVEY.md §2.12 X2 (BASELINE.json
"SimHash"), oracle-checkable by construction.

A 48-bit SimHash per document, built exclusively from functions whose
results are bit-identical in Spark SQL and DuckDB (md5, instr, substr,
integer arithmetic, & / bit_count) — so both the per-doc signatures AND
the banded near-dup pairs are value-hash-checked against the oracle,
which is unusual for hash-family operators.

Construction:
  token hash  h(t)   = first 12 hex chars of md5(t) as a 48-bit integer
  bit_b sum   s_b    = sum over distinct tokens of +-1 by bit b of h(t)
  simhash     S      = sum of 2^b where s_b > 0
  candidates         = equi-join on any of 4 12-bit bands (masked equality)
  near-dups          = candidates with popcount(S_a xor S_b) <= max_hamming

Scale: the banded self-join is the classic Hamming-LSH: shuffle key =
(band mask value), sub-quadratic; per-doc signature build is one shuffle
(groupBy doc_id) over the token explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_spark.catalog import load_tables

N_BITS = 48
HEX_CHARS = N_BITS // 4  # 12
N_BANDS = 4
BAND_BITS = N_BITS // N_BANDS  # 12
MAX_HAMMING = 6

# digit value of one lowercase hex char — identical wording in both engines
_DIGIT = "(INSTR('0123456789abcdef', SUBSTR(md5(token), {pos}, 1)) - 1)"


def _h_expr() -> str:
    """48-bit integer from the first 12 hex chars of md5(token)."""
    terms = [
        f"{_DIGIT.format(pos=i + 1)} * CAST({16 ** (HEX_CHARS - 1 - i)} AS BIGINT)"
        for i in range(HEX_CHARS)
    ]
    return "(" + " + ".join(terms) + ")"


def _simhash_cte(tokens_select: str) -> str:
    """Shared CTE text computing (doc_id, simhash); ``tokens_select`` is the
    only engine-specific piece (explode vs UNNEST)."""
    bit_sums = ",\n               ".join(
        f"SUM(CASE WHEN (h & CAST({1 << b} AS BIGINT)) != 0 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(N_BITS)
    )
    final = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for b in range(N_BITS)
    )
    return f"""
    toks AS ({tokens_select}),
    th AS (SELECT doc_id, {_h_expr()} AS h FROM toks),
    bits AS (
        SELECT doc_id,
               {bit_sums}
        FROM th GROUP BY doc_id
    ),
    sim AS (SELECT doc_id, {final} AS simhash FROM bits)
    """


# Feature set: distinct word 3-gram shingles (NOT unigrams — on low-vocab
# corpora unigram token sets collide massively and SimHash loses all
# discriminative power; shingles carry word order and local context).
_SHINGLE_WIDTH = 3

# Token array hoisted into a subquery — inline split re-evaluates per
# transform element, O(tokens^2)/doc (see functions/shingles.py).
_SPARK_TOKENS = f"""
    SELECT doc_id, explode(array_distinct(transform(
        sequence(0, size(toks) - {_SHINGLE_WIDTH}),
        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])
    ))) AS token
    FROM (SELECT doc_id, split(lower(text), ' ') AS toks FROM documents)
    WHERE size(toks) >= {_SHINGLE_WIDTH}
"""
_DUCK_TOKENS = f"""
    SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
        GENERATE_SERIES(1, LEN(STRING_SPLIT(LOWER(text), ' ')) - {_SHINGLE_WIDTH - 1}),
        i -> STRING_SPLIT(LOWER(text), ' ')[i] || ' ' ||
             STRING_SPLIT(LOWER(text), ' ')[i+1] || ' ' ||
             STRING_SPLIT(LOWER(text), ' ')[i+2]
    ))) AS token
    FROM documents
    WHERE LEN(STRING_SPLIT(LOWER(text), ' ')) >= {_SHINGLE_WIDTH}
"""


def simhash_sql(engine: str) -> str:
    """Per-document 48-bit SimHash signatures."""
    tokens = _SPARK_TOKENS if engine == "spark" else _DUCK_TOKENS
    return f"WITH {_simhash_cte(tokens)} SELECT doc_id, simhash FROM sim"


def simhash_pairs_sql(engine: str) -> str:
    """Banded candidate join + Hamming filter.

    4 bands of 12 bits; a pair is a candidate when ANY band matches
    (union of 4 equi-joins — no OR-join nested loop); survivors filter on
    popcount of the XOR. DuckDB spells xor as a function, Spark as ``^``.
    """
    tokens = _SPARK_TOKENS if engine == "spark" else _DUCK_TOKENS
    xor = "(sim_a ^ sim_b)" if engine == "spark" else "xor(sim_a, sim_b)"
    band_joins = "\n        UNION\n        ".join(
        f"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.simhash AS sim_a, b.simhash AS sim_b
            FROM sim a JOIN sim b
              ON (a.simhash & CAST({((1 << BAND_BITS) - 1) << (i * BAND_BITS)} AS BIGINT)) =
                 (b.simhash & CAST({((1 << BAND_BITS) - 1) << (i * BAND_BITS)} AS BIGINT))
             AND a.doc_id < b.doc_id"""
        for i in range(N_BANDS)
    )
    return f"""
    WITH {_simhash_cte(tokens)},
    cand AS (
        {band_joins}
    )
    SELECT doc_a, doc_b, CAST(bit_count({xor}) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count({xor}) <= {MAX_HAMMING}
    """


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("documents",))
    return spark.sql(simhash_sql("spark"))


def simhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark plans WITH-CTEs by inlining, so the 4-branch band UNION would
    recompute the signature build 8 times; materialize signatures once
    (cache + temp view), then run the banded join SQL over the view."""
    from pyspark.sql import functions as F

    load_tables(spark, sf_dir, ("documents",))
    sig = spark.sql(simhash_sql("spark")).cache()
    sig.createOrReplaceTempView("sim_signatures")
    sig.count()  # force materialization before the self-joins
    band_joins = "\n        UNION\n        ".join(
        f"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.simhash AS sim_a, b.simhash AS sim_b
            FROM sim_signatures a JOIN sim_signatures b
              ON (a.simhash & CAST({((1 << BAND_BITS) - 1) << (i * BAND_BITS)} AS BIGINT)) =
                 (b.simhash & CAST({((1 << BAND_BITS) - 1) << (i * BAND_BITS)} AS BIGINT))
             AND a.doc_id < b.doc_id"""
        for i in range(N_BANDS)
    )
    return spark.sql(
        f"""
        SELECT doc_a, doc_b, CAST(bit_count(sim_a ^ sim_b) AS BIGINT) AS hamming
        FROM ({band_joins})
        WHERE bit_count(sim_a ^ sim_b) <= {MAX_HAMMING}
        """
    )
