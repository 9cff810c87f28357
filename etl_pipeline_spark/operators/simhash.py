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
# Pigeonhole EXACTNESS contract (r11): with N_BANDS equality bands, a
# pair at Hamming distance d <= N_BANDS - 1 cannot touch every band, so
# at least one band matches and the pair is GUARANTEED a candidate —
# recall at the threshold is structural, not tuned (Manku, Jain & Das
# Sarma, WWW 2007 use the same k=3 radius on 64-bit fingerprints). The
# previous MAX_HAMMING=6 silently exceeded the guarantee: pairs at d in
# 4..6 could spread their bits across all 4 bands and were in fact
# missed on the fixtures (1/25 truth pairs at sf0.01, 18/243 at sf0.1,
# both engines agreeing — found by this round's knee-vs-contract
# defect-class sweep). Exactness at d=6 would need >= 7 bands of <= 7
# bits, whose 2^-7 per-band collision rate makes the candidate join
# effectively quadratic at scale — the radius moves to the guarantee,
# not the guarantee to the radius.
MAX_HAMMING = N_BANDS - 1  # 3

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


def pairs_over_signatures_sql(sim_table: str, engine: str) -> str:
    """Banded join + Hamming filter over any (doc_id, simhash) relation —
    engine-independent text except the xor spelling. Exposed separately
    so the pigeonhole-exactness property can be tested on PLANTED
    signatures at exact Hamming distances (tests/test_r4b_operators.py),
    not only on hashed fixture text."""
    xor = "(sim_a ^ sim_b)" if engine == "spark" else "xor(sim_a, sim_b)"
    band_joins = "\n        UNION\n        ".join(
        f"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.simhash AS sim_a, b.simhash AS sim_b
            FROM {sim_table} a JOIN {sim_table} b
              ON (a.simhash & CAST({((1 << BAND_BITS) - 1) << (i * BAND_BITS)} AS BIGINT)) =
                 (b.simhash & CAST({((1 << BAND_BITS) - 1) << (i * BAND_BITS)} AS BIGINT))
             AND a.doc_id < b.doc_id"""
        for i in range(N_BANDS)
    )
    return f"""
    SELECT doc_a, doc_b, CAST(bit_count({xor}) AS BIGINT) AS hamming
    FROM (
        {band_joins}
    )
    WHERE bit_count({xor}) <= {MAX_HAMMING}
    """


def simhash_pairs_sql(engine: str) -> str:
    """Banded candidate join + Hamming filter.

    4 bands of 12 bits; a pair matches when ANY band matches (union of
    4 equi-joins — no OR-join nested loop); survivors filter on
    popcount of the XOR, whose <= MAX_HAMMING = N_BANDS - 1 threshold
    makes the output EXACTLY the pairs within the Hamming radius (see
    the pigeonhole note at MAX_HAMMING). DuckDB spells xor as a
    function, Spark as ``^``.
    """
    tokens = _SPARK_TOKENS if engine == "spark" else _DUCK_TOKENS
    return f"""
    WITH {_simhash_cte(tokens)}
    {pairs_over_signatures_sql('sim', engine)}
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
    return spark.sql(pairs_over_signatures_sql("sim_signatures", "spark"))
