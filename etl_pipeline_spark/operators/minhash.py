"""Cross-engine-checkable MinHash-LSH — SURVEY.md §2.12 X2.

Unlike Spark ML's MinHashLSH (engine-specific hash family → rows-only
check), this MinHash is built from md5 like operators/simhash.py, so the
signatures, the banded candidate join AND the estimated Jaccard are all
bit-identical in DuckDB and value-hash-checked:

  h(s)         = (first 12 hex chars of md5(shingle) as 48-bit int) mod M
  h_i(s)       = (A[i] * h(s) + B[i]) mod M,   M = 2^31 - 1 (Carter-Wegman)
  sig_i(doc)   = min over the doc's distinct shingles of h_i(s),  i < 16
  band_j(doc)  = (sig_{2j}, sig_{2j+1}) as one join key,          j < 8
  candidates   = pairs sharing ANY band (union of 8 equi-joins)
  est_jaccard  = (# of matching signature components) / 16,  kept >= 0.4

Banding is 8 bands x 2 rows — the same S-curve as the flagship xxhash
LSH (queries/dedup.py LSH_BANDS/LSH_ROWS): knee (1/8)^(1/2) ~= 0.354,
true-pair miss probability (1-j^2)^8 = 2.8e-4 at j = 0.8, the observed
fixture floor. The original 4 bands x 4 rows put the knee at
(1/4)^(1/4) ~= 0.707 and deterministically MISSED the sf0.1 floor pair
(doc 1568/2466, j = 0.8, recall 0.9961) — found by the r11 recall gate
(tools/recall_gate.py); both engines agreed on the low-recall candidate
set, so no oracle could see it.

Scale: the signature build is one groupBy(doc) over the shingle explode
(16 mins computed as parallel aggregates, no extra explode); the banded
join is the standard sub-quadratic LSH candidate generation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_spark.catalog import load_tables

N_HASHES = 16
N_BANDS = 8
ROWS_PER_BAND = N_HASHES // N_BANDS
HEX_CHARS = 12  # 48-bit values
EST_JACCARD_MIN = 0.4
SHINGLE_WIDTH = 3

_DIGIT = "(INSTR('0123456789abcdef', SUBSTR({md5}, {pos}, 1)) - 1)"


def _hex48(md5_expr: str) -> str:
    terms = [
        f"{_DIGIT.format(md5=md5_expr, pos=i + 1)} * CAST({16 ** (HEX_CHARS - 1 - i)} AS BIGINT)"
        for i in range(HEX_CHARS)
    ]
    return "(" + " + ".join(terms) + ")"


# Token array hoisted into a subquery: referencing split(text) inline
# re-evaluates it per transform element (O(tokens^2) per doc — measured
# 2.8 s vs 0.43 s cold on the sf0.01 shingle stream; see
# functions/shingles.py for the DataFrame-side twin of this fix).
_SPARK_SHINGLES = f"""
    SELECT doc_id, explode(array_distinct(transform(
        sequence(0, size(toks) - {SHINGLE_WIDTH}),
        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])
    ))) AS shingle
    FROM (SELECT doc_id, split(text, ' ') AS toks FROM documents)
    WHERE size(toks) >= {SHINGLE_WIDTH}
"""

_DUCK_SHINGLES = f"""
    SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
        GENERATE_SERIES(1, LEN(STRING_SPLIT(text, ' ')) - {SHINGLE_WIDTH - 1}),
        i -> STRING_SPLIT(text, ' ')[i] || ' ' || STRING_SPLIT(text, ' ')[i+1]
             || ' ' || STRING_SPLIT(text, ' ')[i+2]
    ))) AS shingle
    FROM documents
    WHERE LEN(STRING_SPLIT(text, ' ')) >= {SHINGLE_WIDTH}
"""


# Carter-Wegman permutation constants for the 16 signature components:
# h_i(x) = (A[i] * x + B[i]) mod M over the md5-derived base hash. Fixed
# literals (not runtime-generated) so the SQL text — and therefore the
# signatures — is identical across engines and across runs. M is the
# Mersenne prime 2^31 - 1; a*(x mod M) + b < 2^62 so ANSI-mode BIGINT
# arithmetic cannot overflow.
_CW_M = 2_147_483_647
# Components 16-31 (r11) extend the family for the 32-permutation
# streaming-parity signature (streaming/neardup.py NUM_PERM=32); the
# first 16 are untouched so every 16-perm oracle string is byte-stable.
_CW_A = (
    1203248318, 394002377, 1482917898, 973360097,
    560837743, 2122300865, 301051916, 1293086247,
    1791290746, 848363558, 76474139, 1901561757,
    489225455, 1022665331, 1659357897, 232127078,
    1085920612, 879187131, 899922483, 1555219523,
    1193281379, 1517107591, 2020979363, 1757983499,
    2043819091, 2032283419, 1720704083, 1752593550,
    805568952, 160440960, 1084057740, 1632057858,
)
_CW_B = (
    1853245938, 1336713364, 525125949, 1875781527,
    200612970, 1540929600, 632843609, 1897252314,
    1230667493, 287295574, 1976316105, 762912539,
    1070763739, 335844348, 60709060, 1586958406,
    342306680, 717777934, 613934333, 183351642,
    246949543, 1374813416, 1584347247, 615055284,
    920348541, 979897161, 1413175306, 936388165,
    162627457, 1930014342, 557147990, 1293990660,
)


def _sig_cte(engine: str, n_hashes: int = N_HASHES) -> str:
    """One md5 per shingle, then 16 integer universal-hash mixes.

    The original family hashed every shingle 16 times
    (md5('<i>|'+shingle)) and decoded 12 hex digits per hash — 16 string
    hashes + 192 string ops per shingle, which dominated the signature
    build (~13 s of q_lsh_recall_report's 21.8 s at sf0.01, BOTH
    engines). Now the string is hashed and hex-decoded ONCE into a
    48-bit base value, and each component is a Carter-Wegman mix
    (A[i]*(h mod M) + B[i]) mod M — pure 64-bit arithmetic, identical
    SQL text in Spark and DuckDB so signatures stay value-hash-checked.
    The mod-M fold narrows the shingle space to 31 bits; collisions
    merge shingles CONSISTENTLY on both engines (same function), so the
    oracle remains exact and the Jaccard-estimate perturbation is the
    same epsilon class as MinHash sampling error itself."""
    shingles = _SPARK_SHINGLES if engine == "spark" else _DUCK_SHINGLES
    min_exprs = [
        f"MIN(({_CW_A[i]} * h + {_CW_B[i]}) % {_CW_M}) AS m{i}"
        for i in range(n_hashes)
    ]
    mins = ",\n           ".join(min_exprs)
    return f"""
    shingles AS ({shingles}),
    hashed AS (
        SELECT doc_id, {_hex48("md5(shingle)")} % {_CW_M} AS h FROM shingles
    ),
    sig AS (
        SELECT doc_id,
           {mins}
        FROM hashed GROUP BY doc_id
    )
    """


def minhash_signatures_sql(engine: str, n_hashes: int = N_HASHES) -> str:
    cols = ", ".join(f"m{i}" for i in range(n_hashes))
    return (
        f"WITH {_sig_cte(engine, n_hashes)} SELECT doc_id, {cols} FROM sig"
    )


def md5_minhash_components(shingles: Column, n_perm: int) -> Column:
    """Column-side twin of the md5 Carter-Wegman SQL family: signature
    component i is MIN over the shingle array of
    ``(A[i] * (hex48(md5(s)) % M) + B[i]) % M`` — bit-identical to
    :func:`_sig_cte`'s aggregate on the same shingle set (pinned by
    test), so operators built from Column expressions (the streaming
    near-dup family switch) stay DuckDB-cross-checkable. Returns
    array<bigint>, length ``n_perm`` (<= 32 constants available)."""
    if n_perm > len(_CW_A):
        raise ValueError(f"md5 family has {len(_CW_A)} components, not {n_perm}")
    a_arr = F.array(*[F.lit(a) for a in _CW_A[:n_perm]])
    b_arr = F.array(*[F.lit(b) for b in _CW_B[:n_perm]])
    hashed = F.transform(
        shingles,
        lambda s: F.conv(F.substring(F.md5(s), 1, HEX_CHARS), 16, 10).cast(
            "bigint"
        )
        % _CW_M,
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_perm - 1)),
        lambda p: F.array_min(
            F.transform(
                hashed,
                lambda h: (
                    F.element_at(a_arr, p + 1) * h
                    + F.element_at(b_arr, p + 1)
                )
                % F.lit(_CW_M),
            )
        ),
    )


def _pairs_over_sig(sig_table: str) -> str:
    """Banded join + estimated-jaccard filter over a signatures relation
    (engine-independent text)."""
    band_joins = "\n        UNION\n        ".join(
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        + ", ".join(
            f"a.m{i} AS am{i}, b.m{i} AS bm{i}" for i in range(N_HASHES)
        )
        + f"""
            FROM {sig_table} a JOIN {sig_table} b
              ON """
        + " AND ".join(
            f"a.m{ROWS_PER_BAND * j + r} = b.m{ROWS_PER_BAND * j + r}"
            for r in range(ROWS_PER_BAND)
        )
        + "\n             AND a.doc_id < b.doc_id"
        for j in range(N_BANDS)
    )
    matches = " + ".join(
        f"(CASE WHEN am{i} = bm{i} THEN 1 ELSE 0 END)" for i in range(N_HASHES)
    )
    return f"""
    SELECT doc_a, doc_b,
           ROUND(({matches}) / CAST({N_HASHES} AS DOUBLE), 4) AS est_jaccard
    FROM ({band_joins})
    WHERE ({matches}) / CAST({N_HASHES} AS DOUBLE) >= {EST_JACCARD_MIN}
    """


def minhash_pairs_sql_duckdb() -> str:
    return f"WITH {_sig_cte('duckdb')} {_pairs_over_sig('sig')}"


def xxhash_minhash_components(shingles: Column, n_perm: int) -> Column:
    """The xxhash64 MinHash family shared by the batch LSH candidate
    generator (queries/dedup.py:minhash_docs_and_candidates) and the
    streaming near-dup operator (streaming/neardup.py): permutation p is
    ``xxhash64(shingle, p)`` — the permutation index rides as a second
    hashed column — and component p of the signature is the min over the
    document's distinct shingles. Returns array<bigint>, length n_perm.

    This family is NOT cross-engine (DuckDB has no Spark-compatible
    xxhash64), which is fine for both consumers: the batch LSH query's
    oracle is the EXACT near-dup SQL (candidates are verified with true
    Jaccard before emission), and the streaming operator is pinned
    against a batch recompute of these very expressions. The md5 family
    above exists for the queries whose ORACLE must reproduce the
    signatures themselves.

    Each shingle string is hashed ONCE; the n_perm permutations then
    hash the resulting long — 1 string hash + n_perm long hashes per
    shingle instead of n_perm string hashes, which is where the
    signature time goes at n_perm=16-32 (shingles average ~20 chars).
    """
    return xxhash_minhash_from_hashed(
        F.transform(shingles, lambda s: F.xxhash64(s)), n_perm
    )


def xxhash_minhash_from_hashed(hashed: Column, n_perm: int) -> Column:
    """Signature components from PRE-HASHED shingles (array<bigint> of
    xxhash64(shingle)) — for callers that keep the hashed shingle array
    around anyway (the batch LSH verify pre-filter does exact Jaccard
    over it). Identical output to xxhash_minhash_components on the same
    shingle set."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_perm - 1)),
        lambda p: F.array_min(F.transform(hashed, lambda h: F.xxhash64(h, p))),
    )


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("documents",))
    return spark.sql(minhash_signatures_sql("spark"))


def minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side materializes signatures once (cache + view) so the
    8-band UNION does not rebuild them per branch."""
    load_tables(spark, sf_dir, ("documents",))
    sig = spark.sql(minhash_signatures_sql("spark")).cache()
    sig.createOrReplaceTempView("minhash_sig")
    sig.count()
    return spark.sql(_pairs_over_sig("minhash_sig"))
