"""Adversarial-content robustness — the r8 campaign, pinned.

A production corpus at 100 TB always contains poison records: empty /
sub-shingle-width / unicode / control-character / NULL documents,
zero-norm or 1e30-magnitude embeddings, malformed JSON props, 1e18
event values. Under Spark 4's default ANSI mode each of those was a
whole-job kill (DIVIDE_BY_ZERO on cosine norms, ARITHMETIC_OVERFLOW on
integer-grid quantization, CAST_INVALID_INPUT on JSON extracts, UDF
crashes on NULL text) until r8 hardened every reachable site — see
functions/grid.py and tools/make_adversarial_fixture.py.

This test rebuilds the adversarial fixture and runs one representative
query per crash class END TO END with ``collect()``. collect, NOT
count: count() lets Catalyst prune the very projection that crashes
(that pruning hid the MAD divide-by-zero during the original triage).

The full cross-engine gate (every query vs its DuckDB oracle on the
adversarial fixture) is the slower tool run:
    python tools/make_adversarial_fixture.py && \
    python tools/check_oracle.py --sf-dir .fuzzdata/sfadv
As of r12 there are NO waived queries on the adversarial fixture:
q_embedding_centroid_health (the former documented IEEE fold-order
exception) is order-stable via functions/grid.py::stable_round while
still surfacing the 1e30 outlier (test below).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as contract

# one per hardened crash class; all complete in ~1-3 s each at this SF
ADV_QUERIES = [
    "q_knn_bruteforce_cosine",     # try_divide: zero-norm cosine
    "q_knn_ivf",                   # try_divide inside IVF re-rank
    "q_dedup_embedding_cosine",    # try_divide: blocked self-join cosine
    "q_semdedup_clusters",         # sat_quantize: centroid integer sums
    "q_kmeans_lloyd",              # sat_quantize: 1e30 embedding grid
    "q_dbscan_classify",           # sat_quantize: floor-saturation parity
    "q_mmr_rerank",                # sat_quantize: integer dot products
    "q_pca_top_component",         # sat_quantize + try_divide loadings
    "q_scalar_json_props",         # try_cast: '$.k' = [] / malformed JSON
    "q_variant_json_stats",        # try_parse_json: malformed VARIANT
    "q_scalar_regexp_extract",     # try_cast: empty regexp extract
    "q_join_salted_skew",          # milli-unit clamp before BIGINT cast
    "q_interval_concurrency",      # clamped value-derived durations
    "q_interval_window_join",      # clamped exact-cents window sums
    "q_time_weighted_average",     # sat_quantize cents * hold_ms
    "q_dq_outlier_mad",            # try_divide MAD=0; NULL -> not-outlier
    "q_dq_ks_drift",               # try_divide: one-sided ECDF
    "q_embedding_quantization",    # try_divide: zero int8 scale
    "q_stratified_sample",         # NULL lang -> default stratum
    "q_multimodal_features",       # NULL text -> NULL payload, null row
    "q_multimodal_frame_sample",   # NULL payload skipped in frame walk
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    from tools.make_adversarial_fixture import build

    out = tmp_path_factory.mktemp("sfadv")
    build(out)
    return str(out)


@pytest.mark.parametrize("name", ADV_QUERIES)
def test_adversarial_query_collects(spark, adv_dir, name):
    rows = contract.queries()[name](spark, adv_dir).collect()
    assert rows is not None  # completing the collect IS the assertion


def test_streaming_signature_on_adversarial_texts(spark, adv_dir):
    """The streaming minhash signature (the original r7-advice crash:
    ANSI element_at past the array end) over every adversarial text."""
    from pyspark.sql import functions as F

    from etl_pipeline_spark.catalog import load_tables
    from etl_pipeline_spark.streaming.neardup import NUM_PERM, minhash_signature

    d = load_tables(spark, adv_dir, ("documents",))["documents"]
    rows = (
        d.filter(F.col("text").isNotNull())
        .select(minhash_signature(F.col("text")).alias("sig"))
        .collect()
    )
    assert all(len(r["sig"]) == NUM_PERM for r in rows)


def test_embedding_contract_flags_adversarial_rows(spark, adv_dir):
    """The ingest validator must FLAG the adversarial embedding rows:
    the zero vector, the 1e30-magnitude vector (out of the integer-grid
    bound), the NULL vector and the 70-dim drift vector (r9 wave 3, the
    advisor's find: these branches were previously attested only at
    zero) — and nothing spuriously on the clean majority."""
    r = contract.queries()["q_dq_embedding_contract"](spark, adv_dir).collect()[0]
    assert r.modal_dim == 64
    assert r.n_zero_norm == 1           # the all-zeros vector
    assert r.n_out_of_grid >= 1         # the 1e30 vector
    assert r.n_null == 1                # the NULL embedding
    assert r.n_dim_violations == 1      # the 70-dim drift vector
    assert r.n_clean == r.n_vecs - r.n_null - r.n_dim_violations \
        - r.n_nonfinite - r.n_zero_norm - r.n_out_of_grid + \
        0  # defect classes are disjoint on this fixture


def test_embedding_door_admits_only_conforming_rows(spark, adv_dir):
    """catalog.embedding_door is the consumers' contract gate: on the
    adversarial fixture it must drop exactly the NULL and 70-dim rows
    and keep everything else (including the zero / 1e30 poison vectors,
    which conform dimensionally and are handled by try_divide /
    sat_quantize downstream)."""
    from etl_pipeline_spark.catalog import embedding_door, load_tables

    e = load_tables(spark, adv_dir, ("embeddings",))["embeddings"]
    total = e.count()
    kept = embedding_door(e).count()
    assert total - kept == 2


def test_embedding_contract_flags_dim_and_nan(spark):
    """Defect classes the shared fixture deliberately does not plant
    (they would break the fixed-dim contract for every ANN consumer):
    a wrong-dimension vector and a NaN component, probed inline."""
    import math

    from etl_pipeline_spark.queries.similarity import q_dq_embedding_contract

    rows = [
        (1, [1.0] * 8, 0),
        (2, [2.0] * 8, 1),
        (3, [3.0] * 8, 2),
        (4, [1.0, 2.0, 3.0], 3),                # dim violation (vs modal 8)
        (5, [float("nan")] + [1.0] * 7, 4),     # non-finite component
        (6, None, 5),                           # NULL embedding
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "embeddings.parquet"))
        r = q_dq_embedding_contract(spark, d).collect()[0]
    assert r.modal_dim == 8
    assert r.n_dim_violations == 1
    assert r.n_nonfinite == 1
    assert r.n_null == 1
    assert r.n_clean == 3


def test_pk_uniqueness_flags_planted_duplicates(spark, tmp_path_factory):
    """The PK audit must count duplicate keys exactly: plant two copies
    of one doc_id in an otherwise-clean copy of the fixture."""
    import shutil
    from pathlib import Path

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = Path("/root/testdata/sf0.001")
    d = tmp_path_factory.mktemp("pkdup")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"):
        shutil.copyfile(src / f"{t}.parquet", d / f"{t}.parquet")
    docs = pq.read_table(src / "documents.parquet")
    pq.write_table(pa.concat_tables([docs, docs.slice(0, 2)]), d / "documents.parquet")

    rows = {r.table_name: r for r in
            contract.queries()["q_dq_pk_uniqueness"](spark, str(d)).collect()}
    assert rows["documents"].n_dup_keys == 2
    assert rows["documents"].n_extra_rows == 2
    # every table is key-clean EXCEPT the planted documents and
    # lineitem, whose synthetic fixture genuinely violates the declared
    # TPC-H (orderkey, linenumber) key — the audit's first real find
    assert all(
        rows[t].n_dup_keys == 0
        for t in rows
        if t not in ("documents", "lineitem")
    )
    assert rows["lineitem"].n_dup_keys > 0


def test_text_contract_flags_adversarial_rows(spark, adv_dir):
    """The text-door validator flags exactly the planted poison docs:
    NULL text, empty + whitespace-only, the control-character doc, the
    NULL-lang doc — and nothing spuriously on the clean majority."""
    r = contract.queries()["q_dq_text_contract"](spark, adv_dir).collect()[0]
    assert r.n_null_text == 1
    assert r.n_empty == 2            # "" and "   "
    assert r.n_control == 1          # bell + DEL doc
    assert r.n_replacement == 0      # fixture plants none
    assert r.n_len_mismatch == 0     # fixture n_chars is consistent
    assert r.n_oversize == 0
    assert r.n_null_lang == 1
    # defect classes are disjoint on this fixture
    assert r.n_clean == r.n_docs - 1 - 2 - 1 - 1


def test_text_contract_flags_replacement_and_drift(spark):
    """Classes the shared fixture does not plant, probed inline:
    U+FFFD replacement chars, stale n_chars metadata, and an oversize
    doc past the door bound."""
    import os
    import tempfile

    from etl_pipeline_spark.queries.text import TEXT_MAX_CHARS, q_dq_text_contract

    rows = [
        (1, "clean document text", "en", "s", 19),
        (2, "enc�ding damage", "en", "s", 15),      # replacement char
        (3, "short", "en", "s", 999),                    # n_chars drift
        (4, "x" * (TEXT_MAX_CHARS + 1), "en", "s", TEXT_MAX_CHARS + 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        r = q_dq_text_contract(spark, d).collect()[0]
    assert r.n_replacement == 1
    assert r.n_len_mismatch == 1
    assert r.n_oversize == 1
    assert r.n_clean == 1


def test_centroid_health_order_stable_and_still_detecting(spark, adv_dir):
    """q_embedding_centroid_health was the registry's ONE deliberate
    cross-engine hash exception (r8-r11): the 1e30-magnitude poison
    vector made double summation ORDER shift low bits past the absolute
    4-decimal rounding. Retired r12 per the r11 verdict (#3) with
    functions/grid.py::stable_round — ROUND(x, 4) in the sane region,
    float32-grid snap past |x| >= 1e6, so fold-order noise (~1e-12
    relative) is sub-grid at every magnitude. Pin the NEW contract from
    both sides:

    - DETECTED: max_dist still explodes on the poison vector's label —
      stable_round preserves magnitude; the 1e30 outlier is surfaced,
      never clamped (the sat_quantize failure mode this query must not
      inherit);
    - ORDER-STABLE: every value is BIT-IDENTICAL between Spark and the
      DuckDB oracle on the hostile fixture — no waived rows. If this
      assertion fails, a refactor reintroduced an unguarded
      order-dependent fold; fix the fold, don't re-waive the query.
    """
    import os

    import duckdb

    from etl_pipeline_spark.queries.base import all_specs

    spec = all_specs()["q_embedding_centroid_health"]
    srows = {
        r["label"]: r for r in spec.fn(spark, adv_dir).collect()
    }
    con = duckdb.connect()
    pq_path = os.path.join(adv_dir, "embeddings.parquet").replace("'", "''")
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{pq_path}')"
    )
    orows = {r[0]: r for r in con.execute(spec.oracle).fetchall()}
    assert set(srows) == set(orows)

    # detected: the 1e30 vector's label (fixture label 2) explodes
    assert srows[2]["max_dist"] > 1e29

    # r13 (advisor): the [1e38]*64 singleton (label 10) has an L2 norm
    # of 8e38 — past FLT_MAX — so the float32 snap must yield Infinity
    # in BOTH engines (Spark via IEEE cast, the oracle via TRY_CAST's
    # signed-Infinity fallback; a plain CAST would ERROR in DuckDB and
    # kill the whole oracle run for this query).
    import math

    assert math.isinf(srows[10]["centroid_norm"]) and srows[10]["centroid_norm"] > 0
    assert math.isinf(orows[10][2]) and orows[10][2] > 0

    for lb, sr in srows.items():
        for i, col in enumerate(("n_vecs", "centroid_norm", "avg_dist", "max_dist")):
            sv, ov = sr[col], orows[lb][i + 1]
            if sv is None or ov is None:
                assert sv == ov, (lb, col)
                continue
            assert float(sv) == float(ov), (lb, col, sv, ov)


def test_sat_quantize_float32_boundary_parity(spark):
    """r12, found by the first FULL sf0.1 oracle sweep: DuckDB evaluates
    REAL * literal in FLOAT32, where e.g. 0.31949999928474426f * 1000
    rounds to exactly 319.5 — the half-up boundary — and the oracle
    quantized one grid unit away from Spark's documented double-space
    computation (319.4999... -> 319). sat_quantize_sql now casts to
    DOUBLE first. This pins both engines to the double answer on the
    two real fixture components that exposed it, plus exact-boundary
    values where .5 genuinely rounds up on both sides."""
    import struct

    import duckdb

    from pyspark.sql import functions as F

    from etl_pipeline_spark.functions.grid import sat_quantize, sat_quantize_sql

    def f32(x: float) -> float:
        return struct.unpack("f", struct.pack("f", x))[0]

    # (float32 value, expected q at scale 1000 under DOUBLE semantics)
    cases = [
        (f32(0.31949999928474426), 319),   # f32*1000 == 319.5 in FLOAT, 319.4999... in DOUBLE
        (f32(-0.2345000058412552), -235),  # f32*1000 == -234.5 in FLOAT, -234.50000584 in DOUBLE
        (f32(0.5115), 512),                # f32(0.5115)*1000 = 511.50000476837158 -> floor(+0.5) = 512
        (f32(-0.5115), -512),              # -511.5000010 + 0.5 = -511.0000010 -> floor = -512
    ]
    sdf = spark.createDataFrame(
        [(i, float(v)) for i, (v, _) in enumerate(cases)], "i long, x float"
    ).select("i", sat_quantize(F.col("x"), 1000).alias("q"))
    got_spark = {r["i"]: r["q"] for r in sdf.collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, x REAL)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, v) for i, (v, _) in enumerate(cases)]
    )
    got_duck = {
        i: q
        for i, q in con.execute(
            f"SELECT i, {sat_quantize_sql('x', 1000)} FROM t"
        ).fetchall()
    }
    for i, (v, want) in enumerate(cases):
        assert got_spark[i] == want, (v, got_spark[i], want)
        assert got_duck[i] == want, (v, got_duck[i], want)


def test_stable_round_float32_overflow_parity(spark):
    """r13 (advisor): stable_round's float32 snap diverged past float32
    range — Spark cast('float') yields Infinity for |x| beyond FLT_MAX
    + half-ULP while DuckDB CAST(.. AS REAL) raises a conversion error,
    so an extreme aggregate made the ORACLE error instead of matching.
    stable_round_sql now uses TRY_CAST with a signed-Infinity fallback.
    Pin the whole magnitude ladder on both engines, including the exact
    IEEE rounding boundary (values below FLT_MAX + half-ULP snap DOWN
    to FLT_MAX, values above become Infinity), NULL (must stay NULL,
    not become -Infinity through the sign fallback), and NaN."""
    import math

    import duckdb

    from pyspark.sql import functions as F

    from etl_pipeline_spark.functions.grid import stable_round, stable_round_sql

    FLT_MAX = 3.4028234663852886e38
    # straddle the round-to-nearest boundary between FLT_MAX and 2**128
    below_boundary = 3.402823534441758e38   # snaps DOWN to FLT_MAX
    above_boundary = 3.402823806667635e38   # snaps UP -> Infinity
    cases = [
        (0, 123.456789, 123.4568),          # sane region: ROUND(x, 4)
        (1, 1e30, 1.0000000150474662e30),   # relative f32 grid, finite
        (2, FLT_MAX, FLT_MAX),
        (3, below_boundary, FLT_MAX),
        (4, above_boundary, float("inf")),
        (5, 1e39, float("inf")),
        (6, -1e39, float("-inf")),
        (7, None, None),
        (8, float("nan"), float("nan")),
    ]
    sdf = spark.createDataFrame(
        [(i, v) for i, v, _ in cases], "i long, x double"
    ).select("i", stable_round(F.col("x")).alias("r"))
    got_spark = {r["i"]: r["r"] for r in sdf.collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, x DOUBLE)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, v) for i, v, _ in cases]
    )
    got_duck = dict(
        con.execute(f"SELECT i, {stable_round_sql('x')} FROM t").fetchall()
    )
    for i, v, want in cases:
        for eng, got in (("spark", got_spark[i]), ("duckdb", got_duck[i])):
            if want is None:
                assert got is None, (eng, v, got)
            elif isinstance(want, float) and math.isnan(want):
                assert math.isnan(got), (eng, v, got)
            else:
                assert got == want, (eng, v, got, want)
