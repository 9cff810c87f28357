"""Property-based tests (SURVEY.md §5.4, hypothesis): malformed CSV input
never crashes the pipeline, and every input row lands in exactly one of
output / quarantine / parse-failure (conservation law)."""

from __future__ import annotations

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_pipeline_spark.pipelines.covid import transform_covid

# Arbitrary cell content incl. empties, whitespace, junk, numbers, dates
_cell = st.one_of(
    st.just(""),
    st.just("   "),
    st.text(alphabet=string.printable.replace(",", "").replace("\n", "").replace("\r", ""), max_size=12),
    st.integers(-1000, 10**9).map(str),
    st.floats(allow_nan=False, allow_infinity=False, width=32).map(str),
    st.dates().map(str),
    st.just("2021-03-01"),
    st.just("2021-3-1"),
)

_row = st.tuples(_cell, _cell, _cell)


@given(rows=st.lists(_row, min_size=0, max_size=25))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_conservation_law(spark, rows):
    raw = spark.createDataFrame(
        rows or [(None, None, None)],
        "entity string, Day string, total_confirmed_deaths string",
    )
    n_in = raw.count()
    clean, quarantine = transform_covid(raw)
    n_out, n_quar = clean.count(), quarantine.count()
    assert n_out + n_quar == n_in
    # every surviving row satisfies the output contract
    for r in clean.collect():
        assert r["entity"] is not None and r["entity"].strip() != ""
        assert r["Day"] is not None
        assert r["total_confirmed_deaths"] > 0


@given(
    toks=st.lists(st.integers(1, 400), min_size=1, max_size=40),
    budget=st.integers(50, 500),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sequence_packing_properties(spark, toks, budget):
    """Greedy stream packing invariants for ANY doc/token distribution:
    (1) token conservation — every doc lands in exactly one chunk;
    (2) chunk ids are dense and monotone in doc order;
    (3) a chunk only opens when the previous one reached the budget
        (offset-based packing: doc's chunk = its running offset / budget).
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, "xx", t) for i, t in enumerate(toks)], "doc_id long, lang string, n_tok long"
    )
    w = W.partitionBy("lang").orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    offset = F.sum("n_tok").over(w) - F.col("n_tok")
    packed = df.withColumn("chunk_id", F.floor(offset / budget)).collect()
    packed.sort(key=lambda r: r["doc_id"])
    assert sum(r["n_tok"] for r in packed) == sum(toks)  # conservation
    chunk_ids = [r["chunk_id"] for r in packed]
    assert chunk_ids == sorted(chunk_ids)  # monotone in stream order
    # every chunk boundary is justified: the previous chunk's token mass
    # (by construction of the offset) reached its budget multiple
    by_chunk = {}
    for r in packed:
        by_chunk.setdefault(r["chunk_id"], []).append(r["n_tok"])
    for cid, sizes in by_chunk.items():
        first_offset = sum(
            r["n_tok"] for r in packed if r["chunk_id"] < cid
        )
        assert first_offset // budget == cid or not sizes


@given(sizes=st.lists(st.integers(1, 400), min_size=1, max_size=8))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_chunking_covers_all_tokens(spark, sizes):
    """chunk_documents invariants for arbitrary doc lengths: chunk ids are
    contiguous from 0, starts are stride-spaced, every token index falls
    in >= 1 chunk, lengths stay in [1, size], and consecutive chunks
    overlap (except a final chunk that begins exactly at the previous
    end)."""
    from etl_pipeline_spark import api

    CH, STRIDE = 64, 48
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(sizes)],
        "doc_id long, text string",
    )
    out = api.chunk_documents(docs, size=CH, stride=STRIDE).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(range(len(sizes)))
    for i, n in enumerate(sizes):
        rows = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        for r in rows:
            assert r["start_tok"] == r["chunk_id"] * STRIDE
            assert 1 <= r["len_tok"] <= CH
            assert r["start_tok"] + r["len_tok"] <= n
        assert max(r["start_tok"] + r["len_tok"] for r in rows) == n
        for a, b in zip(rows, rows[1:]):
            assert b["start_tok"] <= a["start_tok"] + a["len_tok"]


# ---------------------------------------------------------------------------
# Round-4 primitives: priority sampling and Bloom screening
# ---------------------------------------------------------------------------


@given(
    weights=st.lists(st.integers(1, 10_000), min_size=4, max_size=20),
    boost_idx=st.integers(0, 19),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_priority_sample_weight_monotonicity(spark, weights, boost_idx):
    """With the uniforms fixed by id-hash, raising one row's weight can
    only raise its priority — a sampled row must stay sampled after its
    own weight increases (the defining monotonicity of priority
    sampling)."""
    from etl_pipeline_spark import api

    boost_idx %= len(weights)
    k = 3
    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "id BIGINT, w BIGINT")
    before = {r.id for r in api.priority_sample(df, "w", "id", k).collect()}
    boosted = [
        (i, w * 100 if i == boost_idx else w) for i, w in rows
    ]
    df2 = spark.createDataFrame(boosted, "id BIGINT, w BIGINT")
    after = {r.id for r in api.priority_sample(df2, "w", "id", k).collect()}
    if boost_idx in before:
        assert boost_idx in after
    # k never exceeded either way
    assert len(before) == min(k, len(weights)) == len(after)


@given(
    members=st.sets(st.text(string.ascii_lowercase, min_size=1, max_size=8), max_size=30),
    probes=st.sets(st.text(string.ascii_lowercase, min_size=1, max_size=8), min_size=1, max_size=30),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bloom_screen_never_misses_members(spark, members, probes):
    """For ANY member/probe sets, every probe value that IS a member must
    come back bloom_hit=true (no false negatives, the Bloom contract)."""
    from etl_pipeline_spark import api

    if not members:
        members = {"sentinel"}
    filt = spark.createDataFrame([(m,) for m in members], "v STRING")
    probe = spark.createDataFrame([(p,) for p in probes], "v STRING")
    out = api.bloom_screen(probe, "v", filt, "v", n_bits=1 << 14)
    hits = {r.v for r in out.filter("bloom_hit").collect()}
    assert (probes & members) <= hits


# --- Z-order covering-prefix soundness ---------------------------------------

_coord = st.integers(0, 255)


@given(a1=_coord, a2=_coord, b1=_coord, b2=_coord, pt_a=_coord, pt_b=_coord)
@settings(max_examples=200, deadline=None)
def test_zorder_covering_prefixes_sound(a1, a2, b1, b2, pt_a, pt_b):
    """Every point inside the box has its z-prefix in the covering set
    (no false pruning — the property partition skipping depends on),
    and every covering tile genuinely intersects the box."""
    from etl_pipeline_spark.operators.zorder import _extract, covering_prefixes

    a_lo, a_hi = sorted((a1, a2))
    b_lo, b_hi = sorted((b1, b2))
    prefixes = set(covering_prefixes(a_lo, a_hi, b_lo, b_hi))

    if a_lo <= pt_a <= a_hi and b_lo <= pt_b <= b_hi:
        z = 0
        for i in range(8):
            z |= ((pt_a >> i) & 1) << (2 * i + 1)
            z |= ((pt_b >> i) & 1) << (2 * i)
        assert (z >> 8) in prefixes

    # completeness-of-pruning: each covering tile's ranges intersect the box
    for p in prefixes:
        z = p << 8
        ta = _extract(z, 16, odd=True)
        tb = _extract(z, 16, odd=False)
        ta_lo, ta_hi = ta & 0xF0, (ta & 0xF0) + 15
        tb_lo, tb_hi = tb & 0xF0, (tb & 0xF0) + 15
        assert ta_lo <= a_hi and ta_hi >= a_lo
        assert tb_lo <= b_hi and tb_hi >= b_lo


# --- session-6 property tests ------------------------------------------------


@given(
    st.lists(
        st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=12),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=200, deadline=None)
def test_wordpiece_always_reconstructs(words):
    """Any a-z word reconstructs exactly from its pieces (single-char
    coverage guarantees progress), and no piece is empty."""
    from etl_pipeline_spark.operators.wordpiece import wordpiece

    for w in words:
        pieces = wordpiece(w)
        assert pieces
        assert all(p for p in pieces)
        assert "".join(p.removeprefix("##") for p in pieces) == w
        # continuation marking: first piece bare, rest ##-prefixed
        assert not pieces[0].startswith("##")
        assert all(p.startswith("##") for p in pieces[1:])


@given(
    st.lists(st.integers(min_value=1, max_value=20), min_size=0, max_size=12),
    st.lists(st.integers(min_value=1, max_value=20), min_size=0, max_size=12),
)
@settings(max_examples=200, deadline=None)
def test_fifo_staircase_equals_sequential_matching(supply, demand):
    """The cumulative-interval-overlap formulation of FIFO allocation
    (q_fifo_allocation) equals the literal sequential matcher."""
    # closed form: overlap of cumulative intervals
    s_lo, pairs = 0, []
    s_spans = []
    for q in supply:
        s_spans.append((s_lo, s_lo + q))
        s_lo += q
    d_lo = 0
    d_spans = []
    for q in demand:
        d_spans.append((d_lo, d_lo + q))
        d_lo += q
    closed = {}
    for i, (slo, shi) in enumerate(s_spans):
        for j, (dlo, dhi) in enumerate(d_spans):
            ov = min(shi, dhi) - max(slo, dlo)
            if ov > 0:
                closed[(i, j)] = ov
    # literal FIFO matcher
    seq = {}
    si, remaining = 0, supply[0] if supply else 0
    for j, q in enumerate(demand):
        need = q
        while need > 0 and si < len(supply):
            take = min(need, remaining)
            if take > 0:
                seq[(si, j)] = seq.get((si, j), 0) + take
                need -= take
                remaining -= take
            if remaining == 0:
                si += 1
                remaining = supply[si] if si < len(supply) else 0
    assert closed == seq


# --- Connected components vs reference union-find ---------------------------

_edges = st.lists(
    st.tuples(st.integers(0, 24), st.integers(0, 24)), min_size=0, max_size=40
)


@given(edges=_edges)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_connected_components_match_union_find(spark, edges):
    """Min-label propagation (and its two-phase fallback entry point)
    must agree with a reference union-find on arbitrary random graphs —
    chains, self-loops, duplicates, isolated nodes."""
    from etl_pipeline_spark.operators.cluster import connected_components

    n = 25
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node of the component
    comp = {}
    for v in range(n):
        r = find(v)
        comp.setdefault(r, []).append(v)
    want = {v: min(members) for members in comp.values() for v in members}

    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    edf = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "src long, dst long"
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(nodes, edf).collect()
    }
    assert got == want


# --- Skew-join physical variants are value-equal to the plain join ----------

_keyed_rows = st.lists(
    st.tuples(st.sampled_from(["hot", "a", "b", "c"]), st.integers(-5, 5)),
    min_size=1,
    max_size=30,
)


@given(rows=_keyed_rows)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_skew_join_variants_equal_plain_join(spark, rows):
    """salted_join and hybrid_skew_join are PHYSICAL rewrites: on any
    input (including dim keys that never occur, hot thresholds that
    classify everything or nothing) their output multiset must equal the
    plain inner join's."""
    from etl_pipeline_spark.operators.skew import hybrid_skew_join, salted_join

    big = spark.createDataFrame(rows, "k string, v long")
    dim = spark.createDataFrame(
        [("hot", 1), ("a", 2), ("z", 9)], "k string, tag long"
    )
    want = sorted(map(tuple, big.join(dim, "k").collect()))
    got_salted = sorted(map(tuple, salted_join(big, dim, "k", n_salts=4).collect()))
    got_hybrid = sorted(
        map(tuple, hybrid_skew_join(big, dim, "k", hot_threshold=3).collect())
    )
    assert got_salted == want
    assert got_hybrid == want


@settings(max_examples=12, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=33),
    w=st.integers(min_value=1, max_value=33),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_roundtrip_shape_and_error_bound(h, w, seed):
    """Pure-Python baseline JPEG codec property: for ARBITRARY uint8
    RGB images (any dims, including non-multiples of 8 and 1-pixel
    edges), decode(encode(img, q=95)) preserves shape exactly and stays
    within a conservative q95 quantization-error envelope."""
    import numpy as np

    from etl_pipeline_spark.operators.jpeg_codec import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=95))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 48


def test_wide_ckpt_level_toggle(monkeypatch):
    """The wide-checkpoint storage switch: deserialized (fast) by
    default, serialized memory+disk under SPARK_GRAFT_WIDE_CKPT_SER —
    the measured memory-constrained regime (r7 sf100 soak)."""
    from pyspark.storagelevel import StorageLevel

    from etl_pipeline_spark.queries.dedup import wide_ckpt_level

    monkeypatch.delenv("SPARK_GRAFT_WIDE_CKPT_SER", raising=False)
    assert wide_ckpt_level() == StorageLevel.MEMORY_AND_DISK_DESER
    monkeypatch.setenv("SPARK_GRAFT_WIDE_CKPT_SER", "1")
    assert wide_ckpt_level() == StorageLevel.MEMORY_AND_DISK
    monkeypatch.setenv("SPARK_GRAFT_WIDE_CKPT_SER", "0")
    assert wide_ckpt_level() == StorageLevel.MEMORY_AND_DISK_DESER


# --- Gopher repetition vs pure-Python reference (r8 session 2) -------------

_gopher_doc = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=3), min_size=0, max_size=40
).map(" ".join)


def _gopher_ref(text: str | None):
    """Reference implementation of the Gopher repetition fractions:
    top-2-gram chars (max count, ties to lexicographically largest gram)
    and duplicate-5-gram chars over all occurrences, / total word chars."""
    toks = [t for t in (text or "").split(" ") if t]
    wc = sum(len(t) for t in toks)
    from collections import Counter

    def gram_chars(n):
        grams = [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        return Counter(grams), grams

    top2 = 0
    c2, _ = gram_chars(2)
    if c2:
        best = max(c2.items(), key=lambda kv: (kv[1], " ".join(kv[0])))
        top2 = best[1] * sum(len(w) for w in best[0])
    c5, _ = gram_chars(5)
    dup5 = sum(
        cnt * sum(len(w) for w in g) for g, cnt in c5.items() if cnt >= 2
    )
    # HALF_UP like Spark/DuckDB round() — Python's round is half-even
    # and diverges on exact binary halves (e.g. 5/32 -> .1562 vs .1563)
    from decimal import ROUND_HALF_UP, Decimal

    def r4(x):
        return float(Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP))

    f2 = r4(top2 / wc) if wc else 0.0
    f5 = r4(dup5 / wc) if wc else 0.0
    return len(toks), f2, f5


@given(docs=st.lists(_gopher_doc, min_size=1, max_size=8))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_gopher_repetition_matches_reference(spark, docs):
    """The distributed n-gram pipeline equals the sequential definition
    on arbitrary token streams (tiny alphabet maximizes collisions and
    top-gram ties, stressing the cross-engine tie-break)."""
    from etl_pipeline_spark.queries.text import gopher_repetition

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_words"], r["top2_char_frac"], r["dup5_char_frac"])
        for r in gopher_repetition(df).collect()
    }
    assert len(got) == len(docs)
    for i, text in enumerate(docs):
        assert got[i] == _gopher_ref(text), (i, text)


# --------------------------------------------------------- codec properties


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    seed=st.integers(0, 2**31 - 1),
    interlace=st.booleans(),
    depth16=st.booleans(),
    filter_cycle=st.booleans(),
)
def test_png_roundtrip_property(h, w, seed, interlace, depth16, filter_cycle):
    """PNG is lossless: decode(encode(px)) == px for EVERY combination
    of interlace / bit depth / per-row filter choice and any dimensions
    (including shapes whose trailing Adam7 passes are empty)."""
    import numpy as np

    from etl_pipeline_spark.operators.png_codec import decode_png, encode_png

    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    data = encode_png(
        px, interlace=interlace, filter_cycle=filter_cycle, depth16=depth16
    )
    assert np.array_equal(decode_png(data), px)


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
    quality=st.integers(30, 100),
    sub=st.sampled_from(["444", "422", "420"]),
    ri=st.integers(0, 3),
)
def test_jpeg_form_equivalence_property(h, w, seed, quality, sub, ri):
    """Every JPEG stream form that transmits the same quantized
    coefficients must decode to the same pixels: interleaved baseline
    (the reference), non-interleaved baseline, and progressive —
    with or without restart markers, at any subsampling/quality/shape."""
    import numpy as np

    from etl_pipeline_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    ref = decode_jpeg(encode_jpeg_baseline(px, quality, subsampling=sub))
    ni = encode_jpeg_baseline(
        px, quality, restart_interval=ri, subsampling=sub, interleaved=False
    )
    prog = encode_jpeg_progressive(px, quality, restart_interval=ri, subsampling=sub)
    assert np.array_equal(ref, decode_jpeg(ni))
    assert np.array_equal(ref, decode_jpeg(prog))
