"""Build the ADVERSARIAL test fixture: sf0.001 plus the malformed /
degenerate / non-ASCII rows a 100 TB production corpus inevitably
contains. One bad record must never kill a 1000-executor job — Spark 4
runs with ANSI mode ON, so out-of-range array indexing, fallible casts,
and integer division are all crash classes, and the round-7 advisor
found exactly one of them (streaming shingles on sub-width docs) that
every clean fixture missed.

Usage:
    python tools/make_adversarial_fixture.py [out_dir]   # default .fuzzdata/sfadv

Then run the full oracle sweep against it:
    python tools/check_oracle.py --sf-dir .fuzzdata/sfadv

The adversarial rows are APPENDED to the sf0.001 tables (ids continue
past the originals), so every query still has its normal signal plus
the nasty tail. Everything is deterministic — no RNG — so Spark and
the DuckDB oracle see byte-identical inputs.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.001")

ADVERSARIAL_TEXTS: list[tuple[str | None, str | None]] = [
    # (text, lang) — lang defaults to "en" when None is not intended
    ("", "en"),                                      # empty string
    ("hello", "en"),                                 # 1 token (< shingle width)
    ("hello world", "en"),                           # 2 tokens
    ("   ", "en"),                                   # whitespace-only
    ("a  b   c", "en"),                              # runs of spaces -> empty split tokens
    ("line1\nline2\ttabbed end", "en"),              # newlines / tabs
    ("!!! ??? ... ;;; ###", "en"),                   # punctuation-only
    ("你好 世界 数据 处理 引擎 查询 优化 执行", "zh"),  # CJK
    ("🚀 🔥 ✨ data 🚀 🔥 ✨ pipeline", "en"),        # emoji (non-BMP)
    ("café naïve résumé déjà vu über garçon", "fr"),  # combining accents
    ("x" * 5000, "en"),                              # one 5000-char token
    (("spam " * 500).strip(), "en"),                 # one word repeated 500x
    ("123 456 789 000 111 222", "en"),               # digits only
    ("bell\x07char and del\x7fchar", "en"),          # control characters
    ("مرحبا بالعالم هذا اختبار للنص", "en"),          # RTL script
    ("a", "en"),                                     # single character
    ("  padded text here  ", "en"),                  # leading/trailing space
    ("he said \"hi\" and 'bye' \\ backslash", "en"),  # quotes / escapes
    ('{"k": 1, "v": [1, 2]}', "en"),                 # JSON-looking text
    ("a+b*c?(d)[e]{2}|f^g$h", "en"),                 # regex metacharacters
    (None, "en"),                                    # NULL text
    ("normal text with a null lang tail", None),      # NULL lang
    ("the fast key order sort table scan merge part window small hash "
     "scan join order batch batch batch stream spark window window dup",
     "es"),                                          # exact dup of doc 0
    (" ".join(f"tok{i % 97}" for i in range(2000)), "en"),  # 2000-token doc
]


def build(out_dir: Path) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)

    # --- untouched relational tables -----------------------------------
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"):
        shutil.copyfile(SRC / f"{t}.parquet", out_dir / f"{t}.parquet")

    # --- documents + adversarial tail ----------------------------------
    docs = pq.read_table(SRC / "documents.parquet")
    base_id = max(docs.column("doc_id").to_pylist()) + 1
    rows = {
        "doc_id": [], "text": [], "lang": [], "source": [], "n_chars": [],
    }
    for i, (text, lang) in enumerate(ADVERSARIAL_TEXTS):
        rows["doc_id"].append(base_id + i)
        rows["text"].append(text)
        rows["lang"].append(lang)
        rows["source"].append("adversarial")
        rows["n_chars"].append(len(text) if text is not None else 0)
    tail = pa.table(rows).cast(pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
        ("source", pa.string()), ("n_chars", pa.int64()),
    ]))
    pq.write_table(
        pa.concat_tables([docs.select(tail.column_names), tail]),
        out_dir / "documents.parquet",
    )

    # --- embeddings + adversarial tail ---------------------------------
    emb = pq.read_table(SRC / "embeddings.parquet")
    dim = len(emb.column("embedding")[0].as_py())
    vec0 = emb.column("embedding")[0].as_py()
    vbase = max(emb.column("vec_id").to_pylist()) + 1
    adv_vecs: list[tuple[list[float] | None, int]] = [
        ([0.0] * dim, 0),                        # zero vector (cosine 0/0)
        (vec0, 1),                               # exact duplicate of vec 0
        ([1e30] * dim, 2),                       # float32-overflow magnitude
        ([1e-40] * dim, 3),                      # subnormal magnitude
        ([1.0] * dim, 4),                        # constant components
        ([-1.0] * dim, 5),                       # negated constant
        # wave 3 (r9, advisor find): the embedding-contract poison rows
        # were claimed but never present — a NULL vector and an
        # off-dimension vector (dimension drift). These exercise
        # q_dq_embedding_contract's n_null / n_dim_violations branches
        # and q_embedding_dim_profile's n=1 variance guard (dims 65-70
        # are observed in exactly one vector).
        (None, 6),                               # NULL embedding
        ([0.5] * (dim + 6), 7),                  # 70-dim drift vector
        # r12 (found by the first full sf0.1 sweep): float32 components
        # whose f32 product with the milli scale lands EXACTLY on the
        # half-up boundary (0.3195f * 1000 == 319.5 in FLOAT but
        # 319.4999... in DOUBLE) — the class where a missing
        # CAST(... AS DOUBLE) in oracle SQL quantizes one grid unit
        # away from Spark's double-space sat_quantize. Planting them
        # keeps every engine-vs-oracle run on this fixture sensitive to
        # a reintroduced float-precision oracle path.
        ([0.3195, -0.2345] * (dim // 2), 8),     # grid half-up boundary straddle
        # r13 (advisor): a finite-float32 component whose 64-dim L2 norm
        # (8e38) exceeds FLT_MAX, so stable_round's float32 snap must
        # produce Infinity in BOTH engines. Spark cast('float') yields
        # Infinity; DuckDB CAST(.. AS REAL) raises — stable_round_sql's
        # TRY_CAST + signed-Infinity fallback is what keeps the oracle
        # alive on this row. Label 10 is unused by the base table, so the
        # group is a singleton and the Infinity lands on centroid_norm.
        ([1e38] * dim, 10),                      # >FLT_MAX aggregate magnitude
    ]
    et = {
        "vec_id": [vbase + i for i in range(len(adv_vecs))],
        "embedding": [v for v, _ in adv_vecs],
        "label": [lb for _, lb in adv_vecs],
    }
    etail = pa.table(et).cast(pa.schema([
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32()),
    ]))
    pq.write_table(
        pa.concat_tables([emb.select(etail.column_names).cast(etail.schema),
                          etail]),
        out_dir / "embeddings.parquet",
    )

    # --- events + adversarial tail -------------------------------------
    ev = pq.read_table(SRC / "events.parquet")
    ebase = max(ev.column("event_id").to_pylist()) + 1
    ts_type = ev.schema.field("ts").type
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    adv_events = [
        # (event_type, value, props, ts_offset_sec_or_None)
        ("purchase", 0.0, "not json at all", 0),
        ("purchase", -1.5, "", 1),
        ("click", 1e18, "{broken", 2),
        ("view", 0.0, None, 3),
        ("", 2.5, '{"k": 1}', 4),
        ("tipo-ñandú 🚀", 3.5, '{"k": []}', 5),
        ("error", 4.5, '{"k": null}', 6),
        ("signup", 5.5, '{"K": 7}', 7),  # wrong-case key
        # wave 2 (r8): NULL core columns — the classic poison rows for
        # windows, watermarks, intervals, and grouped aggregates
        ("purchase", 6.5, '{"k": 2}', None),   # NULL ts
        ("view", None, '{"k": 3}', 9),         # NULL value
        (None, 7.5, '{"k": 4}', 10),           # NULL event_type
        # wave 3 (r9): a legitimate large purchase — $123,456.78 sits
        # between the old 1e6-cent grid bound (which silently clipped it
        # to $10,000) and the money bound MONEY_ABS_MAX=1e12; money-path
        # aggregates must carry it exactly
        ("purchase", 123456.78, '{"k": 5}', 11),
    ]
    etab = {
        "event_id": [ebase + i for i in range(len(adv_events))],
        "ts": [None if off is None else t0 + dt.timedelta(seconds=off)
               for _, _, _, off in adv_events],
        "user_id": [10_000 + i for i in range(len(adv_events))],
        "event_type": [e for e, _, _, _ in adv_events],
        "value": [v for _, v, _, _ in adv_events],
        "props": [p for _, _, p, _ in adv_events],
    }
    evtail = pa.table(etab).cast(pa.schema([
        ("event_id", pa.int64()), ("ts", ts_type), ("user_id", pa.int64()),
        ("event_type", pa.string()), ("value", pa.float64()),
        ("props", pa.string()),
    ]))
    pq.write_table(
        pa.concat_tables([ev.select(evtail.column_names).cast(evtail.schema),
                          evtail]),
        out_dir / "events.parquet",
    )
    print(f"adversarial fixture written to {out_dir}")

    # recall contract check at regeneration time (r10 judge #3): a new
    # similarity profile may legitimately need banding retuned — fail
    # HERE, not rounds later when a dedup oracle quietly agrees with a
    # low-recall candidate set on both engines
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.recall_gate import assert_lsh_recall

    print(f"recall gate: {assert_lsh_recall(str(out_dir))}")


if __name__ == "__main__":
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(".fuzzdata/sfadv")
    build(out)
