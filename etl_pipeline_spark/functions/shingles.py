"""Tokenize-once shingle builders.

Referencing ``F.split(text, ' ')`` as a plain Column expression inside a
``transform`` lambda re-evaluates the split PER ELEMENT — Catalyst
inlines the expression into every ``element_at`` call, making word
shingling O(tokens^2) per document. Measured at sf0.01 (500 docs): the
inline form's shingle stream runs 0.59 s warm vs 0.26 s with the token
array projected once (2.8 s vs 0.43 s cold), and the effect grows with
document length — at 100 TB the quadratic term dominates the whole
dedup scan stage.

The fix is structural, not an optimizer hint: project the token array
as a NAMED column in its own ``select`` first, then build per-token
expressions over ``F.col(tok_col)``. Catalyst's CollapseProject leaves
the hoist alone because the alias is non-cheap and referenced more than
once (verified by plan inspection: ``split`` appears once in the
projection, once in the pushed size-filter, never per element).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokenized(
    df: DataFrame,
    *keep: str,
    text_col: str = "text",
    tok_col: str = "toks",
    min_tokens: int | None = None,
) -> DataFrame:
    """Project ``split(text_col, ' ')`` ONCE as ``tok_col`` next to the
    ``keep`` columns, optionally filtering rows with fewer than
    ``min_tokens`` tokens. Every downstream per-token expression must
    reference ``F.col(tok_col)`` — never re-derive the split."""
    out = df.select(*keep, F.split(text_col, " ").alias(tok_col))
    if min_tokens is not None:
        out = out.filter(F.size(tok_col) >= min_tokens)
    return out


def word_shingles(width: int, tok_col: str = "toks") -> Column:
    """array<string> of distinct space-joined word ``width``-grams over
    the hoisted token column; typed-empty for sub-width docs.

    The CASE guard makes the expression TOTAL (r14 optimization round):
    without it, sequence(0, size - width) DESCENDS for sub-width docs
    and element_at throws under ANSI. Callers always pair this with a
    ``min_tokens >= width`` filter, but the guard cannot live only in
    the filter: Generate (explode) pushdown infers a ``size(...) > 0``
    predicate containing this whole expression, and codegen's
    subexpression elimination evaluates it BEFORE the filter's
    short-circuiting AND — measured on the adversarial fixture, a
    1-token doc reached element_at(toks, 2) despite the width filter
    sitting left of it in the same Filter node."""
    toks = F.col(tok_col)
    idx = F.sequence(F.lit(0), F.size(toks) - width)
    grams = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + k + 1) for k in range(width)]
            ),
        )
    )
    return F.when(F.size(toks) >= width, grams).otherwise(
        F.array().cast("array<string>")
    )


def hashed_word_shingles(width: int, tok_col: str = "toks") -> Column:
    """array<bigint> of distinct xxhash64'd word ``width``-grams — the
    8-byte shingle representation the MinHash family consumes
    (operators/minhash.py). Hash BEFORE array_distinct so the dedup
    compares longs, not strings. Same totality guard as
    :func:`word_shingles`."""
    toks = F.col(tok_col)
    idx = F.sequence(F.lit(0), F.size(toks) - width)
    grams = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.xxhash64(
                F.concat_ws(
                    " ", *[F.element_at(toks, i + k + 1) for k in range(width)]
                )
            ),
        )
    )
    return F.when(F.size(toks) >= width, grams).otherwise(
        F.array().cast("array<bigint>")
    )
