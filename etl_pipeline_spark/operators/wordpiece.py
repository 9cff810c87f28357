"""WordPiece greedy tokenization — the longest-match-first subword
tokenizer LLM pipelines run over every document (Wu et al. 2016, the
BERT tokenizer; the training-side merge search is q_bpe_merge_candidates).

The vocabulary lives here ONCE and feeds both engines: the Spark side
tokenizes through an Arrow-batched pandas UDF (token loops don't fit
Column expressions), the DuckDB oracle replays the identical greedy
recurrence as a recursive CTE — so the UDF's output is value-hash
checked, not just row-counted. Single-character pieces (initial and
continuation) guarantee progress, so no [UNK] path is needed on this
corpus; a production vocab adds one.

Scale: tokenize the DISTINCT word table (vocabulary-sized, not
corpus-sized), then weight by word frequency — the standard trick that
makes subword tokenization of a 100 TB corpus cost one word-keyed
aggregate plus a tiny UDF stage.
"""

from __future__ import annotations

import string

import pandas as pd
from pyspark.sql import functions as F

# (fragment, is_continuation) — continuation pieces render as '##frag'.
WP_VOCAB: tuple[tuple[str, int], ...] = tuple(
    [(ch, 0) for ch in string.ascii_lowercase]
    + [(ch, 1) for ch in string.ascii_lowercase]
    + [
        ("join", 0), ("ha", 0), ("sh", 1), ("row", 0), ("bat", 0), ("ch", 1),
        ("scan", 0), ("cust", 0), ("omer", 1), ("col", 0), ("umn", 1),
        ("fil", 0), ("ter", 1), ("sm", 0), ("all", 1), ("mer", 0), ("ge", 1),
        ("slow", 0), ("or", 0), ("der", 1), ("vec", 0), ("tor", 1),
        ("li", 0), ("ne", 1), ("da", 0), ("ta", 1), ("tab", 0), ("le", 1),
        ("agg", 0), ("val", 0), ("ue", 1), ("key", 0), ("str", 0), ("eam", 1),
        ("win", 0), ("dow", 1), ("spark", 0), ("gr", 0), ("oup", 1),
        ("part", 0), ("big", 0), ("sort", 0), ("qu", 0), ("ery", 1),
        ("fa", 0), ("st", 1), ("the", 0), ("dup", 0),
    ]
)

_INITIAL = sorted((f for f, c in WP_VOCAB if c == 0), key=len, reverse=True)
_CONT = sorted((f for f, c in WP_VOCAB if c == 1), key=len, reverse=True)


UNK = "[UNK]"


def wordpiece(word: str) -> list[str]:
    """Greedy longest-match-first WordPiece split of one word. A
    character outside the vocabulary emits ``[UNK]`` and advances one
    position (BERT drops the whole word; per-char keeps the rest of the
    word recoverable). The DuckDB oracle replays the recurrence WITHOUT
    the UNK branch — sound because WP_VOCAB covers every a-z character,
    so on the certified fixtures the branch never fires; it exists so
    out-of-alphabet corpora (e.g. the prefixed sf1 soak fixture) degrade
    instead of crash."""
    pieces: list[str] = []
    rest = word
    initial = True
    while rest:
        table = _INITIAL if initial else _CONT
        frag = next((f for f in table if rest.startswith(f)), None)
        if frag is None:
            pieces.append(UNK)
            rest = rest[1:]
        else:
            pieces.append(frag if initial else "##" + frag)
            rest = rest[len(frag):]
        initial = False
    return pieces


def wordpiece_udf():
    """Arrow-batched vectorized tokenizer: one Python loop per DISTINCT
    word (the caller pre-aggregates), never per corpus token. Built
    lazily — a module-level ``pandas_udf`` would re-run the decorator on
    executor import, where no SparkContext exists to parse the type."""

    @F.pandas_udf("array<string>")
    def _udf(words: pd.Series) -> pd.Series:
        return words.map(wordpiece)

    return _udf


def vocab_values_sql() -> str:
    """The shared vocabulary as a SQL VALUES list for the oracle."""
    return ", ".join(f"('{f}', {c})" for f, c in WP_VOCAB)
