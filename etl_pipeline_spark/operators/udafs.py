"""Grouped-aggregate Pandas UDAFs (§2.10) — vectorized custom aggregates.

NOTE: deliberately NO ``from __future__ import annotations`` here —
``pandas_udf`` infers the GROUPED_AGG evaluation type from the real
``pd.Series -> scalar`` annotations, and PEP 563 stringified annotations
break that inference.
"""

import pandas as pd

from pyspark.sql import functions as F


@F.pandas_udf("double")
def trimmed_mean_10_90(v: pd.Series) -> float:
    """10-90% trimmed mean (linear-interpolation quantiles, matching
    DuckDB's quantile_cont)."""
    lo, hi = v.quantile(0.1), v.quantile(0.9)
    return float(v[(v >= lo) & (v <= hi)].mean())


@F.pandas_udf("long")
def trimmed_count_10_90(v: pd.Series) -> int:
    """Row count surviving the 10-90% trim (the UDAF twin used to verify
    the trim boundary handling)."""
    lo, hi = v.quantile(0.1), v.quantile(0.9)
    return int(((v >= lo) & (v <= hi)).sum())
