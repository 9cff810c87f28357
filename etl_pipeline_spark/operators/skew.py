"""Skew mitigation — salting for hot keys (SURVEY.md scale mandate).

AQE's skew-join splitting (enabled in session.py) is the first line of
defense; explicit salting is the deterministic fallback when a single key
dominates (the classic null-key / power-law case in a 100 TB join or
aggregation).

- ``salted_aggregate``: two-phase aggregation — partial agg on
  (key, salt), final agg on key. Spark's hash aggregate already does
  map-side partials, so this matters when the DISTINCT or collect-ish
  aggregate defeats partial aggregation.
- ``salted_join``: replicate the small side n_salts times, salt the big
  side with a deterministic pmod(hash(row-id)), join on (key, salt) — the
  hot key's rows spread over n_salts reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key: str,
    agg_col: str,
    n_salts: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """SUM(agg_col) GROUP BY key, computed as partial sums over
    (key, salt) then a final sum over key.

    The default salt hashes ROW IDENTITY (partition id + row position),
    not the aggregated value: the motivating skew case is a hot key whose
    rows all carry the same (or null) value, and a value-derived salt
    would send every one of those rows to the same reducer — a no-op
    mitigation. Pass ``salt_source`` for a deterministic column-derived
    override when re-run-identical partials matter more."""
    salt = (
        F.pmod(
            F.xxhash64(
                salt_source
                if salt_source is not None
                else F.spark_partition_id() + F.monotonically_increasing_id()
            ),
            n_salts,
        )
        if n_salts > 1
        else F.lit(0)
    )
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.sum(agg_col).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias(f"sum_{agg_col}"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Inner equi-join with the big side salted and the small side
    replicated n_salts times. Output equals ``big.join(small, key)``;
    the difference is purely physical — the hot key's shuffle partition
    splits n_salts ways."""
    salt = F.pmod(
        F.xxhash64(salt_source if salt_source is not None else F.monotonically_increasing_id()),
        n_salts,
    )
    big_s = big.withColumn("_salt", salt)
    # explode cannot be nested inside another expression (e.g. a cast) —
    # generate first, cast in a separate projection
    small_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return big_s.join(small_r, [key, "_salt"]).drop("_salt")


def hybrid_skew_join(
    big: DataFrame,
    dim: DataFrame,
    key: str,
    hot_threshold: int = 100_000,
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Inner equi-join split by key temperature: rows whose key exceeds
    ``hot_threshold`` occurrences in ``big`` join against a BROADCAST of
    the matching dim slice (hot keys never shuffle), while the cold
    remainder takes the ordinary shuffled join. Output equals
    ``big.join(dim, key)``.

    This is the differentiated-broadcast alternative to ``salted_join``:
    salting spreads a hot key across reducers but still replicates the
    whole small side n_salts times; the hybrid ships only the hot SLICE
    of the dim (bounded by the number of hot keys — small by the
    definition of skew) and leaves the cold path's shuffle untouched.
    Prefer it when the dim is too large to replicate but its hot slice
    is tiny; prefer salting when hot keys are many or unknowable.

    ``hot_keys`` overrides detection (pass a 1-column DataFrame of keys
    from a sample or a prior run); by default one count-aggregate over
    ``big`` finds them — at 100 TB detect on a sample or reuse the
    sketch layer (operators/cms.py heavy hitters) instead of the exact
    count.
    """
    if hot_keys is None:
        hot_keys = (
            big.groupBy(key)
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > hot_threshold)
            .select(key)
        )
    hot_keys = hot_keys.localCheckpoint(eager=False)
    big_hot = big.join(F.broadcast(hot_keys), key, "left_semi")
    big_cold = big.join(F.broadcast(hot_keys), key, "left_anti")
    dim_hot = dim.join(F.broadcast(hot_keys), key, "left_semi")
    dim_cold = dim.join(F.broadcast(hot_keys), key, "left_anti")
    return big_hot.join(F.broadcast(dim_hot), key).unionByName(
        big_cold.join(dim_cold, key)
    )
