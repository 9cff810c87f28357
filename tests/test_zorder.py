"""Z-order clustered layout: write, prune, and de-interleave round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_spark.operators.zorder import (
    Z_BITS,
    _extract,
    covering_prefixes,
    read_box,
    write_zordered,
    zorder_key,
)

SF_DIR = "/root/testdata/sf0.001"


def test_zorder_key_roundtrip(spark):
    """Interleave/de-interleave are inverses for every 8-bit pair edge."""
    for a in (0, 1, 127, 128, 255):
        for b in (0, 1, 127, 128, 255):
            df = spark.range(1).select(
                zorder_key(F.lit(a), F.lit(b)).alias("z")
            )
            z = df.collect()[0].z
            assert _extract(z, 2 * Z_BITS, odd=True) == a
            assert _extract(z, 2 * Z_BITS, odd=False) == b


def test_covering_prefixes_exact():
    """The covering set contains a point's own prefix and nothing that
    misses the box."""
    # full domain -> every prefix
    assert len(covering_prefixes(0, 255, 0, 255)) == 256
    # single point -> exactly one tile
    ps = covering_prefixes(37, 37, 200, 200)
    assert len(ps) == 1
    # a quadrant box -> a quarter of the tiles
    ps = covering_prefixes(0, 127, 0, 127)
    assert len(ps) == 64


def test_zorder_write_prunes_and_matches(spark, tmp_path):
    """Box query over the z-ordered layout prunes partitions at planning
    time (PartitionFilters) and returns exactly the naive filter's rows."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    path = str(tmp_path / "orders_z")
    a = F.col("o_custkey") % 256
    b = F.floor(F.col("o_totalprice") * 256 / 600000).cast("long")
    write_zordered(
        orders.withColumn("a", a).withColumn("b", b), path, F.col("a"), F.col("b")
    )

    box = dict(a_lo=16, a_hi=47, b_lo=64, b_hi=95)
    got = read_box(spark, path, "a", "b", **box)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "z_prefix" in plan, plan[:800]

    expect = (
        orders.withColumn("a", a)
        .withColumn("b", b)
        .filter(
            (F.col("a").between(box["a_lo"], box["a_hi"]))
            & (F.col("b").between(box["b_lo"], box["b_hi"]))
        )
    )
    assert sorted(r.o_orderkey for r in got.collect()) == sorted(
        r.o_orderkey for r in expect.collect()
    )
    assert got.count() > 0  # the box is non-degenerate at sf0.001

    # pruning is real: the partitions read are a strict subset
    n_parts_all = len(covering_prefixes(0, 255, 0, 255))
    n_parts_box = len(covering_prefixes(**box))
    assert n_parts_box < n_parts_all / 4
