"""DOULION sampled triangle census (queries/graph_sampling.py, r13).

The estimator's correctness contract has two layers:
 1. the hash-sparsified graph is DETERMINISTIC and engine-portable —
    pinned here against a pure-Python md5 replay of the coin;
 2. the census over the sampled graph is an exact wedge-join count —
    pinned against itertools brute force on the surviving edges.
The cross-engine layer (Spark vs DuckDB, all columns) is the oracle of
q_triangle_census_sampled, checked at 3 SFs + the adversarial fixture.
"""

from __future__ import annotations

import hashlib
from itertools import combinations

from pyspark.sql import functions as F


def _kept(u: int, v: int, keep_nibbles: int) -> bool:
    nib = int(hashlib.md5(f"{u}:{v}".encode()).hexdigest()[0], 16)
    return nib < keep_nibbles


def test_sampled_triangles_matches_python_replay(spark):
    """On a clique K12 (220 triangles): the kept-edge set equals the
    pure-Python md5 replay and the sampled triangle count equals brute
    force over those edges — at both registry (8) and soak (4) rates."""
    from etl_pipeline_spark.queries.graph_sampling import (
        doulion_keep,
        sampled_triangles,
    )

    nodes = list(range(1, 13))
    edges = [(u, v) for u, v in combinations(nodes, 2)]
    df = spark.createDataFrame(edges, "u long, v long")

    for keep in (8, 4):
        expect_edges = {e for e in edges if _kept(*e, keep)}
        got_edges = {
            (r["u"], r["v"])
            for r in df.filter(doulion_keep(F.col("u"), F.col("v"), keep)).collect()
        }
        assert got_edges == expect_edges, keep

        adj = expect_edges
        expect_tris = sum(
            1
            for a, b, c in combinations(nodes, 3)
            if (a, b) in adj and (b, c) in adj and (a, c) in adj
        )
        r = sampled_triangles(df, keep).collect()[0]
        assert r["n_edges_sampled"] == len(expect_edges)
        assert r["n_triangles_sampled"] == expect_tris
        assert r["est_triangles"] == expect_tris * (16 // keep) ** 3


def test_sampled_census_registry_row_is_consistent(spark):
    """The registry query's row at sf0.001: the estimate is the sampled
    count times exactly 8, the verdict holds, and the sampled edge count
    sits in a binomial-plausible band around n_edges/2 (the coin is fair
    by construction of the md5 nibble)."""
    from etl_pipeline_spark.queries.graph_sampling import (
        q_triangle_census_sampled,
    )

    r = q_triangle_census_sampled(spark, "/root/testdata/sf0.001").collect()[0]
    assert r["est_triangles"] == r["n_triangles_sampled"] * 8
    assert r["within_3sigma"]
    # the grid-safe error columns (r13 advisor #5) are exact integer
    # arithmetic — replayable in pure Python from the row itself
    assert r["abs_err"] == abs(r["est_triangles"] - r["n_triangles_exact"])
    assert r["rel_err_ppm"] == r["abs_err"] * 1_000_000 // r["n_triangles_exact"]
    n, k = r["n_edges"], r["n_edges_sampled"]
    assert abs(k - n / 2) < 4 * (n**0.5)  # ~4 sigma of Binomial(n, 1/2)
    assert r["n_triangles_exact"] > 0  # non-vacuous on the fixture


def test_oriented_wedge_mass_matches_python(spark):
    """The preflight aggregate equals the pure-Python computation on the
    hub graph (where degree orientation matters most): undirected wedges
    count the hub's d(d-1)/2, oriented wedges cap at the rim."""
    from collections import Counter

    from etl_pipeline_spark.queries.graph_sampling import oriented_wedge_mass

    rim = [(1, 2), (3, 4), (9, 10)]
    hub = [(0, i) for i in range(1, 11)] + rim
    df = spark.createDataFrame(hub, "u long, v long")
    r = oriented_wedge_mass(df).collect()[0]

    deg = Counter()
    for u, v in hub:
        deg[u] += 1
        deg[v] += 1
    und = sum(d * (d - 1) // 2 for d in deg.values())
    od = Counter()
    for u, v in hub:
        src = u if (deg[u], u) < (deg[v], v) else v
        od[src] += 1
    ori = sum(d * (d - 1) // 2 for d in od.values())

    assert r["n_edges"] == len(hub)
    assert r["n_wedges_undirected"] == und
    assert r["n_wedges_oriented"] == ori
    assert ori < und  # orientation must actually cap the hub fan-out
