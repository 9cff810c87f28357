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
