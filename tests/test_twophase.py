"""Property tests for functions/twophase.py — the distributed replacement
for single-partition global windows (round-3 VERDICT fix).

The contract under test: for ANY total order (value, id) and ANY bucket
expression monotone along it, two_phase_row_number is bit-identical to the
global ``row_number() OVER (ORDER BY value, id)``, and ntile_from_rank is
bit-identical to ANSI ``ntile(n)`` over that order — including duplicate
values massed at quantile boundaries, all-equal columns, negative values,
skewed distributions, and bucket counts larger than the row count."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.functions.twophase import (
    ntile_from_rank,
    quantile_buckets,
    two_phase_row_number,
)

rows_strategy = st.lists(
    st.integers(min_value=-50, max_value=50), min_size=1, max_size=120
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=rows_strategy, n_buckets=st.integers(1, 8), desc=st.booleans())
def test_two_phase_rank_matches_global_order(spark, values, n_buckets, desc):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id int, value int"
    ).repartition(4)
    bucket = quantile_buckets(df, F.col("value"), n_buckets, descending=desc)
    order = (
        [F.col("value").desc(), F.col("id")] if desc else [F.col("value"), F.col("id")]
    )
    ranked, total = two_phase_row_number(df, bucket, order)
    assert total == len(values)
    got = {r.id: r.global_pos for r in ranked.collect()}
    key = (lambda iv: (-iv[1], iv[0])) if desc else (lambda iv: (iv[1], iv[0]))
    expected = {
        i: pos + 1
        for pos, (i, _) in enumerate(sorted(enumerate(values), key=key))
    }
    assert got == expected


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=rows_strategy, n_tiles=st.integers(1, 6))
def test_ntile_from_rank_matches_ansi(spark, values, n_tiles):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id int, value int"
    ).repartition(3)
    ranked, total = two_phase_row_number(
        df, quantile_buckets(df, F.col("value"), 4), [F.col("value"), F.col("id")]
    )
    out = ranked.withColumn(
        "tile", ntile_from_rank(F.col("global_pos"), total, n_tiles)
    )
    got = {r.id: r.tile for r in out.collect()}
    ansi = {
        r.id: r.t
        for r in df.selectExpr(
            "id", f"ntile({n_tiles}) OVER (ORDER BY value, id) AS t"
        ).collect()
    }
    assert got == ansi


def test_two_phase_rank_empty_frame(spark):
    df = spark.createDataFrame([], "id int, value int")
    ranked, total = two_phase_row_number(
        df, quantile_buckets(df, F.col("value"), 4), [F.col("value"), F.col("id")]
    )
    assert total == 0 and ranked.count() == 0
    assert "global_pos" in ranked.columns


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


from ssiintegrateddatapipeline_spark.functions.twophase import (  # noqa: E402
    two_phase_grouped_row_number,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=rows_strategy,
    n_groups=st.integers(1, 5),
    dense=st.booleans(),
)
def test_grouped_rank_matches_global_and_per_group(spark, values, n_groups, dense):
    """two_phase_grouped_row_number must equal BOTH the global
    row_number() and the per-group row_number() for any monotone bucket —
    including negative buckets and the sparse create_map fallback path."""
    from ssiintegrateddatapipeline_spark.functions import twophase as TP

    df = spark.createDataFrame(
        [(i, v, i % n_groups) for i, v in enumerate(values)],
        "id int, value int, grp int",
    ).repartition(3)
    bucket = F.col("value")  # identity is trivially monotone; spans negatives
    span_cap = TP._DENSE_SPAN_MAX
    if not dense:
        TP._DENSE_SPAN_MAX = 0  # force the create_map fallback paths
    try:
        ranked, total = two_phase_grouped_row_number(
            df, bucket, F.col("grp"), [F.col("value"), F.col("id")],
            out="gpos", group_out="sub",
        )
        got = {r.id: (r.gpos, r.sub) for r in ranked.collect()}
    finally:
        TP._DENSE_SPAN_MAX = span_cap
    assert total == len(values)
    order = sorted(range(len(values)), key=lambda i: (values[i], i))
    want_g = {i: pos + 1 for pos, i in enumerate(order)}
    want_sub = {}
    seen: dict[int, int] = {}
    for i in order:
        g = i % n_groups
        seen[g] = seen.get(g, 0) + 1
        want_sub[i] = seen[g]
    assert got == {i: (want_g[i], want_sub[i]) for i in range(len(values))}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=rows_strategy, n_buckets=st.integers(1, 8), desc=st.booleans())
def test_two_phase_prefix_max_matches_global_window(
    spark, values, n_buckets, desc
):
    """prefix max over strictly-preceding rows == the driver-side sweep,
    for any order direction, bucket count, duplicates, and negatives."""
    from ssiintegrateddatapipeline_spark.functions.twophase import (
        two_phase_prefix_max,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id int, value int"
    ).repartition(4)
    bucket = quantile_buckets(df, F.col("value"), n_buckets, descending=desc)
    order = (
        [F.col("value").desc(), F.col("id")]
        if desc
        else [F.col("value"), F.col("id")]
    )
    # running max of id over strictly-preceding rows in the chosen order
    out = two_phase_prefix_max(df, bucket, order, F.col("id"), out="pm")
    got = {r.id: r.pm for r in out.collect()}
    key = (lambda iv: (-iv[1], iv[0])) if desc else (lambda iv: (iv[1], iv[0]))
    expect = {}
    run = None
    for i, _v in sorted(enumerate(values), key=key):
        expect[i] = run
        run = i if run is None or i > run else run
    assert got == expect


def test_two_phase_prefix_max_empty(spark):
    from ssiintegrateddatapipeline_spark.functions.twophase import (
        two_phase_prefix_max,
    )

    df = spark.createDataFrame([], "id int, value int")
    out = two_phase_prefix_max(
        df, F.col("value"), [F.col("value"), F.col("id")], F.col("id")
    )
    assert out.count() == 0
    assert "prev_max" in out.columns
