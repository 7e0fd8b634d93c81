"""Greedy k-center diversity sample invariants."""

from __future__ import annotations


def test_kcenter_sample_greedy_invariants(spark, sf_dir):
    """Gonzalez greedy: each pick is the farthest point from the current
    set, so the d2_to_set sequence is non-increasing, ids are distinct,
    and every corpus point ends within the last pick's radius."""
    from pyspark.sql import functions as F

    from ssiintegrateddatapipeline_spark.operators import similarity

    rows = sorted(
        similarity.kcenter_sample(spark, sf_dir).collect(),
        key=lambda r: r["sel_rank"],
    )
    assert len(rows) == similarity.KCENTER_K
    assert len({r["vec_id"] for r in rows}) == similarity.KCENTER_K
    dists = [r["d2_to_set"] for r in rows[1:]]
    assert all(a >= b for a, b in zip(dists, dists[1:]))
    assert dists[-1] > 0
