"""Every queries() entry with an oracle must hash-match the DuckDB oracle —
the local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.oracle import compare

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parity
@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    if name not in _ORACLES:
        # weaker rows-only check (non-SQL-expressible op)
        df = _QUERIES[name](spark, sf_dir)
        assert df.count() >= 0
        return
    ok, msg = compare(spark, sf_dir, _QUERIES[name], _ORACLES[name])
    assert ok, f"{name}: {msg}"


def test_cluster_distributed_path_matches_local(spark, sf_dir):
    """The distributed min-label-propagation fallback must produce exactly
    the same components as the driver-side union-find fast path."""
    from ssiintegrateddatapipeline_spark.operators import dedup

    local = sorted(
        map(tuple, dedup.near_dup_clusters(spark, sf_dir).collect())
    )
    dist = sorted(
        map(
            tuple,
            dedup.near_dup_clusters(spark, sf_dir, max_local_pairs=0).collect(),
        )
    )
    assert local == dist and len(local) > 0
