"""The repo's TWO-LEVEL EXACT top-k device, shared by every operator
that ranks a large set under a small number of partition keys.

A window partitioned by a handful of keys is a |keys|-task skew trap at
corpus scale: every row of a key funnels through one task's sort. The
two-level form first takes a per-(key, salt) local top-k — any global
top-k row is inside its salt's top-k under the same total order, so the
first level only discards rows the second level could never keep — and
the final per-key window then ranks at most |keys| x n_salts x k rows.
Exactness is property-tested against the single-window form under heavy
ties in tests/test_topk_device.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOPK_SALT_FANOUT = 64  # default first-level fanout


def two_level_topk(
    df: DataFrame,
    keys: list,
    order: list,
    k: int,
    salt: Column,
    n_salts: int = TOPK_SALT_FANOUT,
    rank_name: str = "rank",
) -> DataFrame:
    """Exact top-``k`` rows per ``keys`` under ``order`` (a list of
    Column sort expressions forming a TOTAL order — include a unique
    tie-break), computed via the per-(keys, salt) local top-k first.
    ``salt`` is any deterministic column expression; it only affects
    parallelism, never results. The returned frame carries all input
    columns plus ``rank_name`` (1-based)."""
    salted = df.withColumn("_tk_salt", F.pmod(salt, F.lit(n_salts)))
    w_local = Window.partitionBy(*keys, "_tk_salt").orderBy(*order)
    w_final = Window.partitionBy(*keys).orderBy(*order)
    return (
        salted.withColumn("_tk_r1", F.row_number().over(w_local))
        .where(F.col("_tk_r1") <= k)
        .withColumn(rank_name, F.row_number().over(w_final))
        .where(F.col(rank_name) <= k)
        .drop("_tk_salt", "_tk_r1")
    )
