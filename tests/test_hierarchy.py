"""Hierarchy closure invariants: the pointer-doubling rollup must equal a
naive per-node chain walk, and the derived 10-ary forest makes every
structural property checkable in closed form (root = leading digit,
depth = digits - 1, subtree sums partition the forest)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.operators import hierarchy


def _naive(sf_dir):
    """Driver-side reference: walk parent pointers one step at a time."""
    rows = duckdb.sql(
        f"SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) "
        f"FROM read_parquet('{sf_dir}/part.parquet')"
    ).fetchall()
    cents = {k: c for k, c in rows}
    out = {}
    for k in cents:
        chain = []
        cur = k
        while cur >= hierarchy.HIER_FANOUT:
            cur //= hierarchy.HIER_FANOUT
            chain.append(cur)
        out[k] = chain
    return cents, out


def test_rollup_matches_naive_walk(spark, sf_dir):
    cents, chains = _naive(sf_dir)
    got = {
        r["part_key"]: r
        for r in hierarchy.hierarchy_rollup(spark, sf_dir).collect()
    }
    assert set(got) == set(chains)
    # subtree sums from the naive closure
    n_desc = {k: 0 for k in cents}
    sub = dict(cents)
    for k, chain in chains.items():
        for a in chain:
            n_desc[a] += 1
            sub[a] += cents[k]
    for k, chain in chains.items():
        r = got[k]
        assert r["depth"] == len(chain)
        assert r["root_key"] == (chain[-1] if chain else k)
        assert r["parent_key"] == (chain[0] if chain else None)
        assert r["n_desc"] == n_desc[k]
        assert r["subtree_retail_cents"] == sub[k]


def test_structural_closed_form(spark, sf_dir):
    """parent = floor(k/10) makes root/depth readable off the key itself."""
    for r in hierarchy.hierarchy_rollup(spark, sf_dir).collect():
        digits = str(r["part_key"])
        assert r["root_key"] == int(digits[0])
        assert r["depth"] == len(digits) - 1


def test_root_subtrees_partition_forest(spark, sf_dir):
    """Every node sits under exactly one root, so root subtree totals must
    add up to the whole table's cents (and descendant counts to n - roots)."""
    df = hierarchy.hierarchy_rollup(spark, sf_dir)
    roots = df.where(F.col("depth") == 0)
    total = df.agg(F.count("*").alias("n")).first()
    base = hierarchy._edges(spark, sf_dir)
    all_cents = base.agg(F.sum("cents")).first()[0]
    got = roots.agg(
        F.sum("subtree_retail_cents").alias("cents"),
        F.sum("n_desc").alias("desc"),
        F.count("*").alias("k"),
    ).first()
    assert got["cents"] == all_cents
    assert got["desc"] == total["n"] - got["k"]


def test_plan_is_log_depth_joins(spark, sf_dir):
    """The closure must come from O(log depth) joins — no cartesian, no
    Python eval, and no per-level chain of joins."""
    df = hierarchy.hierarchy_rollup(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Python" not in plan and "MapInPandas" not in plan
    # sf0.001: max_depth 2 -> 1 doubling join + rollup join (+ AQE reuse)
    assert plan.count("Join") <= 8, plan


def test_probe_mode_closes_unknown_hierarchy(spark):
    """The probe-terminated path (max_depth=None) must close a hierarchy
    whose depth has nothing to do with key digits — a pure path graph
    parent(k) = k-1 of depth 120 — proving the helper is general and the
    join count stays logarithmic."""
    from pyspark.sql import functions as F

    n = 121
    base = spark.range(n).select(
        F.col("id").alias("k"),
        F.when(F.col("id") > 0, F.col("id") - 1).alias("parent"),
        F.lit(1).cast("long").alias("cents"),
    )
    chains = hierarchy._closed_chains(base, None)
    rows = {r["k"]: r["chain"] for r in chains.collect()}
    for k in range(n):
        assert rows[k] == list(range(k - 1, -1, -1)), k
    # decimal sizing would have run ceil(log2(len(str(120)) - 1)) = 1
    # doubling join and returned chains of length <= 2 — probe mode ran
    # ceil(log2(120)) = 7 and closed the full path
    assert len(rows[n - 1]) == n - 1

