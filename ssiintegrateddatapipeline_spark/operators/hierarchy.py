"""Hierarchy / recursive-closure operators (the recursive-CTE gap).

Spark has no ``WITH RECURSIVE``; warehouses need it constantly (BOM
explosion, org charts, account trees, category rollups). This module fills
the gap with the *pointer-doubling* (path-halving) formulation: each
iteration joins the ancestor map with itself, doubling the covered
distance, so a hierarchy of depth ``d`` closes in ``ceil(log2(d))``
shuffle joins instead of ``d`` chained self-joins. The DuckDB oracle is
the literal ``WITH RECURSIVE`` walk — the engine-independent definition of
the same closure.

The hierarchy itself is derived deterministically from the ``part`` table:
``parent(k) = floor(k / 10)`` for ``k >= 10``, keys below 10 are roots —
a 10-ary forest of depth ``digits(max_key) - 1`` whose shape is verifiable
by inspection (root = leading digit, depth = digit count - 1) while the
*computation* stays fully general: nothing below assumes the fan-out or
the key encoding, only a (child, parent) edge relation.

Scale notes (100 TB):
- ``ceil(log2(depth))`` keyed shuffle joins total — 5 joins close a
  depth-32 tree; the per-iteration state is one row per node with an
  ancestor-chain array bounded by depth (a few hundred bytes/row for any
  real hierarchy);
- hub ancestors make the doubling join skew (every node 2^i deep under
  one root jumps to it) — the build side is one row per key, so AQE's
  skew-join split handles the probe side; at extreme fan-in the ancestor
  map is small enough to broadcast outright;
- the only driver-side data movement is a 1-row ``max(key)`` census used
  to size the loop (the same bounded plan-time-literal pattern as the
  two-phase offset tables);
- the closure (node, ancestor, dist) is produced by ``posexplode`` of the
  finished chains — O(n * depth) rows that flow straight into a partial
  (map-side combined) aggregation, never materialized on the driver.

Reference parity: the reference has no hierarchy operator (its data model
is flat trade/credential streams) — this is part of the warehouse-layer
capability set, same tier as the SCD2 and interval operators.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.caches import track
from ssiintegrateddatapipeline_spark.sources.batch import load_table

HIER_FANOUT = 10
_MAX_DOUBLING_ITERS = 20  # supports depth 2^20; loop sizing is exact below


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(k, parent, cents) node table; parent NULL marks a root."""
    p = load_table(spark, sf_dir, "part")
    parent = F.when(
        F.col("p_partkey") >= HIER_FANOUT,
        F.floor(F.col("p_partkey") / HIER_FANOUT).cast("long"),
    )
    return p.select(
        F.col("p_partkey").alias("k"),
        parent.alias("parent"),
        F.round(F.col("p_retailprice") * 100).cast("long").alias("cents"),
    )


def _closed_chains(base: DataFrame, max_depth: int | None = None) -> DataFrame:
    """Pointer-doubling loop: returns (k, parent, cents, chain) where
    ``chain`` is the full root-ward ancestor path ``[parent, grandparent,
    ..., root]`` (empty for roots).

    Invariant after iteration i: ``chain`` holds the nearest
    ``min(2^(i+1), depth)`` ancestors and ``jump`` points at the ancestor
    exactly ``2^(i+1)`` away (NULL once the chain reached its root), so
    concatenating a node's chain with its jump-target's chain is exactly
    the next doubling step.

    ``max_depth``: pass a known bound to size the loop exactly (no probe
    jobs); pass None for an UNKNOWN hierarchy — the loop then checks an
    ``isEmpty()`` probe on the open-jump set each iteration and stops as
    soon as every chain has reached its root (each probe is one cheap
    short-circuit job; the persist keeps it from recomputing the joins).
    Either way the join count is ceil(log2(depth)), capped at
    ``_MAX_DOUBLING_ITERS`` (depth 2^20) as a runaway guard."""
    state = base.select(
        "k",
        "parent",
        "cents",
        F.when(F.col("parent").isNull(), F.array().cast("array<long>"))
        .otherwise(F.array(F.col("parent")))
        .alias("chain"),
        F.col("parent").alias("jump"),
    )
    if max_depth is not None:
        iters = (
            max(0, math.ceil(math.log2(max_depth))) if max_depth > 1 else 0
        )
    else:
        iters = _MAX_DOUBLING_ITERS
    probing = max_depth is None
    for _ in range(min(iters, _MAX_DOUBLING_ITERS)):
        if probing:
            # persist BEFORE the probe so the isEmpty action itself
            # materializes the cache the next join reads — probing an
            # uncached plan would re-derive every prior doubling twice
            state = track(state.persist())
            if state.where(F.col("jump").isNotNull()).isEmpty():
                break
        other = state.select(
            F.col("k").alias("jk"),
            F.col("chain").alias("jchain"),
            F.col("jump").alias("jjump"),
        )
        state = state.join(other, F.col("jump") == F.col("jk"), "left").select(
            "k",
            "parent",
            "cents",
            F.when(F.col("jk").isNull(), F.col("chain"))
            .otherwise(F.concat("chain", "jchain"))
            .alias("chain"),
            F.col("jjump").alias("jump"),
        )
    return state.drop("jump")


def hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node hierarchy profile + subtree rollup in one pass: depth,
    root, descendant count, and subtree retail value (integer cents, self
    included) for every part — the BOM-explosion / category-rollup shape.

    The subtree aggregate runs over the exploded (node, ancestor) closure
    grouped by ancestor: each node contributes its measure to every
    ancestor exactly once, which is precisely the recursive-CTE rollup
    without the recursion."""
    base = _edges(spark, sf_dir)
    # exact loop sizing from a 1-row census: with parent = floor(k/10),
    # depth(k) = digits(k) - 1, so max depth falls out of max(k) — the
    # bounded plan-time-literal pattern. _closed_chains(base, None) is the
    # general probe-terminated path for unknown hierarchies.
    max_k = base.agg(F.max("k")).first()[0] or 0
    max_depth = len(str(max_k)) - 1 if max_k >= 1 else 0
    chains = _closed_chains(base, max_depth)
    closure = chains.select(
        F.col("k").alias("node"),
        F.col("cents").alias("node_cents"),
        F.posexplode("chain").alias("dist0", "ancestor"),
    )
    rollup = closure.groupBy("ancestor").agg(
        F.count("*").cast("long").alias("n_desc"),
        F.sum("node_cents").alias("desc_cents"),
    )
    return (
        chains.join(rollup, chains["k"] == rollup["ancestor"], "left")
        .select(
            F.col("k").alias("part_key"),
            F.col("parent").alias("parent_key"),
            F.coalesce(F.get("chain", F.size("chain") - 1), F.col("k")).alias(
                "root_key"
            ),
            F.size("chain").cast("long").alias("depth"),
            F.coalesce(F.col("n_desc"), F.lit(0)).cast("long").alias("n_desc"),
            (F.coalesce(F.col("desc_cents"), F.lit(0)) + F.col("cents"))
            .cast("long")
            .alias("subtree_retail_cents"),
        )
    )


QUERIES = {
    "graph_hierarchy_rollup": hierarchy_rollup,
}

_HIER_BASE_SQL = f"""
    base AS (
        SELECT p_partkey AS k,
               CASE WHEN p_partkey >= {HIER_FANOUT}
                    THEN p_partkey // {HIER_FANOUT} END AS parent,
               CAST(round(p_retailprice * 100) AS BIGINT) AS cents
        FROM part
    ),
    anc AS (
        SELECT k AS node, parent AS ancestor, 1 AS dist
        FROM base WHERE parent IS NOT NULL
        UNION ALL
        SELECT a.node, b.parent, a.dist + 1
        FROM anc a JOIN base b ON a.ancestor = b.k
        WHERE b.parent IS NOT NULL
    )
"""

ORACLES = {
    "graph_hierarchy_rollup": f"""
        WITH RECURSIVE {_HIER_BASE_SQL},
        stats AS (
            SELECT node, count(*) AS depth, max(dist) AS maxd
            FROM anc GROUP BY node
        ),
        roots AS (
            SELECT a.node, a.ancestor AS root_key
            FROM anc a JOIN stats s ON a.node = s.node AND a.dist = s.maxd
        ),
        rolled AS (
            SELECT a.ancestor AS k,
                   count(*) AS n_desc,
                   CAST(sum(b.cents) AS BIGINT) AS desc_cents
            FROM anc a JOIN base b ON a.node = b.k
            GROUP BY a.ancestor
        )
        SELECT b.k AS part_key,
               b.parent AS parent_key,
               coalesce(r.root_key, b.k) AS root_key,
               CAST(coalesce(s.depth, 0) AS BIGINT) AS depth,
               CAST(coalesce(ru.n_desc, 0) AS BIGINT) AS n_desc,
               CAST(coalesce(ru.desc_cents, 0) + b.cents AS BIGINT)
                   AS subtree_retail_cents
        FROM base b
        LEFT JOIN stats s ON b.k = s.node
        LEFT JOIN roots r ON b.k = r.node
        LEFT JOIN rolled ru ON b.k = ru.k
    """,
}
