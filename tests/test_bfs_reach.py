"""BFS-reach invariants: seeds at distance 0, every edge shrinks the hop
gap to at most 1, every reached node has a parent one hop closer, and the
cap is respected."""

from __future__ import annotations

from ssiintegrateddatapipeline_spark.operators import dedup


def _graph(spark, sf_dir):
    dist = {
        r["node"]: r["dist"] for r in dedup.bfs_reach(spark, sf_dir).collect()
    }
    pairs = dedup.minhash_lsh_pairs(spark, sf_dir).collect()
    edges = [(r["doc_id_a"], r["doc_id_b"]) for r in pairs]
    return dist, edges


def test_bfs_distances_consistent(spark, sf_dir):
    dist, edges = _graph(spark, sf_dir)
    assert dist, "seed source must reach at least its own documents"
    assert min(dist.values()) == 0
    assert max(dist.values()) <= dedup.BFS_MAX_HOPS
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for a, b in edges:
        da, db = dist.get(a), dist.get(b)
        # a reached node's neighbor is reachable one hop later (unless
        # the cap cut the walk)
        if da is not None and db is None:
            assert da == dedup.BFS_MAX_HOPS
        if da is not None and db is not None:
            assert abs(da - db) <= 1
    for n, d in dist.items():
        if d > 0:
            assert any(dist.get(m) == d - 1 for m in adj.get(n, ())), n
