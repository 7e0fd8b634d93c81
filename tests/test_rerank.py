"""MMR and Benford invariants: the distributed greedy must equal a
driver-side greedy recompute from the candidate/sim tables, and the
Benford audit's shares must sum to one with exact digit counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.operators import profiling, similarity


def test_mmr_matches_driver_greedy(spark, sf_dir):
    cand = {
        (r["query_id"], r["neighbor_id"]): r["cosine_sim"]
        for r in similarity.brute_force_topk(spark, sf_dir).collect()
    }
    got = similarity.mmr_rerank(spark, sf_dir).collect()
    # recompute pairwise sims on the driver from the embeddings
    ids = sorted({nid for _, nid in cand})
    emb = {
        r["vec_id"]: r["embedding"]
        for r in similarity.load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id").isin(ids))
        .collect()
    }

    def cos(a, b):
        num = sum(float(x) * float(y) for x, y in zip(a, b))
        na = sum(float(x) * float(x) for x in a) ** 0.5
        nb = sum(float(y) * float(y) for y in b) ** 0.5
        return round(num / (na * nb), 6)

    lam, mu = similarity.MMR_LAMBDA, 1.0 - similarity.MMR_LAMBDA
    queries = sorted({q for q, _ in cand})
    expect = {}
    for q in queries:
        pool = {n: rel for (qq, n), rel in cand.items() if qq == q}
        picked = []
        for step in range(1, similarity.MMR_SELECT + 1):
            best = None
            for n, rel in sorted(pool.items()):
                ms = max(
                    (cos(emb[n], emb[s]) for s in picked), default=0.0
                )
                mmr = round(lam * rel - mu * ms, 12)
                if best is None or mmr > best[1]:
                    best = (n, mmr)
            picked.append(best[0])
            expect[(q, step)] = best
            del pool[best[0]]
    for r in got:
        n, mmr = expect[(r["query_id"], r["pick_rank"])]
        assert r["neighbor_id"] == n
        assert r["mmr_score"] == pytest.approx(mmr, abs=1e-12)


def test_mmr_picks_are_distinct_candidates(spark, sf_dir):
    cand = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(spark, sf_dir).collect()
    }
    rows = similarity.mmr_rerank(spark, sf_dir).collect()
    seen = set()
    for r in rows:
        key = (r["query_id"], r["neighbor_id"])
        assert key in cand
        assert key not in seen
        seen.add(key)


def test_mmr_step_frames_parallelize_at_100x(spark, sf_dir):
    """Scale probe: at a 100x query workload the greedy step frames must
    span multiple tasks (the census-derived coalesce), and every replica
    must get the same picks as its base query — the greedy is per-query
    independent, so replication changes parallelism, never results."""
    base = similarity._brute_topk(spark, sf_dir, with_emb=True).select(
        "query_id", "neighbor_id", F.col("cosine_sim").alias("rel"), "embedding"
    )
    reps = spark.range(100).select((F.col("id") * 1000).alias("off"))
    cand = base.crossJoin(F.broadcast(reps)).select(
        (F.col("query_id") + F.col("off")).alias("query_id"),
        "neighbor_id",
        "rel",
        "embedding",
    )
    n_cand = cand.count()
    cores = spark.sparkContext.defaultParallelism
    assert similarity._step_parts(n_cand, cores) > 1  # steps span tasks
    assert similarity._step_parts(50, cores) == 1  # contract scale: 1 task
    got = similarity._mmr_greedy(spark, cand).collect()
    base_picks = {
        (r["query_id"], r["pick_rank"]): (r["neighbor_id"], r["mmr_score"])
        for r in similarity.mmr_rerank(spark, sf_dir).collect()
    }
    assert len(got) == 100 * len(base_picks)
    for r in got:
        key = (r["query_id"] % 1000, r["pick_rank"])
        assert base_picks[key] == (r["neighbor_id"], r["mmr_score"])


def test_benford_shares_and_counts(spark, sf_dir):
    rows = profiling.benford_audit(spark, sf_dir).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert sum(r["obs_pct"] for r in rows) == pytest.approx(100.0, abs=1e-3)
    # expected shares are the Benford distribution
    for r in rows:
        assert r["exp_pct"] == pytest.approx(
            100.0 * profiling.BENFORD_EXPECTED[r["digit"]], abs=1e-6
        )
