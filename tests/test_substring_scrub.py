"""Exact substring-scrub invariants: exact-duplicate documents must be
fully scrubbed, untouched documents must hash to their original text, and
coverage accounting must be internally consistent."""

from __future__ import annotations

import hashlib

import duckdb
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.operators import text


def test_scrub_invariants(spark, sf_dir):
    rows = {r["doc_id"]: r for r in text.substring_scrub(spark, sf_dir).collect()}
    docs = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    )
    assert set(rows) == set(docs)

    # docs sharing their full text with another doc are 8-gram-duplicated
    # everywhere -> fully removed
    from collections import Counter

    text_counts = Counter(docs.values())
    n_full = 0
    for doc_id, t in docs.items():
        r = rows[doc_id]
        toks = t.split(" ")
        assert r["n_tokens"] == len(toks)
        if text_counts[t] > 1 and len(toks) >= text.SCRUB_K:
            # an exact twin is 8-gram-duplicated everywhere -> fully removed
            assert r["n_removed"] == r["n_tokens"], doc_id
        if r["n_removed"] == r["n_tokens"]:
            n_full += 1
            assert r["clean_hash"] == hashlib.md5(b"").hexdigest()
        if r["n_dup_starts"] == 0:
            assert r["n_removed"] == 0
            assert (
                r["clean_hash"]
                == hashlib.md5(" ".join(toks).encode()).hexdigest()
            )
        else:
            # each duplicated start covers SCRUB_K tokens; merged coverage
            # is bounded by both the span sum and the doc length
            assert 0 < r["n_removed"] <= min(
                r["n_tokens"], r["n_dup_starts"] + text.SCRUB_K - 1
            )
    assert n_full > 0  # near-dup clusters must exercise the full-scrub path


def test_scrub_plan_shape(spark, sf_dir):
    plan = (
        text.substring_scrub(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "Python" not in plan and "MapInPandas" not in plan
