"""J2 cache semantics: LRU eviction, TTL expiry, hit/miss accounting."""

from __future__ import annotations

from ssiintegrateddatapipeline_spark.functions.ttl_cache import (
    TTLCache,
    executor_cache,
)


def test_hit_miss_accounting():
    c = TTLCache(max_size=10, ttl_secs=60)
    calls = []
    for _ in range(3):
        c.get_or_load("k", lambda: calls.append(1) or "v")
    assert c.misses == 1 and c.hits == 2
    assert len(calls) == 1


def test_lru_eviction_order():
    c = TTLCache(max_size=2, ttl_secs=60)
    c.get_or_load("a", lambda: 1)
    c.get_or_load("b", lambda: 2)
    c.get_or_load("a", lambda: 1)  # refresh a's recency
    c.get_or_load("c", lambda: 3)  # evicts b (least recent)
    assert len(c) == 2
    c.get_or_load("b", lambda: 99)
    assert c.misses == 4  # a, b, c, b-again


def test_ttl_expiry(monkeypatch):
    import ssiintegrateddatapipeline_spark.functions.ttl_cache as mod

    clock = [1000.0]
    monkeypatch.setattr(mod.time, "monotonic", lambda: clock[0])
    c = TTLCache(max_size=10, ttl_secs=600)
    c.get_or_load("k", lambda: "old")
    clock[0] += 601
    assert c.get_or_load("k", lambda: "new") == "new"
    assert c.misses == 2


def test_executor_cache_is_named_singleton():
    a = executor_cache("test_cache_xyz")
    b = executor_cache("test_cache_xyz")
    assert a is b
    assert executor_cache("other_cache") is not a


def test_identity_keys_still_roundtrip(spark, sf_dir):
    """The refactored key lookup must not change sign/verify outcomes."""
    from ssiintegrateddatapipeline_spark.operators.trade_pipeline import sign_verify

    out = sign_verify(spark, sf_dir).limit(200).collect()
    for r in out:
        assert r["verified"] == (not r["tampered"])
