"""Executor-local LRU+TTL cache (J2).

The reference memoizes DID-document resolution in an LRU cache of max 100
entries with a 10-minute TTL (veramo-verifier/src/server.ts:245-325;
veramo-agent/src/veramo/veramo_cached_did_resolver.ts:12-90), with
per-method skip policies. The Spark slot for that optimization is an
executor-local singleton consulted inside Arrow-batched UDFs — never
closure-captured (it must not serialize), created on first use in each
Python worker.

Hit/miss counters are exposed so pipelines can emit cache-effectiveness
metrics (the reference's Q6 panels measure exactly this).
"""

from __future__ import annotations

import time
from collections import OrderedDict
from collections.abc import Callable
from typing import Any

_REGISTRY: dict[str, "TTLCache"] = {}


class TTLCache:
    """LRU with per-entry TTL. Not thread-safe by design: each Spark Python
    worker is single-threaded, and the cache must be worker-local anyway."""

    def __init__(self, max_size: int = 100, ttl_secs: float = 600.0) -> None:
        self.max_size = max_size
        self.ttl_secs = ttl_secs
        self._data: OrderedDict[Any, tuple[float, Any]] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get_or_load(self, key: Any, loader: Callable[[], Any]) -> Any:
        now = time.monotonic()
        entry = self._data.get(key)
        if entry is not None:
            stamp, value = entry
            if now - stamp <= self.ttl_secs:
                self._data.move_to_end(key)
                self.hits += 1
                return value
            del self._data[key]  # expired
        self.misses += 1
        value = loader()
        self._data[key] = (now, value)
        self._data.move_to_end(key)
        while len(self._data) > self.max_size:
            self._data.popitem(last=False)
        return value

    def __len__(self) -> int:
        return len(self._data)


def executor_cache(name: str, max_size: int = 100, ttl_secs: float = 600.0) -> TTLCache:
    """Worker-local named singleton: same name -> same cache within one
    Python worker process; never shipped through closures."""
    cache = _REGISTRY.get(name)
    if cache is None:
        cache = _REGISTRY[name] = TTLCache(max_size, ttl_secs)
    return cache
