"""Scale-regression threshold test (r7-VERDICT task 6).

Pins the historically risky queries — the ones whose scale behavior has
already regressed once and been fixed — to a wall-time growth bound under
a 3× key-shifted data replica, so a future super-linear regression
(quadratic pair blowup, an AQE broadcast→SMJ downgrade, a lineage
explosion) fails the suite instead of surfacing at the bench.

History being guarded:
- analytics_markov_kstep: AQE degraded its tiny-aggregate joins to SMJ at
  30× until they were broadcast-pinned (round 7: 1.74× → 1.03×).
- similarity_ivf_probe_sweep: the corpus side rode 2 file splits until
  spread (round 7: 13.1× → 3.28× at 30×).
- graph_hits_purchase: per-step L1 normalization branched the lineage
  2^steps until rewritten as integer path counts (round 7: 50 s → linear).
- trade_eth_tx_sign: per-row pure-Python keccak constant (round 8:
  batched; the bound now holds the vectorized kernel to linear).
- dedup_minhash_lsh_pairs: banded LSH must stay candidate-pair-bounded.

The bound is deliberately loose (wall ratio ≤ 3× data ratio = 9 under
best-of-2 warm timing) — a real quadratic shows up as ≥ k², host noise
does not get near the bound. The 3× replica of the test SF builds once
per session in /tmp via tools/scale_probe.build_scaled_dir.
"""

from __future__ import annotations

import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_DIR  # noqa: E402

K = 3
WALL_RATIO_CAP = 3.0 * K  # quadratic would be ~k^2 and beyond

GUARDED = [
    "analytics_markov_kstep",
    "similarity_ivf_probe_sweep",
    "graph_hits_purchase",
    "trade_eth_tx_sign",
    "dedup_minhash_lsh_pairs",
]


@pytest.fixture(scope="module")
def scaled_dir():
    from tools.scale_probe import build_scaled_dir

    tag = "thr_" + os.path.basename(SF_DIR.rstrip("/")) + "_x"
    return build_scaled_dir(K, base=SF_DIR, tag=tag)


def _best_of(fn, spark, sf, runs=2):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf).toPandas()
        best = min(best, time.perf_counter() - t0)
    return best


def test_guarded_queries_scale_near_linear(spark, scaled_dir):
    import __spark_entry__ as E

    queries = E.queries()
    failures = []
    for name in GUARDED:
        fn = queries[name]
        fn(spark, SF_DIR).toPandas()  # warm both plans off the clock
        fn(spark, scaled_dir).toPandas()
        t_base = _best_of(fn, spark, SF_DIR)
        t_scaled = _best_of(fn, spark, scaled_dir)
        ratio = t_scaled / t_base
        if ratio > WALL_RATIO_CAP:
            failures.append(f"{name}: {t_base:.2f}s -> {t_scaled:.2f}s "
                            f"= {ratio:.1f}x (cap {WALL_RATIO_CAP:g})")
    assert not failures, "super-linear scale regression:\n" + "\n".join(failures)
