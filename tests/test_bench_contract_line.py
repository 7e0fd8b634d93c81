"""The bench's final stdout line must parse from the driver's ~2 KB tail
AND carry a per-query map (round-12 fix: PERF per_query sat empty in
rounds 10-11 because the final line had no "queries" key, while the full
map's line was too long to parse — round-2's "parsed": null incident).
Pins: budget respected, valid JSON, heaviest-first selection, headline
fields intact, and the full-bench name set still fits >= 50 entries.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _result(per_query, total=None, census=True):
    r = {
        "queries": per_query,
        "metric": "headline_queries_total_wall",
        "unit": "sec",
        "sf": 0.1,
        "value": round(total if total is not None else sum(per_query.values()), 3),
    }
    if census:
        r["cache_census"] = {
            "memo_entries": 140,
            "persisted_entries": 38,
            "jvm_persistent_rdds": 39,
            "jvm_jit_ms": 829484,
        }
    return r


def test_small_map_included_whole():
    pq = {f"q{i}": 0.5 + i / 100 for i in range(20)}
    line = bench.contract_line(_result(pq))
    p = json.loads(line)
    assert p["queries_omitted"] == 0
    assert len(p["queries"]) == 20
    assert p["metric"] == "headline_queries_total_wall"
    assert p["unit"] == "sec" and p["sf"] == 0.1
    assert len(line) <= bench.CONTRACT_LINE_BUDGET + 2


def test_full_bench_names_fit_under_budget_with_heavy_first():
    # Realistic shape: every headline name, value grows with index so the
    # selection order is deterministic and verifiable.
    pq = {n: round(0.1 + i * 0.01, 3) for i, n in enumerate(bench.HEADLINE)}
    line = bench.contract_line(_result(pq))
    assert len(line) <= bench.CONTRACT_LINE_BUDGET + 2
    p = json.loads(line)
    assert p["n_queries"] == len(bench.HEADLINE)
    assert len(p["queries"]) + p["queries_omitted"] == len(bench.HEADLINE)
    assert len(p["queries"]) >= 50, "packing regressed: <50 entries fit"
    # the heaviest query must be present; the packed set must dominate
    # the omitted set (greedy can skip a long name for a shorter one, but
    # every omitted weight must not exceed the max included weight)
    heaviest = max(pq, key=pq.get)
    assert heaviest in p["queries"]
    included = set(p["queries"])
    max_omitted = max((v for n, v in pq.items() if n not in included), default=0.0)
    assert max_omitted <= max(p["queries"].values())
    # short cache census included, heavyweight keys dropped
    assert p["cache_census"] == {
        "memo_entries": 140,
        "persisted_entries": 38,
        "jvm_persistent_rdds": 39,
    }


def test_values_rounded_to_2dp_and_json_compact():
    pq = {"alpha": 1.23456, "beta": 0.98765}
    p = json.loads(bench.contract_line(_result(pq)))
    assert p["queries"] == {"alpha": 1.23, "beta": 0.99}


def test_no_census_key_when_absent():
    pq = {"alpha": 1.0}
    p = json.loads(bench.contract_line(_result(pq, census=False)))
    assert "cache_census" not in p
