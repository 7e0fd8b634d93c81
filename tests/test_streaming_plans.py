"""Plan-quality bans for STREAMING queries (r8-VERDICT #7).

The batch census (tests/test_plan_quality.py / test_plan_bounds.py)
cannot see micro-batch plans — they only exist inside the runner. The
CAPTURE_PLANS hook (streaming/pipeline.py) records the last trigger's
sink-side plan plus the inner batch plan of foreachBatch queries; this
test drives a representative query per streaming family and bans the
plan shapes that never belong in a micro-batch:

- ``CartesianProduct``: a data-sized cross product inside a trigger;
- ``BatchEvalPython``: row-at-a-time Python (Arrow kernels print as
  ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas);
- ``SortMergeJoin``: per-trigger inputs are micro-batch-sized — every
  join must ride broadcast (stream-static) or the streaming symmetric
  hash join (stream-stream), never a full shuffle-sort of both sides.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entry_mod
from ssiintegrateddatapipeline_spark.streaming import pipeline as SP

# one representative per streaming family (gate / stateful / window /
# join / store-fold / online-index)
REPRESENTATIVES = [
    "streaming_online_dedup",
    "streaming_user_stats",
    "streaming_neardup_gate",
    "streaming_attribution",
    "streaming_store_mutations",
    "streaming_session_windows",
]

_BANNED = {
    "CartesianProduct": re.compile(r"CartesianProduct"),
    "BatchEvalPython": re.compile(r"BatchEvalPython"),
    "SortMergeJoin": re.compile(r"SortMergeJoin"),
}

_QUERIES = entry_mod.queries()


@pytest.mark.parametrize(
    "name", [n for n in REPRESENTATIVES if n in _QUERIES]
)
def test_streaming_micro_batch_plans_are_clean(spark, sf_dir, name):
    SP.CAPTURE_PLANS = True
    SP.CAPTURED_PLANS.clear()
    try:
        _QUERIES[name](spark, sf_dir).toPandas()
    finally:
        SP.CAPTURE_PLANS = False
    plans = list(SP.CAPTURED_PLANS)
    assert plans, f"{name}: runner captured no micro-batch plan"
    for tag, plan in plans:
        for ban, pat in _BANNED.items():
            assert not pat.search(plan), (
                f"{name} [{tag}]: banned node {ban} in micro-batch plan:\n"
                f"{plan[:2000]}"
            )
