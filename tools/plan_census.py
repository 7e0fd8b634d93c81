"""Plan census: dump per-query physical-plan statistics for every BATCH
contract query into PLANS.md — the at-a-glance audit of the engine's
plan hygiene (how many shuffles, what broadcasts, any Python boundary,
codegen coverage).

Counted per query (from ``executedPlan().toString()``):

- ``exchanges``      hash/range shuffles (``Exchange hashpartitioning`` /
                     ``rangepartitioning``) — each is a full shuffle of its
                     input; fewer is better at fixed semantics
- ``single_part``    ``Exchange SinglePartition`` occurrences — the global
                     serialization point tests/test_plan_quality.py bans for
                     unbounded inputs (bounded-by-construction inputs only)
- ``bhj``            BroadcastHashJoin count — dims/aggregates riding the
                     broadcast path instead of shuffling the fact side
- ``smj``            SortMergeJoin count — the shuffle-join path (expected
                     only for fact-to-fact joins)
- ``nlj``            nested-loop / cartesian joins — should be bounded
                     broadcast fanouts only
- ``py``             Python boundaries (ArrowEvalPython / FlatMapGroupsInPandas
                     / MapInPandas …) — the Arrow-batched kernels (crypto,
                     codecs, multimodal); anything else is a bug
- ``wscg``           WholeStageCodegen span count (JVM-compiled pipeline
                     stages)
- ``scans``          parquet file scans (after session-cache reuse)

Streaming queries are skipped: their plan only materializes inside the
micro-batch runner (and several execute eagerly in their builder).

Usage: python tools/plan_census.py [sf_dir] > /dev/null  (writes PLANS.md)

``--bounds`` mode instead snapshots STATIC (pre-AQE) plan counts for the
regression-relevant metrics (exchanges, single-partition exchanges,
sort-merge / nested-loop joins, Python boundaries) into
tests/fixtures/plan_bounds.json — the `_PLAN_BOUNDS` registry that
tests/test_plan_bounds.py enforces: a lost broadcast, a new shuffle, or
a new Python stage in ANY batch contract query fails CI the way state
growth already does. Static plans are used on both sides (snapshot and
test) so no query has to execute; AQE runtime improvements (e.g.
SMJ->BHJ downgrades) stay out of scope by construction.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from ssiintegrateddatapipeline_spark.session import get_spark

_SKIP_PREFIXES = ("streaming_",)
# feed-drain / spool-backed queries whose returned frame is a local replay,
# not the computation's plan
_SKIP_EXACT = {"source_trade_feed_stream"}

_PATTERNS = {
    "exchanges": re.compile(r"Exchange (?:hashpartitioning|rangepartitioning)"),
    "single_part": re.compile(r"Exchange SinglePartition"),
    "bhj": re.compile(r"BroadcastHashJoin"),
    "smj": re.compile(r"SortMergeJoin"),
    "nlj": re.compile(r"BroadcastNestedLoopJoin|CartesianProduct"),
    "py": re.compile(
        r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas|BatchEvalPython"
    ),
    "scans": re.compile(r"FileScan parquet|Scan parquet"),
}
# codegen stages print as `*(<id>)` operator prefixes; count DISTINCT ids
_WSCG = re.compile(r"\*\((\d+)\)")


BOUND_KEYS = ("exchanges", "single_part", "smj", "nlj", "py")


def static_counts(df) -> dict:
    """Regression-relevant counts from the STATIC (pre-AQE) plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    return {k: len(_PATTERNS[k].findall(plan)) for k in BOUND_KEYS}


def write_bounds(sf_dir: str, merge: bool = False) -> None:
    """Snapshot every batch query's static-plan shape. ``merge=True`` keeps
    the existing fixture and computes only queries it doesn't cover yet —
    the cheap path when landing a handful of new contract queries (a full
    regen re-analyzes ~300 plans; run it when bounds should TIGHTEN)."""
    import json

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "plan_bounds.json",
    )
    bounds = {}
    if merge and os.path.exists(out):
        with open(out) as fh:
            bounds = json.load(fh)
    spark = get_spark(app_name="plan-bounds")
    queries = entry_mod.queries()
    # drop fixture entries whose query no longer exists
    bounds = {k: v for k, v in bounds.items() if k in queries}
    added = 0
    for name in sorted(queries):
        if name.startswith(_SKIP_PREFIXES) or name in _SKIP_EXACT:
            continue
        if merge and name in bounds:
            continue
        try:
            bounds[name] = static_counts(queries[name](spark, sf_dir))
            added += 1
        except Exception as exc:
            print(f"# {name}: ERROR {exc}", file=sys.stderr)
    with open(out, "w") as fh:
        json.dump(bounds, fh, indent=1, sort_keys=True)
    print(f"{out} written: {len(bounds)} queries ({added} computed)")


def main() -> None:
    if "--bounds" in sys.argv:
        merge = "--merge" in sys.argv
        args = [a for a in sys.argv[1:] if a not in ("--bounds", "--merge")]
        write_bounds(args[0] if args else "/root/testdata/sf0.01", merge=merge)
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="plan-census")
    queries = entry_mod.queries()
    rows = []
    for name in sorted(queries):
        if name.startswith(_SKIP_PREFIXES) or name in _SKIP_EXACT:
            continue
        try:
            df = queries[name](spark, sf_dir)
            df.toPandas()  # finalize the AQE plan (codegen ids, reused
            # exchanges and runtime join downgrades only exist post-run)
            plan = df._jdf.queryExecution().executedPlan().toString()
            # AdaptiveSparkPlan prints the final plan followed by
            # "== Initial Plan ==" — keep only the final section or every
            # count doubles
            plan = plan.split("== Initial Plan ==")[0]
        except Exception as exc:  # census must not die on one query
            print(f"# {name}: ERROR {exc}", file=sys.stderr)
            continue
        counts = {k: len(p.findall(plan)) for k, p in _PATTERNS.items()}
        counts["wscg"] = len(set(_WSCG.findall(plan)))
        rows.append((name, counts))
        print(f"# {name}: {counts}", file=sys.stderr)

    # ---- streaming queries: micro-batch plans captured by the runners
    # (streaming/pipeline.py CAPTURE_PLANS hook, r8-VERDICT #7) — the
    # sink-side plan of the last trigger plus the inner batch plan for
    # foreachBatch queries. sf0.001 keeps the sweep short: the counted
    # plan SHAPES are data-size-independent.
    from ssiintegrateddatapipeline_spark.streaming import pipeline as SP

    stream_rows = []
    SP.CAPTURE_PLANS = True
    try:
        for name in sorted(queries):
            if not name.startswith("streaming_"):
                continue
            SP.CAPTURED_PLANS.clear()
            try:
                queries[name](spark, "/root/testdata/sf0.001").toPandas()
            except Exception as exc:
                print(f"# {name}: ERROR {exc}", file=sys.stderr)
                continue
            plans = list(SP.CAPTURED_PLANS)
            text = "\n".join(p for _, p in plans)
            counts = {k: len(p.findall(text)) for k, p in _PATTERNS.items()}
            counts["wscg"] = len(_WSCG.findall(text))  # ids reset per plan
            counts["plans"] = len(plans)
            stream_rows.append((name, counts))
            print(f"# {name}: {counts}", file=sys.stderr)
    finally:
        SP.CAPTURE_PLANS = False

    hdr = ["query", "exchanges", "single_part", "bhj", "smj", "nlj", "py",
           "wscg", "scans"]
    lines = [
        "# Plan census (batch contract queries, AQE-final physical plans)",
        "",
        f"Generated by tools/plan_census.py at {sf_dir}. Streaming queries",
        "are censused separately below from their captured micro-batch",
        "plans (last trigger per runner; see streaming/pipeline.py",
        "CAPTURE_PLANS).",
        "`single_part` counts include the final one-row reduce of global",
        "scalar aggregates (bounded: one partial row per task) — the plan",
        "tests ban only windows/sorts fed by UNBOUNDED single-partition",
        "exchanges. `nlj` entries are bounded broadcast fanouts (1-row",
        "aggregate cross joins). `py` > 0 entries are the Arrow-batched",
        "kernels (crypto / avro codec / multimodal decode).",
        "",
        "| " + " | ".join(hdr) + " |",
        "|" + "---|" * len(hdr),
    ]
    for name, c in rows:
        lines.append(
            f"| {name} | {c['exchanges']} | {c['single_part']} | {c['bhj']} "
            f"| {c['smj']} | {c['nlj']} | {c['py']} | {c['wscg']} "
            f"| {c['scans']} |"
        )
    totals = {k: sum(c[k] for _, c in rows) for k in rows[0][1]}
    lines += [
        "",
        f"**{len(rows)} queries** — totals: {totals['exchanges']} shuffles, "
        f"{totals['single_part']} single-partition exchanges, "
        f"{totals['bhj']} broadcast joins vs {totals['smj']} sort-merge "
        f"joins, {totals['nlj']} nested-loop joins, {totals['py']} Python "
        f"boundaries, {totals['wscg']} codegen spans over "
        f"{totals['scans']} parquet scans.",
        "",
    ]
    if stream_rows:
        shdr = ["query", "plans", "exchanges", "single_part", "bhj", "smj",
                "nlj", "py", "wscg", "scans"]
        lines += [
            "## Streaming queries (captured micro-batch plans, sf0.001)",
            "",
            "Counts are over the LAST trigger's plans per runner: the",
            "sink-side streaming plan plus, for foreachBatch queries, the",
            "inner batch plan that does the real work. `plans` = captured",
            "plan count (0 plans = the query's work happens in its builder",
            "or a sink callback the hook doesn't cover). `single_part`",
            "includes memory-sink collects of aggregate-sized results.",
            "",
            "| " + " | ".join(shdr) + " |",
            "|" + "---|" * len(shdr),
        ]
        for name, c in stream_rows:
            lines.append(
                f"| {name} | {c['plans']} | {c['exchanges']} "
                f"| {c['single_part']} | {c['bhj']} | {c['smj']} "
                f"| {c['nlj']} | {c['py']} | {c['wscg']} | {c['scans']} |"
            )
        st = {k: sum(c[k] for _, c in stream_rows) for k in stream_rows[0][1]}
        lines += [
            "",
            f"**{len(stream_rows)} streaming queries** — totals: "
            f"{st['plans']} captured plans, {st['exchanges']} shuffles, "
            f"{st['smj']} sort-merge joins, {st['nlj']} nested-loop joins, "
            f"{st['py']} Python boundaries.",
            "",
        ]
    with open("PLANS.md", "w") as fh:
        fh.write("\n".join(lines))
    print(f"PLANS.md written: {len(rows)} queries")


if __name__ == "__main__":
    main()
