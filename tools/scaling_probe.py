"""Core-count scaling probe with storm adjudication (r11 VERDICT task 7).

The driver benches at $SPARK_GRAFT_CPUS=32 and again at 8, but those are
two separate ~20-min runs — on a stormy box the per-query 8/32 ratios
were uninterpretable (several read <1). This probe measures the ratio
for the heaviest queries back-to-back in ONE process:

    session A (32 cores): warm + median-of-3 per query
    session B (8 cores):  warm + median-of-3 per query
    session C (32 cores): 1 run per query  — drift check: if C ~= A the
                          box held still and the 8/32 ratios are real

A fixed 10M-iteration Python loop is timed before each session; if the
loop drifts >15% the probe says so. Results -> JSON (for plans/rN/) and
a markdown table on stdout.

Usage: python tools/scaling_probe.py [--top N] [--names a,b,c]
            [--out plans/r12/scaling_probe.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def pyloop() -> float:
    t = time.perf_counter()
    s = 0
    for i in range(10_000_000):
        s += i
    return round(time.perf_counter() - t, 3)


def run_session(cpus: int, names: list[str], n_runs: int) -> dict[str, float]:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    import __spark_entry__ as E
    from ssiintegrateddatapipeline_spark.caches import clear_caches
    from ssiintegrateddatapipeline_spark.session import get_spark

    q = E.queries()
    spark = get_spark(app_name=f"scaling-probe-c{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    for name in names:  # warm pass: fixtures, JIT, plan analysis
        try:
            q[name](spark, SF).toPandas()
        except Exception as exc:
            print(f"# warm {name} failed: {exc}", file=sys.stderr)
    for name in names:
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            q[name](spark, SF).toPandas()
            runs.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(runs), 3)
        print(f"# c{cpus} {name}: {out[name]:.3f}", file=sys.stderr, flush=True)
    clear_caches(spark)
    spark.stop()
    # a fresh session in the same process needs the JVM gateway reset-free
    # path: get_spark builds a new SparkSession; stopping is enough.
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--names", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--low-cpus", type=int, default=8)
    args = ap.parse_args()

    if args.names:
        names = [n.strip() for n in args.names.split(",") if n.strip()]
    else:
        with open(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "bench_last.json")
        ) as fh:
            pq = json.load(fh)["queries"]
        names = [n for n, _ in sorted(pq.items(), key=lambda kv: -kv[1])][
            : args.top
        ]
    print(f"# probe set: {names}", file=sys.stderr)

    cal = [pyloop()]
    a32 = run_session(32, names, 3)
    cal.append(pyloop())
    b8 = run_session(args.low_cpus, names, 3)
    cal.append(pyloop())
    c32 = run_session(32, names, 1)
    cal.append(pyloop())

    drift = max(cal) / min(cal)
    result = {
        "sf_dir": SF,
        "calibration_loop_s": cal,
        "calibration_drift": round(drift, 3),
        "names": names,
        "c32": a32,
        f"c{args.low_cpus}": b8,
        "c32_recheck": c32,
        "ratio": {
            n: round(b8[n] / a32[n], 2)
            for n in names
            if a32.get(n) and b8.get(n)
        },
        "recheck_ratio": {
            n: round(c32[n] / a32[n], 2)
            for n in names
            if a32.get(n) and c32.get(n)
        },
    }
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1, sort_keys=True)
    print(f"| query | c32 s | c{args.low_cpus} s | ratio | c32 recheck |")
    print("|---|---|---|---|---|")
    for n in names:
        print(
            f"| {n} | {a32.get(n)} | {b8.get(n)} | "
            f"{result['ratio'].get(n)} | {c32.get(n)} |"
        )
    print(
        f"calibration loop: {cal} (drift {drift:.2f}x"
        f"{' — STORMY, rerun' if drift > 1.15 else ''})"
    )


if __name__ == "__main__":
    main()
