"""Seeded random correctness sample — third-party-replayable evidence.

The driver's CORRECTNESS gate samples the contract alphabetically (50×
``analytics_*``), so queries later in the alphabet ride on the builder's
own sweeps. This tool draws a SEEDED random sample across the whole
contract, runs the full driver check (rows + schema + null-safe value
hash vs DuckDB — ``tests.oracle.compare``) for each, and writes
``VERIFY_r{N}.json``. Anyone can replay it: same seed → same sample.

Usage:
    python tools/verify_sample.py --seed 8 --k 50 [--sf /root/testdata/sf0.01]
                                  [--out VERIFY_r08.json]
    python tools/verify_sample.py --seeds 18,19 --k 50 ...   # r8-VERDICT #4:
        multiple DISJOINT samples in one artifact (later seeds exclude the
        queries earlier seeds drew, so 2x50 covers 100 distinct queries)
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--seeds", default=None, help="comma-separated; disjoint")
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    seeds = (
        [int(s) for s in args.seeds.split(",")]
        if args.seeds
        else [args.seed]
    )
    if seeds == [None]:
        ap.error("--seed or --seeds required")

    import __spark_entry__ as E
    from ssiintegrateddatapipeline_spark import get_spark
    from tests.oracle import compare

    q, o = E.queries(), E.oracle_sql()
    # sample only oracle-backed queries (the hash-comparable surface)
    names = sorted(n for n in q if n in o)

    spark = get_spark(app_name="verify-sample", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    samples = {}
    drawn: set[str] = set()
    for seed in seeds:
        # later seeds draw from the REMAINING pool: samples are disjoint by
        # construction and replayable (same seeds, same order -> same sets)
        pool = sorted(n for n in names if n not in drawn)
        rng = random.Random(seed)
        sample = sorted(rng.sample(pool, min(args.k, len(pool))))
        drawn.update(sample)
        samples[seed] = sample

    all_results = {}
    total_pass = total = 0
    for seed, sample in samples.items():
        results = {}
        n_pass = 0
        for name in sample:
            t0 = time.time()
            try:
                ok, msg = compare(spark, args.sf, q[name], o[name])
            except Exception as exc:  # a crash is a FAIL, not a skip
                ok, msg = False, f"EXCEPTION {exc}"
            results[name] = {
                "pass": bool(ok),
                "detail": "ok" if ok else msg[:400],
                "secs": round(time.time() - t0, 2),
            }
            n_pass += int(ok)
            print(f"{'PASS' if ok else 'FAIL'} {name} ({results[name]['secs']}s)")
        all_results[str(seed)] = {
            "k": len(sample),
            "passed": n_pass,
            "failed": len(sample) - n_pass,
            "results": results,
        }
        total_pass += n_pass
        total += len(sample)

    out = args.out or "VERIFY_sample.json"
    payload = {
        "seeds": seeds,
        "disjoint": True,
        "sf_dir": args.sf,
        "contract_size": len(names),
        "passed": total_pass,
        "failed": total - total_pass,
        "samples": all_results,
    }
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(f"\n{total_pass}/{total} passed -> {out}")
    if total_pass != total:
        sys.exit(1)


if __name__ == "__main__":
    main()
