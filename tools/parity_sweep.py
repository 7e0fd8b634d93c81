"""Full-contract oracle-parity sweep -> PARITY_r{N}.json (r8-VERDICT #8).

Runs EVERY ``queries()`` entry against its DuckDB oracle with the full
driver check (rows + type-class schema + null-safe value hash —
``tests.oracle.compare``) and records the result as a standalone,
per-round artifact. This is the same coverage as the pytest sweep
(tests/test_oracle_parity.py, marker ``parity``) but replayable outside
pytest and archived per round; unit iteration runs ``-m "not parity"``
and relies on this artifact for the sweep evidence.

Usage:
    python tools/parity_sweep.py [--sf /root/testdata/sf0.001]
                                 [--out PARITY_r09.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="PARITY_sweep.json")
    args = ap.parse_args()

    import __spark_entry__ as E
    from ssiintegrateddatapipeline_spark import get_spark
    from tests.oracle import compare

    q, o = E.queries(), E.oracle_sql()
    spark = get_spark(app_name="parity-sweep", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    n_pass = n_rows_only = 0
    t_start = time.time()
    for name in sorted(q):
        t0 = time.time()
        try:
            if name in o:
                ok, msg = compare(spark, args.sf, q[name], o[name])
                kind = "hash"
            else:
                n = q[name](spark, args.sf).count()
                ok, msg, kind = n >= 0, f"{n} rows", "rows-only"
                n_rows_only += 1
        except Exception as exc:  # a crash is a FAIL, not a skip
            ok, msg, kind = False, f"EXCEPTION {exc}", "error"
        results[name] = {
            "pass": bool(ok),
            "check": kind,
            "detail": "ok" if ok else str(msg)[:400],
            "secs": round(time.time() - t0, 2),
        }
        n_pass += int(ok)
        print(f"{'PASS' if ok else 'FAIL'} {name} ({results[name]['secs']}s)")

    payload = {
        "sf_dir": args.sf,
        "contract_size": len(q),
        "oracles": len(o),
        "rows_only": n_rows_only,
        "passed": n_pass,
        "failed": len(q) - n_pass,
        "total_secs": round(time.time() - t_start, 1),
        "results": results,
    }
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(f"\n{n_pass}/{len(q)} passed -> {args.out}")
    if n_pass != len(q):
        sys.exit(1)


if __name__ == "__main__":
    main()
