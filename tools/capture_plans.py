"""Capture .explain("formatted") for named contract queries (guide §7.2).

Writes one text file per query to --out-dir, suffixed with --suffix
(_before / _after): the round's plan-diff evidence for OPTIMIZATION_rN.md.
Run from the repo root whose code should produce the plans:

    python tools/capture_plans.py --names q1,q2 \
        --out-dir /root/repo/plans/r11 --suffix _after \
        [--sf /root/testdata/sf0.1]

Streaming queries (eagerly drained inside the query function) emit the
plan of the RETURNED snapshot; the note at the top of each file says so.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True, help="comma-separated query names")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import __spark_entry__ as E
    from ssiintegrateddatapipeline_spark import get_spark

    q = E.queries()
    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out_dir, exist_ok=True)
    for name in args.names.split(","):
        name = name.strip()
        if not name:
            continue
        df = q[name](spark, args.sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        hdr = f"-- {name} ({args.suffix.strip('_')}) sf={args.sf}\n"
        if name.startswith("streaming_"):
            hdr += (
                "-- NOTE: streaming query — the stream is drained eagerly "
                "inside the query function; this is the plan of the returned "
                "snapshot DataFrame.\n"
            )
        path = os.path.join(args.out_dir, f"{name}{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(hdr + plan)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
