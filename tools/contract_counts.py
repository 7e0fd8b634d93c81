"""Print the LIVE driver-contract sizes — queries, oracles, bench
headline — so round records copy numbers from the registry instead of
hand-maintaining them (r5 drifted: README said 259, COVERAGE 263,
actual 265).

Usage: python tools/contract_counts.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
import bench  # noqa: E402


def main() -> None:
    q, o = E.queries(), E.oracle_sql()
    missing = sorted(set(o) - set(q))
    extra = sorted(set(q) - set(o))
    print(f"queries: {len(q)}")
    print(f"oracles: {len(o)}")
    print(f"bench headline: {len(bench.HEADLINE)}")
    if missing:
        print(f"oracles without a query (BUG): {missing}")
    if extra:
        print(f"queries without an oracle: {extra}")


if __name__ == "__main__":
    main()
