"""Drift guard for the documented contract sizes (round-6 VERDICT task 6).

README's headline claim ("**N queries, all M DuckDB-oracle-checked**") is
prose around generated numbers; rounds 5 and 6 both caught hand-edited
copies drifting from the live registry. This test pins the README claim to
the live `__spark_entry__` contract, so any query addition that forgets the
doc (or doc edit that invents a count) fails the suite. Counts come from
the same source as tools/contract_counts.py.
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E


def test_readme_contract_counts_match_registry():
    readme = open(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "README.md")
    ).read()
    m = re.search(r"\*\*(\d+) queries, all (\d+)\s*\nDuckDB-oracle-checked\*\*", readme)
    assert m, "README contract-claim sentence not found (format changed?)"
    q, o = E.queries(), E.oracle_sql()
    assert int(m.group(1)) == len(q), (
        f"README claims {m.group(1)} queries, registry has {len(q)} — "
        "regenerate with tools/contract_counts.py"
    )
    assert int(m.group(2)) == len(o), (
        f"README claims {m.group(2)} oracles, registry has {len(o)} — "
        "regenerate with tools/contract_counts.py"
    )


def test_every_query_has_an_oracle():
    q, o = E.queries(), E.oracle_sql()
    assert sorted(set(o) - set(q)) == [], "oracles without a query"
    assert sorted(set(q) - set(o)) == [], (
        "queries without an oracle — genuinely non-SQL-expressible ops may "
        "omit theirs, but every omission so far has been an accident; "
        "list intentional ones explicitly here if that changes"
    )


def test_bench_headline_is_a_subset_of_the_contract():
    import bench

    q = E.queries()
    missing = [n for n in bench.HEADLINE if n not in q]
    assert missing == [], f"bench HEADLINE names unknown queries: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate headline"
