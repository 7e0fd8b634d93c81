"""Edge-case unit tests for the newest operators: as-of join semantics,
salted-join equivalence, and connected-component correctness on random
graphs (property-tested against a plain BFS reference)."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.functions.skew import salted_join
from ssiintegrateddatapipeline_spark.operators.asof import asof_join


def _ts(sec: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts(100), "p1"), (1, _ts(10), "p0"), (2, _ts(50), "p2")],
        "user_id long, lts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(100), 900),  # exact tie with p1 -> counts (<=)
            (1, _ts(60), 901),
            (2, _ts(70), 902),  # after p2 -> must NOT match
        ],
        "user_id long, rts timestamp, rid long",
    )
    out = {
        r["pid"]: r["asof_rid"]
        for r in asof_join(
            left, right, "user_id", "lts", "rts", ["rid", "rts"], tiebreak="rid"
        ).collect()
    }
    assert out["p1"] == 900  # tie at same ts matches, later right preferred
    assert out["p0"] is None  # no right row at or before
    assert out["p2"] is None  # only later right rows exist


def test_asof_join_tiebreak_same_timestamp(spark):
    left = spark.createDataFrame([(1, _ts(100), "p")], "k long, lts timestamp, pid string")
    right = spark.createDataFrame(
        [(1, _ts(100), 5), (1, _ts(100), 9)], "k long, rts timestamp, rid long"
    )
    row = asof_join(left, right, "k", "lts", "rts", ["rid"], tiebreak="rid").collect()[0]
    # ordered by (_ts, _side, rid asc): the LAST right row carried is rid=9
    assert row["asof_rid"] == 9


def test_salted_join_equals_plain_join(spark, sf_dir):
    from ssiintegrateddatapipeline_spark.sources.batch import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("user_id").alias("k")
    )
    dim = load_table(spark, sf_dir, "events").groupBy(
        F.col("user_id").alias("k")
    ).agg(F.count("*").alias("cnt"))
    salted = salted_join(ev, dim, "k", F.col("event_id"), n_salts=4)
    plain = ev.join(dim, "k")
    assert sorted(map(tuple, salted.select("event_id", "k", "cnt").collect())) == sorted(
        map(tuple, plain.select("event_id", "k", "cnt").collect())
    )


def _bfs_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out: dict[int, int] = {}
    for start in adj:
        if start in out:
            continue
        comp = [start]
        seen = {start}
        while comp:
            cur = comp.pop()
            for nxt in adj[cur]:
                if nxt not in seen:
                    seen.add(nxt)
                    comp.append(nxt)
        root = min(seen)
        for node in seen:
            out[node] = root
    return out


@settings(max_examples=25, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=40,
    )
)
def test_union_find_matches_bfs(pairs):
    # mirror of the union-find inside near_dup_clusters, tested pure
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    got = {doc: find(doc) for doc in parent}
    assert got == _bfs_components(pairs)


def test_range_lookup_strategies_agree(spark, sf_dir):
    """The bucketed equi-join formulation must produce exactly the rows of
    the semantic-baseline broadcast non-equi join, including a value that
    sits exactly on a band boundary."""
    from ssiintegrateddatapipeline_spark.operators.asof import PRICE_BANDS, range_lookup

    facts = spark.createDataFrame(
        [(0.0,), (4999.99,), (5000.0,), (79999.999,), (80000.0,), (104997.88,)],
        "l_extendedprice double",
    )
    a = sorted(
        map(tuple, range_lookup(facts, "l_extendedprice", PRICE_BANDS).collect())
    )
    b = sorted(
        map(
            tuple,
            range_lookup(
                facts, "l_extendedprice", PRICE_BANDS, strategy="broadcast_nl"
            ).collect(),
        )
    )
    assert a == b and len(a) == 6


def test_scd2_intervals_cover_and_do_not_overlap(spark, sf_dir):
    """Per customer: intervals sorted by valid_from must chain exactly
    (each valid_to == next valid_from), exactly one open (current) row,
    and consecutive rows never share a tier (true type-2 compression)."""
    from ssiintegrateddatapipeline_spark.operators.scd import customer_tier_scd2

    rows = customer_tier_scd2(spark, sf_dir).collect()
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r.custkey, []).append(r)
    assert by_cust
    for cust, rs in by_cust.items():
        rs.sort(key=lambda r: r.valid_from_year)
        assert sum(1 for r in rs if r.is_current) == 1
        assert rs[-1].valid_to_year is None and rs[-1].is_current
        for a_row, b_row in zip(rs, rs[1:]):
            assert a_row.valid_to_year == b_row.valid_from_year
            assert a_row.tier != b_row.tier


def test_sequence_pack_edge_semantics(spark):
    """Greedy packing invariants: an oversized doc keeps its own
    (overflowing) bin without stranding followers; bins never exceed
    capacity unless a single doc does; order within a group is by doc_id."""
    from ssiintegrateddatapipeline_spark.operators.transform import pack_into_bins

    rows = [
        # group 0: 300+200 fit (cap 512), 600 oversized alone, 100 starts next
        (0, 1, 300), (0, 2, 200), (0, 3, 600), (0, 4, 100),
        # group 1: exact-capacity doc, then another
        (1, 5, 512), (1, 6, 1),
    ]
    base = spark.createDataFrame(rows, "group_id long, doc_id long, n_tokens int")
    out = {
        (r.group_id, r.doc_id): r.bin_id
        for r in pack_into_bins(base, 512).collect()
    }
    assert out == {(0, 1): 0, (0, 2): 0, (0, 3): 1, (0, 4): 2,
                   (1, 5): 0, (1, 6): 1}
