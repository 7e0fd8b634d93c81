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


def test_snapshot_diff_classes_partition_key_space(spark, sf_dir):
    """Diff classes must partition the union of snapshot keys, and every
    class the gates can produce must be present."""
    from ssiintegrateddatapipeline_spark.operators.transform import snapshot_diff
    from ssiintegrateddatapipeline_spark.sources.batch import load_table

    rows = {r.diff_class: r.n_rows for r in snapshot_diff(spark, sf_dir).collect()}
    assert set(rows) == {"added", "removed", "changed", "unchanged"}
    n_orders = load_table(spark, sf_dir, "orders").count()
    # union of old/new keys = all orders minus keys dropped from both sides
    assert n_orders * 0.99 <= sum(rows.values()) <= n_orders
    # ~1/16 gates; allow generous band
    assert 0.02 < rows["added"] / n_orders < 0.11
    assert 0.02 < rows["removed"] / n_orders < 0.11


def test_weighted_sample_biases_toward_high_value(spark, sf_dir):
    """Importance sampling must lift the mean value of the kept set above
    the population mean (keep probability is proportional to value)."""
    from pyspark.sql import functions as F

    from ssiintegrateddatapipeline_spark.operators.sampling import (
        weighted_sample_stats,
    )
    from ssiintegrateddatapipeline_spark.sources.batch import load_table

    stats = weighted_sample_stats(spark, sf_dir).collect()
    kept = sum(r.kept for r in stats)
    kept_value = sum(r.kept_value for r in stats)
    ev = load_table(spark, sf_dir, "events")
    pop = ev.agg(F.count("*").alias("n"), F.avg("value").alias("avg")).first()
    assert 0 < kept < pop.n
    assert kept_value / kept > pop.avg


def test_provenance_chain_recomputable(spark, sf_dir):
    """stage_hash must be sha256(ingest_hash || '|' || stage tag) — the
    chain is verifiable from the previous link alone."""
    import hashlib

    from ssiintegrateddatapipeline_spark.operators.transform import (
        PROVENANCE_STAGE,
        provenance_tags,
    )

    for r in provenance_tags(spark, sf_dir).limit(20).collect():
        want = hashlib.sha256(
            f"{r.ingest_hash}|{PROVENANCE_STAGE}".encode()
        ).hexdigest()
        assert r.stage_hash == want


def test_rolling_distinct_users_window_bounds(spark, sf_dir):
    """WAU is bounded below by DAU and above by the 7-day DAU sum, and
    per-day DAU equals a direct distinct count."""
    from pyspark.sql import functions as F

    from ssiintegrateddatapipeline_spark.operators.analytics import (
        rolling_distinct_users,
    )
    from ssiintegrateddatapipeline_spark.sources.batch import load_table

    got = {r.day: r for r in rolling_distinct_users(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    direct = {
        r.day: r.dau
        for r in ev.select(F.to_date("ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("dau"))
        .collect()
    }
    import datetime as dt

    lo, hi = min(direct), max(direct)
    calendar = {lo + dt.timedelta(days=i) for i in range((hi - lo).days + 1)}
    assert set(got) == calendar  # gap-free spine over the observed range
    days = sorted(got)
    for i, d in enumerate(days):
        assert got[d].dau == direct.get(d, 0)
        assert got[d].wau_trailing_7d >= got[d].dau
        window_days = [x for x in days[max(0, i - 6) : i + 1]]
        assert got[d].wau_trailing_7d <= sum(direct.get(x, 0) for x in window_days)


def test_rolling_distinct_users_gap_day(spark):
    """A calendar day with zero events must still emit a row: dau=0 and
    the trailing-7d WAU carried from neighbouring days."""
    import datetime as dt

    from ssiintegrateddatapipeline_spark.operators.analytics import (
        _rolling_distinct_from,
    )

    d0 = dt.date(2024, 1, 1)
    day_users = spark.createDataFrame(
        [(d0, "u1"), (d0, "u2"), (d0 + dt.timedelta(days=2), "u2")],
        "d date, user_id string",
    )
    got = {r.day: r for r in _rolling_distinct_from(day_users).collect()}
    gap = d0 + dt.timedelta(days=1)
    assert set(got) == {d0, gap, d0 + dt.timedelta(days=2)}
    assert got[gap].dau == 0
    assert got[gap].wau_trailing_7d == 2  # u1+u2 from day 0
    assert got[d0 + dt.timedelta(days=2)].dau == 1
    assert got[d0 + dt.timedelta(days=2)].wau_trailing_7d == 2


def test_weighted_gate_drops_negative_and_zero_weights(spark):
    """Regression: a negative value used to format as 16-char two's-
    complement hex ('ffff…') that compares greater than any 4-char hash
    prefix — keeping EVERY negative row. The clamped gate keeps none."""
    from pyspark.sql import functions as F

    from ssiintegrateddatapipeline_spark.operators.sampling import (
        W_CAP,
        weighted_keep_predicate,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate([-500.0, -0.01, 0.0, W_CAP, W_CAP * 2])],
        "event_id long, value double",
    )
    kept = df.where(
        weighted_keep_predicate(F.col("value"), F.col("event_id"))
    ).collect()
    kept_vals = sorted(r.value for r in kept)
    assert all(v >= W_CAP for v in kept_vals)  # negatives and zero dropped
    assert kept_vals == [W_CAP, W_CAP * 2]  # at-cap rows always kept
