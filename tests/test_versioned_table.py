"""Versioned table format (sources/versioned.py): ACID-property tests —
mid-commit crash recovery, optimistic-concurrency rebase, snapshot
isolation, file pruning, time travel, vacuum physical deletion."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.sources.batch import local_frame
from ssiintegrateddatapipeline_spark.sources.versioned import (
    CommitConflict,
    VersionedTable,
    VersionPrunedError,
)

SCHEMA = "k bigint, v string, n bigint"


def _frame(spark, rows):
    return local_frame(spark, rows, SCHEMA)


@pytest.fixture()
def table(spark, tmp_path):
    rows = [(i, f"v{i}", 1) for i in range(30)]
    return VersionedTable.create(
        spark, str(tmp_path / "t"), _frame(spark, rows), key="k",
        target_rows_per_file=10,  # 3 files: k∈[0,9],[10,19],[20,29]
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_create_and_snapshot(spark, table):
    assert table.latest_version() == 1
    assert len(_rows(table.snapshot())) == 30
    # multi-file layout with disjoint key ranges (stats recorded)
    c = table._read_commit(1)
    assert len(c["add"]) == 3
    ranges = sorted((a["min_key"], a["max_key"]) for a in c["add"])
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo  # repartitionByRange → tight, disjoint stats


def test_merge_upsert_and_file_pruning(spark, table):
    # updates touch only k∈[0,9] → exactly one file rewritten
    upd = _frame(spark, [(1, "new1", 5), (100, "ins", 7)])
    v = table.merge_into(upd, key="k")
    assert v == 2
    c = table._read_commit(2)
    assert len(c["remove"]) == 1  # only the [0,9] file
    got = dict((r[0], (r[1], r[2])) for r in table.snapshot().collect())
    assert got[1] == ("new1", 5)  # matched → replaced
    assert got[100] == ("ins", 7)  # unmatched → inserted
    assert got[0] == ("v0", 1) and got[29] == ("v29", 1)  # untouched
    assert len(got) == 31


def test_merge_when_matched_combines(spark, table):
    upd = _frame(spark, [(2, "u2", 10)])
    table.merge_into(
        upd,
        key="k",
        when_matched={"k": "t.k", "v": "s.v", "n": "t.n + s.n"},
    )
    got = dict((r[0], (r[1], r[2])) for r in table.snapshot().collect())
    assert got[2] == ("u2", 11)  # n accumulated, v taken from source


def test_snapshot_isolation_and_time_travel(spark, table):
    pinned = table.snapshot()  # resolved at v1 (file list frozen)
    table.merge_into(_frame(spark, [(3, "x", 9)]), key="k")
    # the pinned reader is untouched by the later commit (files immutable)
    assert dict((r[0], r[1]) for r in pinned.collect())[3] == "v3"
    # and explicit time travel reproduces it
    assert _rows(table.snapshot(version=1)) == _rows(pinned)
    assert dict((r[0], r[1]) for r in table.snapshot().collect())[3] == "x"


def test_delete_where_prunes_and_vacuum_removes(spark, table):
    v = table.delete_where(F.col("k") == 25, key="k")
    assert v == 2
    c = table._read_commit(2)
    assert len(c["remove"]) == 1  # only the file containing k=25
    assert len(_rows(table.snapshot())) == 29
    removed = table.vacuum(retain_last=1)
    assert len(removed) == 1  # the tombstoned pre-image physically gone
    for rel in removed:
        assert not os.path.exists(os.path.join(table.path, rel))
    # live snapshot fine, pre-delete history now unreadable
    assert len(_rows(table.snapshot())) == 29
    with pytest.raises(VersionPrunedError):
        table.snapshot(version=1).collect()


def test_delete_where_no_match_is_noop(spark, table):
    assert table.delete_where(F.col("k") == 10_000, key="k") == 1
    assert table.latest_version() == 1


def test_crash_before_commit_leaves_snapshot_intact(spark, table, monkeypatch):
    """Kill-mid-commit recovery: data files written, commit never
    published → readers see nothing; the retried merge succeeds; vacuum
    sweeps the orphans."""
    before = _rows(table.snapshot())

    def boom(self, *a, **kw):
        raise RuntimeError("killed before commit")

    monkeypatch.setattr(VersionedTable, "_commit", boom)
    with pytest.raises(RuntimeError):
        table.merge_into(_frame(spark, [(1, "crash", 9)]), key="k")
    monkeypatch.undo()

    # invisible: log unchanged, snapshot identical
    assert table.latest_version() == 1
    assert _rows(table.snapshot()) == before
    orphans = [
        f
        for f in os.listdir(os.path.join(table.path, "data"))
        if os.path.join("data", f)
        not in {a["path"] for a in table._read_commit(1)["add"]}
    ]
    assert orphans  # the crashed writer's files linger, unreferenced

    # retry succeeds, vacuum sweeps the orphans (and nothing live)
    table.merge_into(_frame(spark, [(1, "crash", 9)]), key="k")
    got = dict((r[0], r[1]) for r in table.snapshot().collect())
    assert got[1] == "crash"
    removed = table.vacuum(retain_last=table.latest_version())
    assert set(removed) >= {os.path.join("data", f) for f in orphans}
    assert len(_rows(table.snapshot())) == 30


def test_commit_conflict_rebases(spark, table, monkeypatch):
    """A concurrent append lands between snapshot resolution and commit:
    the merge loses the link(2) race, rebases on the fresh snapshot, and
    both writers' effects are visible."""
    orig = VersionedTable._commit
    fired = {"done": False}

    def racy(self, version, op, add, remove, schema=None):
        if op == "merge" and not fired["done"]:
            fired["done"] = True
            other = VersionedTable(spark, self.path)
            other.append(_frame(spark, [(500, "late", 1)]), key="k")
        return orig(self, version, op, add, remove, schema)

    monkeypatch.setattr(VersionedTable, "_commit", racy)
    table.merge_into(_frame(spark, [(1, "merged", 2)]), key="k")
    monkeypatch.undo()

    assert table.latest_version() == 3  # append took v2, merge rebased to v3
    got = dict((r[0], r[1]) for r in table.snapshot().collect())
    assert got[500] == "late" and got[1] == "merged"
    ops = [c["op"] for c in table.history()]
    assert ops == ["create", "append", "merge"]


def test_exhausted_retries_raise(spark, table, monkeypatch):
    def always_conflict(self, *a, **kw):
        raise CommitConflict("loser")

    monkeypatch.setattr(VersionedTable, "_commit", always_conflict)
    with pytest.raises(CommitConflict):
        table.merge_into(
            _frame(spark, [(1, "x", 1)]), key="k", max_attempts=2
        )


def test_log_contiguity_guard(spark, table):
    table.append(_frame(spark, [(100, "x", 1)]), key="k")  # v2
    # a HOLE inside the log is corruption (commits are atomic)
    os.rename(
        os.path.join(table.path, "_log", f"{2:020d}.json"),
        os.path.join(table.path, "_log", f"{5:020d}.json"),
    )
    with pytest.raises(ValueError, match="non-contiguous"):
        table.snapshot()
    os.rename(
        os.path.join(table.path, "_log", f"{5:020d}.json"),
        os.path.join(table.path, "_log", f"{2:020d}.json"),
    )
    # a log starting past 1 WITHOUT a covering checkpoint is tampering,
    # not a legal retention prune (vacuum always leaves the checkpoint)
    os.unlink(os.path.join(table.path, "_log", f"{1:020d}.json"))
    with pytest.raises(ValueError, match="no checkpoint"):
        table.snapshot()


def test_compact_binpacks_without_changing_data(spark, table):
    before = _rows(table.snapshot())
    v = table.compact("k", target_rows_per_file=10**9)
    assert v == 2
    c = table._read_commit(2)
    assert c["op"] == "compact"
    assert len(c["add"]) == 1 and len(c["remove"]) == 3
    assert _rows(table.snapshot()) == before  # data byte-identical
    # history intact until vacuum: time travel across the boundary works
    assert _rows(table.snapshot(version=1)) == before
    # already-compact table: no empty commit
    assert table.compact("k", target_rows_per_file=10**9) == 2


def test_pruned_scan_skips_files_by_stats(spark, table):
    # keys 12..17 live entirely inside the [10,19] file → 1 of 3 opened
    df, opened, total = table.pruned_scan("k", 12, 17)
    assert (opened, total) == (1, 3)
    assert sorted(r[0] for r in df.collect()) == [12, 13, 14, 15, 16, 17]
    # a range outside every file's stats opens nothing
    df0, o0, _t0 = table.pruned_scan("k", 1000, 2000)
    assert o0 == 0 and df0.count() == 0


def test_change_feed_classifies_and_is_file_confined(spark, table):
    table.merge_into(
        _frame(spark, [(1, "upd", 9), (100, "new", 1)]), key="k"
    )
    cdf = {r["k"]: r["_change_type"] for r in table.change_feed("k", 1, 2).collect()}
    # only the touched keys appear: survivors of the rewritten [0,9] file
    # cancel in the value diff, files [10,19]/[20,29] are never read
    assert cdf == {1: "update_postimage", 100: "insert"}
    table.delete_where(F.col("k") == 15, key="k")
    cdf2 = {r["k"]: r["_change_type"] for r in table.change_feed("k", 2, 3).collect()}
    assert cdf2 == {15: "delete"}


def test_merge_schema_evolution_nullfills_untouched_files(spark, table):
    upd = local_frame(
        spark, [(2, "evolved", 7, 42)], "k bigint, v string, n bigint, extra bigint"
    )
    v = table.merge_into(upd, key="k", allow_new_columns=True)
    assert v == 2
    snap = table.snapshot()
    assert "extra" in snap.columns
    got = {r["k"]: r["extra"] for r in snap.collect()}
    assert got[2] == 42
    assert got[25] is None  # untouched file, null-filled by read schema
    # old version still reads with the OLD schema (evolution is per-commit)
    assert "extra" not in table.snapshot(version=1).columns
    # without the flag, unknown source columns are silently projected away
    # (only table columns participate — the MERGE contract), no evolution
    table.merge_into(
        local_frame(
            spark,
            [(3, "x", 1, 5, 1)],
            "k bigint, v string, n bigint, extra bigint, zzz bigint",
        ),
        key="k",
    )
    assert "zzz" not in table.snapshot().columns


def test_concurrent_writers_all_land_without_lost_updates(spark, table):
    """Torture: 4 threads race disjoint-key merges against one table
    handle-per-thread. link(2) arbitration must serialize them into a
    contiguous log with every writer's effect present (no lost updates,
    no duplicate versions) — the multi-writer story a warehouse table
    needs, exercised for real, not just via the monkeypatched race."""
    from concurrent.futures import ThreadPoolExecutor

    def write(i):
        t = VersionedTable(spark, table.path)
        t.merge_into(
            _frame(spark, [(1000 + i, f"w{i}", i), (i, f"upd{i}", i)]),
            key="k",
            max_attempts=20,
        )

    with ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(write, range(4)))

    assert table.latest_version() == 5  # create + 4 serialized merges
    ops = [c["op"] for c in table.history()]
    assert ops == ["create"] + ["merge"] * 4
    got = dict((r[0], r[1]) for r in table.snapshot().collect())
    for i in range(4):
        assert got[1000 + i] == f"w{i}"  # every insert landed
        assert got[i] == f"upd{i}"  # every update landed
    assert len(got) == 34


@pytest.fixture()
def ptable(spark, tmp_path):
    rows = [(i, "even" if i % 2 == 0 else "odd", 1) for i in range(30)]
    return VersionedTable.create(
        spark,
        str(tmp_path / "pt"),
        local_frame(spark, rows, "k bigint, par string, n bigint"),
        key="k",
        target_rows_per_file=8,
        partition_by="par",
    )


def test_partitioned_create_and_snapshot(spark, ptable):
    assert ptable.partition_column() == "par"
    c = ptable._read_commit(1)
    assert {a["partition"] for a in c["add"]} == {"even", "odd"}
    got = {r["k"]: r["par"] for r in ptable.snapshot().collect()}
    assert len(got) == 30
    assert got[4] == "even" and got[7] == "odd"  # dir-encoded col restored


def test_partition_scan_reads_only_the_partition(spark, ptable):
    df, opened, total = ptable.partition_scan("even")
    assert 0 < opened < total
    ks = sorted(r["k"] for r in df.collect())
    assert ks == list(range(0, 30, 2))
    df0, o0, _ = ptable.partition_scan("nope")
    assert o0 == 0 and df0.count() == 0


def test_partitioned_merge_prunes_untouched_partitions(spark, ptable):
    # update touches only the 'odd' partition → no 'even' file rewritten
    upd = local_frame(
        spark, [(7, "odd", 99), (101, "odd", 1)], "k bigint, par string, n bigint"
    )
    # par == k % 2 here, a pure function of the key → pruning is sound
    ptable.merge_into(upd, key="k", stable_partitions=True)
    c = ptable._read_commit(2)
    removed = set(c["remove"])
    adds1 = {a["path"]: a["partition"] for a in ptable._read_commit(1)["add"]}
    assert removed and all(adds1[p] == "odd" for p in removed)
    assert {a["partition"] for a in c["add"]} == {"odd"}
    got = {r["k"]: (r["par"], r["n"]) for r in ptable.snapshot().collect()}
    assert got[7] == ("odd", 99) and got[101] == ("odd", 1)
    assert got[4] == ("even", 1) and len(got) == 31


def test_partition_churning_merge_moves_the_row(spark, ptable):
    """Default merge (no stable_partitions claim): a key may CHANGE
    partition; key-range pruning must still find its old row, so the move
    lands as exactly one row in the new partition — no duplicates."""
    upd = local_frame(spark, [(7, "moved", 5)], "k bigint, par string, n bigint")
    ptable.merge_into(upd, key="k")
    rows = [r for r in ptable.snapshot().collect() if r["k"] == 7]
    assert len(rows) == 1 and rows[0]["par"] == "moved" and rows[0]["n"] == 5
    assert len(_rows(ptable.snapshot())) == 30
    _, opened, total = ptable.partition_scan("moved")
    assert opened >= 1  # the new partition exists in the log


def test_partitioned_delete_and_compact_keep_layout(spark, ptable):
    ptable.delete_where(F.col("k") == 2, key="k")
    assert len(_rows(ptable.snapshot())) == 29
    v = ptable.compact("k", target_rows_per_file=10**9)
    c = ptable._read_commit(v)
    # bin-packed to one file PER PARTITION (hive layout preserved)
    assert sorted(a["partition"] for a in c["add"]) == ["even", "odd"]
    got = {r["k"]: r["par"] for r in ptable.snapshot().collect()}
    assert len(got) == 29 and got[3] == "odd" and 2 not in got


def test_bloom_point_scan_skips_files(spark, tmp_path):
    rows = [(i, f"v{i}", 1) for i in range(30)]
    t = VersionedTable.create(
        spark,
        str(tmp_path / "bt"),
        _frame(spark, rows),
        key="k",
        target_rows_per_file=10,
        bloom_by="v",
    )
    assert t.bloom_column() == "v"
    df, opened, total = t.point_scan("v", "v17")
    assert total == 3 and opened < total  # the bloom cut the file list
    assert [(r["k"], r["v"]) for r in df.collect()] == [(17, "v17")]
    # a value nowhere in the table: every file's bloom rejects it
    df0, o0, _ = t.point_scan("v", "nope")
    assert o0 == 0 and df0.count() == 0
    # the index survives a rewrite (merge recomputes per-file blooms)
    t.merge_into(_frame(spark, [(17, "rewritten", 9)]), key="k")
    df2, o2, t2 = t.point_scan("v", "rewritten")
    assert o2 < t2
    assert [(r["k"], r["v"]) for r in df2.collect()] == [(17, "rewritten")]
    # un-indexed column: explicit error, not a silent full scan
    with pytest.raises(ValueError, match="no bloom index"):
        t.point_scan("n", 1)


def test_commit_files_are_valid_json_with_stats(spark, table):
    with open(os.path.join(table.path, "_log", f"{1:020d}.json")) as f:
        c = json.load(f)
    assert c["version"] == 1 and c["op"] == "create"
    assert all(
        a["rows"] > 0 and a["min_key"] <= a["max_key"] for a in c["add"]
    )
    assert "schema" in c


def test_vacuum_prunes_commit_log_to_retention_horizon(spark, tmp_path):
    """Round 11: vacuum pairs DATA retention with LOG retention — commits
    and checkpoints strictly below the newest checkpoint at-or-below the
    horizon are deleted (meta copied into the surviving checkpoint
    first), so the log is O(K + retain_last) files at any history depth.
    Resolution inside the horizon stays green; below it raises."""
    from ssiintegrateddatapipeline_spark.sources.versioned import (
        _CHECKPOINT_EVERY,
        _fmt_checkpoint,
    )

    path = str(tmp_path / "lt")
    t = VersionedTable.create(
        spark, path, _frame(spark, [(1, "v1", 1)]), key="k",
        target_rows_per_file=100, bloom_by="v",
    )
    for i in range(2, 41):
        t.append(_frame(spark, [(i, f"v{i}", 1)]), key="k")
    assert t.latest_version() == 40
    log_dir = os.path.join(path, "_log")
    assert len(os.listdir(log_dir)) == 40 + 40 // _CHECKPOINT_EVERY
    # strip meta from the surviving checkpoint: proves the pre-r11
    # upgrade path (vacuum must copy meta in before pruning commit 1)
    ck_path = os.path.join(log_dir, _fmt_checkpoint(30))
    d = json.load(open(ck_path))
    d.pop("meta")
    json.dump(d, open(ck_path, "w"), sort_keys=True)

    t.vacuum(retain_last=3)  # horizon v38 -> newest usable checkpoint: 30
    names = sorted(os.listdir(log_dir))
    commits = [int(n.split(".")[0]) for n in names if ".checkpoint" not in n]
    cks = [int(n.split(".")[0]) for n in names if ".checkpoint" in n]
    assert commits == list(range(30, 41))  # ck itself survives
    assert cks == [30, 40]
    assert len(names) <= _CHECKPOINT_EVERY + 3  # K + retain_last
    # table meta survived the create commit's deletion
    assert t.key_column() == "k" and t.bloom_column() == "v"
    assert t.target_rows_per_file() == 100
    # time travel inside (and at) the horizon still green
    assert t.snapshot().count() == 40
    assert t.snapshot(version=38).count() == 38
    assert t.snapshot(version=30).count() == 30  # straight off checkpoint
    assert len(t.history()) == 11
    with pytest.raises(VersionPrunedError):
        t.snapshot(version=29)  # below the surviving checkpoint
    # idempotent: a second vacuum changes nothing further
    t.vacuum(retain_last=3)
    assert sorted(os.listdir(log_dir)) == names
    # the pruned log still round-trips a fresh handle + new commits
    t2 = VersionedTable(spark, path)
    t2.append(_frame(spark, [(41, "v41", 1)]), key="k")
    assert t2.snapshot().count() == 41
    assert t2.latest_version() == 41
