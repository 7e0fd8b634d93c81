"""Round-10 versioned-table upgrades (sources/versioned.py):

- commit-log CHECKPOINTS: snapshot resolution reads O(K) log files at any
  history depth (the Delta ``_last_checkpoint`` design) and stays correct
  across time travel + vacuum;
- multi-column data skipping (``create(stats_cols=...)``);
- bloom canonicalization (int/string only, build side == probe side) and
  the ``bloom_by == partition_by`` guard;
- executor-side bloom harvest equals the footer/driver-side reference
  build (no driver-side data reads on the write path);
- hive partition-dir unescaping (percent-escaped values, null sentinel);
- size-aware ``append()`` (multi-file, tight disjoint stats).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.sources.batch import local_frame
from ssiintegrateddatapipeline_spark.sources import versioned as V
from ssiintegrateddatapipeline_spark.sources.versioned import (
    VersionedTable,
    VersionPrunedError,
    _bloom_build,
    _CHECKPOINT_EVERY,
)

SCHEMA = "k bigint, v string, n bigint"


def _frame(spark, rows):
    return local_frame(spark, rows, SCHEMA)


def _rows(df):
    return sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------------------
# checkpoints
# ---------------------------------------------------------------------------


def test_checkpoint_bounds_log_reads(spark, tmp_path, monkeypatch):
    """A deep table resolves from the newest checkpoint + tail: the number
    of per-commit JSON reads is <= the cadence, not O(versions)."""
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), _frame(spark, [(0, "v0", 1)]), key="k"
    )
    n_commits = 2 * _CHECKPOINT_EVERY + 5  # 25 with the default cadence
    for i in range(1, n_commits):
        t.append(_frame(spark, [(i, f"v{i}", 1)]), key="k")
    assert t.latest_version() == n_commits

    log = os.path.join(t.path, "_log")
    cps = sorted(f for f in os.listdir(log) if f.endswith(".checkpoint.json"))
    assert [int(f.split(".")[0]) for f in cps] == [
        _CHECKPOINT_EVERY,
        2 * _CHECKPOINT_EVERY,
    ]

    reads = []
    orig = VersionedTable._read_commit

    def counting(self, version):
        reads.append(version)
        return orig(self, version)

    monkeypatch.setattr(VersionedTable, "_read_commit", counting)
    assert t.snapshot().count() == n_commits
    # resolution replayed only the tail past the newest checkpoint (plus
    # the O(1) commit-1 metadata probes for partition/bloom/stats columns)
    tail_reads = [v for v in reads if v > 1]
    assert tail_reads and min(tail_reads) == 2 * _CHECKPOINT_EVERY + 1
    assert len(set(tail_reads)) <= _CHECKPOINT_EVERY
    monkeypatch.undo()

    # checkpoint content == replay-from-1 content (same live set + schema)
    with open(os.path.join(log, cps[-1])) as f:
        ck = json.load(f)
    v_ck = ck["version"]
    replayed = {}
    for n in range(1, v_ck + 1):
        c = t._read_commit(n)
        for rm in c.get("remove", ()):
            replayed.pop(rm, None)
        for a in c.get("add", ()):
            replayed[a["path"]] = a
    assert {a["path"] for a in ck["live"]} == set(replayed)


def test_checkpoint_time_travel_and_vacuum_interplay(spark, tmp_path):
    """Time travel to a pre-checkpoint version replays the prefix; after
    vacuum the pruned version raises — checkpoints never resurrect
    vacuumed files."""
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), _frame(spark, [(0, "v0", 1)]), key="k"
    )
    for i in range(1, _CHECKPOINT_EVERY + 3):
        t.merge_into(_frame(spark, [(0, f"u{i}", i), (i, f"v{i}", 1)]), key="k")
    latest = t.latest_version()
    assert latest == _CHECKPOINT_EVERY + 3
    # pre-checkpoint version resolves correctly (k=0 carries that epoch's value)
    got = {r["k"]: r["v"] for r in t.snapshot(version=3).collect()}
    assert got[0] == "u2" and len(got) == 3
    t.vacuum(retain_last=1)
    with pytest.raises(VersionPrunedError):
        t.snapshot(version=3).collect()
    # latest still reads fine through the checkpoint
    assert t.snapshot().count() == _CHECKPOINT_EVERY + 3


# ---------------------------------------------------------------------------
# multi-column data skipping
# ---------------------------------------------------------------------------


def test_stats_cols_prune_on_second_column(spark, tmp_path):
    # n is correlated with k here, so per-file n-ranges are disjoint and a
    # range predicate on n can cut files even though the LAYOUT keys on k
    rows = [(i, f"v{i}", 1000 + i) for i in range(30)]
    t = VersionedTable.create(
        spark,
        str(tmp_path / "t"),
        _frame(spark, rows),
        key="k",
        target_rows_per_file=10,
        stats_cols=["n"],
    )
    assert t.stats_columns() == ("n",)
    c = t._read_commit(1)
    assert all("stats" in a and "n" in a["stats"] for a in c["add"])
    df, opened, total = t.pruned_scan("n", 1012, 1017)
    assert (opened, total) == (1, 3)
    assert sorted(r["n"] for r in df.collect()) == list(range(1012, 1018))
    # key-column scans still work unchanged
    _, ok, _ = t.pruned_scan("k", 12, 17)
    assert ok == 1
    # stats survive a merge rewrite
    t.merge_into(_frame(spark, [(12, "upd", 9999)]), key="k")
    df2, o2, t2 = t.pruned_scan("n", 9999, 9999)
    assert o2 < t2
    assert [r["k"] for r in df2.collect()] == [12]
    # undeclared column: explicit error, not a silent full scan
    with pytest.raises(ValueError, match="no skipping stats"):
        t.pruned_scan("v", "a", "z")


def test_stats_cols_type_guard(spark, tmp_path):
    df = local_frame(spark, [(1, [1, 2])], "k bigint, arr array<bigint>")
    with pytest.raises(TypeError, match="stats_cols"):
        VersionedTable.create(
            spark, str(tmp_path / "t"), df, key="k", stats_cols=["arr"]
        )


# ---------------------------------------------------------------------------
# bloom canonicalization + executor-side harvest
# ---------------------------------------------------------------------------


def test_bloom_int_column_probe_and_type_guards(spark, tmp_path):
    rows = [(i, f"v{i}", 1000 + i) for i in range(30)]
    t = VersionedTable.create(
        spark,
        str(tmp_path / "t"),
        _frame(spark, rows),
        key="k",
        target_rows_per_file=10,
        bloom_by="n",  # bigint column: build side is CAST(n AS STRING)
    )
    df, opened, total = t.point_scan("n", 1017)
    assert opened < total
    assert [r["k"] for r in df.collect()] == [17]
    # float probe on an int index: loud TypeError, never a false negative
    with pytest.raises(TypeError, match="int or string"):
        t.point_scan("n", 1017.0)
    # executor-side harvest == reference driver-side build over the bytes
    import pyarrow.parquet as pq

    for a in t._read_commit(1)["add"]:
        vals = (
            pq.ParquetFile(os.path.join(t.path, a["path"]))
            .read(columns=["n"])
            .column(0)
            .to_pylist()
        )
        assert a["bloom"] == _bloom_build(vals)


def test_bloom_create_guards(spark, tmp_path):
    df = local_frame(
        spark, [(1, "a", 0.5)], "k bigint, par string, x double"
    )
    with pytest.raises(ValueError, match="partition pruning"):
        VersionedTable.create(
            spark, str(tmp_path / "a"), df, key="k",
            partition_by="par", bloom_by="par",
        )
    with pytest.raises(TypeError, match="integer or string"):
        VersionedTable.create(
            spark, str(tmp_path / "b"), df, key="k", bloom_by="x"
        )


def test_no_driver_side_data_reads_on_write_path(spark, tmp_path, monkeypatch):
    """The write path may read parquet FOOTERS driver-side (metadata) but
    never data rows — ParquetFile.read must not be called."""
    import pyarrow.parquet as pq

    def boom(self, *a, **kw):
        raise AssertionError("driver-side data read on the write path")

    monkeypatch.setattr(pq.ParquetFile, "read", boom)
    t = VersionedTable.create(
        spark,
        str(tmp_path / "t"),
        _frame(spark, [(i, f"v{i}", i) for i in range(20)]),
        key="k",
        target_rows_per_file=10,
        bloom_by="v",
        stats_cols=["n"],
    )
    t.merge_into(_frame(spark, [(3, "upd", 99)]), key="k")
    monkeypatch.undo()
    df, opened, total = t.point_scan("v", "upd")
    assert opened < total
    assert [r["k"] for r in df.collect()] == [3]


# ---------------------------------------------------------------------------
# hive partition escaping + null partitions
# ---------------------------------------------------------------------------


def test_partition_values_with_specials_and_null_roundtrip(spark, tmp_path):
    rows = [
        (1, "a b", 1),      # space -> %20 in the hive dir
        (2, "x:y=z", 1),    # ':' and '=' -> escaped
        (3, "100%", 1),     # '%' -> escaped
        (4, None, 1),       # null -> __HIVE_DEFAULT_PARTITION__
        (5, "a b", 2),
    ]
    t = VersionedTable.create(
        spark,
        str(tmp_path / "t"),
        local_frame(spark, rows, "k bigint, par string, n bigint"),
        key="k",
        partition_by="par",
    )
    # the log stores the TRUE values, not the escaped dir encodings
    parts = {a.get("partition") for a in t._read_commit(1)["add"]}
    assert parts == {"a b", "x:y=z", "100%", None}
    got = {r["k"]: r["par"] for r in t.snapshot().collect()}
    assert got == {1: "a b", 2: "x:y=z", 3: "100%", 4: None, 5: "a b"}
    df, opened, total = t.partition_scan("a b")
    assert opened < total
    assert sorted(r["k"] for r in df.collect()) == [1, 5]
    dfn, on, _ = t.partition_scan(None)
    assert on >= 1
    assert [r["k"] for r in dfn.collect()] == [4]
    # merges through escaped partitions keep working
    t.merge_into(
        local_frame(spark, [(2, "x:y=z", 77)], "k bigint, par string, n bigint"),
        key="k",
        stable_partitions=True,
    )
    got2 = {r["k"]: r["n"] for r in t.snapshot().collect()}
    assert got2[2] == 77 and len(got2) == 5


# ---------------------------------------------------------------------------
# size-aware append
# ---------------------------------------------------------------------------


def test_append_fans_out_to_sized_files(spark, tmp_path):
    t = VersionedTable.create(
        spark,
        str(tmp_path / "t"),
        _frame(spark, [(0, "v0", 1)]),
        key="k",
        target_rows_per_file=10,
    )
    big = _frame(spark, [(100 + i, f"a{i}", 1) for i in range(30)])
    v = t.append(big, key="k")  # inherits create's target (10) from the log
    adds = t._read_commit(v)["add"]
    assert len(adds) == 3  # not one coalesced task
    ranges = sorted((a["min_key"], a["max_key"]) for a in adds)
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo  # tight, disjoint stats per appended file
    assert t.snapshot().count() == 31


# ---------------------------------------------------------------------------
# Z-order clustering
# ---------------------------------------------------------------------------


def test_zorder_skips_on_both_dimensions(spark, tmp_path):
    """A 40x40 grid keyed on row index: pre-Z, an x-range scan opens every
    file (x cycles inside each file); post-Z, BOTH x and y range scans
    skip most files — multi-dimensional locality no single sort gives.
    Values stay identical and time travel across the rewrite works."""
    rows = [(i, i % 40, i // 40, f"r{i}") for i in range(1600)]
    t = VersionedTable.create(
        spark,
        str(tmp_path / "zt"),
        local_frame(spark, rows, "k bigint, x bigint, y bigint, s string"),
        key="k",
        target_rows_per_file=100,
        stats_cols=["x", "y"],
    )
    _, ox_pre, total = t.pruned_scan("x", 0, 4)
    assert ox_pre == total  # x cycles mod 40: no file can be skipped
    v = t.zorder(["x", "y"], target_rows_per_file=100)
    assert t._read_commit(v)["op"] == "zorder"
    dfx, ox, tot = t.pruned_scan("x", 0, 4)
    dfy, oy, _ = t.pruned_scan("y", 0, 4)
    assert ox < tot / 2 and oy < tot / 2  # both dims skip
    assert sorted(r["k"] for r in dfx.collect()) == [
        i for i in range(1600) if i % 40 <= 4
    ]
    assert dfy.count() == 200
    assert t.snapshot().count() == 1600
    assert t.snapshot(version=1).count() == 1600  # history intact
    # guards: no recorded stats / non-integer column
    with pytest.raises(ValueError, match="no recorded stats"):
        t.zorder(["s"])
    t2 = VersionedTable.create(
        spark,
        str(tmp_path / "zt2"),
        local_frame(spark, [(1, "a")], "k bigint, s string"),
        key="k",
        stats_cols=["s"],
    )
    with pytest.raises(TypeError, match="integer-typed"):
        t2.zorder(["s"])


# ---------------------------------------------------------------------------
# RESTORE (metadata-only rollback)
# ---------------------------------------------------------------------------


def test_restore_is_metadata_only_and_history_safe(spark, tmp_path):
    t = VersionedTable.create(
        spark,
        str(tmp_path / "rt"),
        _frame(spark, [(i, f"v{i}", 1) for i in range(30)]),
        key="k",
        target_rows_per_file=10,
    )
    t.merge_into(_frame(spark, [(1, "upd", 9), (100, "new", 1)]), key="k")
    t.delete_where(F.col("k") == 25, key="k")
    files_before = set(os.listdir(os.path.join(t.path, "data")))

    v = t.restore(1)
    assert v == 4 and t._read_commit(4)["op"] == "restore"
    # metadata only: no new data file was written
    assert set(os.listdir(os.path.join(t.path, "data"))) == files_before
    # re-added files are v1's, by reference
    assert {a["path"] for a in t._read_commit(4)["add"]} <= {
        a["path"] for a in t._read_commit(1)["add"]
    }
    assert _rows(t.snapshot()) == _rows(t.snapshot(version=1))
    # the un-restored state is still time-travelable (history intact)
    got3 = {r["k"]: r["v"] for r in t.snapshot(version=3).collect()}
    assert got3[1] == "upd" and 25 not in got3
    # idempotent: restoring to the now-identical state adds no commit
    assert t.restore(1) == 4
    # vacuum keeps the restored (live-again) files, sweeps the rest
    removed = t.vacuum(retain_last=1)
    assert removed and _rows(t.snapshot()) == _rows(t.snapshot(version=1))
    with pytest.raises(VersionPrunedError):
        t.snapshot(version=3).collect()
    # restoring to a vacuumed version is a loud error
    with pytest.raises(VersionPrunedError, match="vacuumed"):
        t.restore(3)


def test_restore_rolls_back_schema_evolution(spark, tmp_path):
    t = VersionedTable.create(
        spark,
        str(tmp_path / "rt"),
        _frame(spark, [(1, "a", 1)]),
        key="k",
    )
    t.merge_into(
        local_frame(
            spark, [(1, "a", 1, 42)], "k bigint, v string, n bigint, extra bigint"
        ),
        key="k",
        allow_new_columns=True,
    )
    assert "extra" in t.snapshot().columns
    t.restore(1)
    assert "extra" not in t.snapshot().columns  # evolution rolled back
