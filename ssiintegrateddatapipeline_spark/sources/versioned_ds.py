"""Catalyst-integrated reads of the versioned table: a Python DataSource
with filter pushdown (Spark 4.1 ``pushFilters`` API).

Round 9 delivered data skipping through the bespoke ``pruned_scan`` /
``partition_scan`` / ``point_scan`` methods; this module makes it
AUTOMATIC: ``spark.read.format("versioned").option("path", p).load()
.where(...)`` pushes the predicate into the commit-log file cut, so a
plain declarative read skips untouched files with no special API — the
same integration Delta gets from its DSv2 ScanBuilder, re-expressed
through Spark's Python DataSource surface (the `trade_feed.py` precedent,
plus `pushFilters`, which needs ``spark.sql.python.filterPushdown.enabled``).

Pushdown semantics: the log's per-file stats are FILE-granular, so every
filter is also returned to Spark for row-level re-application (the
``pushFilters`` contract for partially-applied filters: returned filters
are re-evaluated post-scan; using them for partition pruning first is
exactly how file-source partition pruning behaves). Supported cuts:

- range/point predicates (``=  >  >=  <  <=  IN``) on the merge key or
  any ``stats_cols`` column → per-file [min, max] interval test;
- ``=`` / ``IN`` on the hive partition column → log partition values;
- ``=`` on the bloom-indexed column → per-file bloom membership.

Executor-side ``read()`` streams each live file as pyarrow RecordBatches
(Arrow all the way into the JVM), restoring the partition column and
null-filling schema-evolution gaps per file — one InputPartition per
data file, so a 1000-executor cluster scans pruned files fully in
parallel.

Reference tie-in: the reference's credential store reads are plain SQL
over Postgres (veramo-agent/src/config/database.config.ts:48-74); here
the equivalent declarative read hits the warehouse-grade table with
data skipping. SURVEY §2 K5/D1.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

from ssiintegrateddatapipeline_spark.sources.versioned import (
    FileStat,
    VersionedTable,
    _bloom_might_contain,
)

PUSHDOWN_CONF = "spark.sql.python.filterPushdown.enabled"

_REGISTERED: set[tuple] = set()


def ensure_registered(spark, cls) -> None:
    """Idempotent per-session DataSource registration (re-registering
    works but warns and re-pickles the class)."""
    key = (spark.sparkContext.applicationId, cls.name())
    if key not in _REGISTERED:
        spark.dataSource.register(cls)
        _REGISTERED.add(key)


def activate_session(spark) -> None:
    """Python-datasource LOOKUP consults the JVM's THREAD-LOCAL active
    session; a fresh Python thread pins to a fresh JVM thread where it is
    unset, so ``format("versioned")`` raises DATA_SOURCE_NOT_FOUND there
    even though the source is registered. Call once per worker thread
    before driving Python-datasource reads/writes (no-op on the main
    thread, harmless to repeat)."""
    spark._jvm.org.apache.spark.sql.classic.SparkSession.setActiveSession(
        spark._jsparkSession
    )


class _FilePartition(InputPartition):
    """One live data file = one scan partition (embarrassingly parallel)."""

    def __init__(self, abs_path: str, partition_value) -> None:
        self.abs_path = abs_path
        self.partition_value = partition_value


def _interval_for(filters: list) -> tuple:
    """Fold comparison filters on one column into a (lo, hi) interval
    (closed; None = unbounded) plus an optional IN value set."""
    lo, hi, in_vals = None, None, None
    for f in filters:
        v = f.value
        if isinstance(f, EqualTo):
            lo = v if lo is None else max(lo, v)
            hi = v if hi is None else min(hi, v)
        elif isinstance(f, GreaterThan) or isinstance(f, GreaterThanOrEqual):
            lo = v if lo is None else max(lo, v)
        elif isinstance(f, LessThan) or isinstance(f, LessThanOrEqual):
            hi = v if hi is None else min(hi, v)
        elif isinstance(f, In):
            vals = set(v)
            in_vals = vals if in_vals is None else in_vals & vals
    return lo, hi, in_vals


class _VersionedReader(DataSourceReader):
    """Driver-side: resolve the commit log once, let ``pushFilters`` cut
    the file list against the log's stats; executor-side: stream each
    surviving file as Arrow batches."""

    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("option 'path' is required for format('versioned')")
        version = options.get("version")
        # Log resolution is pure file I/O (JSON checkpoint + tail) — no
        # SparkSession needed, which matters because Python DataSource
        # planning runs in a dedicated Python worker process where
        # getOrCreate would launch a whole second JVM.
        t = VersionedTable(None, path)
        v, live, schema = t._resolve(int(version) if version else None)
        self._table_path = t.path
        self._schema = schema
        self._files: list[FileStat] = sorted(
            live.values(), key=lambda s: s.path
        )
        self.files_total = len(self._files)
        self._key = t.key_column()
        self._stats_cols = set(t.stats_columns())
        self._pcol = t.partition_column()
        self._bcol = t.bloom_column()

    # -- planning (driver) --------------------------------------------------

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """File-level data skipping from Catalyst's pushed predicates.
        Every filter is RETURNED (Spark re-applies row-level) because the
        log's stats are file-granular — pushdown here only shrinks the
        set of files ever opened, it never claims exactness."""
        by_col: dict[str, list] = {}
        for f in filters:
            if isinstance(
                f,
                (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan,
                 LessThanOrEqual, In),
            ) and len(f.attribute) == 1:
                by_col.setdefault(f.attribute[0], []).append(f)

        keep = self._files
        for col, fs in by_col.items():
            lo, hi, in_vals = _interval_for(fs)
            if col == self._pcol:
                keep = [
                    s
                    for s in keep
                    if self._partition_hit(s, lo, hi, in_vals)
                ]
            elif col == self._key or col in self._stats_cols:
                keep = [
                    s for s in keep if self._range_hit(s, col, lo, hi, in_vals)
                ]
            if col == self._bcol:
                eq = [f.value for f in fs if isinstance(f, EqualTo)]
                for v in eq:
                    try:
                        keep = [
                            s
                            for s in keep
                            if s.bloom is None
                            or _bloom_might_contain(s.bloom, v)
                        ]
                    except TypeError:
                        pass  # un-canonical probe type: no bloom cut
        self._files = keep
        return filters  # file-granular: Spark re-applies all row-level

    def _range_hit(self, s: FileStat, col, lo, hi, in_vals) -> bool:
        rng = (
            (s.min_key, s.max_key)
            if col == self._key
            else (tuple(s.stats[col]) if s.stats and col in s.stats else None)
        )
        if rng is None or rng[0] is None:
            return True  # no stats recorded -> must read
        if lo is not None and rng[1] < lo:
            return False
        if hi is not None and rng[0] > hi:
            return False
        if in_vals is not None and not any(
            rng[0] <= v <= rng[1] for v in in_vals
        ):
            return False
        return True

    def _partition_hit(self, s: FileStat, lo, hi, in_vals) -> bool:
        p = s.partition
        if p is None:
            return False  # an =/IN predicate never matches the null partition
        if lo is not None and str(p) != str(lo) and lo == hi:
            return False
        if in_vals is not None and not any(str(p) == str(v) for v in in_vals):
            return False
        return True

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _FilePartition(os.path.join(self._table_path, s.path), s.partition)
            for s in self._files
        ]

    # -- execution (executor) ------------------------------------------------

    def read(self, partition: _FilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self._schema)
        tbl = pq.read_table(partition.abs_path)
        n = tbl.num_rows
        cols = []
        for field in target:
            if field.name == self._pcol:
                val = partition.partition_value
                cols.append(
                    pa.nulls(n, type=field.type)
                    if val is None
                    else pa.array([val] * n).cast(field.type)
                )
            elif field.name in tbl.column_names:
                cols.append(tbl.column(field.name).cast(field.type))
            else:
                # schema evolution: this file predates the column
                cols.append(pa.nulls(n, type=field.type))
        out = pa.table(cols, schema=target)
        yield from out.to_batches(max_chunksize=1 << 16)


class _FileCommit(WriterCommitMessage):
    """One task's staged file + the stats it computed IN the write task
    (rows, key min/max, declared-column min/max, bloom bits) — the true
    Delta/Iceberg write model: stats ride the commit message, the driver
    never touches data (not even footers)."""

    def __init__(self, staged, rows, min_key, max_key, stats, bloom_bits):
        self.staged = staged  # abs path under _tmp, or None (empty task)
        self.rows = rows
        self.min_key = min_key
        self.max_key = max_key
        self.stats = stats  # {col: [min, max]} or None
        self.bloom_bits = bloom_bits  # int bitmap or None


class _VersionedArrowWriter(DataSourceArrowWriter):
    """Declarative writes: ``df.write.format("versioned").option("path",
    p)``. ``mode("overwrite")`` creates the table (or replaces its live
    file set in one commit); ``mode("append")`` adds a blind-append
    commit. Each Spark task streams its Arrow batches straight into one
    immutable parquet file and returns (path, rows, min/max, bloom) as
    its commit message; the driver's ``commit()`` publishes ONE log
    entry via the table's link(2) slot — executor-parallel data, O(#files)
    driver metadata, crash-safe (``abort()`` deletes staged files; a
    crashed driver leaves orphans for ``vacuum``).

    Hive-partitioned tables keep the ``VersionedTable`` API (one writer
    task would straddle partitions); everything else round-trips."""

    def __init__(self, options, schema, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("option 'path' is required for format('versioned')")
        self._path = os.path.abspath(path)
        self._overwrite = overwrite
        t = VersionedTable(None, self._path)
        exists = t.latest_version() > 0
        if exists:
            _, _, tschema = t._resolve()
            if t.partition_column() is not None:
                raise ValueError(
                    "hive-partitioned tables: use the VersionedTable API"
                )
            if [f.name for f in schema.fields] != [
                f.name for f in tschema.fields
            ]:
                raise ValueError(
                    f"schema mismatch: writing {[f.name for f in schema.fields]} "
                    f"into table {[f.name for f in tschema.fields]}"
                )
            self._key = t.key_column()
            self._bcol = t.bloom_column()
            self._scols = t.stats_columns()
            self._meta = None
        else:
            if not overwrite:
                raise ValueError(f"no table at {path} — append needs one")
            key = options.get("key")
            if not key:
                raise ValueError("option 'key' is required to create a table")
            self._key = key
            self._bcol = options.get("bloom_by")
            sc = options.get("stats_cols")
            self._scols = tuple(sc.split(",")) if sc else ()
            self._meta = {
                "key": key,
                "target_rows_per_file": int(
                    options.get("target_rows_per_file", 250_000)
                ),
                **({"stats_cols": list(self._scols)} if self._scols else {}),
            }
        self._schema = schema
        self._job = uuid.uuid4().hex

    # -- executor side -------------------------------------------------------

    def write(self, iterator) -> _FileCommit:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from ssiintegrateddatapipeline_spark.sources.versioned import (
            _bloom_positions,
        )

        staged_dir = os.path.join(self._path, "_tmp", f"w_{self._job}")
        os.makedirs(staged_dir, exist_ok=True)
        staged = os.path.join(staged_dir, f"part-{uuid.uuid4().hex}.parquet")
        writer = None
        rows = 0
        kmin = kmax = None
        stats: dict[str, list] = {}
        bloom_bits = 0 if self._bcol is not None else None

        def _rng(batch, col):
            mm = pc.min_max(batch.column(col))
            return mm["min"].as_py(), mm["max"].as_py()

        for batch in iterator:
            if batch.num_rows == 0:
                continue
            if writer is None:
                writer = pq.ParquetWriter(staged, batch.schema)
            writer.write_table(pa.Table.from_batches([batch]))
            rows += batch.num_rows
            lo, hi = _rng(batch, self._key)
            kmin = lo if kmin is None else min(kmin, lo)
            kmax = hi if kmax is None else max(kmax, hi)
            for c in self._scols:
                lo, hi = _rng(batch, c)
                if c in stats:
                    stats[c] = [min(stats[c][0], lo), max(stats[c][1], hi)]
                else:
                    stats[c] = [lo, hi]
            if self._bcol is not None:
                for v in batch.column(self._bcol).to_pylist():
                    if v is None:
                        continue
                    for p in _bloom_positions(v):
                        bloom_bits |= 1 << p
        if writer is None:
            return _FileCommit(None, 0, None, None, None, None)
        writer.close()
        return _FileCommit(staged, rows, kmin, kmax, stats or None, bloom_bits)

    # -- driver side -----------------------------------------------------------

    def commit(self, messages) -> None:
        from ssiintegrateddatapipeline_spark.sources.versioned import (
            _BLOOM_BITS,
            CommitConflict,
            FileStat,
        )

        t = VersionedTable(None, self._path)
        data_dir = os.path.join(self._path, "data")
        os.makedirs(data_dir, exist_ok=True)
        adds = []
        for m in messages:
            if m is None or m.staged is None:
                continue
            rel = os.path.join("data", f"part-{uuid.uuid4().hex}.parquet")
            os.rename(m.staged, os.path.join(self._path, rel))
            bloom = (
                f"{m.bloom_bits:0{_BLOOM_BITS // 4}x}"
                if m.bloom_bits is not None
                else None
            )
            adds.append(
                FileStat(rel, m.rows, m.min_key, m.max_key, None, bloom,
                         m.stats)
            )
        for attempt in range(5):
            v = t.latest_version()
            if v == 0:
                op, remove, schema, meta = "create", [], self._schema, self._meta
                bloom_by = self._bcol
            elif self._overwrite:
                _, live, _ = t._resolve()
                op, remove, schema, meta = "overwrite", sorted(live), None, None
                bloom_by = None
            else:
                op, remove, schema, meta = "append", [], None, None
                bloom_by = None
            try:
                t._commit(
                    v + 1, op, adds, remove, schema=schema,
                    bloom_by=bloom_by, table_meta=meta,
                )
                return
            except CommitConflict:
                continue
        raise CommitConflict(f"writer lost 5 races at {self._path}")

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and getattr(m, "staged", None):
                try:
                    os.unlink(m.staged)
                except FileNotFoundError:
                    pass


class VersionedDataSource(DataSource):
    """``spark.read.format("versioned").option("path", p)[.option("version",
    n)].load()`` — snapshot-isolated, time-travel-able, filter-pushdown
    read of a commit-log table; ``df.write.format("versioned")`` is the
    matching declarative write surface (``_VersionedArrowWriter``)."""

    @classmethod
    def name(cls) -> str:
        return "versioned"

    def schema(self):
        return _VersionedReader(self.options)._schema

    def reader(self, schema) -> DataSourceReader:
        return _VersionedReader(self.options)

    def writer(self, schema, overwrite: bool):
        return _VersionedArrowWriter(self.options, schema, overwrite)


def read_versioned(spark, path: str, version: int | None = None):
    """Register-and-read sugar; enables the pushdown conf (session-wide,
    idempotent) so `.where(...)` predicates reach ``pushFilters``."""
    spark.conf.set(PUSHDOWN_CONF, "true")
    ensure_registered(spark, VersionedDataSource)
    r = spark.read.format("versioned").option("path", path)
    if version is not None:
        r = r.option("version", str(version))
    return r.load()


# ---------------------------------------------------------------------------
# Streaming CDF source: incrementally consume per-version change batches
# ---------------------------------------------------------------------------


class _CdfPartition(InputPartition):
    """One table version's change batch: the file-confined (old, new)
    file pairs the version's commit touched. ``version=0`` is the empty
    sentinel for a no-progress trigger."""

    def __init__(
        self,
        version: int,
        old_files: list[tuple[str, object]],
        new_files: list[tuple[str, object]],
    ) -> None:
        self.version = version
        self.old_files = old_files  # [(abs_path, partition_value)]
        self.new_files = new_files


class _VersionedCdfStreamReader(DataSourceStreamReader):
    """Offset-tracked streaming CDF: table VERSIONS are the offsets (the
    Delta ``readChangeFeed`` streaming surface). Each micro-batch covers
    ``versionsPerBatch`` commits; a batch's rows are the row-level diff
    of exactly the files its commits added/removed — survivors of a
    rewrite appear identically on both sides and cancel, so untouched
    data never moves. Exactly-once: offsets checkpoint like any stream.

    The per-version diff runs executor-side over the touched files
    (pyarrow + a dict join on the merge key, null-safe equality like
    ``VersionedTable.change_feed``). A version's changes are one work
    unit here; at 100 TB the same commit metadata supports splitting one
    version's diff into co-partitioned (old, new) file-pair groups,
    because the rewrite is key-range aligned (repartitionByRange) —
    commit-bounded state either way, nothing unbounded."""

    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("option 'path' is required for format('versioned_cdf')")
        self._versions_per_batch = int(options.get("versionsperbatch", 1))
        self._path = os.path.abspath(path)
        t = VersionedTable(None, self._path)
        _, _, schema = t._resolve()
        self._key = t.key_column()
        self._pcol = t.partition_column()
        self._cols = [f.name for f in schema.fields]
        self._current = 0

    def initialOffset(self) -> dict:
        return {"version": 0}

    def latestOffset(self) -> dict:
        latest = VersionedTable(None, self._path).latest_version()
        self._current = min(
            self._current + self._versions_per_batch, latest
        )
        return {"version": self._current}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        t = VersionedTable(None, self._path)
        parts: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            commit = t._read_commit(v)
            removed = set(commit.get("remove", ()))
            added = {a["path"] for a in commit.get("add", ())}
            # partition values for the OLD side live in earlier commits —
            # the pre-version resolve carries them (O(K) checkpointed)
            prev = t._resolve(v - 1)[1] if v > 1 and removed else {}
            parts.append(
                _CdfPartition(
                    v,
                    [
                        (os.path.join(self._path, p), prev[p].partition)
                        for p in sorted(removed)
                        if p in prev
                    ],
                    [
                        (
                            os.path.join(self._path, a["path"]),
                            a.get("partition"),
                        )
                        for a in commit.get("add", ())
                    ],
                )
            )
        return parts or [_CdfPartition(0, [], [])]

    def read(self, partition: _CdfPartition) -> Iterator[tuple]:
        if partition.version == 0:
            return
        import pyarrow.parquet as pq

        ki = self._cols.index(self._key)

        def _rows(files) -> dict:
            out = {}
            for abs_path, pval in files:
                tbl = pq.read_table(abs_path)
                data = {
                    c: (
                        tbl.column(c).to_pylist()
                        if c in tbl.column_names
                        else (
                            [pval] * tbl.num_rows
                            if c == self._pcol
                            else [None] * tbl.num_rows  # schema evolution
                        )
                    )
                    for c in self._cols
                }
                for i in range(tbl.num_rows):
                    row = tuple(data[c][i] for c in self._cols)
                    out[row[ki]] = row
            return out

        old = _rows(partition.old_files)
        new = _rows(partition.new_files)
        v = partition.version
        for k, row in new.items():
            if k not in old:
                yield (*row, "insert", v)
            elif old[k] != row:  # survivors cancel (null-safe: None == None)
                yield (*row, "update_postimage", v)
        for k, row in old.items():
            if k not in new:
                yield (*row, "delete", v)

    def commit(self, end: dict) -> None:
        pass  # the table log is the source of truth; nothing to clean up

    def stop(self) -> None:
        pass


class VersionedCdfDataSource(DataSource):
    """``spark.readStream.format("versioned_cdf").option("path", p).load()``
    — per-version change batches of a commit-log table as a stream."""

    @classmethod
    def name(cls) -> str:
        return "versioned_cdf"

    def schema(self):
        import pyspark.sql.types as T

        t = VersionedTable(None, self.options["path"])
        _, _, schema = t._resolve()
        return T.StructType(
            list(schema.fields)
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_commit_version", T.IntegerType()),
            ]
        )

    def streamReader(self, schema):
        return _VersionedCdfStreamReader(self.options)
