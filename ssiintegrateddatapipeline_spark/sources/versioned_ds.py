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
        ts = options.get("timestamp")  # TIMESTAMP AS OF, epoch millis
        # Log resolution is pure file I/O (JSON checkpoint + tail) — no
        # SparkSession needed, which matters because Python DataSource
        # planning runs in a dedicated Python worker process where
        # getOrCreate would launch a whole second JVM.
        t = VersionedTable(None, path)
        if ts is not None:
            if version is not None:
                raise ValueError(
                    "options 'version' and 'timestamp' are mutually "
                    "exclusive"
                )
            version = t.version_at(int(ts))
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
    """One task's staged files + the stats computed IN the write task
    (rows, key min/max, declared-column min/max, bloom bits, partition
    value) — the true Delta/Iceberg write model: stats ride the commit
    message, the driver never touches data (not even footers). A task
    writing a hive-partitioned table stages one file PER PARTITION VALUE
    it saw (the Spark file-source dynamic-partition write shape)."""

    def __init__(self, entries: list[dict]) -> None:
        # each entry: staged, partition (canonical str or None), rows,
        # min_key, max_key, stats ({col: [min,max]} | None), bloom_bits
        self.entries = entries


class _VersionedArrowWriter(DataSourceArrowWriter):
    """Declarative writes: ``df.write.format("versioned").option("path",
    p)``. ``mode("overwrite")`` creates the table (or replaces its live
    file set in one commit); ``mode("append")`` adds a blind-append
    commit. Each Spark task streams its Arrow batches straight into
    immutable parquet files — one per (task, partition value), split
    batch-wise when the table is hive-partitioned (round 11) — and
    returns (path, partition, rows, min/max, bloom) entries as its
    commit message; the driver's ``commit()`` publishes ONE log entry
    via the table's link(2) slot — executor-parallel data, O(#files)
    driver metadata, crash-safe (``abort()`` deletes staged files; a
    crashed driver leaves orphans for ``vacuum``).

    Create-time options mirror ``VersionedTable.create`` — including its
    TYPE validation (round-10 advice): ``bloom_by``/``partition_by``
    must be integer/string (canonical cross-engine string form — a
    repr-divergent type would risk bloom FALSE NEGATIVES / wrong
    partition restore), ``stats_cols`` numeric/string. Writes into an
    existing table validate field NAMES AND TYPES at plan time."""

    def __init__(self, options, schema, overwrite: bool) -> None:
        from ssiintegrateddatapipeline_spark.sources.versioned import (
            _BLOOM_TYPES,
        )
        import pyspark.sql.types as T

        path = options.get("path")
        if not path:
            raise ValueError("option 'path' is required for format('versioned')")
        self._path = os.path.abspath(path)
        self._overwrite = overwrite
        t = VersionedTable(None, self._path)
        exists = t.latest_version() > 0
        names = [f.name for f in schema.fields]
        if exists:
            _, _, tschema = t._resolve()
            mine = [(f.name, f.dataType) for f in schema.fields]
            theirs = [(f.name, f.dataType) for f in tschema.fields]
            if mine != theirs:
                raise ValueError(
                    "schema mismatch: writing "
                    f"{[(n, d.simpleString()) for n, d in mine]} into table "
                    f"{[(n, d.simpleString()) for n, d in theirs]} — field "
                    "names AND types must match (a silent type change would "
                    "surface later as cast failures at read time)"
                )
            self._key = t.key_column()
            self._bcol = t.bloom_column()
            self._scols = t.stats_columns()
            self._pcol = t.partition_column()
            self._meta = None
            self._pby = None  # only a CREATE declares it
        else:
            if not overwrite:
                raise ValueError(f"no table at {path} — append needs one")
            key = options.get("key")
            if not key:
                raise ValueError("option 'key' is required to create a table")
            self._key = key
            self._bcol = options.get("bloom_by")
            self._pby = options.get("partition_by")
            self._pcol = self._pby
            sc = options.get("stats_cols")
            self._scols = tuple(sc.split(",")) if sc else ()
            for c in (key, self._bcol, self._pby, *self._scols):
                if c is not None and c not in names:
                    raise ValueError(f"column '{c}' not in {names}")
            if self._pby is not None:
                if self._pby == key:
                    raise ValueError(
                        "partition_by == key: the key's min/max stats live "
                        "in the parquet bytes the partition layout drops"
                    )
                ptype = schema[self._pby].dataType
                if not isinstance(ptype, _BLOOM_TYPES):
                    raise TypeError(
                        f"partition_by column '{self._pby}' must be integer "
                        f"or string (got {ptype.simpleString()}): the log "
                        "stores the canonical string form (hive directory "
                        "semantics) and other types don't round-trip it"
                    )
            if self._bcol is not None:
                if self._bcol == self._pby:
                    raise ValueError(
                        "bloom_by == partition_by: use partition pruning "
                        "instead"
                    )
                btype = schema[self._bcol].dataType
                if not isinstance(btype, _BLOOM_TYPES):
                    raise TypeError(
                        f"bloom_by column '{self._bcol}' must be integer or "
                        f"string (got {btype.simpleString()}): other types "
                        "have no canonical cross-engine string form and "
                        "would risk bloom false negatives"
                    )
            for c in self._scols:
                if not isinstance(
                    schema[c].dataType,
                    (*_BLOOM_TYPES, T.FloatType, T.DoubleType),
                ):
                    raise TypeError(
                        f"stats_cols column '{c}' must be numeric or string "
                        f"(got {schema[c].dataType.simpleString()}): min/max "
                        "must round-trip through the JSON log"
                    )
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
        # one accumulator per partition value this task sees (None = the
        # unpartitioned table's single file). Hive semantics: the
        # partition column lives in the log, not the parquet bytes.
        accs: dict[object, dict] = {}

        def _acc(canon) -> dict:
            a = accs.get(canon)
            if a is None:
                a = {
                    "staged": os.path.join(
                        staged_dir, f"part-{uuid.uuid4().hex}.parquet"
                    ),
                    "writer": None,
                    "rows": 0,
                    "kmin": None,
                    "kmax": None,
                    "stats": {},
                    "bloom": 0 if self._bcol is not None else None,
                }
                accs[canon] = a
            return a

        def _feed(a: dict, tbl: pa.Table) -> None:
            if tbl.num_rows == 0:
                return
            if a["writer"] is None:
                a["writer"] = pq.ParquetWriter(a["staged"], tbl.schema)
            a["writer"].write_table(tbl)
            a["rows"] += tbl.num_rows
            mm = pc.min_max(tbl.column(self._key))
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            a["kmin"] = lo if a["kmin"] is None else min(a["kmin"], lo)
            a["kmax"] = hi if a["kmax"] is None else max(a["kmax"], hi)
            for c in self._scols:
                if c == self._pcol:
                    continue  # rides in the log, not the bytes
                mm = pc.min_max(tbl.column(c))
                lo, hi = mm["min"].as_py(), mm["max"].as_py()
                if c in a["stats"]:
                    a["stats"][c] = [
                        min(a["stats"][c][0], lo),
                        max(a["stats"][c][1], hi),
                    ]
                else:
                    a["stats"][c] = [lo, hi]
            if self._bcol is not None:
                for v in tbl.column(self._bcol).to_pylist():
                    if v is None:
                        continue
                    for p in _bloom_positions(v):
                        a["bloom"] |= 1 << p

        for batch in iterator:
            if batch.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([batch])
            if self._pcol is None:
                _feed(_acc(None), tbl)
                continue
            col = tbl.column(self._pcol)
            for val in pc.unique(col).to_pylist():
                if val is None:
                    mask, canon = pc.is_null(col), None
                else:
                    # canonical string form — matches the hive directory
                    # value the batch API logs (types validated at create)
                    mask = pc.equal(col, pa.scalar(val, type=col.type))
                    canon = str(val)
                _feed(
                    _acc(canon),
                    tbl.filter(mask).drop_columns([self._pcol]),
                )

        entries = []
        for canon, a in accs.items():
            if a["writer"] is None:
                continue
            a["writer"].close()
            entries.append(
                {
                    "staged": a["staged"],
                    "partition": canon,
                    "rows": a["rows"],
                    "min_key": a["kmin"],
                    "max_key": a["kmax"],
                    "stats": a["stats"] or None,
                    "bloom_bits": a["bloom"],
                }
            )
        return _FileCommit(entries)

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
            for e in getattr(m, "entries", None) or ():
                rel = os.path.join("data", f"part-{uuid.uuid4().hex}.parquet")
                os.rename(e["staged"], os.path.join(self._path, rel))
                bloom = (
                    f"{e['bloom_bits']:0{_BLOOM_BITS // 4}x}"
                    if e["bloom_bits"] is not None
                    else None
                )
                adds.append(
                    FileStat(
                        rel, e["rows"], e["min_key"], e["max_key"],
                        e["partition"], bloom, e["stats"],
                    )
                )
        for attempt in range(5):
            v = t.latest_version()
            if v == 0:
                op, remove, schema, meta = "create", [], self._schema, self._meta
                bloom_by, partition_by = self._bcol, self._pby
            elif self._overwrite:
                _, live, _ = t._resolve()
                op, remove, schema, meta = "overwrite", sorted(live), None, None
                bloom_by = partition_by = None
            else:
                op, remove, schema, meta = "append", [], None, None
                bloom_by = partition_by = None
            try:
                t._commit(
                    v + 1, op, adds, remove, schema=schema,
                    partition_by=partition_by, bloom_by=bloom_by,
                    table_meta=meta,
                )
                return
            except CommitConflict:
                continue
        raise CommitConflict(f"writer lost 5 races at {self._path}")

    def abort(self, messages) -> None:
        for m in messages:
            for e in getattr(m, "entries", None) or ():
                try:
                    os.unlink(e["staged"])
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


def read_versioned(
    spark,
    path: str,
    version: int | None = None,
    timestamp_ms: int | None = None,
):
    """Register-and-read sugar; enables the pushdown conf (session-wide,
    idempotent) so `.where(...)` predicates reach ``pushFilters``.
    ``version`` / ``timestamp_ms`` pin VERSION AS OF / TIMESTAMP AS OF."""
    spark.conf.set(PUSHDOWN_CONF, "true")
    ensure_registered(spark, VersionedDataSource)
    r = spark.read.format("versioned").option("path", path)
    if version is not None:
        r = r.option("version", str(version))
    if timestamp_ms is not None:
        r = r.option("timestamp", str(timestamp_ms))
    return r.load()


# ---------------------------------------------------------------------------
# Streaming CDF source: incrementally consume per-version change batches
# ---------------------------------------------------------------------------


class _CdfPartition(InputPartition):
    """One key-range-aligned GROUP of a table version's change batch: the
    (old, new) file pairs whose merge-key ranges overlap. A multi-file
    commit splits into several groups — each an independent Spark task —
    because the rewrite is ``repartitionByRange``-aligned on the key, so
    a row's old and new copy always land in range-overlapping files.
    ``version=0`` is the empty sentinel for a no-progress trigger."""

    def __init__(
        self,
        version: int,
        old_files: list[tuple[str, object]],
        new_files: list[tuple[str, object]],
    ) -> None:
        self.version = version
        self.old_files = old_files  # [(abs_path, partition_value)]
        self.new_files = new_files


def _key_range_groups(entries: list[tuple]) -> list[list[tuple]]:
    """Connected components of (lo, hi, payload) intervals under overlap
    (closed intervals, one sorted sweep). Two files can share a merge key
    only if their [min_key, max_key] ranges overlap, so diffing each
    component independently is exact."""
    ordered = sorted(entries, key=lambda e: (e[0], e[1]))
    groups: list[list[tuple]] = []
    cur: list[tuple] = []
    cur_hi = None
    for e in ordered:
        lo, hi = e[0], e[1]
        if cur and lo > cur_hi:
            groups.append(cur)
            cur, cur_hi = [], None
        cur.append(e)
        cur_hi = hi if cur_hi is None or hi > cur_hi else cur_hi
    if cur:
        groups.append(cur)
    return groups


class _VersionedCdfStreamReader(DataSourceStreamReader):
    """Offset-tracked streaming CDF: table VERSIONS are the offsets (the
    Delta ``readChangeFeed`` streaming surface). Each micro-batch covers
    ``versionsPerBatch`` commits; a batch's rows are the row-level diff
    of exactly the files its commits added/removed — survivors of a
    rewrite appear identically on both sides and cancel, so untouched
    data never moves. Exactly-once: offsets checkpoint like any stream.

    Parallelism (round 11): one version's diff is split into key-range-
    aligned (old, new) file-pair GROUPS — the rewrite is
    ``repartitionByRange``-aligned on the merge key, so files pair by
    overlapping [min_key, max_key] from the commit log's stats — and each
    group is its own ``InputPartition``. A 100 TB merge commit rewriting
    thousands of files fans its diff across the cluster instead of
    serializing through one task; per-task work tracks GROUP size, never
    commit size. Each group's diff is a vectorized pyarrow hash join on
    the key (no per-row Python), emitted as Arrow RecordBatches.

    Precondition (enforced): the merge key is UNIQUE and NON-NULL within
    every version's touched files. ``merge_into``/``delete_where``
    guarantee it; a blind ``append`` can violate it, in which case the
    diff would be ambiguous (which copy changed?) — the reader raises
    instead of silently dropping rows (round-10 advice).

    Restart safety (round-10 advice): a paced offset below a restored
    checkpoint offset would regress the offset log and re-emit consumed
    versions as duplicates. The API offers no restore hook, so the reader
    treats every ``latestOffset`` call made before it has learned a floor
    as a catch-up probe and answers with the table's TRUE latest version
    — ≥ any committed offset, never regressive. In practice that covers
    (a) the runner's startup prefetch (which precedes even
    ``initialOffset`` on a fresh query) and (b) every call on a restarted
    query (``initialOffset`` is never called there, so pacing stays off).
    Consequence: the first micro-batch after any (re)start covers the
    whole backlog; ``versionsPerBatch`` paces steady-state consumption.
    The floor then ratchets monotonically from every ``partitions`` /
    ``commit`` call Spark makes.
    """

    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("option 'path' is required for format('versioned_cdf')")
        self._versions_per_batch = int(options.get("versionsperbatch", 1))
        # Delta readChangeFeed parity: startingVersion positions a FRESH
        # query's first offset so versions below it never emit (a
        # checkpointed restart keeps its own offset, as in Delta)
        self._start_version = int(options.get("startingversion", 1))
        if self._start_version < 1:
            raise ValueError("startingVersion must be >= 1")
        self._path = os.path.abspath(path)
        t = VersionedTable(None, self._path)
        _, _, schema = t._resolve()
        self._key = t.key_column()
        self._pcol = t.partition_column()
        self._schema = schema
        self._cols = [f.name for f in schema.fields]
        self._paced: int | None = None  # None until initialOffset ⇒ restart
        self._floor = 0  # highest offset Spark has revealed to us

    def initialOffset(self) -> dict:
        # called on FRESH queries only (a restart restores from the offset
        # log instead) — the one reliable restart detector the API offers
        start = self._start_version - 1
        self._paced = start
        if start > self._floor:
            self._floor = start
        return {"version": start}

    def latestOffset(self) -> dict:
        latest = VersionedTable(None, self._path).latest_version()
        if self._paced is None:
            # restarted query (initialOffset never called) OR the runner's
            # startup prefetch (it precedes initialOffset even on a fresh
            # query): the pace floor is unknown, so report the true latest
            # — >= any committed offset (versions only grow), never
            # regressive. Consequence: the catch-up batch after any
            # (re)start is unpaced; versionsPerBatch paces steady state.
            return {"version": latest}
        self._paced = min(
            max(self._paced, self._floor) + self._versions_per_batch, latest
        )
        self._paced = max(self._paced, self._floor)
        return {"version": self._paced}

    def _observe(self, *offsets: dict) -> None:
        for o in offsets:
            v = o.get("version", 0)
            if v > self._floor:
                self._floor = v
        if self._paced is not None and self._paced < self._floor:
            self._paced = self._floor

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        self._observe(start, end)
        t = VersionedTable(None, self._path)
        parts: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            commit = t._read_commit(v)
            removed = set(commit.get("remove", ()))
            # partition values + key stats for the OLD side live in earlier
            # commits — the pre-version resolve carries them (O(K) checkpointed)
            prev = t._resolve(v - 1)[1] if v > 1 and removed else {}
            # (min_key, max_key, (abs_path, partition_value)) per side
            old_e = [
                (prev[p].min_key, prev[p].max_key,
                 (os.path.join(self._path, p), prev[p].partition))
                for p in sorted(removed)
                if p in prev
            ]
            new_e = [
                (a.get("min_key"), a.get("max_key"),
                 (os.path.join(self._path, a["path"]), a.get("partition")))
                for a in commit.get("add", ())
            ]
            n_old = len(old_e)
            tagged = [(lo, hi, i < n_old, f)
                      for i, (lo, hi, f) in enumerate(old_e + new_e)]
            if any(lo is None or hi is None for lo, hi, _, _ in tagged):
                groups = [tagged]  # statless file: no alignment proof — 1 group
            else:
                groups = _key_range_groups(tagged) if len(tagged) > 1 else [tagged]
            for g in groups:
                parts.append(
                    _CdfPartition(
                        v,
                        [f for _, _, is_old, f in g if is_old],
                        [f for _, _, is_old, f in g if not is_old],
                    )
                )
        return parts or [_CdfPartition(0, [], [])]

    def read(self, partition: _CdfPartition):
        if partition.version == 0 or not (
            partition.old_files or partition.new_files
        ):
            return
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        data_schema = to_arrow_schema(self._schema)

        def _side(files) -> pa.Table:
            """Touched files → one Arrow table with the CURRENT logical
            schema: partition column restored from the log, schema-
            evolution gaps null-filled, columns cast per file."""
            tables = []
            for abs_path, pval in files:
                tbl = pq.read_table(abs_path)
                n = tbl.num_rows
                cols = []
                for field in data_schema:
                    if field.name == self._pcol:
                        cols.append(
                            pa.nulls(n, type=field.type)
                            if pval is None
                            else pa.array([pval] * n).cast(field.type)
                        )
                    elif field.name in tbl.column_names:
                        cols.append(tbl.column(field.name).cast(field.type))
                    else:
                        cols.append(pa.nulls(n, type=field.type))
                tables.append(pa.table(cols, schema=data_schema))
            if not tables:
                return data_schema.empty_table()
            return pa.concat_tables(tables).combine_chunks()

        def _check_keys(t: pa.Table, side: str) -> None:
            if t.num_rows == 0:
                return
            k = t.column(self._key)
            if k.null_count:
                raise ValueError(
                    f"change feed at {self._path} v{partition.version}: "
                    f"null merge key '{self._key}' on the {side} side — "
                    "rows without a key have no CDC identity"
                )
            if pc.count_distinct(k).as_py() != t.num_rows:
                raise ValueError(
                    f"change feed at {self._path} v{partition.version}: "
                    f"duplicate merge key '{self._key}' on the {side} side "
                    "— the per-key diff is ambiguous (blind append of an "
                    "existing key?)"
                )

        old_t = _side(partition.old_files)
        new_t = _side(partition.new_files)
        _check_keys(old_t, "old")
        _check_keys(new_t, "new")

        # vectorized diff: full-outer hash join of (key, row-index) pairs,
        # then null-safe column-wise equality over the matched rows
        ok = pa.table(
            {
                "__k": old_t.column(self._key),
                "__oi": pa.array(range(old_t.num_rows), type=pa.int64()),
            }
        )
        nk = pa.table(
            {
                "__k": new_t.column(self._key),
                "__ni": pa.array(range(new_t.num_rows), type=pa.int64()),
            }
        )
        j = ok.join(nk, keys="__k", join_type="full outer").combine_chunks()
        oi, ni = j.column("__oi"), j.column("__ni")
        inserts = new_t.take(ni.filter(pc.is_null(oi)))
        deletes = old_t.take(oi.filter(pc.is_null(ni)))
        both = pc.and_(pc.is_valid(oi), pc.is_valid(ni))
        o_m = old_t.take(oi.filter(both)).combine_chunks()
        n_m = new_t.take(ni.filter(both)).combine_chunks()
        same = None
        for c in self._cols:
            a, b = o_m.column(c), n_m.column(c)
            try:
                eq = pc.or_(
                    pc.and_(pc.is_null(a), pc.is_null(b)),
                    pc.fill_null(pc.equal(a, b), False),
                )
            except pa.lib.ArrowNotImplementedError:
                # nested/unordered type: python equality, still null-safe
                eq = pa.array(
                    [x == y for x, y in zip(a.to_pylist(), b.to_pylist())]
                )
            same = eq if same is None else pc.and_(same, eq)
        # survivors of a rewrite match value-for-value on both sides → drop
        updates = (
            n_m.filter(pc.invert(same)) if same is not None and n_m.num_rows
            else n_m.slice(0, 0)
        )

        v = partition.version

        def _emit(tbl: pa.Table, ctype: str) -> pa.Table:
            n = tbl.num_rows
            return tbl.append_column(
                "_change_type", pa.array([ctype] * n, pa.string())
            ).append_column(
                "_commit_version", pa.array([v] * n, pa.int32())
            )

        out = pa.concat_tables(
            [
                _emit(inserts, "insert"),
                _emit(updates, "update_postimage"),
                _emit(deletes, "delete"),
            ]
        )
        yield from out.to_batches(max_chunksize=1 << 16)

    def commit(self, end: dict) -> None:
        # the table log is the source of truth; only the pacer floor moves
        self._observe(end)

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
