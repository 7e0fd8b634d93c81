"""A minimal versioned table format (commit log + snapshot isolation).

SURVEY §1.1 maps the reference's Postgres credential store
(veramo-agent/src/config/database.config.ts:48-74) to "Delta/Parquet-backed
dimension tables; MERGE for upserts". Rounds 1-8 delivered the MERGE
*combinator* (sources/sinks.py:123) and apply==rebuild proofs
(operators/credstore.py); this module delivers the missing DURABLE half:
a commit-log table format with the ACID properties a warehouse-grade
store sink actually needs, built from scratch on parquet + an append-only
JSON log (the Delta Lake / Iceberg design, re-derived minimally):

- **Atomic commits**: a version N commit is a single ``os.link`` of a
  fully-written temp file onto ``_log/<N>.json``. POSIX ``link(2)`` fails
  with EEXIST if version N already exists, which gives optimistic
  concurrency control for free: the loser re-reads the snapshot and
  rebases (retries) — exactly Delta's protocol. Readers never see a
  partial commit because the log file appears atomically or not at all.
- **Snapshot isolation**: data files are immutable and every commit is an
  {add, remove} file-set delta. A reader resolves its file list once from
  the log at version V and is untouched by later commits; writers never
  mutate files in place.
- **Time travel**: ``snapshot(version=N)`` replays the log prefix 1..N.
- **MERGE INTO**: key-range file pruning (per-file min/max key stats are
  recorded in each add action — the data-skipping index), then a single
  Spark job rewrites only the pruned candidate files: survivors
  (anti-join on the merge key) + matched rows (combined via caller
  ``when_matched`` SQL exprs over aliases ``t``/``s``) + inserts.
  Untouched files carry over by reference — at 100 TB a merge touching
  1% of the key space rewrites ~1% of the files and zero bytes of the
  rest.
- **Erasure + vacuum**: ``delete_where`` rewrites only files that
  physically contain matching rows (located by one ``input_file_name()``
  aggregation, i.e. the same pruning currency); ``vacuum`` then deletes
  every data file not referenced by the retained log suffix — the
  physical completion GDPR erasure requires (ties into
  operators/transform.py ``gdpr_erasure``'s ERASE_MOD cohort).
- **OPTIMIZE / CDF / evolution / layout** (round 9): ``compact()``
  bin-packs in one commit with history intact; ``change_feed()`` emits
  the row-level diff between versions file-confined; ``merge_into(...,
  allow_new_columns=True)`` widens the schema as metadata (untouched
  files null-fill at read); ``create(partition_by=...)`` records hive
  partition values per add action (``partition_scan`` prunes from the
  log; MERGE partition pruning is opt-in via ``stable_partitions``
  because churning upserts move keys across partitions); ``create(
  bloom_by=...)`` carries a per-file bloom in the log for point lookups
  on a column the key-range layout doesn't cluster (``point_scan``).
- **Checkpoints** (round 10): every ``_CHECKPOINT_EVERY`` commits the
  writer also materializes the RESOLVED state (live file set + schema)
  as ``_log/<N>.checkpoint.json``; ``_resolve`` starts from the newest
  checkpoint at-or-below the target version and replays only the tail,
  so snapshot resolution reads O(_CHECKPOINT_EVERY) log files no matter
  how long the history grows — the Delta ``_last_checkpoint`` design.
  Checkpoints are derived data (deterministic function of the log
  prefix), written atomically via rename, safe to lose or race.
- **Multi-column data skipping** (round 10): ``create(stats_cols=...)``
  records per-file [min, max] for a declared column set alongside the
  merge key's, and ``pruned_scan`` cuts files on any of them — Delta's
  leading-column stats collection, opt-in by name instead of position.

Scale shape: the log is O(#files) metadata (tiny next to data);
snapshot resolution is driver-side JSON bounded by the checkpoint
cadence; min/max/row-count stats come from parquet FOOTERS (metadata,
never data rows) and the per-file bloom index is computed by a bounded
Spark job over the freshly-written files (executor-side, O(#files)
metadata collected); all data movement is normal pruned parquet scans +
one shuffle-by-range per rewrite so min/max stats stay tight for the
next merge's pruning. Nothing here collects data rows to the driver.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class CommitConflict(Exception):
    """Another writer committed this version first — rebase and retry."""


class VersionPrunedError(Exception):
    """The requested version's files were removed by vacuum()."""


@dataclass(frozen=True)
class FileStat:
    path: str  # relative to table root
    rows: int
    min_key: object
    max_key: object
    partition: object = None  # hive partition value (one column), if any
    bloom: str | None = None  # per-file bloom over the bloom_by column (hex)
    stats: dict | None = None  # extra per-column {col: [min, max]} skipping stats


# per-file bloom sizing: 1024 bits (128 bytes, ~256 hex chars in the log)
# with k=3 md5-derived positions — fp ~8% at ~190 rows/file, i.e. a point
# lookup opens the 1 true file plus ~8% of the rest instead of all of them.
# Size m to rows-per-file on a real deployment (Delta's bloom index knob).
_BLOOM_BITS = 1 << 10
_BLOOM_K = 3

# bloom_by is restricted to integer/string columns so the BUILD-side
# canonical form (Spark `CAST(col AS STRING)` inside the executor-side
# harvest job) and the PROBE-side form (`str(value)` here) are bit-equal
# — a repr divergence (5.0 vs 5, Decimal, date) would be a FALSE NEGATIVE
# in the filter, i.e. a silently dropped true row, not just lost pruning.
_BLOOM_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.StringType)


def _bloom_canon(value) -> str:
    if isinstance(value, bool) or not isinstance(value, (int, str)):
        raise TypeError(
            f"bloom probe value must be int or string, got {type(value).__name__}"
        )
    return str(value)


def _bloom_positions(value) -> list[int]:
    import hashlib

    canon = _bloom_canon(value)
    return [
        int.from_bytes(
            hashlib.md5(f"{canon}|{seed}".encode()).digest()[:8], "big"
        )
        % _BLOOM_BITS
        for seed in range(_BLOOM_K)
    ]


def _bloom_build(values) -> str:
    bits = 0
    for v in values:
        if v is None:
            continue
        for p in _bloom_positions(v):
            bits |= 1 << p
    return f"{bits:0{_BLOOM_BITS // 4}x}"


def _bloom_might_contain(hex_bits: str, value) -> bool:
    bits = int(hex_bits, 16)
    return all(bits >> p & 1 for p in _bloom_positions(value))


_LOG_DIR = "_log"
_DATA_DIR = "data"
_TMP_DIR = "_tmp"

# checkpoint cadence: resolution replays at most this many tail commits
# past the newest checkpoint. Delta defaults to 10; same here.
_CHECKPOINT_EVERY = 10

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _fmt_version(v: int) -> str:
    return f"{v:020d}.json"


def _fmt_checkpoint(v: int) -> str:
    return f"{v:020d}.checkpoint.json"


def _local_path(uri: str) -> str:
    """input_file_name() yields ``file:///abs/path`` URIs — normalize to a
    plain filesystem path (paths here are uuid-hex, never URL-escaped)."""
    from urllib.parse import urlparse

    return urlparse(uri).path if uri.startswith("file:") else uri


def _hive_unescape(dir_value: str):
    """Invert Spark's hive partition-directory encoding: percent-escaped
    special characters (space, ':', '%', '=', ...) and the
    ``__HIVE_DEFAULT_PARTITION__`` null sentinel. Without this a partition
    value like ``a b`` would be stored in the commit log as ``a%20b`` and
    restored as the wrong literal by ``_read_files``."""
    if dir_value == _HIVE_NULL:
        return None
    from urllib.parse import unquote

    return unquote(dir_value)


def _stat_dict(s: "FileStat") -> dict:
    """Add-action JSON for one data file (shared by commits + checkpoints)."""
    return {
        "path": s.path,
        "rows": s.rows,
        "min_key": s.min_key,
        "max_key": s.max_key,
        **({"partition": s.partition} if s.partition is not None else {}),
        **({"bloom": s.bloom} if s.bloom is not None else {}),
        **({"stats": s.stats} if s.stats else {}),
    }


def _stat_from_dict(add: dict) -> "FileStat":
    return FileStat(
        add["path"],
        add["rows"],
        add.get("min_key"),
        add.get("max_key"),
        add.get("partition"),
        add.get("bloom"),
        add.get("stats"),
    )


class VersionedTable:
    """Handle to a commit-log table rooted at ``path``.

    The handle is stateless: every operation re-resolves the log, so any
    number of handles (processes) can share one table directory with
    link(2)-arbitrated commits.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)

    # -- log resolution ----------------------------------------------------

    def _scan_log(self) -> tuple[list[int], list[int]]:
        """One listdir → (commit versions, checkpoint versions), sorted."""
        log = os.path.join(self.path, _LOG_DIR)
        if not os.path.isdir(log):
            return [], []
        commits, checkpoints = [], []
        for name in os.listdir(log):
            stem, ext = os.path.splitext(name)
            if ext != ".json":
                continue
            if stem.isdigit():
                commits.append(int(stem))
            elif stem.endswith(".checkpoint") and stem[:-11].isdigit():
                checkpoints.append(int(stem[:-11]))
        commits.sort()
        checkpoints.sort()
        # Contiguity from the FIRST surviving commit: a gap means a corrupt
        # log (commits are atomic, so gaps cannot arise from crashes — only
        # external tampering). The log may start past 1 after a log-
        # retention vacuum, which always leaves a checkpoint at (or just
        # below) the first surviving commit so resolution stays closed.
        if commits:
            first = commits[0]
            for i, v in enumerate(commits):
                if v != first + i:
                    raise ValueError(
                        f"non-contiguous commit log at {self.path}: {commits}"
                    )
            if first > 1 and not any(
                c in (first - 1, first) for c in checkpoints
            ):
                raise ValueError(
                    f"pruned commit log at {self.path} starts at {first} "
                    f"with no checkpoint at {first - 1} or {first}"
                )
        return commits, checkpoints

    def _log_versions(self) -> list[int]:
        return self._scan_log()[0]

    def latest_version(self) -> int:
        vs = self._log_versions()
        return vs[-1] if vs else 0

    def _read_commit(self, version: int) -> dict:
        with open(os.path.join(self.path, _LOG_DIR, _fmt_version(version))) as f:
            return json.load(f)

    def _read_checkpoint(self, version: int) -> dict:
        with open(
            os.path.join(self.path, _LOG_DIR, _fmt_checkpoint(version))
        ) as f:
            return json.load(f)

    def _resolve(self, version: int | None = None) -> tuple[int, dict[str, FileStat], T.StructType]:
        """Resolve (version, live file set, schema) from the newest
        checkpoint at-or-below the target plus the commit tail — O(K)
        log reads at any history depth (K = _CHECKPOINT_EVERY). Time
        travel to a pre-checkpoint version replays from 1 (or from an
        older checkpoint, if one survives)."""
        versions, checkpoints = self._scan_log()
        if not versions:
            raise FileNotFoundError(f"no commits at {self.path}")
        v = versions[-1] if version is None else version
        if v < 1 or v > versions[-1]:
            raise ValueError(f"version {v} out of range 1..{versions[-1]}")
        live: dict[str, FileStat] = {}
        schema_json = None
        start = 1
        usable = [c for c in checkpoints if c <= v]
        if usable:
            ck = self._read_checkpoint(usable[-1])
            live = {a["path"]: _stat_from_dict(a) for a in ck["live"]}
            schema_json = ck["schema"]
            start = usable[-1] + 1
        elif versions[0] > 1:
            # log retention pruned every commit and checkpoint <= v
            raise VersionPrunedError(
                f"version {v} predates the log retention horizon at "
                f"{self.path} (oldest resolvable state: checkpoint "
                f"{checkpoints[0] if checkpoints else '?'})"
            )
        for n in range(start, v + 1):
            if n < versions[0]:
                continue  # folded into the checkpoint (log retention)
            c = self._read_commit(n)
            if c.get("schema"):
                schema_json = c["schema"]
            for rm in c.get("remove", ()):
                live.pop(rm, None)
            for add in c.get("add", ()):
                live[add["path"]] = _stat_from_dict(add)
        if schema_json is None:
            raise ValueError(f"commit log at {self.path} carries no schema")
        schema = T.StructType.fromJson(json.loads(schema_json))
        return v, live, schema

    def _maybe_checkpoint(self, version: int) -> None:
        """Materialize the resolved state at ``version`` if it sits on the
        checkpoint cadence. Derived data: content is a deterministic
        function of the log prefix, the write is an atomic replace, and a
        racing duplicate write is harmless — losing a checkpoint only
        costs replay length, never correctness."""
        if version % _CHECKPOINT_EVERY != 0:
            return
        _, live, schema = self._resolve(version)
        payload = {
            "version": version,
            "live": [_stat_dict(s) for s in sorted(live.values(), key=lambda s: s.path)],
            "schema": schema.json(),
            # table-level meta rides every checkpoint so a log-retention
            # vacuum can prune the create commit without losing it
            "meta": self._table_meta(),
        }
        log = os.path.join(self.path, _LOG_DIR)
        tmp = os.path.join(log, f"_tmp_ck_{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(payload, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(log, _fmt_checkpoint(version)))

    # -- reads ---------------------------------------------------------------

    _META_KEYS = (
        "key", "partition_by", "bloom_by", "stats_cols",
        "target_rows_per_file",
    )

    def _table_meta(self) -> dict:
        """Table-level metadata fixed at create time. Read from commit 1
        while it survives; after a log-retention ``vacuum`` pruned it,
        from the oldest surviving checkpoint (vacuum copies the meta into
        the retained checkpoint before pruning its source commits)."""
        try:
            c = self._read_commit(1)
            return {k: c[k] for k in self._META_KEYS if k in c}
        except FileNotFoundError:
            pass
        _, checkpoints = self._scan_log()
        for ck in checkpoints:
            d = self._read_checkpoint(ck)
            if "meta" in d:
                return d["meta"]
        raise ValueError(
            f"pruned log at {self.path} has no meta-carrying checkpoint"
        )

    def partition_column(self) -> str | None:
        """Hive partition column, fixed at create time (or None)."""
        return self._table_meta().get("partition_by")

    def bloom_column(self) -> str | None:
        """Bloom-indexed column, fixed at create time (or None)."""
        return self._table_meta().get("bloom_by")

    def key_column(self) -> str | None:
        """Layout/merge key recorded at create time (None on pre-r10 logs)."""
        return self._table_meta().get("key")

    def stats_columns(self) -> tuple[str, ...]:
        """Extra data-skipping stats columns, fixed at create time."""
        return tuple(self._table_meta().get("stats_cols", ()))

    def target_rows_per_file(self) -> int:
        """File-sizing target recorded at create time."""
        return int(self._table_meta().get("target_rows_per_file", 250_000))

    def point_scan(
        self, col: str, value, version: int | None = None
    ) -> tuple[DataFrame, int, int]:
        """Bloom-index point lookup: open only files whose per-file bloom
        might contain ``value`` — the data-skipping move min/max stats
        can't make for a NON-clustered column (the key-range stats are
        useless for a point predicate on a column the layout doesn't sort
        by; Delta's bloom filter index fills exactly this gap). The exact
        predicate still applies after the file cut, so false positives
        never reach the result."""
        if col != self.bloom_column():
            raise ValueError(f"no bloom index on column '{col}'")
        v, live, schema = self._resolve(version)
        cand = [
            s
            for s in live.values()
            if s.bloom is None or _bloom_might_contain(s.bloom, value)
        ]
        pred = F.col(col) == F.lit(value)
        if not cand:
            return self.spark.createDataFrame([], schema), 0, len(live)
        return (
            self._read_files(cand, schema, v).where(pred),
            len(cand),
            len(live),
        )

    def _read_files(
        self, stats: list[FileStat], schema: T.StructType, version: int
    ) -> DataFrame:
        """Read a live-file subset with the LOGICAL schema. Partitioned
        tables store the partition column in the directory layout, not in
        the parquet bytes (the hive convention), so each partition group
        is read with the physical schema and the column is restored as a
        per-group literal — O(#partitions touched) scan legs, unioned."""
        pcol = self.partition_column()
        for s in stats:
            p = os.path.join(self.path, s.path)
            if not os.path.exists(p):
                raise VersionPrunedError(
                    f"version {version} references vacuumed file {s.path}"
                )
        if pcol is None:
            return self.spark.read.schema(schema).parquet(
                *[os.path.join(self.path, s.path) for s in sorted(stats, key=lambda s: s.path)]
            )
        phys = T.StructType([f for f in schema.fields if f.name != pcol])
        ptype = schema[pcol].dataType
        groups: dict[object, list[str]] = {}
        for s in stats:
            groups.setdefault(s.partition, []).append(
                os.path.join(self.path, s.path)
            )
        legs = []
        for val in sorted(groups, key=str):
            legs.append(
                self.spark.read.schema(phys)
                .parquet(*sorted(groups[val]))
                .withColumn(pcol, F.lit(val).cast(ptype))
                .select(*[f.name for f in schema.fields])
            )
        out = legs[0]
        for leg in legs[1:]:
            out = out.unionByName(leg)
        return out

    def version_at(self, ts_ms: int) -> int:
        """TIMESTAMP AS OF resolution (the Delta surface): the latest
        version whose commit timestamp is <= ``ts_ms``. O(surviving
        commits) metadata reads — bounded by log retention. Commits from
        pre-timestamp logs sort as arbitrarily old. Raises if every
        surviving commit is newer (or, after a log-retention vacuum, if
        the true answer was pruned — refusing beats a wrong snapshot)."""
        versions = self._log_versions()
        if not versions:
            raise FileNotFoundError(f"no commits at {self.path}")
        best = None
        for v in versions:
            t = self._read_commit(v).get("ts_ms")
            if t is None or t <= ts_ms:
                best = v
        if best is None:
            raise VersionPrunedError(
                f"no commit at or before ts_ms={ts_ms} survives at "
                f"{self.path} (oldest surviving commit is newer)"
            )
        return best

    def snapshot(
        self, version: int | None = None, as_of_ts_ms: int | None = None
    ) -> DataFrame:
        """Snapshot-isolated read; ``version`` pins VERSION AS OF time
        travel, ``as_of_ts_ms`` pins TIMESTAMP AS OF (mutually
        exclusive)."""
        if as_of_ts_ms is not None:
            if version is not None:
                raise ValueError("pass version OR as_of_ts_ms, not both")
            version = self.version_at(as_of_ts_ms)
        v, live, schema = self._resolve(version)
        if not live:
            return self.spark.createDataFrame([], schema)
        return self._read_files(list(live.values()), schema, v)

    def history(self) -> list[dict]:
        return [self._read_commit(v) for v in self._log_versions()]

    # -- write plumbing --------------------------------------------------------

    def _commit(
        self,
        version: int,
        op: str,
        add: list[FileStat],
        remove: list[str],
        schema: T.StructType | None = None,
        partition_by: str | None = None,
        bloom_by: str | None = None,
        table_meta: dict | None = None,
    ) -> None:
        """Atomic exclusive publish of commit ``version`` via link(2)."""
        log = os.path.join(self.path, _LOG_DIR)
        os.makedirs(log, exist_ok=True)
        payload = {
            "version": version,
            "op": op,
            "ts_ms": int(time.time() * 1000),  # TIMESTAMP AS OF anchor
            "add": [_stat_dict(s) for s in add],
            "remove": sorted(remove),
        }
        if schema is not None:
            payload["schema"] = schema.json()
        if partition_by is not None:
            payload["partition_by"] = partition_by
        if bloom_by is not None:
            payload["bloom_by"] = bloom_by
        if table_meta:
            payload.update(table_meta)
        tmp = os.path.join(log, f"_tmp_{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(payload, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, os.path.join(log, _fmt_version(version)))
        except FileExistsError:
            raise CommitConflict(
                f"version {version} already committed at {self.path}"
            ) from None
        finally:
            os.unlink(tmp)
        self._maybe_checkpoint(version)

    def _bloom_harvest(self, scratch: str, bloom_by: str) -> dict[str, str]:
        """Per-file bloom bitmaps for every file under ``scratch``, computed
        by ONE bounded Spark job (executor-side — the driver never reads
        data rows; round-10 fix for the former driver-side column pull).
        The md5→position arithmetic runs as JVM expressions over the
        canonical ``CAST(col AS STRING)`` form, bit-identical to the
        Python probe side (``_bloom_positions``); the collect is
        O(#files) rows of ≤``_BLOOM_BITS`` distinct positions each —
        metadata, not data."""
        pos = [
            F.expr(
                "CAST(pmod(CAST(conv(substring(md5(concat(_b, '|', "
                f"'{seed}')), 1, 16), 16, 10) AS DECIMAL(20,0)), "
                f"{_BLOOM_BITS}) AS INT)"
            )
            for seed in range(_BLOOM_K)
        ]
        rows = (
            self.spark.read.parquet(scratch)
            .select(
                F.input_file_name().alias("_f"),
                F.col(bloom_by).cast("string").alias("_b"),
            )
            .where(F.col("_b").isNotNull())
            .select("_f", F.explode(F.array(*pos)).alias("_p"))
            .groupBy("_f")
            .agg(F.collect_set("_p").alias("_ps"))
            .collect()
        )
        out: dict[str, str] = {}
        for r in rows:
            bits = 0
            for p in r["_ps"]:
                bits |= 1 << p
            out[_local_path(r["_f"])] = f"{bits:0{_BLOOM_BITS // 4}x}"
        return out

    def _write_files(
        self,
        df: DataFrame,
        key: str,
        n_files: int,
        partition_by: str | None = None,
        bloom_by: str | None = None,
        stats_cols: tuple[str, ...] | None = None,
        order_by=None,
    ) -> list[FileStat]:
        """Write ``df`` into fresh immutable data files + harvest their
        per-column min/max stats from the parquet FOOTERS driver-side
        (the Delta/Iceberg stats-collection model: O(#files) METADATA
        reads, zero extra Spark jobs, never O(rows)); the per-file bloom,
        which needs actual values, is computed executor-side by
        ``_bloom_harvest``. With ``partition_by``, ONE Spark job writes
        the hive layout (partitionBy) and each file's partition value is
        recorded in its add action — the directory encoding is transient;
        the log is the source of truth. ``order_by`` overrides the
        range-shuffle expression (the Z-order path); default is the key."""
        import pyarrow.parquet as pq

        scratch = os.path.join(self.path, _TMP_DIR, uuid.uuid4().hex)
        cluster = order_by if order_by is not None else F.col(key)
        shuffle_cols = (
            [F.col(partition_by), cluster] if partition_by else [cluster]
        )
        part = (
            df.repartitionByRange(n_files, *shuffle_cols)
            if n_files > 1
            else df.coalesce(1)  # skip the range-boundary sampling job
        )
        writer = part.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(scratch)
        data_dir = os.path.join(self.path, _DATA_DIR)
        os.makedirs(data_dir, exist_ok=True)
        blooms = (
            self._bloom_harvest(scratch, bloom_by)
            if bloom_by is not None
            else {}
        )

        def _footer_range(meta, col: str, base: str) -> tuple:
            ci = meta.schema.to_arrow_schema().get_field_index(col)
            mins, maxs = [], []
            for g in range(meta.num_row_groups):
                st = meta.row_group(g).column(ci).statistics
                if st is None or not st.has_min_max:
                    raise ValueError(
                        f"no parquet stats for column '{col}' in {base}"
                    )
                mins.append(st.min)
                maxs.append(st.max)
            return min(mins), max(maxs)

        def _harvest(src_dir: str, pval) -> list[FileStat]:
            stats = []
            for base in sorted(os.listdir(src_dir)):
                if not base.endswith(".parquet"):
                    continue
                src = os.path.join(src_dir, base)
                meta = pq.ParquetFile(src).metadata
                if meta.num_rows == 0:
                    continue
                kmin, kmax = _footer_range(meta, key, base)
                extra = (
                    {
                        c: list(_footer_range(meta, c, base))
                        for c in stats_cols
                        if c != key and c != partition_by
                    }
                    if stats_cols
                    else None
                )
                bloom = blooms.get(src)
                rel = os.path.join(_DATA_DIR, f"part-{uuid.uuid4().hex}.parquet")
                # same filesystem (scratch is inside the table root): atomic
                os.rename(src, os.path.join(self.path, rel))
                stats.append(
                    FileStat(rel, meta.num_rows, kmin, kmax, pval, bloom, extra)
                )
            return stats

        out: list[FileStat] = []
        if partition_by:
            for pdir in sorted(os.listdir(scratch)):
                if "=" not in pdir:
                    continue
                # hive dir encoding: percent-escaped + null sentinel —
                # invert it so the log stores the TRUE value
                out.extend(
                    _harvest(
                        os.path.join(scratch, pdir),
                        _hive_unescape(pdir.split("=", 1)[1]),
                    )
                )
        else:
            out = _harvest(scratch, None)
        shutil.rmtree(scratch, ignore_errors=True)
        return out

    # -- operations -------------------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        df: DataFrame,
        key: str,
        target_rows_per_file: int = 250_000,
        partition_by: str | None = None,
        bloom_by: str | None = None,
        stats_cols: tuple[str, ...] | list[str] | None = None,
    ) -> "VersionedTable":
        t = cls(spark, path)
        if t.latest_version():
            raise FileExistsError(f"table already exists at {path}")
        if bloom_by is not None:
            if bloom_by == partition_by:
                # the partition column lives in the directory layout, not
                # the parquet bytes — there is nothing to bloom-index, and
                # partition_scan already prunes it exactly
                raise ValueError(
                    "bloom_by == partition_by: use partition pruning instead"
                )
            btype = df.schema[bloom_by].dataType
            if not isinstance(btype, _BLOOM_TYPES):
                raise TypeError(
                    f"bloom_by column '{bloom_by}' must be integer or "
                    f"string (got {btype.simpleString()}): other types have "
                    "no canonical cross-engine string form and would risk "
                    "bloom false negatives"
                )
        for c in stats_cols or ():
            if not isinstance(
                df.schema[c].dataType,
                (*_BLOOM_TYPES, T.FloatType, T.DoubleType),
            ):
                raise TypeError(
                    f"stats_cols column '{c}' must be numeric or string "
                    f"(got {df.schema[c].dataType.simpleString()}): min/max "
                    "must round-trip through the JSON log"
                )
        n = max(1, math.ceil(df.count() / target_rows_per_file))
        files = t._write_files(
            df, key, n, partition_by, bloom_by, tuple(stats_cols or ())
        )
        t._commit(
            1,
            "create",
            files,
            [],
            schema=df.schema,
            partition_by=partition_by,
            bloom_by=bloom_by,
            table_meta={
                "key": key,
                "target_rows_per_file": target_rows_per_file,
                **(
                    {"stats_cols": list(stats_cols)}
                    if stats_cols
                    else {}
                ),
            },
        )
        return t

    def append(
        self,
        df: DataFrame,
        key: str,
        max_attempts: int = 5,
        target_rows_per_file: int | None = None,
    ) -> int:
        """Blind append sized like ``create``: a large append fans out to
        ``ceil(count / target)`` range-partitioned files with tight
        min/max stats instead of serializing through one task (the
        pre-r10 ``coalesce(1)``)."""
        target = target_rows_per_file or self.target_rows_per_file()
        n = max(1, math.ceil(df.count() / target))
        files = self._write_files(
            df, key, n, self.partition_column(), self.bloom_column(),
            self.stats_columns(),
        )
        for _ in range(max_attempts):
            v = self.latest_version()
            try:
                self._commit(v + 1, "append", files, [])
                return v + 1
            except CommitConflict:
                continue  # blind append: rebase is just "take the next slot"
        raise CommitConflict(f"append lost {max_attempts} races at {self.path}")

    def merge_into(
        self,
        updates: DataFrame,
        key: str,
        when_matched: dict[str, str] | None = None,
        max_attempts: int = 5,
        allow_new_columns: bool = False,
        stable_partitions: bool = False,
    ) -> int:
        """MERGE INTO: upsert ``updates`` (unique per ``key``) into the
        table. ``when_matched`` maps column -> SQL expr over aliases
        ``t`` (target row) / ``s`` (source row); default takes the source
        row wholesale. Unmatched source keys insert.

        The rewrite set is pruned twice: (1) driver-side against the
        per-file [min_key, max_key] stats in the log — files whose range
        cannot contain any update key are never opened; (2) rows, by the
        anti/semi joins inside the single rewrite job. Conflicts rebase:
        the whole plan re-resolves against the fresh snapshot.

        ``allow_new_columns=True`` is schema evolution (Delta's
        mergeSchema): source columns absent from the table widen the
        committed schema as nullable fields. Untouched files are NOT
        rewritten — the explicit read schema null-fills missing columns
        at scan time, so evolution is an O(metadata) operation no matter
        the table size (the Delta/Iceberg contract)."""
        pcol = self.partition_column()
        bcol = self.bloom_column()
        scols = self.stats_columns()
        for _ in range(max_attempts):
            v, live, schema = self._resolve()
            evolved = False
            if allow_new_columns:
                have = {f.name for f in schema.fields}
                extra = [f for f in updates.schema.fields if f.name not in have]
                if extra:
                    schema = T.StructType(
                        list(schema.fields)
                        + [T.StructField(f.name, f.dataType, True) for f in extra]
                    )
                    evolved = True
            cols = [f.name for f in schema.fields]
            upd = updates.select(*cols)

            # (0) partition pruning: only files in partitions the update
            # touches can match (bounded: <= one row per touched partition).
            # SOUND ONLY when the caller asserts the partition value is a
            # pure function of the key (``stable_partitions``): a
            # partition-churning upsert's OLD row lives in a partition the
            # source never mentions, and skipping its file would duplicate
            # the key. Without the assertion, key-range pruning alone
            # (which sees every live file) carries the rewrite set.
            prunable = list(live.values())
            if pcol is not None and stable_partitions and prunable:
                vals = [
                    r[0]
                    for r in upd.select(
                        F.col(pcol).cast("string")
                    ).distinct().collect()
                ]
                touched = {v for v in vals if v is not None}
                touched_null = any(v is None for v in vals)
                prunable = [
                    s
                    for s in prunable
                    if (
                        touched_null
                        if s.partition is None
                        else str(s.partition) in touched
                    )
                ]

            # (1) file pruning via broadcast of the O(#files) stats table
            if prunable:
                from ssiintegrateddatapipeline_spark.sources.batch import (
                    local_frame,
                )

                stats_df = local_frame(
                    self.spark,
                    [(s.path, s.min_key, s.max_key) for s in prunable],
                    T.StructType(
                        [
                            T.StructField("path", T.StringType()),
                            T.StructField("min_key", schema[key].dataType),
                            T.StructField("max_key", schema[key].dataType),
                        ]
                    ),
                )
                hit = (
                    upd.select(F.col(key).alias("_k"))
                    .distinct()
                    .join(
                        F.broadcast(stats_df),
                        (F.col("_k") >= F.col("min_key"))
                        & (F.col("_k") <= F.col("max_key")),
                    )
                    .select("path")
                    .distinct()
                    .collect()  # bounded: <= one row per data file
                )
                candidates = sorted(r["path"] for r in hit)
            else:
                candidates = []

            if candidates:
                cand = self._read_files(
                    [live[c] for c in candidates], schema, v
                )
                survivors = cand.join(upd.select(key), key, "left_anti")
                if when_matched:
                    t_ = cand.alias("t")
                    s_ = upd.alias("s")
                    matched = t_.join(s_, F.col(f"t.{key}") == F.col(f"s.{key}")).select(
                        *[
                            F.expr(when_matched.get(c, f"s.`{c}`")).alias(c)
                            for c in cols
                        ]
                    )
                    inserts = upd.join(cand.select(key), key, "left_anti")
                    out = survivors.unionByName(matched).unionByName(inserts)
                else:
                    out = survivors.unionByName(upd)
                n_files = len(candidates)
            else:
                out = upd
                n_files = 1
            files = self._write_files(out, key, n_files, pcol, bcol, scols)
            try:
                self._commit(
                    v + 1,
                    "merge",
                    files,
                    candidates,
                    schema=schema if evolved else None,
                )
                return v + 1
            except CommitConflict:
                for s in files:  # orphan the rewrite, rebase on new snapshot
                    os.unlink(os.path.join(self.path, s.path))
                continue
        raise CommitConflict(f"merge lost {max_attempts} races at {self.path}")

    def delete_where(self, condition, key: str, max_attempts: int = 5) -> int:
        """Delete rows matching ``condition`` (a Column or SQL string) by
        rewriting ONLY files that physically contain a match (found via one
        input_file_name() aggregation — the row-level pruning pass)."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        pcol = self.partition_column()
        bcol = self.bloom_column()
        scols = self.stats_columns()
        for _ in range(max_attempts):
            v, live, schema = self._resolve()
            if not live:
                return v
            by_file = {
                os.path.join(self.path, s.path): s.path for s in live.values()
            }
            hit = (
                self._read_files(list(live.values()), schema, v)
                .where(cond)
                .select(F.input_file_name().alias("f"))
                .distinct()
                .collect()  # bounded: <= one row per data file
            )
            candidates = sorted(by_file[_local_path(r["f"])] for r in hit)
            if not candidates:
                return v  # nothing to delete — no empty commit
            kept = self._read_files(
                [live[c] for c in candidates], schema, v
            ).where(~cond)
            files = self._write_files(kept, key, len(candidates), pcol, bcol, scols)
            try:
                self._commit(v + 1, "delete", files, candidates)
                return v + 1
            except CommitConflict:
                for s in files:
                    os.unlink(os.path.join(self.path, s.path))
                continue
        raise CommitConflict(f"delete lost {max_attempts} races at {self.path}")

    def compact(
        self,
        key: str,
        target_rows_per_file: int = 250_000,
        max_attempts: int = 5,
    ) -> int:
        """OPTIMIZE: bin-pack the live file set into ~target-size files in
        one commit (add new, remove all old). Data is byte-identical; the
        history stays intact — old files are only reclaimed by a later
        ``vacuum()``, so time travel across the compaction boundary keeps
        working (the Delta OPTIMIZE contract). The rewrite re-ranges by
        ``key`` so the post-compaction min/max stats are tight again for
        the next merge's file pruning."""
        pcol = self.partition_column()
        bcol = self.bloom_column()
        scols = self.stats_columns()
        for _ in range(max_attempts):
            v, live, schema = self._resolve()
            total = sum(s.rows for s in live.values())
            n = max(1, math.ceil(total / target_rows_per_file))
            if n >= len(live):
                return v  # already at (or below) target granularity
            df = self._read_files(list(live.values()), schema, v)
            files = self._write_files(df, key, n, pcol, bcol, scols)
            try:
                self._commit(v + 1, "compact", files, sorted(live))
                return v + 1
            except CommitConflict:
                for s in files:
                    os.unlink(os.path.join(self.path, s.path))
                continue
        raise CommitConflict(f"compact lost {max_attempts} races at {self.path}")

    @staticmethod
    def _morton(cols, bounds: dict, bits: int = 16):
        """Bit-interleaved (Morton / Z-order) curve position over the
        given columns, as one pure-JVM Column expression: each column is
        min/max-normalized into ``bits``-bit cells, then the cells' bits
        are interleaved so curve-adjacent rows are close in EVERY
        dimension — the locality that makes per-file [min, max] rectangles
        tight on all clustered columns at once."""
        norm = []
        for c in cols:
            lo, hi = bounds[c]
            span = max(1, int(hi) - int(lo))
            # floor((c - lo) * 2^bits / (span + 1)) in exact int arithmetic
            norm.append(
                F.expr(
                    f"((cast(`{c}` as bigint) - {int(lo)}) * {1 << bits}) "
                    f"div {span + 1}"
                )
            )
        z = F.lit(0).cast("long")
        d = len(cols)
        for b in range(bits):
            for i, n in enumerate(norm):
                z = z.bitwiseOR(
                    F.shiftleft(
                        F.shiftright(n, b).bitwiseAND(F.lit(1)), b * d + i
                    )
                )
        return z

    def zorder(
        self,
        cols: list[str],
        target_rows_per_file: int = 250_000,
        max_attempts: int = 5,
    ) -> int:
        """OPTIMIZE ZORDER BY: rewrite the live file set clustered along a
        Morton (Z-order) curve over ``cols`` — after it, a range predicate
        on ANY of the clustered columns skips files via the recorded
        per-file stats, which no single-column sort order can give for
        two columns at once (the Delta ``OPTIMIZE ... ZORDER BY`` design).
        Data is value-identical; history stays intact like ``compact``.
        ``cols`` must be integer-typed and carry recorded stats (the merge
        key or declared ``stats_cols``) so both the curve normalization
        bounds and the post-rewrite skipping are log-driven."""
        kcol = self.key_column()
        scols = self.stats_columns()
        for c in cols:
            if c != kcol and c not in scols:
                raise ValueError(
                    f"zorder column '{c}' has no recorded stats "
                    f"(key={kcol!r}, stats_cols={scols!r})"
                )
        pcol = self.partition_column()
        bcol = self.bloom_column()
        for _ in range(max_attempts):
            v, live, schema = self._resolve()
            if not live:
                return v
            for c in cols:
                if not isinstance(
                    schema[c].dataType,
                    (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
                ):
                    raise TypeError(
                        f"zorder column '{c}' must be integer-typed "
                        f"(got {schema[c].dataType.simpleString()})"
                    )
            # curve bounds from the LOG's stats — no data scan to plan
            bounds = {}
            for c in cols:
                per_file = [
                    (s.min_key, s.max_key)
                    if c == kcol
                    else tuple(s.stats[c])
                    for s in live.values()
                    if c == kcol or (s.stats and c in s.stats)
                ]
                bounds[c] = (
                    min(r[0] for r in per_file),
                    max(r[1] for r in per_file),
                )
            total = sum(s.rows for s in live.values())
            n = max(1, math.ceil(total / target_rows_per_file))
            df = self._read_files(list(live.values()), schema, v)
            files = self._write_files(
                df, kcol or cols[0], n, pcol, bcol, scols,
                order_by=self._morton(cols, bounds),
            )
            try:
                self._commit(v + 1, "zorder", files, sorted(live))
                return v + 1
            except CommitConflict:
                for s in files:
                    os.unlink(os.path.join(self.path, s.path))
                continue
        raise CommitConflict(f"zorder lost {max_attempts} races at {self.path}")

    def pruned_scan(
        self, col, lo, hi, version: int | None = None
    ) -> tuple[DataFrame, int, int]:
        """Data-skipping read: a range predicate on ``col`` evaluated
        against the log's per-file [min, max] stats BEFORE any file is
        opened — the merge key or any column declared in
        ``create(stats_cols=...)`` (multi-column skipping, round 10).
        Returns (rows in [lo, hi], files_opened, files_total) — at 100 TB
        a 1%-of-keyspace range over a range-clustered table opens ~1% of
        the files and the rest are never touched (pure driver-side
        metadata, no Spark job to decide the file list). Stats on a
        non-key column are not clustered by the layout, so they skip less
        — but correctness never depends on it: a file with no recorded
        range for ``col`` is conservatively kept."""
        kcol = self.key_column()
        is_key = kcol is None or col == kcol  # pre-r10 logs: first arg IS the key
        if not is_key and col not in self.stats_columns():
            raise ValueError(
                f"no skipping stats for column '{col}' "
                f"(key={kcol!r}, stats_cols={self.stats_columns()!r})"
            )
        v, live, schema = self._resolve(version)

        def overlaps(s: FileStat) -> bool:
            rng = (
                (s.min_key, s.max_key)
                if is_key
                else (tuple(s.stats[col]) if s.stats and col in s.stats else None)
            )
            if rng is None:
                return True  # no stats -> must read
            return not (rng[1] < lo or rng[0] > hi)

        cand = [s for s in live.values() if overlaps(s)]
        pred = (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
        if not cand:
            return self.spark.createDataFrame([], schema), 0, len(live)
        df = self._read_files(cand, schema, v).where(pred)
        return df, len(cand), len(live)

    def partition_scan(
        self, value, version: int | None = None
    ) -> tuple[DataFrame, int, int]:
        """Hive partition pruning: read ONLY the files whose add action
        records the requested partition value — decided from the log,
        no directory listing, no file opened outside the partition.
        ``value=None`` selects the null partition (the hive
        ``__HIVE_DEFAULT_PARTITION__`` cohort, stored as JSON null)."""
        v, live, schema = self._resolve(version)
        cand = [
            s
            for s in live.values()
            if (
                s.partition is None
                if value is None
                else s.partition is not None and str(s.partition) == str(value)
            )
        ]
        if not cand:
            return self.spark.createDataFrame([], schema), 0, len(live)
        return self._read_files(cand, schema, v), len(cand), len(live)

    def change_feed(self, key: str, v_from: int, v_to: int) -> DataFrame:
        """Row-level change data feed between two versions. File-confined:
        only files ADDED or REMOVED across (v_from, v_to] are read — a
        rewritten file's survivor rows appear identically on both sides
        and cancel in the value diff, so untouched data never moves. Emits
        one row per changed key: ``_change_type`` in {insert,
        update_postimage, delete} with the post-image (pre-image for
        deletes) — the Delta CDF read surface."""
        _, live_a, schema = self._resolve(v_from)
        _, live_b, schema_b = self._resolve(v_to)
        # read both sides with the NEWER schema: evolution between the two
        # versions null-fills the old side, so a widened column shows up
        # as a value change exactly when a row gained it
        removed = [s for p, s in sorted(live_a.items()) if p not in live_b]
        added = [s for p, s in sorted(live_b.items()) if p not in live_a]

        def _read(stats, at_version):
            if not stats:
                return self.spark.createDataFrame([], schema_b)
            return self._read_files(stats, schema_b, at_version)

        cols = [f.name for f in schema_b.fields]
        old = _read(removed, v_from).alias("o")
        new = _read(added, v_to).alias("n")
        j = old.join(new, F.col(f"o.{key}").eqNullSafe(F.col(f"n.{key}")), "full_outer")
        same = None
        for c in cols:
            eq = F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
            same = eq if same is None else (same & eq)
        change = (
            F.when(F.col(f"o.{key}").isNull(), F.lit("insert"))
            .when(F.col(f"n.{key}").isNull(), F.lit("delete"))
            .otherwise(F.lit("update_postimage"))
        )
        image = [
            F.coalesce(F.col(f"n.{c}"), F.col(f"o.{c}")).alias(c)
            if c != key
            else F.coalesce(F.col(f"n.{key}"), F.col(f"o.{key}")).alias(key)
            for c in cols
        ]
        # survivors of a rewrite match value-for-value on both sides -> drop
        return j.where(~F.coalesce(same, F.lit(False))).select(
            *image, change.alias("_change_type")
        )

    def restore(self, version: int, max_attempts: int = 5) -> int:
        """RESTORE TABLE ... TO VERSION: make the CURRENT snapshot equal
        the snapshot at ``version`` via one METADATA-ONLY commit — the old
        files are re-added BY REFERENCE (immutable, still on disk unless
        vacuumed) and the current live set is removed; zero data bytes
        move no matter the table size (the Delta RESTORE design). History
        stays intact: the restore is itself a new version, so the
        un-restored state remains time-travelable until vacuum."""
        for _ in range(max_attempts):
            v, live, _schema = self._resolve()
            _, old_live, old_schema = self._resolve(version)
            for s in old_live.values():
                if not os.path.exists(os.path.join(self.path, s.path)):
                    raise VersionPrunedError(
                        f"cannot restore to version {version}: file "
                        f"{s.path} was vacuumed"
                    )
            add = [s for p, s in sorted(old_live.items()) if p not in live]
            remove = [p for p in sorted(live) if p not in old_live]
            if not add and not remove:
                return v  # already identical — no empty commit
            try:
                # schema is restored too (evolution rolls back with it)
                self._commit(v + 1, "restore", add, remove, schema=old_schema)
                return v + 1
            except CommitConflict:
                continue  # no files of ours to orphan: rebase and retry
        raise CommitConflict(f"restore lost {max_attempts} races at {self.path}")

    def vacuum(self, retain_last: int = 1) -> list[str]:
        """Physically delete every file under data/ not referenced by the
        last ``retain_last`` versions — both tombstoned files (erasure
        completion) and orphans from crashed writers — AND (round 11)
        prune the commit LOG to the same horizon: commits and checkpoints
        strictly older than the newest checkpoint at-or-below the horizon
        are deleted, after copying the table meta into that checkpoint.
        The log stays O(K + retain_last) files forever instead of
        O(commits) (Delta pairs data retention with log retention the
        same way). Returns the data files it removed. Time travel past
        the retention horizon raises VersionPrunedError afterwards (the
        Delta contract); ``history()`` shrinks to the surviving commits."""
        latest = self.latest_version()
        versions, checkpoints = self._scan_log()
        v_min = max(1, latest - retain_last + 1)
        keep: set[str] = set()
        for v in range(v_min, latest + 1):
            _, live, _ = self._resolve(v)
            keep.update(live)
        data_dir = os.path.join(self.path, _DATA_DIR)
        removed = []
        if os.path.isdir(data_dir):
            for name in sorted(os.listdir(data_dir)):
                rel = os.path.join(_DATA_DIR, name)
                if rel not in keep:
                    os.unlink(os.path.join(data_dir, name))
                    removed.append(rel)
        shutil.rmtree(os.path.join(self.path, _TMP_DIR), ignore_errors=True)
        # sweep crashed writers' _log temp files too (commit/checkpoint
        # staging; committed log files are never removed). Age-gated so a
        # CONCURRENT writer's in-flight temp is never yanked out from
        # under its link(2)/replace.
        import time as _time

        log_dir = os.path.join(self.path, _LOG_DIR)
        cutoff = _time.time() - 600
        for name in os.listdir(log_dir):
            if name.startswith("_tmp_"):
                p = os.path.join(log_dir, name)
                try:
                    if os.path.getmtime(p) < cutoff:
                        os.unlink(p)
                except FileNotFoundError:
                    pass  # the writer finished and unlinked it mid-sweep
        # -- log retention: prune commits/checkpoints below the newest
        # checkpoint at-or-below the horizon. Commit ``ck`` itself is
        # KEPT so the log never empties and ``latest_version`` (driven by
        # commit files) stays truthful; resolution from ``ck`` onward
        # needs only the checkpoint plus the surviving tail — O(K) reads.
        usable = [c for c in checkpoints if c <= v_min]
        if usable:
            ck = usable[-1]
            ck_path = os.path.join(log_dir, _fmt_checkpoint(ck))
            d = self._read_checkpoint(ck)
            if "meta" not in d:  # pre-r11 checkpoint: upgrade in place
                d["meta"] = self._table_meta()
                tmp = os.path.join(log_dir, f"_tmp_ck_{uuid.uuid4().hex}.json")
                with open(tmp, "w") as f:
                    json.dump(d, f, sort_keys=True)
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(tmp, ck_path)
            for v in versions:
                if v < ck:
                    try:
                        os.unlink(os.path.join(log_dir, _fmt_version(v)))
                    except FileNotFoundError:
                        pass
            for c in checkpoints:
                if c < ck:
                    try:
                        os.unlink(os.path.join(log_dir, _fmt_checkpoint(c)))
                    except FileNotFoundError:
                        pass
        return removed
