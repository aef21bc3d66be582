"""Structured Streaming SOURCE over a SnapshotTable — the Delta-style
``spark.readStream.table(...)`` capability, built on PySpark 4's
Python Data Source API (pyspark.sql.datasource).

Public background: every lakehouse exposes its table log as a
streaming source — each micro-batch reads the files the commits since
the last checkpointed offset ADDED, so a 100 TB table feeds a stream
at O(new data) per batch with exactly-once delivery guaranteed by the
engine's offset log. This module is that design over the repo's
snapshot-table format: offsets ARE commit versions, a batch's
partitions ARE the window's new data files, and the engine checkpoint
replaces hand-rolled ``read_since`` + batch-stamp loops
(``sources/snapshots.py:644`` stays the batch-side primitive; this is
its streaming twin).

Semantics (mirroring Delta's documented streaming-read contract):

- The window's commits must be APPEND-mode — appends never remove
  files, so the added rows are exactly the new files. The table's
  FIRST commit (the bootstrap, whatever its mode) streams whole.
- A non-append commit (merge / overwrite / delete / restore) in the
  window fails the stream loudly — its changes are rewrites, not
  appends. ``skipChangeCommits true`` (Delta's option, same name)
  instead SKIPS those commits' data entirely and continues.
- ``startingVersion N`` starts the stream after version N (default 0:
  from the table's beginning).
- ``maxCommitsPerTrigger K`` rate-limits catch-up (Delta's
  maxFilesPerTrigger idea at commit granularity): each planned batch
  absorbs at most K source commits. Note the engine runs Python data
  sources under a single-batch fallback for Trigger.AvailableNow, so
  with a cap one availableNow RUN drains at most K commits — loop
  runs to drain deep history in bounded pieces (test-pinned). The
  pacing cursor re-syncs from the engine's own planned/committed
  batches after a restart, so replays stay exactly-once whatever the
  pacing was.
- Reads are Arrow-batched end-to-end: each partition is one data
  file, opened with pyarrow and aligned column-by-column to the
  stream's pinned schema (append-mode evolution null-fills columns a
  file predates; columns added after the stream started are ignored
  until restart, Delta's behavior).

Driver-side manifest access uses plain-Python I/O, so the source
supports LOCAL table roots (and file:// URIs); remote object stores
would need the fsspec equivalent. Executor-side file reads are plain
pyarrow — no JVM round-trips anywhere.

Scale shape: latestOffset/partitions touch only manifest JSON
(O(commits in window)); each micro-batch moves O(new files) bytes;
nothing ever rescans the table. The Python worker boundary is
Arrow-batch (RecordBatch) hand-off, not per-row pickling.

Deliberately NO DataSourceStreamWriter sink: the Python writer API
hands ``write()`` an Iterator[Row] — per-row Python, the exact slow
path the repo bans from hot plans. The scalable snapshot SINK is
``foreachBatch`` + ``SnapshotTable.write_batch`` (JVM parquet write,
manifest batch stamps for exactly-once — streaming/jobs.py), which
this source composes with (see tests/test_snapshot_source.py's
stream→IVM fold).
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

__all__ = [
    "SnapshotStreamDataSource",
    "register_snapshot_stream",
    "snapshot_stream",
]

_MANIFEST_DIR = "_manifests"
_MANIFEST_RE = re.compile(r"^v(\d{8})\.json$")


def _local_root(path: str) -> str:
    if path.startswith("file://"):
        path = path[len("file://"):]
    if "://" in path:
        raise ValueError(
            "snapshot_stream reads manifests with plain-Python I/O and "
            f"supports local table roots only, got {path!r}"
        )
    return path.rstrip("/")


def _versions(root: str) -> list[int]:
    mdir = os.path.join(root, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        m = _MANIFEST_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


# (root, version) -> resolved manifest. Manifests are immutable once
# published; the cache bounds the delta-chain walks below (vacuum's
# in-place checkpoint rewrite only ever swaps decode-equivalent
# content, so a stale entry is still correct).
_RESOLVED_CACHE: dict[tuple[str, int], dict] = {}
_RESOLVED_CACHE_MAX = 256


def _raw_manifest(root: str, version: int) -> dict:
    p = os.path.join(root, _MANIFEST_DIR, f"v{version:08d}.json")
    with open(p, "r", encoding="utf-8") as f:
        raw = json.load(f)
    if raw.get("files_ext"):
        # big checkpoint listings live in a parquet sidecar (round
        # 11, see snapshots.py _FILES_EXT_MIN) — inline with the same
        # plain-local I/O this module already assumes
        from globalweather_etl_spark.sources.snapshots import (
            _inline_files_local,
        )

        raw = _inline_files_local(raw, os.path.join(root, _MANIFEST_DIR))
    return raw


def _manifest(root: str, version: int) -> dict:
    """Resolve a (possibly delta-encoded) manifest with plain-Python
    I/O — the same walk-to-checkpoint decode SnapshotTable._manifest
    does JVM-side, sharing its pure decoder. O(checkpoint interval)
    file opens worst case, O(1) with the cache warm."""
    hit = _RESOLVED_CACHE.get((root, version))
    if hit is not None:
        return hit
    # lazy import: executors never call this (partition planning is
    # driver-side), and the sources package pulls pyspark.sql in
    from globalweather_etl_spark.sources.snapshots import (
        _decode_manifest,
    )

    chain = []
    v = version
    pm = None
    while True:
        raw = _raw_manifest(root, v)
        chain.append(raw)
        if not raw.get("delta"):
            break
        v = raw["parent"]
        pm = _RESOLVED_CACHE.get((root, v))
        if pm is not None:
            break
    for raw in reversed(chain):
        pm = _decode_manifest(raw, pm)
        if len(_RESOLVED_CACHE) >= _RESOLVED_CACHE_MAX:
            _RESOLVED_CACHE.clear()
        _RESOLVED_CACHE[(root, raw["version"])] = pm
    return pm


# transaction visibility (sources/catalog.py): committed is terminal,
# so positive answers are cached; pending re-checks every call
_TXN_DONE: set[tuple[str, str]] = set()


def _txn_committed(t: dict) -> bool:
    key = (t["log"], t["id"])
    if key in _TXN_DONE:
        return True
    p = os.path.join(_local_root(t["log"]), f"{t['id']}.json")
    if not os.path.isfile(p):
        return False
    try:
        with open(p, "r", encoding="utf-8") as f:
            rec = json.load(f)
    except Exception:
        return False  # half-written decision: not decided yet
    if rec.get("status") == "committed":
        _TXN_DONE.add(key)
        return True
    return False


def _visible_head(root: str, vs: list[int]) -> int | None:
    """The newest version a stream may emit: steps past manifests
    staged by a pending multi-table transaction (at most one at the
    head in practice — pending heads block further commits), and past
    entries a racing abort deleted between listdir and open.  An
    uncommitted staged version must never enter a batch window: if its
    transaction aborted, the manifest (and its files) vanish and the
    emitted rows would be rows that never committed."""
    for v in reversed(vs):
        try:
            m = _manifest(root, v)
        except FileNotFoundError:
            continue  # swept by a concurrent transaction abort
        t = m.get("txn")
        if t is None or _txn_committed(t):
            return v
    return None


@dataclass
class _FilePartition(InputPartition):
    """One data file of one commit window (absolute local path)."""

    path: str


class SnapshotStreamReader(DataSourceStreamReader):
    """Micro-batch reader: offset = {"version": last-emitted commit}."""

    def __init__(self, schema: StructType, options: dict):
        self.root = _local_root(options["path"])
        # Spark lowercases option keys
        self.start_version = int(options.get("startingversion", 0))
        self.skip_change_commits = (
            str(options.get("skipchangecommits", "false")).lower()
            == "true"
        )
        # rate limiting (Delta's maxFilesPerTrigger idea at commit
        # granularity): cap how many source commits one micro-batch
        # absorbs, so a stream catching up on deep history emits
        # bounded batches instead of one giant one
        mc = options.get("maxcommitspertrigger")
        self.max_commits = int(mc) if mc is not None else None
        if self.max_commits is not None and self.max_commits < 1:
            raise ValueError(
                "maxCommitsPerTrigger must be >= 1, got "
                f"{self.max_commits}"
            )
        self.schema_json = schema.json()
        self._last_offset: int | None = None

    # ------------------------------------------------------- offsets
    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        vs = _versions(self.root)
        head = _visible_head(self.root, vs)
        if head is None:
            head = self.start_version
        if self.max_commits is None:
            return {"version": head}
        # advance at most max_commits COMMITS past the last offset this
        # reader handed out (the engine calls latestOffset before each
        # micro-batch; its checkpoint replays partitions(start, end)
        # windows, which stay valid whatever the pacing was).
        # The cap is BEST-EFFORT across engine retries: this call
        # mutates the pacing cursor, so if the engine queries
        # latestOffset again without running the planned batch, the
        # next batch can absorb up to 2x max_commits. Correctness is
        # unaffected (partitions() derives files from actual
        # manifests) and both commit() and partitions() re-anchor the
        # cursor to the engine's real progress — Delta's
        # maxFilesPerTrigger carries the same caveat.
        lo = (
            self._last_offset
            if self._last_offset is not None
            else self.start_version
        )
        lo = max(lo, self.start_version)
        window = [v for v in vs if lo < v <= head]
        capped = window[: self.max_commits]
        out = capped[-1] if capped else lo
        self._last_offset = out
        return {"version": out}

    def commit(self, end: dict) -> None:
        # the engine's checkpoint is the offset log; we only sync the
        # rate-limit cursor so a restarted reader (fresh instance,
        # _last_offset None) re-learns where pacing stands from the
        # engine's own committed batches instead of re-pacing from
        # startingVersion
        v = int(end["version"])
        if self._last_offset is None or v > self._last_offset:
            self._last_offset = v

    # ---------------------------------------------------- partitions
    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        """New-file partitions for the commit window (lo, hi].

        Manifest I/O is O(commits in window): the baseline file set is
        seeded from the SINGLE newest surviving manifest at or below
        ``lo`` (not a walk from version 0 — the r7 advisory's
        quadratic-over-stream-lifetime hazard), and the steady-state
        case (this window starts where the last one ended) hits a
        per-reader tail cache and opens no baseline manifest at all.

        If NO manifest at or below ``lo`` survives, two cases split on
        the first window manifest's ``parent`` stamp:

        - parent is None — the table's genuine first commit: it
          bootstraps whole (whatever its mode), Delta's behavior.
        - parent is not None — history existed and ``vacuum()``
          removed it. Diffing from an empty baseline would re-deliver
          the entire table snapshot and silently break exactly-once,
          so fail LOUDLY (Delta fails the same way when a stream's
          startingVersion/offset has been vacuumed).
        """
        lo, hi = int(start["version"]), int(end["version"])
        # sync the rate-limit cursor to every batch the engine plans
        # (covers checkpoint replays on restart — see commit()); use
        # max(lo, hi) so even a degenerate/replayed window re-anchors
        # pacing at what the engine actually knows
        planned = max(lo, hi)
        if self._last_offset is None or planned > self._last_offset:
            self._last_offset = planned
        if hi <= lo:
            return []
        vs = _versions(self.root)  # one listdir; no manifest opens
        window = [v for v in vs if lo < v <= hi]
        if not window:
            return []
        cached = getattr(self, "_tail_cache", None)
        if cached is not None and cached[0] == lo:
            prev_files: set[str] = cached[1]
            bootstrap_v: int | None = None
        else:
            base = max((v for v in vs if v <= lo), default=None)
            if base is not None:
                prev_files = set(_manifest(self.root, base)["files"])
                bootstrap_v = None
            else:
                first_m = _manifest(self.root, window[0])
                if first_m.get("parent") is not None:
                    raise ValueError(
                        "snapshot_stream: no manifest survives at or "
                        f"below offset {lo} at {self.root} (earliest "
                        f"is {window[0]}, whose parent is "
                        f"{first_m['parent']}) — the stream's baseline "
                        "was vacuumed. Re-delivering the table from an "
                        "empty baseline would duplicate rows; restart "
                        "the stream with a fresh checkpoint and a "
                        "surviving startingVersion"
                    )
                prev_files = set()
                bootstrap_v = window[0]
        parts: list[InputPartition] = []
        for v in window:
            m = _manifest(self.root, v)
            files = set(m["files"])
            if m.get("mode") == "append" or v == bootstrap_v:
                # manifest order is deterministic; sort for stable
                # partition identity across replays
                for rel in sorted(files - prev_files):
                    parts.append(_FilePartition(f"{self.root}/{rel}"))
            elif m.get("mode") in ("optimize", "purge", "alter"):
                # maintenance commits change NO rows (Delta's
                # dataChange=false): optimize/purge rewrite layout
                # (their new files carry rows the stream already
                # delivered, or will deliver from the original append
                # files, which stay on disk until vacuum) and alter
                # changes schema metadata only — always skip, never
                # raise
                pass
            elif self.skip_change_commits:
                pass  # Delta's skipChangeCommits: emit nothing
            else:
                raise ValueError(
                    f"snapshot_stream: version {v} is "
                    f"{m.get('mode')!r}, not append — its changes "
                    "are rewrites, not new rows. Set "
                    "skipChangeCommits=true to skip such commits, "
                    "or consume row-level changes via "
                    "SnapshotTable.read_changes"
                )
            prev_files = files
        self._tail_cache = (hi, prev_files)
        return parts

    # --------------------------------------------------------- reads
    def read(self, partition: _FilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        want = to_arrow_schema(
            StructType.fromJson(json.loads(self.schema_json))
        )
        tbl = pq.read_table(partition.path)
        n = tbl.num_rows
        cols = []
        for field in want:
            if field.name in tbl.column_names:
                col = tbl.column(field.name)
                if col.type != field.type:
                    col = col.cast(field.type)
            else:
                # append-mode schema evolution: a file written before
                # the column existed null-fills (read_since parity)
                col = pa.nulls(n, type=field.type)
            cols.append(col)
        aligned = pa.table(cols, schema=want)
        yield from aligned.to_batches()


class SnapshotStreamDataSource(DataSource):
    """readStream format over a SnapshotTable root (see module doc).

    Usage::

        spark.dataSource.register(SnapshotStreamDataSource)
        df = (spark.readStream.format("snapshot_stream")
              .option("path", "/data/tables/orders")
              .load())
    """

    @classmethod
    def name(cls) -> str:
        return "snapshot_stream"

    def schema(self) -> StructType:
        root = _local_root(self.options["path"])
        head = _visible_head(root, _versions(root))
        if head is None:
            raise ValueError(f"no commits yet at {root}")
        return StructType.fromJson(
            json.loads(_manifest(root, head)["schema"])
        )

    def streamReader(self, schema: StructType) -> SnapshotStreamReader:
        return SnapshotStreamReader(schema, dict(self.options))


def register_snapshot_stream(spark) -> None:
    """Idempotently register the format with a session."""
    spark.dataSource.register(SnapshotStreamDataSource)


def snapshot_stream(spark, path: str, **options):
    """Convenience: a streaming DataFrame over the table at ``path``."""
    register_snapshot_stream(spark)
    reader = spark.readStream.format("snapshot_stream").option(
        "path", path
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
