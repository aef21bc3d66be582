"""Versioned parquet tables: atomic commits, time travel, rollback,
version diff, vacuum — a minimal manifest-log table format.

The reference rebuilds every table with `CREATE OR REPLACE` and keeps
no history (ETL:23-136); Snowflake supplies time travel underneath.
On a plain object store / HDFS, Spark's `.mode("overwrite")` gives
neither atomicity (readers can see a half-deleted directory) nor
history.  This module adds both with the public design every modern
table format shares (the manifest-log idea of Delta/Iceberg/Hudi,
re-implemented from first principles — no external libraries):

- A table is a directory: immutable data files under ``data/``, plus a
  commit log of JSON manifests under ``_manifests/``.  A manifest is
  the COMPLETE file listing of one table version (plus the schema and
  provenance); readers never list the data directory.
- A commit writes data files FIRST (invisible until referenced), then
  publishes the manifest via an atomic filesystem rename.  Rename
  fails if the destination version exists — optimistic concurrency;
  the writer re-reads the log and retries under the next version.
- Readers pin a manifest: ``read()`` is the latest version,
  ``read(version=k)`` is time travel.  Both return a DataFrame over an
  explicit file list with the manifest's schema — concurrent commits
  and vacuums of OTHER versions never disturb a running scan.
- ``restore(k)`` commits the old file LIST as the new head — O(1)
  rollback, no data rewrite.  ``diff(a, b, keys)`` composes
  `operators.table_diff` for row-level CDC between versions.
- ``vacuum(keep_last=n)`` drops manifests older than the kept window,
  then deletes data files no kept version references — the only
  destructive operation, and the reason data files must be immutable.
- ``delete_where`` / ``merge_into(strategy="merge-on-read")`` commit
  DELETION VECTORS (positional delete sidecars over
  ``_metadata.row_index``) instead of rewriting files; every read path
  applies them, ``purge_deletes``/``compact`` materializes them away.

Scale shape (100 TB): commits touch only the new files plus one
manifest write — append cost is O(new data), independent of table
size.  Reads open exactly the manifested files (no directory listing
on the hot path, the object-store killer).  All filesystem access goes
through the Hadoop FileSystem API (file:/, hdfs://, s3a:// alike) —
the same route as `operators.compaction`; note rename-based publishing
is atomic on HDFS/local while S3 needs a coordinating catalog, the
same caveat every manifest-log format documents publicly.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = ["SnapshotTable", "SnapshotInfo", "ConcurrentTransactionError"]


class ConcurrentTransactionError(RuntimeError):
    """A commit found the table head occupied by another transaction's
    PENDING (staged, not yet decided) version.  Pending versions block
    further commits on the same table — the coarse per-table lock that
    makes multi-table transactions serializable (sources/catalog.py).
    Retry after the transaction commits, or force-abort an abandoned
    one with ``Catalog.abort(txn_id)``."""

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"
# deletion-vector store schema: one row per deleted (file, position)
_DV_SCHEMA = "__dv_file string, __dv_pos long"

# -------------------------------------------- manifest log encoding
#
# Round 10: manifests are DELTA-ENCODED with periodic checkpoints —
# the fix for the O(table-files)-JSON-per-commit scaling wall. A
# stored manifest is either
#
#   FULL ("checkpoint"): the complete file listing, exactly the
#     self-contained form earlier rounds wrote, except the clustering
#     stamp no longer repeats the file list — files are ordered
#     clustered-first and the stamp stores only ``n_clustered`` (one
#     copy of every path per manifest, the r9 two-list consistency
#     hazard gone);
#   DELTA ("delta": true): only ``adds``/``removes`` against the
#     parent plus the verbatim small fields (schema, n_rows, dvs,
#     batch stamps). The clustering stamp, when present, stores the
#     spec plus ``adds_clustered`` — membership of carried files is
#     derived from the parent.
#
# ``_manifest()`` resolves either form to the SAME in-memory dict the
# rest of this module (and every test) always consumed, walking raw
# parents back to the nearest full manifest (bounded by the
# checkpoint interval) and caching every resolved version. Writers
# keep building complete manifests; ``_publish_manifest`` delta-
# encodes at the single choke point, falling back to a full write
# whenever the delta would not round-trip bit-equivalently (order
# drift, arbitrary clustering membership, delta bigger than full —
# e.g. overwrite/compact/restore) or the parent chain has reached the
# interval. Commit metadata cost is therefore O(new files) on the
# append/merge/delete paths that dominate a live table, with one
# O(table) checkpoint every ``checkpoint_interval`` commits — the
# Delta-log checkpoint / Iceberg manifest-list idea, re-derived.
# ``vacuum`` rewrites any kept delta whose parent it is about to drop
# into its resolved full form first, so resolution chains never dangle.
_CHECKPOINT_INTERVAL = 16

# tag names: filesystem-safe, no path escapes
_TAG_NAME = re.compile(r"^[A-Za-z0-9][A-Za-z0-9_.\-]*$")

# Round 11: checkpoint FILE LISTINGS go columnar past this size — the
# last O(table-files) metadata cost. A full (checkpoint) manifest with
# >= this many files stores its listing as a parquet SIDECAR
# (`files-v<NNN>-<uuid>.parquet`, single `path` column, row order
# authoritative: clustered-first then decode order) and the JSON keeps
# only `files_ext` (the sidecar name) + `n_files`. Parquet dictionary
# + snappy make a million-file listing ~tens of MB instead of GBs of
# JSON, pyarrow decodes it vectorized instead of `json.loads`, and
# the sidecar is plain parquet Spark itself can read (the Delta-style
# "checkpoint as data" property). Deltas stay JSON — they are small by
# construction. Below the threshold the inline JSON form is unchanged,
# so small tables (and the existing on-disk format) stay byte-stable.
_FILES_EXT_MIN = 512

# Round 12: checkpoint listings go from one flat sidecar to a MANIFEST
# TREE past this size (Iceberg's manifest-list -> manifest shape). The
# listing is sliced into contiguous GROUP sidecars of
# ``_FILES_TREE_GROUP`` paths (slice order preserves the authoritative
# clustered-first + decode order), and the top-level `files-v*.parquet`
# becomes a MANIFEST LIST: one row per group (name + size) plus one row
# per (group, column) carrying min/max bounds aggregated from the
# newest zone-map stats sidecar — per-file bounds are immutable facts
# about immutable files, so stamps from ANY stats version are valid;
# files the stats don't cover just leave their group unprunable
# (full_cover=false). A range read then resolves O(groups-touched)
# metadata: read the list (one row per ~2048 files), drop the groups
# whose stamped bound excludes the predicate, decode only the
# survivors, and replay the delta chain's adds/removes on top — the
# cold single-partition read stops decoding the full O(table-files)
# listing. Flat sidecars remain the stored form between
# _FILES_EXT_MIN and _FILES_TREE_MIN (small tables stay byte-stable),
# and every old on-disk form still decodes.
_FILES_TREE_MIN = 65536
_FILES_TREE_GROUP = 2048


def _tree_group_name(list_name: str, i: int) -> str:
    """Group sidecar names derive from the list name so vacuum's
    referenced-or-orphan logic needs no parquet read: group i of
    `files-v*-<uuid>.parquet` is `files-v*-<uuid>-g<i>.parquet`."""
    return f"{list_name[: -len('.parquet')]}-g{i:05d}.parquet"


def _tree_list_bytes(
    groups: list[tuple[str, int]],
    stamps: dict[tuple[int, str], dict],
) -> bytes:
    """Serialize the manifest list: one base row per group (column
    NULL) in ord order + one stamp row per (group, column)."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    cols = {
        "ord": [], "group": [], "n_files": [], "column": [],
        "kind": [], "min_num": [], "max_num": [], "min_str": [],
        "max_str": [], "n_cov": [],
    }

    def _row(ord_, group, n_files, column, kind, mn, mx, ms, xs, nc):
        cols["ord"].append(ord_)
        cols["group"].append(group)
        cols["n_files"].append(n_files)
        cols["column"].append(column)
        cols["kind"].append(kind)
        cols["min_num"].append(mn)
        cols["max_num"].append(mx)
        cols["min_str"].append(ms)
        cols["max_str"].append(xs)
        cols["n_cov"].append(nc)

    for i, (name, n) in enumerate(groups):
        _row(i, name, n, None, None, None, None, None, None, None)
    for (gi, col), st in sorted(stamps.items()):
        name, n = groups[gi]
        _row(
            gi, name, n, col, st["kind"], st.get("min_num"),
            st.get("max_num"), st.get("min_str"), st.get("max_str"),
            st["n_cov"],
        )
    table = pa.table(
        {
            "ord": pa.array(cols["ord"], type=pa.int64()),
            "group": pa.array(cols["group"], type=pa.string()),
            "n_files": pa.array(cols["n_files"], type=pa.int64()),
            "column": pa.array(cols["column"], type=pa.string()),
            "kind": pa.array(cols["kind"], type=pa.string()),
            "min_num": pa.array(cols["min_num"], type=pa.float64()),
            "max_num": pa.array(cols["max_num"], type=pa.float64()),
            "min_str": pa.array(cols["min_str"], type=pa.string()),
            "max_str": pa.array(cols["max_str"], type=pa.string()),
            "n_cov": pa.array(cols["n_cov"], type=pa.int64()),
        }
    )
    sink = pa.BufferOutputStream()
    papq.write_table(table, sink, compression="snappy")
    return sink.getvalue().to_pybytes()


def _tree_decode_list(data: bytes):
    """Manifest-list bytes -> (ordered [(group, n_files)],
    {(ord, column): stamp dict})."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    t = papq.read_table(pa.BufferReader(bytes(data)))
    rows = t.to_pylist()
    base = sorted(
        ((r["ord"], r["group"], r["n_files"]) for r in rows
         if r["column"] is None)
    )
    stamps = {
        (r["ord"], r["column"]): r for r in rows if r["column"] is not None
    }
    return [(g, n) for _, g, n in base], stamps


def _tree_inline(raw: dict, read_parquet_bytes) -> dict:
    """Resolve a TREE-checkpointed manifest to the inline ``files``
    form: read the manifest list, then every group, concatenated in
    ord order. ``read_parquet_bytes(name) -> bytes`` abstracts the
    filesystem (JVM-backed and plain-local callers share this)."""
    groups, _ = _tree_decode_list(read_parquet_bytes(raw["files_ext"]))
    files: list[str] = []
    for name, _n in groups:
        files.extend(_files_from_parquet_bytes(read_parquet_bytes(name)))
    if len(files) != raw["n_files"]:
        raise ValueError(
            f"manifest tree corrupt: groups held {len(files)} paths, "
            f"manifest says {raw['n_files']}"
        )
    out = {
        k: v
        for k, v in raw.items()
        if k not in ("files_ext", "n_files", "files_tree")
    }
    out["files"] = files
    return out


def _files_to_parquet_bytes(files: list[str]) -> bytes:
    """Serialize a file listing as a single-column parquet blob
    (row order preserved — it encodes clustered-first + decode
    order)."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    sink = pa.BufferOutputStream()
    papq.write_table(
        pa.table({"path": pa.array(files, type=pa.string())}),
        sink,
        compression="snappy",
    )
    return sink.getvalue().to_pybytes()


def _paths_column(table) -> list[str]:
    # to_numpy(...).tolist() materializes python strings ~5x faster
    # than Table.to_pylist() — measured 0.07 s vs 0.36 s at 500k rows
    return (
        table.column("path").to_numpy(zero_copy_only=False).tolist()
    )


def _files_from_parquet_bytes(data: bytes) -> list[str]:
    import pyarrow as pa
    import pyarrow.parquet as papq

    return _paths_column(papq.read_table(pa.BufferReader(bytes(data))))


def _inline_files_local(raw: dict, manifest_dir: str) -> dict:
    """Plain-Python (local filesystem) form of sidecar inlining — the
    streaming source's path (it reads manifests without a JVM)."""
    ext = raw.get("files_ext")
    if not ext:
        return raw

    def _rd(name: str) -> bytes:
        with open(os.path.join(manifest_dir, name), "rb") as f:
            return f.read()

    if raw.get("files_tree"):
        return _tree_inline(raw, _rd)
    import pyarrow.parquet as papq

    files = _paths_column(papq.read_table(os.path.join(manifest_dir, ext)))
    out = {
        k: v for k, v in raw.items() if k not in ("files_ext", "n_files")
    }
    out["files"] = files
    return out


def _spec_of(cl: dict) -> dict:
    return {
        k: v
        for k, v in cl.items()
        if k not in ("files", "n_clustered", "adds_clustered")
    }


def _spec_matches(prev: dict, spec: dict) -> bool:
    """Clustering-spec equality with defaults NORMALIZED: a stamp
    without a ``curve`` field is Morton (every pre-Hilbert stamp), so
    a morton request on an old table is 'same spec' while either
    direction of a morton<->hilbert change is a spec change (a subset
    check would miss hilbert->morton)."""

    def norm(s: dict) -> dict:
        return {
            k: v
            for k, v in _spec_of(s).items()
            if not (k == "curve" and v == "morton")
        }

    return norm(prev) == norm(spec)


def _full_storage_form(m: dict) -> dict:
    """The self-contained stored form of a resolved manifest: files
    ordered clustered-first, the clustering stamp carrying only the
    spec + ``n_clustered`` (single copy of every path)."""
    out = {k: v for k, v in m.items() if k != "_depth"}
    cl = m.get("clustering")
    if cl is not None:
        clset = set(cl["files"])
        first = [f for f in m["files"] if f in clset]
        rest = [f for f in m["files"] if f not in clset]
        out["files"] = first + rest
        out["clustering"] = {**_spec_of(cl), "n_clustered": len(first)}
    return out


def _decode_manifest(raw: dict, pm: dict | None) -> dict:
    """Resolve a stored manifest (full or delta) into the in-memory
    form every consumer uses: complete ``files`` listing, clustering
    stamp with an explicit live file list, ``_depth`` = distance to
    the nearest full manifest (the encoder's checkpoint trigger).
    ``pm`` is the RESOLVED parent (required iff ``raw`` is a delta).
    Pure function — the streaming source resolves through it too,
    with plain-Python I/O."""
    if not raw.get("delta"):
        out = dict(raw)
        cl = out.get("clustering")
        if cl is not None and "n_clustered" in cl:
            out["clustering"] = {
                **_spec_of(cl),
                "files": out["files"][: cl["n_clustered"]],
            }
        out["_depth"] = 0
        return out
    if pm is None:
        raise ValueError(
            "delta manifest needs its parent to resolve "
            f"(v{raw.get('version')} -> parent v{raw.get('parent')})"
        )
    removes = set(raw.get("removes", ()))
    adds = list(raw.get("adds", ()))
    files = [f for f in pm["files"] if f not in removes] + adds
    out = {
        k: v
        for k, v in raw.items()
        if k not in ("delta", "adds", "removes", "clustering",
                     "add_stamps")
    }
    out["files"] = files
    if "clustering" in raw:
        cl = raw["clustering"]
        if cl is not None:
            spec = _spec_of(cl)
            pcl = pm.get("clustering")
            base = (
                set(pcl["files"])
                if pcl is not None and _spec_of(pcl) == spec
                else set()
            )
            clset = base.intersection(files)
            if cl.get("adds_clustered"):
                clset.update(adds)
            out["clustering"] = {
                **spec,
                "files": [f for f in files if f in clset],
            }
    out["_depth"] = pm.get("_depth", 0) + 1
    return out


def _encode_manifest(
    m: dict,
    pm: dict | None,
    interval: int,
    delta_hint: tuple[list[str], list[str]] | None = None,
) -> dict:
    """Delta-encode resolved manifest ``m`` against its resolved
    parent, or return the full storage form when a delta would not
    round-trip (see the log-encoding note above) or the checkpoint
    interval is due. Correct by construction: every branch that
    cannot be proven to decode back to ``m`` falls back to full.

    ``delta_hint`` = (adds, removes) from a commit path that KNOWS its
    diff (append built the listing as parent-files + new-files one
    line earlier): skips the O(table-files) set diff below — the last
    O(table) driver CPU on the hot ingest path — after O(1) guards
    (no clustering on either side, counts consistent). A hinted
    encode is decode-identical to the diffed one (test-pinned)."""
    full = _full_storage_form(m)
    if pm is None or pm.get("_depth", 0) + 1 >= interval:
        return full
    if (
        delta_hint is not None
        and m.get("clustering") is None
        and pm.get("clustering") is None
        and len(m["files"])
        == len(pm["files"]) - len(delta_hint[1]) + len(delta_hint[0])
        and len(delta_hint[0]) + len(delta_hint[1])
        < max(1, len(m["files"]))
    ):
        raw = {
            k: v
            for k, v in m.items()
            if k not in ("files", "clustering", "_depth")
        }
        raw["delta"] = True
        raw["adds"] = list(delta_hint[0])
        raw["removes"] = list(delta_hint[1])
        return raw
    pfiles = pm["files"]
    mset = set(m["files"])
    pset = set(pfiles)
    removes = [f for f in pfiles if f not in mset]
    adds = [f for f in m["files"] if f not in pset]
    kept = [f for f in pfiles if f in mset]
    # the decoder reconstructs kept-in-parent-order + adds; any other
    # ordering (restore to an old listing) stores full
    if m["files"] != kept + adds:
        return full
    # a delta that names most of the table (overwrite, compact, full
    # re-cluster) is no smaller than the checkpoint it displaces
    if len(removes) + len(adds) >= max(1, len(m["files"])):
        return full
    raw = {
        k: v
        for k, v in m.items()
        if k not in ("files", "clustering", "_depth")
    }
    raw["delta"] = True
    raw["adds"] = adds
    raw["removes"] = removes
    cl = m.get("clustering")
    pcl = pm.get("clustering")
    if cl is None:
        if pcl is not None:
            raw["clustering"] = None  # stamp explicitly dropped
    else:
        spec = _spec_of(cl)
        base = (
            {f for f in pcl["files"] if f in mset}
            if pcl is not None and _spec_of(pcl) == spec
            else set()
        )
        live_cl = {f for f in cl["files"] if f in mset}
        if live_cl == base:
            raw["clustering"] = {**spec, "adds_clustered": False}
        elif live_cl == base.union(adds):
            raw["clustering"] = {**spec, "adds_clustered": True}
        else:
            return full  # arbitrary membership: not delta-expressible
    return raw


@dataclass(frozen=True)
class SnapshotInfo:
    version: int
    mode: str
    n_files: int
    n_rows: int


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


class SnapshotTable:
    """A versioned parquet table rooted at ``path`` (see module doc)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        checkpoint_interval: int = _CHECKPOINT_INTERVAL,
        files_ext_threshold: int = _FILES_EXT_MIN,
        files_tree_threshold: int = _FILES_TREE_MIN,
        files_tree_group: int = _FILES_TREE_GROUP,
    ):
        if checkpoint_interval < 1:
            raise ValueError("checkpoint_interval must be >= 1")
        if files_tree_group < 1:
            raise ValueError("files_tree_group must be >= 1")
        self.spark = spark
        self.path = path.rstrip("/")
        # max delta-chain length before a commit stores the full
        # listing again (1 = every manifest full, the pre-r10 format)
        self._checkpoint_interval = checkpoint_interval
        # full manifests with >= this many files store their listing
        # as a parquet sidecar (see the _FILES_EXT_MIN note above)
        self._files_ext_min = files_ext_threshold
        # ... and past this size the sidecar becomes a manifest TREE
        # of `files_tree_group`-path group sidecars under a stamped
        # manifest list (see the _FILES_TREE_MIN note above)
        self._files_tree_min = files_tree_threshold
        self._files_tree_group = files_tree_group
        self._fs, self._root, self._jvm = _fs(spark, self.path)
        self._fs.mkdirs(self._p(f"{self.path}/{_MANIFEST_DIR}"))
        self._fs.mkdirs(self._p(f"{self.path}/{_DATA_DIR}"))

    # ---------------------------------------------------- fs helpers
    def _p(self, s: str):
        return self._jvm.org.apache.hadoop.fs.Path(s)

    def _manifest_path(self, version: int):
        return self._p(f"{self.path}/{_MANIFEST_DIR}/v{version:08d}.json")

    def _local_of(self, hpath) -> str | None:
        """The plain-local path of ``hpath`` when this table lives on
        the local filesystem, else None.  Metadata reads/writes through
        py4j stream shims pay a per-byte bridge cost that dwarfs the
        I/O itself at checkpoint sizes; on file: roots plain Python
        I/O is strictly faster and semantically identical."""
        if not self._qualified_root().startswith("file:"):
            return None
        s = hpath if isinstance(hpath, str) else hpath.toString()
        if s.startswith("file:"):
            s = s[5:]
            while s.startswith("//"):
                s = s[1:]
        return s if s.startswith("/") else None

    def _read_json(self, hpath) -> dict:
        lp = self._local_of(hpath)
        if lp is not None:
            with open(lp, "r", encoding="utf-8") as f:
                return json.load(f)
        # py4j can't fill a Python-side byte buffer in place; let the
        # JVM drain the stream (commons-io ships with Spark).
        stream = self._fs.open(hpath)
        try:
            text = self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()
        return json.loads(text)

    def _read_bytes(self, hpath) -> bytes:
        lp = self._local_of(hpath)
        if lp is not None:
            with open(lp, "rb") as f:
                return f.read()
        stream = self._fs.open(hpath)
        try:
            data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(
                stream
            )
        finally:
            stream.close()
        return bytes(data)

    def _write_bytes(self, data: bytes, dest) -> None:
        lp = self._local_of(dest)
        if lp is not None:
            # exclusive create matches fs.create(dest, False); sidecar
            # names are uuid-unique so collisions are impossible, but
            # keep the same contract
            with open(lp, "xb") as f:
                f.write(data)
            return
        out = self._fs.create(dest, False)
        try:
            out.write(data)
        finally:
            out.close()

    # ------------------------------- columnar checkpoint sidecars
    def _externalize_files(self, raw: dict, version: int):
        """Move a big full manifest's inline ``files`` listing into a
        parquet sidecar — flat past ``_files_ext_min``, a manifest
        TREE past ``_files_tree_min`` (see the _FILES_TREE_MIN note).
        Returns the JSON form (referencing the sidecar(s) by name)
        plus the list of sidecar hadoop Paths so a lost commit race
        can clean them up; returns ``(raw, [])`` unchanged for deltas
        and small listings."""
        files = raw.get("files")
        if (
            raw.get("delta")
            or files is None
            or len(files) < self._files_ext_min
        ):
            return raw, []
        # uuid suffix: two racing committers of the same version must
        # not collide on the sidecar name (the JSON references the
        # winner's by name; the loser deletes its own)
        name = f"files-v{version:08d}-{uuid.uuid4().hex}.parquet"
        out = {k: v for k, v in raw.items() if k != "files"}
        out["files_ext"] = name
        out["n_files"] = len(files)
        if len(files) < self._files_tree_min:
            side = self._p(f"{self.path}/{_MANIFEST_DIR}/{name}")
            self._write_bytes(_files_to_parquet_bytes(files), side)
            return out, [side]
        g = self._files_tree_group
        slices = [files[i:i + g] for i in range(0, len(files), g)]
        sides = []
        groups = []
        targets = []
        for i, sl in enumerate(slices):
            gname = _tree_group_name(name, i)
            gp = self._p(f"{self.path}/{_MANIFEST_DIR}/{gname}")
            sides.append(gp)
            groups.append((gname, len(sl)))
            targets.append((gp, sl))
        # group sidecars are independent files: on a local root write
        # them through a small thread pool (pyarrow encode and file
        # I/O both release the GIL) — at 500k files / ~250 groups the
        # serial create-per-group otherwise dominates checkpoint
        # publish. Non-local roots stay serial: _write_bytes there
        # rides a py4j stream per call, and interleaving those buys
        # little while adding connection churn. Any write error
        # propagates (futures re-raise), and a failed publish's
        # orphans are swept by vacuum like every crashed writer's.
        if len(targets) > 4 and self._local_of(targets[0][0]) is not None:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=8) as pool:
                list(
                    pool.map(
                        lambda t: self._write_bytes(
                            _files_to_parquet_bytes(t[1]), t[0]
                        ),
                        targets,
                    )
                )
        else:
            for gp, sl in targets:
                self._write_bytes(_files_to_parquet_bytes(sl), gp)
        stamps = self._group_stamps(slices)
        lp = self._p(f"{self.path}/{_MANIFEST_DIR}/{name}")
        self._write_bytes(_tree_list_bytes(groups, stamps), lp)
        sides.append(lp)
        out["files_tree"] = True
        return out, sides

    def _group_stamps(
        self, slices: list[list[str]]
    ) -> dict[tuple[int, str], dict]:
        """Per-(group, column) min/max bounds for the manifest list,
        aggregated from the newest zone-map stats sidecar. Any stats
        snapshot is valid: per-file bounds describe immutable file
        content, and a file the snapshot doesn't cover just leaves
        its group with n_cov < n_files (never prunable). Returns {}
        when no stats exist — the tree still stores and decodes, it
        just can't prune."""
        # newest stats sidecar of ANY version: per-file bounds are
        # immutable facts about immutable files, so a stats row is
        # valid whichever version computed it — prefer newest for
        # coverage of recent files; uncovered files just leave their
        # group with n_cov < n_files (kept, never mispruned)
        cands: list[int] = []
        mdir = self._p(f"{self.path}/{_MANIFEST_DIR}")
        for st in self._fs.listStatus(mdir):
            n = st.getPath().getName()
            if n.startswith("stats-v") and n.endswith(".parquet"):
                cands.append(int(n[7:15]))
        # a build_stats crash between the parquet dir and its meta
        # json would otherwise poison every later tree publish — skip
        # any stats version whose meta sidecar is missing and fall
        # back to the next-newest complete one (or unstamped: the
        # tree still stores and decodes, it just can't prune)
        best = next(
            (
                v
                for v in sorted(cands, reverse=True)
                if self._fs.exists(self._zm_meta_path(v))
            ),
            None,
        )
        if best is None:
            return {}
        meta = self._read_json(self._zm_meta_path(best))
        kinds = meta.get("kinds", {})
        tbl = self._read_sidecar_table(self._zm_path(best))
        if tbl is None or tbl.num_rows == 0:
            return {}
        pdf = tbl.to_pandas()
        gid = {f: i for i, sl in enumerate(slices) for f in sl}
        pdf["__g"] = pdf["file"].map(gid)
        pdf = pdf[pdf["__g"].notna()]
        if pdf.empty:
            return {}
        bounded = pdf["min_num"].notna() | pdf["min_str"].notna()
        all_null = (
            pdf["null_count"].notna()
            & (pdf["null_count"] == pdf["n_rows"])
        )
        pdf = pdf[bounded | all_null]
        stamps: dict[tuple[int, str], dict] = {}
        for (g, col), sub in pdf.groupby(["__g", "column"]):
            kind = kinds.get(col)
            if kind is None:
                continue
            st = {"kind": kind, "n_cov": int(len(sub))}
            b = sub[sub["min_num"].notna() | sub["min_str"].notna()]
            if len(b):
                if kind == "num":
                    st["min_num"] = float(b["min_num"].min())
                    st["max_num"] = float(b["max_num"].max())
                else:
                    st["min_str"] = str(b["min_str"].min())
                    st["max_str"] = str(b["max_str"].max())
            # no bounded row: every covered file is all-NULL — the
            # NULL bounds mean "prunable for any range" iff n_cov
            # covers the whole group (checked at probe time)
            stamps[(int(g), col)] = st
        return stamps

    def _read_sidecar_table(self, hpath):
        """A parquet sidecar (single file OR Spark-written directory
        of part files) as one pyarrow Table, via _read_bytes so the
        plain-local fast path applies."""
        import pyarrow as pa
        import pyarrow.parquet as papq

        if not self._fs.exists(hpath):
            return None
        if self._fs.getFileStatus(hpath).isDirectory():
            parts = []
            for st in self._fs.listStatus(hpath):
                n = st.getPath().getName()
                if n.endswith(".parquet") and not n.startswith("_"):
                    parts.append(
                        papq.read_table(
                            pa.BufferReader(self._read_bytes(st.getPath()))
                        )
                    )
            if not parts:
                return None
            return pa.concat_tables(parts)
        return papq.read_table(pa.BufferReader(self._read_bytes(hpath)))

    def _inline_files(self, raw: dict) -> dict:
        """Resolve a stored manifest's ``files_ext`` parquet sidecar
        (flat or tree) back to the inline ``files`` form every decoder
        consumes."""
        ext = raw.get("files_ext")
        if not ext:
            return raw
        if raw.get("files_tree"):
            return _tree_inline(
                raw,
                lambda n: self._read_bytes(
                    self._p(f"{self.path}/{_MANIFEST_DIR}/{n}")
                ),
            )
        data = self._read_bytes(
            self._p(f"{self.path}/{_MANIFEST_DIR}/{ext}")
        )
        out = {
            k: v
            for k, v in raw.items()
            if k not in ("files_ext", "n_files")
        }
        out["files"] = _files_from_parquet_bytes(data)
        return out

    def _raw_manifest(self, version: int) -> dict:
        """One version's STORED JSON without inlining the file listing
        — O(1) metadata (schema, dvs, n_rows, delta fields) for
        consumers that never touch ``files``. Cached like _manifest;
        vacuum's swaps clear both caches."""
        cache = getattr(self, "_raw_manifest_cache", None)
        if cache is None:
            cache = {}
            self._raw_manifest_cache = cache
        p = self._manifest_path(version)
        # existence stays UNCACHED (like _manifest): a transaction
        # abort deletes staged manifests, and a vacuumed version must
        # error, not serve a stale raw
        if not self._fs.exists(p):
            cache.pop(version, None)
            raise ValueError(
                f"version {version} does not exist (have {self.versions()})"
            )
        hit = cache.get(version)
        if hit is not None:
            return hit
        raw = self._read_json(p)
        cache[version] = raw
        return raw

    def _files_pruned(
        self, version: int, col: str, kind: str, lo_e, hi_e
    ) -> tuple[list[str], int] | None:
        """GROUP-PRUNED candidate listing for a range probe on
        ``col``: walk the raw delta chain to its full checkpoint, and
        if that checkpoint is a manifest TREE, decode only the groups
        whose stamped [min, max] can intersect [lo_e, hi_e] (encoded
        bounds; either side None = unbounded), then replay the chain's
        removes/adds. Conservative group-keeping mirrors the per-file
        zone-map rules: no stamp row, stamp kind mismatch, or
        n_cov < n_files keeps the group; a stamp with NULL bounds and
        full cover is an all-NULL group — prunable for any range.
        Delta ADDS prune through their commit-time footer stamps
        (``add_stamps``, written by _publish_manifest when zone maps
        are live) so the probe stays O(groups-touched + chain) over
        long delta chains; unstamped adds stay candidates.
        Returns (ordered candidate files, total table file count at
        ``version``) — order is exactly _decode_manifest's
        (kept-parent-order + adds) restricted to surviving groups —
        or None when the chain doesn't bottom out in a stamped tree
        (caller falls back to the full listing). Metadata cost:
        O(chain + groups-touched), never O(table-files)."""
        chain: list[dict] = []
        v = version
        while True:
            raw = self._raw_manifest(v)
            if not raw.get("delta"):
                base = raw
                break
            chain.append(raw)
            v = raw["parent"]
        if not base.get("files_tree"):
            return None
        groups, stamps = _tree_decode_list(
            self._read_bytes(
                self._p(
                    f"{self.path}/{_MANIFEST_DIR}/{base['files_ext']}"
                )
            )
        )
        files: list[str] = []
        for i, (gname, g_n) in enumerate(groups):
            st = stamps.get((i, col))
            if (
                st is not None
                and st["kind"] == kind
                and st["n_cov"] == g_n
            ):
                mn = st["min_num"] if kind == "num" else st["min_str"]
                mx = st["max_num"] if kind == "num" else st["max_str"]
                if mn is None:
                    continue  # all-NULL group: no range matches NULL
                if (hi_e is not None and mn > hi_e) or (
                    lo_e is not None and mx < lo_e
                ):
                    continue
            files.extend(
                _files_from_parquet_bytes(
                    self._read_bytes(
                        self._p(f"{self.path}/{_MANIFEST_DIR}/{gname}")
                    )
                )
            )
        n_total = base["n_files"]
        for raw in reversed(chain):
            removes = set(raw.get("removes", ()))
            adds = list(raw.get("adds", ()))
            ast = raw.get("add_stamps") or {}
            if removes:
                files = [f for f in files if f not in removes]
            # adds carrying a commit-time footer stamp for this column
            # prune like group stamps (disjoint bounds, or all-NULL —
            # a range never matches NULL); unstamped or kind-mismatched
            # adds stay candidates, the pre-r13 behavior
            for f in adds:
                st = (ast.get(f) or {}).get(col)
                if st is not None and st[0] == kind:
                    mn, mx, nulls, nr = st[1], st[2], st[3], st[4]
                    if mn is None:
                        if nulls is not None and nulls == nr:
                            continue
                    elif (hi_e is not None and mn > hi_e) or (
                        lo_e is not None and mx < lo_e
                    ):
                        continue
                files.append(f)
            n_total += len(adds) - len(removes)
        return files, n_total

    def _restamp_tree(self, version: int) -> bool:
        """Recompute the manifest-list stamps of ``version``'s chain
        BASE checkpoint from the newest stats — build_stats calls this
        so fresh stats prune the EXISTING head, not just future
        checkpoints. Group sidecars are untouched (membership is
        immutable); only the list parquet is rewritten, via
        temp + delete + rename under the same single-maintainer
        assumption as vacuum's _swap_stored (build_stats is a
        maintenance verb). Returns False when the chain's base is not
        a tree."""
        v = version
        while True:
            raw = self._raw_manifest(v)
            if not raw.get("delta"):
                break
            v = raw["parent"]
        if not raw.get("files_tree"):
            return False
        mdir = f"{self.path}/{_MANIFEST_DIR}"
        lp = self._p(f"{mdir}/{raw['files_ext']}")
        groups, _old = _tree_decode_list(self._read_bytes(lp))
        slices = [
            _files_from_parquet_bytes(
                self._read_bytes(self._p(f"{mdir}/{g}"))
            )
            for g, _n in groups
        ]
        stamps = self._group_stamps(slices)
        tmp = self._p(f"{mdir}/.tmp-{uuid.uuid4().hex}.parquet")
        self._write_bytes(_tree_list_bytes(groups, stamps), tmp)
        self._fs.delete(lp, False)
        if not self._fs.rename(tmp, lp):
            raise RuntimeError(
                f"manifest-list restamp failed for v{v} at {self.path}"
            )
        return True

    def _write_json_atomic(self, obj: dict, dest) -> bool:
        """Write to a hidden temp file, claim the destination with an
        exclusive-create lock, publish via rename.  Returns False (and
        cleans up) if ``dest`` is already committed or claimed — the
        loser of a concurrent commit race.

        Why the lock: rename-if-absent is NOT portable arbitration.
        HDFS rename fails when the destination exists, but POSIX (and
        therefore Hadoop's RawLocalFileSystem) rename silently
        REPLACES it — two racing committers would both "win" the same
        version and one manifest would vanish, its data files later
        vacuumed.  ``fs.create(lock, overwrite=False)`` fails if the
        lock exists on every Hadoop filesystem (atomically on HDFS),
        so the zero-length ``v<NNN>.json.lock`` file is the single
        arbiter; the rename that follows can then never collide.
        Locks persist for the life of their manifest (vacuum drops
        them together) so a late zombie writer can never re-claim a
        published version.  A writer that crashes between claim and
        publish burns its version number — ``_locked_versions`` lets
        the retry loops skip over the burn."""
        if "committed_at" not in obj:
            # wall-clock commit stamp: powers read_asof()/AS OF time
            # travel and age-based retention; versions remain the
            # authoritative total order (clocks can skew — read_asof
            # resolves by stamp but always returns a real version)
            obj = {**obj, "committed_at": time.time()}
        tmp = self._p(
            f"{self.path}/{_MANIFEST_DIR}/.tmp-{uuid.uuid4().hex}.json"
        )
        out = self._fs.create(tmp, False)
        try:
            out.write(json.dumps(obj, sort_keys=True).encode("utf-8"))
        finally:
            out.close()
        if self._fs.exists(dest):
            self._fs.delete(tmp, False)
            return False
        lock = self._p(dest.toString() + ".lock")
        try:
            self._fs.create(lock, False).close()
        except Exception:
            self._fs.delete(tmp, False)
            if self._fs.exists(lock) or self._fs.exists(dest):
                return False  # lost the claim race
            raise  # a real IO failure, not a race — surface it
        ok = self._fs.rename(tmp, dest)
        if not ok:
            self._fs.delete(tmp, False)
        return ok

    def _locked_versions(self) -> list[int]:
        """Versions claimed by a lock file (published or burned by a
        crashed writer) — retry loops allocate PAST these so a burned
        claim can never wedge the log."""
        mdir = self._p(f"{self.path}/{_MANIFEST_DIR}")
        out = []
        for st in self._fs.listStatus(mdir):
            name = st.getPath().getName()
            if name.startswith("v") and name.endswith(".json.lock"):
                out.append(int(name[1:-10]))
        return out

    def _next_version(self, parent: int | None) -> int:
        """The next version number to claim given the published head:
        one past the max of the head and every outstanding lock.

        Every commit path funnels through here with the head it is
        about to build on, so this is also the single choke point for
        the transaction head-lock: building on a PENDING staged
        version would fork history if the transaction later aborted
        (the abort deletes the staged manifest), so a pending head
        refuses all other commits until its transaction decides."""
        if parent is not None:
            try:
                m = self._manifest(parent)
            except ValueError as e:
                # the head vanished between listing and read — a
                # transaction abort swept it mid-flight; the caller's
                # state is stale, not broken
                raise ConcurrentTransactionError(
                    f"head v{parent} of {self.path} disappeared "
                    "(transaction abort in flight) — retry the commit"
                ) from e
            t = m.get("txn")
            if t is not None and not self._txn_is_committed(t):
                raise ConcurrentTransactionError(
                    f"head v{parent} of {self.path} is staged by "
                    f"pending transaction {t['id']} — retry after it "
                    "commits, or Catalog.abort() it"
                )
        return max([parent or 0, *self._locked_versions()]) + 1

    # ----------------------------------- transaction visibility
    def _txn_decision(self, t: dict) -> dict | None:
        """The decision record of transaction ``t`` ({'id', 'log'}),
        or None while pending.  Committed records are immutable and
        load-bearing (they are what makes the staged versions
        visible), so they are cached; pending/aborted answers are
        re-checked every call (the record may land or change to a
        sweep at any moment)."""
        cache = getattr(self, "_txn_rec", None)
        if cache is None:
            cache = {}
            self._txn_rec = cache
        key = (t["log"], t["id"])
        if key in cache:
            return cache[key]
        p = self._p(f"{t['log']}/{t['id']}.json")
        if not self._fs.exists(p):
            return None
        try:
            rec = self._read_json(p)
        except Exception:
            return None  # half-written record: not decided yet
        if rec.get("status") == "committed":
            cache[key] = rec
        return rec

    def _txn_is_committed(self, t: dict) -> bool:
        rec = self._txn_decision(t)
        return rec is not None and rec.get("status") == "committed"

    def _effective_commit_ts(self, m: dict) -> float | None:
        """The wall-clock instant ``m`` became VISIBLE: its own
        publish stamp for plain commits, the transaction DECISION
        stamp for txn-staged ones.  Using the per-table manifest stamp
        for a txn commit would re-open exactly the torn window the
        transaction closed — two tables of one transaction publish
        their manifests milliseconds apart, and an AS OF read between
        those stamps would pin the new state of one and the old state
        of the other.  The decision stamp is shared by every table of
        the transaction, so time travel can never straddle it.
        (Monotone within a table: the decision lands after the staged
        manifest's publish, and the pending head blocks any later
        commit until then.)"""
        t = m.get("txn")
        if t is not None:
            rec = self._txn_decision(t)
            if rec is not None and rec.get("decided_at") is not None:
                return rec["decided_at"]
        return m.get("committed_at")

    def _visible(self, m: dict) -> bool:
        """A manifest is readable state unless it is staged by a
        transaction that has not committed (pending manifests only
        ever exist at the head — see _next_version — and an abort
        deletes them, so invisibility is always transient)."""
        t = m.get("txn")
        return t is None or self._txn_is_committed(t)

    def latest_visible_version(self) -> int | None:
        """The newest version a reader may see: the head, stepping
        past any pending transaction-staged manifests (at most one in
        practice — pending heads block further commits)."""
        v = self.latest_version()
        while v is not None:
            try:
                # raw manifest: visibility needs only the txn tag +
                # parent pointer — head resolution must not force an
                # O(table-files) listing decode
                m = self._raw_manifest(v)
            except ValueError:
                # swept by a racing abort — re-list from scratch
                return self.latest_visible_version()
            if self._visible(m):
                return v
            v = m.get("parent")
        return None

    def _read_version(self, version: int | str | None) -> int | None:
        """Resolve a read's version argument: None pins the latest
        VISIBLE head; a STRING names a tag (so read/clone/restore and
        every path through here accept `version="release-1"`); an
        explicit version must itself be visible — reading another
        transaction's staged files would leak an uncommitted state."""
        if version is None:
            return self.latest_visible_version()
        if isinstance(version, str):
            version = self.tag_version(version)
        # raw manifest: the visibility check reads only the txn tag —
        # a cold pruned read must not inline the full listing here
        m = self._raw_manifest(version)
        if not self._visible(m):
            raise ValueError(
                f"version {version} of {self.path} is staged by "
                f"pending transaction {m['txn']['id']} and not "
                "readable until it commits"
            )
        return version

    # ----------------------------------------------- named tags
    #
    # Iceberg-style TAGS: immutable named pins of a version
    # (`release-2025-08`, `pre-backfill`, ...). Pure metadata — one
    # tiny JSON per tag next to the manifests; reads resolve the name
    # to its version and take the normal pinned-read path, and VACUUM
    # keeps tagged versions (plus, via its kept-delta rewrite, their
    # resolution ancestry) however old — the retention contract that
    # makes a tag more than a comment. Branch-style MUTABLE refs are
    # deliberately absent: the manifest log is linear (every head
    # resolution, read_since window and the streaming source assume
    # it), and zero-copy `clone` already gives divergent lines as
    # first-class tables.

    def _tag_path(self, name: str):
        return self._p(f"{self.path}/{_MANIFEST_DIR}/tag-{name}.json")

    def create_tag(self, name: str, version: int | None = None) -> int:
        """Pin ``version`` (default: the latest visible head) under an
        immutable name.  Exclusive-create: a name can never be
        silently repointed — delete_tag + create_tag is the explicit
        spelling of a move.  Returns the pinned version."""
        if not _TAG_NAME.match(name):
            raise ValueError(
                f"bad tag name {name!r} (letters, digits, '_', '-', "
                "'.'; must start alphanumeric)"
            )
        v = self._read_version(version)
        if v is None:
            raise ValueError(f"no commits yet at {self.path}")
        rec = {"name": name, "version": v, "created_at": time.time()}
        dest = self._tag_path(name)
        # temp + exclusive-create lock + rename (_write_json_atomic):
        # a tag file is either absent or COMPLETE — a crash mid-write
        # can never leave a truncated tag-<name>.json that poisons
        # tags()/tag_version and blocks recreation. The lock doubles
        # as race arbitration, so a name can't be claimed twice.
        if not self._write_json_atomic(rec, dest):
            pinned = (
                f" (pinned v{self._read_json(dest)['version']})"
                if self._fs.exists(dest)
                else ""
            )
            raise ValueError(
                f"tag {name!r} already exists{pinned} — tags are "
                "immutable; delete_tag first to move it"
            )
        return v

    def tags(self) -> dict[str, int]:
        """All tags as {name: version}."""
        out: dict[str, int] = {}
        mdir = self._p(f"{self.path}/{_MANIFEST_DIR}")
        for st in self._fs.listStatus(mdir):
            n = st.getPath().getName()
            if n.startswith("tag-") and n.endswith(".json"):
                rec = self._read_json(st.getPath())
                out[rec["name"]] = rec["version"]
        return out

    def tag_version(self, name: str) -> int:
        p = self._tag_path(name)
        if not _TAG_NAME.match(name) or not self._fs.exists(p):
            raise ValueError(
                f"no tag {name!r} (have {sorted(self.tags())})"
            )
        return self._read_json(p)["version"]

    def delete_tag(self, name: str) -> None:
        p = self._tag_path(name)
        lock = self._p(p.toString() + ".lock")
        if not _TAG_NAME.match(name) or not self._fs.exists(p):
            # a writer that crashed between the lock create and the
            # rename leaves a lock with no tag file — without this
            # reclaim path the name would be permanently unusable
            # (create_tag sees the lock and refuses forever). delete
            # is the explicit user action, so dropping the orphan here
            # is safe: a live concurrent creator whose rename lands
            # after our delete just publishes its tag normally.
            if _TAG_NAME.match(name) and self._fs.exists(lock):
                self._fs.delete(lock, False)
                return
            raise ValueError(
                f"no tag {name!r} (have {sorted(self.tags())})"
            )
        self._fs.delete(p, False)
        # drop the creation lock too, or the name could never be
        # reclaimed (manifest locks persist by design; tag locks live
        # exactly as long as their tag)
        if self._fs.exists(lock):
            self._fs.delete(lock, False)

    def read_tag(self, name: str) -> DataFrame:
        return self.read(self.tag_version(name))

    def quick_count(self, version: int | str | None = None) -> int:
        """METADATA-ONLY row count — `SELECT count(*)` answered from
        the manifest without opening a single data file (the Delta
        metadata-query idea).  Exact by construction: every commit
        path maintains ``n_rows`` transactionally with the listing
        (appends add, merges net, deletion vectors subtract at
        delete_where time), and the equality vs a full scan is
        test-pinned across the whole verb set.  Accepts a version or
        a tag name like every read."""
        v = self._read_version(version)
        if v is None:
            raise ValueError(f"no commits yet at {self.path}")
        return int(self._manifest(v)["n_rows"])

    # ------------------------------------------------------- the log
    def versions(self) -> list[int]:
        mdir = self._p(f"{self.path}/{_MANIFEST_DIR}")
        out = []
        for st in self._fs.listStatus(mdir):
            name = st.getPath().getName()
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        # manifests are immutable once published, so the RESOLVED dict
        # is cached per version (the py4j stream read + JSON parse is
        # the dominant cost of log scans — e.g. the per-batch stamp
        # check in write_batch/IVM reads EVERY manifest); vacuum drops
        # the entries it deletes. The existence check stays uncached so
        # a vacuumed version still errors correctly. Delta-encoded
        # manifests resolve by walking raw parents back to the nearest
        # cached or full ancestor (bounded by the checkpoint interval)
        # and decoding forward — every version on the walk lands in
        # the cache, so a log scan stays O(manifests) total.
        cache = getattr(self, "_manifest_cache", None)
        if cache is None:
            cache = {}
            self._manifest_cache = cache
        p = self._manifest_path(version)
        if not self._fs.exists(p):
            cache.pop(version, None)
            raise ValueError(
                f"version {version} does not exist (have {self.versions()})"
            )
        if version in cache:
            return cache[version]
        chain = []
        v: int | None = version
        pm: dict | None = None
        while True:
            raw = self._inline_files(self._read_json(self._manifest_path(v)))
            chain.append(raw)
            if not raw.get("delta"):
                break
            v = raw["parent"]
            if v in cache:
                pm = cache[v]
                break
            if not self._fs.exists(self._manifest_path(v)):
                raise ValueError(
                    f"version {version} cannot resolve: delta parent "
                    f"v{v} is missing (vacuumed without checkpoint "
                    "rewrite?)"
                )
        for raw in reversed(chain):
            pm = _decode_manifest(raw, pm)
            cache[raw["version"]] = pm
        return cache[version]

    def _rewrite_manifest_full(self, version: int) -> None:
        """Replace ``version``'s stored manifest with its resolved
        full form — vacuum's chain-preservation step. Content is
        decode-equivalent (committed_at preserved; the publish lock
        stays), but the swap itself is delete+rename, not atomic: only
        vacuum calls this, under vacuum's existing single-maintainer
        assumption for the versions it touches."""
        resolved = self._manifest(version)
        self._swap_stored(_full_storage_form(resolved), version)

    def _swap_stored(self, raw: dict, version: int) -> None:
        """Replace ``version``'s STORED manifest with ``raw`` via
        write-temp + delete + rename (not atomic — callers run under
        vacuum's single-maintainer assumption), then drop the resolve
        cache (content or depth may have shifted)."""
        raw, _ = self._externalize_files(raw, version)
        dest = self._manifest_path(version)
        tmp = self._p(
            f"{self.path}/{_MANIFEST_DIR}/.ckpt-{uuid.uuid4().hex}.json"
        )
        out = self._fs.create(tmp, False)
        try:
            out.write(json.dumps(raw, sort_keys=True).encode("utf-8"))
        finally:
            out.close()
        self._fs.delete(dest, False)
        if not self._fs.rename(tmp, dest):
            raise RuntimeError(
                f"vacuum manifest rewrite failed for v{version}"
            )
        self._manifest_cache = {}
        self._raw_manifest_cache = {}

    def _publish_manifest(
        self,
        manifest: dict,
        version: int,
        delta_hint: tuple[list[str], list[str]] | None = None,
    ) -> bool:
        """Encode (delta against the resolved parent where possible)
        and atomically publish — the single choke point between the
        complete in-memory manifests every commit path builds and the
        checkpointed log format on disk."""
        parent = manifest.get("parent")
        pm = self._manifest(parent) if parent is not None else None
        raw = _encode_manifest(
            manifest, pm, self._checkpoint_interval, delta_hint
        )
        if raw.get("delta") and raw.get("adds"):
            # per-(file, column) min/max stamps for the commit's adds,
            # from the parquet footers the writer just produced — so
            # manifest-tree range probes can prune DELTA adds too
            # instead of keeping every add as an unconditional
            # candidate (pruning would otherwise decay over long
            # delta chains between checkpoints). Gated on zone maps
            # being live for the table; absent stats = no stamps =
            # adds stay conservative candidates, exactly as before.
            stamps = self._add_stamps(raw)
            if stamps:
                raw["add_stamps"] = stamps
        raw, sides = self._externalize_files(raw, version)
        ok = self._write_json_atomic(raw, self._manifest_path(version))
        if not ok:
            # lost the commit race — this writer's sidecars (flat, or
            # the tree's groups + list) are orphaned
            for side in sides:
                self._fs.delete(side, False)
        return ok

    def _stamp_carry(self, parent: int | None, own: dict) -> dict:
        """Monotone HIGH-WATER batch stamps (max_batch_id /
        ivm_max_batch_id), carried through EVERY commit path.

        Replay protection used to scan the whole manifest log for a
        version stamped with the incoming batch id — which meant
        vacuum retention bounded the replay window: drop an old
        stamped manifest and a replay of that batch would apply twice.
        Since foreachBatch ids are monotonically increasing per
        checkpoint, the high-water mark in the HEAD manifest is a
        complete O(1) replay check that survives any vacuum — every
        commit (stream or not) carries the mark forward.  Corollary:
        one snapshot table pairs with ONE writing stream/checkpoint;
        pointing a fresh checkpoint (ids restarting at 0) at an
        existing table skips everything by design — use a new table
        or clear the stamps deliberately."""
        pm = self._manifest(parent) if parent is not None else {}
        out = {}
        for own_key, max_key in (
            ("batch_id", "max_batch_id"),
            ("ivm_batch_id", "ivm_max_batch_id"),
        ):
            cands = [
                v
                for v in (
                    pm.get(max_key),
                    pm.get(own_key),
                    own.get(own_key),
                )
                if v is not None
            ]
            if cands:
                out[max_key] = max(cands)
        # the CLUSTERING stamp (spec + which files are clustered, see
        # optimize()) also rides every commit path: paths that rewrite
        # or drop files don't edit the stamp — readers intersect its
        # file list with the live listing, so a rewritten file simply
        # falls out of the clustered set. write() drops the stamp on
        # mode="overwrite" (the layout is gone with the files) and
        # optimize()/write_clustered/write_zordered replace it.
        if pm.get("clustering") is not None:
            out["clustering"] = pm["clustering"]
        # DROPPED-COLUMN tombstones ride every commit too: without
        # Iceberg-style field ids, re-adding a dropped name would
        # resurrect stale values from files that still physically
        # carry the column — the tombstone makes add_column/appends
        # refuse the name loudly instead (write() clears the set on
        # mode="overwrite", where every old file is replaced).
        if pm.get("dropped_columns"):
            out["dropped_columns"] = pm["dropped_columns"]
        return out

    def _guard_dropped(self, pm: dict, df) -> None:
        """Refuse an append whose frame carries a DROPPED column name:
        old files still hold the column physically, so unioning the
        name back into the schema would resurrect stale values (no
        field-id column mapping in this format — see drop_column).
        ``df`` is a DataFrame or a plain list of column names."""
        cols = df if isinstance(df, list) else df.columns
        tomb = [
            c for c in cols
            if c in (pm.get("dropped_columns") or [])
        ]
        if tomb:
            raise ValueError(
                f"columns {tomb} were dropped from this table; "
                "appending them would resurrect stale values from old "
                "files — use fresh names (see drop_column)"
            )

    def _batch_seen(
        self,
        batch_id: int,
        own_key: str = "batch_id",
        max_key: str = "max_batch_id",
    ) -> bool:
        """Replay check: O(1) against the head's high-water mark when
        present, falling back to the full-log scan for histories whose
        commits predate stamp carrying."""
        # visible head: a pending transaction's stamps must not gate
        # replays — if the txn aborts, its manifest (and stamps)
        # vanish, and a batch skipped against them would be lost
        head = self.latest_visible_version()
        if head is None:
            return False
        hm = self._manifest(head)
        mx = hm.get(max_key, hm.get(own_key))
        if mx is not None:
            return batch_id <= mx
        return any(
            m.get(own_key) == batch_id
            for m in (self._manifest(v) for v in self.versions())
            if self._visible(m)
        )

    def history(self) -> list[SnapshotInfo]:
        """Committed history — versions staged by a still-pending
        transaction are not yet table state and are omitted."""
        return [
            SnapshotInfo(
                m["version"], m["mode"], len(m["files"]), m["n_rows"]
            )
            for m in (self._manifest(v) for v in self.versions())
            if self._visible(m)
        ]

    # ------------------------------------------------------- commits
    def _qualified_root(self) -> str:
        """The fully-qualified table root (scheme + authority), the
        exact prefix every path returned by listFiles/listStatus on
        this filesystem shares — cached once."""
        q = getattr(self, "_qroot", None)
        if q is None:
            q = self._fs.makeQualified(self._root).toString().rstrip("/")
            self._qroot = q
        return q

    def _rel(self, full: str) -> str:
        """Table-root-relative form of a qualified path.  Prefix-strip
        against the qualified root — NOT a substring search for
        '/data/', which would mis-split any table rooted under a path
        that itself contains a /data/ segment (e.g. /data/warehouse/t)."""
        qroot = self._qualified_root()
        if not full.startswith(qroot + "/"):
            raise ValueError(f"path {full!r} is not under table root {qroot!r}")
        return full[len(qroot) + 1 :]

    def _list_commit_files(self, commit_dir: str) -> list[str]:
        out = []
        it = self._fs.listFiles(self._p(commit_dir), True)
        while it.hasNext():
            st = it.next()
            name = st.getPath().getName()
            if name.startswith("_") or name.startswith("."):
                continue
            # store paths relative to the table root
            out.append(self._rel(st.getPath().toString()))
        return sorted(out)

    def _write_counted(self, df: DataFrame, commit_dir: str) -> int:
        """Write ``df``'s data files and return the row count observed
        DURING the write (pyspark Observation) — previously every
        commit path re-read the just-written parquet to count rows, an
        extra Spark job per commit that taxed exactly the surfaces
        whose cost story is commit latency (IVM folds, streaming
        micro-batches, merge chains) and was pure overhead at any
        scale: the rows had just flowed through this very stage."""
        from pyspark.sql import Observation

        obs = Observation()
        df.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
            "error"
        ).parquet(commit_dir)
        return int(obs.get["n"])

    def write(
        self,
        df: DataFrame,
        mode: str = "append",
        manifest_extra: dict | None = None,
        _clustering: dict | None = None,
    ) -> int:
        """Commit ``df`` as a new version; returns the version number.

        'append' adds the new files to the parent version's listing;
        'overwrite' starts a fresh listing (the old files stay on disk
        for time travel until vacuumed). ``manifest_extra`` entries
        land verbatim in the manifest (reserved keys protected) —
        see merge_into."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append/overwrite, got {mode!r}")
        new_files, n_new = self._stage_files(df)
        return self._commit_new_files(
            new_files, n_new, df.schema, mode, manifest_extra, _clustering
        )

    def _stage_files(self, df: DataFrame) -> tuple[list[str], int]:
        """Write ``df``'s data files into a fresh commit directory —
        invisible until a manifest references them — returning the
        root-relative paths and the observed row count.  The slow half
        of a commit, split out so multi-table transactions can stage
        every table's data BEFORE entering the short metadata-only
        publish window (sources/catalog.py)."""
        commit_dir = f"{self.path}/{_DATA_DIR}/c-{uuid.uuid4().hex}"
        n_new = self._write_counted(df, commit_dir)
        return self._list_commit_files(commit_dir), n_new

    def _commit_new_files(
        self,
        new_files: list[str],
        n_new: int,
        schema: StructType,
        mode: str,
        manifest_extra: dict | None = None,
        _clustering: dict | None = None,
    ) -> int:
        """Publish already-staged files as a new version — write()'s
        manifest-construction/retry loop over the output of
        _stage_files."""
        while True:
            parent = self.latest_version()
            version = self._next_version(parent)
            schema_json = schema.json()
            dv_carry = None
            if parent is None:
                base_files: list[str] = []
                base_rows = 0
            else:
                pm = self._manifest(parent)
                base_files = pm["files"] if mode == "append" else []
                base_rows = pm["n_rows"] if mode == "append" else 0
                if mode == "append":
                    # schema evolution: the manifest records the UNION
                    # of the parent schema and the appended frame's —
                    # added columns read as NULL from older files (an
                    # explicit read schema fills missing parquet
                    # columns), and columns the new frame omits are
                    # kept, never silently dropped. Same-name type
                    # conflicts fail the commit loudly.
                    self._guard_dropped(pm, schema.fieldNames())
                    schema_json = _unify_schemas(
                        StructType.fromJson(json.loads(pm["schema"])),
                        schema,
                    ).json()
                    # appends keep every parent file, so the parent's
                    # deletion vectors carry — dropping them would
                    # resurrect deleted rows
                    dv_carry = pm.get("dvs")
            manifest = {
                **{
                    k: v
                    for k, v in (manifest_extra or {}).items()
                    if k
                    not in (
                        "version", "parent", "mode", "schema", "files",
                        "n_rows", "max_batch_id", "ivm_max_batch_id",
                        "dvs", "clustering", "dropped_columns",
                    )
                },
                **self._stamp_carry(parent, manifest_extra or {}),
                "version": version,
                "parent": parent,
                "mode": mode,
                "schema": schema_json,
                "files": base_files + new_files,
                "n_rows": base_rows + n_new,
                **({"dvs": dv_carry} if dv_carry else {}),
            }
            if mode == "overwrite" and _clustering is None:
                # a full overwrite replaces every file; the parent's
                # clustered layout is gone with them
                manifest.pop("clustering", None)
            if mode == "overwrite":
                # every old file is replaced, so dropped-name
                # resurrection is impossible: clear the tombstones
                manifest.pop("dropped_columns", None)
            if _clustering is not None:
                # this commit's files ARE clustered (write_clustered /
                # write_zordered wrote them through the layout
                # shuffle). An append under the parent's own spec
                # extends the clustered set; a spec change or an
                # overwrite starts it over.
                prev = manifest.get("clustering")
                same = prev is not None and _spec_matches(
                    prev, _clustering
                )
                base_set = set(base_files)
                base_cl = (
                    [f for f in prev["files"] if f in base_set]
                    if (same and mode == "append")
                    else []
                )
                manifest["clustering"] = {
                    **_clustering,
                    "files": base_cl + new_files,
                }
            # append built the listing as parent-files + new-files, so
            # its diff is known without the O(table) set comparison
            # (the hint is guarded + ignored when clustering is live)
            hint = (
                (new_files, [])
                if mode == "append" and parent is not None
                else None
            )
            if self._publish_manifest(manifest, version, hint):
                return version
            # lost the race: re-read the log and retry on a new version

    def write_batch(
        self, df: DataFrame, batch_id: int, mode: str = "append"
    ) -> int | None:
        """Exactly-once commit for streaming `foreachBatch` sinks: the
        manifest records ``batch_id``, and a batch id that any live
        manifest already carries is skipped (returns None) — so a
        replayed micro-batch after a checkpoint recovery cannot land
        its rows twice.  The data files a skipped replay may have
        written before the manifest check are unreferenced and
        reclaimed by ``vacuum``."""
        if self._batch_seen(batch_id):
            return None
        commit_dir = f"{self.path}/{_DATA_DIR}/c-{uuid.uuid4().hex}"
        n_new = self._write_counted(df, commit_dir)
        new_files = self._list_commit_files(commit_dir)
        while True:
            parent = self.latest_version()
            if self._batch_seen(batch_id):
                return None  # a racing replay landed it first
            version = self._next_version(parent)
            schema_json = df.schema.json()
            dv_carry = None
            if parent is None:
                base_files: list[str] = []
                base_rows = 0
            else:
                pm = self._manifest(parent)
                base_files = pm["files"] if mode == "append" else []
                base_rows = pm["n_rows"] if mode == "append" else 0
                if mode == "append":
                    self._guard_dropped(pm, df)
                    schema_json = _unify_schemas(
                        StructType.fromJson(json.loads(pm["schema"])),
                        df.schema,
                    ).json()
                    dv_carry = pm.get("dvs")
            manifest = {
                **self._stamp_carry(parent, {"batch_id": batch_id}),
                "version": version,
                "parent": parent,
                "mode": mode,
                "batch_id": batch_id,
                "schema": schema_json,
                "files": base_files + new_files,
                "n_rows": base_rows + n_new,
                **({"dvs": dv_carry} if dv_carry else {}),
            }
            if self._publish_manifest(manifest, version):
                return version

    def restore(self, version: int) -> int:
        """Roll the head back to ``version``'s exact file listing as a
        NEW commit — O(1), no data movement, history preserved."""
        # _read_version refuses a pending transaction-staged version:
        # restoring TO uncommitted state would republish files whose
        # transaction may abort (and sweep them) underneath the restore
        m = self._manifest(self._read_version(version))
        while True:
            parent = self.latest_version()
            new_version = self._next_version(parent)
            manifest = {
                **self._stamp_carry(parent, {}),
                "version": new_version,
                "parent": parent,
                "mode": f"restore({version})",
                "schema": m["schema"],
                "files": m["files"],
                "n_rows": m["n_rows"],
                # the restored version's deletion vectors are part of
                # its row set — carry them or deleted rows resurrect
                **({"dvs": m["dvs"]} if m.get("dvs") else {}),
            }
            if self._publish_manifest(manifest, new_version):
                return new_version

    def add_column(self, name: str, dtype: str) -> int:
        """METADATA-ONLY schema evolution: commit a new version whose
        schema carries one more (nullable) column; no data file is
        touched — reads null-fill it for every existing file (the
        explicit read schema in _read_files), exactly as append-time
        evolution already does. ``dtype`` is a DDL type string
        ('bigint', 'array<double>', ...).

        Re-adding a previously DROPPED name is refused: without
        field-id column mapping, old files still physically carry the
        column, and reads would resurrect its stale values."""
        if self.latest_version() is None:
            raise ValueError("no commits yet — write() creates the table")
        new_field = StructType.fromDDL(f"{name} {dtype}").fields[0]
        while True:
            base = self.latest_version()
            target = self._next_version(base)
            m = self._manifest(base)
            schema = StructType.fromJson(json.loads(m["schema"]))
            if name in schema.fieldNames():
                raise ValueError(f"column {name!r} already exists")
            if name in (m.get("dropped_columns") or []):
                raise ValueError(
                    f"column {name!r} was previously dropped; old data "
                    "files still carry it physically, so re-adding the "
                    "name would resurrect stale values — use a fresh "
                    "name (no field-id column mapping in this format)"
                )
            manifest = {
                **self._stamp_carry(base, {}),
                "version": target,
                "parent": base,
                "mode": "alter",
                "schema": StructType(
                    list(schema.fields) + [new_field]
                ).json(),
                "files": m["files"],
                "n_rows": m["n_rows"],
                **({"dvs": m["dvs"]} if m.get("dvs") else {}),
            }
            if self._publish_manifest(manifest, target):
                return target

    def drop_column(self, name: str) -> int:
        """METADATA-ONLY column drop: commit a new version whose schema
        omits ``name``; no data file is rewritten — the explicit read
        schema simply stops selecting the column (parquet column
        pruning, so dropped bytes are never even scanned). Time travel
        to pre-drop versions still sees it. The name lands in the
        carried ``dropped_columns`` tombstone set, which blocks
        re-adding it (see add_column) and appending frames that still
        carry it."""
        if self.latest_version() is None:
            raise ValueError("no commits yet — write() creates the table")
        while True:
            base = self.latest_version()
            target = self._next_version(base)
            m = self._manifest(base)
            schema = StructType.fromJson(json.loads(m["schema"]))
            if name not in schema.fieldNames():
                raise ValueError(f"no such column: {name!r}")
            if len(schema.fields) == 1:
                raise ValueError("cannot drop the only column")
            dropped = sorted(
                set(m.get("dropped_columns") or []) | {name}
            )
            manifest = {
                **self._stamp_carry(base, {}),
                "version": target,
                "parent": base,
                "mode": "alter",
                "schema": StructType(
                    [f for f in schema.fields if f.name != name]
                ).json(),
                "files": m["files"],
                "n_rows": m["n_rows"],
                "dropped_columns": dropped,
                **({"dvs": m["dvs"]} if m.get("dvs") else {}),
            }
            if self._publish_manifest(manifest, target):
                return target

    def write_audited(
        self, df: DataFrame, suite, mode: str = "append"
    ) -> int:
        """Write-audit-publish: stage ``df``'s data files, run the
        expectations ``suite`` (operators.expectations) against the
        STAGED files, and only publish the manifest if every
        expectation passes — readers can never observe a version that
        failed its checks.  On failure raises ValueError listing the
        failed expectations; the staged files stay unreferenced (and
        invisible) until ``vacuum`` reclaims them.

        The audit reads the staged parquet back, so it validates what
        was actually written (encoding included), not the input plan —
        one extra scan of the NEW data only, never the table."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append/overwrite, got {mode!r}")
        commit_dir = f"{self.path}/{_DATA_DIR}/c-{uuid.uuid4().hex}"
        df.write.mode("error").parquet(commit_dir)
        staged = self.spark.read.schema(df.schema).parquet(commit_dir)
        ok, rows = suite.check(staged)
        if not ok:
            failed = [
                f"{r['metric']}={r['value']}" for r in rows if not r["passed"]
            ]
            raise ValueError(
                "write_audited: staged data failed expectations "
                f"[{', '.join(failed)}]; files left unpublished at "
                f"{commit_dir} (vacuum reclaims them)"
            )
        new_files = self._list_commit_files(commit_dir)
        n_new = staged.count()
        while True:
            parent = self.latest_version()
            version = self._next_version(parent)
            schema_json = df.schema.json()
            dv_carry = None
            if parent is None:
                base_files: list[str] = []
                base_rows = 0
            else:
                pm = self._manifest(parent)
                base_files = pm["files"] if mode == "append" else []
                base_rows = pm["n_rows"] if mode == "append" else 0
                if mode == "append":
                    # same union-by-name evolution as write(): a frame
                    # omitting a parent column must not drop it from
                    # the manifest schema (the audited path previously
                    # recorded df.schema verbatim — silent column loss)
                    self._guard_dropped(pm, df)
                    schema_json = _unify_schemas(
                        StructType.fromJson(json.loads(pm["schema"])),
                        df.schema,
                    ).json()
                    dv_carry = pm.get("dvs")
            manifest = {
                **self._stamp_carry(parent, {}),
                "version": version,
                "parent": parent,
                "mode": f"audited-{mode}",
                "schema": schema_json,
                "files": base_files + new_files,
                "n_rows": base_rows + n_new,
                **({"dvs": dv_carry} if dv_carry else {}),
            }
            if self._publish_manifest(manifest, version):
                return version

    def clone(
        self, dest_path: str, version: int | None = None
    ) -> "SnapshotTable":
        """ZERO-COPY CLONE — the reference host engine's headline
        feature (`CREATE TABLE ... CLONE src [AT (...)]`): a new,
        fully independent table whose first commit is the source's
        pinned ``version`` (head by default), created WITHOUT copying
        data. Data files (and deletion-vector stores) are HARD LINKS,
        so the clone costs O(files) metadata syscalls and zero bytes;
        writes never modify files in place (the format's immutability
        contract), so source and clone diverge safely from the shared
        inodes, and either side's ``vacuum`` only unlinks its own
        names — the other side's links keep the inodes alive. Filing
        systems that refuse the link (cross-device) fall back to a
        real copy per file, reported in the clone manifest's
        ``clone_copied`` count so zero-copy claims stay honest.

        Local filesystems only (like the streaming source's manifest
        I/O); an object-store port would instead reference the source
        manifest's keys directly. The clone's manifest is version 1,
        parent None, mode 'clone', stamped ``cloned_from`` — batch /
        IVM exactly-once stamps carry so a refresh pipeline pointed at
        the clone does not re-fold batches the source already
        absorbed. Zone-map / Bloom sidecars do NOT carry (they are
        derived state; rebuild with build_stats / build_file_index)."""
        import os
        import shutil

        v = self._read_version(version)
        if v is None:
            raise ValueError(f"no commits yet at {self.path}")
        m = self._manifest(v)

        def _local(p: str) -> str:
            if p.startswith("file://"):
                p = p[len("file://"):]
            elif p.startswith("file:"):
                p = p[len("file:"):]
            if "://" in p:
                raise ValueError(
                    "clone links files with plain-Python I/O and "
                    f"supports local table roots only, got {p!r}"
                )
            return p.rstrip("/")

        src_root = _local(self.path)
        dst_root = _local(dest_path)
        dest = SnapshotTable(self.spark, dest_path)
        if dest.latest_version() is not None:
            raise ValueError(
                f"clone destination {dest_path!r} already has commits"
            )
        rels = list(m["files"]) + list(
            (m.get("dvs") or {}).get("stores", [])
        )
        linked = copied = 0
        for rel in rels:
            s = os.path.join(src_root, rel)
            d = os.path.join(dst_root, rel)
            os.makedirs(os.path.dirname(d), exist_ok=True)
            try:
                os.link(s, d)
                linked += 1
            except OSError:
                shutil.copy2(s, d)
                copied += 1
        manifest = {
            **m,
            "version": 1,
            "parent": None,
            "mode": "clone",
            "cloned_from": f"{self.path}@v{v}",
            "clone_linked": linked,
            "clone_copied": copied,
            "committed_at": time.time(),
        }
        # parent None -> always stored as a full (checkpoint) manifest
        if not dest._publish_manifest(manifest, 1):
            raise RuntimeError(
                f"clone lost a commit race at {dest_path!r}"
            )
        return dest

    def write_shredded(
        self,
        df: DataFrame,
        json_col: str,
        paths: dict[str, tuple[str, str]],
        mode: str = "overwrite",
    ) -> int:
        """Commit ``df`` with its JSON document column SHREDDED
        (functions.semistructured.shred_json: hot scalar paths
        materialized as typed columns by one merged parse) and the
        shred map recorded in the manifest, so readers resolve path
        access to the pruned columns without out-of-band knowledge —
        see ``json_path``. The raw document column is kept (arrays /
        un-shredded paths still navigate it)."""
        from globalweather_etl_spark.functions.semistructured import (
            shred_json,
        )

        return self.write(
            shred_json(df, json_col, paths),
            mode=mode,
            manifest_extra={
                "shred": {
                    "col": json_col,
                    "paths": {n: p for n, (p, _t) in paths.items()},
                }
            },
        )

    def json_path(
        self, path: str, version: int | None = None
    ) -> Column:
        """Path access over this table's document column that RESOLVES
        to the manifest-recorded shred column when one covers ``path``
        (the read then never touches the raw document — column
        pruning does the rest) and falls back to raw json_get
        navigation otherwise. Use with ``read``::

            t.read().select(t.json_path("cust.key"))
        """
        from globalweather_etl_spark.functions.semistructured import (
            json_get,
        )

        v = self._read_version(version)
        if v is None:
            raise ValueError(f"no commits yet at {self.path}")
        shred = self._manifest(v).get("shred")
        if shred:
            for name, p in shred["paths"].items():
                if p == path:
                    return F.col(f"shred_{name}")
            return json_get(F.col(shred["col"]), path)
        raise ValueError(
            f"version {v} at {self.path} was not written with "
            "write_shredded (no document column recorded) — navigate "
            "explicitly with functions.semistructured.json_get"
        )

    # --------------------------------------------------------- reads
    def version_asof(self, ts: float) -> int:
        """The newest VISIBLE version whose effective commit instant
        is <= ``ts`` (unix seconds).  Transaction-staged versions
        resolve by their DECISION stamp — shared across every table of
        the transaction — so cross-table AS OF reads can never
        straddle a transaction (see _effective_commit_ts).  Raises if
        the table has no commit at or before ``ts``."""
        best = None
        for v in self.versions():
            m = self._manifest(v)
            if not self._visible(m):
                continue
            at = self._effective_commit_ts(m)
            if at is not None and at <= ts and (best is None or v > best):
                best = v
        if best is None:
            raise ValueError(
                f"no commit at or before ts={ts} at {self.path}"
            )
        return best

    def read_asof(self, ts: float) -> DataFrame:
        """Time travel by WALL CLOCK: the newest version whose
        effective commit instant is <= ``ts`` — the SQL `AS OF
        TIMESTAMP` form (see version_asof for transaction
        semantics)."""
        return self.read(self.version_asof(ts))

    def read(self, version: int | None = None) -> DataFrame:
        """DataFrame over the pinned manifest's exact file list (latest
        version by default), with the version's DELETION VECTORS
        applied (merge-on-read — see delete_where).  Empty tables read
        as an empty frame with the manifest schema."""
        version = self._read_version(version)
        if version is None:
            raise ValueError(f"no commits yet at {self.path}")
        m = self._manifest(version)
        return self._read_files(m["files"], m)

    # ------------------------------------------- merge-on-read reads
    def _rel_file_expr(self):
        """Manifest-relative path of the scanned file, as a Column —
        the executor-side twin of ``_rel``: percent-decode
        ``_metadata.file_path`` (Spark renders it URI-encoded, spaces
        -> %20) and strip the qualified table root.  Every deletion-
        vector producer AND consumer derives file identity through
        this one expression, so DV matching is self-consistent even if
        an exotic filesystem renders paths differently from the
        manifest; delete_where additionally cross-checks the derived
        ids against the manifest listing and fails loudly on drift."""
        qroot = self._qualified_root()
        # PERCENT-decode only: url_decode is form-decoding, so a
        # literal '+' in the table root or a file name would decode to
        # a space and the derived id would no longer match the
        # manifest rel (Hadoop Path.toString keeps '+' literal; the
        # URI encoding of _metadata.file_path never escapes '+'
        # either).  Protect '+' as %2B first so only %XX sequences
        # decode (advisor finding, r6).
        dec = F.url_decode(
            F.regexp_replace(
                F.col("_metadata.file_path"), r"\+", "%2B"
            )
        )
        return dec.substr(F.lit(len(qroot) + 2), F.lit(1 << 30))

    def _read_files(
        self, rels: list[str], m: dict, with_pos: bool = False
    ) -> DataFrame:
        """DataFrame over a subset of manifest ``m``'s data files with
        the manifest's deletion vectors applied — the single scan
        helper behind read()/read_where/read_range/read_box and the
        merge/delete paths.  Files the DV sidecar never touched scan
        PLAIN (no metadata columns, no join — the common case stays
        whole-stage-codegen); files with deletions scan with
        ``_metadata.row_index`` attached and anti-join the (file, pos)
        store.  ``with_pos=True`` keeps the ``__dv_file``/``__dv_pos``
        identity columns on every row (both branches) for callers that
        need row addresses (delete_where, merge-on-read merges)."""
        schema = StructType.fromJson(json.loads(m["schema"]))
        if not rels:
            df = self.spark.createDataFrame([], schema)
            if with_pos:
                df = df.select(
                    "*",
                    F.lit(None).cast("string").alias("__dv_file"),
                    F.lit(None).cast("long").alias("__dv_pos"),
                )
            return df
        dv = m.get("dvs") or {"stores": [], "files": []}
        dvd = set(dv["files"])
        clean = [r for r in rels if r not in dvd]
        hit = [r for r in rels if r in dvd]

        def _scan(subset, attach):
            df = self.spark.read.schema(schema).parquet(
                *[f"{self.path}/{r}" for r in subset]
            )
            if attach:
                df = df.select(
                    "*",
                    self._rel_file_expr().alias("__dv_file"),
                    F.col("_metadata.row_index").alias("__dv_pos"),
                )
            return df

        parts = []
        if clean:
            parts.append(_scan(clean, with_pos))
        if hit:
            store = self.spark.read.schema(_DV_SCHEMA).parquet(
                *[f"{self.path}/{s}" for s in dv["stores"]]
            )
            live = _scan(hit, True).join(
                store, ["__dv_file", "__dv_pos"], "left_anti"
            )
            if not with_pos:
                live = live.drop("__dv_file", "__dv_pos")
            parts.append(live)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read_since(
        self, since_version: int, version: int | None = None
    ) -> DataFrame:
        """Rows ADDED by commits after ``since_version`` up to
        ``version`` (head by default) — the incremental-consumer read
        (the table-changes idea every lakehouse exposes for streaming
        readers and IVM refreshers). Valid ONLY when every commit in
        the window is append-mode: appends never remove files, so the
        added rows are exactly the window's new files, read directly —
        O(new data), never a table scan or diff. Any overwrite, merge,
        or restore in the window raises loudly: those rewrite or drop
        rows, and a row-level answer needs ``diff(a, b, keys)``.

        Reads use the NEWER manifest's schema, so columns added by
        append-mode evolution inside the window null-fill for files
        that predate them. Compose with per-version batch stamps for
        exactly-once downstream folds (version numbers are the natural
        batch ids).

        Maintenance commits that change NO rows — ``optimize``,
        ``purge``, and ``alter`` (Delta's dataChange=false) — are
        transparent: the
        added rows are collected per APPEND commit (each commit's
        files minus its parent's), so an optimize that re-clusters an
        appended file mid-window neither duplicates its rows (the
        rewrite's output files are not append files) nor loses them
        (the original file stays on disk until vacuum — the same
        retention contract the streaming source documents)."""
        v = self._read_version(version)
        if v is None:
            raise ValueError(f"no commits yet at {self.path}")
        self._manifest(since_version)  # loud if unknown/vacuumed
        if v < since_version:
            raise ValueError(
                f"version {v} precedes since_version {since_version}"
            )
        # walk the PARENT CHAIN v -> since_version (the authoritative
        # lineage — version numbers can have gaps from abandoned
        # locks, and a vacuumed mid-window manifest must fail loudly
        # here, never silently drop an append's rows)
        chain: list[dict] = []
        cur = v
        while cur != since_version:
            mc = self._manifest(cur)  # loud if vacuumed
            if mc["parent"] is None or mc["parent"] < since_version:
                raise ValueError(
                    f"version {since_version} is not an ancestor of "
                    f"{v} at {self.path}"
                )
            chain.append(mc)
            cur = mc["parent"]
        new_files: list[str] = []
        prev_files: set[str] | None = None  # parent's listing
        for m_u in reversed(chain):
            mode = m_u["mode"]
            if mode == "append":
                seen = (
                    prev_files
                    if prev_files is not None
                    else set(self._manifest(m_u["parent"])["files"])
                )
                new_files.extend(
                    f for f in m_u["files"] if f not in seen
                )
            elif mode not in ("optimize", "purge", "alter"):
                raise ValueError(
                    f"version {m_u['version']} is {mode!r}, not "
                    "append: the window's added rows are not its new "
                    "files — use diff() for row-level CDC"
                )
            prev_files = set(m_u["files"])
        m = self._manifest(v)
        schema = StructType.fromJson(json.loads(m["schema"]))
        if not new_files:
            return self.spark.createDataFrame([], schema)
        paths = [f"{self.path}/{rel}" for rel in new_files]
        return self.spark.read.schema(schema).parquet(*paths)

    def read_changes(
        self,
        since_version: int,
        keys: list[str],
        version: int | None = None,
        op_col: str = "__op",
    ) -> DataFrame:
        """Op-tagged change feed between two versions: +1 rows for
        inserts and the new side of updates, -1 rows for deletes and
        the old side of updates — exactly the change stream
        `operators.ivm.IncrementalAggregate.apply_batch_cdc` folds, so
        an IVM view stays maintainable across MERGE/overwrite commits
        that `read_since` must refuse. Emitted columns are the keys
        plus the columns SHARED by both versions — a column added by
        evolution inside the window has no old side to retract.

        Cost is O(files the window actually touched), not O(table):
        data files are immutable, so a file carried from the old
        manifest to the new one UNCHANGED (present in both, deletion
        vectors touching it in neither) holds bit-identical live rows
        on both sides — and since merge keys are unique per side
        (table_diff's pinned contract), every key in such a file is
        classified 'unchanged' and can never reach the change feed.
        The row-diff therefore runs only over the files added,
        removed, or rewritten in the window plus any file a deletion
        vector touches in either version (conservative: a carried
        file whose DV grew has rows to retract). An overwrite commit
        carries nothing, so the diff naturally degrades to the full
        two-version row-diff exactly when it must (round-8 fix for
        the r7 'read_changes is O(table) per window' gap)."""
        from globalweather_etl_spark.operators.table_diff import (
            table_diff,
        )

        v = self._read_version(version)
        if v is None:
            raise ValueError(f"no commits yet at {self.path}")
        m_old = self._manifest(since_version)
        m_new = self._manifest(v)
        dv_rels = set(
            (m_old.get("dvs") or {}).get("files", [])
        ) | set((m_new.get("dvs") or {}).get("files", []))
        stable = (
            set(m_old["files"]) & set(m_new["files"])
        ) - dv_rels
        old_side = self._read_files(
            [f for f in m_old["files"] if f not in stable], m_old
        )
        new_side = self._read_files(
            [f for f in m_new["files"] if f not in stable], m_new
        )
        d = table_diff(old_side, new_side, keys)
        compare = [
            c[len("new_"):]
            for c in d.columns
            if c.startswith("new_")
        ]
        plus = d.filter(
            F.col("diff_status").isin("inserted", "updated")
        ).select(
            *keys,
            *[F.col(f"new_{c}").alias(c) for c in compare],
            F.lit(1).alias(op_col),
        )
        minus = d.filter(
            F.col("diff_status").isin("deleted", "updated")
        ).select(
            *keys,
            *[F.col(f"old_{c}").alias(c) for c in compare],
            F.lit(-1).alias(op_col),
        )
        return plus.unionByName(minus)

    def diff(
        self, old_version: int, new_version: int, keys, compare_cols=None
    ) -> DataFrame:
        """Row-level CDC between two versions (operators.table_diff)."""
        from globalweather_etl_spark.operators.table_diff import table_diff

        return table_diff(
            self.read(old_version),
            self.read(new_version),
            keys,
            compare_cols,
        )

    def replace_where(
        self,
        df: DataFrame,
        condition,
        rewrite_partitions: int | None = None,
        max_retries: int = 5,
        manifest_extra: dict | None = None,
        defer_publish: bool = False,
    ) -> dict:
        """Predicate-scoped atomic overwrite — Delta's ``replaceWhere``
        (the generalization of dynamic partition overwrite): in ONE
        commit, delete every live row matching ``condition`` and
        insert ``df``'s rows. The backfill primitive: recompute one
        date band / region / experiment arm and swap it in atomically
        while readers keep seeing the old version until publish.

        Delta's safety contract is enforced: every incoming row must
        satisfy ``condition`` (a row where it is false OR NULL fails
        loudly BEFORE anything commits — otherwise a backfill could
        silently write outside the band it claims to replace).

        Copy-on-write file pruning like merge_into: one probe tags the
        data files holding any matching live row (the predicate pushes
        into the parquet scan, so footer min/max skip non-matching
        files); ONLY those files rewrite (their non-matching survivors
        keep their rows), everything else carries by reference, and
        the new rows land as new files. Rewritten files shed their
        deletion-vector entries; kept files keep theirs. A no-match,
        empty-``df`` call commits nothing.

        Returns {"version", "files_rewritten", "files_kept",
        "n_replaced", "n_rows"}.

        ``defer_publish=True`` (the multi-table transaction's lock-
        window shrink, sources/catalog.py): run ONE compute attempt
        against the current head and return
        {"prepared": True, "manifest", "target", "result"} WITHOUT
        publishing — the caller publishes all its tables' manifests
        back-to-back (metadata-only span) and falls back to the
        normal self-publishing call if a racing commit moved the head
        in between.  No-op shapes return their normal result dict
        (no "prepared" key)."""
        if isinstance(condition, str):
            condition = F.expr(condition)
        head = self.latest_version()
        if head is None:
            raise ValueError(
                f"no commits yet at {self.path} — use write() to "
                "create the table"
            )
        # rows where the predicate is false or NULL are OUTSIDE the
        # replaced band: loud, per Delta's replaceWhere contract
        outside = (
            df.filter(~F.coalesce(condition, F.lit(False)))
            .limit(1)
            .collect()
        )
        if outside:
            raise ValueError(
                "replace_where: an incoming row does not satisfy the "
                f"replacement predicate (e.g. {outside[0].asDict()}) — "
                "writing outside the replaced band would silently "
                "corrupt data the predicate promised to keep"
            )
        keep_cond = ~F.coalesce(condition, F.lit(False))
        for _ in range(max_retries):
            base = self.latest_version()
            target = self._next_version(base)
            m = self._manifest(base)
            cols = [
                f.name
                for f in StructType.fromJson(
                    json.loads(m["schema"])
                ).fields
            ]
            if sorted(df.columns) != sorted(cols):
                raise ValueError(
                    f"replace_where columns {sorted(df.columns)} != "
                    f"table columns {sorted(cols)}"
                )
            # types too, not just names: a mistyped frame would land
            # parquet files whose physical types contradict the
            # manifest schema every later read trusts (same loudness
            # contract as append's _unify_schemas conflict error)
            tbl_types = {
                f.name: f.dataType
                for f in StructType.fromJson(json.loads(m["schema"])).fields
            }
            for f in df.schema.fields:
                if f.dataType != tbl_types[f.name]:
                    raise ValueError(
                        f"replace_where type conflict on {f.name!r}: "
                        f"incoming {f.dataType} vs table "
                        f"{tbl_types[f.name]}"
                    )
            tgt = self._read_files(m["files"], m, with_pos=True)
            hit_rel = sorted(
                r["__dv_file"]
                for r in tgt.filter(condition)
                .select("__dv_file")
                .distinct()
                .collect()
            )
            kept_rel = [f for f in m["files"] if f not in set(hit_rel)]
            out_parts = [df.select(*cols)]
            n_hit_rows = 0
            n_hit_kept = 0
            if hit_rel:
                hit_tgt = self._read_files(hit_rel, m)
                # ONE aggregate pass over the hit files yields both
                # totals; n_replaced derives entirely from these
                # parquet-backed (deterministic) scans — never from
                # re-executing the caller's df plan, which could be
                # nondeterministic and would cost an extra job
                stats = hit_tgt.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.count_if(keep_cond).alias("kept"),
                ).collect()[0]
                n_hit_rows = stats["n"]
                n_hit_kept = stats["kept"]
                out_parts.append(hit_tgt.filter(keep_cond))
            rewrite = out_parts[0]
            for p in out_parts[1:]:
                rewrite = rewrite.unionByName(p)
            if rewrite_partitions is not None:
                rewrite = rewrite.coalesce(rewrite_partitions)
            commit_dir = f"{self.path}/{_DATA_DIR}/c-{uuid.uuid4().hex}"
            n_written = self._write_counted(rewrite, commit_dir)
            new_files = self._list_commit_files(commit_dir)
            if not hit_rel and n_written == 0:
                return {
                    "version": base,
                    "files_rewritten": 0,
                    "files_kept": len(m["files"]),
                    "n_replaced": 0,
                    "n_rows": m["n_rows"],
                }
            pdv = m.get("dvs") or {"stores": [], "files": []}
            rem_dv = [f for f in pdv["files"] if f in set(kept_rel)]
            manifest = {
                **{
                    k: v
                    for k, v in (manifest_extra or {}).items()
                    if k
                    not in (
                        "version", "parent", "mode", "schema", "files",
                        "n_rows", "max_batch_id", "ivm_max_batch_id",
                        "dvs", "clustering", "dropped_columns",
                    )
                },
                **self._stamp_carry(base, manifest_extra or {}),
                "version": target,
                "parent": base,
                "mode": "replace",
                "schema": m["schema"],
                "files": kept_rel + new_files,
                "n_rows": m["n_rows"] - n_hit_rows + n_written,
                **(
                    {"dvs": {"stores": pdv["stores"], "files": rem_dv}}
                    if rem_dv
                    else {}
                ),
            }
            result = {
                "version": target,
                "files_rewritten": len(hit_rel),
                "files_kept": len(kept_rel),
                "n_replaced": n_hit_rows - n_hit_kept,
                "n_rows": manifest["n_rows"],
            }
            if defer_publish:
                return {
                    "prepared": True,
                    "manifest": manifest,
                    "target": target,
                    "result": result,
                }
            if self._publish_manifest(manifest, target):
                return result
        raise RuntimeError(
            f"replace_where lost the commit race {max_retries} times"
        )

    def delete_where(
        self,
        condition,
        store_files: int = 1,
        max_retries: int = 5,
        manifest_extra: dict | None = None,
        defer_publish: bool = False,
    ) -> dict:
        """MERGE-ON-READ delete: remove rows matching ``condition`` (a
        Column or SQL string) WITHOUT rewriting any data file — the
        deletion-vector design Delta and Iceberg publish (positional
        delete files).  The commit writes only a tiny parquet store of
        deleted ``(file, row_position)`` pairs and a manifest whose
        ``dvs`` entry points at it; every read path anti-joins the
        store for the affected files (see ``_read_files``).  Cost is
        O(matched rows) regardless of how large the matched files are
        — the copy-on-write complement (``merge_into``) pays O(matched
        FILES) instead, so merge-on-read wins when deletes are sparse
        and scattered (GDPR row erasure across a 100 TB table touches
        a few thousand rows in thousands of files: DV commit writes
        kilobytes; copy-on-write would rewrite terabytes).

        The condition is evaluated on the LIVE rows (prior deletions
        already applied), so re-running the same delete is a no-op and
        row accounting stays exact.  Reads get slightly slower on the
        affected files (one anti-join) until ``purge_deletes`` or
        ``compact`` materializes the deletions away — the documented
        merge-on-read trade.  Time travel to pre-delete versions is
        untouched.  ``store_files`` bounds the DV store's file count
        (deletes are usually tiny; raise it for billion-row sweeps).

        Returns {"version", "n_deleted", "files_affected"}; a delete
        matching nothing commits nothing.  ``defer_publish`` as in
        ``replace_where`` (compute one attempt, return the prepared
        manifest unpublished)."""
        if isinstance(condition, str):
            condition = F.expr(condition)
        if store_files < 1:
            raise ValueError("store_files must be >= 1")
        if self.latest_version() is None:
            raise ValueError(f"no commits yet at {self.path}")
        for _ in range(max_retries):
            base = self.latest_version()
            target = self._next_version(base)
            m = self._manifest(base)
            live = self._read_files(m["files"], m, with_pos=True)
            matches = (
                live.filter(condition)
                .select("__dv_file", "__dv_pos")
                .coalesce(store_files)
            )
            commit_dir = f"{self.path}/{_DATA_DIR}/c-{uuid.uuid4().hex}"
            matches.write.mode("error").parquet(commit_dir)
            store_rels = self._list_commit_files(commit_dir)
            back = self.spark.read.schema(_DV_SCHEMA).parquet(commit_dir)
            n_del = back.count()
            if n_del == 0:
                # nothing matched: don't burn a version (the empty
                # store dir is unreferenced; vacuum reclaims it)
                return {
                    "version": base, "n_deleted": 0, "files_affected": 0,
                }
            affected = sorted(
                r["__dv_file"]
                for r in back.select("__dv_file").distinct().collect()
            )
            unknown = [a for a in affected if a not in set(m["files"])]
            if unknown:
                raise RuntimeError(
                    "deletion-vector file ids do not match the manifest "
                    f"listing (root-derivation drift?): {unknown[:3]}"
                )
            pdv = m.get("dvs") or {"stores": [], "files": []}
            manifest = {
                **{
                    k: v
                    for k, v in (manifest_extra or {}).items()
                    if k
                    not in (
                        "version", "parent", "mode", "schema", "files",
                        "n_rows", "max_batch_id", "ivm_max_batch_id",
                        "dvs", "clustering", "dropped_columns",
                    )
                },
                **self._stamp_carry(base, {}),
                "version": target,
                "parent": base,
                "mode": "delete",
                "schema": m["schema"],
                "files": m["files"],
                "n_rows": m["n_rows"] - n_del,
                "dvs": {
                    "stores": pdv["stores"] + store_rels,
                    "files": sorted(set(pdv["files"]) | set(affected)),
                },
            }
            result = {
                "version": target,
                "n_deleted": n_del,
                "files_affected": len(affected),
            }
            if defer_publish:
                return {
                    "prepared": True,
                    "manifest": manifest,
                    "target": target,
                    "result": result,
                }
            if self._publish_manifest(manifest, target):
                return result
            # lost the race: the matched positions may be stale against
            # the new head — recompute everything
        raise RuntimeError(
            f"delete_where lost the commit race {max_retries} times"
        )

    def purge_deletes(self, max_retries: int = 5) -> int:
        """Materialize the head's deletion vectors: rewrite ONLY the
        files that carry deletions (survivor rows, DVs applied), carry
        every clean file by reference, and commit a DV-free version —
        Delta's ``REORG TABLE … APPLY (PURGE)``.  Cost is O(data in
        DV'd files), not table size; after the commit, reads of those
        files are plain scans again and the next ``vacuum`` reclaims
        the now-unreferenced DV stores.  No-op (returns the head) when
        the head has no deletion vectors."""
        head = self.latest_version()
        if head is None:
            raise ValueError(f"no commits yet at {self.path}")
        for _ in range(max_retries):
            base = self.latest_version()
            m = self._manifest(base)
            dv = m.get("dvs")
            if not dv or not dv["files"]:
                return base
            target = self._next_version(base)
            dvd = set(dv["files"])
            clean = [r for r in m["files"] if r not in dvd]
            hit = [r for r in m["files"] if r in dvd]
            rewrite = self._read_files(hit, m)
            commit_dir = f"{self.path}/{_DATA_DIR}/c-{uuid.uuid4().hex}"
            rewrite.write.mode("error").parquet(commit_dir)
            new_files = self._list_commit_files(commit_dir)
            manifest = {
                **self._stamp_carry(base, {}),
                "version": target,
                "parent": base,
                "mode": "purge",
                "schema": m["schema"],
                "files": clean + new_files,
                "n_rows": m["n_rows"],
            }
            if self._publish_manifest(manifest, target):
                return target
        raise RuntimeError(
            f"purge_deletes lost the commit race {max_retries} times"
        )

    def merge_into_set(
        self,
        source: DataFrame,
        keys: list[str],
        set_exprs: dict,
        **merge_kwargs,
    ) -> dict:
        """ANSI column-level MERGE: ``WHEN MATCHED THEN UPDATE SET
        col = <expr over t.* and s.*>`` — the form plain ``merge_into``
        deliberately rejects (its matched semantics replace the whole
        row). Implemented as a PRE-JOIN that builds the row-image
        source merge_into already handles: source LEFT JOIN head
        (aliases ``s`` and ``t``), each table column projected as the
        SET expression when matched (columns not in ``set_exprs`` keep
        ``t``'s value) and as ``s``'s value when not matched (ANSI
        INSERT *). All of merge_into's machinery — file-level
        copy-on-write pruning, merge-on-read, retries, deferred
        publish — applies unchanged via ``merge_kwargs``.

        ``set_exprs`` maps column name -> SQL string or Column; the
        expressions may reference both sides (``t.balance +
        s.delta``). Two contracts inherited from the keyed-table
        model: target keys must be unique (duplicate target keys
        would fan the pre-join out and trip merge_into's unique-source
        guard loudly — ANSI's multi-row UPDATE per key has no
        deterministic row-image), and the SET computation reads the
        head AT CALL TIME — under a concurrent-commit race the retry
        re-applies the computed row image against the new head (same
        contract as the staged-rewrite verbs), it does not recompute
        the expressions.

        Scale: one extra key-equi join against the head (prunable,
        AQE-planned) before the normal merge; no collects."""
        bad = [c for c in set_exprs if c in keys]
        if bad:
            raise ValueError(
                f"SET on merge key(s) {bad} — keys identify the row "
                "and cannot be reassigned"
            )
        head = self.read()
        cols = head.columns
        unknown = [c for c in set_exprs if c not in cols]
        if unknown:
            raise ValueError(
                f"SET on unknown column(s) {unknown} (table has {cols})"
            )
        ignore_inserts = (
            merge_kwargs.get("when_not_matched") == "ignore"
        )
        if not ignore_inserts:
            missing = [c for c in cols if c not in source.columns]
            if missing:
                raise ValueError(
                    "WHEN NOT MATCHED INSERT * needs every table "
                    f"column on the source; missing {missing} — pass "
                    "when_not_matched='ignore' for a matched-only "
                    "SET merge (source then needs only keys + the "
                    "columns the expressions read)"
                )
        s = source.alias("s")
        t = head.withColumn("__m", F.lit(1)).alias("t")
        # plain (null-unsafe) equality, matching merge_into's own
        # key join — a NULL-keyed source row is "not matched" in both
        joined = s.join(
            t,
            [F.col(f"s.{k}") == F.col(f"t.{k}") for k in keys],
            "left",
        )
        matched = F.col("t.__m").isNotNull()
        if ignore_inserts:
            # matched-only: project the SET image directly — the
            # insert branch must not even be ANALYZED (the source may
            # legitimately lack non-SET table columns)
            joined = joined.filter(matched)
        out_cols = []
        for c in cols:
            e = set_exprs.get(c)
            if e is None:
                upd = F.col(f"t.{c}")
            elif isinstance(e, str):
                upd = F.expr(e)
            else:
                upd = e
            out_cols.append(
                upd.alias(c)
                if ignore_inserts
                else F.when(matched, upd)
                .otherwise(F.col(f"s.{c}"))
                .alias(c)
            )
        effective = joined.select(*out_cols)
        return self.merge_into(effective, keys, **merge_kwargs)

    def merge_into(
        self,
        source: DataFrame,
        keys: list[str],
        when_matched: str = "update",
        when_not_matched: str = "insert",
        max_retries: int = 5,
        manifest_extra: dict | None = None,
        assume_unique_source: bool = False,
        rewrite_partitions: int | None = None,
        matched_delete_condition=None,
        strategy: str = "copy-on-write",
        dv_store_files: int = 1,
        defer_publish: bool = False,
        schema_evolution: bool = False,
    ) -> dict:
        """Delta-style MERGE with file-level copy-on-write pruning:
        apply ``source`` to the table head by key and commit the result
        as a new version.  Semantics per key:

          in both      when_matched:     'update' (ALL matching target
                       rows are replaced by the one source row — upsert
                       semantics for keyed tables, documented here
                       because ANSI MERGE would instead clone the
                       source row per matched target row), 'delete',
                       or 'ignore'
          source-only  when_not_matched: 'insert' or 'ignore'
          target-only  always kept

        ``matched_delete_condition`` (a Column or SQL string over the
        SOURCE row's columns) is the ANSI ``WHEN MATCHED AND <cond>
        THEN DELETE`` arm for when_matched='update': matched keys whose
        source row satisfies the condition are DELETED instead of
        updated, and not-matched source rows satisfying it are ignored
        rather than inserted (a row that only says "remove me" must not
        create state).  This is how retraction-aware callers
        (operators/ivm.py CDC refresh) upsert live groups and drop
        emptied ones in ONE atomic commit.

        The 100 TB property is WHICH files get rewritten: one inner
        join (target ⋈ distinct source keys) tags the data files that
        contain any matched key via input_file_name(); ONLY those
        files are rewritten — every untouched file is carried into the
        new manifest BY REFERENCE, so merge cost scales with the data
        files the keys actually live in (clustered layouts localize
        them; see write_clustered), not with table size.  Source keys
        must be unique (eager guard).  Optimistic concurrency: if a
        concurrent commit wins the version race, the whole merge
        recomputes against the new head (up to ``max_retries``).
        ``manifest_extra`` entries land verbatim in the commit's
        manifest (reserved keys are protected) — the hook exactly-once
        layers like operators.ivm use to stamp batch ids, mirroring
        write_batch.

        ``strategy`` picks how matched rows leave the table:
        'copy-on-write' (default) rewrites the files containing
        matched keys — reads stay plain scans, merge cost is O(data in
        matched FILES); 'merge-on-read' instead records the matched
        target rows as deletion-vector positions (see delete_where)
        and appends the update/insert rows as NEW files — NO file is
        ever rewritten, merge cost is O(matched ROWS + source), and
        reads of the affected files pay an anti-join until
        ``purge_deletes``/``compact``.  Both strategies produce
        IDENTICAL table contents (test-pinned:
        tests/test_deletion_vectors.py TestMergeStrategyParity; also
        oracle-graded — tpch_scalar_checks dv_* rows); pick
        merge-on-read for frequent small upserts into huge files,
        copy-on-write for read-hot tables.  ``dv_store_files`` bounds
        the merge-on-read DV store's file count.

        Returns {"version", "files_rewritten", "files_kept",
        "n_rows"} (merge-on-read adds "n_dv_deletes" and always has
        files_rewritten=0); a merge with nothing to do commits nothing
        and returns the current head.  ``defer_publish`` as in
        ``replace_where`` (compute one attempt, return the prepared
        manifest unpublished; the empty-table bootstrap still
        publishes immediately — its publish is already metadata-only
        after staging).

        ``schema_evolution=True`` (Delta's MERGE ``withSchemaEvolution``,
        round 11): the source may carry ADDITIONAL columns — the
        manifest schema evolves union-by-name exactly like append
        (added columns read as NULL from untouched files; same-name
        type conflicts fail loudly; dropped-column tombstones cannot
        resurrect).  The source must still carry every existing table
        column: our matched semantics replace the whole row with the
        one source row, and with multiple matched target rows there
        is no deterministic value to keep for an omitted column — a
        loud error beats a silent arbitrary pick."""
        if when_matched not in ("update", "delete", "ignore"):
            raise ValueError(f"bad when_matched: {when_matched!r}")
        if when_not_matched not in ("insert", "ignore"):
            raise ValueError(f"bad when_not_matched: {when_not_matched!r}")
        if strategy not in ("copy-on-write", "merge-on-read"):
            raise ValueError(f"bad strategy: {strategy!r}")
        if not keys:
            raise ValueError("keys must be non-empty")
        if matched_delete_condition is not None:
            if when_matched != "update":
                raise ValueError(
                    "matched_delete_condition requires when_matched='update'"
                )
            if isinstance(matched_delete_condition, str):
                matched_delete_condition = F.expr(matched_delete_condition)
        if not assume_unique_source:
            # one eager guard job; callers whose source is unique BY
            # CONSTRUCTION (e.g. a groupBy output — operators/ivm.py)
            # pass assume_unique_source=True to skip it
            dup = (
                source.groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("c"))
                .filter(F.col("c") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                raise ValueError(
                    f"source has duplicate merge keys, e.g. {dup[0]}"
                )
        head = self.latest_version()
        if head is None:
            if when_not_matched == "insert":
                boot = source
                if matched_delete_condition is not None:
                    # delete-marked rows must not bootstrap state either
                    boot = boot.filter(~matched_delete_condition)
                v = self.write(
                    boot, mode="overwrite", manifest_extra=manifest_extra
                )
                m = self._manifest(v)
                return {
                    "version": v,
                    "files_rewritten": 0,
                    "files_kept": 0,
                    "n_rows": m["n_rows"],
                }
            raise ValueError(f"no commits yet at {self.path}")

        for _ in range(max_retries):
            base = self.latest_version()
            # claim target BEFORE the expensive work: any concurrent
            # commit must collide with us on this exact version's lock
            # (never skip past), so a stale merge can never publish
            target = self._next_version(base)
            m = self._manifest(base)
            cols = [
                f.name
                for f in StructType.fromJson(json.loads(m["schema"])).fields
            ]
            if schema_evolution:
                missing = [c for c in cols if c not in source.columns]
                if missing:
                    raise ValueError(
                        "schema_evolution merge source must still "
                        "carry every existing table column; missing "
                        f"{missing} (matched rows are replaced whole — "
                        "there is no deterministic fill for an omitted "
                        "column)"
                    )
                self._guard_dropped(m, source.schema.fieldNames())
                evolved = _unify_schemas(
                    StructType.fromJson(json.loads(m["schema"])),
                    source.schema,
                )
                out_schema_json = evolved.json()
                sel_cols = [f.name for f in evolved.fields]
            else:
                if sorted(source.columns) != sorted(cols):
                    raise ValueError(
                        f"source columns {sorted(source.columns)} != table "
                        f"columns {sorted(cols)}"
                    )
                out_schema_json = m["schema"]
                sel_cols = cols
            src = source.select(*sel_cols)
            src_keys = src.select(*keys).distinct()
            pdv = m.get("dvs") or {"stores": [], "files": []}
            # live target rows with (file, position) identity attached
            # at scan time — prior deletion vectors already applied, so
            # a row deleted by an earlier commit can never match again
            tgt = self._read_files(m["files"], m, with_pos=True)

            if strategy == "merge-on-read":
                result = self._merge_mor(
                    base, target, m, pdv, src, src_keys, keys,
                    when_matched, when_not_matched,
                    matched_delete_condition, rewrite_partitions,
                    dv_store_files, manifest_extra, tgt,
                    defer_publish=defer_publish,
                    schema_json=out_schema_json,
                )
                if result is not None:
                    return result
                continue  # lost the commit race: recompute

            # ONE probe job finds the hit files AND their live row
            # counts (optimization round 13, guide §1.2 "don't compute
            # things twice": the old shape ran a semi-join probe, then
            # a SECOND job re-reading the hit files just to count
            # them). tgt is the DV-applied read, so the per-file
            # counts equal what the separate hit-read counted; only
            # hit files reach the driver (the filter runs
            # distributed), so driver memory stays O(hit files)
            # exactly as before.
            hit_stats = (
                tgt.join(
                    src_keys.withColumn("__hit", F.lit(1)),
                    keys,
                    "left",
                )
                .groupBy("__dv_file")
                .agg(
                    F.count(F.lit(1)).alias("__rows"),
                    F.max("__hit").alias("__h"),
                )
                .filter(F.col("__h").isNotNull())
                .collect()
            )
            hit_rel = sorted(r["__dv_file"] for r in hit_stats)
            kept_rel = [r for r in m["files"] if r not in set(hit_rel)]

            out_parts = []
            n_hit_rows = 0
            if hit_rel:
                # DV-applied read: rows already deleted in the hit
                # files must not survive into the rewrite
                hit_tgt = self._read_files(hit_rel, m)
                n_hit_rows = sum(int(r["__rows"]) for r in hit_stats)
                survivors = hit_tgt.join(src_keys, keys, "left_anti")
                if when_matched == "update":
                    matched_src = src.join(
                        hit_tgt.select(*keys).distinct(), keys, "left_semi"
                    )
                    if matched_delete_condition is not None:
                        # WHEN MATCHED AND cond THEN DELETE: drop the
                        # matched row instead of writing it back
                        matched_src = matched_src.filter(
                            ~matched_delete_condition
                        )
                    # under schema evolution, survivors (old schema)
                    # null-fill the source's added columns
                    out_parts.append(
                        survivors.unionByName(
                            matched_src,
                            allowMissingColumns=schema_evolution,
                        )
                    )
                elif when_matched == "delete":
                    out_parts.append(survivors)
                else:  # ignore: keep the files as they are
                    out_parts.append(hit_tgt)
            if when_not_matched == "insert":
                # keys absent from the WHOLE target (not just hit files)
                inserts = src.join(
                    tgt.select(*keys).distinct(), keys, "left_anti"
                )
                if matched_delete_condition is not None:
                    # a not-matched row that only retracts must not
                    # create state
                    inserts = inserts.filter(~matched_delete_condition)
                out_parts.append(inserts)
            if not out_parts and not hit_rel:
                return {
                    "version": base,
                    "files_rewritten": 0,
                    "files_kept": len(m["files"]),
                    "n_rows": m["n_rows"],
                }

            rewrite = out_parts[0]
            for p in out_parts[1:]:
                rewrite = rewrite.unionByName(
                    p, allowMissingColumns=schema_evolution
                )
            if schema_evolution:
                # pin the commit's file schema to the evolved order
                # (a hit_tgt-first union would otherwise write files
                # whose column set depends on which parts ran; an
                # ignore-only rewrite never saw an evolved part at
                # all — null-fill before ordering)
                have = set(rewrite.columns)
                for fld in evolved.fields:
                    if fld.name not in have:
                        rewrite = rewrite.withColumn(
                            fld.name,
                            F.lit(None).cast(fld.dataType),
                        )
                rewrite = rewrite.select(*sel_cols)
            if rewrite_partitions is not None:
                # bound the commit's file count — merges whose touched
                # state is small (IVM group states, dimension tables)
                # otherwise write one near-empty file per shuffle
                # partition, and the NEXT merge pays per-file opens
                rewrite = rewrite.coalesce(rewrite_partitions)
            commit_dir = f"{self.path}/{_DATA_DIR}/c-{uuid.uuid4().hex}"
            n_written = self._write_counted(rewrite, commit_dir)
            new_files = self._list_commit_files(commit_dir)
            if not hit_rel and n_written == 0:
                # insert-mode merge that found nothing to insert: the
                # table is unchanged — don't burn a version (the empty
                # commit dir is unreferenced; vacuum reclaims it)
                return {
                    "version": base,
                    "files_rewritten": 0,
                    "files_kept": len(m["files"]),
                    "n_rows": m["n_rows"],
                }
            # rewritten files leave their DV entries behind; kept
            # files keep theirs (stores carry whole — stale pairs for
            # rewritten rels can never match a scan again)
            rem_dv = [f for f in pdv["files"] if f in set(kept_rel)]
            manifest = {
                **{
                    k: v
                    for k, v in (manifest_extra or {}).items()
                    if k
                    not in (
                        "version", "parent", "mode", "schema", "files",
                        "n_rows", "max_batch_id", "ivm_max_batch_id",
                        "dvs", "clustering", "dropped_columns",
                    )
                },
                **self._stamp_carry(base, manifest_extra or {}),
                "version": target,
                "parent": base,
                "mode": "merge",
                "schema": out_schema_json,
                "files": kept_rel + new_files,
                "n_rows": m["n_rows"] - n_hit_rows + n_written,
                **(
                    {"dvs": {"stores": pdv["stores"], "files": rem_dv}}
                    if rem_dv
                    else {}
                ),
            }
            result = {
                "version": target,
                "files_rewritten": len(hit_rel),
                "files_kept": len(kept_rel),
                "n_rows": manifest["n_rows"],
            }
            if defer_publish:
                return {
                    "prepared": True,
                    "manifest": manifest,
                    "target": target,
                    "result": result,
                }
            if self._publish_manifest(manifest, target):
                return result
            # lost the race: a concurrent commit changed the head — the
            # pruning decisions are stale, recompute everything
        raise RuntimeError(
            f"merge_into lost the commit race {max_retries} times"
        )

    def _merge_mor(
        self, base, target, m, pdv, src, src_keys, keys,
        when_matched, when_not_matched, matched_delete_condition,
        rewrite_partitions, dv_store_files, manifest_extra, tgt,
        defer_publish: bool = False,
        schema_json: str | None = None,
    ) -> dict | None:
        """One merge-on-read attempt against head ``base`` (see
        merge_into): matched target rows become deletion-vector
        positions, update/insert rows append as new files, no file is
        rewritten.  Returns the result dict, or None when the commit
        race was lost (caller recomputes)."""
        n_matched = 0
        store_rels: list[str] = []
        affected: list[str] = []
        if when_matched in ("update", "delete"):
            matched_pos = (
                tgt.join(src_keys, keys, "left_semi")
                .select("__dv_file", "__dv_pos")
                .coalesce(dv_store_files)
            )
            dv_dir = f"{self.path}/{_DATA_DIR}/c-{uuid.uuid4().hex}"
            matched_pos.write.mode("error").parquet(dv_dir)
            store_rels = self._list_commit_files(dv_dir)
            back = self.spark.read.schema(_DV_SCHEMA).parquet(dv_dir)
            n_matched = back.count()
            if n_matched:
                affected = sorted(
                    r["__dv_file"]
                    for r in back.select("__dv_file").distinct().collect()
                )
                unknown = [
                    a for a in affected if a not in set(m["files"])
                ]
                if unknown:
                    raise RuntimeError(
                        "deletion-vector file ids do not match the "
                        f"manifest listing: {unknown[:3]}"
                    )
        out_parts = []
        if when_matched == "update":
            matched_src = src.join(
                tgt.select(*keys).distinct(), keys, "left_semi"
            )
            if matched_delete_condition is not None:
                matched_src = matched_src.filter(
                    ~matched_delete_condition
                )
            out_parts.append(matched_src)
        if when_not_matched == "insert":
            inserts = src.join(
                tgt.select(*keys).distinct(), keys, "left_anti"
            )
            if matched_delete_condition is not None:
                inserts = inserts.filter(~matched_delete_condition)
            out_parts.append(inserts)
        new_files: list[str] = []
        n_written = 0
        if out_parts:
            rewrite = out_parts[0]
            for p in out_parts[1:]:
                rewrite = rewrite.unionByName(p)
            if rewrite_partitions is not None:
                rewrite = rewrite.coalesce(rewrite_partitions)
            commit_dir = f"{self.path}/{_DATA_DIR}/c-{uuid.uuid4().hex}"
            n_written = self._write_counted(rewrite, commit_dir)
            new_files = self._list_commit_files(commit_dir)
        if n_matched == 0 and n_written == 0:
            # unreferenced empty dirs are vacuum's to reclaim
            return {
                "version": base,
                "files_rewritten": 0,
                "files_kept": len(m["files"]),
                "n_rows": m["n_rows"],
                "n_dv_deletes": 0,
            }
        dv_files = sorted(set(pdv["files"]) | set(affected))
        stores = pdv["stores"] + (store_rels if n_matched else [])
        manifest = {
            **{
                k: v
                for k, v in (manifest_extra or {}).items()
                if k
                not in (
                    "version", "parent", "mode", "schema", "files",
                    "n_rows", "max_batch_id", "ivm_max_batch_id", "dvs",
                    "clustering", "dropped_columns",
                )
            },
            **self._stamp_carry(base, manifest_extra or {}),
            "version": target,
            "parent": base,
            "mode": "merge",
            "schema": schema_json or m["schema"],
            "files": m["files"] + new_files,
            "n_rows": m["n_rows"] - n_matched + n_written,
            **(
                {"dvs": {"stores": stores, "files": dv_files}}
                if dv_files
                else {}
            ),
        }
        result = {
            "version": target,
            "files_rewritten": 0,
            "files_kept": len(m["files"]),
            "n_rows": manifest["n_rows"],
            "n_dv_deletes": n_matched,
        }
        if defer_publish:
            return {
                "prepared": True,
                "manifest": manifest,
                "target": target,
                "result": result,
            }
        if self._publish_manifest(manifest, target):
            return result
        return None

    # --------------------------------------------- layout maintenance
    def compact(
        self,
        target_file_bytes: int = 128 << 20,
        cluster_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
        curve: str = "morton",
    ) -> int:
        """Rewrite the head's files into ~target-sized ones as a NEW
        overwrite commit — the versioned twin of
        `operators.compaction.compact_parquet`: rows and schema are
        untouched (bit-identity is test-pinned via content equality),
        old versions remain time-travelable, and the small files are
        reclaimed by the next `vacuum`.  Returns the new version.

        A plain compact hash-repartitions, which DESTROYS any
        clustered layout the table carried (and with it zone-map
        pruning). Pass ``cluster_by`` (range + in-file sort, the
        `write_clustered` layout) or ``zorder_by`` (Morton, the
        `write_zordered` layout) to re-cluster during the rewrite —
        the same single shuffle either way, so restoring the layout is
        free relative to the rewrite. This is the Delta OPTIMIZE /
        OPTIMIZE ZORDER maintenance pair.

        Streaming ingestion (one file per micro-batch) is the intended
        caller: run compact + vacuum on a maintenance cadence and the
        per-file open/footer cost of head scans stays bounded however
        many commits the table has absorbed."""
        if target_file_bytes < 1:
            raise ValueError("target_file_bytes must be positive")
        if cluster_by and zorder_by:
            raise ValueError("pass cluster_by OR zorder_by, not both")
        if self.latest_version() is None:
            raise ValueError(f"no commits yet at {self.path}")
        # compaction preserves every live row — the manifest carries
        # mode "optimize" (dataChange=false) so incremental consumers
        # (read_since, the snapshot stream) skip it instead of raising.
        # The clustered variants ARE optimize(full=True): same rewrite,
        # same race-safe atomic publish (a mid-flight append makes the
        # publish fail and the rewrite recompute — never drops rows)
        if zorder_by or cluster_by:
            return self.optimize(
                zorder_by=zorder_by,
                cluster_by=cluster_by,
                target_file_bytes=target_file_bytes,
                full=True,
                curve=curve,
            )["version"]
        for _ in range(5):
            base = self.latest_version()
            m = self._manifest(base)
            n_out = max(
                1,
                -(-self._files_bytes(m["files"]) // target_file_bytes),
            )
            target = self._next_version(base)
            rewrite = self._read_files(m["files"], m).repartition(n_out)
            commit_dir = f"{self.path}/{_DATA_DIR}/c-{uuid.uuid4().hex}"
            rewrite.write.mode("error").parquet(commit_dir)
            manifest = {
                **self._stamp_carry(base, {}),
                "version": target,
                "parent": base,
                "mode": "optimize",
                "schema": m["schema"],
                "files": self._list_commit_files(commit_dir),
                "n_rows": m["n_rows"],
            }
            # a hash-repartitioned rewrite destroys any clustered
            # layout the parent carried
            manifest.pop("clustering", None)
            if self._publish_manifest(manifest, target):
                return target
        raise RuntimeError("compact lost the commit race 5 times")

    def write_clustered(
        self, df: DataFrame, cluster_by: list[str], n_files: int = 8,
        mode: str = "overwrite",
    ) -> int:
        """Commit with a range-clustered file layout: rows are range-
        partitioned and sorted within files on ``cluster_by``, so each
        data file's parquet footer covers a narrow key range and
        selective readers can skip whole files
        (`operators.layout.file_ranges` / `files_for_range` audit the
        resulting footers).  One sampling pass + one shuffle, then the
        normal atomic manifest publish."""
        if not cluster_by:
            raise ValueError("cluster_by needs at least one column")
        cols = [F.col(c) for c in cluster_by]
        clustered = df.repartitionByRange(n_files, *cols).sortWithinPartitions(
            *cols
        )
        return self.write(
            clustered,
            mode=mode,
            _clustering={"kind": "range", "cols": list(cluster_by)},
        )

    def write_zordered(
        self,
        df: DataFrame,
        zorder_by: list[str],
        n_files: int = 8,
        bits: int = 8,
        mode: str = "overwrite",
        curve: str = "morton",
    ) -> int:
        """Commit with a Z-ORDER (Morton) clustered file layout — the
        multi-dimensional form of ``write_clustered`` (the public
        technique behind Delta/Iceberg Z-ORDER): each cluster column
        is bucketed into 2^bits uniform slots between its global
        min/max (`width_bucket`, one tiny pre-aggregate), the bucket
        bits are interleaved (`operators.layout.zorder_key` — pure
        codegen shifts/ORs), and rows range-write on the interleaved
        key. Zone maps built on the result prune BOX predicates on
        ANY of the cluster columns, where a lexicographic layout only
        prunes on the leading one.

        Numeric, date and timestamp columns are supported; rows with
        a NULL in any cluster column get a NULL key and cluster
        together at the range start (still readable, never pruned
        incorrectly — zone maps treat them by null_count). Uniform
        bucketing is the documented trade: heavy skew concentrates
        buckets, degrading (never breaking) pruning — pre-transform
        skewed columns if needed.

        ``curve="hilbert"`` (2-D only, bits a multiple of 4) swaps the
        Morton interleave for the Hilbert-curve distance
        (`operators.layout.hilbert_key` — the locality upgrade behind
        liquid clustering's default: consecutive curve positions are
        always adjacent cells, so box reads touch fewer files). The
        clustering stamp records the curve; changing it is a spec
        change and re-clusters on the next optimize()."""
        clustered = self._zorder_frame(
            df, zorder_by, n_files, bits, curve
        )
        return self.write(
            clustered,
            mode=mode,
            _clustering={
                "kind": "zorder",
                "cols": list(zorder_by),
                "bits": bits,
                **({"curve": curve} if curve != "morton" else {}),
            },
        )

    def _zorder_frame(
        self,
        df: DataFrame,
        zorder_by: list[str],
        n_files: int,
        bits: int,
        curve: str = "morton",
    ) -> DataFrame:
        """The Morton-clustered frame behind write_zordered and
        optimize(): bucket each axis uniformly between ITS min/max in
        ``df`` (one tiny pre-aggregate), interleave the bucket bits,
        range-write on the interleaved key. Bounds come from the frame
        being written, not the whole table — zone maps prune per FILE,
        so each clustering pass's files prune well against their own
        data whatever earlier passes looked like."""
        from globalweather_etl_spark.operators.layout import (
            hilbert_key,
            zorder_key,
        )

        if curve not in ("morton", "hilbert"):
            raise ValueError(f"curve must be morton/hilbert, got {curve!r}")
        if not zorder_by:
            raise ValueError("zorder_by needs at least one column")
        if len(zorder_by) * bits > 63:
            raise ValueError(
                f"{len(zorder_by)} cols x {bits} bits exceeds a long"
            )
        dts = {f.name: f.dataType.simpleString() for f in df.schema.fields}

        def _as_num(c: str):
            s = dts.get(c)
            if s is None:
                raise KeyError(f"no column {c!r}")
            if s == "date":
                return F.datediff(F.col(c), F.lit("1970-01-01")).cast(
                    "double"
                )
            if s.startswith("timestamp"):
                return F.col(c).cast("double")
            col = F.col(c).cast("double")
            if s in ("string", "boolean") or s.startswith(
                ("array", "map", "struct", "binary")
            ):
                raise TypeError(
                    f"column {c!r} of type {s} cannot be z-ordered "
                    "(needs a numeric/date/timestamp axis)"
                )
            return col

        nums = {c: _as_num(c) for c in zorder_by}
        bounds = df.agg(
            *[F.min(e).alias(f"mn_{c}") for c, e in nums.items()],
            *[F.max(e).alias(f"mx_{c}") for c, e in nums.items()],
        ).collect()[0]
        n_buckets = 1 << bits
        buckets = []
        for c, e in nums.items():
            mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
            if mn is None or mn == mx:
                buckets.append(F.lit(0))
                continue
            wb = F.width_bucket(
                e, F.lit(float(mn)), F.lit(float(mx)), F.lit(n_buckets)
            )
            buckets.append(F.least(wb, F.lit(n_buckets)) - 1)
        z = (
            hilbert_key(buckets, bits)
            if curve == "hilbert"
            else zorder_key(buckets, bits)
        )
        return (
            df.withColumn("__z", z)
            .repartitionByRange(n_files, F.col("__z"))
            .sortWithinPartitions("__z")
            .drop("__z")
        )

    def _files_bytes(self, rels: list[str]) -> int:
        total = 0
        for rel in rels:
            total += self._fs.getFileStatus(
                self._p(f"{self.path}/{rel}")
            ).getLen()
        return total

    def clustering_state(self, version: int | None = None) -> dict | None:
        """The clustering stamp at ``version`` (head by default),
        resolved against the LIVE file listing: the spec plus which
        files are clustered and which are not (appends since the last
        clustering pass, and files that merges/backfills rewrote
        outside the layout shuffle). None when the table has never
        been clustered or a plain overwrite erased the layout. This is
        the maintenance dashboard behind ``optimize()``'s incremental
        mode."""
        v = self._read_version(version)
        if v is None:
            raise ValueError(f"no commits yet at {self.path}")
        m = self._manifest(v)
        cl = m.get("clustering")
        if cl is None:
            return None
        stamped = set(cl["files"])
        clustered = [f for f in m["files"] if f in stamped]
        unclustered = [f for f in m["files"] if f not in stamped]
        spec = {k: val for k, val in cl.items() if k != "files"}
        return {
            **spec,
            "clustered_files": clustered,
            "unclustered_files": unclustered,
            "clustered_fraction": (
                len(clustered) / len(m["files"]) if m["files"] else 1.0
            ),
        }

    def clustering_overlap(
        self, version: int | None = None, build_stats: bool = True
    ) -> dict | None:
        """Key-range overlap of the CLUSTERED file set — the signal
        behind ``optimize(auto_full_threshold=...)``. Incremental
        passes cluster each batch of new files among themselves, so
        ranges from different passes stack over the same keys and a
        point probe touches more files every pass; this measures that
        read amplification directly from the zone-map sidecar's
        per-file min/max (``build_stats=True`` refreshes the sidecar
        incrementally first — O(files the newest sidecar doesn't
        cover)).

        Per clustering column: ``avg_depth`` = mean over clustered
        files of how many clustered files' [min, max] ranges intersect
        that file's (self included, so a perfectly disjoint layout
        reads 1.0; K stacked passes read ~K), plus ``max_depth``.
        Returns {cols, per_col: {col: {avg_depth, max_depth,
        n_files, n_unknown}}, avg_depth (worst column)} or None when
        the version carries no clustering stamp. Files without usable
        stats are skipped and counted in ``n_unknown``.

        Driver cost: one sidecar read + an O(F log F) sweep over the
        clustered files' bounds — a maintenance-cadence operation,
        not a hot path."""
        import bisect

        v = self._read_version(version)
        st = self.clustering_state(v)
        if st is None:
            return None
        cols = list(st["cols"])
        if build_stats:
            self.build_stats(cols=cols, version=v, incremental=True)
        clustered = set(st["clustered_files"])
        rows = self.spark.read.parquet(
            self._zm_path(v).toString()
        ).collect()
        per_col: dict[str, dict] = {}
        for col in cols:
            ivals = []
            unknown = 0
            for r in rows:
                if r["column"] != col or r["file"] not in clustered:
                    continue
                kind_num = r["min_num"] is not None
                lo = r["min_num"] if kind_num else r["min_str"]
                hi = r["max_num"] if kind_num else r["max_str"]
                if lo is None or hi is None:
                    unknown += 1
                    continue
                ivals.append((lo, hi))
            if not ivals:
                per_col[col] = {
                    "avg_depth": 1.0,
                    "max_depth": 1,
                    "n_files": 0,
                    "n_unknown": unknown,
                }
                continue
            mins = sorted(lo for lo, _ in ivals)
            maxs = sorted(hi for _, hi in ivals)
            n = len(ivals)
            depths = [
                # overlaps(i) = n - #files starting after hi_i
                #                 - #files ending before lo_i
                n
                - (n - bisect.bisect_right(mins, hi))
                - bisect.bisect_left(maxs, lo)
                for lo, hi in ivals
            ]
            per_col[col] = {
                "avg_depth": round(sum(depths) / n, 3),
                "max_depth": max(depths),
                "n_files": n,
                "n_unknown": unknown,
            }
        return {
            "cols": cols,
            "per_col": per_col,
            "avg_depth": max(
                d["avg_depth"] for d in per_col.values()
            ),
        }

    def optimize(
        self,
        zorder_by: list[str] | None = None,
        cluster_by: list[str] | None = None,
        target_file_bytes: int = 128 << 20,
        bits: int = 8,
        full: bool = False,
        auto_full_threshold: float | None = None,
        max_retries: int = 5,
        curve: str = "morton",
    ) -> dict:
        """INCREMENTAL clustering maintenance — the liquid-clustering /
        auto-OPTIMIZE idea: rewrite ONLY the files that are not yet in
        the table's clustered layout (appends since the last pass, and
        files that merges/backfills rewrote outside it), cluster them
        among themselves, and carry every already-clustered file by
        reference. ``compact(zorder_by=...)`` re-clusters the WHOLE
        head — O(table) per call, impossible on a maintenance cadence
        at 100 TB; this is O(new data since the last pass), so a table
        ingesting all day clusters in minutes at any total size.

        Mechanics: the manifest carries a ``clustering`` stamp (spec +
        the clustered file set) through every commit path; files a
        merge/backfill rewrites simply fall out of the set, so the
        next pass re-clusters exactly them. Deletion vectors on the
        rewritten files materialize away (their survivors are read
        DV-applied); clustered files keep theirs. Already-clustered
        files are NOT re-sorted against the new data — each pass's
        files are clustered among themselves, which is exactly what
        file-level zone-map pruning needs (per-file min/max stay
        narrow); the trade vs a full re-sort is more files per key
        range, reclaimable any time with ``full=True`` (or
        ``compact``), which rewrites everything under the spec.

        A spec change (different columns/kind/bits) or ``full=True``
        triggers the full rewrite automatically.
        ``auto_full_threshold`` closes the loop on the incremental
        trade: when set, the pass measures the clustered set's
        key-range overlap first (``clustering_overlap`` — per-file
        min/max from the zone-map sidecar, refreshed incrementally)
        and escalates to the full rewrite once the average overlap
        depth exceeds the threshold — i.e. once a point probe would
        touch more than ~threshold files, consolidation pays for
        itself. Databricks' auto-OPTIMIZE makes the same call from
        the same signal; ~4-8 is a reasonable setting.

        Returns {"version", "full", "files_rewritten",
        "files_written", "files_carried"} (+"overlap_depth" and
        "auto_full" when the threshold was given); an
        already-fully-clustered head is a no-op that burns no
        version."""
        if (zorder_by is None) == (cluster_by is None):
            raise ValueError(
                "pass exactly one of zorder_by / cluster_by"
            )
        if target_file_bytes < 1:
            raise ValueError("target_file_bytes must be positive")
        spec = (
            {
                "kind": "zorder",
                "cols": list(zorder_by),
                "bits": bits,
                **({"curve": curve} if curve != "morton" else {}),
            }
            if zorder_by
            else {"kind": "range", "cols": list(cluster_by)}
        )

        def _frame(df: DataFrame, n_out: int) -> DataFrame:
            if spec["kind"] == "zorder":
                return self._zorder_frame(
                    df, spec["cols"], n_out, spec["bits"],
                    spec.get("curve", "morton"),
                )
            cols = [F.col(c) for c in spec["cols"]]
            return df.repartitionByRange(
                n_out, *cols
            ).sortWithinPartitions(*cols)

        if self.latest_version() is None:
            raise ValueError(f"no commits yet at {self.path}")
        for _ in range(max_retries):
            base = self.latest_version()
            m = self._manifest(base)
            prev = m.get("clustering")
            same_spec = prev is not None and _spec_matches(prev, spec)
            # full mode (explicit, first clustering, or spec change)
            # is the incremental commit with NOTHING treated as
            # already clustered — one code path, so the full rewrite
            # shares the race-safe atomic publish below (a racer's
            # mid-flight append makes the publish fail and the whole
            # rewrite recompute against the new head; delegating to
            # write(mode="overwrite") would instead silently drop the
            # racer's rows on ITS retry)
            is_full = full or not same_spec
            overlap_depth = None
            auto_full = False
            if auto_full_threshold is not None and not is_full:
                ov = self.clustering_overlap(version=base)
                if ov is not None:
                    overlap_depth = ov["avg_depth"]
                    if overlap_depth > auto_full_threshold:
                        is_full = auto_full = True
            extra = (
                {
                    "overlap_depth": overlap_depth,
                    "auto_full": auto_full,
                }
                if auto_full_threshold is not None
                else {}
            )
            stamped = set() if is_full else set(prev["files"])
            live_cl = [f for f in m["files"] if f in stamped]
            uncl = [f for f in m["files"] if f not in stamped]
            if not uncl:
                return {
                    "version": base,
                    "full": False,
                    "files_rewritten": 0,
                    "files_written": 0,
                    "files_carried": len(live_cl),
                    **extra,
                }
            target = self._next_version(base)
            n_out = max(
                1, -(-self._files_bytes(uncl) // target_file_bytes)
            )
            # DV-applied read of just the files being rewritten: their
            # deletions materialize away in the rewrite, like
            # purge_deletes does for the files it touches
            rewrite = _frame(self._read_files(uncl, m), n_out)
            commit_dir = f"{self.path}/{_DATA_DIR}/c-{uuid.uuid4().hex}"
            rewrite.write.mode("error").parquet(commit_dir)
            new_files = self._list_commit_files(commit_dir)
            pdv = m.get("dvs") or {"stores": [], "files": []}
            rem_dv = [f for f in pdv["files"] if f in set(live_cl)]
            manifest = {
                **self._stamp_carry(base, {}),
                "version": target,
                "parent": base,
                "mode": "optimize",
                "schema": m["schema"],
                "files": live_cl + new_files,
                "n_rows": m["n_rows"],
                "clustering": {**spec, "files": live_cl + new_files},
                **(
                    {"dvs": {"stores": pdv["stores"], "files": rem_dv}}
                    if rem_dv
                    else {}
                ),
            }
            if not live_cl:
                # a full rewrite replaced every live file under the
                # head schema: dropped-name resurrection is physically
                # impossible now — clear the tombstones (the same
                # argument write(mode="overwrite") uses)
                manifest.pop("dropped_columns", None)
            if self._publish_manifest(manifest, target):
                return {
                    "version": target,
                    "full": is_full,
                    "files_rewritten": len(uncl),
                    "files_written": len(new_files),
                    "files_carried": len(live_cl),
                    **extra,
                }
            # lost the commit race: recompute against the new head
        raise RuntimeError(
            f"optimize lost the commit race {max_retries} times"
        )

    # -------------------------------------------------------- vacuum
    def vacuum(
        self,
        keep_last: int = 1,
        older_than: float | None = None,
        unreferenced_grace: float = 86400.0,
        dry_run: bool = False,
    ) -> dict:
        """Drop manifests older than the last ``keep_last`` versions,
        then delete data files no kept manifest references.  Time
        travel to dropped versions is gone; kept versions are
        untouched.  Returns {'manifests_removed', 'files_removed'}.

        ``older_than`` (seconds) is the retention form every lakehouse
        vacuum exposes: versions whose committed_at stamp is within
        the window are kept EVEN beyond keep_last (the guard against
        deleting what a long-running reader or read_asof window may
        still pin); unstamped legacy manifests count as old.

        ``unreferenced_grace`` (seconds) guards IN-FLIGHT commits:
        every commit path writes data files FIRST and publishes the
        manifest after, so a freshly-written unreferenced file may be
        a commit about to publish — deleting it would corrupt that
        version permanently (the manifest would reference deleted
        files).  Only unreferenced files whose modification time is
        older than the grace window are reclaimed (the Delta/Iceberg
        tombstone-retention rule); pass 0.0 only when no writer can
        possibly be in flight (tests, single-writer maintenance).

        ``dry_run=True`` computes the full reclamation plan and
        DELETES NOTHING: the report gains ``dry_run: True`` plus the
        exact manifest versions and table-relative file paths that a
        real run with the same arguments would remove — the
        look-before-you-leap step every irreversible retention
        operation needs (Delta's VACUUM DRY RUN)."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        vs = self.versions()
        keep = set(vs[-keep_last:])
        if older_than is not None:
            horizon = time.time() - older_than
            for v in vs:
                # effective instant: txn versions became visible at
                # their DECISION stamp, which is what readers pin by
                at = self._effective_commit_ts(self._manifest(v))
                if at is not None and at > horizon:
                    keep.add(v)
        # named tags pin their versions however old (and the kept-
        # delta rewrite below keeps their resolution chains whole) —
        # Iceberg's tag-retention rule; drop the tag to release it
        vset = set(vs)
        for tv in self.tags().values():
            if tv in vset:
                keep.add(tv)
        drop = [v for v in vs if v not in keep]
        referenced: set[str] = set()
        for v in keep:
            mv = self._manifest(v)
            referenced.update(mv["files"])
            # deletion-vector stores live under data/ like data files
            # and are exactly as load-bearing: deleting a referenced
            # store would resurrect its deleted rows
            referenced.update((mv.get("dvs") or {}).get("stores", []))
        removed_files = 0
        mtime_horizon_ms = (time.time() - unreferenced_grace) * 1000.0
        ddir = self._p(f"{self.path}/{_DATA_DIR}")
        it = self._fs.listFiles(ddir, True)
        to_delete = []
        while it.hasNext():
            st = it.next()
            name = st.getPath().getName()
            if name.startswith("_") or name.startswith("."):
                continue
            rel = self._rel(st.getPath().toString())
            if (
                rel not in referenced
                and st.getModificationTime() <= mtime_horizon_ms
            ):
                to_delete.append(st.getPath())
        if dry_run:
            # the real run also deletes each dropped version's publish
            # lock and its idx-v*/stats-v* sidecar dirs — the preview
            # must account for them or it under-reports reclamation
            sidecars: list[str] = []
            dropped_set = set(drop)
            mdir_ = self._p(f"{self.path}/{_MANIFEST_DIR}")
            for st in self._fs.listStatus(mdir_):
                name = st.getPath().getName()
                v = None
                if name.startswith("idx-v"):
                    v = int(name[5:13])
                elif name.startswith("stats-v"):
                    v = int(name[7:15])
                elif name.startswith("files-v"):
                    v = int(name[7:15])
                if v in dropped_set:
                    sidecars.append(self._rel(st.getPath().toString()))
            for v in drop:
                rel_lock = f"{_MANIFEST_DIR}/v{v:08d}.json.lock"
                if self._fs.exists(self._p(f"{self.path}/{rel_lock}")):
                    sidecars.append(rel_lock)
            return {
                "dry_run": True,
                "manifests_removed": len(drop),
                "files_removed": len(to_delete),
                "versions": sorted(drop),
                "files": sorted(
                    self._rel(p.toString()) for p in to_delete
                ),
                "sidecars": sorted(sidecars),
            }
        # Before dropping any manifest, make every KEPT version
        # self-resolvable: a kept delta whose parent is about to be
        # dropped is rewritten in place as its resolved full form
        # (same content after decode, original committed_at kept), so
        # delta chains never dangle. Ascending order: a kept child of
        # a kept-but-also-rewritten delta resolves through the already
        # rewritten parent. The rewrite happens BEFORE any deletion —
        # a crash mid-vacuum leaves extra full manifests, never a
        # broken chain.
        dropping = set(drop)
        if dropping:
            for v in sorted(keep):
                raw = self._read_json(self._manifest_path(v))
                if raw.get("delta") and raw["parent"] in dropping:
                    self._rewrite_manifest_full(v)
        # Fold COMMITTED transaction tags away on kept manifests:
        # visibility then no longer consults the decision record — the
        # committed_at stamp is replaced by the decision stamp, so AS
        # OF semantics are bit-identical — which is what makes the
        # catalog's decision log garbage-collectable at all (an
        # unstripped committed record is load-bearing forever: delete
        # it and its staged versions would turn invisible).  Pending
        # tags are left untouched — they ARE the pending state.
        for v in sorted(keep):
            raw = self._read_json(self._manifest_path(v))
            t = raw.get("txn")
            if t is None:
                continue
            rec = self._txn_decision(t)
            if rec is None or rec.get("status") != "committed":
                continue
            raw.pop("txn")
            if rec.get("decided_at") is not None:
                raw["committed_at"] = rec["decided_at"]
            self._swap_stored(raw, v)
        for p in to_delete:
            if self._fs.delete(p, False):
                removed_files += 1
        for v in drop:
            self._fs.delete(self._manifest_path(v), False)
            # the version's publish lock goes with its manifest (no
            # writer can target a dropped version number again: new
            # claims always allocate past the published head)
            self._fs.delete(
                self._p(self._manifest_path(v).toString() + ".lock"), False
            )
            if hasattr(self, "_manifest_cache"):
                self._manifest_cache.pop(v, None)
            if hasattr(self, "_raw_manifest_cache"):
                self._raw_manifest_cache.pop(v, None)
        # dropped versions' Bloom-index and zone-map sidecars (parquet
        # dir + meta json) go with their manifests (and out of the
        # probe caches)
        dropped = set(drop)
        mdir = self._p(f"{self.path}/{_MANIFEST_DIR}")
        for st in self._fs.listStatus(mdir):
            name = st.getPath().getName()
            if name.startswith("idx-v"):
                v = int(name[5:13])
                if v in dropped:
                    self._fs.delete(st.getPath(), True)
            elif name.startswith("stats-v"):
                v = int(name[7:15])
                if v in dropped:
                    self._fs.delete(st.getPath(), True)
            elif name.startswith("files-v"):
                # parquet checkpoint listing sidecars (flat lists,
                # tree manifest lists AND tree group files — group
                # names derive from their list name, `<list>-gNNNNN`):
                # dropped with their manifest; also sweep orphans from
                # crashed writers (version published by another
                # committer — the live manifest references a different
                # sidecar name, or none)
                v = int(name[7:15])
                if v in dropped:
                    self._fs.delete(st.getPath(), False)
                elif v in set(keep):
                    try:
                        live = self._read_json(self._manifest_path(v))
                    except Exception:
                        continue
                    ext = live.get("files_ext")
                    referenced_side = ext is not None and (
                        name == ext
                        or name.startswith(
                            ext[: -len(".parquet")] + "-g"
                        )
                    )
                    if not referenced_side:
                        self._fs.delete(st.getPath(), False)
            elif name.startswith("tag-") and name.endswith(
                ".json.lock"
            ):
                # orphaned tag-creation lock (writer crashed between
                # lock create and rename): without its tag file the
                # name is dead to create_tag — delete_tag can reclaim
                # it on demand (r13), and vacuum sweeps the leftovers
                # wholesale. A lock whose tag file exists is live.
                tag_file = self._p(
                    f"{self.path}/{_MANIFEST_DIR}/"
                    f"{name[: -len('.lock')]}"
                )
                if not self._fs.exists(tag_file):
                    self._fs.delete(st.getPath(), False)
        if dropped and hasattr(self, "_idx_cache"):
            for key in [k for k in self._idx_cache if k[0] in dropped]:
                self._idx_cache.pop(key, None)
        if dropped and hasattr(self, "_zm_cache"):
            for key in [k for k in self._zm_cache if k in dropped]:
                self._zm_cache.pop(key, None)
        return {
            "manifests_removed": len(drop),
            "files_removed": removed_files,
        }


def _unify_schemas(old: StructType, new: StructType) -> StructType:
    """Union-by-name of two commit schemas (append-mode evolution):
    columns keep OLD order first, added columns follow in new order,
    everything nullable (older files lack the added columns). A
    same-name type conflict is a loud error — silent coercion is how
    lakehouse tables rot."""
    from pyspark.sql.types import StructField

    new_by_name = {f.name: f for f in new.fields}
    fields = []
    for f in old.fields:
        nf = new_by_name.pop(f.name, None)
        if nf is not None and nf.dataType != f.dataType:
            raise ValueError(
                f"schema evolution type conflict on {f.name!r}: "
                f"{f.dataType} vs {nf.dataType}"
            )
        fields.append(StructField(f.name, f.dataType, True))
    for f in new.fields:
        if f.name in new_by_name:
            fields.append(StructField(f.name, f.dataType, True))
    return StructType(fields)


# ---------------------------------------------------------------------
# Per-file Bloom indexes: point-lookup FILE pruning for snapshot tables
# (the Delta/Iceberg bloom-column-index idea on the manifest log). The
# hashing is operators/bloom.py's engine-portable scheme, so the probe
# can run DRIVER-SIDE in pure Python — deciding which files to open
# costs zero Spark jobs.
#
# Round 6: the index is a PARQUET SIDECAR table (file, word_idx, bits)
# next to the manifests, not a driver-assembled JSON — the build is one
# Spark job that never materializes the index on the driver (the old
# JSON collected files x 65 words and its parse/write was already the
# bottleneck at toy scale), and the probe has two regimes: tables under
# a file-count threshold load the sidecar ONCE into a driver cache and
# probe in pure Python (zero jobs, the hot path), larger tables probe
# with a word-pruned Spark filter whose cost is flat in file count
# (parquet predicate pushdown on word_idx; output is candidates only).


def _py_bloom_positions(value, num_bits: int, num_hashes: int) -> list[int]:
    """Python twin of operators.bloom._positions — identical 60-bit
    md5 draws, so a driver-side probe agrees bit-for-bit with the
    Spark-built filter."""
    import hashlib

    return [
        int(
            hashlib.md5(f"bloom{i}|{value}".encode()).hexdigest()[:15], 16
        )
        % num_bits
        for i in range(num_hashes)
    ]


def _index_methods():
    """Attach the index methods to SnapshotTable (defined here to keep
    the class body above focused on the commit protocol)."""

    def _index_path(self, version: int, key_col: str):
        """The parquet sidecar directory for one (version, column)."""
        return self._p(
            f"{self.path}/{_MANIFEST_DIR}/idx-v{version:08d}.{key_col}.parquet"
        )

    def _index_meta_path(self, version: int, key_col: str):
        return self._p(
            f"{self.path}/{_MANIFEST_DIR}/"
            f"idx-v{version:08d}.{key_col}.meta.json"
        )

    def build_file_index(
        self,
        key_col: str,
        version: int | None = None,
        num_bits: int = 4096,
        num_hashes: int = 4,
    ) -> dict:
        """Build (or rebuild) a per-data-file Bloom index over
        ``key_col`` for one version (head by default) as a parquet
        sidecar of (file, word_idx, bits) rows. ONE Spark job — explode
        each row's k bit positions, groupBy (file, word) bit_or, write
        — with output bounded by files x num_bits/63 words and NOTHING
        materialized on the driver, so the build scales to
        million-file tables. Key values hash as their string rendering
        (use string/integer keys; document floats out).

        The ``file`` column stores the manifest-relative path, derived
        in-plan: every data file lives under a ``data/c-<uuid>/``
        commit dir whose tail is plain ASCII, so the substring after
        the LAST ``/data/c-`` needs no URI decoding and can never
        collide with a root path containing ``/data/``.

        Returns {"files": n_indexed, "words": total_words}."""
        from globalweather_etl_spark.operators.bloom import (
            _positions,
            _word_mask,
        )

        v = self._read_version(version)
        if v is None:
            raise ValueError(f"no commits yet at {self.path}")
        m = self._manifest(v)
        if not m["files"]:
            raise ValueError(f"version {v} has no data files to index")
        rel = F.concat(
            F.lit(f"{_DATA_DIR}/c-"),
            F.substring_index(
                F.input_file_name(), f"/{_DATA_DIR}/c-", -1
            ),
        )
        # PLAIN scan of the manifest's files, NOT read(v): a version
        # with deletion vectors reads as a UNION of two scans, which
        # input_file_name() cannot span (caught by the DV test suite).
        # Indexing deleted rows' keys is harmless — a Bloom index is
        # candidates-only, so a deleted key costs one false-positive
        # file open at probe time; the read path applies the DVs and
        # the exact filter.
        schema = StructType.fromJson(json.loads(m["schema"]))
        df = (
            self.spark.read.schema(schema)
            .parquet(*[f"{self.path}/{r}" for r in m["files"]])
            .withColumn("__file", rel)
        )
        idx_df = (
            df.filter(F.col(key_col).isNotNull())
            .select(
                "__file",
                F.explode(
                    _positions(
                        F.col(key_col).cast("string"), num_bits, num_hashes
                    )
                ).alias("pos"),
            )
            .select("__file", *_word_mask("pos"))
            .groupBy("__file", "word_idx")
            .agg(F.bit_or("mask").alias("bits"))
            .select(
                F.col("__file").alias("file"), "word_idx", "bits"
            )
        )
        dest = self._index_path(v, key_col)
        idx_df.coalesce(8).write.mode("overwrite").parquet(dest.toString())
        stats = self.spark.read.parquet(dest.toString()).agg(
            F.countDistinct("file").alias("nf"),
            F.count(F.lit(1)).alias("nw"),
        ).collect()[0]
        meta = {
            "version": v,
            "key_col": key_col,
            "num_bits": num_bits,
            "num_hashes": num_hashes,
            "n_files": int(stats["nf"]),
            "n_words": int(stats["nw"]),
        }
        mdest = self._index_meta_path(v, key_col)
        out = self._fs.create(mdest, True)
        try:
            out.write(json.dumps(meta, sort_keys=True).encode("utf-8"))
        finally:
            out.close()
        if hasattr(self, "_idx_cache"):
            self._idx_cache.pop((v, key_col), None)  # rebuilt: re-read
        return {"files": meta["n_files"], "words": meta["n_words"]}

    # below this many indexed files the whole sidecar is loaded ONCE
    # into a driver dict and every probe is pure Python (zero jobs);
    # above it, probes run a word-pruned Spark filter — flat in file
    # count, candidates-only output
    _IDX_CACHE_FILE_LIMIT = 50_000

    def files_for_key(
        self, key_col: str, value, version: int | None = None
    ) -> list[str] | None:
        """Data files (relative paths) that MAY contain ``value`` per
        the Bloom index — or None if the version has no index for this
        column. Small indexes probe driver-side from a one-time cache
        (no Spark job); large ones run one pushdown-pruned Spark
        filter over the sidecar."""
        v = self._read_version(version)
        if v is None:
            raise ValueError(f"no commits yet at {self.path}")
        cache = getattr(self, "_idx_cache", None)
        if cache is None:
            cache = {}
            self._idx_cache = cache
        entry = cache.get((v, key_col))
        if entry is None:
            mp = self._index_meta_path(v, key_col)
            if not self._fs.exists(mp):
                return None
            meta = self._read_json(mp)
            words = None
            # instance lookup (falls back to the class attr) so a
            # per-handle override can force the big-table regime —
            # tests and rehearsals set it on the instance
            if meta["n_files"] <= self._IDX_CACHE_FILE_LIMIT:
                # hot path: pull the sidecar once; probes are O(k) dict
                # lookups from here on (indexes are immutable per
                # version, so caching is safe)
                words = {}
                for r in self.spark.read.parquet(
                    self._index_path(v, key_col).toString()
                ).collect():
                    words.setdefault(r["file"], {})[r["word_idx"]] = r[
                        "bits"
                    ]
            entry = (meta, words)
            cache[(v, key_col)] = entry
        meta, words = entry
        positions = _py_bloom_positions(
            value, meta["num_bits"], meta["num_hashes"]
        )
        need = {}
        for pos in positions:
            need.setdefault(pos // 63, 0)
            need[pos // 63] |= 1 << (pos % 63)
        if words is not None:
            return [
                rel
                for rel, w in words.items()
                if all(
                    (w.get(wi, 0) & mask) == mask
                    for wi, mask in need.items()
                )
            ]
        # big-table path: one Spark probe. word_idx IN (...) prunes row
        # groups via parquet pushdown; a file qualifies when EVERY
        # needed word is present with its mask bits set.
        sidecar = self.spark.read.parquet(
            self._index_path(v, key_col).toString()
        )
        match = None
        for wi, mask in need.items():
            cond = (F.col("word_idx") == wi) & (
                F.col("bits").bitwiseAND(F.lit(mask)) == F.lit(mask)
            )
            match = cond if match is None else (match | cond)
        hits = (
            sidecar.filter(F.col("word_idx").isin(*need.keys()))
            .filter(match)
            .groupBy("file")
            .agg(F.countDistinct("word_idx").alias("n"))
            .filter(F.col("n") == len(need))
            .select("file")
            .collect()
        )
        return sorted(r["file"] for r in hits)

    def read_where(
        self, key_col: str, value, version: int | None = None
    ) -> DataFrame:
        """Point lookup: rows where ``key_col == value``, opening ONLY
        the files neither the Bloom index nor the zone map (a point is
        the range [value, value]) can rule out — the two sidecars
        prune complementary cases: Bloom catches values inside a
        file's min/max that simply aren't there, zone maps catch
        out-of-range values a saturated Bloom filter can't. Falls
        back to a full filtered scan when no index exists. False
        positives cost an extra file open, never a wrong row — the
        exact filter always applies."""
        v = self._read_version(version)
        files = self.files_for_key(key_col, value, v)
        try:
            rng = self.files_for_range(key_col, value, value, v)
        except (TypeError, KeyError):
            rng = None  # no stats / bound-type mismatch: Bloom only
        if files is None:
            files = rng
        elif rng is not None:
            keep = set(rng)
            files = [f for f in files if f in keep]
        pred = F.col(key_col).cast("string") == F.lit(str(value))
        if files is None:
            return self.read(v).filter(pred)
        # _read_files applies the version's deletion vectors — a
        # DV-deleted row must not reappear in a point lookup (raw
        # manifest: schema + dvs suffice)
        return self._read_files(files, self._raw_manifest(v)).filter(pred)

    SnapshotTable._index_path = _index_path
    SnapshotTable._index_meta_path = _index_meta_path
    SnapshotTable._IDX_CACHE_FILE_LIMIT = _IDX_CACHE_FILE_LIMIT
    SnapshotTable.build_file_index = build_file_index
    SnapshotTable.files_for_key = files_for_key
    SnapshotTable.read_where = read_where


_index_methods()


# ---------------------------------------------------------------------
# Zone maps: per-file min/max column statistics for RANGE-predicate
# file pruning — the data-skipping half the Bloom index (point lookups)
# doesn't cover, and the manifest-level twin of what Delta/Iceberg
# store as per-file stats. A parquet sidecar next to the manifests
# holds one (file, column) row with conservative [min, max] bounds and
# the null count; a range read opens only the files whose interval
# intersects the predicate. On a `write_clustered` layout that's a
# small constant fraction of the table; on a random layout it's every
# file — layout and stats together are the pruning story.
#
# Two build regimes:
#   method="footer" — ONE distributed pass over parquet FOOTERS only
#     (pyarrow metadata reads, ~KB per file): total I/O is O(files),
#     never O(data) — the million-file path. Requires the table root
#     to be worker-mountable as a local path (file:/, NFS, fuse); any
#     other scheme raises with guidance to use "scan".
#   method="scan" — one pure-Spark job over the data (groupBy file →
#     min/max/nulls), any Hadoop scheme. Reads the data once, like the
#     Bloom build. Both regimes produce IDENTICAL sidecar rows
#     (test-pinned) because they share one canonical value encoding.
#
# Canonical encoding (comparison-safe across build paths and probes):
#   numeric/boolean → double in min_num/max_num; long and decimal are
#     widened by a relative 1e-12 epsilon AFTER the (correctly-rounded)
#     double cast, so the bound stays conservative despite the cast —
#     widening is monotone, so widen(min(v)) == min(widen(v)) and the
#     two build regimes agree bit-for-bit.
#   string/date/timestamp → min_str/max_str as raw string / ISO
#     'yyyy-MM-dd' / fixed-width 'yyyy-MM-dd HH:mm:ss.ffffff' naive-UTC
#     — all three compare lexicographically in both Python (code
#     points) and Spark (UTF-8 bytes), which agree because UTF-8
#     preserves code-point order.
# A (file, column) row with NULL min/max and null_count == n_rows is an
# all-NULL file — PRUNABLE for any range predicate (ranges never match
# NULL). NULL min/max with NULL null_count means footer stats were
# missing — the file is conservatively kept. Files the sidecar doesn't
# mention at all (schema evolution: older files lack the column) are
# also kept. Parquet writers may truncate long binary stats; truncated
# bounds are widened by the writer, so pruning stays correct — the
# footer/scan equality contract is exact only for values shorter than
# the writer's truncation threshold. Float NaN min/max are recorded as
# missing stats (kept), matching the well-known NaN-ordering hazard.


_ZM_EPS_TYPES = {"bigint", "decimal"}  # widened after double cast
_ZM_NUM_TYPES = {
    "tinyint", "smallint", "int", "bigint", "float", "double", "boolean",
}


def _zm_kind(dt) -> str | None:
    """'num' / 'str' sidecar slot for a Spark type, None = unsupported
    (arrays, maps, structs, binary are not zone-mappable)."""
    s = dt.simpleString()
    if s in _ZM_NUM_TYPES or s.startswith("decimal"):
        return "num"
    if s in ("string", "date") or s.startswith("timestamp"):
        return "str"
    return None


def _zm_widen_lo(v: float) -> float:
    return v - max(abs(v) * 1e-12, 1e-300)


def _zm_widen_hi(v: float) -> float:
    return v + max(abs(v) * 1e-12, 1e-300)


def _zm_encode(value, dt):
    """Python-side canonical encoding of one value for column type
    ``dt`` — the exact twin of the Spark-side expressions in the scan
    build (shared contract documented above). Returns
    (kind, num_or_None, str_or_None)."""
    import datetime
    import decimal
    import math

    s = dt.simpleString()
    if value is None:
        return (_zm_kind(dt), None, None)
    if s in _ZM_NUM_TYPES or s.startswith("decimal"):
        if isinstance(value, bool):
            f = float(int(value))
        elif isinstance(value, (int, float, decimal.Decimal)):
            f = float(value)
        else:
            raise TypeError(f"unexpected {type(value)} for {s}")
        if math.isnan(f):
            return ("num", None, None)
        return ("num", f, None)
    if s == "date":
        if isinstance(value, datetime.date):
            return ("str", None, value.isoformat())
        return ("str", None, str(value))
    if s.startswith("timestamp"):
        if isinstance(value, datetime.date) and not isinstance(
            value, datetime.datetime
        ):
            # a date bound against a timestamp column means midnight —
            # encoding the bare date would sort BEFORE every same-day
            # timestamp string and wrongly prune a file whose min is
            # exactly midnight of the bound day
            value = datetime.datetime(value.year, value.month, value.day)
        if isinstance(value, datetime.datetime):
            if value.tzinfo is not None:
                value = value.astimezone(datetime.timezone.utc).replace(
                    tzinfo=None
                )
            # NOT strftime: glibc %Y does not zero-pad years < 1000, so
            # a dirty year-999 timestamp would sort AFTER year 2000 and
            # break the ordering contract (Spark's 'yyyy' pattern pads;
            # the Python twin must too — hypothesis-caught)
            return (
                "str",
                None,
                f"{value.year:04d}-{value.month:02d}-{value.day:02d} "
                f"{value.hour:02d}:{value.minute:02d}:"
                f"{value.second:02d}.{value.microsecond:06d}",
            )
        return ("str", None, str(value))
    return ("str", None, str(value))


def _zm_eps_widen(s: str) -> bool:
    return s == "bigint" or s.startswith("decimal")


def _zm_check_bound(value, dt, col: str) -> None:
    """Reject bound/column type mismatches LOUDLY. A numeric bound
    against a string column would prune by lexicographic stats while
    Spark's exact filter compares numerically after coercion — the
    two can disagree and silently drop matching files; better to make
    the caller cast explicitly."""
    import datetime
    import decimal

    s = dt.simpleString()
    if s in _ZM_NUM_TYPES or s.startswith("decimal"):
        ok = isinstance(
            value, (int, float, decimal.Decimal, bool)
        )
    elif s == "date":
        ok = isinstance(value, datetime.date) and not isinstance(
            value, datetime.datetime
        )
    elif s.startswith("timestamp"):
        ok = isinstance(value, datetime.date)  # date or datetime
    else:  # string
        ok = isinstance(value, str)
    if not ok:
        raise TypeError(
            f"bound {value!r} ({type(value).__name__}) does not match "
            f"column {col!r} of type {s}; cast the bound explicitly"
        )


def _stats_methods():
    """Attach the zone-map methods to SnapshotTable."""
    import os as _os

    def _zm_path(self, version: int):
        return self._p(
            f"{self.path}/{_MANIFEST_DIR}/stats-v{version:08d}.parquet"
        )

    def _zm_meta_path(self, version: int):
        return self._p(
            f"{self.path}/{_MANIFEST_DIR}/stats-v{version:08d}.meta.json"
        )

    def _zm_local_root(self) -> str:
        """Local-filesystem form of the table root for footer reads, or
        a loud error for non-mountable schemes."""
        p = self.path
        if p.startswith("file://"):
            p = p[len("file:/") + 1:]
            p = "/" + p.lstrip("/")
        elif p.startswith("file:"):
            p = p[len("file:"):]
        if "://" in p:
            raise ValueError(
                f"footer stats need a locally mountable root, got "
                f"{self.path!r}; use build_stats(method='scan') for "
                f"remote schemes"
            )
        return p

    # skip commit-time add-stamping past this many adds: footer reads
    # are driver-side, and a delta naming this many files is near the
    # "stores full instead" guard anyway
    _ADD_STAMP_MAX_FILES = 10_000

    def _add_stamps(self, raw: dict) -> dict | None:
        """Per-(file, column) bounds for a DELTA commit's adds, read
        from the parquet footers the commit just wrote — the stamps
        _files_pruned uses so manifest-tree range pruning survives
        long delta chains (VERDICT r12 item 1: adds used to replay as
        unconditional candidates, eroding the O(groups-touched) probe
        as deltas accumulated between checkpoints).

        Stamp shape: {file: {col: [kind, lo, hi, null_count, n_rows]}}
        with bounds in the canonical probe codec (_zm_encode: num =
        pre-widened float, str = rendered string), so probe-side
        comparison is exactly the group-stamp comparison. Gated on
        zone maps being LIVE for the table (a stats meta sidecar
        exists — its column set is the stamped set): tables that never
        built stats pay one listStatus per delta commit and nothing
        else. Conservative throughout: remote roots, unreadable
        footers, missing columns, kind mismatches, or unknown footer
        stats simply omit the stamp and the add stays a candidate."""
        adds = raw.get("adds") or []
        if not adds or len(adds) > self._ADD_STAMP_MAX_FILES:
            return None
        best = None
        mdir = self._p(f"{self.path}/{_MANIFEST_DIR}")
        try:
            for st in self._fs.listStatus(mdir):
                n = st.getPath().getName()
                if n.startswith("stats-v") and n.endswith(".meta.json"):
                    v = int(n[7:15])
                    if best is None or v > best:
                        best = v
        except Exception:
            return None
        if best is None:
            return None
        try:
            kinds = self._read_json(self._zm_meta_path(best)).get(
                "kinds", {}
            )
        except Exception:
            # stamps are an optimization: a corrupt/half-written stats
            # meta must degrade to unstamped adds, never fail a COMMIT
            return None
        if not kinds:
            return None
        try:
            root = self._zm_local_root()
        except ValueError:
            return None  # remote scheme: no footer fast path
        import pyarrow.parquet as papq

        schema = StructType.fromJson(json.loads(raw["schema"]))
        types = {f.name: f.dataType for f in schema.fields}
        stamps: dict[str, dict] = {}
        for rel in adds:
            try:
                md = papq.ParquetFile(_os.path.join(root, rel)).metadata
            except Exception:
                continue  # unreadable footer: candidate forever
            idx = {
                md.schema.column(i).name: i
                for i in range(md.num_columns)
            }
            per: dict[str, list] = {}
            for cname, kind in kinds.items():
                dt = types.get(cname)
                if dt is None or cname not in idx:
                    continue
                if _zm_kind(dt) != kind:
                    continue
                # fold row-group footer stats exactly like build_stats
                # method='footer' — same unknown/all-NULL handling
                lo = hi = None
                nulls = 0
                known = True
                for rg in range(md.num_row_groups):
                    cc = md.row_group(rg).column(idx[cname])
                    st = cc.statistics
                    if st is None or st.null_count is None:
                        known = False
                        break
                    nulls += st.null_count
                    if st.num_values == 0:
                        continue  # all-NULL row group
                    if not st.has_min_max:
                        known = False
                        break
                    _, n1, s1 = _zm_encode(st.min, dt)
                    _, n2, s2 = _zm_encode(st.max, dt)
                    if kind == "num" and (n1 is None or n2 is None):
                        known = False  # NaN stats
                        break
                    cur_lo = n1 if kind == "num" else s1
                    cur_hi = n2 if kind == "num" else s2
                    lo = cur_lo if lo is None else min(lo, cur_lo)
                    hi = cur_hi if hi is None else max(hi, cur_hi)
                if not known:
                    continue
                if (
                    kind == "num"
                    and lo is not None
                    and _zm_eps_widen(dt.simpleString())
                ):
                    lo = _zm_widen_lo(lo)
                    hi = _zm_widen_hi(hi)
                per[cname] = [kind, lo, hi, int(nulls), int(md.num_rows)]
            if per:
                stamps[rel] = per
        return stamps or None

    def _zm_colspec(self, schema: StructType, cols):
        fields = {f.name: f for f in schema.fields}
        if cols is None:
            picked = [
                (f.name, _zm_kind(f.dataType), f.dataType)
                for f in schema.fields
                if _zm_kind(f.dataType) is not None
            ]
        else:
            picked = []
            for c in cols:
                if c not in fields:
                    raise KeyError(f"no column {c!r} in table schema")
                k = _zm_kind(fields[c].dataType)
                if k is None:
                    raise TypeError(
                        f"column {c!r} of type "
                        f"{fields[c].dataType.simpleString()} is not "
                        f"zone-mappable"
                    )
                picked.append((c, k, fields[c].dataType))
        return picked

    def build_stats(
        self,
        cols: list[str] | None = None,
        version: int | None = None,
        method: str = "footer",
        incremental: bool = False,
    ) -> dict:
        """Build (or rebuild) the per-file zone-map sidecar for one
        version (head by default). ``cols`` defaults to every
        zone-mappable column. Returns {'files': n, 'rows': n}.

        The session timezone is pinned to UTC for the duration: the
        scan build renders timestamp bounds via date_format, whose
        timezone is baked in at DataFrame ANALYSIS time from the
        session conf, while the probe codec (_zm_encode) and the
        footer build render naive UTC.  Under a non-UTC session the
        sidecar strings would be wall-shifted and read_range would
        silently prune files that contain matching rows
        (advisor-reproduced under Asia/Kolkata, round 6).
        """
        _tz_key = "spark.sql.session.timeZone"
        _tz_prev = self.spark.conf.get(_tz_key)
        self.spark.conf.set(_tz_key, "UTC")
        try:
            return _build_stats_impl(
                self, cols, version, method, incremental
            )
        finally:
            self.spark.conf.set(_tz_key, _tz_prev)

    def _build_stats_impl(
        self,
        cols: list[str] | None = None,
        version: int | None = None,
        method: str = "footer",
        incremental: bool = False,
    ) -> dict:
        """build_stats body; caller holds the UTC session-tz pin.

        ``incremental=True`` reuses the NEWEST other version's sidecar
        (same column set): stats are computed only for files that
        version didn't cover, its rows for files still present carry
        over verbatim, and rows for files a MERGE/overwrite removed
        are dropped — per-commit maintenance cost is O(changed files),
        matching the commit protocol's O(new data) story. Falls back
        to a full build when no compatible base exists (different
        columns, or none built yet)."""
        if method not in ("footer", "scan"):
            raise ValueError(f"method must be footer/scan, got {method!r}")
        v = self._read_version(version)
        if v is None:
            raise ValueError(f"no commits yet at {self.path}")
        m = self._manifest(v)
        if not m["files"]:
            raise ValueError(f"version {v} has no data files")
        schema = StructType.fromJson(json.loads(m["schema"]))
        colspec = self._zm_colspec(schema, cols)
        if not colspec:
            raise ValueError("no zone-mappable columns")
        out_schema = (
            "file string, column string, min_num double, max_num double,"
            " min_str string, max_str string, null_count bigint,"
            " n_rows bigint"
        )
        target_files = list(m["files"])
        base_v = None
        base_files: set[str] = set()
        if incremental:
            want = sorted(c for c, _k, _dt in colspec)
            for u in reversed(self.versions()):
                if u == v:
                    continue
                mp = self._zm_meta_path(u)
                if self._fs.exists(mp):
                    bm = self._read_json(mp)
                    if sorted(bm["columns"]) == want:
                        base_v = u
                    # only the newest existing sidecar is a candidate —
                    # an older one with matching columns would silently
                    # redo work the newer one already carries
                    break
            if base_v is not None:
                base_files = set(self._manifest(base_v)["files"])
                target_files = [
                    f for f in m["files"] if f not in base_files
                ]
        if method == "footer":
            root = self._zm_local_root()
            spec = [(c, k, dt.json()) for c, k, dt in colspec]
            rels = self.spark.createDataFrame(
                [(r,) for r in target_files] or [("",)], "file string"
            ).filter(F.col("file") != "").repartition(
                max(1, min(len(target_files), 64))
            )

            def _footers(batches):
                import pandas as pd
                import pyarrow.parquet as pq
                from pyspark.sql.types import _parse_datatype_json_string

                types = {
                    c: _parse_datatype_json_string(dj) for c, k, dj in spec
                }
                for pdf in batches:
                    rows = []
                    for rel in pdf["file"]:
                        md = pq.ParquetFile(
                            _os.path.join(root, rel)
                        ).metadata
                        idx = {
                            md.schema.column(i).name: i
                            for i in range(md.num_columns)
                        }
                        for cname, kind, _dj in spec:
                            if cname not in idx:
                                continue  # evolved file: kept by probes
                            lo = hi = None
                            nulls: int | None = 0
                            known = True
                            for rg in range(md.num_row_groups):
                                cc = md.row_group(rg).column(idx[cname])
                                st = cc.statistics
                                nv = md.row_group(rg).num_rows
                                if st is None or st.null_count is None:
                                    known = False
                                    break
                                nulls += st.null_count
                                if st.num_values == 0:
                                    continue  # all-NULL row group
                                if not st.has_min_max:
                                    known = False
                                    break
                                _, n1, s1 = _zm_encode(
                                    st.min, types[cname]
                                )
                                _, n2, s2 = _zm_encode(
                                    st.max, types[cname]
                                )
                                if (
                                    kind == "num"
                                    and (n1 is None or n2 is None)
                                ):
                                    known = False  # NaN stats
                                    break
                                cur_lo = n1 if kind == "num" else s1
                                cur_hi = n2 if kind == "num" else s2
                                lo = (
                                    cur_lo
                                    if lo is None
                                    else min(lo, cur_lo)
                                )
                                hi = (
                                    cur_hi
                                    if hi is None
                                    else max(hi, cur_hi)
                                )
                            if not known:
                                lo = hi = None
                                nulls = None
                            ts = types[cname].simpleString()
                            if (
                                kind == "num"
                                and lo is not None
                                and _zm_eps_widen(ts)
                            ):
                                lo = _zm_widen_lo(lo)
                                hi = _zm_widen_hi(hi)
                            rows.append(
                                {
                                    "file": rel,
                                    "column": cname,
                                    "min_num": lo if kind == "num" else None,
                                    "max_num": hi if kind == "num" else None,
                                    "min_str": lo if kind == "str" else None,
                                    "max_str": hi if kind == "str" else None,
                                    "null_count": nulls,
                                    "n_rows": md.num_rows,
                                }
                            )
                    yield pd.DataFrame(
                        rows,
                        columns=[
                            "file", "column", "min_num", "max_num",
                            "min_str", "max_str", "null_count", "n_rows",
                        ],
                    )

            idx_df = rels.mapInPandas(_footers, out_schema)
        else:
            rel = F.concat(
                F.lit(f"{_DATA_DIR}/c-"),
                F.substring_index(
                    F.input_file_name(), f"/{_DATA_DIR}/c-", -1
                ),
            )
            if target_files:
                paths = [f"{self.path}/{r}" for r in target_files]
                df = (
                    self.spark.read.schema(schema)
                    .parquet(*paths)
                    .withColumn("__file", rel)
                )
            else:
                df = self.spark.createDataFrame(
                    [], schema
                ).withColumn("__file", F.lit(""))
            aggs = [F.count(F.lit(1)).alias("__n")]
            stack_parts = []
            for cname, kind, dt in colspec:
                ts = dt.simpleString()
                if kind == "num":
                    e = F.col(cname).cast("double")
                    if ts == "boolean":
                        e = F.col(cname).cast("int").cast("double")
                    lo_e, hi_e = e, e
                    if _zm_eps_widen(ts):
                        lo_e = e - F.greatest(
                            F.abs(e) * F.lit(1e-12), F.lit(1e-300)
                        )
                        hi_e = e + F.greatest(
                            F.abs(e) * F.lit(1e-12), F.lit(1e-300)
                        )
                    mn = F.min(lo_e)
                    mx = F.max(hi_e)
                    sn, sx = F.lit(None).cast("string"), F.lit(
                        None
                    ).cast("string")
                else:
                    if ts.startswith("timestamp"):
                        e = F.date_format(
                            F.col(cname), "yyyy-MM-dd HH:mm:ss.SSSSSS"
                        )
                    else:
                        e = F.col(cname).cast("string")
                    mn, mx = F.lit(None).cast("double"), F.lit(
                        None
                    ).cast("double")
                    sn, sx = F.min(e), F.max(e)
                aggs += [
                    mn.alias(f"__mn_{cname}"),
                    mx.alias(f"__mx_{cname}"),
                    sn.alias(f"__sn_{cname}"),
                    sx.alias(f"__sx_{cname}"),
                    (F.count(F.lit(1)) - F.count(F.col(cname))).alias(
                        f"__nc_{cname}"
                    ),
                ]
                stack_parts.append(
                    f"'{cname}', `__mn_{cname}`, `__mx_{cname}`,"
                    f" `__sn_{cname}`, `__sx_{cname}`, `__nc_{cname}`"
                )
            per_file = df.groupBy("__file").agg(*aggs)
            idx_df = per_file.select(
                F.col("__file").alias("file"),
                F.expr(
                    f"stack({len(colspec)}, {', '.join(stack_parts)}) as "
                    "(column, min_num, max_num, min_str, max_str,"
                    " null_count)"
                ),
                F.col("__n").alias("n_rows"),
            ).select(
                "file", "column", "min_num", "max_num", "min_str",
                "max_str", "null_count", "n_rows",
            )
        if base_v is not None:
            still = [f for f in m["files"] if f in base_files]
            keep = self.spark.createDataFrame(
                [(f,) for f in still] or [("",)], "file string"
            ).filter(F.col("file") != "")
            carried = (
                self.spark.read.parquet(
                    self._zm_path(base_v).toString()
                )
                .join(keep, "file")
                .select(
                    "file", "column", "min_num", "max_num", "min_str",
                    "max_str", "null_count", "n_rows",
                )
            )
            idx_df = idx_df.unionByName(carried)
        dest = self._zm_path(v)
        idx_df.coalesce(8).write.mode("overwrite").parquet(dest.toString())
        stats = (
            self.spark.read.parquet(dest.toString())
            .agg(
                F.countDistinct("file").alias("nf"),
                F.count(F.lit(1)).alias("nr"),
            )
            .collect()[0]
        )
        meta = {
            "version": v,
            "columns": [c for c, _k, _dt in colspec],
            "kinds": {c: k for c, k, _dt in colspec},
            "types": {c: dt.simpleString() for c, _k, dt in colspec},
            "n_files": len(m["files"]),
            "n_stat_files": int(stats["nf"]),
            "n_rows": int(stats["nr"]),
            "method": method,
            "base_version": base_v,
            "n_computed_files": len(target_files),
        }
        out = self._fs.create(self._zm_meta_path(v), True)
        try:
            out.write(json.dumps(meta, sort_keys=True).encode("utf-8"))
        finally:
            out.close()
        if hasattr(self, "_zm_cache"):
            self._zm_cache.pop(v, None)
        # fresh stats can tighten the manifest tree's group stamps —
        # restamp the version's manifest list so pruning benefits
        # apply to the EXISTING head, not just future checkpoints
        self._restamp_tree(v)
        return {"files": meta["n_stat_files"], "rows": meta["n_rows"]}

    _ZM_CACHE_FILE_LIMIT = 50_000
    # max versions whose sidecar rows one handle caches (LRU evicted)
    _ZM_CACHE_VERSIONS = 4

    def _zm_bounds(self, col, lo, hi, version):
        """Resolve (version, meta) and encode predicate bounds with the
        canonical codec; returns None if no sidecar for the version."""
        v = self._read_version(version)
        if v is None:
            raise ValueError(f"no commits yet at {self.path}")
        mp = self._zm_meta_path(v)
        if not self._fs.exists(mp):
            return None
        meta = self._read_json(mp)
        if col not in meta["kinds"]:
            return None
        # raw manifest: schema without inlining the file listing —
        # bound checks must not force an O(table-files) decode
        schema = StructType.fromJson(
            json.loads(self._raw_manifest(v)["schema"])
        )
        dt = {f.name: f.dataType for f in schema.fields}[col]
        for b in (lo, hi):
            if b is not None:
                _zm_check_bound(b, dt, col)
        # A NAIVE datetime bound against a session-tz TIMESTAMP column
        # is interpreted by Spark's exact filter in the SESSION
        # timezone, while the sidecar strings are UTC-rendered: under
        # a non-UTC session the pruning and the residual filter would
        # disagree and drop matching files.  tz-AWARE bounds pin an
        # instant and are safe under any session tz (both sides
        # convert to UTC); timestamp_ntz / date / numeric / string
        # columns are tz-insensitive.  Fail loudly instead of
        # mispruning (advisor finding, round 6).
        if dt.simpleString() == "timestamp":
            import datetime as _dtmod

            naive = any(
                isinstance(b, _dtmod.datetime) and b.tzinfo is None
                for b in (lo, hi)
                if b is not None
            )
            tz = self.spark.conf.get("spark.sql.session.timeZone")
            if naive and tz not in ("UTC", "Etc/UTC", "GMT", "Z"):
                raise ValueError(
                    f"naive datetime bound on timestamp column {col!r} "
                    f"under session timezone {tz!r}: zone-map pruning "
                    "encodes bounds in UTC while Spark's exact filter "
                    "would interpret the literal in the session "
                    "timezone — pass a tz-aware bound or set "
                    "spark.sql.session.timeZone=UTC"
                )
        _, lo_n, lo_s = (
            _zm_encode(lo, dt) if lo is not None else (None, None, None)
        )
        _, hi_n, hi_s = (
            _zm_encode(hi, dt) if hi is not None else (None, None, None)
        )
        kind = meta["kinds"][col]
        lo_e = lo_n if kind == "num" else lo_s
        hi_e = hi_n if kind == "num" else hi_s
        return v, meta, kind, lo_e, hi_e

    def files_for_range(
        self,
        col: str,
        lo=None,
        hi=None,
        version: int | None = None,
    ) -> list[str] | None:
        """Data files (relative paths) that MAY hold rows with
        ``lo <= col <= hi`` (either bound may be None for one-sided
        ranges) per the zone-map sidecar — or None when the version has
        no stats for this column. Conservative: files with missing or
        unknown stats are always candidates; all-NULL files are pruned
        (a range predicate never matches NULL). Small sidecars probe
        from a one-time driver cache (zero jobs per probe); above
        ``_ZM_CACHE_FILE_LIMIT`` files the prunable set comes from one
        pushdown-pruned Spark filter, flat in file count.

        Ceiling: the RESULT listing (candidates or prunables,
        whichever is smaller) still materializes on the driver as a
        Python list — fine through ~1M files (tens of MB); at 100M+
        files the scale-safe form is keeping the pruned listing AS a
        DataFrame and joining it into the scan, which this API's
        list-of-paths contract does not express. Documented limit,
        not a latent wrong answer."""
        r = self._zm_bounds(col, lo, hi, version)
        if r is None:
            return None
        v, meta, kind, lo_e, hi_e = r
        # manifest-tree fast path: decode only the groups the manifest
        # list's stamps cannot rule out — O(groups-touched) metadata;
        # falls back to the full listing on non-tree checkpoints
        pruned = self._files_pruned(v, col, kind, lo_e, hi_e)
        if pruned is None:
            m = self._manifest(v)
            listing, n_total = m["files"], len(m["files"])
        else:
            listing, n_total = pruned
        mn_c = "min_num" if kind == "num" else "min_str"
        mx_c = "max_num" if kind == "num" else "max_str"
        # instance lookup (falls back to the class attr): a per-handle
        # override forces the big-table Spark-probe regime
        if meta["n_files"] <= self._ZM_CACHE_FILE_LIMIT:
            # LRU across versions: a handle probing many versions
            # (time-travel sweeps) would otherwise hold every
            # version's sidecar rows forever (r6 advisory nit)
            import collections as _collections

            cache = getattr(self, "_zm_cache", None)
            if cache is None:
                cache = _collections.OrderedDict()
                self._zm_cache = cache
            rows = cache.get(v)
            if rows is None:
                rows = self.spark.read.parquet(
                    self._zm_path(v).toString()
                ).collect()
                cache[v] = rows
                while len(cache) > self._ZM_CACHE_VERSIONS:
                    cache.popitem(last=False)
            else:
                cache.move_to_end(v)
            prunable = set()
            for row in rows:
                if row["column"] != col:
                    continue
                if row[mn_c] is None:
                    if (
                        row["null_count"] is not None
                        and row["null_count"] == row["n_rows"]
                    ):
                        prunable.add(row["file"])  # all-NULL file
                    continue
                if (hi_e is not None and row[mn_c] > hi_e) or (
                    lo_e is not None and row[mx_c] < lo_e
                ):
                    prunable.add(row["file"])
            return [f for f in listing if f not in prunable]
        sidecar = self.spark.read.parquet(
            self._zm_path(v).toString()
        ).filter(F.col("column") == col)
        out_of_range = F.lit(False)
        if hi_e is not None:
            out_of_range = out_of_range | (F.col(mn_c) > F.lit(hi_e))
        if lo_e is not None:
            out_of_range = out_of_range | (F.col(mx_c) < F.lit(lo_e))
        all_null = F.col(mn_c).isNull() & (
            F.col("null_count") == F.col("n_rows")
        )
        # null-safe: a stats-missing row (NULL min/max AND NULL
        # null_count — "footer stats unreadable, conservatively keep")
        # makes all_null evaluate to SQL NULL, and ~NULL is NULL, so a
        # bare filter(~is_prunable) would silently DROP the file from
        # the candidate set. Coalesce to False: unknown stats == keep.
        is_prunable = F.coalesce(
            (F.col(mn_c).isNotNull() & out_of_range) | all_null,
            F.lit(False),
        )
        # collect whichever of prunable/candidates is SMALLER: a
        # selective predicate prunes nearly every file, and collecting
        # the prunable set would then pull almost the whole file list
        # to the driver (r6 advisory nit). The candidate-side collect
        # is only sound under FULL sidecar coverage (files without a
        # stats row must stay candidates, and only the prunable-side
        # walk keeps them implicitly) — one cheap count decides.
        counts = sidecar.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(is_prunable).alias("np"),
        ).collect()[0]
        full_cover = int(counts["n"]) == n_total
        if full_cover and int(counts["np"]) * 2 > int(counts["n"]):
            cand = {
                r["file"]
                for r in sidecar.filter(~is_prunable)
                .select("file")
                .collect()
            }
            return [f for f in listing if f in cand]
        prunable = {
            r["file"]
            for r in sidecar.filter(is_prunable).select("file").collect()
        }
        return [f for f in listing if f not in prunable]

    def read_range(
        self,
        col: str,
        lo=None,
        hi=None,
        version: int | None = None,
    ) -> DataFrame:
        """Range read: rows with ``lo <= col <= hi`` (inclusive; either
        bound may be None), opening ONLY the files the zone map cannot
        rule out — the range twin of ``read_where``. Falls back to a
        full filtered scan when no stats exist. Zone-map false
        positives cost an extra file open, never a wrong row — the
        exact filter always applies."""
        if lo is None and hi is None:
            raise ValueError("need at least one bound")
        v = self._read_version(version)
        pred = F.lit(True)
        if lo is not None:
            pred = pred & (F.col(col) >= F.lit(lo))
        if hi is not None:
            pred = pred & (F.col(col) <= F.lit(hi))
        files = self.files_for_range(col, lo, hi, v)
        if files is None:
            return self.read(v).filter(pred)
        # deletion vectors apply to pruned reads too (_read_files,
        # which needs only schema + dvs — the raw manifest, so a
        # tree-pruned read never inlines the full listing)
        return self._read_files(files, self._raw_manifest(v)).filter(pred)

    def read_box(
        self,
        predicates: list[tuple],
        version: int | None = None,
    ) -> DataFrame:
        """Multi-column range read: rows satisfying EVERY
        ``(col, lo, hi)`` predicate (inclusive; lo or hi may be None),
        opening only files in the INTERSECTION of the per-column
        zone-map candidate sets. On a `write_zordered` layout this is
        the payoff query — a 2-D box touches the few files whose
        interleaved key ranges cover it; on a lexicographic layout
        only the leading column prunes. Columns without stats simply
        don't prune (their candidate set is everything); the exact
        filter always applies."""
        if not predicates:
            raise ValueError("need at least one predicate")
        v = self._read_version(version)
        pred = F.lit(True)
        ordered: list[str] | None = None
        cand: set[str] | None = None
        for col, lo, hi in predicates:
            if lo is None and hi is None:
                raise ValueError(f"predicate on {col!r} needs a bound")
            if lo is not None:
                pred = pred & (F.col(col) >= F.lit(lo))
            if hi is not None:
                pred = pred & (F.col(col) <= F.lit(hi))
            files = self.files_for_range(col, lo, hi, v)
            if files is not None:
                if cand is None:
                    # each candidate list is in manifest order, so the
                    # first one orders the intersection — no full
                    # listing decode on a tree-pruned probe
                    ordered, cand = files, set(files)
                else:
                    cand &= set(files)
        if cand is None:
            return self.read(v).filter(pred)
        keep = [f for f in ordered if f in cand]
        # deletion vectors apply to pruned reads too (_read_files)
        return self._read_files(keep, self._raw_manifest(v)).filter(pred)

    SnapshotTable._zm_path = _zm_path
    SnapshotTable._zm_meta_path = _zm_meta_path
    SnapshotTable._zm_local_root = _zm_local_root
    SnapshotTable._ADD_STAMP_MAX_FILES = _ADD_STAMP_MAX_FILES
    SnapshotTable._add_stamps = _add_stamps
    SnapshotTable._zm_colspec = _zm_colspec
    SnapshotTable._zm_bounds = _zm_bounds
    SnapshotTable._ZM_CACHE_FILE_LIMIT = _ZM_CACHE_FILE_LIMIT
    SnapshotTable._ZM_CACHE_VERSIONS = _ZM_CACHE_VERSIONS
    SnapshotTable.build_stats = build_stats
    SnapshotTable.files_for_range = files_for_range
    SnapshotTable.read_range = read_range
    SnapshotTable.read_box = read_box


_stats_methods()
