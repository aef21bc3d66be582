"""Multi-table ATOMIC transactions over SnapshotTables — a minimal
two-phase-commit catalog.

Why this exists: the reference's ELT run rebuilds a fact table AND the
dimensions it joins to in one script (sql/ETL_GlobalWeather_DB.sql:
23-136 — five dims, then FACT_WEATHER built FROM them).  On Snowflake
that script runs inside one session and readers see the rebuild
transactionally; on a plain object store / HDFS, per-table atomic
commits (sources/snapshots.py) still leave a window where a dashboard
joins the NEW fact against an OLD dimension — the classic multi-table
publish anomaly.  Single-table formats punt on this (Delta and Iceberg
tables are each their own log; cross-table atomicity needs a catalog —
the public design of Nessie / Iceberg REST catalog / Hive ACID, which
this module re-derives from first principles, no external services).

Design — the transaction DECISION is one atomic file:

- A ``Catalog`` roots a directory of SnapshotTables (one subdirectory
  per table) plus a transaction log ``_txns/`` of decision records.
- ``begin()`` opens a ``Transaction``; ``txn.write(name, df, mode)``
  stages frames (lazily — nothing executes until commit).
- ``commit()`` runs two phases:
    1. STAGE: every table's data files are written first (the slow,
       size-proportional half — no manifests yet, so totally
       invisible); then each table publishes a manifest carrying
       ``txn: {id, log}`` — PENDING state.  Pending manifests are
       invisible to every read path and BLOCK other commits on that
       table (``ConcurrentTransactionError``) — the coarse per-table
       lock that makes the protocol serializable.
    2. DECIDE: one ``_txns/<id>.json`` record with
       ``status: committed`` is published by exclusive-create — the
       single atomic point.  The instant it exists, every staged
       manifest becomes visible everywhere; if it never appears, none
       of them ever do.  All-or-nothing with no coordinator process.
- Abort (explicit, crash, or force via ``Catalog.abort(txn_id)``)
  claims the SAME record path with ``status: aborted`` — commit and
  abort race through one exclusive-create arbitration, so exactly one
  decision ever exists — then sweeps the staged manifests (delete
  manifest, keep its version lock so the number stays burned, delete
  the staged data files).  The swept log has a version-number gap,
  exactly the shape a crashed single-table writer already leaves.

Crash matrix (all recoverable, none corrupting):
  - crash during STAGE: some tables hold pending manifests, decision
    record absent → readers unaffected; those tables refuse commits
    until ``Catalog.abort(txn_id)`` sweeps them.
  - crash between STAGE and DECIDE: same.
  - crash after DECIDE: committed; staged manifests are live state.
  - abort racing commit: one wins the record; the loser reads the
    decision and either sweeps (commit lost) or no-ops (abort lost).

Scale shape (100 TB): the decision record is O(tables-in-txn) bytes;
per-table costs are unchanged (data files + one manifest each — the
O(new data) commit contract of snapshots.py); readers pay one cached
JSON existence check per txn-staged manifest, and only until the
decision lands (committed is terminal and cached).  The pending window
other writers can collide with covers only manifest publishes — all
data-file writing happens before any table is locked.

``snapshot()`` additionally gives REPEATABLE cross-table reads: a
{table: version} pin taken with a verify loop over the decision log,
so the pinned set can never straddle a transaction's tables.
"""

from __future__ import annotations

import json
import re
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from .snapshots import (
    ConcurrentTransactionError,
    SnapshotTable,
    _fs,
)

__all__ = ["SnapshotCatalog", "Transaction", "ConcurrentTransactionError"]

_TXN_DIR = "_txns"
_NAME_RE = re.compile(r"^[A-Za-z0-9_.\-]+$")


class SnapshotCatalog:
    """A directory of SnapshotTables sharing one transaction log."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        self._fs, self._hroot, self._jvm = _fs(spark, self.root)
        self._fs.mkdirs(self._p(f"{self.root}/{_TXN_DIR}"))
        self._tables: dict[str, SnapshotTable] = {}

    def _p(self, s: str):
        return self._jvm.org.apache.hadoop.fs.Path(s)

    # ------------------------------------------------------- tables
    def table(self, name: str) -> SnapshotTable:
        """The named table (created on first touch), rooted at
        ``<root>/<name>``."""
        # the set() also rejects "." / ".." — dot-only names resolve
        # to the catalog root or its parent, a path escape
        if not _NAME_RE.match(name or "") or not set(name) - {"."}:
            raise ValueError(
                f"invalid table name {name!r} (letters, digits, _.- only)"
            )
        if name not in self._tables:
            self._tables[name] = SnapshotTable(
                self.spark, f"{self.root}/{name}"
            )
        return self._tables[name]

    def tables(self) -> list[str]:
        """Names of every table under the catalog root (a table is a
        directory with a ``_manifests`` log)."""
        out = []
        for st in self._fs.listStatus(self._p(self.root)):
            if not st.isDirectory():
                continue
            name = st.getPath().getName()
            if name == _TXN_DIR:
                continue
            if self._fs.exists(
                self._p(f"{self.root}/{name}/_manifests")
            ):
                out.append(name)
        return sorted(out)

    def register_views(
        self, prefix: str = "", snapshot: dict[str, int] | None = None
    ) -> dict[str, int | None]:
        """Register every catalog table as a Spark temp view
        ``<prefix><name>`` so plain ``spark.sql`` can query the
        warehouse — pinned at a CONSISTENT snapshot (a fresh
        ``snapshot()`` by default, or pass one), so a multi-statement
        SQL session can never observe half a transaction even while
        rebuilds race past it.  Returns the pinned versions;
        re-register to move to newer state."""
        pins = self.snapshot() if snapshot is None else dict(snapshot)
        for name, v in pins.items():
            if v is None:
                continue
            self.table(name).read(v).createOrReplaceTempView(
                f"{prefix}{name}"
            )
        return pins

    # ----------------------------------------------- decision log
    def _txn_log_path(self) -> str:
        return f"{self.root}/{_TXN_DIR}"

    def _rec_path(self, txn_id: str):
        return self._p(f"{self._txn_log_path()}/{txn_id}.json")

    def txn_status(self, txn_id: str) -> str:
        """'committed' / 'aborted' / 'pending' (no decision yet)."""
        p = self._rec_path(txn_id)
        if not self._fs.exists(p):
            return "pending"
        stream = self._fs.open(p)
        try:
            text = self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()
        return json.loads(text).get("status", "pending")

    def _write_decision(self, txn_id: str, record: dict) -> bool:
        """Publish the transaction's decision record by the same
        lock-then-rename arbitration snapshots.py uses for version
        manifests: the exclusive-create of ``<id>.json.lock`` is the
        single atomic arbiter, so of a racing commit and force-abort
        exactly ONE decision is ever recorded.  Returns False to the
        loser (record already claimed or published)."""
        dest = self._rec_path(txn_id)
        if self._fs.exists(dest):
            return False
        tmp = self._p(
            f"{self._txn_log_path()}/.tmp-{uuid.uuid4().hex}.json"
        )
        out = self._fs.create(tmp, False)
        try:
            out.write(
                json.dumps(
                    {**record, "decided_at": time.time()}, sort_keys=True
                ).encode("utf-8")
            )
        finally:
            out.close()
        lock = self._p(dest.toString() + ".lock")
        try:
            self._fs.create(lock, False).close()
        except Exception:
            self._fs.delete(tmp, False)
            if self._fs.exists(lock) or self._fs.exists(dest):
                return False
            raise
        ok = self._fs.rename(tmp, dest)
        if not ok:
            self._fs.delete(tmp, False)
        return ok

    # ------------------------------------------------ transactions
    def begin(self) -> "Transaction":
        return Transaction(self)

    def history(self) -> list[dict]:
        """The decision log, oldest first: one entry per decided
        transaction ({txn, status, decided_at, tables?, reason?}) —
        catalog-level DESCRIBE HISTORY.  Records vacuumed away by
        gc_decisions no longer appear (their manifests carry plain
        commit stamps by then)."""
        out = []
        for st in self._fs.listStatus(self._p(self._txn_log_path())):
            name = st.getPath().getName()
            if not name.endswith(".json") or name.startswith("."):
                continue
            stream = self._fs.open(st.getPath())
            try:
                text = self._jvm.org.apache.commons.io.IOUtils.toString(
                    stream, "UTF-8"
                )
            finally:
                stream.close()
            try:
                out.append(json.loads(text))
            except ValueError:
                continue  # half-written record: not decided yet
        return sorted(out, key=lambda r: r.get("decided_at") or 0.0)

    def abort(self, txn_id: str, reason: str = "force-abort") -> str:
        """Force-abort a (presumably abandoned) transaction: claim the
        decision record with ``aborted``, then sweep any staged
        pending manifests off the catalog's tables.  Returns the final
        status — 'committed' means the abort LOST the race and nothing
        was touched.  Safe to call repeatedly."""
        self._write_decision(
            txn_id, {"txn": txn_id, "status": "aborted", "reason": reason}
        )
        status = self.txn_status(txn_id)
        if status == "committed":
            return "committed"
        for name in self.tables():
            self._sweep_head(self.table(name), txn_id)
        return "aborted"

    def _sweep_head(self, t: SnapshotTable, txn_id: str) -> None:
        """Remove table ``t``'s head manifest if it is staged by
        ``txn_id``: manifest first (readers of the raw log stop
        resolving it), then its exclusive data files; the version lock
        stays so the number remains burned (the crashed-writer shape
        snapshots.py already allocates past)."""
        v = t.latest_version()
        if v is None:
            return
        try:
            m = t._manifest(v)
        except ValueError:
            return  # already swept by a concurrent abort
        tx = m.get("txn")
        if not tx or tx["id"] != txn_id:
            return
        parent_files: set[str] = set()
        parent_stores: set[str] = set()
        if m.get("parent") is not None:
            pm = t._manifest(m["parent"])
            parent_files = set(pm["files"])
            parent_stores = set((pm.get("dvs") or {}).get("stores", []))
        t._fs.delete(t._manifest_path(v), False)
        t._manifest_cache = {}
        for rel in m["files"]:
            if rel not in parent_files:
                t._fs.delete(t._p(f"{t.path}/{rel}"), False)
        # deletion-vector stores this version introduced (a staged
        # delete_where/merge-on-read) go with it
        for rel in (m.get("dvs") or {}).get("stores", []):
            if rel not in parent_stores:
                t._fs.delete(t._p(f"{t.path}/{rel}"), False)

    # ---------------------------------------- consistent snapshots
    def _txn_marker(self) -> tuple:
        """A cheap fingerprint of the decision log: the set of decided
        transaction ids.  Changes iff some transaction decides."""
        out = []
        for st in self._fs.listStatus(self._p(self._txn_log_path())):
            name = st.getPath().getName()
            # skip in-flight temp files — a half-written record is not
            # a decision, and counting one would only force spurious
            # snapshot() retries
            if name.endswith(".json") and not name.startswith("."):
                out.append(name)
        return tuple(sorted(out))

    def snapshot(
        self, names: list[str] | None = None, max_tries: int = 8
    ) -> dict[str, int | None]:
        """A {table: version} pin of the committed heads that is
        CONSISTENT with respect to multi-table transactions: the pins
        are re-taken until no transaction decided while they were
        being read, so the set can never mix one table's pre-txn state
        with another's post-txn state.  (Independent single-table
        writers are their own atomic units and need no coordination.)
        Read with ``table(name).read(version=pin[name])``."""
        names = self.tables() if names is None else list(names)
        for _ in range(max_tries):
            before = self._txn_marker()
            pins = {
                n: self.table(n).latest_visible_version() for n in names
            }
            if self._txn_marker() == before:
                return pins
        raise RuntimeError(
            "could not pin a consistent snapshot in "
            f"{max_tries} tries (transaction commit storm?)"
        )

    def write_batch(
        self,
        writes: dict[str, DataFrame],
        batch_id: int,
        mode: str = "append",
        parallelism: int = 1,
    ) -> dict[str, int] | None:
        """Exactly-once MULTI-TABLE commit for streaming foreachBatch
        sinks: all of ``writes`` {table: frame} land under one
        transaction stamped with ``batch_id``, so a replayed
        micro-batch after a checkpoint recovery can never land its
        rows twice on ANY of the tables — the cross-table extension of
        SnapshotTable.write_batch (single-table formats cannot give
        this: with one log per table, a crash between two sinks leaves
        batch N applied to one table and not the other; here the
        decision record makes the pair indivisible)::

            q = (stream.writeStream.foreachBatch(
                    lambda df, bid: cat.write_batch(
                        {"events": df,
                         "daily": daily_rollup(df)}, bid))
                 .start())

        Returns the {table: version} map, or None for a replay.
        Because the stamps commit atomically with the decision, a
        batch is stamped on either ALL target tables or none — the
        replay check on any one of them is complete.  Corollary (same
        as the single-table contract): one catalog sink pairs with ONE
        writing stream/checkpoint, with a stable table set."""
        if any(self.table(n)._batch_seen(batch_id) for n in writes):
            return None
        txn = self.begin()
        txn._extra = {"batch_id": batch_id}
        for name, df in writes.items():
            txn.write(name, df, mode=mode)
        return txn.commit(parallelism=parallelism)

    def vacuum(self, keep_last: int = 1, **kw) -> dict:
        """Run SnapshotTable.vacuum on every table (which also folds
        committed transaction tags into plain commit stamps), then GC
        decision records no stored manifest references any more.
        Returns per-table vacuum reports plus 'decisions_removed'."""
        reports = {
            name: self.table(name).vacuum(keep_last=keep_last, **kw)
            for name in self.tables()
        }
        reports["decisions_removed"] = self.gc_decisions()
        return reports

    def gc_decisions(self, min_age: float = 86400.0) -> int:
        """Delete decision records referenced by NO stored manifest of
        any catalog table and older than ``min_age`` seconds.

        A COMMITTED record is load-bearing while any manifest still
        carries its txn tag (visibility consults it), so only records
        every table has either swept (aborted) or tag-stripped
        (vacuum folds committed tags away) are candidates.  ``min_age``
        guards long-lived readers that resolved a manifest before the
        strip and would re-check the record later — set it beyond the
        longest-lived reader process, the same contract as vacuum's
        ``unreferenced_grace``."""
        referenced: set[str] = set()
        for name in self.tables():
            t = self.table(name)
            for v in t.versions():
                tx = t._manifest(v).get("txn")
                if tx is not None:
                    referenced.add(tx["id"])
        removed = 0
        horizon_ms = (time.time() - min_age) * 1000.0
        tdir = self._p(self._txn_log_path())
        for st in self._fs.listStatus(tdir):
            name = st.getPath().getName()
            if not name.endswith(".json"):
                continue
            txn_id = name[:-5]
            if txn_id in referenced:
                continue
            if st.getModificationTime() > horizon_ms:
                continue
            if self._fs.delete(st.getPath(), False):
                removed += 1
            self._fs.delete(
                self._p(f"{self._txn_log_path()}/{name}.lock"), False
            )
        return removed

    def snapshot_asof(
        self, ts: float, names: list[str] | None = None
    ) -> dict[str, int]:
        """A {table: version} pin AS OF wall-clock ``ts`` that is
        consistent with respect to multi-table transactions: every
        version of one transaction carries the SAME effective commit
        instant (the decision stamp — SnapshotTable.version_asof), so
        the pinned set is on one side of every transaction, never
        straddling it.  Historical counterpart of snapshot(); no
        verify loop needed because history is immutable."""
        names = self.tables() if names is None else list(names)
        return {n: self.table(n).version_asof(ts) for n in names}


class Transaction:
    """One atomic unit of staged writes across a Catalog's tables.
    Stage with ``write()`` (lazy — frames execute at commit), then
    ``commit()`` or ``abort()``.  Single-shot: a decided transaction
    refuses further use."""

    def __init__(self, catalog: SnapshotCatalog):
        self.catalog = catalog
        self.id = uuid.uuid4().hex
        self.state = "open"
        # name -> {"df", "mode"} (lazy) or {"mode", "files", "n",
        # "schema"} (eagerly staged); one staged write per table per
        # txn — the pending head-lock means a second could not publish
        self._staged: dict[str, dict] = {}
        # extra manifest fields stamped on EVERY table of this txn
        # (write_batch sets batch_id here for exactly-once streaming)
        self._extra: dict = {}

    def _guard_open(self) -> None:
        if self.state != "open":
            raise RuntimeError(
                f"transaction {self.id} is {self.state}, not open"
            )

    def _guard_stage(self, name: str, mode: str) -> None:
        self._guard_open()
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append/overwrite, got {mode!r}")
        if name in self._staged:
            raise ValueError(
                f"table {name!r} already staged in transaction "
                f"{self.id} — compose the frames and stage once"
            )
        self.catalog.table(name)  # validates the name eagerly

    def write(
        self, name: str, df: DataFrame, mode: str = "append"
    ) -> "Transaction":
        """Stage ``df`` as table ``name``'s part of this transaction
        ('append' or 'overwrite' — the CTAS full-rebuild shape).
        Lazy: the frame executes at commit()."""
        self._guard_stage(name, mode)
        self._staged[name] = {"df": df, "mode": mode}
        return self

    # --------------------------- staged rewrite verbs (ops)
    #
    # MERGE / DELETE / REPLACE WHERE compose into a transaction too —
    # each runs its single-table compute at commit time in
    # defer_publish mode (round 11): the probe + rewrite runs while NO
    # table of this transaction is pending, the prepared manifests
    # then publish back-to-back (metadata-only span, the same window
    # plain writes hold), and the decision flips them together.  A
    # racing plain writer therefore commits freely during a long
    # staged rewrite's compute; if it moves an op's head between
    # compute and publish, that op alone recomputes (validate-at-
    # decision — the optimistic-retry contract the single-table verbs
    # always had).  Cross-table all-or-nothing is unchanged.

    def replace_where(
        self, name: str, df: DataFrame, condition, **kw
    ) -> "Transaction":
        """Stage a predicate-scoped atomic overwrite of ``name`` (see
        SnapshotTable.replace_where) as part of this transaction."""
        self._guard_stage(name, "append")
        self._staged[name] = {
            "op": "replace_where", "args": (df, condition), "kw": kw,
        }
        return self

    def delete_where(self, name: str, condition, **kw) -> "Transaction":
        """Stage a merge-on-read delete on ``name`` (see
        SnapshotTable.delete_where) as part of this transaction."""
        self._guard_stage(name, "append")
        self._staged[name] = {
            "op": "delete_where", "args": (condition,), "kw": kw,
        }
        return self

    def merge_into(
        self, name: str, source: DataFrame, keys: list[str], **kw
    ) -> "Transaction":
        """Stage a MERGE into ``name`` (see SnapshotTable.merge_into)
        as part of this transaction."""
        self._guard_stage(name, "append")
        self._staged[name] = {
            "op": "merge_into", "args": (source, keys), "kw": kw,
        }
        return self

    def write_eager(
        self, name: str, df: DataFrame, mode: str = "overwrite"
    ) -> DataFrame:
        """Stage ``df``'s data files NOW (still invisible — no manifest
        exists until commit) and return a DataFrame reading them back.

        This is the transactional pipeline-breaker: a multi-statement
        ELT derives downstream tables FROM an upstream one (the
        reference's dims all read materialized staging, ETL:23-136);
        deriving from the lazy plan would re-execute the upstream
        lineage once per consumer.  Reading the staged files gives the
        materialization without publishing anything."""
        self._guard_stage(name, mode)
        t = self.catalog.table(name)
        files, n_new = t._stage_files(df)
        self._staged[name] = {
            "mode": mode, "files": files, "n": n_new, "schema": df.schema,
        }
        if not files:  # empty frame can write zero part files
            return self.catalog.spark.createDataFrame([], df.schema)
        return self.catalog.spark.read.schema(df.schema).parquet(
            *[f"{t.path}/{rel}" for rel in files]
        )

    def _stage_all(self, parallelism: int) -> None:
        """Phase 1a: run every still-lazy frame's data-file write (the
        slow, size-proportional half — no locks taken, nothing
        visible).  With ``parallelism > 1`` independent tables' write
        jobs are submitted concurrently — Spark's scheduler interleaves
        them, exactly the concurrent-CTAS shape plans/pipeline.py uses
        for the dims; on a cluster serializing them just stacks driver
        round-trips."""
        lazy = [
            (name, p) for name, p in self._staged.items() if "df" in p
        ]
        if not lazy:
            return

        def _one(name: str, p: dict) -> None:
            t = self.catalog.table(name)
            files, n_new = t._stage_files(p["df"])
            p.update(files=files, n=n_new, schema=p["df"].schema)

        # tables are created serially first: Catalog.table() caches
        for name, _ in lazy:
            self.catalog.table(name)
        if parallelism > 1 and len(lazy) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(parallelism, len(lazy))
            ) as pool:
                futs = [pool.submit(_one, name, p) for name, p in lazy]
                for f in futs:
                    f.result()
        else:
            for name, p in lazy:
                _one(name, p)

    def commit(self, parallelism: int = 1) -> dict[str, int] | None:
        """Run the two-phase publish; returns {table: version} of the
        now-visible commits, or None when a batch-stamped transaction
        detects a replay (write_batch).  Raises
        ConcurrentTransactionError if a table's head is held by
        another pending transaction or this transaction was
        force-aborted mid-flight — in either case nothing of this
        transaction remains visible.  ``parallelism`` stages
        independent tables' data files concurrently."""
        self._guard_open()
        if not self._staged:
            self.catalog._write_decision(
                self.id, {"txn": self.id, "status": "committed",
                          "tables": {}}
            )
            self.state = "committed"
            return {}
        txn_field = {
            **self._extra,
            "txn": {"id": self.id, "log": self.catalog._txn_log_path()},
        }
        published: dict[str, int] = {}
        try:
            self._stage_all(parallelism)
            # staged rewrite verbs COMPUTE first without publishing
            # (defer_publish — round 11): every op's probe + rewrite
            # runs while no table of this transaction is pending, so
            # racing plain writers stay unblocked for the whole slow
            # half; only the back-to-back manifest publishes below
            # open pending windows (metadata-only span, like plain
            # writes).  If a racing commit moves an op's head between
            # its compute and its publish, that op alone recomputes
            # through its normal self-publishing path (the optimistic
            # retry the single-table verbs always had).
            prepared: dict[str, dict] = {}
            for name, p in self._staged.items():
                if "op" not in p:
                    continue
                t = self.catalog.table(name)
                prepared[name] = getattr(t, p["op"])(
                    *p["args"], manifest_extra=txn_field,
                    defer_publish=True, **p["kw"]
                )
            # phase 1b — publish pending manifests (metadata-only
            # window; this is the only span other writers collide with)
            for name, prep in prepared.items():
                t = self.catalog.table(name)
                if not prep.get("prepared"):
                    # no-op shape (nothing matched) or bootstrap write:
                    # already resolved to a version, nothing pending
                    published[name] = prep["version"]
                    continue
                if t._publish_manifest(prep["manifest"], prep["target"]):
                    published[name] = prep["target"]
                    continue
                # a racing commit landed during our compute — the
                # desired concurrency; recompute this op against the
                # new head (its first attempt's staged files are
                # unreferenced, vacuum's to reclaim)
                p = self._staged[name]
                res = getattr(t, p["op"])(
                    *p["args"], manifest_extra=txn_field, **p["kw"]
                )
                published[name] = res["version"]
            for name, p in self._staged.items():
                if "op" in p:
                    continue
                t = self.catalog.table(name)
                published[name] = t._commit_new_files(
                    p["files"], p["n"], p["schema"], p["mode"],
                    manifest_extra=txn_field,
                )
        except BaseException:
            self._undo(published)
            self.state = "aborted"
            self.catalog._write_decision(
                self.id,
                {"txn": self.id, "status": "aborted",
                 "reason": "stage failure"},
            )
            raise
        # streaming replay re-check, mirroring write_batch's inside-
        # the-loop check: every staged head is now locked by US, so if
        # the batch stamp appears on a VISIBLE head (a racing replay
        # decided between our entry check and here), backing out now
        # is race-free — and if it does not, nothing can stamp it
        # before our decision lands
        bid = self._extra.get("batch_id")
        if bid is not None and any(
            self.catalog.table(n)._batch_seen(bid) for n in self._staged
        ):
            self._undo(published)
            self.state = "aborted"
            self.catalog._write_decision(
                self.id,
                {"txn": self.id, "status": "aborted",
                 "reason": f"batch {bid} replay"},
            )
            return None
        # phase 2 — the atomic decision
        won = self.catalog._write_decision(
            self.id,
            {"txn": self.id, "status": "committed", "tables": published},
        )
        if not won and self.catalog.txn_status(self.id) != "committed":
            # a force-abort beat us to the record: honor it
            self._undo(published)
            self.state = "aborted"
            raise ConcurrentTransactionError(
                f"transaction {self.id} was force-aborted before its "
                "commit decision"
            )
        self.state = "committed"
        return published

    def abort(self) -> None:
        """Record the abort decision and discard anything staged.  A
        transaction that lost its commit race is already aborted;
        calling again is a no-op."""
        if self.state == "aborted":
            return
        self._guard_open()
        self.catalog._write_decision(
            self.id,
            {"txn": self.id, "status": "aborted", "reason": "abort()"},
        )
        # nothing is published in the lazy path; sweep defensively in
        # case a partial commit() escaped (e.g. KeyboardInterrupt),
        # then drop any eagerly-staged (never-referenced) data files
        for name in self._staged:
            self.catalog._sweep_head(self.catalog.table(name), self.id)
        self._undo({})
        self.state = "aborted"

    def _undo(self, published: dict[str, int]) -> None:
        """Roll back: sweep published pending manifests (which deletes
        their files), then delete staged-but-never-published data
        files by their commit directories."""
        for name in published:
            self.catalog._sweep_head(self.catalog.table(name), self.id)
        for name, p in self._staged.items():
            if name in published or "files" not in p:
                continue
            t = self.catalog.table(name)
            dirs = {rel.rsplit("/", 1)[0] for rel in p["files"]}
            for d in dirs:
                t._fs.delete(t._p(f"{t.path}/{d}"), True)

    # context-manager sugar: commit on clean exit, abort on exception
    def __enter__(self) -> "Transaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        if exc_type is None and self.state == "open":
            self.commit()
        elif self.state == "open":
            self.abort()
        return False
