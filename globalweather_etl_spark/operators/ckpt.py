"""Rotating localCheckpoint for iterative loops — free the PREVIOUS
round's checkpoint blocks once the new round has materialized.

Every iterative operator here (PageRank, connected components)
truncates per-round lineage with ``localCheckpoint``. Spark never
releases those blocks on its own until the backing JVM objects are
garbage-collected and the ContextCleaner gets around to them — so a
loop quietly accumulates one O(state) cached copy PER ROUND. Harmless
at toy scale, a real executor-memory leak at 100 TB (20 PageRank
rounds = 20 live copies of the rank table), and reproducibly an OOM in
the 2M-edge rehearsal when the float and exact paths run back-to-back
in one 1g-driver local JVM.

Round 14 redesign — EXACT attribution. The round-13 rotator diffed the
global persistent-RDD id set around each ``build()``, which
misattributes any block persisted CONCURRENTLY with a round (guide
§2.6 job overlap: e.g. q_docs_decontaminate's screen threads persist
shingle-index caches while curation's CC loop rotates) and then frees
it one round later — a silent cache loss for a ``persist()``, a
corrupted frame for a ``localCheckpoint`` (truncated lineage cannot
recompute). Now each round's checkpoints are created THROUGH
``rotator.checkpoint(df)``, which records exactly the checkpointed
plan's own RDD id (read off the LogicalRDD the checkpoint analyzes
to) — rotate() frees precisely the previous round's recorded ids and
touches nothing else. Multiple rotating loops and arbitrary concurrent
persists/checkpoints on one session are all safe.
"""

from __future__ import annotations

from typing import Callable, TypeVar

T = TypeVar("T")

__all__ = ["CheckpointRotator", "concurrent_local_checkpoint"]


def _checkpoint_rdd_id(ck_df) -> int:
    """The RDD id a (possibly lazy) Dataset.localCheckpoint persists:
    the checkpointed frame analyzes to a LogicalRDD wrapping exactly
    the internal RDD that was marked persistent (registered in
    persistentRdds at the localCheckpoint call, before any block
    materializes)."""
    return int(ck_df._jdf.queryExecution().analyzed().rdd().id())


def concurrent_local_checkpoint(df):
    """Materialized localCheckpoint(df), safe to run from a worker
    thread concurrently with anything else on the session (rotating
    loops included — rotate() only ever frees ids it recorded itself).
    Lazy checkpoint + count() keeps it ONE job: the count both
    computes and persists the LogicalRDD's blocks."""
    ck = df.localCheckpoint(eager=False)
    ck.count()
    return ck


class CheckpointRotator:
    def __init__(self, spark) -> None:
        self._jsc = spark.sparkContext._jsc
        self._prev: set[int] = set()
        self._cur: set[int] = set()

    def checkpoint(self, df, eager: bool = True):
        """localCheckpoint ``df`` and record its RDD id as belonging
        to the rotation round currently being built. With
        ``eager=False`` the caller's next action on the returned frame
        materializes the blocks (do that INSIDE the same build —
        after rotate returns, the previous round is gone and a local
        checkpoint cannot be recomputed from lineage)."""
        ck = df.localCheckpoint(eager=eager)
        self._cur.add(_checkpoint_rdd_id(ck))
        return ck

    def rotate(self, build: Callable[[], T]) -> T:
        """Run one round; free the previous round's checkpoint blocks.

        ``build`` must create this round's checkpoints via
        ``self.checkpoint(...)`` and must leave nothing lazily
        depending on the PREVIOUS round's checkpointed frames."""
        self._cur = set()
        out = build()
        m = self._jsc.getPersistentRDDs()
        for k in self._prev:
            if k in m:
                m[k].unpersist(False)
        self._prev = self._cur
        self._cur = set()
        return out

    def release(self) -> None:
        """Free the LAST round's blocks too — call only when the
        loop's final frames have been fully consumed (or were copied
        out of checkpoint storage)."""
        m = self._jsc.getPersistentRDDs()
        for k in self._prev:
            if k in m:
                m[k].unpersist(False)
        self._prev = set()
