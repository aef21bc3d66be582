"""Rotating localCheckpoint for iterative loops — free the PREVIOUS
round's checkpoint blocks once the new round has materialized.

Every iterative operator here (PageRank, connected components, the
exact Lloyd loop) truncates per-round lineage with
``localCheckpoint(eager=True)``. Spark never releases those blocks on
its own until the backing JVM objects are garbage-collected and the
ContextCleaner gets around to them — so a loop quietly accumulates
one O(state) cached copy PER ROUND. Harmless at toy scale, a real
executor-memory leak at 100 TB (20 PageRank rounds = 20 live copies
of the rank table), and reproducibly an OOM in the 2M-edge rehearsal
when the float and exact paths run back-to-back in one 1g-driver
local JVM.

``CheckpointRotator.rotate(build)`` runs ``build()`` (which must
materialize this round's checkpoints eagerly AND any value computed
from the previous round's frames — after rotate returns, the previous
round's blocks are gone and a local checkpoint cannot be recomputed
from lineage), diffs the persistent-RDD id set to learn which blocks
this round created, and unpersists the ids the PREVIOUS rotate
recorded. Blocks created before the first rotate (seed frames the
whole loop reads, e.g. the edge table) are never touched.

Single-loop assumption: the id-set diff attributes every
persistent-RDD id created during ``build()`` to this round — true for
the single-threaded driver loops here, not for concurrent jobs
persisting frames on the same session; don't share one session
between a rotating loop and a concurrent persisting job.
"""

from __future__ import annotations

import threading
from typing import Callable, TypeVar

T = TypeVar("T")

__all__ = ["CheckpointRotator", "concurrent_local_checkpoint"]

# RDD ids that a rotating loop must never attribute to a round or
# unpersist: checkpoints created CONCURRENTLY with a loop (guide §2.6
# job overlap) would otherwise land in the loop's created-id diff and
# be freed on the next rotate — and a freed local checkpoint cannot be
# recomputed. Pinned BEFORE the block materializes (the lazy
# localCheckpoint registers its RDD id in persistentRDDs immediately),
# so no rotate can ever see the block unpinned.
_PINNED: set[int] = set()
_PIN_LOCK = threading.Lock()


def concurrent_local_checkpoint(df):
    """localCheckpoint(df) that is safe to run concurrently with a
    CheckpointRotator loop on the same session: the checkpoint's own
    RDD id (read off the LogicalRDD the lazy checkpoint analyzes to)
    is pinned before the blocks materialize, and rotate() skips pinned
    ids both when attributing a round's created blocks and when
    unpersisting. Returns the materialized checkpointed DataFrame."""
    ck = df.localCheckpoint(eager=False)
    rid = int(ck._jdf.queryExecution().analyzed().rdd().id())
    with _PIN_LOCK:
        _PINNED.add(rid)
    ck.count()  # materialize: computes + persists the LogicalRDD blocks
    return ck


class CheckpointRotator:
    def __init__(self, spark) -> None:
        self._jsc = spark.sparkContext._jsc
        self._prev: set[int] = set()

    def _ids(self) -> set[int]:
        return {int(k) for k in self._jsc.getPersistentRDDs().keys()}

    def rotate(self, build: Callable[[], T]) -> T:
        """Run one round; free the previous round's checkpoint blocks.

        ``build`` must leave nothing lazily depending on the PREVIOUS
        round's checkpointed frames (local checkpoints drop lineage —
        an unpersisted one cannot be rebuilt)."""
        before = self._ids()
        out = build()
        with _PIN_LOCK:
            pinned = set(_PINNED)
        created = self._ids() - before - pinned
        m = self._jsc.getPersistentRDDs()
        for k in self._prev:
            if k in m and k not in pinned:
                m[k].unpersist(False)
        self._prev = created
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
