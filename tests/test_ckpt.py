"""CheckpointRotator exact attribution (round 14): a rotating loop
frees exactly its own previous round's blocks — never a block
persisted or checkpointed concurrently by someone else."""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.ckpt import (
    CheckpointRotator,
    concurrent_local_checkpoint,
)


def _persistent_ids(spark) -> set[int]:
    return {
        int(k)
        for k in spark.sparkContext._jsc.getPersistentRDDs().keys()
    }


def test_rotate_frees_only_own_previous_round(spark):
    rot = CheckpointRotator(spark)
    base = spark.range(100).select(F.col("id").alias("v"))

    def round1():
        return rot.checkpoint(base.select((F.col("v") + 1).alias("v")))

    r1 = rot.rotate(round1)
    ids_r1 = rot._prev
    assert len(ids_r1) == 1
    assert ids_r1 <= _persistent_ids(spark)

    # a bystander block created between rounds (e.g. a concurrent
    # thread's cache) must survive every subsequent rotate. Capture
    # ONLY its own id (additive diff around the persist): snapshotting
    # all live ids would race the ContextCleaner unpersisting other
    # tests' leaked blocks in a shared session.
    before_bystander = _persistent_ids(spark)
    bystander = base.select((F.col("v") * 2).alias("v")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    bystander.count()
    bystander_ids = _persistent_ids(spark) - before_bystander
    assert bystander_ids  # the persist registered at least its own id

    def round2():
        # the bystander id lands inside this build window too — the
        # old global-diff rotator would have attributed it to round 2
        # and freed it on round 3's rotate
        ck = concurrent_local_checkpoint(
            base.select((F.col("v") * 3).alias("v"))
        )
        assert ck.count() == 100
        return rot.checkpoint(r1.select((F.col("v") + 1).alias("v")))

    r2 = rot.rotate(round2)
    # round 1's block is gone, round 2's is live
    live = _persistent_ids(spark)
    assert not (ids_r1 & live)
    assert rot._prev <= live and len(rot._prev) == 1

    def round3():
        return rot.checkpoint(r2.select((F.col("v") + 1).alias("v")))

    r3 = rot.rotate(round3)
    live = _persistent_ids(spark)
    # bystander survived two rotates; the final frame still reads
    assert bystander_ids <= live
    assert sorted(r["v"] for r in r3.collect()) == [
        v + 3 for v in range(100)
    ]
    ids_r3 = set(rot._prev)
    rot.release()
    assert not (ids_r3 & _persistent_ids(spark))
    bystander.unpersist()


def test_rotated_loop_result_correct(spark):
    # 5 rotated increments over a checkpointed state: the final frame
    # must read v+5 even though every superseded checkpoint was freed
    rot = CheckpointRotator(spark)
    state = spark.range(10).select(F.col("id").alias("v"))
    for _ in range(5):
        def _round(prev=state):
            ck = rot.checkpoint(
                prev.select((F.col("v") + 1).alias("v")), eager=False
            )
            ck.count()  # materialize IN-round, per the contract
            return ck

        state = rot.rotate(_round)
    got = sorted(r["v"] for r in state.collect())
    assert got == list(range(5, 15))
