"""Incremental view maintenance (IVM): a continuously-maintained
GROUP BY aggregate over a snapshot table — the "continuous aggregate"
/ materialized-view-refresh feature every warehouse grows.

The reference recomputes its dashboard aggregates from scratch on
every run (sql/Dashboard.sql:1-45 over the full fact table); at
100 TB a full recompute per refresh is the thing you cannot do. The
standard fix (public background: the classic self-maintainable-view
literature and every streaming-materialized-view product) is to keep
the aggregate in MERGEABLE PARTIAL form and fold each new batch in:

  state(group) = (count, sum, min, max, ...)   -- partials, not finals
  refresh(batch) = merge(state, partial(batch))  keyed by group

Supported measures: count, sum, min, max, avg — the self-maintainable
set under INSERT-ONLY ingestion (deletes/updates would need full
multiset state for min/max; apply_batch therefore models append
streams, the micro-batch case, and says so loudly). sum/avg partials
accumulate in DECIMAL(25,6) so merge order can never change the
result — the repo-wide exact_avg argument — which makes the state
bit-identical to a from-scratch recompute (tested, not just close).

Round 6 adds the RETRACTION path: ``apply_batch_cdc`` folds a batch
carrying an ``__op`` column (+1 insert / -1 delete; an update is the
delete of the old row plus the insert of the new one — exactly the
change stream a MERGE INTO upsert source induces).  count/sum/avg are
self-maintainable under retraction (partials become op-weighted sums);
min/max and approx_distinct are NOT (a retracted maximum would need
the full value multiset to find its successor) and are rejected
loudly.  Every state row also carries a hidden ``__live`` net-row
counter; a group retracted to zero rows is DELETED from the state in
the same atomic commit (merge_into's WHEN MATCHED AND __live=0 THEN
DELETE arm), so the state table never accumulates ghost groups.

Plus approx_distinct: COUNT(DISTINCT x) is famously NOT
self-maintainable exactly (the state would be the value set itself),
but the portable-HLL register form (operators/sketches.py) IS — the
measure keeps 2^6 per-group registers in ONE array<int> column whose
merge is element-wise max (a zip_with fold; round 8 moved off 64 flat
columns, whose whole-stage codegen compiled ~2 s per distinct fold
plan), so the incremental estimate EXACTLY equals the from-scratch
sketch over all data regardless of batch slicing, with the sketch's
~13%% standard error on the value itself.

Scale shape per refresh:
  partial(batch)   one map-side-combinable hash aggregate, O(batch)
  merge            SnapshotTable.merge_into with source = the merged
                   partials of ONLY the groups present in the batch —
                   file-level copy-on-write pruning rewrites just the
                   data files those groups live in; the rest of the
                   state rides the manifest by reference
  read()           finalize (avg = sum/count) over the state table —
                   O(groups), never touches the raw facts

Exactly-once: pass batch_id (foreachBatch's argument) and replays are
skipped via the manifest stamp, the same contract as
SnapshotTable.write_batch.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.dedup import _md5_long
from globalweather_etl_spark.sources.snapshots import SnapshotTable

__all__ = ["Measure", "IncrementalAggregate"]

_KINDS = ("count", "sum", "min", "max", "avg", "approx_distinct")
_HLL_B = 6  # 64 registers -> ~13% standard error; fixed so states merge


@dataclass(frozen=True)
class Measure:
    """One output column of the maintained aggregate."""

    name: str
    kind: str  # count | sum | min | max | avg
    col: str | None = None  # source column (None only for count)

    def __post_init__(self):
        if self.kind not in _KINDS:
            raise ValueError(f"kind must be one of {_KINDS}: {self.kind!r}")
        if self.kind != "count" and not self.col:
            raise ValueError(f"measure {self.name!r}: kind {self.kind} "
                             "needs a source column")


class IncrementalAggregate:
    """A (group_cols -> measures) aggregate maintained incrementally in
    a SnapshotTable at ``path``. See module docstring."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        group_cols: list[str],
        measures: list[Measure],
    ):
        if not group_cols:
            raise ValueError("group_cols must be non-empty")
        if not measures:
            raise ValueError("measures must be non-empty")
        names = [m.name for m in measures]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate measure names: {names}")
        self.group_cols = list(group_cols)
        self.measures = list(measures)
        self.table = SnapshotTable(spark, path)

    # ---------------------------------------------------- partial state
    def _partial_aggs(self):
        # __live: net row count per group — insert-only batches count
        # rows, CDC batches sum ops; a group at 0 is dropped from state
        aggs = [F.count(F.lit(1)).cast("long").alias("__live")]
        for m in self.measures:
            if m.kind == "count":
                aggs.append(
                    F.count(F.lit(1)).cast("long").alias(f"__{m.name}_cnt")
                )
            elif m.kind in ("sum", "avg"):
                # pin the widened sum type back to DECIMAL(25,6) so the
                # state schema is identical on first commit and merges
                aggs.append(
                    F.sum(F.col(m.col).cast("decimal(25,6)"))
                    .cast("decimal(25,6)")
                    .alias(f"__{m.name}_sum")
                )
                if m.kind == "avg":
                    aggs.append(
                        F.count(F.col(m.col))
                        .cast("long")
                        .alias(f"__{m.name}_cnt")
                    )
            elif m.kind == "min":
                aggs.append(F.min(m.col).alias(f"__{m.name}_min"))
            elif m.kind == "approx_distinct":
                pass  # registers ride the two-stage path in _partial
            else:
                aggs.append(F.max(m.col).alias(f"__{m.name}_max"))
        return aggs

    def _merge_aggs(self, include_hll: bool = True):
        aggs = [F.sum("__live").cast("long").alias("__live")]
        for m in self.measures:
            if m.kind == "approx_distinct" and not include_hll:
                continue
            if m.kind == "count":
                aggs.append(
                    F.sum(f"__{m.name}_cnt").cast("long").alias(
                        f"__{m.name}_cnt"
                    )
                )
            elif m.kind in ("sum", "avg"):
                aggs.append(
                    F.sum(F.col(f"__{m.name}_sum").cast("decimal(25,6)"))
                    .cast("decimal(25,6)")
                    .alias(f"__{m.name}_sum")
                )
                if m.kind == "avg":
                    aggs.append(
                        F.sum(f"__{m.name}_cnt").cast("long").alias(
                            f"__{m.name}_cnt"
                        )
                    )
            elif m.kind == "min":
                aggs.append(F.min(f"__{m.name}_min").alias(f"__{m.name}_min"))
            elif m.kind == "approx_distinct":
                # element-wise register max across the (few) partial
                # rows per group — a collect_list fold, NOT 64 agg
                # columns: the array form keeps the generated code
                # small (the 64-column form made every fold's
                # whole-stage codegen compile for ~2 s, round 8).
                # collect_list skips NULL arrays (the CDC slice's
                # null-fill), and an all-NULL group folds to the empty
                # sketch (all-zero registers).
                c = f"__{m.name}_regs"
                aggs.append(
                    F.aggregate(
                        F.collect_list(F.col(c)),
                        _hll_zero_regs(),
                        lambda acc, x: F.zip_with(
                            acc, x, lambda a, b: F.greatest(a, b)
                        ),
                    ).alias(c)
                )
            else:
                aggs.append(F.max(f"__{m.name}_max").alias(f"__{m.name}_max"))
        return aggs

    def _partial(self, df: DataFrame) -> DataFrame:
        """Partial state of one batch. approx_distinct measures make
        this TWO aggregate stages: stage 1 groups by (group_cols,
        bucket) taking max(rho) — map-side combinable, at most
        64x|groups| cells — and stage 2 re-merges the other measures'
        partials (they are mergeable by construction, the module's
        core invariant) while assembling the 64 per-bucket maxima
        into ONE array<int> register column. One extra tiny exchange
        buys compact codegen everywhere downstream (state schema,
        merges, unions): the flat 64-column form compiled ~2 s of
        generated code per distinct fold plan (round 8)."""
        hll = [m for m in self.measures if m.kind == "approx_distinct"]
        if not hll:
            return df.groupBy(*self.group_cols).agg(*self._partial_aggs())
        if len(hll) == 1:
            m = hll[0]
            bucket, rho = _hll_bucket_rho(m)
            s1 = (
                df.select(
                    "*", bucket.alias("__hb"), rho.alias("__hr")
                )
                .groupBy(*self.group_cols, "__hb")
                .agg(*self._partial_aggs(), F.max("__hr").alias("__hr"))
            )
            s2 = s1.groupBy(*self.group_cols).agg(
                *self._merge_aggs(include_hll=False),
                _hll_map_agg(m),
            )
            return s2.select(
                *[c for c in s2.columns if c != f"__{m.name}_map"],
                _hll_map_to_regs(m),
            )
        # k distinct sketch columns: per-measure bucket stages joined
        # back on the group keys (left join + zero-fill so groups
        # whose sketch column is all-NULL are kept)
        base = df.groupBy(*self.group_cols).agg(*self._partial_aggs())
        for m in hll:
            bucket, rho = _hll_bucket_rho(m)
            h = (
                df.select(
                    *self.group_cols,
                    bucket.alias("__hb"),
                    rho.alias("__hr"),
                )
                .groupBy(*self.group_cols, "__hb")
                .agg(F.max("__hr").alias("__hr"))
                .groupBy(*self.group_cols)
                .agg(_hll_map_agg(m))
                .select(*self.group_cols, _hll_map_to_regs(m))
            )
            base = base.join(h, self.group_cols, "left").withColumn(
                f"__{m.name}_regs",
                F.coalesce(F.col(f"__{m.name}_regs"), _hll_zero_regs()),
            )
        return base

    def _partial_aggs_cdc(self, op_col: str):
        """Op-weighted partials: a -1 row subtracts exactly what its
        +1 twin added, so partial+merge over any batch slicing equals
        the from-scratch aggregate over the net rows (DECIMAL sums —
        order-independent)."""
        op = F.col(op_col).cast("long")
        aggs = [F.sum(op).cast("long").alias("__live")]
        for m in self.measures:
            if m.kind == "count":
                aggs.append(F.sum(op).cast("long").alias(f"__{m.name}_cnt"))
            elif m.kind in ("sum", "avg"):
                aggs.append(
                    F.sum(
                        F.col(m.col).cast("decimal(25,6)")
                        * op.cast("decimal(25,6)")
                    )
                    .cast("decimal(25,6)")
                    .alias(f"__{m.name}_sum")
                )
                if m.kind == "avg":
                    aggs.append(
                        F.sum(
                            F.when(F.col(m.col).isNotNull(), op).otherwise(
                                F.lit(0)
                            )
                        )
                        .cast("long")
                        .alias(f"__{m.name}_cnt")
                    )
        return aggs

    # ----------------------------------------------------------- refresh
    def apply_batch(
        self, batch: DataFrame, batch_id: int | None = None
    ) -> dict:
        """Fold one INSERT-ONLY batch into the state; returns the
        merge_into summary (or {"skipped": batch_id} on a replay).

        The replay check scans the manifest log (parsed manifests are
        cached per version, so it is one filesystem listing + dict
        lookups); its window is bounded by vacuum retention — replay
        protection only needs to cover the checkpoint-recovery
        horizon, so run vacuum(keep_last=..., older_than=...) on the
        state table's maintenance cadence and the log stays short."""
        if batch_id is not None and self.table._batch_seen(
            batch_id, "ivm_batch_id", "ivm_max_batch_id"
        ):
            return {"skipped": batch_id}
        p = self._partial(batch)
        head = self.table.latest_version()
        if head is not None:
            touched_old = self.table.read().join(
                p.select(*self.group_cols).distinct(),
                self.group_cols,
                "left_semi",
            )
            p = (
                touched_old.unionByName(p)
                .groupBy(*self.group_cols)
                .agg(*self._merge_aggs())
            )
        extra = (
            {"ivm_batch_id": batch_id} if batch_id is not None else None
        )
        # merge_into consumes its source ~3x (hit-file probe, matched
        # rewrite, insert anti-join); persist so the batch scan +
        # partial aggregate run ONCE, not per consumption (the partial
        # itself is O(groups) rows — tiny to cache)
        p = p.persist()
        try:
            return self.table.merge_into(
                p,
                keys=self.group_cols,
                manifest_extra=extra,
                assume_unique_source=True,  # p is a groupBy output
                rewrite_partitions=8,  # group states are narrow; bound files
            )
        finally:
            p.unpersist()

    def apply_batch_cdc(
        self,
        batch: DataFrame,
        batch_id: int | None = None,
        op_col: str = "__op",
    ) -> dict:
        """Fold one CHANGE batch into the state: every row carries
        ``op_col`` = +1 (insert) or -1 (delete); an update is the -1 of
        the old row plus the +1 of the new one — the change stream a
        MERGE INTO upsert induces (table_diff emits exactly this shape).

        count/sum/avg retract exactly; min/max/approx_distinct are not
        self-maintainable under deletes (module docstring) and raise.
        Groups whose net row count reaches zero are DELETED from the
        state in the same atomic commit; a net-negative group (more
        retractions than insertions — a malformed change stream) fails
        loudly BEFORE anything commits.

        Scale shape: identical to apply_batch — one op-weighted partial
        aggregate O(batch), one state semi-join over the touched groups
        only, one file-pruned merge. Exactly-once via the same
        ivm_batch_id manifest stamp."""
        bad_kinds = {
            m.kind for m in self.measures
            if m.kind in ("min", "max", "approx_distinct")
        }
        if bad_kinds:
            raise ValueError(
                "apply_batch_cdc: measures of kind "
                f"{sorted(bad_kinds)} are not self-maintainable under "
                "deletes (retracting an extremum needs the full value "
                "multiset); keep those views insert-only (apply_batch) "
                "or recompute them"
            )
        if batch_id is not None and self.table._batch_seen(
            batch_id, "ivm_batch_id", "ivm_max_batch_id"
        ):
            return {"skipped": batch_id}
        # op validation RIDES the partial aggregate instead of its own
        # full batch scan (round 7: the pre-check doubled every CDC
        # fold's scan cost — and, being a plain filter, silently
        # PASSED NULL ops, which the weighted sums would then drop;
        # the count_if form catches NULL too)
        bad_cond = F.col(op_col).isNull() | ~F.col(op_col).isin(1, -1)
        pb = (
            batch.groupBy(*self.group_cols)
            .agg(
                *self._partial_aggs_cdc(op_col),
                F.count_if(bad_cond).alias("__bad_op"),
                # ignoreNulls: without it any_value may land on a
                # row where bad_cond is false (the when() yields NULL)
                # and report "got None" even when the offending op is
                # a concrete non-null like 5 (r7 advisory)
                F.any_value(
                    F.when(bad_cond, F.col(op_col).cast("string")),
                    True,
                ).alias("__bad_op_example"),
            )
            .persist()
        )
        bad = pb.filter(F.col("__bad_op") > 0).limit(1).collect()
        if bad:
            pb.unpersist()
            raise ValueError(
                f"apply_batch_cdc: {op_col} must be +1 or -1, got "
                f"{bad[0]['__bad_op_example']!r}"
            )
        p = pb.drop("__bad_op", "__bad_op_example")
        head = self.table.latest_version()
        if head is not None:
            touched_old = self.table.read().join(
                p.select(*self.group_cols).distinct(),
                self.group_cols,
                "left_semi",
            )
            p = (
                touched_old.unionByName(p)
                .groupBy(*self.group_cols)
                .agg(*self._merge_aggs())
            )
        # consumed by the guard AND the merge: persist so both see one
        # evaluation (and the merge's own multi-consumption is cheap;
        # the batch itself is NOT re-scanned — pb is cached)
        p = p.persist()
        neg = p.filter(F.col("__live") < 0).limit(1).collect()
        if neg:
            p.unpersist()
            pb.unpersist()
            raise ValueError(
                "apply_batch_cdc: group retracted below zero rows "
                f"(e.g. {neg[0].asDict()}) — the change stream deleted "
                "rows that were never inserted; nothing was committed"
            )
        extra = (
            {"ivm_batch_id": batch_id} if batch_id is not None else None
        )
        try:
            return self.table.merge_into(
                p,
                keys=self.group_cols,
                manifest_extra=extra,
                assume_unique_source=True,
                rewrite_partitions=8,
                # emptied groups leave the state in the same commit
                matched_delete_condition=F.col("__live") == 0,
            )
        finally:
            p.unpersist()
            pb.unpersist()

    def apply_batch_mixed(
        self,
        inserts: DataFrame | None,
        cdc: DataFrame | None = None,
        batch_id: int | None = None,
        op_col: str = "__op",
    ) -> dict:
        """Fold one micro-batch made of TWO slices in ONE commit:

        - ``inserts``: append-only rows (never retracted) feeding ALL
          measures — including min/max/approx_distinct, which are
          self-maintainable only under append.
        - ``cdc``: ±1 ``op_col`` change rows feeding ONLY the
          retractable measures (count/sum/avg). The caller guarantees
          a -1 row retracts a row previously added VIA THE CDC SLICE;
          retracting an insert-slice row would silently strand its
          min/max/HLL contribution, so the state keeps a hidden
          cumulative ``__live_cdc`` net and fails LOUDLY if any
          group's CDC net goes negative (the violation's signature).

        This is the Flink-style "append main stream + retractable
        side stream" split, and exactly the semantics of maintaining
        two separate states (one CDC-capable, one insert-only) and
        joining them — at HALF the commit count, which dominates
        micro-batch refresh cost (one partial aggregate, one touched-
        group merge, one commit per batch instead of two of each;
        round-8 fix for the r7 bench's 21 s lakehouse_ivm_cdc key).
        Groups retracted to zero net rows are deleted in the same
        commit. A state maintained by mixed folds carries the extra
        ``__live_cdc`` column; don't alternate with apply_batch /
        apply_batch_cdc on the same state (the schema check in
        merge_into fails loudly if you do)."""
        if inserts is None and cdc is None:
            raise ValueError("apply_batch_mixed: both slices are None")
        if batch_id is not None and self.table._batch_seen(
            batch_id, "ivm_batch_id", "ivm_max_batch_id"
        ):
            return {"skipped": batch_id}
        # guard columns RIDE the partials through every merge stage so
        # one post-merge collect validates ops AND cumulative nets —
        # a pure-insert fold (cdc None) needs no guard job at all and
        # costs exactly what apply_batch costs
        guard_zero = [
            F.lit(0).cast("long").alias("__bad_op"),
            F.lit(None).cast("string").alias("__bad_op_example"),
        ]
        parts = []
        if inserts is not None:
            parts.append(
                self._partial(inserts).select(
                    "*",
                    F.lit(0).cast("long").alias("__live_cdc"),
                    *guard_zero,
                )
            )
        if cdc is not None:
            bad_cond = F.col(op_col).isNull() | ~F.col(op_col).isin(
                1, -1
            )
            pc = cdc.groupBy(*self.group_cols).agg(
                *self._partial_aggs_cdc(op_col),
                F.count_if(bad_cond).cast("long").alias("__bad_op"),
                F.any_value(
                    F.when(bad_cond, F.col(op_col).cast("string")),
                    True,
                ).alias("__bad_op_example"),
            )
            pc = pc.withColumn("__live_cdc", F.col("__live"))
            # null-fill the insert-only measure partials (min/max/HLL
            # registers) the CDC slice does not maintain, typed from
            # the insert partials' schema so the union is exact
            want = self._partial(
                (inserts if inserts is not None else cdc).limit(0)
            ).select(
                "*",
                F.lit(0).cast("long").alias("__live_cdc"),
                *guard_zero,
            )
            have = set(pc.columns)
            hll_cols = {
                f"__{m.name}_regs"
                for m in self.measures
                if m.kind == "approx_distinct"
            }

            def _fill(f):
                if f.name in have:
                    return F.col(f.name)
                if f.name in hll_cols:
                    # the EMPTY sketch, not NULL: a pure-CDC first
                    # commit would otherwise store NULL register
                    # arrays, which finalize to NULL instead of the
                    # empty sketch's 0 (merges are indifferent —
                    # collect_list skips NULLs — but bootstraps aren't)
                    return _hll_zero_regs().alias(f.name)
                return F.lit(None).cast(f.dataType).alias(f.name)

            pc = pc.select(*[_fill(f) for f in want.schema.fields])
            parts.append(pc)
        p = parts[0]
        for more in parts[1:]:
            p = p.unionByName(more)
        merge_aggs = self._merge_aggs() + [
            F.sum("__live_cdc").cast("long").alias("__live_cdc"),
            F.sum("__bad_op").cast("long").alias("__bad_op"),
            F.any_value("__bad_op_example", True).alias(
                "__bad_op_example"
            ),
        ]
        if len(parts) > 1:
            p = p.groupBy(*self.group_cols).agg(*merge_aggs)
        head = self.table.latest_version()
        if head is not None:
            touched_old = self.table.read().join(
                p.select(*self.group_cols).distinct(),
                self.group_cols,
                "left_semi",
            ).select("*", *guard_zero)
            p = (
                touched_old.unionByName(p)
                .groupBy(*self.group_cols)
                .agg(*merge_aggs)
            )
        # persist in EVERY fold: the guard (CDC case) and merge_into's
        # ~3 source consumptions otherwise re-run the batch scan +
        # partial aggregate each time
        p = p.persist()
        if cdc is not None:
            # one guard job validates everything the fold must refuse
            bad = (
                p.filter(
                    (F.col("__bad_op") > 0)
                    | (F.col("__live") < 0)
                    | (F.col("__live_cdc") < 0)
                )
                .limit(1)
                .collect()
            )
            if bad:
                p.unpersist()
                row = bad[0].asDict()
                if row["__bad_op"] > 0:
                    raise ValueError(
                        f"apply_batch_mixed: {op_col} must be +1 or "
                        f"-1, got {row['__bad_op_example']!r}"
                    )
                raise ValueError(
                    "apply_batch_mixed: group retracted below zero "
                    f"{'CDC-slice ' if row['__live_cdc'] < 0 else ''}"
                    f"rows (e.g. {row}) — the change stream deleted "
                    "rows the CDC slice never inserted; nothing was "
                    "committed"
                )
        extra = (
            {"ivm_batch_id": batch_id} if batch_id is not None else None
        )
        try:
            return self.table.merge_into(
                p.drop("__bad_op", "__bad_op_example"),
                keys=self.group_cols,
                manifest_extra=extra,
                assume_unique_source=True,
                rewrite_partitions=8,
                matched_delete_condition=F.col("__live") == 0,
            )
        finally:
            p.unpersist()

    # -------------------------------------------------------------- read
    def read(self) -> DataFrame:
        """The finalized aggregate: (group_cols..., measure columns).
        avg finalizes as an exact-decimal division rendered to double,
        rounded to 9dp — the exact_avg convention."""
        state = self.table.read()
        cols = [F.col(c) for c in self.group_cols]
        for m in self.measures:
            if m.kind == "count":
                cols.append(F.col(f"__{m.name}_cnt").alias(m.name))
            elif m.kind == "sum":
                cols.append(
                    F.col(f"__{m.name}_sum").cast("double").alias(m.name)
                )
            elif m.kind == "avg":
                cols.append(
                    F.round(
                        F.col(f"__{m.name}_sum").cast("double")
                        / F.col(f"__{m.name}_cnt").cast("double"),
                        9,
                    ).alias(m.name)
                )
            elif m.kind == "min":
                cols.append(F.col(f"__{m.name}_min").alias(m.name))
            elif m.kind == "approx_distinct":
                cols.append(_hll_finalize(m).alias(m.name))
            else:
                cols.append(F.col(f"__{m.name}_max").alias(m.name))
        return state.select(*cols)

    def recompute(self, full_df: DataFrame) -> DataFrame:
        """The from-scratch twin of read() over the full input — the
        correctness oracle incremental maintenance must equal."""
        state = self._partial(full_df)
        cols = [F.col(c) for c in self.group_cols]
        for m in self.measures:
            if m.kind == "count":
                cols.append(F.col(f"__{m.name}_cnt").alias(m.name))
            elif m.kind == "sum":
                cols.append(
                    F.col(f"__{m.name}_sum").cast("double").alias(m.name)
                )
            elif m.kind == "avg":
                cols.append(
                    F.round(
                        F.col(f"__{m.name}_sum").cast("double")
                        / F.col(f"__{m.name}_cnt").cast("double"),
                        9,
                    ).alias(m.name)
                )
            elif m.kind == "min":
                cols.append(F.col(f"__{m.name}_min").alias(m.name))
            elif m.kind == "approx_distinct":
                cols.append(_hll_finalize(m).alias(m.name))
            else:
                cols.append(F.col(f"__{m.name}_max").alias(m.name))
        return state.select(*cols)


def _hll_bucket_rho(m: Measure):
    """(bucket, rho) expressions for one row of the sketch column —
    the sketches.py portable hash, inlined so both are plain codegen
    expressions. A NULL value yields a NULL bucket, which the
    assembly drops (NULLs never count toward distincts)."""
    mreg = 1 << _HLL_B
    w = 60 - _HLL_B
    h = _md5_long(F.col(m.col).cast("string"))
    bucket = h.bitwiseAND(F.lit(mreg - 1)).cast("int")
    rho = F.least(
        F.lit(w + 1) - F.length(F.bin(F.shiftright(h, _HLL_B))),
        F.lit(40),
    )
    return bucket, rho


def _hll_zero_regs():
    """The empty sketch: 2^b zero registers as one array<int>."""
    mreg = 1 << _HLL_B
    return F.expr(
        f"transform(sequence(0, {mreg - 1}), i -> 0)"
    )


def _hll_map_agg(m: Measure):
    """Aggregate (__hb, __hr) per-bucket maxima into a bucket->rho
    MAP (bounded: at most 2^b entries per group reach the
    collect_list); _hll_map_to_regs expands it to the array column in
    a follow-up projection (an aggregate can't sit under a lambda)."""
    return F.map_from_entries(
        F.collect_list(
            F.when(
                F.col("__hb").isNotNull(),
                F.struct(
                    F.col("__hb"), F.col("__hr").cast("int")
                ),
            )
        )
    ).alias(f"__{m.name}_map")


def _hll_map_to_regs(m: Measure):
    """bucket->rho map -> the array<int> register column: positions
    are buckets, empty buckets are 0."""
    mreg = 1 << _HLL_B
    mp = F.col(f"__{m.name}_map")
    return F.transform(
        F.sequence(F.lit(0), F.lit(mreg - 1)),
        lambda i: F.coalesce(F.element_at(mp, i), F.lit(0)),
    ).alias(f"__{m.name}_regs")


def _hll_finalize(m: Measure):
    """Register array -> rounded estimate (the sketches.py formula;
    empty registers are 0). Exact dyadic 2^-rho via integer shift
    (sketches.py note: never pow); the left-fold starts at 0.0 so the
    double-sum order matches the DuckDB oracle twin term-for-term."""
    from globalweather_etl_spark.operators.sketches import _alpha

    mreg = 1 << _HLL_B
    c = f"__{m.name}_regs"
    sum_inv = F.expr(
        f"aggregate(transform({c}, r -> 1.0d / cast("
        "shiftleft(cast(1 as bigint), r) as double)), "
        "cast(0.0 as double), (a, x) -> a + x)"
    )
    n_empty = F.expr(
        f"aggregate({c}, 0, (a, r) -> a + if(r = 0, 1, 0))"
    )
    raw = F.lit(_alpha(mreg) * mreg * mreg) / sum_inv
    return F.round(
        F.when(
            (raw <= F.lit(2.5 * mreg)) & (n_empty > 0),
            F.lit(float(mreg)) * F.log(F.lit(float(mreg)) / n_empty),
        ).otherwise(raw),
        6,
    )
