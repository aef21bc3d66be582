"""Randomized interleaving fuzz of the transaction layer against a
Python model of the VISIBLE state.

Each seed drives a few dozen random operations — plain writes,
multi-table transactional commits, crash-simulated pending stages,
force-aborts, late decisions — over two tables, checking after every
step that (a) each table's visible rows equal the model exactly,
(b) a pending transaction blocks other commits and stays invisible,
(c) decisions flip atomically and aborts leave no trace.  This is the
cheap exhaustive-ish complement to the targeted lifecycle tests in
test_catalog.py: the model is ~20 lines, so any divergence localizes
the protocol bug immediately."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row

from globalweather_etl_spark.sources.catalog import (
    ConcurrentTransactionError,
    SnapshotCatalog,
)

TABLES = ("alpha", "beta")


def _df(spark, tags):
    return spark.createDataFrame(
        [Row(tag=t, i=i) for i, t in enumerate(tags)]
    )


def _visible_tags(cat, name):
    t = cat.table(name)
    if t.latest_visible_version() is None:
        return []
    return sorted(r["tag"] for r in t.read().collect())


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_random_interleavings_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    model: dict[str, list[str]] = {n: [] for n in TABLES}
    # at most one crash-simulated pending txn outstanding at a time:
    # (txn_id, {table: staged_tags}, {table: mode})
    pending = None
    step = 0

    def check():
        for n in TABLES:
            assert _visible_tags(cat, n) == sorted(model[n]), (
                f"seed {seed} step {step}: table {n} diverged"
            )

    for step in range(24):
        op = rng.choice(
            ["plain", "txn", "stage_pending", "decide", "abort"]
        )
        if op == "plain":
            n = rng.choice(TABLES)
            tags = [f"p{step}_{j}" for j in range(rng.randint(1, 3))]
            mode = rng.choice(["append", "overwrite"])
            if pending and n in pending[1]:
                with pytest.raises(ConcurrentTransactionError):
                    cat.table(n).write(_df(spark, tags), mode=mode)
            else:
                cat.table(n).write(_df(spark, tags), mode=mode)
                model[n] = (
                    model[n] + tags if mode == "append" else list(tags)
                )
        elif op == "txn":
            names = rng.sample(TABLES, rng.randint(1, 2))
            writes = {
                n: [f"t{step}_{n}_{j}" for j in range(rng.randint(1, 2))]
                for n in names
            }
            mode = rng.choice(["append", "overwrite"])
            txn = cat.begin()
            for n, tags in writes.items():
                txn.write(n, _df(spark, tags), mode=mode)
            if pending and any(n in pending[1] for n in names):
                with pytest.raises(ConcurrentTransactionError):
                    txn.commit()
            else:
                txn.commit()
                for n, tags in writes.items():
                    model[n] = (
                        model[n] + tags
                        if mode == "append"
                        else list(tags)
                    )
        elif op == "stage_pending" and pending is None:
            names = rng.sample(TABLES, rng.randint(1, 2))
            txn_id = f"crash{step}"
            staged = {}
            modes = {}
            ok = True
            for n in names:
                t = cat.table(n)
                tags = [f"c{step}_{n}"]
                mode = rng.choice(["append", "overwrite"])
                files, cnt = t._stage_files(_df(spark, tags))
                try:
                    t._commit_new_files(
                        files, cnt, _df(spark, ["x"]).schema, mode,
                        manifest_extra={
                            "txn": {
                                "id": txn_id,
                                "log": cat._txn_log_path(),
                            }
                        },
                    )
                except ConcurrentTransactionError:
                    ok = False
                    break
                staged[n] = tags
                modes[n] = mode
            if staged:
                pending = (txn_id, staged, modes)
            if not ok:
                # partially staged then blocked — force-abort cleans
                cat.abort(txn_id)
                pending = None
        elif op == "decide" and pending is not None:
            txn_id, staged, modes = pending
            assert cat._write_decision(
                txn_id, {"txn": txn_id, "status": "committed"}
            )
            for n, tags in staged.items():
                model[n] = (
                    model[n] + tags
                    if modes[n] == "append"
                    else list(tags)
                )
            pending = None
        elif op == "abort" and pending is not None:
            txn_id, staged, modes = pending
            assert cat.abort(txn_id) == "aborted"
            pending = None
        check()

    # drain any leftover pending txn and give the log a final audit
    if pending is not None:
        cat.abort(pending[0])
        check()
    # every decision in the log is terminal and every table readable
    for rec in cat.history():
        assert rec["status"] in ("committed", "aborted")
    pins = cat.snapshot(list(TABLES))
    for n in TABLES:
        if pins[n] is not None:
            assert cat.table(n).read(pins[n]).count() == len(model[n])
