"""The delta-encoded manifest log (round 10): checkpoint cadence,
single-copy clustering membership, vacuum chain preservation, and
cold-cache resolution equivalence.

Scale rationale: before this format every commit serialized the FULL
live file listing (and, with a clustering stamp, serialized it twice),
so commit metadata cost grew O(table-files) — the wall a 100 TB table
with millions of files hits immediately. The delta log bounds it to
O(files touched) per commit with one full checkpoint per interval,
which is the cost contract Delta checkpoints / Iceberg manifest lists
publish.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.sources.snapshots import SnapshotTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _raw(table, version) -> dict:
    p = os.path.join(
        table.path.removeprefix("file:"),
        "_manifests",
        f"v{version:08d}.json",
    )
    with open(p, "r", encoding="utf-8") as f:
        return json.load(f)


def test_delta_cadence_and_time_travel(spark, tmp_path):
    t = SnapshotTable(
        spark, str(tmp_path / "t"), checkpoint_interval=4
    )
    for i in range(10):
        t.write(_df(spark, [(i, f"r{i}")]), mode="append")
    # v1 has no parent -> full; depth reaches the interval at v5, v9
    kinds = {
        v: ("delta" if _raw(t, v).get("delta") else "full")
        for v in t.versions()
    }
    assert kinds[1] == "full" and kinds[5] == "full" and kinds[9] == "full"
    assert all(
        kinds[v] == "delta" for v in (2, 3, 4, 6, 7, 8, 10)
    ), kinds
    # a delta stores only its own files
    assert len(_raw(t, 7)["adds"]) == len(t._manifest(7)["files"]) - len(
        t._manifest(6)["files"]
    )
    # every version still resolves to the right rows, warm or cold
    for v in t.versions():
        assert sorted(r["k"] for r in t.read(v).collect()) == list(
            range(v)
        )
    cold = SnapshotTable(spark, t.path, checkpoint_interval=4)
    assert cold._manifest(10) == t._manifest(10)
    assert sorted(r["k"] for r in cold.read(3).collect()) == [0, 1, 2]


def test_overwrite_and_restore_store_full(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]))
    t.write(_df(spark, [(2, "b")]), mode="append")
    t.write(_df(spark, [(9, "z")]), mode="overwrite")
    v4 = t.restore(2)
    # an overwrite replaces the whole listing: delta would be no
    # smaller, so the stored form is a self-contained checkpoint;
    # restore returns to an out-of-order old listing, same fallback
    assert not _raw(t, 3).get("delta")
    assert not _raw(t, v4).get("delta")
    assert sorted(r["k"] for r in t.read().collect()) == [1, 2]


def test_clustering_membership_stored_once(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    base = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("g")
    )
    t.write_zordered(base, zorder_by=["k", "g"], n_files=4)
    t.write(
        spark.range(400, 450).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("g")
        ),
        mode="append",
    )
    res = t.optimize(zorder_by=["k", "g"])
    assert res["files_carried"] == 4 and res["full"] is False
    # NO stored manifest ever duplicates the file list inside the
    # clustering stamp — full forms carry n_clustered over the
    # clustered-first ordering, deltas carry adds_clustered
    for v in t.versions():
        raw = _raw(t, v)
        cl = raw.get("clustering")
        if cl is None:
            continue
        assert "files" not in cl, (v, cl)
        assert ("n_clustered" in cl) != ("adds_clustered" in cl)
    # the resolved stamp still exposes explicit membership
    st = t.clustering_state()
    assert st["unclustered_files"] == []
    assert len(st["clustered_files"]) == len(t._manifest(3)["files"])
    # the append's delta marked its adds unclustered
    assert _raw(t, 2)["clustering"]["adds_clustered"] is False
    assert t.clustering_state(2)["unclustered_files"] != []


def test_vacuum_rewrites_dangling_deltas(spark, tmp_path):
    t = SnapshotTable(
        spark, str(tmp_path / "t"), checkpoint_interval=100
    )
    for i in range(6):
        t.write(_df(spark, [(i, "x")]), mode="append")
    assert _raw(t, 5).get("delta")  # head-1 rides the delta chain
    rep = t.vacuum(keep_last=2, unreferenced_grace=0.0)
    assert rep["manifests_removed"] == 4
    # the oldest kept version was a delta whose whole ancestry was
    # dropped: vacuum rewrote it as a self-contained checkpoint first
    assert not _raw(t, 5).get("delta")
    assert _raw(t, 6).get("delta")  # still resolves through v5
    assert sorted(r["k"] for r in t.read(5).collect()) == [0, 1, 2, 3, 4]
    cold = SnapshotTable(spark, t.path)
    assert sorted(r["k"] for r in cold.read(6).collect()) == [
        0, 1, 2, 3, 4, 5,
    ]
    with pytest.raises(ValueError):
        t.read(3)


def test_mutation_paths_resolve_identically_cold(spark, tmp_path):
    """Append / CoW merge / MoR delete / purge / replace_where all
    round-trip through the delta encoder: a cold reader resolves every
    version to the same manifest the writer's session sees, and every
    version's rows equal a TWIN table running the identical operations
    with checkpoint_interval=1 (i.e. the pre-r10 every-manifest-full
    format)."""

    def run(path, interval):
        t = SnapshotTable(spark, path, checkpoint_interval=interval)
        rows = spark.range(0, 300).select(
            F.col("id").alias("k"), F.lit("base").alias("v")
        )
        t.write(rows.repartition(4, "k"), mode="overwrite")
        t.merge_into(
            spark.range(0, 60).select(
                F.col("id").alias("k"), F.lit("upd").alias("v")
            ),
            keys=["k"],
        )
        t.delete_where("k % 10 = 0")
        t.merge_into(
            spark.range(280, 320).select(
                F.col("id").alias("k"), F.lit("mor").alias("v")
            ),
            keys=["k"],
            strategy="merge-on-read",
        )
        t.purge_deletes()
        t.replace_where(
            spark.range(100, 150).select(
                F.col("id").alias("k"), F.lit("band").alias("v")
            ),
            (F.col("k") >= 100) & (F.col("k") < 150),
        )
        return t

    t = run(str(tmp_path / "t"), 16)
    twin = run(str(tmp_path / "twin"), 1)
    assert any(_raw(t, v).get("delta") for v in t.versions())
    assert not any(_raw(twin, v).get("delta") for v in twin.versions())
    cold = SnapshotTable(spark, t.path)
    for v in t.versions():
        assert cold._manifest(v) == t._manifest(v), v
        assert sorted(
            (r["k"], r["v"]) for r in cold.read(v).collect()
        ) == sorted(
            (r["k"], r["v"]) for r in twin.read(v).collect()
        ), v


# ---- property fuzz over the pure encode/decode pair (no Spark) ----

from hypothesis import given, settings, strategies as st

from globalweather_etl_spark.sources.snapshots import (
    _decode_manifest,
    _encode_manifest,
)


def _norm(m: dict) -> dict:
    """Decode-equivalence normal form: _depth stripped; files AND the
    clustering stamp compared as SETS (with counts pinned so a
    duplicate-collapse can't hide) — list order is presentation: every
    consumer reads the listing as a set, and the full storage form
    deliberately reorders clustered-first."""
    out = {k: v for k, v in m.items() if k != "_depth"}
    out["files"] = (frozenset(m["files"]), len(m["files"]))
    cl = out.get("clustering")
    if cl is not None:
        out["clustering"] = (
            tuple(sorted((k, str(v)) for k, v in cl.items() if k != "files")),
            # a carried stamp may reference dead paths; every consumer
            # intersects with the live listing, so equivalence does too
            frozenset(cl["files"]) & frozenset(m["files"]),
        )
    return out


_paths = st.lists(
    st.integers(0, 49).map(lambda i: f"data/c-x/f{i}.parquet"),
    unique=True,
    max_size=12,
)


@st.composite
def _parent_and_child(draw):
    pfiles = draw(_paths)
    # parent: optionally clustered over an arbitrary subset
    pcl = None
    if draw(st.booleans()) and pfiles:
        pcl = {
            "kind": draw(st.sampled_from(["zorder", "range"])),
            "cols": ["d"],
            "files": draw(st.lists(st.sampled_from(pfiles), unique=True)),
        }
    pm = {
        "version": 1,
        "parent": None,
        "mode": "overwrite",
        "schema": "{}",
        "files": pfiles,
        "n_rows": len(pfiles),
        "_depth": draw(st.integers(0, 20)),
        **({"clustering": pcl} if pcl else {}),
    }
    # child: keep an arbitrary subsequence (parent order preserved or
    # shuffled — shuffled must force full fallback), add new files
    kept = [f for f in pfiles if draw(st.booleans())]
    if draw(st.booleans()):
        kept = list(reversed(kept))  # order break -> full fallback path
    adds = [f"data/c-y/g{i}.parquet" for i in range(draw(st.integers(0, 4)))]
    files = kept + adds
    ccl = None
    c = draw(st.integers(0, 3))
    if c == 1 and pcl:  # carry parent stamp verbatim (may hold dead files)
        ccl = pcl
    elif c == 2 and files:  # fresh/extended stamp: arbitrary membership
        ccl = {
            "kind": draw(st.sampled_from(["zorder", "range"])),
            "cols": ["d"],
            "files": draw(st.lists(st.sampled_from(files), unique=True)),
        }
    m = {
        "version": 2,
        "parent": 1,
        "mode": draw(st.sampled_from(["append", "merge", "optimize"])),
        "schema": "{}",
        "files": files,
        "n_rows": len(files),
        **({"clustering": ccl} if ccl else {}),
        **({"dvs": {"stores": ["data/dv1"], "files": kept[:1]}}
           if kept and draw(st.booleans()) else {}),
    }
    return pm, m


@given(_parent_and_child())
@settings(max_examples=300, deadline=None)
def test_encode_decode_roundtrip(pc):
    """For EVERY (parent, child) shape: decode(encode(m, pm), pm) must
    be decode-equivalent to m — whether the encoder chose a delta or
    fell back to the full form. This is the invariant the whole delta
    log stands on; the encoder may fall back whenever it likes, but a
    lossy delta is corruption."""
    pm, m = pc
    raw = _encode_manifest(m, pm, interval=16)
    out = _decode_manifest(raw, pm)
    assert _norm(out) == _norm(m), (raw, out, m)
    # and a full re-encode of the decoded form is stable too
    raw2 = _encode_manifest(out, pm, interval=1)  # force full
    assert not raw2.get("delta")
    assert _norm(_decode_manifest(raw2, None)) == _norm(m)


# ---------------------------------------------------------------
# Round 11: parquet checkpoint sidecars — the file LISTING of a big
# full manifest goes columnar (files-v*.parquet) so checkpoint
# serialize/parse is no longer O(table-files) JSON on the driver.


def _ext_table(spark, tmp_path, name="pext", threshold=4, interval=3):
    return SnapshotTable(
        spark,
        str(tmp_path / name),
        checkpoint_interval=interval,
        files_ext_threshold=threshold,
    )


def test_parquet_sidecar_written_and_resolves(spark, tmp_path):
    t = _ext_table(spark, tmp_path)
    for i in range(7):
        t.write(
            spark.range(i * 10, (i + 1) * 10, 1, 3).select(
                F.col("id").alias("k"), F.lit("x").alias("v")
            ),
            mode="append",
        )
    # checkpoints past the threshold externalize; deltas never do
    ext_versions = []
    for v in t.versions():
        raw = _raw(t, v)
        if raw.get("delta"):
            assert "files_ext" not in raw
            continue
        if raw.get("files_ext"):
            ext_versions.append(v)
            assert "files" not in raw
            assert raw["n_files"] == len(t._manifest(v)["files"])
    assert ext_versions, "no checkpoint crossed the threshold"
    # sidecar row order IS the resolved listing order
    import pyarrow.parquet as papq

    v = ext_versions[-1]
    raw = _raw(t, v)
    side = os.path.join(
        t.path.removeprefix("file:"), "_manifests", raw["files_ext"]
    )
    assert papq.read_table(side).column("path").to_pylist() == t._manifest(
        v
    )["files"]
    # the sidecar is plain parquet Spark itself can read (Delta-style
    # checkpoint-as-data)
    got = {r["path"] for r in spark.read.parquet(side).collect()}
    assert got == set(t._manifest(v)["files"])
    # cold resolution + reads are unchanged
    cold = _ext_table(spark, tmp_path)
    assert cold._manifest(t.latest_version()) == t._manifest(
        t.latest_version()
    )
    assert cold.read().count() == 70


def test_parquet_sidecar_inline_equivalence(spark, tmp_path):
    """The SAME commits with and without externalization resolve to
    identical manifests — the sidecar is pure storage encoding."""
    rows = [(i, f"r{i}") for i in range(8)]
    a = SnapshotTable(
        spark,
        str(tmp_path / "inline"),
        checkpoint_interval=2,
        files_ext_threshold=10**9,
    )
    b = SnapshotTable(
        spark,
        str(tmp_path / "ext"),
        checkpoint_interval=2,
        files_ext_threshold=1,
    )
    for k, v in rows:
        df = _df(spark, [(k, v)]).coalesce(1)
        a.write(df, mode="append")
        b.write(df, mode="append")
    for v in a.versions():
        ma = {k2: v2 for k2, v2 in a._manifest(v).items()
              if k2 != "committed_at"}
        mb = {k2: v2 for k2, v2 in b._manifest(v).items()
              if k2 != "committed_at"}
        # file NAMES differ (uuids) but counts/structure must match
        assert len(ma.pop("files")) == len(mb.pop("files"))
        assert ma == mb, v
    # with threshold 1 every checkpoint externalized
    assert any(_raw(b, v).get("files_ext") for v in b.versions())
    assert not any(_raw(a, v).get("files_ext") for v in a.versions())


def test_vacuum_sweeps_and_rewrites_sidecars(spark, tmp_path):
    t = _ext_table(spark, tmp_path, threshold=1, interval=100)
    for i in range(6):
        t.write(_df(spark, [(i, "x")]).coalesce(1), mode="append")
    mdir = os.path.join(t.path.removeprefix("file:"), "_manifests")

    def sidecars():
        return sorted(
            n for n in os.listdir(mdir)
            if n.startswith("files-v") and n.endswith(".parquet")
        )

    assert sidecars() == [
        n for n in sidecars() if n.startswith("files-v00000001")
    ]  # only v1 (the sole checkpoint) externalized
    # plant an orphan for a KEPT version (a crashed writer's sidecar)
    orphan = os.path.join(mdir, "files-v00000006-deadbeef.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not parquet, never read")
    rep = t.vacuum(keep_last=2, unreferenced_grace=0.0, dry_run=True)
    assert any(
        s.startswith("_manifests/files-v00000001") for s in rep["sidecars"]
    )
    t.vacuum(keep_last=2, unreferenced_grace=0.0)
    # v5 (dangling delta) was rewritten full -> externalized; v1's
    # sidecar and the planted orphan are gone
    names = sidecars()
    assert all(n.startswith("files-v00000005") for n in names), names
    assert not _raw(t, 5).get("delta")
    assert _raw(t, 5).get("files_ext")
    cold = _ext_table(spark, tmp_path, threshold=1, interval=100)
    assert sorted(r["k"] for r in cold.read(6).collect()) == list(range(6))


def test_streaming_source_resolves_sidecars(spark, tmp_path):
    """The plain-Python manifest decoder the streaming source uses
    inlines parquet sidecars too."""
    t = _ext_table(spark, tmp_path, threshold=1, interval=1)
    for i in range(3):
        t.write(_df(spark, [(i, "s")]).coalesce(1), mode="append")
    from globalweather_etl_spark.streaming import snapshot_source as ss

    root = t.path.removeprefix("file:")
    ss._RESOLVED_CACHE.clear()
    m = ss._manifest(root, 3)
    assert m["files"] == t._manifest(3)["files"]
    assert len(m["files"]) == 3


def test_delta_hint_encodes_identically(spark, tmp_path):
    """The append path's delta hint (adds known by construction) must
    produce EXACTLY the raw form the O(n) set diff produces — and the
    real append path still round-trips through a cold reader."""
    from globalweather_etl_spark.sources.snapshots import (
        _decode_manifest,
        _encode_manifest,
    )

    pm = {
        "version": 1, "parent": None, "mode": "overwrite",
        "schema": "{}", "files": ["data/a", "data/b"], "n_rows": 2,
        "_depth": 0,
    }
    m = {
        "version": 2, "parent": 1, "mode": "append", "schema": "{}",
        "files": ["data/a", "data/b", "data/c"], "n_rows": 3,
    }
    plain = _encode_manifest(m, pm, interval=16)
    hinted = _encode_manifest(
        m, pm, interval=16, delta_hint=(["data/c"], [])
    )
    assert hinted == plain and hinted.get("delta")
    assert _decode_manifest(hinted, pm)["files"] == m["files"]
    # a WRONG hint (count mismatch) falls back to the verified diff
    bad = _encode_manifest(
        m, pm, interval=16, delta_hint=(["data/c", "data/x"], [])
    )
    assert bad == plain
    # end-to-end: appends still resolve cold
    t = SnapshotTable(spark, str(tmp_path / "h"), checkpoint_interval=8)
    for i in range(5):
        t.write(_df(spark, [(i, "x")]).coalesce(1), mode="append")
    cold = SnapshotTable(spark, t.path, checkpoint_interval=8)
    assert sorted(r["k"] for r in cold.read().collect()) == list(range(5))
    assert _raw(t, 4).get("delta")


# ------------------------- manifest TREE checkpoints (round 12)


def _tree_table(spark, tmp_path, name="ptree", group=3, interval=3,
                tree_min=1):
    return SnapshotTable(
        spark,
        str(tmp_path / name),
        checkpoint_interval=interval,
        files_ext_threshold=1,
        files_tree_threshold=tree_min,
        files_tree_group=group,
    )


def _mdir(t):
    return os.path.join(t.path.removeprefix("file:"), "_manifests")


def test_tree_written_and_resolves(spark, tmp_path):
    """Past the tree threshold a checkpoint stores group sidecars
    under a manifest list; resolution (warm, cold, and Spark-readable
    groups) is identical to the inline form."""
    t = _tree_table(spark, tmp_path)
    for i in range(7):
        t.write(
            spark.range(i * 10, (i + 1) * 10, 1, 3).select(
                F.col("id").alias("k"), F.lit("x").alias("v")
            ),
            mode="append",
        )
    tree_versions = [
        v for v in t.versions()
        if not _raw(t, v).get("delta") and _raw(t, v).get("files_tree")
    ]
    assert tree_versions, "no tree checkpoint written"
    v = tree_versions[-1]
    raw = _raw(t, v)
    m = t._manifest(v)
    # group files exist, derive from the list name, and their ord
    # order IS the resolved listing order
    import pyarrow.parquet as papq

    stem = raw["files_ext"][: -len(".parquet")]
    gnames = sorted(
        n for n in os.listdir(_mdir(t))
        if n.startswith(stem + "-g")
    )
    assert gnames and len(gnames) == -(-raw["n_files"] // 3)
    concat = []
    for n in gnames:
        part = papq.read_table(
            os.path.join(_mdir(t), n)
        ).column("path").to_pylist()
        assert len(part) <= 3
        concat.extend(part)
    assert concat == m["files"]
    # group sidecars are plain parquet Spark can read
    got = {
        r["path"]
        for r in spark.read.parquet(
            os.path.join(_mdir(t), gnames[0])
        ).collect()
    }
    assert got == set(concat[:3])
    # cold resolution + full read unchanged
    cold = _tree_table(spark, tmp_path)
    assert cold._manifest(v) == m
    assert cold.read().count() == 70


def test_tree_inline_flat_equivalence(spark, tmp_path):
    """The SAME commits stored inline, flat-sidecar and tree resolve
    to identical manifests — the tree is pure storage encoding."""
    rows = [(i, f"r{i}") for i in range(8)]
    forms = {
        "inline": SnapshotTable(
            spark, str(tmp_path / "inline"), checkpoint_interval=2,
            files_ext_threshold=10**9,
        ),
        "flat": SnapshotTable(
            spark, str(tmp_path / "flat"), checkpoint_interval=2,
            files_ext_threshold=1, files_tree_threshold=10**9,
        ),
        "tree": _tree_table(spark, tmp_path, name="tree", interval=2),
    }
    for k, v in rows:
        df = _df(spark, [(k, v)]).coalesce(1)
        for t in forms.values():
            t.write(df, mode="append")
    base = forms["inline"]
    for v in base.versions():
        ref = {
            k2: v2 for k2, v2 in base._manifest(v).items()
            if k2 != "committed_at"
        }
        nref = len(ref.pop("files"))
        for name, t in forms.items():
            got = {
                k2: v2 for k2, v2 in t._manifest(v).items()
                if k2 != "committed_at"
            }
            assert len(got.pop("files")) == nref, (name, v)
            assert got == ref, (name, v)
    assert any(_raw(forms["tree"], v).get("files_tree")
               for v in forms["tree"].versions())
    assert not any(_raw(forms["flat"], v).get("files_tree")
                   for v in forms["flat"].versions())


def test_tree_pruned_probe_equals_full_and_skips_groups(
    spark, tmp_path
):
    """files_for_range over a stamped tree returns EXACTLY the flat
    twin's candidates, while decoding only the groups whose stamp
    intersects the range — counted via the _read_bytes hook."""
    # interval=1: every commit is a full (tree) checkpoint
    t = _tree_table(spark, tmp_path, group=2, interval=1)
    flat = SnapshotTable(
        spark, str(tmp_path / "flatref"), checkpoint_interval=1,
        files_ext_threshold=10**9,
    )
    # one file per commit, disjoint k ranges -> clean group stamps
    for i in range(8):
        df = spark.range(i * 10, (i + 1) * 10).select(
            F.col("id").alias("k"), F.lit("x").alias("v")
        ).coalesce(1)
        mode = "overwrite" if i == 0 else "append"
        t.write(df, mode=mode)
        flat.write(df, mode=mode)
    for tt in (t, flat):
        tt.build_stats(cols=["k"], version=8, method="scan")
    raw = _raw(t, 8)
    assert raw.get("files_tree") and not raw.get("delta")
    want = flat.files_for_range("k", 31, 33, 8)
    assert want is not None and len(want) == 1
    reads = []
    orig = t._read_bytes
    t._read_bytes = lambda p: (reads.append(p.toString()) or orig(p))
    try:
        got = t.files_for_range("k", 31, 33, 8)
    finally:
        t._read_bytes = orig
    # same candidate FILE CONTENT (names differ per table: compare by
    # count + the rows they scan)
    assert len(got) == 1
    assert sorted(
        r["k"] for r in t._read_files(got, t._raw_manifest(8)).collect()
    ) == sorted(
        r["k"]
        for r in flat._read_files(want, flat._raw_manifest(8)).collect()
    )
    group_reads = [p for p in reads if "-g" in os.path.basename(p)]
    assert len(group_reads) == 1, group_reads  # 1 of 4 groups decoded
    # unstamped/uncovered ranges and columns stay conservative
    assert len(t.files_for_range("k", None, 200, 8)) == 8
    # pruned + full reads agree end-to-end
    assert sorted(
        r["k"] for r in t.read_range("k", 31, 33, 8).collect()
    ) == list(range(31, 34))


def test_tree_pruned_probe_through_delta_chain(spark, tmp_path):
    """A probe on a DELTA version walks the raw chain: group-pruned
    base candidates minus removes plus adds (adds always kept)."""
    # build the base with interval=1 so the head is a full tree
    # checkpoint, then stack deltas via a second handle with a long
    # interval (same table, different cadence policy)
    t = _tree_table(spark, tmp_path, group=2, interval=1)
    for i in range(6):
        df = spark.range(i * 10, (i + 1) * 10).select(
            F.col("id").alias("k"), F.lit("x").alias("v")
        ).coalesce(1)
        t.write(df, mode="overwrite" if i == 0 else "append")
    t.build_stats(cols=["k"], version=6, method="scan")
    d = _tree_table(spark, tmp_path, group=2, interval=100)
    # deltas on top: one remove-ish rewrite + one add
    d.delete_where("k >= 50")  # v7 (delta: removes the k in [50,60) file)
    d.write(
        spark.range(100, 110).select(
            F.col("id").alias("k"), F.lit("y").alias("v")
        ).coalesce(1),
        mode="append",
    )  # v8 delta
    assert _raw(t, 8).get("delta")
    # stats are per-version: reuse v6's rows for the v8 probe by
    # building v8 stats (incremental covers the new file too)
    d.build_stats(cols=["k"], version=8, method="scan")
    cold = _tree_table(spark, tmp_path, group=2, interval=100)
    got = cold.files_for_range("k", 5, 5, 8)
    # candidate: just the k in [0,10) file (the v8 add has stats and
    # prunes; group stamps keep only its group)
    assert got is not None and 1 <= len(got) <= 2
    assert sorted(
        r["k"] for r in cold.read_range("k", 5, 5, 8).collect()
    ) == [5]
    assert sorted(
        r["k"] for r in cold.read_range("k", 55, 55, 8).collect()
    ) == []
    assert sorted(
        r["k"] for r in cold.read_range("k", 105, 105, 8).collect()
    ) == [105]


def test_tree_vacuum_sweeps_groups_and_keeps_live(spark, tmp_path):
    t = _tree_table(spark, tmp_path, group=2, interval=1)
    for i in range(5):
        t.write(_df(spark, [(i, "x")]).coalesce(1), mode="append")

    def trees():
        return sorted(
            n for n in os.listdir(_mdir(t)) if n.startswith("files-v")
        )

    assert any("-g" in n for n in trees())
    # plant orphans for a KEPT version: a fake stale list + group
    for orphan in (
        "files-v00000005-deadbeef.parquet",
        "files-v00000005-deadbeef-g00000.parquet",
    ):
        with open(os.path.join(_mdir(t), orphan), "wb") as f:
            f.write(b"junk")
    t.vacuum(keep_last=1, unreferenced_grace=0.0)
    names = trees()
    # only v5's real list + groups survive
    assert names and all(n.startswith("files-v00000005") for n in names)
    assert not any("deadbeef" in n for n in names)
    live = _raw(t, 5)
    stem = live["files_ext"][: -len(".parquet")]
    assert all(
        n == live["files_ext"] or n.startswith(stem + "-g")
        for n in names
    )
    cold = _tree_table(spark, tmp_path, group=2, interval=1)
    assert sorted(r["k"] for r in cold.read().collect()) == list(range(5))


def test_tree_streaming_source_resolves(spark, tmp_path):
    """The plain-Python manifest decoder the streaming source uses
    inlines manifest TREES too."""
    t = _tree_table(spark, tmp_path, group=2, interval=1)
    for i in range(4):
        t.write(_df(spark, [(i, "s")]).coalesce(1), mode="append")
    assert _raw(t, 4).get("files_tree")
    from globalweather_etl_spark.streaming import snapshot_source as ss

    root = t.path.removeprefix("file:")
    ss._RESOLVED_CACHE.clear()
    m = ss._manifest(root, 4)
    assert m["files"] == t._manifest(4)["files"]
    assert len(m["files"]) == 4


def test_tree_restamp_updates_existing_head(spark, tmp_path):
    """build_stats on an already-checkpointed tree restamps the
    manifest list in place — pruning applies without a new commit."""
    t = _tree_table(spark, tmp_path, group=1, interval=1)
    for i in range(4):
        df = spark.range(i * 10, (i + 1) * 10).select(
            F.col("id").alias("k"), F.lit("x").alias("v")
        ).coalesce(1)
        t.write(df, mode="overwrite" if i == 0 else "append")
    # head v4 = tree checkpoint written with NO stats -> unstamped
    assert _raw(t, 4).get("files_tree")
    from globalweather_etl_spark.sources.snapshots import (
        _tree_decode_list,
    )

    def _stamps():
        raw = _raw(t, 4)
        lp = os.path.join(_mdir(t), raw["files_ext"])
        with open(lp, "rb") as f:
            return _tree_decode_list(f.read())[1]

    assert _stamps() == {}
    # without stats the probe has no sidecar at all
    assert t.files_for_range("k", 15, 15, 4) is None
    t.build_stats(cols=["k"], version=4, method="scan")
    assert _stamps() != {}  # restamped in place, same list name
    got = t.files_for_range("k", 15, 15, 4)
    assert len(got) == 1  # group=1: per-group stamps == per-file
    assert sorted(
        r["k"] for r in t.read_range("k", 15, 15, 4).collect()
    ) == [15]


# ---------------- stamped DELTA adds (round 13, VERDICT r12 item 1)


def test_delta_add_stamps_written_and_prune(spark, tmp_path):
    """Once zone maps are live, every delta commit's adds carry
    commit-time footer stamps in the raw manifest, and a range probe
    through the chain prunes stamped adds instead of keeping every
    add as an unconditional candidate (the pre-r13 decay)."""
    t = _tree_table(spark, tmp_path, group=2, interval=1)
    for i in range(4):
        df = spark.range(i * 10, (i + 1) * 10).select(
            F.col("id").alias("k"), F.lit("x").alias("v")
        ).coalesce(1)
        t.write(df, mode="overwrite" if i == 0 else "append")
    t.build_stats(cols=["k"], version=4, method="footer")
    # deltas on top via a long-interval handle: disjoint k ranges
    d = _tree_table(spark, tmp_path, group=2, interval=100)
    for i in range(4, 10):
        d.write(
            spark.range(i * 10, (i + 1) * 10).select(
                F.col("id").alias("k"), F.lit("x").alias("v")
            ).coalesce(1),
            mode="append",
        )
    for v in range(5, 11):
        raw = _raw(d, v)
        assert raw.get("delta")
        st = raw.get("add_stamps")
        assert st and all("k" in per for per in st.values()), (v, st)
        for per in st.values():
            kind, mn, mx, nulls, nr = per["k"]
            assert kind == "num" and mn is not None and mx >= mn
            assert nulls == 0 and nr == 10
    # stats are per-version: carry v4's sidecar to v10 incrementally
    d.build_stats(cols=["k"], version=10, method="footer",
                  incremental=True)
    cold = _tree_table(spark, tmp_path, group=2, interval=100)
    reads = []
    orig = cold._read_bytes
    cold._read_bytes = lambda p: (reads.append(p.toString()) or orig(p))
    try:
        got = cold.files_for_range("k", 15, 15, 10)
    finally:
        cold._read_bytes = orig
    # one group decoded from the base tree; every stamped delta add is
    # disjoint from [15, 15] and pruned at replay
    assert len(got) == 1, got
    group_reads = [p for p in reads if "-g" in os.path.basename(p)]
    assert len(group_reads) == 1, group_reads
    # a probe that hits a delta add keeps exactly that add
    got2 = cold.files_for_range("k", 75, 75, 10)
    assert len(got2) == 1, got2
    # end-to-end reads agree
    assert sorted(
        r["k"] for r in cold.read_range("k", 15, 15, 10).collect()
    ) == [15]
    assert sorted(
        r["k"] for r in cold.read_range("k", 75, 75, 10).collect()
    ) == [75]
    assert cold.read_range("k", 200, 300, 10).count() == 0


def test_delta_add_stamps_all_null_and_absent_stats(spark, tmp_path):
    """An all-NULL add prunes for any range (a range never matches
    NULL); a table with NO stats writes no stamps at all — adds stay
    conservative candidates and nothing changes shape."""
    t = _tree_table(spark, tmp_path, group=2, interval=1)
    for i in range(3):
        t.write(
            spark.range(i * 10, (i + 1) * 10).select(
                F.col("id").alias("k"), F.lit("x").alias("v")
            ).coalesce(1),
            mode="overwrite" if i == 0 else "append",
        )
    # no stats yet: delta adds carry no stamps
    d = _tree_table(spark, tmp_path, group=2, interval=100)
    d.write(_df(spark, [(99, "x")]).coalesce(1), mode="append")
    assert _raw(d, 4).get("delta")
    assert "add_stamps" not in _raw(d, 4)
    t.build_stats(cols=["k"], version=4, method="footer")
    # all-NULL k add
    d.write(
        spark.createDataFrame(
            [(None, "n")], "k long, v string"
        ).coalesce(1),
        mode="append",
    )
    raw5 = _raw(d, 5)
    assert raw5.get("delta")
    (per,) = raw5["add_stamps"].values()
    kind, mn, mx, nulls, nr = per["k"]
    assert mn is None and nulls == nr == 1
    d.build_stats(cols=["k"], version=5, method="footer",
                  incremental=True)
    cold = _tree_table(spark, tmp_path, group=2, interval=100)
    got = cold.files_for_range("k", 0, 1000, 5)
    # base files + the unstamped v4 add survive; the all-NULL add is
    # pruned for ANY range
    assert len(got) == 4, got
    assert sorted(
        r["k"] for r in cold.read_range("k", 99, 99, 5).collect()
    ) == [99]


def test_delta_add_stamps_dropped_on_vacuum_rewrite(spark, tmp_path):
    """Vacuum's kept-delta-whose-parent-drops rewrite stores the
    resolved FULL form — stamps go with the delta encoding, and reads
    and probes stay correct through the rewrite."""
    t = _tree_table(spark, tmp_path, group=2, interval=1)
    for i in range(3):
        t.write(
            spark.range(i * 10, (i + 1) * 10).select(
                F.col("id").alias("k"), F.lit("x").alias("v")
            ).coalesce(1),
            mode="overwrite" if i == 0 else "append",
        )
    t.build_stats(cols=["k"], version=3, method="footer")
    d = _tree_table(spark, tmp_path, group=2, interval=100)
    d.write(
        spark.range(100, 110).select(
            F.col("id").alias("k"), F.lit("x").alias("v")
        ).coalesce(1),
        mode="append",
    )
    assert _raw(d, 4).get("delta") and _raw(d, 4).get("add_stamps")
    d.vacuum(keep_last=1, unreferenced_grace=0.0)
    raw = _raw(d, 4)
    assert not raw.get("delta") and "add_stamps" not in raw
    cold = _tree_table(spark, tmp_path, group=2, interval=100)
    assert cold.read().count() == 40
    assert sorted(
        r["k"] for r in cold.read_range("k", 105, 105, 4).collect()
    ) == [105]


@pytest.mark.parametrize("seed", [13, 41])
def test_tree_fuzz_matches_inline_twin(spark, tmp_path, seed):
    """Format fuzz for the manifest tree: a random verb sequence
    (append / overwrite / delete_where / merge / restore / vacuum /
    build_stats) drives a TREE-stored table and an INLINE-stored twin
    in lockstep; after every step the two must agree on content, and
    cold reopen + range probes must agree with the inline twin's
    full listing. Any tree encode/decode/prune divergence localizes
    immediately."""
    import random as _random

    from pyspark.sql import Row

    rng = _random.Random(seed)
    tree = _tree_table(
        spark, tmp_path, name=f"fz{seed}", group=3, interval=3
    )
    flat = SnapshotTable(
        spark,
        str(tmp_path / f"fzref{seed}"),
        checkpoint_interval=3,
        files_ext_threshold=10**9,
    )
    nxt = 0

    def fresh(n):
        nonlocal nxt
        rows = [
            Row(k=nxt + i, v=float((nxt + i) % 97)) for i in range(n)
        ]
        nxt += n
        return spark.createDataFrame(rows).coalesce(2)

    def content(t):
        return sorted(tuple(r) for r in t.read().collect())

    for step in range(14):
        op = rng.choice(
            ["append", "append", "overwrite", "delete", "merge",
             "restore", "vacuum", "stats"]
        )
        if op == "append":
            df = fresh(rng.randrange(1, 6))
            tree.write(df, mode="append")
            flat.write(df, mode="append")
        elif op == "overwrite":
            df = fresh(rng.randrange(2, 7))
            tree.write(df, mode="overwrite")
            flat.write(df, mode="overwrite")
        elif op == "delete":
            if tree.latest_version() is None:
                continue
            m = rng.randrange(2, 5)
            tree.delete_where(f"k % {m} = 0")
            flat.delete_where(f"k % {m} = 0")
        elif op == "merge":
            if tree.latest_version() is None:
                continue
            src = fresh(3)
            tree.merge_into(src, ["k"])
            flat.merge_into(src, ["k"])
        elif op == "restore":
            vs = tree.versions()
            if len(vs) < 2:
                continue
            v = rng.choice(vs[:-1])
            if v not in flat.versions():
                continue
            tree.restore(v)
            flat.restore(v)
        elif op == "vacuum":
            if tree.latest_version() is None:
                continue
            tree.vacuum(keep_last=3, unreferenced_grace=0.0)
            flat.vacuum(keep_last=3, unreferenced_grace=0.0)
        elif op == "stats":
            if tree.latest_version() is None:
                continue
            tree.build_stats(cols=["k"], method="scan")
            flat.build_stats(cols=["k"], method="scan")
        if tree.latest_version() is None:
            continue
        assert content(tree) == content(flat), (seed, step, op)
    # cold reopen: the tree decodes back to the same content, and a
    # pruned range probe equals the flat twin's candidate SCAN result
    cold = _tree_table(
        spark, tmp_path, name=f"fz{seed}", group=3, interval=3
    )
    assert content(cold) == content(flat)
    if cold._fs.exists(cold._zm_meta_path(cold.latest_version())):
        lo = rng.randrange(0, nxt)
        got = sorted(
            r["k"]
            for r in cold.read_range("k", lo, lo + 9).collect()
        )
        want = sorted(
            r["k"]
            for r in flat.read().filter(
                (F.col("k") >= lo) & (F.col("k") <= lo + 9)
            ).collect()
        )
        assert got == want, (seed, lo)


def test_stamped_deltas_leave_cdc_feeds_unchanged(spark, tmp_path):
    """add_stamps is STORAGE metadata only: with zone maps live (so
    every delta commit carries stamps), read_since and read_changes
    return exactly what an unstamped twin returns."""
    import pytest as _pytest

    def build(name, with_stats):
        t = _tree_table(spark, tmp_path, name=name, group=2, interval=1)
        for i in range(3):
            t.write(
                spark.range(i * 10, (i + 1) * 10).select(
                    F.col("id").alias("k"), F.lit("x").alias("v")
                ).coalesce(1),
                mode="overwrite" if i == 0 else "append",
            )
        if with_stats:
            t.build_stats(cols=["k"], version=3, method="footer")
        d = _tree_table(
            spark, tmp_path, name=name, group=2, interval=100
        )
        d.write(
            spark.range(100, 105).select(
                F.col("id").alias("k"), F.lit("y").alias("v")
            ).coalesce(1),
            mode="append",
        )
        return d

    a = build("cdc_stamped", True)
    b = build("cdc_plain", False)
    assert _raw(a, 4).get("add_stamps")  # stamps actually engaged
    assert "add_stamps" not in _raw(b, 4)
    # append-only incremental read over the stamped delta window
    since_a = sorted(
        (r["k"], r["v"]) for r in a.read_since(3).collect()
    )
    since_b = sorted(
        (r["k"], r["v"]) for r in b.read_since(3).collect()
    )
    assert since_a == since_b and since_a
    # keyed-diff CDC across a delete too (v5 on both sides)
    a.delete_where("k >= 102")
    b.delete_where("k >= 102")
    ch_a = sorted(
        (r["k"], r["__op"])
        for r in a.read_changes(3, keys=["k"]).collect()
    )
    ch_b = sorted(
        (r["k"], r["__op"])
        for r in b.read_changes(3, keys=["k"]).collect()
    )
    assert ch_a == ch_b and ch_a
