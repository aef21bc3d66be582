"""SQL surface for the lakehouse verbs (sources/lakehouse_sql.py):
every statement form parity-tested against the direct Python call on
identical twin tables, plus loud errors for the documented
non-mappable shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.sources.lakehouse_sql import lakehouse_sql
from globalweather_etl_spark.sources.snapshots import SnapshotTable


def _seed(spark, path, n=300):
    t = SnapshotTable(spark, path)
    t.write(
        spark.range(0, n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 9).alias("g"),
            (F.col("id") * 2.5).alias("val"),
        )
        .repartition(4, "k"),
        mode="overwrite",
    )
    return t


def _content(t, version=None):
    return sorted(tuple(r) for r in t.read(version).collect())


def test_select_with_time_travel(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.write(
        spark.range(300, 350).select(
            F.col("id").alias("k"),
            (F.col("id") % 9).alias("g"),
            (F.col("id") * 2.5).alias("val"),
        ),
        mode="append",
    )
    head = lakehouse_sql(
        spark, f"SELECT count(*) AS n FROM '{t.path}'"
    ).collect()[0]["n"]
    v1 = lakehouse_sql(
        spark,
        f"SELECT count(*) AS n FROM '{t.path}' VERSION AS OF 1",
    ).collect()[0]["n"]
    assert (head, v1) == (350, 300)
    # the rewrite leaves the rest of the query to Catalyst
    agg = lakehouse_sql(
        spark,
        f"SELECT g, count(*) AS n FROM '{t.path}' VERSION AS OF 1 "
        "GROUP BY g ORDER BY g",
    ).collect()
    assert len(agg) == 9 and sum(r["n"] for r in agg) == 300


def test_select_timestamp_as_of(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    stamp = t._manifest(1)["committed_at"]
    t.write(
        spark.range(300, 310).select(
            F.col("id").alias("k"),
            (F.col("id") % 9).alias("g"),
            (F.col("id") * 2.5).alias("val"),
        ),
        mode="append",
    )
    n = lakehouse_sql(
        spark,
        f"SELECT count(*) AS n FROM '{t.path}' "
        f"TIMESTAMP AS OF '{stamp}'",
    ).collect()[0]["n"]
    assert n == 300


def test_merge_parity_with_python_api(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    twin = _seed(spark, str(tmp_path / "twin"))
    src = spark.range(250, 320).select(
        F.col("id").alias("k"),
        (F.col("id") % 9).alias("g"),
        F.lit(-1.0).alias("val"),
    )
    src.createOrReplaceTempView("merge_src")
    res = lakehouse_sql(
        spark,
        f"MERGE INTO '{t.path}' AS t USING merge_src AS s "
        "ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    twin.merge_into(src, keys=["k"])
    assert _content(t) == _content(twin)
    assert res["version"] == 2


def test_merge_delete_clause(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    twin = _seed(spark, str(tmp_path / "twin"))
    spark.range(0, 40).select(F.col("id").alias("k")).join(
        t.read(), "k"
    ).createOrReplaceTempView("del_src")
    lakehouse_sql(
        spark,
        f"MERGE INTO '{t.path}' USING del_src ON k = k "
        "WHEN MATCHED THEN DELETE",
    )
    twin.merge_into(
        spark.table("del_src"),
        keys=["k"],
        when_matched="delete",
        when_not_matched="ignore",
    )
    assert _content(t) == _content(twin)


def test_merge_rejects_theta_on_and_bad_actions(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.read().createOrReplaceTempView("src_v")
    with pytest.raises(ValueError, match="conjunction"):
        lakehouse_sql(
            spark,
            f"MERGE INTO '{t.path}' USING src_v ON t.k > s.k",
        )
    # column-level SET lists are SUPPORTED since round 12
    # (merge_into_set); a malformed assignment still fails loudly
    with pytest.raises(ValueError, match="assignment"):
        lakehouse_sql(
            spark,
            f"MERGE INTO '{t.path}' USING src_v ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET val ++ 1",
        )
    with pytest.raises(ValueError, match="unsupported WHEN MATCHED"):
        lakehouse_sql(
            spark,
            f"MERGE INTO '{t.path}' USING src_v ON t.k = s.k "
            "WHEN MATCHED THEN TRUNCATE",
        )


def test_delete_restore_vacuum_clone_optimize(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    twin = _seed(spark, str(tmp_path / "twin"))
    lakehouse_sql(spark, f"DELETE FROM '{t.path}' WHERE k % 10 = 0")
    twin.delete_where("k % 10 = 0")
    assert _content(t) == _content(twin)

    v = lakehouse_sql(
        spark, f"RESTORE '{t.path}' TO VERSION AS OF 1"
    )
    assert v == 3 and len(_content(t)) == 300

    res = lakehouse_sql(
        spark,
        f"OPTIMIZE '{t.path}' ZORDER BY (k, g) "
        "AUTO FULL THRESHOLD 4.0",
    )
    assert res["version"] == 4 and "overlap_depth" in res

    cl = lakehouse_sql(
        spark,
        f"CREATE TABLE '{tmp_path / 'c'}' CLONE '{t.path}' "
        "VERSION AS OF 1",
    )
    assert _content(cl) == _content(t, 1)

    plan = lakehouse_sql(
        spark, f"VACUUM '{t.path}' RETAIN 1 VERSIONS DRY RUN"
    )
    assert plan["dry_run"] is True and plan["manifests_removed"] == 3
    rep = lakehouse_sql(
        spark, f"VACUUM '{t.path}' RETAIN 1 VERSIONS"
    )
    assert rep["manifests_removed"] == 3
    assert t.versions() == [4]


def test_passthrough_plain_sql(spark, tmp_path):
    out = lakehouse_sql(spark, "SELECT 1 + 1 AS two").collect()
    assert out[0]["two"] == 2


def test_string_literals_are_not_table_paths(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), n=20)
    out = lakehouse_sql(
        spark,
        f"SELECT count(*) AS n FROM '{t.path}' WHERE 'x' = 'x'",
    ).collect()
    assert out[0]["n"] == 20


def test_bare_optimize_is_compaction(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.write(
        spark.range(300, 330).select(
            F.col("id").alias("k"),
            (F.col("id") % 9).alias("g"),
            (F.col("id") * 2.5).alias("val"),
        ),
        mode="append",
    )
    before = _content(t)
    res = lakehouse_sql(spark, f"OPTIMIZE '{t.path}'")
    assert res["version"] == 3
    assert len(t._manifest(3)["files"]) < len(t._manifest(2)["files"])
    assert _content(t) == before
    with pytest.raises(ValueError, match="ZORDER BY or"):
        lakehouse_sql(spark, f"OPTIMIZE '{t.path}' FULL")


# --- round 10 second half: DESCRIBE HISTORY and the INSERT family ----


def test_describe_history(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), n=20)
    t.write(
        spark.range(20, 25).select(
            F.col("id").alias("k"),
            (F.col("id") % 9).alias("g"),
            (F.col("id") * 2.5).alias("val"),
        ),
        mode="append",
    )
    rows = (
        lakehouse_sql(spark, f"DESCRIBE HISTORY '{t.path}'")
        .orderBy("version")
        .collect()
    )
    hist = t.history()
    assert [(r["version"], r["mode"], r["n_files"], r["n_rows"])
            for r in rows] == [
        (h.version, h.mode, h.n_files, h.n_rows) for h in hist
    ]
    assert rows[-1]["n_rows"] == 25


def test_insert_into_appends(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), n=10)
    res = lakehouse_sql(
        spark,
        f"INSERT INTO '{t.path}' "
        "SELECT id AS k, id % 9 AS g, CAST(id * 2.5 AS DOUBLE) AS val FROM range(10, 13)",
    )
    assert res["version"] == 2
    assert sorted(r["k"] for r in t.read().collect()) == list(range(13))


def test_insert_overwrite_replaces_table(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), n=10)
    res = lakehouse_sql(
        spark,
        f"INSERT OVERWRITE '{t.path}' "
        "SELECT id AS k, id % 9 AS g, CAST(id * 2.5 AS DOUBLE) AS val FROM range(100, 103)",
    )
    assert res["version"] == 2
    assert sorted(r["k"] for r in t.read().collect()) == [100, 101, 102]
    # time travel still sees the pre-overwrite state
    assert len(_content(t, version=1)) == 10


def test_insert_replace_where_parity_with_python(spark, tmp_path):
    sql_t = _seed(spark, str(tmp_path / "a"), n=30)
    py_t = _seed(spark, str(tmp_path / "b"), n=30)
    band = (
        "SELECT id AS k, id % 9 AS g, CAST(id * 2.5 AS DOUBLE) AS val FROM range(0, 5)"
    )
    res = lakehouse_sql(
        spark,
        f"INSERT INTO '{sql_t.path}' REPLACE WHERE k < 10 {band}",
    )
    py_res = py_t.replace_where(spark.sql(band), "k < 10")
    assert res["n_replaced"] == py_res["n_replaced"] == 10
    assert _content(sql_t) == _content(py_t)


def test_insert_select_can_time_travel_from_another_table(spark, tmp_path):
    src = _seed(spark, str(tmp_path / "src"), n=6)
    src.write(
        spark.range(6, 9).select(
            F.col("id").alias("k"),
            (F.col("id") % 9).alias("g"),
            (F.col("id") * 2.5).alias("val"),
        ),
        mode="append",
    )
    dst = _seed(spark, str(tmp_path / "dst"), n=0)
    lakehouse_sql(
        spark,
        f"INSERT INTO '{dst.path}' "
        f"SELECT * FROM '{src.path}' VERSION AS OF 1",
    )
    assert sorted(r["k"] for r in dst.read().collect()) == list(range(6))


def test_insert_overwrite_rejects_replace_where(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), n=5)
    with pytest.raises(ValueError, match="REPLACE WHERE"):
        lakehouse_sql(
            spark,
            f"INSERT OVERWRITE '{t.path}' REPLACE WHERE k < 2 "
            "SELECT id AS k, id % 9 AS g, CAST(id * 2.5 AS DOUBLE) AS val FROM range(2)",
        )


def test_insert_replace_where_rejects_type_conflict(spark, tmp_path):
    """A SELECT whose column types drift from the table schema (here
    DECIMAL where the table holds DOUBLE) must fail loudly instead of
    landing files that contradict the manifest schema."""
    t = _seed(spark, str(tmp_path / "t"), n=10)
    with pytest.raises(ValueError, match="type conflict"):
        lakehouse_sql(
            spark,
            f"INSERT INTO '{t.path}' REPLACE WHERE k < 5 "
            "SELECT id AS k, id % 9 AS g, id * 2.5 AS val FROM range(5)",
        )


# ------------------------------- transactional statement lists


def test_txn_statement_list_commits_atomically(spark, tmp_path):
    from globalweather_etl_spark.sources.catalog import SnapshotCatalog
    from globalweather_etl_spark.sources.lakehouse_sql import (
        lakehouse_sql_txn,
    )

    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    versions = lakehouse_sql_txn(spark, cat, [
        "INSERT OVERWRITE 'dim' SELECT id AS k, id % 3 AS g FROM range(9)",
        "INSERT OVERWRITE 'fact' "
        "SELECT id AS k, CAST(id * 1.5 AS DOUBLE) AS v FROM range(20)",
    ], parallelism=2)
    assert set(versions) == {"dim", "fact"}
    assert cat.table("dim").read(versions["dim"]).count() == 9
    assert cat.table("fact").read(versions["fact"]).count() == 20
    # append composes too, and the select may time-travel
    versions2 = lakehouse_sql_txn(spark, cat, [
        f"INSERT INTO 'fact' SELECT * FROM '{cat.root}/fact' "
        f"VERSION AS OF {versions['fact']}",
    ])
    assert cat.table("fact").read(versions2["fact"]).count() == 40


def test_txn_full_verb_set_composes(spark, tmp_path):
    """DELETE FROM, MERGE INTO, and INSERT ... REPLACE WHERE run as
    staged rewrite verbs inside one transaction; an unknown verb still
    rejects loudly and leaks nothing."""
    from globalweather_etl_spark.sources.catalog import SnapshotCatalog
    from globalweather_etl_spark.sources.lakehouse_sql import (
        lakehouse_sql_txn,
    )

    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    cat.table("t").write(
        spark.range(10).selectExpr("id AS k", "id * 2 AS v"),
        mode="overwrite",
    )
    cat.table("u").write(
        spark.range(10).selectExpr("id AS k", "id * 2 AS v"),
        mode="overwrite",
    )
    spark.range(3).selectExpr(
        "id AS k", "id * 100 AS v"
    ).createOrReplaceTempView("merge_src")
    versions = lakehouse_sql_txn(spark, cat, [
        "DELETE FROM 't' WHERE k >= 5",
        "MERGE INTO 'u' USING merge_src AS s ON u.k = s.k",
    ])
    assert cat.table("t").read(versions["t"]).count() == 5
    u = cat.table("u").read(versions["u"])
    assert u.count() == 10
    assert u.filter("v >= 100").count() == 2  # k=1,2 updated (k=0: v=0)
    # replace-where composes under INSERT INTO
    versions2 = lakehouse_sql_txn(spark, cat, [
        "INSERT INTO 't' REPLACE WHERE k < 2 "
        "SELECT id AS k, CAST(999 AS BIGINT) AS v FROM range(2)",
    ])
    t = cat.table("t").read(versions2["t"])
    assert t.filter("v = 999").count() == 2
    # unknown verbs still reject, atomically
    with pytest.raises(ValueError, match="not transactional"):
        lakehouse_sql_txn(spark, cat, ["OPTIMIZE 't'"])
    assert cat.table("t").read().count() == 5
    with pytest.raises(ValueError, match="REPLACE WHERE composes"):
        lakehouse_sql_txn(spark, cat, [
            "INSERT OVERWRITE 't' REPLACE WHERE k < 1 SELECT 5 AS k",
        ])


def test_txn_statement_failure_aborts_all(spark, tmp_path):
    from globalweather_etl_spark.sources.catalog import SnapshotCatalog
    from globalweather_etl_spark.sources.lakehouse_sql import (
        lakehouse_sql_txn,
    )

    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    cat.table("a").write(
        spark.range(2).selectExpr("id AS k"), mode="overwrite"
    )
    with pytest.raises(Exception):
        lakehouse_sql_txn(spark, cat, [
            "INSERT OVERWRITE 'a' SELECT id AS k FROM range(50)",
            "INSERT OVERWRITE 'b' SELECT assert_true(id < 1) AS boom "
            "FROM range(5)",
        ])
    assert cat.table("a").read().count() == 2  # untouched


def test_optimize_using_hilbert(spark, tmp_path):
    from globalweather_etl_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "h"))
    t.write(
        spark.range(500).selectExpr(
            "id AS k", "CAST(id % 37 AS DOUBLE) AS u"
        ),
        mode="overwrite",
    )
    res = lakehouse_sql(
        spark,
        f"OPTIMIZE '{t.path}' ZORDER BY (k, u) USING HILBERT FULL",
    )
    assert res["full"] is True
    assert t.clustering_state()["curve"] == "hilbert"
    assert t.read().count() == 500
    with pytest.raises(ValueError, match="USING"):
        lakehouse_sql(
            spark, f"OPTIMIZE '{t.path}' CLUSTER BY (k) USING HILBERT"
        )


# ------------------------- BEGIN/COMMIT transaction scripts (r11)


def test_script_parity_with_statement_list(spark, tmp_path):
    from globalweather_etl_spark.sources.catalog import SnapshotCatalog
    from globalweather_etl_spark.sources.lakehouse_sql import (
        lakehouse_sql_script,
        lakehouse_sql_txn,
    )

    cat_a = SnapshotCatalog(spark, str(tmp_path / "a"))
    cat_b = SnapshotCatalog(spark, str(tmp_path / "b"))
    stmts = [
        "INSERT OVERWRITE 'dim' SELECT id AS k, id % 3 AS g FROM range(9)",
        "INSERT OVERWRITE 'fact' "
        "SELECT id AS k, CAST(id * 1.5 AS DOUBLE) AS v FROM range(20)",
    ]
    va = lakehouse_sql_txn(spark, cat_a, stmts)
    vb = lakehouse_sql_script(
        spark, cat_b, "BEGIN;\n" + ";\n".join(stmts) + ";\nCOMMIT;"
    )
    assert va == vb
    for name in ("dim", "fact"):
        a = sorted(map(str, cat_a.table(name).read().collect()))
        b = sorted(map(str, cat_b.table(name).read().collect()))
        assert a == b, name


def test_script_verbs_and_rollback(spark, tmp_path):
    from globalweather_etl_spark.sources.catalog import SnapshotCatalog
    from globalweather_etl_spark.sources.lakehouse_sql import (
        lakehouse_sql_script,
    )

    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    lakehouse_sql_script(spark, cat, """
        BEGIN TRANSACTION;
        INSERT OVERWRITE 'fact'
          SELECT id AS k, CAST(id AS DOUBLE) AS v FROM range(10);
        COMMIT;
    """)
    # DELETE composes inside the bracket; a ROLLBACK script changes
    # nothing and returns {}
    assert lakehouse_sql_script(spark, cat, """
        BEGIN;
        DELETE FROM 'fact' WHERE k < 999;
        ROLLBACK;
    """) == {}
    assert cat.table("fact").read().count() == 10
    v = lakehouse_sql_script(spark, cat, """
        BEGIN WORK;
        DELETE FROM 'fact' WHERE k >= 8;
        COMMIT WORK;
    """)
    assert cat.table("fact").read(v["fact"]).count() == 8


def test_script_bracket_is_mandatory(spark, tmp_path):
    import pytest as _pytest

    from globalweather_etl_spark.sources.catalog import SnapshotCatalog
    from globalweather_etl_spark.sources.lakehouse_sql import (
        lakehouse_sql_script,
    )

    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    with _pytest.raises(ValueError, match="must open with BEGIN"):
        lakehouse_sql_script(
            spark, cat,
            "INSERT OVERWRITE 't' SELECT 1 AS k; COMMIT;",
        )
    with _pytest.raises(ValueError, match="must close with COMMIT"):
        lakehouse_sql_script(
            spark, cat,
            "BEGIN; INSERT OVERWRITE 't' SELECT 1 AS k;",
        )


def test_changes_table_function(spark, tmp_path):
    from globalweather_etl_spark.sources.lakehouse_sql import (
        lakehouse_sql,
    )
    from globalweather_etl_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(6)], "k long, v double"
        ),
        mode="overwrite",
    )
    t.merge_into(
        spark.createDataFrame([(2, 99.0), (7, 7.0)], "k long, v double"),
        ["k"],
    )
    rows = lakehouse_sql(
        spark,
        f"SELECT __op, k, v FROM CHANGES('{t.path}', 1, 2, KEY (k)) "
        "ORDER BY k, __op",
    ).collect()
    got = [(r["__op"], r["k"], r["v"]) for r in rows]
    # update of k=2: -1 old side, +1 new side; insert of k=7: +1
    assert got == [(-1, 2, 2.0), (1, 2, 99.0), (1, 7, 7.0)]
    # composes with aggregation and a plain snapshot read in one text
    agg = lakehouse_sql(
        spark,
        f"SELECT sum(__op) AS net FROM CHANGES('{t.path}', 1, 2, KEY (k))",
    ).collect()[0]["net"]
    assert agg == 1  # one net new row


def test_changes_bad_path_is_loud_and_makes_no_dirs(spark, tmp_path):
    """A typo'd CHANGES() path must raise a 'not a table root' error
    WITHOUT first mkdir-ing _manifests/_data at the bogus location
    (the SnapshotTable constructor would)."""
    import os

    bogus = str(tmp_path / "no_such_table")
    with pytest.raises(ValueError, match="not a snapshot table root"):
        lakehouse_sql(
            spark,
            f"SELECT * FROM CHANGES('{bogus}', 1, 2, KEY (k))",
        )
    assert not os.path.exists(bogus)


def test_travel_temp_views_are_dropped(spark, tmp_path):
    """Each AS OF / CHANGES() query registers uuid temp views for the
    rewrite; they must be dropped after execution — otherwise every
    query leaks one view into the session catalog forever."""
    t = _seed(spark, str(tmp_path / "t"), n=20)
    t.merge_into(
        spark.createDataFrame([(2, 1, 9.0)], "k long, g long, val double"),
        ["k"],
    )

    def _leaked():
        return [
            v.name
            for v in spark.catalog.listTables()
            if v.name.startswith("__snap_") or v.name.startswith("__chg_")
        ]

    before = _leaked()
    df = lakehouse_sql(
        spark, f"SELECT count(*) AS n FROM '{t.path}' VERSION AS OF 1"
    )
    assert df.collect()[0]["n"] == 20  # dropped view still executes
    rows = lakehouse_sql(
        spark,
        f"SELECT count(*) AS n FROM CHANGES('{t.path}', 1, 2, KEY (k))",
    ).collect()
    assert rows[0]["n"] == 2
    assert _leaked() == before


def test_geo_sql_table_functions_parity(spark, tmp_path):
    """GEO_RADIUS_JOIN / GEO_KNN_JOIN parity vs the DataFrame forms,
    over both operand spellings (temp view and quoted snapshot
    path)."""
    from pyspark.sql import Row

    from globalweather_etl_spark.operators.geo import (
        planar_knn_join,
        planar_knn_join_complete,
        planar_radius_join,
    )

    a = spark.createDataFrame(
        [Row(id=i, x=i * 7 % 50, y=i * 13 % 50) for i in range(40)]
    )
    b = spark.createDataFrame(
        [Row(bid=j, bx=j * 11 % 50, by=j * 3 % 50) for j in range(30)]
    )
    a.createOrReplaceTempView("geo_l")
    b.createOrReplaceTempView("geo_r")

    want = sorted(
        (r["id"], r["bid"], r["dist2"])
        for r in planar_radius_join(
            a, b, 9, left_cols=("x", "y"), right_cols=("bx", "by")
        ).collect()
    )
    got = sorted(
        (r["id"], r["bid"], r["dist2"])
        for r in lakehouse_sql(
            spark,
            "SELECT * FROM GEO_RADIUS_JOIN(geo_l (x, y), "
            "geo_r (bx, by), RADIUS 9)",
        ).collect()
    )
    assert got == want and want

    # bounded kNN + projection/aggregation composing over the result
    want_k = sorted(
        (r["id"], r["bid"], r["knn_rank"])
        for r in planar_knn_join(
            a, b, 2, 15, "id",
            left_cols=("x", "y"), right_cols=("bx", "by"),
            right_id="bid",
        ).collect()
    )
    got_k = sorted(
        (r["id"], r["bid"], r["knn_rank"])
        for r in lakehouse_sql(
            spark,
            "SELECT id, bid, knn_rank FROM GEO_KNN_JOIN("
            "geo_l id (x, y), geo_r bid (bx, by), K 2, RADIUS 15)",
        ).collect()
    )
    assert got_k == want_k and want_k

    # COMPLETE spelling == the expanding-ring operator
    want_c = sorted(
        (r["id"], r["bid"], r["knn_rank"])
        for r in planar_knn_join_complete(
            a, b, 2, 1, "id",
            left_cols=("x", "y"), right_cols=("bx", "by"),
            right_id="bid",
        ).collect()
    )
    got_c = sorted(
        (r["id"], r["bid"], r["knn_rank"])
        for r in lakehouse_sql(
            spark,
            "SELECT id, bid, knn_rank FROM GEO_KNN_JOIN("
            "geo_l id (x, y), geo_r bid (bx, by), K 2, RADIUS 1, "
            "COMPLETE)",
        ).collect()
    )
    assert got_c == want_c and len(want_c) == 40 * 2

    # quoted snapshot-path operand + loud non-root error
    t = SnapshotTable(spark, str(tmp_path / "geo_t"))
    t.write(b, mode="overwrite")
    got_p = sorted(
        (r["id"], r["bid"], r["dist2"])
        for r in lakehouse_sql(
            spark,
            f"SELECT * FROM GEO_RADIUS_JOIN(geo_l (x, y), "
            f"'{t.path}' (bx, by), RADIUS 9)",
        ).collect()
    )
    assert got_p == want
    import os

    bogus = str(tmp_path / "nope")
    with pytest.raises(ValueError, match="not a snapshot table root"):
        lakehouse_sql(
            spark,
            f"SELECT * FROM GEO_RADIUS_JOIN(geo_l (x, y), "
            f"'{bogus}' (bx, by), RADIUS 9)",
        )
    assert not os.path.exists(bogus)
    # no leaked __geo_ views
    assert not [
        v.name
        for v in spark.catalog.listTables()
        if v.name.startswith("__geo_")
    ]
    spark.catalog.dropTempView("geo_l")
    spark.catalog.dropTempView("geo_r")


def test_geo_sphere_sql_parity(spark):
    """GEO_SPHERE_JOIN parity vs the DataFrame form, including the
    MAXLAT operand."""
    from pyspark.sql import Row

    from globalweather_etl_spark.operators.geo import (
        sphere_radius_join_km,
    )

    import random as _random

    rng = _random.Random(5)
    a = spark.createDataFrame(
        [
            Row(id=i, lat=rng.uniform(-50, 50), lon=rng.uniform(-180, 180))
            for i in range(30)
        ]
    )
    b = spark.createDataFrame(
        [
            Row(bid=j, blat=rng.uniform(-50, 50),
                blon=rng.uniform(-180, 180))
            for j in range(25)
        ]
    )
    a.createOrReplaceTempView("sph_l")
    b.createOrReplaceTempView("sph_r")
    want = sorted(
        (r["id"], r["bid"], float(r["sphere_km_r6"]))
        for r in sphere_radius_join_km(
            a, b, 2500.0, "id", "bid",
            ("lat", "lon"), ("blat", "blon"), max_abs_lat=55.0,
        ).collect()
    )
    got = sorted(
        (r["id"], r["bid"], float(r["sphere_km_r6"]))
        for r in lakehouse_sql(
            spark,
            "SELECT * FROM GEO_SPHERE_JOIN(sph_l id (lat, lon), "
            "sph_r bid (blat, blon), KM 2500.0, MAXLAT 55.0)",
        ).collect()
    )
    assert got == want and want
    spark.catalog.dropTempView("sph_l")
    spark.catalog.dropTempView("sph_r")


def test_merge_column_level_set(spark, tmp_path):
    """ANSI column-level UPDATE SET: expressions over t.* and s.*,
    matched-only and insert forms, SQL vs Python parity, and the
    loud guards."""
    from pyspark.sql import Row

    def seed(name):
        t = SnapshotTable(spark, str(tmp_path / name))
        t.write(
            spark.createDataFrame(
                [Row(k=i, bal=float(100 * i), tag="old") for i in range(6)]
            ).repartition(2),
            mode="overwrite",
        )
        return t

    src = spark.createDataFrame(
        [Row(k=2, delta=5.0), Row(k=4, delta=-7.0), Row(k=99, delta=1.0)]
    )
    # matched-only (source lacks bal/tag): t.bal grows by s.delta,
    # tag is stamped; unmatched source key 99 is ignored
    t1 = seed("m1")
    r = t1.merge_into_set(
        src, ["k"],
        {"bal": "t.bal + s.delta", "tag": "'bumped'"},
        when_not_matched="ignore",
    )
    assert r["version"] == 2
    got = {
        r2["k"]: (r2["bal"], r2["tag"]) for r2 in t1.read().collect()
    }
    assert got[2] == (205.0, "bumped") and got[4] == (393.0, "bumped")
    assert got[0] == (0.0, "old") and len(got) == 6

    # SQL spelling parity (greatest() exercises the paren-aware
    # assignment splitter)
    t2 = seed("m2")
    src.createOrReplaceTempView("set_src")
    lakehouse_sql(
        spark,
        f"MERGE INTO '{t2.path}' AS t USING set_src AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET bal = greatest(t.bal + s.delta, "
        "0.0), tag = 'bumped'",
    )
    assert {
        r2["k"]: (r2["bal"], r2["tag"]) for r2 in t2.read().collect()
    } == got

    # insert form needs full source columns; with them, unmatched
    # rows insert s.* verbatim
    t3 = seed("m3")
    full = spark.createDataFrame(
        [Row(k=2, bal=1.0, tag="s"), Row(k=99, bal=9.0, tag="new")]
    )
    t3.merge_into_set(full, ["k"], {"bal": "t.bal + s.bal"})
    got3 = {
        r2["k"]: (r2["bal"], r2["tag"]) for r2 in t3.read().collect()
    }
    assert got3[2] == (201.0, "old")  # tag not in SET -> t's value
    assert got3[99] == (9.0, "new")
    assert len(got3) == 7

    # guards
    with pytest.raises(ValueError, match="keys identify the row"):
        t3.merge_into_set(full, ["k"], {"k": "s.k + 1"})
    with pytest.raises(ValueError, match="unknown column"):
        t3.merge_into_set(full, ["k"], {"nope": "1"})
    with pytest.raises(ValueError, match="needs every table column"):
        t3.merge_into_set(src, ["k"], {"bal": "t.bal + s.delta"})
    with pytest.raises(ValueError, match="SET twice"):
        lakehouse_sql(
            spark,
            f"MERGE INTO '{t3.path}' USING set_src AS s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET bal = 1, bal = 2",
        )
    spark.catalog.dropTempView("set_src")


def test_describe_detail_and_changes_timestamps(spark, tmp_path):
    """DESCRIBE DETAIL is metadata-only (raw manifest; tree listings
    never decode), and CHANGES() accepts TIMESTAMP bounds resolved
    via version_asof."""
    import time as _time

    t = _seed(spark, str(tmp_path / "t"), n=40)
    ts_after_v1 = _time.time()
    _time.sleep(0.05)
    t.merge_into(
        spark.createDataFrame(
            [(2, 1, 9.0), (999, 0, 1.0)], "k long, g long, val double"
        ),
        ["k"],
    )
    d = lakehouse_sql(spark, f"DESCRIBE DETAIL '{t.path}'")
    assert d["version"] == 2 and d["n_rows"] == 41
    assert d["stored_form"] in ("inline", "flat-sidecar", "tree", "delta")
    assert d["n_files"] >= 1 and d["tags"] == {}
    t.create_tag("pin", version=1)
    d1 = lakehouse_sql(
        spark, f"DESCRIBE DETAIL '{t.path}' VERSION AS OF 1"
    )
    assert d1["version"] == 1 and d1["n_rows"] == 40
    assert d1["tags"] == {"pin": 1}
    dtag = lakehouse_sql(
        spark, f"DESCRIBE DETAIL '{t.path}' VERSION AS OF 'pin'"
    )
    assert dtag == d1

    # TIMESTAMP bound == the version bound it resolves to
    want = lakehouse_sql(
        spark,
        f"SELECT sum(__op) AS net FROM CHANGES('{t.path}', 1, 2, "
        "KEY (k))",
    ).collect()[0]["net"]
    got = lakehouse_sql(
        spark,
        f"SELECT sum(__op) AS net FROM CHANGES('{t.path}', "
        f"TIMESTAMP '{ts_after_v1}', 2, KEY (k))",
    ).collect()[0]["net"]
    assert got == want == 1

    # DETAIL on a TREE table reads zero group sidecars
    tt = SnapshotTable(
        spark, str(tmp_path / "tree"),
        files_ext_threshold=1, files_tree_threshold=1,
        files_tree_group=2, checkpoint_interval=1,
    )
    for i in range(5):
        tt.write(
            spark.createDataFrame(
                [(i, 0, float(i))], "k long, g long, val double"
            ).coalesce(1),
            mode="append",
        )
    reads = []
    orig = tt._read_bytes
    tt._read_bytes = lambda p: (reads.append(p.toString()) or orig(p))
    try:
        dt = lakehouse_sql(spark, f"DESCRIBE DETAIL '{tt.path}'")
    finally:
        tt._read_bytes = orig
    assert dt["stored_form"] == "tree" and dt["n_files"] == 5
    # the instrumented handle is not the one lakehouse_sql builds, so
    # assert via a direct call too
    reads2 = []
    orig2 = tt._read_bytes
    tt._read_bytes = lambda p: (reads2.append(p.toString()) or orig2(p))
    try:
        raw = tt._raw_manifest(5)
        assert raw.get("files_tree") and raw["n_files"] == 5
    finally:
        tt._read_bytes = orig2
    assert not [p for p in reads2 if "files-v" in p]


def test_geo_pip_sql_parity(spark):
    """GEO_PIP_JOIN parity vs the DataFrame form."""
    from pyspark.sql import Row
    from pyspark.sql.types import (
        ArrayType, LongType, StructField, StructType,
    )

    from globalweather_etl_spark.operators.geo import (
        planar_point_in_polygon_join,
    )

    pts = spark.createDataFrame(
        [Row(id=i, x=(i * 13) % 40, y=(i * 7) % 40) for i in range(50)]
    )
    schema = StructType(
        [
            StructField("pg_id", LongType()),
            StructField(
                "vertices",
                ArrayType(
                    StructType(
                        [
                            StructField("x", LongType()),
                            StructField("y", LongType()),
                        ]
                    )
                ),
            ),
        ]
    )
    polys = spark.createDataFrame(
        [
            (0, [(0, 0), (20, 0), (20, 20), (0, 20)]),
            (1, [(10, 10), (35, 12), (22, 38)]),
        ],
        schema,
    )
    pts.createOrReplaceTempView("pip_l")
    polys.createOrReplaceTempView("pip_r")
    want = sorted(
        (r["id"], r["pg_id"])
        for r in planar_point_in_polygon_join(
            pts, polys, "id", "pg_id"
        ).collect()
    )
    got = sorted(
        (r["id"], r["pg_id"])
        for r in lakehouse_sql(
            spark,
            "SELECT id, pg_id FROM GEO_PIP_JOIN(pip_l id (x, y), "
            "pip_r pg_id (vertices))",
        ).collect()
    )
    assert got == want and want
    spark.catalog.dropTempView("pip_l")
    spark.catalog.dropTempView("pip_r")


def test_geo_pip_sphere_sql_parity(spark):
    """GEO_PIP_JOIN ... SPHERE parity vs sphere_point_in_polygon_join,
    including MAXLAT/MAXEDGE passthrough (round 13)."""
    from pyspark.sql import Row
    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType,
    )

    from globalweather_etl_spark.operators.geo import (
        sphere_point_in_polygon_join,
    )

    pts = spark.createDataFrame(
        [
            Row(id=i, lat=float((i * 13) % 40) - 20.0,
                lon=float((i * 7) % 80) - 40.0)
            for i in range(50)
        ]
    )
    schema = StructType(
        [
            StructField("gpg_id", LongType()),
            StructField(
                "vertices",
                ArrayType(
                    StructType(
                        [
                            StructField("lat", DoubleType()),
                            StructField("lon", DoubleType()),
                        ]
                    )
                ),
            ),
        ]
    )
    polys = spark.createDataFrame(
        [
            (0, [(-10.0, -10.0), (10.0, -10.0), (10.0, 10.0),
                 (-10.0, 10.0)]),
            (1, [(5.0, 5.0), (18.0, 6.0), (11.0, 19.0)]),
        ],
        schema,
    )
    pts.createOrReplaceTempView("gpip_l")
    polys.createOrReplaceTempView("gpip_r")
    want = sorted(
        (r["id"], r["gpg_id"])
        for r in sphere_point_in_polygon_join(
            pts, polys, "id", "gpg_id", max_abs_lat=60.0,
            max_edge_deg=45.0,
        ).collect()
    )
    got = sorted(
        (r["id"], r["gpg_id"])
        for r in lakehouse_sql(
            spark,
            "SELECT id, gpg_id FROM GEO_PIP_JOIN(gpip_l id (lat, lon),"
            " gpip_r gpg_id (vertices), SPHERE MAXLAT 60 MAXEDGE 45)",
        ).collect()
    )
    assert got == want and want
    # the planar spelling still parses unchanged (no SPHERE flag)
    spark.catalog.dropTempView("gpip_l")
    spark.catalog.dropTempView("gpip_r")


def test_geo_sphere_knn_sql_parity(spark):
    """GEO_SPHERE_JOIN ... K k parity vs sphere_knn_join_km
    (round 13)."""
    from pyspark.sql import Row

    from globalweather_etl_spark.operators.geo import (
        sphere_knn_join_km,
    )

    a = spark.createDataFrame(
        [Row(aid=i, lat=float(i), lon=float(2 * i)) for i in range(6)]
    )
    b = spark.createDataFrame(
        [
            Row(bid=j, rlat=float(j) / 2 + 0.1, rlon=float(j) + 0.2)
            for j in range(10)
        ]
    )
    a.createOrReplaceTempView("sknn_l")
    b.createOrReplaceTempView("sknn_r")
    want = sorted(
        (r["aid"], r["bid"], r["knn_rank"])
        for r in sphere_knn_join_km(
            a, b, 2, 500.0, left_id="aid", right_id="bid",
            max_abs_lat=70.0,
        ).collect()
    )
    got = sorted(
        (r["aid"], r["bid"], r["knn_rank"])
        for r in lakehouse_sql(
            spark,
            "SELECT aid, bid, knn_rank FROM GEO_SPHERE_JOIN("
            "sknn_l aid (lat, lon), sknn_r bid (rlat, rlon), "
            "KM 500, K 2, MAXLAT 70)",
        ).collect()
    )
    assert got == want and want
    spark.catalog.dropTempView("sknn_l")
    spark.catalog.dropTempView("sknn_r")


def test_quoted_nonpath_literal_survives_travel_rewrite(spark):
    """Regression (round 13): _TRAVEL matches ANY quoted string, and a
    non-path literal like concat_ws's ':' separator made Hadoop's
    Path constructor throw URISyntaxException inside _is_table_root
    instead of being skipped as not-a-table-root."""
    spark.range(3).selectExpr(
        "id AS a", "id * 2 AS b"
    ).createOrReplaceTempView("lit_t")
    got = lakehouse_sql(
        spark,
        "SELECT concat_ws(':', a, b) AS s, ',' AS comma, '' AS empty "
        "FROM lit_t ORDER BY a",
    ).collect()
    assert [r["s"] for r in got] == ["0:0", "1:2", "2:4"]
    spark.catalog.dropTempView("lit_t")
