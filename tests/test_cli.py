"""The CLI must run the whole pipeline and report consistent results."""

from __future__ import annotations

import json


def test_cli_json_mode(spark, tmp_path, capsys):
    from globalweather_etl_spark.__main__ import main

    rc = main(
        [
            "--sf-dir", "/root/testdata/sf0.001",
            "--out", str(tmp_path / "wh"),
            "--master", "local[8]",
            "--json",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["validation"]["null_fk_count"] == 0
    assert len(out["dashboards"]["q4_forecasts_per_band"]) == 5
    assert len(out["dashboards"]["q2_top15_cities"]) <= 15


def test_cli_curate_mode(spark, tmp_path, capsys):
    import json as _json

    from globalweather_etl_spark.__main__ import main

    out = str(tmp_path / "curated")
    rc = main(
        [
            "--mode", "curate",
            "--sf-dir", "/root/testdata/sf0.001",
            "--out", out,
            "--master", "local[4]",
            "--benchmark-mod", "7",
            "--json",
        ]
    )
    assert rc == 0
    payload = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    stages = payload["stages"]
    assert stages["curated"] > 0
    assert stages["curated"] <= stages["exact_deduped"]
    back = spark.read.parquet(out)
    assert {"doc_id", "split", "bin_id", "bin_offset"} <= set(back.columns)
    assert back.count() == stages["curated"]


def test_snapshot_mode(spark, tmp_path, capsys):
    import json as _json

    from globalweather_etl_spark.__main__ import main

    out = str(tmp_path / "snaps")
    for expect_version in (1, 2):
        rc = main(
            [
                "--mode", "snapshot",
                "--sf-dir", "/root/testdata/sf0.001",
                "--out", out,
                "--master", "local[4]",
                "--json",
            ]
        )
        assert rc == 0
        payload = _json.loads(
            capsys.readouterr().out.strip().splitlines()[-1]
        )
        assert payload["committed_version"] == expect_version
    assert payload["head_vs_parent"] == {
        "n_inserted": 0, "n_deleted": 0, "n_updated": 0,
        "n_unchanged": 500,
    }
    assert [h["n_rows"] for h in payload["history"]] == [500, 500]
