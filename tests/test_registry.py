"""Landing-zone relation cache (sources/registry.py): memoization,
the refresh escape hatch, and conf re-pinning on cache hits."""

from __future__ import annotations

from pyspark.sql import functions as F

from globalweather_etl_spark.sources.registry import load_table


def _write(spark, path, cols):
    df = spark.range(0, 5)
    for name, expr in cols:
        df = df.withColumn(name, expr)
    df.write.mode("overwrite").parquet(path)


def test_refresh_re_resolves_a_rewritten_path(spark, tmp_path):
    """The memo assumes immutable landing paths; refresh=True is the
    documented escape hatch when a path IS rewritten."""
    sf = str(tmp_path)
    path = f"{sf}/region.parquet"
    _write(spark, path, [("a", F.lit(1))])
    first = load_table(spark, sf, "region")
    assert "a" in first.columns
    # memo hit: same plan object back
    assert load_table(spark, sf, "region") is first

    _write(spark, path, [("a", F.lit(1)), ("b", F.lit(2.0))])
    # without refresh the stale relation is served (documented)
    assert "b" not in load_table(spark, sf, "region").columns
    fresh = load_table(spark, sf, "region", refresh=True)
    assert "b" in fresh.columns
    # the refreshed relation replaces the memo entry
    assert load_table(spark, sf, "region") is fresh


def test_confs_repinned_on_cache_hit(spark, tmp_path):
    """A foreign session may flip timeZone between calls; a cache hit
    must re-pin it (the cached plan is lazy — it executes under
    whatever confs are live at action time)."""
    sf = str(tmp_path)
    _write(spark, f"{sf}/nation.parquet", [("a", F.lit(1))])
    load_table(spark, sf, "nation")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        load_table(spark, sf, "nation")  # cache hit
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
