"""SparkSession factory with scale-oriented defaults.

The reference delegates all execution tuning to Snowflake's service
(sql/ETL_GlobalWeather_DB.sql has zero hints/clustering keys); our
equivalent contract is "Catalyst + AQE with sane defaults". Every knob
here is a public Spark conf.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "globalweather-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Defaults chosen for 100 TB-mindset even on local[*]:
      - AQE on: runtime partition coalescing, skew-join splitting, and
        dynamic broadcast decisions replace hand-scheduling.
      - UTC session timezone: date/window semantics independent of host TZ.
      - Arrow enabled: Pandas-UDF paths (multimodal/similarity) get
        columnar batch transfer instead of pickled rows.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = {
        "spark.sql.session.timeZone": "UTC",
        # The landing zone stores TIMESTAMP(NANOS) parquet, which the
        # reader otherwise rejects; set here (session construction) so
        # load_table normally doesn't have to mutate a live session.
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Parquet scans: vectorized reader + pushdown are on by default;
        # keep them explicit so a misconfigured cluster can't silently
        # fall back to row-at-a-time reads.
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.parquet.enableVectorizedReader": "true",
        # INT96 timestamps carry NO parquet min/max statistics — every
        # write would be invisible to zone maps / row-group pruning on
        # its ts columns (operators/layout.py forces this per-write for
        # the same reason). TIMESTAMP_MICROS is value-identical for
        # Spark timestamps (micros precision internally).
        "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    }
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
