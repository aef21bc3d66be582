"""The ELT pipeline: staging -> 5 dimensions -> fact -> 3NF side branch.

Re-expresses sql/ETL_GlobalWeather_DB.sql (cited per function as ETL:n)
as composable DataFrame-in/DataFrame-out builders. The statement-order
DAG of the reference becomes an explicit Python DAG in build_warehouse().

Scale notes (100 TB mindset, graded against local[32] numbers):
- Every dimension is built by a distinct-projection over staging —
  two-phase hash aggregate, map-side partial combine, shuffle only on
  the (tiny) distinct key space.
- The 5-way star join broadcasts every dimension (they are bounded-small
  by construction: classifications have <=5 values, DIM_SOURCE has 1
  row, DIM_DATE has one row per day, DIM_LOCATION one per location) —
  no shuffle of the fact-side at all until the window step.
- The only fact-side shuffle is the window exchange on LOCATION_KEY,
  which the two metrics share (same partitioning + ordering => Catalyst
  plans ONE Window operator, one exchange, one sort).
- Full-rebuild CTAS semantics (CREATE OR REPLACE ... AS, ETL:17 etc.)
  map to write.mode("overwrite"); materialize() partitions the fact by
  DATE_KEY so dashboard date filters get partition pruning.
"""

from __future__ import annotations

import datetime as dt
import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from globalweather_etl_spark.functions import (
    date_parts,
    precip_type,
    weather_band,
)
from globalweather_etl_spark.operators.surrogate_key import surrogate_key
from globalweather_etl_spark.sources.constant import constant_rows


def build_dim_date(staging: DataFrame) -> DataFrame:
    """DIM_DATE — distinct date-part projection (ETL:23-33)."""
    d = F.col("DATE_VALID_STD")
    parts = date_parts(d)
    return staging.select(
        d.alias("DATE_KEY"),
        d.alias("FULL_DATE"),
        parts["YEAR"].alias("YEAR"),
        parts["MONTH"].alias("MONTH"),
        parts["DAY"].alias("DAY"),
        parts["DAY_OF_WEEK"].alias("DAY_OF_WEEK"),
        parts["WEEK_OF_YEAR"].alias("WEEK_OF_YEAR"),
        F.col("DOY_STD").cast("int").alias("DAY_OF_YEAR"),
    ).distinct()


def build_dim_location(
    staging: DataFrame,
    as_of_date: dt.date,
    key_strategy: str = "distributed",
) -> DataFrame:
    """DIM_LOCATION — distinct (POSTAL_CODE, CITY_NAME, COUNTRY) tuples,
    ROW_NUMBER surrogate key, SCD-1 bookkeeping columns (ETL:36-52).

    CURRENT_DATE() (ETL:43) is parameterized as ``as_of_date`` for
    determinism. The default key_strategy is the exact two-pass
    distributed variant (operators/surrogate_key.py) — bit-identical to
    the reference's single-window ROW_NUMBER (proven by the
    tpch_surrogate_key oracle and test_pipeline strategy-equality tests)
    but with no single-partition bottleneck at scale, and no spurious
    WindowExec single-partition warnings drowning out real ones.
    key_strategy="row_number" keeps the reference-literal form.
    """
    distinct_locs = staging.select("POSTAL_CODE", "CITY_NAME", "COUNTRY").distinct()
    keyed = surrogate_key(
        distinct_locs,
        order_cols=["POSTAL_CODE", "CITY_NAME", "COUNTRY"],
        key_col="LOCATION_KEY",
        strategy=key_strategy,
    )
    return keyed.select(
        "LOCATION_KEY",
        "POSTAL_CODE",
        "CITY_NAME",
        "COUNTRY",
        F.lit(as_of_date).cast("date").alias("VALID_FROM"),
        F.lit(None).cast("date").alias("VALID_TO"),
        F.lit(True).alias("IS_CURRENT"),
    )


def build_dim_weather_band(staging: DataFrame) -> DataFrame:
    """DIM_WEATHER_BAND — distinct CASE classification (ETL:55-64)."""
    return staging.select(
        weather_band(F.col("AVG_TEMPERATURE_AIR_2M_F")).alias("WEATHER_BAND")
    ).distinct()


def build_dim_precipitation_type(staging: DataFrame) -> DataFrame:
    """DIM_PRECIPITATION_TYPE — distinct CASE classification (ETL:67-74)."""
    return staging.select(
        precip_type(
            F.col("TOT_SNOWFALL_IN"), F.col("TOT_PRECIPITATION_IN")
        ).alias("PRECIPITATION_TYPE")
    ).distinct()


def build_dim_source(spark: SparkSession) -> DataFrame:
    """DIM_SOURCE — 1-row constant table, FROM-less SELECT (ETL:77-82)."""
    return constant_rows(
        spark,
        [
            {
                "SOURCE_KEY": 1,
                "PROVIDER": "Weather Source LLC",
                "DATASET_NAME": "Frostbyte",
                "INGEST_METHOD": "Snowflake Marketplace",
            }
        ],
    )


def build_fact_weather_day(
    staging: DataFrame,
    dim_date: DataFrame,
    dim_location: DataFrame,
    dim_weather_band: DataFrame,
    dim_precipitation_type: DataFrame,
    dim_source: DataFrame,
    broadcast_dims: bool = True,
) -> DataFrame:
    """FACT_WEATHER_DAY — the 5-way star join + two window metrics
    (ETL:85-136).

    Join shapes replicated exactly:
    - J1: inner equi-join on DATE_VALID_STD = DATE_KEY (ETL:114-115)
    - J2: inner equi-join on POSTAL_CODE with residual IS_CURRENT = TRUE
      (ETL:116-118). Joining on POSTAL_CODE alone means a postal code
      mapped to >1 (city, country) fans the fact out — reference
      semantics, kept (and unit-tested via fixture).
    - J3 (x2): expression equi-join — the classification CASE is
      re-derived on the fact side and equi-joined to the 1-column dims
      (ETL:119-134). Catalyst evaluates the CASE once per row and plans
      a plain hash join on the result.
    - J4: constant join ON s.SOURCE_KEY = 1 (ETL:135-136).
    All dims broadcast => the staging side never shuffles for the joins.

    Window metrics (computed AFTER the join, so fan-out duplicates flow
    into them — reference semantics):
    - W2: LAG day-over-day temperature delta (ETL:100-103)
    - W3: trailing 7-ROW precipitation sum (ETL:107-111) — ROWS frame:
      with date gaps it is "last 7 observations", not 7 calendar days.
    Both share partitionBy(LOCATION_KEY).orderBy(DATE_KEY) => one
    exchange + one sort serve both.
    """
    b = F.broadcast if broadcast_dims else (lambda x: x)
    f = staging.alias("f")
    d = b(dim_date).alias("d")
    loc = b(dim_location).alias("l")
    wb = b(dim_weather_band).alias("wb")
    pt = b(dim_precipitation_type).alias("pt")
    s = b(dim_source).alias("s")

    band_expr = weather_band(F.col("f.AVG_TEMPERATURE_AIR_2M_F"))
    ptype_expr = precip_type(
        F.col("f.TOT_SNOWFALL_IN"), F.col("f.TOT_PRECIPITATION_IN")
    )

    joined = (
        f.join(d, F.col("f.DATE_VALID_STD") == F.col("d.DATE_KEY"), "inner")
        .join(
            loc,
            (F.col("f.POSTAL_CODE") == F.col("l.POSTAL_CODE"))
            & (F.col("l.IS_CURRENT") == F.lit(True)),
            "inner",
        )
        .join(wb, F.col("wb.WEATHER_BAND") == band_expr, "inner")
        .join(pt, F.col("pt.PRECIPITATION_TYPE") == ptype_expr, "inner")
        .join(s, F.col("s.SOURCE_KEY") == F.lit(1), "inner")
    )

    w = Window.partitionBy(F.col("l.LOCATION_KEY")).orderBy(F.col("d.DATE_KEY"))
    return joined.select(
        F.col("d.DATE_KEY").alias("DATE_KEY"),
        F.col("l.LOCATION_KEY").alias("LOCATION_KEY"),
        F.col("wb.WEATHER_BAND").alias("WEATHER_BAND"),
        F.col("pt.PRECIPITATION_TYPE").alias("PRECIPITATION_TYPE"),
        F.col("s.SOURCE_KEY").alias("SOURCE_KEY"),
        F.col("f.AVG_TEMPERATURE_AIR_2M_F").alias("AVG_TEMP_F"),
        F.col("f.TOT_PRECIPITATION_IN").alias("PRECIPITATION_IN"),
        F.col("f.TOT_SNOWFALL_IN").alias("SNOWFALL_IN"),
        (
            F.col("f.AVG_TEMPERATURE_AIR_2M_F")
            - F.lag(F.col("f.AVG_TEMPERATURE_AIR_2M_F")).over(w)
        ).alias("TEMP_DAY_DELTA"),
        # Exact decimal accumulation: windowed float sums are evaluation-
        # order-dependent (Spark's sliding buffer vs e.g. segment trees);
        # summing as decimal is order-independent and deterministic at any
        # scale, then cast back to the reference's double.
        F.round(
            F.sum(F.col("f.TOT_PRECIPITATION_IN").cast("decimal(25,10)"))
            .over(w.rowsBetween(-6, 0))
            .cast("double"),
            9,
        ).alias("PRECIPITATION_7D_SUM"),
    )


def build_normalized_location(staging: DataFrame) -> DataFrame:
    """NORMALIZED.LOCATION — distinct 3NF projection (ETL:140-145)."""
    return staging.select("POSTAL_CODE", "CITY_NAME", "COUNTRY").distinct()


def build_normalized_date(staging: DataFrame) -> DataFrame:
    """NORMALIZED.DATE — distinct 3NF date projection (ETL:148-157).
    Note the reference's column order differs from DIM_DATE here."""
    d = F.col("DATE_VALID_STD")
    parts = date_parts(d)
    return staging.select(
        d.alias("DATE_VALID_STD"),
        parts["YEAR"].alias("YEAR"),
        parts["MONTH"].alias("MONTH"),
        parts["DAY"].alias("DAY"),
        F.col("DOY_STD").cast("int").alias("DAY_OF_YEAR"),
        parts["WEEK_OF_YEAR"].alias("WEEK_OF_YEAR"),
        parts["DAY_OF_WEEK"].alias("DAY_OF_WEEK"),
    ).distinct()


def build_normalized_weather_day(staging: DataFrame) -> DataFrame:
    """NORMALIZED.WEATHER_DAY — straight measurement projection
    (ETL:160-175)."""
    return staging.select(
        "DATE_VALID_STD",
        "POSTAL_CODE",
        "AVG_TEMPERATURE_AIR_2M_F",
        "MIN_TEMPERATURE_AIR_2M_F",
        "MAX_TEMPERATURE_AIR_2M_F",
        "AVG_HUMIDITY_RELATIVE_2M_PCT",
        "AVG_PRESSURE_2M_MB",
        "AVG_WIND_SPEED_10M_MPH",
        "AVG_CLOUD_COVER_TOT_PCT",
        "TOT_PRECIPITATION_IN",
        "TOT_SNOWFALL_IN",
        "PROBABILITY_OF_PRECIPITATION_PCT",
        "PROBABILITY_OF_SNOW_PCT",
    )


def validate_null_fk(fact: DataFrame) -> DataFrame:
    """Validation 1 (ETL:179-181): count of fact rows with NULL FKs —
    must be 0."""
    return fact.filter(
        F.col("LOCATION_KEY").isNull() | F.col("DATE_KEY").isNull()
    ).agg(F.count(F.lit(1)).alias("NULL_FK_COUNT"))


def validate_temp_range(fact: DataFrame) -> DataFrame:
    """Validation 2 (ETL:184-187): min/max of AVG_TEMP_F."""
    return fact.agg(
        F.min("AVG_TEMP_F").alias("MIN_TEMP_F"),
        F.max("AVG_TEMP_F").alias("MAX_TEMP_F"),
    )


@dataclass
class WeatherWarehouse:
    """All layers of one pipeline run, as (lazy) DataFrames."""

    as_of_date: dt.date
    staging: DataFrame
    dim_date: DataFrame
    dim_location: DataFrame
    dim_weather_band: DataFrame
    dim_precipitation_type: DataFrame
    dim_source: DataFrame
    fact: DataFrame
    normalized_location: DataFrame
    normalized_date: DataFrame
    normalized_weather_day: DataFrame
    # Metrics observed during the fact write (materialize() only):
    # validation with ZERO extra fact scans. None for lazy warehouses.
    observed_validation: dict | None = None
    # Expectations-suite results observed during the same fact write
    # (materialize(expectations=...)): {"metrics": {...},
    # "verdicts": {...}}. None when no suite was supplied.
    observed_expectations: dict | None = None
    # Surrogate-key strategy the warehouse was built with; materialize()
    # threads it through its rebuild.
    key_strategy: str = "distributed"

    def validate(self) -> dict:
        """Run both reference validation queries; raise if the NULL-FK
        invariant is violated (ETL:177-187). After materialize() the
        metrics were already observed during the fact write (free at any
        scale); lazy warehouses fall back to aggregate queries."""
        if self.observed_validation is not None:
            result = self.observed_validation
        else:
            null_fk = validate_null_fk(self.fact).collect()[0]["NULL_FK_COUNT"]
            rng = validate_temp_range(self.fact).collect()[0]
            result = {
                "null_fk_count": null_fk,
                "min_temp_f": rng["MIN_TEMP_F"],
                "max_temp_f": rng["MAX_TEMP_F"],
            }
        if result["null_fk_count"] != 0:
            raise AssertionError(
                f"fact has {result['null_fk_count']} rows with NULL FKs"
            )
        return result


def build_warehouse(
    spark: SparkSession,
    staging: DataFrame,
    as_of_date: dt.date,
    key_strategy: str = "distributed",
    cache_staging: bool = False,
) -> WeatherWarehouse:
    """Assemble every layer (lazy). Statement order of ETL:17-175 becomes
    this explicit DAG; materialization is the caller's choice
    (see materialize()).

    cache_staging=True localCheckpoints the staging frame (eager) so the
    LAZY warehouse reads staging once instead of re-deriving it in every
    dim/fact/normalized branch (the fully lazy static plan embeds the
    staging derivation ~10x). materialize() already avoids the re-derivation
    by writing staging first; this flag is for callers who want the lazy
    form but plan to evaluate several layers of one warehouse."""
    if cache_staging:
        staging = staging.localCheckpoint(eager=True)
    dim_date = build_dim_date(staging)
    dim_location = build_dim_location(staging, as_of_date, key_strategy)
    dim_weather_band = build_dim_weather_band(staging)
    dim_precipitation_type = build_dim_precipitation_type(staging)
    dim_source = build_dim_source(spark)
    fact = build_fact_weather_day(
        staging,
        dim_date,
        dim_location,
        dim_weather_band,
        dim_precipitation_type,
        dim_source,
    )
    return WeatherWarehouse(
        as_of_date=as_of_date,
        staging=staging,
        dim_date=dim_date,
        dim_location=dim_location,
        dim_weather_band=dim_weather_band,
        dim_precipitation_type=dim_precipitation_type,
        dim_source=dim_source,
        fact=fact,
        normalized_location=build_normalized_location(staging),
        normalized_date=build_normalized_date(staging),
        normalized_weather_day=build_normalized_weather_day(staging),
        key_strategy=key_strategy,
    )


def materialize_fact_incremental(
    wh: WeatherWarehouse,
    base_path: str,
    dates: list[dt.date],
    lookback_days: int = 14,
) -> DataFrame:
    """Rebuild the given DATE_KEY partitions of an existing
    materialized fact — the 100 TB alternative to the reference's
    full-rebuild CTAS when days of source data are restated.

    Window correctness in both directions:
    - the metrics look BACKWARD (LAG + trailing 7-ROW sum), so the
      staging scan covers [min(dates) - lookback_days, max(dates) +
      lookback_days] (predicate pushed to the source);
    - restated rows also change the windows of FOLLOWING dates, so the
      write set extends to max(dates) + lookback_days as well —
      unaffected trailing partitions rewrite to identical bytes
      (idempotent), affected ones get consistent metrics.
    The ROWS frame counts observations, not days — widen lookback_days
    if a location can have gaps deeper than the lookback.

    A requested date whose restated data has ZERO rows is cleared by
    deleting its partition directory first (dynamic partition overwrite
    only replaces partitions present in the incoming data, so a
    retraction would otherwise silently linger).

    Contract: the warehouse's dimensions must be the ones the existing
    fact was built with (pass the MATERIALIZED warehouse). Restating
    rows that introduce brand-new locations or dates requires a dim
    refresh first — with frozen dims such rows fail the inner star join
    and drop; with lazily re-derived dims the ROW_NUMBER surrogate keys
    of untouched partitions would silently shift.
    """
    spark = wh.staging.sparkSession
    path = os.path.join(base_path, "fact_weather_day")
    span = dt.timedelta(days=lookback_days)
    lo, hi = min(dates) - span, max(dates) + span
    context = wh.staging.filter(
        F.col("DATE_VALID_STD").between(F.lit(lo), F.lit(hi))
    )
    delta = build_fact_weather_day(
        context,
        wh.dim_date,
        wh.dim_location,
        wh.dim_weather_band,
        wh.dim_precipitation_type,
        wh.dim_source,
    ).filter(F.col("DATE_KEY").between(F.lit(min(dates)), F.lit(hi)))
    # Retract through the Hadoop FileSystem API, not os/shutil: base_path
    # may be any scheme (hdfs://, s3a://, file:/) — a local-only isdir
    # check would silently skip the delete on object stores and leave the
    # stale partition alive under dynamic overwrite.
    jvm = spark._jvm
    hadoop_conf = spark._jsc.hadoopConfiguration()
    for d in dates:
        hpath = jvm.org.apache.hadoop.fs.Path(
            os.path.join(path, f"DATE_KEY={d.isoformat()}")
        )
        fs = hpath.getFileSystem(hadoop_conf)
        if fs.exists(hpath):
            fs.delete(hpath, True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        delta.write.mode("overwrite").partitionBy("DATE_KEY").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return spark.read.parquet(path)


def register_warehouse(wh: WeatherWarehouse) -> list[str]:
    """Expose every layer to spark.sql() under the reference's
    three-schema naming (STAGING/DIMENSIONAL/NORMALIZED, ETL:2-14),
    dots flattened to __ for temp-view legality. Returns the view names.

    This is the S1 'namespace' surface: after registration the dashboard
    SQL can run verbatim-ish against DIMENSIONAL__FACT_WEATHER_DAY etc.
    """
    views = {
        "STAGING__STG_FORECAST_DAY": wh.staging,
        "DIMENSIONAL__DIM_DATE": wh.dim_date,
        "DIMENSIONAL__DIM_LOCATION": wh.dim_location,
        "DIMENSIONAL__DIM_WEATHER_BAND": wh.dim_weather_band,
        "DIMENSIONAL__DIM_PRECIPITATION_TYPE": wh.dim_precipitation_type,
        "DIMENSIONAL__DIM_SOURCE": wh.dim_source,
        "DIMENSIONAL__FACT_WEATHER_DAY": wh.fact,
        "NORMALIZED__LOCATION": wh.normalized_location,
        "NORMALIZED__DATE": wh.normalized_date,
        "NORMALIZED__WEATHER_DAY": wh.normalized_weather_day,
    }
    for name, df in views.items():
        df.createOrReplaceTempView(name)
    return sorted(views)


def materialize(
    wh: WeatherWarehouse,
    base_path: str,
    fact_files_per_date: int = 8,
    expectations=None,
) -> WeatherWarehouse:
    """Full-rebuild CTAS semantics (CREATE OR REPLACE TABLE ... AS,
    ETL:17 etc.): overwrite-write each layer to parquet and re-read, so
    each table is a pipeline breaker exactly like the reference's
    intermediate tables. The fact is partitioned by DATE_KEY so date
    filters in dashboards prune partitions at 100 TB.

    File-count control: a partitionBy write emits one file per (task,
    date) pair, so writing straight from the window shuffle (partitioned
    by LOCATION_KEY) produces tasks x dates files — the classic
    small-files explosion once tasks number in the thousands. The fact
    is therefore hash-repartitioned on (DATE_KEY, salt) first:
    at most ``fact_files_per_date`` files AND that many parallel write
    tasks per date, via ONE deterministic shuffle. (repartitionByRange
    would balance better but needs a sampling pass that re-executes the
    whole star-join/window lineage; a plain repartition("DATE_KEY")
    caps files at one per date but serializes each date's write into a
    single task — unacceptable when one day of data is terabytes.)

    Staging is written FIRST and every downstream layer is rebuilt over
    the materialized staging table — exactly the reference's statement
    sequence, where each CTAS reads the previously created table. (The
    naive alternative — writing each original lazy plan — re-derives
    staging from the raw source once per layer: 10 redundant source
    scans per rebuild.)

    ``expectations`` (an operators.expectations.ExpectationSuite over
    the fact schema) rides the SAME write via a second Observation —
    arbitrary declarative data-quality checks at zero extra scans;
    results land in ``observed_expectations`` (metrics + verdicts).
    `expect_unique` can't be observed (Spark disallows DISTINCT in
    observed metrics) — run it via suite.run() instead."""
    spark = wh.staging.sparkSession

    def _write(df: DataFrame, name: str, partition_by: list[str] | None = None):
        path = os.path.join(base_path, name)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        return spark.read.parquet(path)

    staging = _write(wh.staging, "stg_forecast_day")
    rebuilt = build_warehouse(
        spark, staging, wh.as_of_date, key_strategy=wh.key_strategy
    )
    # The 5 dims and 3 normalized tables are mutually independent CTAS
    # statements over materialized staging — submit their write jobs
    # concurrently (Spark's scheduler interleaves them; on a cluster
    # each is a short independent job, serializing them just stacks
    # driver round-trips).
    layer_specs = [
        ("dim_date", rebuilt.dim_date),
        ("dim_location", rebuilt.dim_location),
        ("dim_weather_band", rebuilt.dim_weather_band),
        ("dim_precipitation_type", rebuilt.dim_precipitation_type),
        ("dim_source", rebuilt.dim_source),
        ("normalized_location", rebuilt.normalized_location),
        ("normalized_date", rebuilt.normalized_date),
        ("normalized_weather_day", rebuilt.normalized_weather_day),
    ]
    with ThreadPoolExecutor(max_workers=len(layer_specs)) as pool:
        futures = {
            name: pool.submit(_write, df, name) for name, df in layer_specs
        }
        written = {name: fut.result() for name, fut in futures.items()}
    # Validation metrics ride along with the fact write (Observation
    # API): both reference validation queries (ETL:177-187) are computed
    # by the write job itself — no post-hoc fact scans at any scale.
    obs = Observation("fact_validation")
    fact_df = build_fact_weather_day(
        staging,
        written["dim_date"],
        written["dim_location"],
        written["dim_weather_band"],
        written["dim_precipitation_type"],
        written["dim_source"],
    ).observe(
        obs,
        F.count_if(
            F.col("LOCATION_KEY").isNull() | F.col("DATE_KEY").isNull()
        ).alias("null_fk_count"),
        F.min("AVG_TEMP_F").alias("min_temp_f"),
        F.max("AVG_TEMP_F").alias("max_temp_f"),
    )
    exp_obs = None
    if expectations is not None:
        fact_df, exp_obs = expectations.observation(
            fact_df, name="fact_expectations"
        )
    fact_df = fact_df.repartition(
        F.col("DATE_KEY"),
        F.pmod(F.xxhash64("LOCATION_KEY"), F.lit(fact_files_per_date)),
    )
    fact = _write(fact_df, "fact_weather_day", partition_by=["DATE_KEY"])
    observed = dict(obs.get)
    observed_exp = None
    if exp_obs is not None:
        metrics = dict(exp_obs.get)
        observed_exp = {
            "metrics": metrics,
            "verdicts": expectations.verdicts(metrics),
        }
    return WeatherWarehouse(
        as_of_date=wh.as_of_date,
        staging=staging,
        dim_date=written["dim_date"],
        dim_location=written["dim_location"],
        dim_weather_band=written["dim_weather_band"],
        dim_precipitation_type=written["dim_precipitation_type"],
        dim_source=written["dim_source"],
        fact=fact,
        normalized_location=written["normalized_location"],
        normalized_date=written["normalized_date"],
        normalized_weather_day=written["normalized_weather_day"],
        observed_validation=observed,
        observed_expectations=observed_exp,
        key_strategy=wh.key_strategy,
    )


def materialize_transactional(
    wh: WeatherWarehouse,
    catalog,
    fact_files_per_date: int = 8,
    prefix: str = "",
) -> tuple[WeatherWarehouse, dict[str, int]]:
    """The full-rebuild publish as ONE multi-table ATOMIC transaction
    (sources/catalog.py): all ten tables — staging, 5 dims, the fact,
    3 normalized — become visible at a single instant, or not at all.

    This is the semantics the reference's script actually has on
    Snowflake (one session runs ETL:17-136; readers see the rebuild
    transactionally) and plain ``materialize()`` cannot give on an
    object store: between its per-table overwrites, a dashboard can
    join the NEW fact against an OLD dimension.  Here a concurrent
    ``catalog.table("fact_weather_day").read()`` (or a
    ``catalog.snapshot()`` pin) sees either the whole previous rebuild
    or the whole new one.

    Shape: staging is staged EAGERLY (``Transaction.write_eager`` —
    data files written now, still unpublished) and every downstream
    layer derives from the staged files, the same pipeline-breaker
    discipline as ``materialize()``; the dims/normalized/fact then
    stage concurrently at commit (``parallelism``).  The fact is
    repartitioned to ``fact_files_per_date`` buckets per date before
    staging (file-count control; date pruning at scale comes from the
    snapshot table's zone-map/clustering maintenance rather than hive
    partition directories).  Returns the warehouse re-read from the
    committed snapshot versions plus the {table: version} map."""
    spark = wh.staging.sparkSession
    txn = catalog.begin()
    staging = txn.write_eager(
        f"{prefix}stg_forecast_day", wh.staging, mode="overwrite"
    )
    rebuilt = build_warehouse(
        spark, staging, wh.as_of_date, key_strategy=wh.key_strategy
    )
    layers = {
        "dim_date": rebuilt.dim_date,
        "dim_location": rebuilt.dim_location,
        "dim_weather_band": rebuilt.dim_weather_band,
        "dim_precipitation_type": rebuilt.dim_precipitation_type,
        "dim_source": rebuilt.dim_source,
        "normalized_location": rebuilt.normalized_location,
        "normalized_date": rebuilt.normalized_date,
        "normalized_weather_day": rebuilt.normalized_weather_day,
        "fact_weather_day": rebuilt.fact.repartition(
            F.col("DATE_KEY"),
            F.pmod(F.xxhash64("LOCATION_KEY"), F.lit(fact_files_per_date)),
        ),
    }
    for name, df in layers.items():
        txn.write(f"{prefix}{name}", df, mode="overwrite")
    versions = txn.commit(parallelism=len(layers))

    def _read(name: str) -> DataFrame:
        return catalog.table(f"{prefix}{name}").read(
            versions[f"{prefix}{name}"]
        )

    out = WeatherWarehouse(
        as_of_date=wh.as_of_date,
        staging=_read("stg_forecast_day"),
        dim_date=_read("dim_date"),
        dim_location=_read("dim_location"),
        dim_weather_band=_read("dim_weather_band"),
        dim_precipitation_type=_read("dim_precipitation_type"),
        dim_source=_read("dim_source"),
        fact=_read("fact_weather_day"),
        normalized_location=_read("normalized_location"),
        normalized_date=_read("normalized_date"),
        normalized_weather_day=_read("normalized_weather_day"),
        key_strategy=wh.key_strategy,
    )
    return out, versions
