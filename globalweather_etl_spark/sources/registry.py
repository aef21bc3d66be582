"""Source connectors.

The reference's "source connector" is a cross-database scan of a
Snowflake Marketplace share (ETL:17-19: SELECT * FROM
WEATHER_SOURCE_LLC_FROSTBYTE.ONPOINT_ID.FORECAST_DAY). Our equivalent is
a parquet landing zone: a directory of one parquet dataset per table.
Catalyst's DataSource V2 parquet reader gives vectorized scans,
predicate pushdown, column pruning, and partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# The landing zone stores timestamps as parquet TIMESTAMP(NANOS), which
# Spark's reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We read them
# as raw nanos longs (legacy conf) and convert to microsecond timestamps
# with exact integer division (`div`, not `/` — a nanos epoch ~1.7e18
# doesn't fit double's 53-bit mantissa). Truncation to micros matches
# what DuckDB does with the same files, so oracles agree.
NANO_TS_COLS: dict[str, list[str]] = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}


# (session, parquet path) -> resolved DataFrame.  spark.read.parquet
# re-reads footers for schema resolution on EVERY call — a metadata
# job a metastore-backed engine would answer from its catalog cache.
# Landing-zone tables are immutable inputs, so the resolved relation
# is safely reusable per session (the value keeps the session ref so
# an id() collision after GC can never resurrect a dead session's
# plan).  Bounded: oldest entry evicted past 64.
_RELATION_CACHE: dict[tuple[int, str], tuple[SparkSession, DataFrame]] = {}


def load_table(
    spark: SparkSession, sf_dir: str, name: str, refresh: bool = False
) -> DataFrame:
    """Read one landing-zone table (memoized per (session, path) under an immutable-path assumption — pass refresh=True after rewriting a landing path).

    Aside from the nanos-timestamp repair above, no schema munging —
    pushdown/pruning reach the scan untouched.

    Resolved relations are memoized per (session, path) — the
    landing zone is immutable input data, and re-resolving parquet
    footers per query is pure fixed cost (the catalog-cache behavior
    every metastore engine has).  STALENESS: the memo assumes the
    path is never rewritten after first load; if a landing path IS
    mutated (new files, schema change), pass ``refresh=True`` to
    drop the cached relation and re-resolve footers.

    Session confs: get_spark() already sets both required confs at
    session construction, so this function normally mutates nothing.
    For FOREIGN sessions (the grading driver builds its own) the confs
    are set here as a fallback — and must STAY set, because scans are
    lazy: restoring the conf after this call would undo it before the
    read executes. (An assert-instead-of-set alternative was rejected:
    it would break the driver contract, which calls queries() with a
    session we don't construct.) Consequences on a foreign session: other
    TIMESTAMP(NANOS) parquet reads arrive as longs instead of erroring,
    and a caller-chosen timezone is overridden with the UTC the oracle
    semantics are defined in."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    ck = (id(spark), path)
    # Re-pin the required confs on EVERY call (cache hit included): the
    # cached plan is lazy, so a foreign session that flipped timeZone /
    # nanosAsLong between calls would otherwise execute the hit under
    # the wrong confs. A matching conf.get is a cheap local check.
    for key, want in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        if spark.conf.get(key, None) != want:
            spark.conf.set(key, want)
    if refresh:
        _RELATION_CACHE.pop(ck, None)
    else:
        hit = _RELATION_CACHE.get(ck)
        if hit is not None and hit[0] is spark:
            return hit[1]
    df = spark.read.parquet(path)
    for c in NANO_TS_COLS.get(name, []):
        # Physical type varies per dataset (NANOS -> read as long under
        # the legacy conf; MICROS -> read as timestamp already), so only
        # repair columns that actually arrived as longs.
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # A third physical variant: parquet MICROS with isAdjustedToUTC unset
    # arrives as TIMESTAMP_NTZ when the session infers NTZ (Spark 4
    # default). Normalize to TIMESTAMP so TIMESTAMP-only functions
    # (unix_micros etc.) and window range frames behave identically on
    # every session; under the UTC session timezone forced above the
    # cast is value-preserving.
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    while len(_RELATION_CACHE) >= 64:
        _RELATION_CACHE.pop(next(iter(_RELATION_CACHE)))
    _RELATION_CACHE[ck] = (spark, df)
    return df


class Catalog:
    """Thin named-DataFrame registry standing in for the reference's
    three-schema warehouse (STAGING / DIMENSIONAL / NORMALIZED, ETL:2-14).

    Tables are registered as temp views too, so the same objects are
    reachable from both the DataFrame API and spark.sql().
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, DataFrame] = {}

    def register(self, name: str, df: DataFrame) -> DataFrame:
        self._tables[name] = df
        df.createOrReplaceTempView(name.replace(".", "__"))
        return df

    def table(self, name: str) -> DataFrame:
        return self._tables[name]

    def names(self) -> list[str]:
        return sorted(self._tables)
