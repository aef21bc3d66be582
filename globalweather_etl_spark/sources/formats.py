"""Multi-format corpus ingestion: JSONL / CSV landing zones.

Training corpora arrive as JSONL (one document per line) and CSV at
least as often as parquet. These readers wrap `spark.read` with the
guarantees the rest of the engine assumes:

- **Explicit schema, never inference.** Schema inference scans the
  whole dataset once before the real read (2× I/O at 100 TB) and can
  silently change types between drops. Callers pass a StructType (or a
  reference table name from schemas.py) and drift fails loudly.
- **Corrupt-record quarantine, not job failure.** A single mangled
  line in a billion-line JSONL drop must not kill the run; bad rows
  land in a `_corrupt_record` column the caller can count / divert
  (PERMISSIVE), or the reader can be pinned strict (FAILFAST).
- **Column pruning still works**: passing the schema keeps json/csv
  scans projection-pruned (Spark reads only requested fields from each
  line), and both formats split by line across executors, so a single
  huge file still parallelizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    """PERMISSIVE mode only populates the corrupt column if the schema
    declares it; add it (nullable string) unless already present."""
    if any(f.name == CORRUPT_COL for f in schema.fields):
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    strict: bool = False,
) -> DataFrame:
    """Read line-delimited JSON with an enforced schema.

    strict=False (default): corrupt lines survive as rows whose data
    columns are NULL and whose `_corrupt_record` holds the raw line —
    count them with `corrupt_count`, drop them with `drop_corrupt`.
    strict=True: any corrupt line fails the job (FAILFAST).
    """
    if strict:
        return spark.read.schema(schema).option("mode", "FAILFAST").json(path)
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    strict: bool = False,
    **options: str,
) -> DataFrame:
    """Read CSV with an enforced schema (same quarantine contract as
    read_jsonl). Extra `options` pass through to the DataFrameReader
    (sep, quote, escape, multiLine, ...)."""
    reader = (
        spark.read.schema(
            schema if strict else _with_corrupt(schema)
        )
        .option("header", "true" if header else "false")
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def corrupt_count(df: DataFrame) -> int:
    """Number of quarantined rows in a PERMISSIVE read.

    Spark disallows queries whose referenced columns are ONLY the
    internal corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) —
    the documented workaround is caching the whole frame, which is not
    an option at corpus scale. Instead aggregate in one pass that also
    references a data column: count(corrupt) counts non-null = corrupt
    rows, and the extra count keeps the query legal without widening
    the scan beyond two columns."""
    if CORRUPT_COL not in df.columns:
        return 0
    data_cols = [c for c in df.columns if c != CORRUPT_COL]
    if not data_cols:
        return df.filter(F.col(CORRUPT_COL).isNotNull()).count()
    row = df.agg(
        F.count(F.col(CORRUPT_COL)).alias("corrupt"),
        F.count(F.col(data_cols[0])).alias("_touch_data_col"),
    ).collect()[0]
    return row["corrupt"]


def drop_corrupt(df: DataFrame) -> DataFrame:
    """Remove quarantined rows and the quarantine column — the clean
    frame downstream operators consume.

    The filter deliberately also references a data column (a
    tautological length() >= 0 guard Catalyst cannot fold away):
    without it, `drop_corrupt(df).count()` prunes the plan down to the
    corrupt column alone and trips the same
    QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction as corrupt_count —
    counting the cleaned frame is the first thing every ingestion job
    does, so the API must survive it. Cost: one string length per row."""
    if CORRUPT_COL not in df.columns:
        return df
    keep = F.col(CORRUPT_COL).isNull()
    atomic = [
        f.name
        for f in df.schema.fields
        if f.name != CORRUPT_COL
        and not isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType)
        )
    ]
    if atomic:
        touch = (
            F.length(F.coalesce(F.col(atomic[0]).cast("string"), F.lit("")))
            >= 0
        )
        keep = keep & touch
    return df.filter(keep).drop(CORRUPT_COL)


def read_orc(
    spark: SparkSession,
    path: str,
    expected_schema: T.StructType | None = None,
) -> DataFrame:
    """Read ORC (the other columnar interchange format — Hive-era
    warehouses hand data off as ORC as often as parquet). ORC embeds
    its schema, so there is no inference cost and no corrupt-record
    mode; what CAN drift silently between drops is the embedded schema
    itself, so callers that depend on a shape pass ``expected_schema``
    and drift fails loudly (name + type comparison, nullability
    ignored — writers disagree about it and it carries no data risk).

    Spark's native ORC reader keeps the same scan-stage guarantees as
    parquet: predicate pushdown, column pruning, and split-per-stripe
    parallelism (plan-audited in tests)."""
    df = spark.read.orc(path)
    if expected_schema is not None:
        got = [(f.name, f.dataType) for f in df.schema.fields]
        want = [(f.name, f.dataType) for f in expected_schema.fields]
        if got != want:
            raise ValueError(
                f"ORC schema drift at {path}: expected {want}, found {got}"
            )
    return df


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    partitions: int | None = None,
) -> None:
    """Write ORC (interchange twin of read_orc). ``partition_by``
    produces the hive-layout directory tree downstream engines
    partition-prune on; ``partitions`` bounds file count the same way
    write_jsonl does."""
    out = df.coalesce(partitions) if partitions else df
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_jsonl(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """Write line-delimited JSON (the interchange twin of read_jsonl).
    `partitions` coalesces to bound output file count — JSONL drops are
    often consumed by line-oriented tools that prefer fewer files."""
    out = df.coalesce(partitions) if partitions else df
    out.write.mode("overwrite").json(path)
