"""Write-side data layout for scan pruning (sort/range clustering).

At 100 TB the cheapest query is the one that never reads the file: a
parquet file whose footer min/max excludes the predicate range is
skipped entirely (Spark row-group pruning, and file pruning in every
modern reader). That only works if the writer CLUSTERED the data — a
random layout gives every file the full value range and min/max prune
nothing.

``write_range_clustered`` produces the layout: ``repartitionByRange``
on the cluster columns (range exchange with sampled boundaries, the
same machinery as a global sort but without a per-partition total
order requirement beyond what we add) + ``sortWithinPartitions`` so
row groups inside each file are clustered too. Each output file then
covers a disjoint slice of the leading cluster column, which
``file_ranges`` (footer metadata, via pyarrow) makes auditable —
tests assert disjointness, and operators can use it for manual
file-level pruning decisions.

``write_range_clustered`` alone is the single-dimension (and
composite-key lexicographic) form — the right default for time-series
and id-range workloads. ``zorder_key`` adds the multi-dimensional
form: interleave the bucketed key bits (Morton order) and range-write
on the interleaved key, so box predicates over EITHER column prune
files (tested on a 64x64 grid: an aligned 8x8 box touches <= 4 of 16
z-clustered files, while an x-clustered layout reads all 16 for any
y predicate).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet range-clustered on ``cluster_cols``: rows are
    range-exchanged (sampled boundaries, no global sort barrier) so
    each of the ``num_files`` output files covers a disjoint slice of
    the leading cluster column, then sorted within each file so row
    groups cluster too. ``num_files`` defaults to the session's shuffle
    partitions. File boundaries come from reservoir sampling and are
    NOT bit-deterministic across runs — the ROWS are identical, only
    their file placement varies (layout, not content)."""
    if not cluster_cols:
        raise ValueError("cluster_cols must be non-empty")
    parted = (
        df.repartitionByRange(num_files, *cluster_cols)
        if num_files
        else df.repartitionByRange(*cluster_cols)
    )
    # Spark's default parquet timestamp encoding is INT96, which
    # carries NO min/max statistics — a timestamp-clustered layout
    # would be unprunable by any reader. Force TIMESTAMP_MICROS for
    # this write (restored after), which stats like any int64.
    spark = df.sparkSession
    conf_key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "TIMESTAMP_MICROS")
    try:
        parted.sortWithinPartitions(*cluster_cols).write.mode(mode).parquet(
            path
        )
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)


def file_ranges(path: str, column: str) -> list[tuple[str, object, object]]:
    """(file, min, max) of ``column`` per parquet data file under
    ``path``, straight from the footers (pyarrow, no Spark job) —
    the data-skipping audit: disjoint ranges mean a range predicate
    touches the minimal file set."""
    import datetime

    import pyarrow.parquet as pq

    def _naive_utc(v):
        # Footer stats for TIMESTAMP_MICROS come back tz-aware (UTC);
        # Spark collect() hands out naive UTC wall times under the
        # engine's pinned UTC session zone. Normalize to naive UTC so
        # the two are comparable.
        if isinstance(v, datetime.datetime) and v.tzinfo is not None:
            return v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if column not in idx:
            raise KeyError(f"{column} not in {name}")
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[column]).statistics
            if st is None or not st.has_min_max:
                continue
            smin, smax = _naive_utc(st.min), _naive_utc(st.max)
            lo = smin if lo is None else min(lo, smin)
            hi = smax if hi is None else max(hi, smax)
        if lo is not None:
            out.append((name, lo, hi))
    return out


def files_for_range(
    path: str, column: str, lo, hi
) -> list[str]:
    """Names of data files whose [min, max] intersects [lo, hi] — the
    file-level prune an engine performs from the same footers. On a
    range-clustered layout this is a small constant fraction; on a
    random layout it is every file."""
    return [
        name
        for name, fmin, fmax in file_ranges(path, column)
        if not (fmax < lo or fmin > hi)
    ]


def zorder_key(cols, bits: int = 16):
    """Bit-interleaved (Morton / Z-order) key over non-negative integer
    bucket columns: bit b of column i lands at output position
    ``b * len(cols) + i``. Range-clustering on this key
    (``write_range_clustered(df.withColumn('_z', zorder_key([...])),
    ['_z'])``) gives MULTI-dimensional data skipping: a box predicate
    over the original columns maps to a bounded set of z-ranges, so
    footer min/max prune files for queries on EITHER column — the
    public technique behind Delta/Iceberg Z-ORDER clustering.

    Callers bucket real values to small non-negative ints first (a
    fixed-resolution floor like the quantile histogram's, or a date
    ordinal) — ``bits`` per column, so len(cols) * bits <= 63. The
    expression is a constant-size chain of shifts and ORs: pure
    codegen, no UDF, no shuffle beyond the caller's range write."""
    from pyspark.sql import functions as F

    n = len(cols)
    if n == 0:
        raise ValueError("cols must be non-empty")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        lc = c.cast("long")
        for b in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftright(lc, b).bitwiseAND(F.lit(1)), b * n + i
                )
            )
    return out
