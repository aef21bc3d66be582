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


# ---------------------------------------------------------- Hilbert
#
# The Hilbert curve improves on Morton/Z-order locality: consecutive
# curve positions are always ADJACENT cells (Morton takes long jumps
# at power-of-two boundaries), so a box predicate maps to fewer,
# longer curve ranges and a range-clustered layout touches fewer
# files. This is the public design behind Databricks liquid
# clustering's Hilbert default; the classic xy2d algorithm (rotate +
# reflect per level, public-domain pseudocode) is re-expressed here as
# its equivalent 4-STATE AUTOMATON over MSB-first bit pairs, derived
# programmatically below and verified exhaustively against the
# reference in tests/test_layout.py. The automaton is what makes a
# pure-EXPRESSION evaluation possible: 4 steps at a time through a
# 1024-entry lookup table, one element_at per chunk — linear
# expression size, whole-stage codegen, no UDF.

def hilbert_xy2d(bits: int, x: int, y: int) -> int:
    """Pure-Python reference: distance along the order-``bits``
    Hilbert curve of cell (x, y). The rotate/reflect formulation."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


_ALL8 = [(s, nx, ny) for s in (0, 1) for nx in (0, 1) for ny in (0, 1)]


def _h_apply(t, xb, yb):
    swap, nx, ny = t
    x1, y1 = xb ^ nx, yb ^ ny
    return (y1, x1) if swap else (x1, y1)


def _h_step(t, xb, yb):
    """One automaton step: current transform + raw bit pair ->
    (2 output bits, next transform). The transform set is the dihedral
    subgroup {identity, swap, negate-both, swap+negate} — exactly the
    4 states the Hilbert recursion reaches."""
    u, v = _h_apply(t, xb, yb)
    d2 = (3 * u) ^ v
    if v == 0:
        h = (1, 1, 1) if u == 1 else (1, 0, 0)
        # compose h AFTER t by searching the (closed) 8-element group
        for cand in _ALL8:
            if all(
                _h_apply(cand, a, b) == _h_apply(h, *_h_apply(t, a, b))
                for a in (0, 1)
                for b in (0, 1)
            ):
                t = cand
                break
    return d2, t


def _hilbert_lut() -> tuple[list[tuple], list[int]]:
    """(states, lut) where lut[state_idx * 256 + byte] packs 4 automaton
    steps: 8 output bits << 2 | next state index. ``byte`` is the
    MSB-first interleave of 4 (x, y) bit pairs: x bit of step j at
    position 7-2j, y bit at 6-2j."""
    states = [(0, 0, 0)]
    i = 0
    while i < len(states):  # BFS closure over reachable transforms
        t = states[i]
        i += 1
        for xb in (0, 1):
            for yb in (0, 1):
                nt = _h_step(t, xb, yb)[1]
                if nt not in states:
                    states.append(nt)
    lut = []
    for t0 in states:
        for byte in range(256):
            t, out = t0, 0
            for j in range(4):
                xb = (byte >> (7 - 2 * j)) & 1
                yb = (byte >> (6 - 2 * j)) & 1
                d2, t = _h_step(t, xb, yb)
                out = (out << 2) | d2
            lut.append((out << 2) | states.index(t))
    return states, lut


_HILBERT_LUT_CACHE: list[int] | None = None


def hilbert_key(cols, bits: int = 16):
    """Hilbert-curve distance over TWO non-negative integer bucket
    columns (``bits`` per axis, multiple of 4, 2*bits <= 62) — the
    drop-in locality upgrade for :func:`zorder_key` on 2-D layouts.
    Same contract: callers bucket real values to [0, 2^bits) first;
    the result is a single long to range-cluster on.

    Evaluation: MSB-first chunks of 4 levels; each chunk extracts 8
    interleaved bits (shift/AND chain, exactly zorder_key's shape) and
    one ``element_at`` into the precomputed 1024-entry automaton table
    yields 8 output bits + the next state. For the default bits=16
    that is 4 lookups — constant-size, codegen'd, no UDF, no shuffle
    beyond the caller's range write. n-D Hilbert (Skilling's
    algorithm) is deliberately absent: its per-level state does not
    reduce to a small automaton, and Morton handles n>2 well — use
    ``zorder_key`` there."""
    from pyspark.sql import functions as F

    if len(cols) != 2:
        raise ValueError(
            f"hilbert_key is 2-D (got {len(cols)} cols) — use "
            "zorder_key for other dimensionalities"
        )
    if bits % 4 != 0 or bits <= 0:
        raise ValueError("bits must be a positive multiple of 4")
    if 2 * bits > 62:
        raise ValueError(f"2 cols x {bits} bits exceeds a signed long")
    global _HILBERT_LUT_CACHE
    if _HILBERT_LUT_CACHE is None:
        _HILBERT_LUT_CACHE = _hilbert_lut()[1]
    lut = F.lit(_HILBERT_LUT_CACHE)
    x = cols[0].cast("long")
    y = cols[1].cast("long")
    state = F.lit(0).cast("int")
    d = F.lit(0).cast("long")
    for c in range(bits // 4):
        byte = F.lit(0).cast("int")
        for j in range(4):
            level = bits - 1 - (4 * c + j)  # MSB-first bit position
            byte = byte.bitwiseOR(
                F.shiftleft(
                    F.shiftright(x, level).bitwiseAND(F.lit(1)),
                    7 - 2 * j,
                ).cast("int")
            ).bitwiseOR(
                F.shiftleft(
                    F.shiftright(y, level).bitwiseAND(F.lit(1)),
                    6 - 2 * j,
                ).cast("int")
            )
        enc = F.element_at(lut, state * 256 + byte + 1)
        d = F.shiftleft(d, 8).bitwiseOR(
            F.shiftright(enc, 2).cast("long")
        )
        state = enc.bitwiseAND(F.lit(3))
    return d
