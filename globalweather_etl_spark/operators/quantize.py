"""Embedding quantization: shrink the ANN working set 4x.

At 100 TB the embedding table's float columns ARE the ANN operator's
working set (bucketing scans them; verification joins them). Symmetric
per-vector int8 quantization stores each vector as array<tinyint> plus
one float scale — 4x less shuffle/cache/scan volume — while keeping
cosine ranking nearly exact (recall measured in tests, not assumed).

All pure Column expressions (transform / array_max / round): quantize
and dequantize run inside the scan stage, no UDFs, and compose with
every operator in similarity.py (which only needs an array<float/
double> column — pass `dequantize_embeddings(...)` where full
precision is wanted, or the int8 array itself for integer dot products
downstream).

Scheme: q[i] = round(x[i] / scale * 127), scale = max(|x|) per vector
(zero vectors keep scale 1.0 to avoid 0/0). Reconstruction error per
component is bounded by scale/254, so relative cosine perturbation is
O(1/127) — rank inversions happen only between near-ties.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_vector(vec: Column) -> tuple[Column, Column]:
    """(array<tinyint> codes, float scale) for one embedding column."""
    scale = F.greatest(
        F.array_max(F.transform(vec, lambda x: F.abs(x))),
        F.lit(1e-30),
    ).cast("float")
    codes = F.transform(
        vec, lambda x: F.round(x / scale * F.lit(127.0)).cast("tinyint")
    )
    return codes, scale


def dequantize_vector(codes: Column, scale: Column) -> Column:
    """array<float> reconstruction: codes * scale / 127."""
    return F.transform(
        codes, lambda q: (q.cast("float") * scale / F.lit(127.0)).cast("float")
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str, out_prefix: str | None = None
) -> DataFrame:
    """Replace `vec_col` with `<prefix>_q8` (array<tinyint>) and
    `<prefix>_scale` (float). Default prefix is the column name."""
    prefix = out_prefix or vec_col
    codes, scale = quantize_vector(F.col(vec_col))
    return df.withColumns(
        {f"{prefix}_q8": codes, f"{prefix}_scale": scale}
    ).drop(vec_col)


def dequantize_embeddings(
    df: DataFrame, prefix: str, out_col: str | None = None
) -> DataFrame:
    """Inverse of quantize_embeddings: materialize `<out_col>`
    (array<float>) from `<prefix>_q8` / `<prefix>_scale`."""
    out = out_col or prefix
    return df.withColumn(
        out,
        dequantize_vector(F.col(f"{prefix}_q8"), F.col(f"{prefix}_scale")),
    ).drop(f"{prefix}_q8", f"{prefix}_scale")
