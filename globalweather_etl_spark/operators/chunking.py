"""Document chunking: split long documents into bounded, optionally
overlapping token-window chunks (embedding inputs, context windows).

One row in, N rows out — all inside the scan stage: the chunk start
grid is a `sequence`, each chunk a `slice` of the token array re-joined
with spaces, exploded via `posexplode`. No UDFs, no shuffle; the only
cost is linear text size. Chunk identity (doc_id, chunk_id) is
deterministic, so downstream embedding tables join back stably.

DuckDB mirror (for oracle-checkability): generate_series over the same
stride + list_slice + array_to_string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from globalweather_etl_spark.functions.text import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap_tokens: int = 0,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Explode each document into whitespace-token chunks of
    `chunk_tokens`, consecutive chunks sharing `overlap_tokens`.

    Output: keep_cols (default: just id_col) + chunk_id (0-based),
    chunk_start (0-based token offset), n_chunk_tokens, chunk_text.
    The final chunk may be shorter; empty documents yield no rows.
    """
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("need 0 <= overlap_tokens < chunk_tokens")
    keep = keep_cols or [id_col]
    stride = chunk_tokens - overlap_tokens
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # start offsets 1, 1+stride, ... (slice is 1-based); guard the
    # empty-token case (trim+split of '' yields ['']), treated as no
    # chunks via the n >= 1 filter on non-empty text below.
    starts = F.when(
        (n > 0) & (F.length(F.trim(F.col(text_col))) > 0),
        F.sequence(F.lit(1), F.greatest(n - F.lit(overlap_tokens), F.lit(1)),
                   F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts, lambda s: F.slice(toks, s, chunk_tokens)
    )
    exploded = df.select(
        *keep, F.posexplode_outer(chunks).alias("chunk_id", "__chunk")
    ).filter(F.col("__chunk").isNotNull())
    return exploded.select(
        *keep,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (F.col("chunk_id") * stride).cast("long").alias("chunk_start"),
        F.size("__chunk").cast("int").alias("n_chunk_tokens"),
        F.concat_ws(" ", F.col("__chunk")).alias("chunk_text"),
    )
