"""Deterministic media table derived from the documents table.

The container ships no real image/audio fixtures, so the media table is
synthesized: payload = UTF-8 bytes of the document text (an opaque byte
string as far as the operators are concerned), kind and metadata are
pure functions of doc_id / text length. Every expression is mirrorable
in ANSI SQL, keeping metadata-level queries DuckDB-oracle-checkable;
byte-level operators (histogram, frame sampling) are checked by unit
tests against plain-Python reference implementations instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KINDS = ["image", "audio", "video"]
_MIMES = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}

# SQL mirror of the kind/metadata derivation, for oracles
# (see oracles.MEDIA_PROLOGUE).
MEDIA_SQL = """
SELECT
  doc_id AS media_id,
  ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
  encode(text) AS payload,
  ['image/png', 'audio/wav', 'video/mp4'][CAST(doc_id % 3 AS INTEGER) + 1]
    AS mime,
  CAST((doc_id % 64 + 16) * 16 AS INTEGER) AS width,
  CAST((doc_id % 48 + 12) * 16 AS INTEGER) AS height,
  CAST(CASE WHEN doc_id % 3 = 1 THEN 2 ELSE 3 END AS INTEGER) AS channels,
  CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS INTEGER)
    AS sample_rate,
  CAST(length(text) // 16 AS INTEGER) AS n_frames
FROM documents
"""


def media_from_documents(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, ...) -> MEDIA_SCHEMA rows (deterministic).

    kind cycles image/audio/video by doc_id; metadata dimensions derive
    from doc_id and text length. doc_id % 3 == 1 <=> kind == 'audio'.
    """
    idx = (F.col("doc_id") % 3 + 1).cast("int")
    kind = F.element_at(F.array(*[F.lit(k) for k in _KINDS]), idx)
    mime = F.element_at(F.array(*[F.lit(_MIMES[k]) for k in _KINDS]), idx)
    is_audio = F.col("doc_id") % 3 == 1
    n = F.length("text")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            mime.alias("mime"),
            ((F.col("doc_id") % 64 + 16) * 16).cast("int").alias("width"),
            ((F.col("doc_id") % 48 + 12) * 16).cast("int").alias("height"),
            F.when(is_audio, 2).otherwise(3).cast("int").alias("channels"),
            F.when(is_audio, 16000).otherwise(0).cast("int").alias("sample_rate"),
            F.floor(n / 16).cast("int").alias("n_frames"),
        ).alias("metadata"),
    )
