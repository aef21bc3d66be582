"""Deterministic corpus mixing: build weighted training blends.

A training mix is "X% of corpus A, Y% of corpus B, ..." — realized
here as per-source deterministic hash sampling (each source keeps the
fraction that makes its contribution match the target weights) plus a
tagged union. Everything is a pure function of (key, seed): the mix is
reproducible on any cluster shape, and growing one source never
reshuffles rows already in the mix from the others (only rates
change).

Scale shape: per-source filters are scan-stage expressions (no
shuffle); the union is plan-level (no data movement); the optional
deterministic order for sharding is the single range exchange
`shuffle_deterministic` already pays. Rates use the md5-prefix
selector from operators/sampling.py — 1/65536 resolution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.sampling import sample_flag


def mix_corpora(
    sources: dict[str, tuple[DataFrame, float]],
    key: Column,
    total_rows: int | None = None,
    seed: int = 0,
    allow_upsample: bool = False,
) -> DataFrame:
    """Blend named corpora to target weight proportions.

    sources: {name: (df, weight)}; weights are relative (normalized
    internally). Every input frame must share a schema; `key` is the
    sampling key evaluated against each frame (e.g. F.col("doc_id")).

    Sampling rates: with `total_rows` = desired output size, source i
    keeps min(1, total_rows * w_i / n_i) of its rows — an exact-rate
    downsample toward the target (sources too small to fill their
    share keep everything; the mix then under-delivers that share
    rather than silently re-weighting, so the caller sees the
    shortfall). With total_rows=None, the mix size is set by the
    SCARCEST source per weight unit: that source keeps 100% and every
    other source downsamples to match — the biggest mix achievable at
    the exact target proportions without upsampling.

    allow_upsample=True lifts the min(1, ...) clamp for the
    `total_rows` path: a source whose share demands rate r > 1 emits
    floor(r) deterministic copies of every row plus one more where the
    fractional md5 draw (salted '|up' so it is independent of the
    membership draws) lands under r - floor(r) — the standard
    scarce-source epoch repetition of LLM data mixes (public
    background: Gopher / Llama training blends repeat small
    high-quality corpora several epochs per pass over the big ones).
    The output then carries a `mix_epoch` column (0-based copy index;
    always 0 for downsampled sources), and expected output size is
    exactly n_i * r per source. Copies are produced by a scan-stage
    explode(sequence(...)) — no shuffle.

    Counting each source costs one aggregate per input (metadata-cheap
    for parquet); rows are selected by md5(key || seed || source name),
    so two sources sharing key values stay independent draws.
    """
    if not sources:
        raise ValueError("sources must be non-empty")
    for name, (df, _) in sources.items():
        if df.isStreaming:
            raise ValueError(
                f"source {name!r} is a streaming DataFrame: mixing "
                "needs per-source counts, which are undefined on an "
                "unbounded stream — land the stream first"
            )
    wsum = sum(w for _, w in sources.values())
    if wsum <= 0:
        raise ValueError("weights must sum > 0")
    norm = {name: w / wsum for name, (_, w) in sources.items()}
    counts = {name: df.count() for name, (df, _) in sources.items()}

    if total_rows is None:
        # supply_i = n_i / w_i rows-per-weight-unit; the scarcest source
        # binds: it keeps 1.0 and defines the mix size. (max() here would
        # clamp every rate to 1.0 and ignore the weights entirely.)
        scale = min(
            counts[name] / norm[name] for name in sources if norm[name] > 0
        )
        rates = {
            name: (norm[name] * scale / counts[name]) if counts[name] else 0.0
            for name in sources
        }
    else:
        raw = {
            name: (
                (total_rows * norm[name] / counts[name])
                if counts[name]
                else 0.0
            )
            for name in sources
        }
        rates = {
            name: (r if allow_upsample else min(1.0, r))
            for name, r in raw.items()
        }

    parts = []
    for name, (df, _) in sources.items():
        rate = rates[name]
        # Source name folds into the seed so shared keys draw
        # independently per source.
        tagged_key = F.concat(key.cast("string"), F.lit(f"|{name}"))
        if rate <= 1.0:
            part = df.filter(sample_flag(tagged_key, rate, seed)).withColumn(
                "mix_source", F.lit(name)
            )
            if allow_upsample:
                part = part.withColumn("mix_epoch", F.lit(0))
        else:
            # floor(rate) whole copies per row, plus one more where the
            # '|up'-salted fractional draw hits. sequence(0, n-1) +
            # explode is scan-stage; no shuffle.
            whole = int(rate)
            frac = rate - whole
            n_copies = F.lit(whole) + F.when(
                sample_flag(
                    F.concat(tagged_key, F.lit("|up")), frac, seed
                ),
                1,
            ).otherwise(0)
            part = (
                df.withColumn(
                    "mix_epoch",
                    F.explode(F.sequence(F.lit(0), n_copies - 1)),
                )
                .withColumn("mix_source", F.lit(name))
            )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
