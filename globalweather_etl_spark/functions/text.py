"""Text-analysis expression kernel (north-star extension surface).

All pure Column expressions — JVM-side, codegen-friendly, no UDFs.
Each has an exact ANSI-SQL mirror for the DuckDB oracle (see
globalweather_etl_spark/oracles.py); regex patterns are restricted to
syntax with identical semantics in Java regex and RE2.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_WS = r"\s+"
# Explicit punctuation class — identical in Java regex and RE2 (avoid
# POSIX classes whose membership differs between engines).
_PUNCT = r"[.,!?;:'\"()\[\]{}-]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization -> array<string>. Input is trimmed
    first: split() keeps the empty token a leading separator produces
    (' hi there' -> ['', 'hi', 'there']), which would inflate counts
    and inject empty shingles for padded text."""
    return F.split(F.trim(text), _WS)


def token_count(text: Column) -> Column:
    """Whitespace token count (BPE-ish counting belongs to a tokenizer
    service; whitespace is the scale-safe default). NULL text counts
    NULL — guarded explicitly because size(NULL) is -1 under Spark's
    legacy conf, while SQL engines return NULL."""
    return F.when(text.isNull(), F.lit(None).cast("int")).otherwise(
        F.size(tokens(text)).cast("int")
    )


def char_count(text: Column) -> Column:
    return F.length(text).cast("int")


def punct_count(text: Column) -> Column:
    """Punctuation characters, counted by deletion (length delta) so the
    same regex works in any engine."""
    return (F.length(text) - F.length(F.regexp_replace(text, _PUNCT, ""))).cast("int")


def avg_word_len(text: Column) -> Column:
    """Mean token length: non-whitespace chars / token count."""
    non_ws = F.length(F.regexp_replace(text, _WS, ""))
    return non_ws.cast("double") / token_count(text).cast("double")


def quality_score(text: Column) -> Column:
    """Deterministic document quality heuristic in [0, 1]:
    penalizes very short docs, punctuation soup, and extreme word
    lengths. A linear blend of bounded ratios — each component is a
    cheap codegen expression, so this runs in the scan stage."""
    n_tok = token_count(text).cast("double")
    len_component = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_ratio = punct_count(text).cast("double") / F.greatest(
        char_count(text).cast("double"), F.lit(1.0)
    )
    punct_component = F.lit(1.0) - F.least(punct_ratio * F.lit(4.0), F.lit(1.0))
    wl = avg_word_len(text)
    wl_component = F.when((wl >= 3.0) & (wl <= 8.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return (
        F.lit(0.4) * len_component
        + F.lit(0.3) * punct_component
        + F.lit(0.3) * wl_component
    )


# GPT-2-style pre-tokenizer pattern, restricted to syntax with
# identical semantics in Java regex and RE2: non-capturing groups,
# \p{L}/\p{N} classes, leftmost-first alternation. GPT-2's trailing
# whitespace alternatives use a lookahead RE2 lacks, so they are
# dropped — whitespace runs simply match nothing and are skipped by
# the match counter (single leading spaces are absorbed by the ` ?`
# prefixes, as in the original).
_BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"


def bpe_token_estimate(text: Column) -> Column:
    """BPE-ish token-count estimate: the number of GPT-2 pre-tokenizer
    pieces (contraction suffixes, letter runs, digit runs, symbol runs).
    Each piece maps to >=1 real BPE tokens and common words are single
    tokens, so this tracks true tokenizer counts far better than
    whitespace splitting on punctuation-heavy or contraction-heavy
    text — while staying a pure scan-stage expression (no vocab, no
    UDF)."""
    return F.when(text.isNull(), F.lit(None).cast("int")).otherwise(
        F.regexp_count(text, F.lit(_BPE_PATTERN)).cast("int")
    )


def dup_word_fraction(text: Column) -> Column:
    """Gopher-style repetition signal: the fraction of tokens that are
    repeats of a token already seen in the document
    (1 - distinct/total). High values mark boilerplate and degenerate
    generations; 0.0 for empty text."""
    toks = tokens(text)
    n = F.size(toks)
    return F.when(text.isNull(), F.lit(None).cast("double")).otherwise(
        F.when(n <= 0, F.lit(0.0)).otherwise(
            F.lit(1.0)
            - F.size(F.array_distinct(toks)).cast("double") / n.cast("double")
        )
    )


def dup_line_fraction(text: Column) -> Column:
    """Gopher's duplicate-line filter signal: the fraction of non-empty
    trimmed lines that duplicate an earlier line. Navigation chrome and
    templated pages score high; clean prose scores 0."""
    lines = F.filter(
        F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )
    n = F.size(lines)
    return F.when(text.isNull(), F.lit(None).cast("double")).otherwise(
        F.when(n <= 0, F.lit(0.0)).otherwise(
            F.lit(1.0)
            - F.size(F.array_distinct(lines)).cast("double") / n.cast("double")
        )
    )


# Mersenne prime 2^31-1: acc*31 + codepoint stays < 2^36, so 64-bit
# integer math never overflows in Spark or DuckDB and results match.
_RABIN_PRIME = 2147483647


def rolling_fingerprint(text: Column) -> Column:
    """Rabin-style rolling polynomial fingerprint of the normalized
    text: fold acc = (acc*31 + codepoint) mod 2^31-1 over characters.
    One interpreted pass per row (no UDF, no shuffle); the DuckDB oracle
    is the same fold via list_reduce, so cross-engine results are
    bit-identical."""
    normalized = F.lower(F.trim(F.regexp_replace(text, _WS, " ")))
    chars = F.filter(F.split(normalized, ""), lambda c: c != F.lit(""))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(31) + F.ascii(c)) % F.lit(_RABIN_PRIME),
    )


def fingerprint_md5(text: Column) -> Column:
    """Exact-dedup fingerprint: md5 over the UTF-8 bytes of the
    whitespace-normalized, lowercased text."""
    normalized = F.lower(F.trim(F.regexp_replace(text, _WS, " ")))
    return F.md5(F.encode(normalized, "UTF-8"))


# Stopword membership tables for the n-gram-free language-ID heuristic.
# Tiny, deterministic, broadcast as literals into the plan.
_LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "ich", "mit", "sie"],
    "fr": ["le", "la", "les", "et", "est", "dans", "que", "pour", "une", "des"],
    "es": ["el", "la", "los", "las", "es", "en", "que", "por", "una", "con"],
}


def stopword_score(text: Column, lang: str) -> Column:
    """Stopword hit count for one language over the lowercased token
    array (duplicates count — frequency matters)."""
    wordset = F.array(*[F.lit(w) for w in _LANG_STOPWORDS[lang]])
    toks = tokens(F.lower(text))
    return F.size(F.filter(toks, lambda t: F.array_contains(wordset, t))).cast("int")


def lang_id(text: Column) -> Column:
    """Heuristic language ID: stopword hit counts per language, highest
    wins with a fixed priority order (en > de > fr > es) on ties; 'und'
    when nothing matches. A deterministic first-match CASE chain — all
    built-in array functions, no UDF, no shuffle, and mirrorable in
    ANSI SQL for the oracle."""
    en = stopword_score(text, "en")
    de = stopword_score(text, "de")
    fr = stopword_score(text, "fr")
    es = stopword_score(text, "es")
    return (
        F.when((en > 0) & (en >= de) & (en >= fr) & (en >= es), F.lit("en"))
        .when((de > 0) & (de >= fr) & (de >= es), F.lit("de"))
        .when((fr > 0) & (fr >= es), F.lit("fr"))
        .when(es > 0, F.lit("es"))
        .otherwise(F.lit("und"))
    )


def word_shingles(text: Column, n: int) -> Column:
    """Word-level n-gram shingles -> array<string>; the unit for
    MinHash / Jaccard near-dedup. Sliding window via sequence+transform
    (pure codegen, no explode until the caller chooses to)."""
    toks = tokens(text)
    starts = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    # Guard: sequence(1, 0) DESCENDS in Spark, so short docs need an
    # explicit empty-array branch.
    return F.when(
        F.size(toks) >= n,
        F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
    ).otherwise(F.array().cast("array<string>"))


# --- PII scrubbing (corpus-curation stage) ---------------------------
# Conservative patterns with identical semantics in Java regex and RE2:
# no lookaround, ASCII \b word boundaries, explicit classes. Precision
# over recall — a redactor that overmatches eats training text.
_PII_PATTERNS: dict[str, str] = {
    # local@domain.tld (tld >= 2 letters)
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # dotted-quad IPv4 (no range check — 999.0.0.1 redacts; fine for
    # scrubbing, wrong for parsing)
    "IP": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    # international-format phone: + then 7..15 digits with separators
    "PHONE": r"\+[0-9][0-9 ().-]{5,16}[0-9]",
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII match counts ({'EMAIL': Column, ...}) — the audit
    signal; all regexp_count, scan-stage."""
    return {
        kind: F.when(text.isNull(), F.lit(None).cast("int")).otherwise(
            F.regexp_count(text, F.lit(pat)).cast("int")
        )
        for kind, pat in _PII_PATTERNS.items()
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with a typed placeholder token
    (<EMAIL>, <IP>, <PHONE>). Email first: its local part may contain
    digits a later pattern could clip. Pure chained regexp_replace —
    codegen, no UDF, and each pattern has a bit-identical DuckDB
    regexp_replace(..., 'g') twin."""
    out = text
    for kind in ("EMAIL", "IP", "PHONE"):
        out = F.regexp_replace(out, _PII_PATTERNS[kind], f"<{kind}>")
    return out


# Shannon entropy needs ln(2); both engines must use the IDENTICAL
# double constant, never a runtime log(2) whose last ulp is libm's.
_LN2 = 0.6931471805599453


def char_entropy(text: Column) -> Column:
    """Shannon entropy of the character distribution, bits/char — the
    classic gibberish/boilerplate detector (near-0 = repeated filler,
    ~4.1 = typical English prose, higher = random-looking).

    Zero-shuffle scan-stage form (the dedup_lines_within approach):
    char array -> array_distinct -> per-distinct count via a nested
    filter -> H = (ln N - S/N) / ln 2 with S = sum(c*ln c).  Work per
    row is O(len x distinct-chars); the alphabet bound (~100 for real
    text) keeps that linear in practice, and nothing leaves the scan
    stage.

    Engine-portable determinism (the bigram-LM precedent): each
    c*ln(c) term is rounded to 9dp and summed as DECIMAL — exact, so
    accumulation order can't matter — and the final value is rounded
    to 6dp, collapsing any last-ulp libm divergence in ln() with
    probability ~1e-3 per term pair. Empty/NULL text scores 0.0."""
    chars = F.filter(F.split(text, ""), lambda c: c != F.lit(""))
    n = F.size(chars)
    counts = F.transform(
        F.array_distinct(chars),
        lambda d: F.size(F.filter(chars, lambda x: x == d)),
    )
    terms = F.transform(
        counts,
        lambda c: F.round(
            c.cast("double") * F.log(c.cast("double")), 9
        ).cast("decimal(25,9)"),
    )
    s = F.aggregate(
        terms,
        F.lit(0).cast("decimal(25,9)"),
        lambda a, b: (a + b).cast("decimal(25,9)"),
    )
    h = (
        F.log(n.cast("double")) - s.cast("double") / n.cast("double")
    ) / F.lit(_LN2)
    return F.when(
        text.isNotNull() & (n > 0), F.round(h, 6)
    ).otherwise(F.lit(0.0))


def compression_ratio(
    df, text_col: str = "text", out_col: str = "compression_ratio"
):
    """zlib compressed-size / raw-size per document — the other classic
    redundancy signal (low ratio = highly repetitive text).  No SQL
    engine exposes zlib, so this is Arrow-batched mapInPandas (never
    row-at-a-time) and deliberately test-only rather than
    oracle-graded; determinism comes from zlib's fixed level-6 output
    for a given input.  Appends ``out_col`` (double; empty/NULL -> 0)."""
    import pandas as pd  # noqa: F401 (documents the batch type)
    import zlib

    from pyspark.sql.types import DoubleType, StructField, StructType

    # copy, never .add() on df.schema — StructType.add mutates in place
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType(), False)]
    )

    def _batches(it):
        for pdf in it:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            pdf[out_col] = [
                (len(zlib.compress(b, 6)) / len(b)) if len(b) else 0.0
                for b in raw
            ]
            yield pdf

    return df.mapInPandas(_batches, schema)


def normalize_text(
    text: Column,
    lowercase: bool = True,
    collapse_whitespace: bool = True,
    strip_controls: bool = True,
    strip_punct: bool = False,
) -> Column:
    """The standard web-text cleanup chain as ONE composable scan-stage
    expression — the public normalization the dedup fingerprints apply
    inline (fingerprint_md5 / rolling_fingerprint), exposed for
    pipelines that need the cleaned text itself (display, chunking,
    tokenizer input).

    Steps (each optional, applied in this order): strip C0/C1 control
    characters (keeping \\t \\n \\r, which the whitespace pass then
    folds), collapse whitespace runs to single spaces + trim,
    lowercase, strip the kernel's punctuation class.  All Java/RE2-
    parity regexes, so the chain mirrors 1:1 into any SQL engine."""
    out = text
    if strip_controls:
        out = F.regexp_replace(
            out, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", ""
        )
    if collapse_whitespace:
        out = F.trim(F.regexp_replace(out, _WS, " "))
    if lowercase:
        out = F.lower(out)
    if strip_punct:
        out = F.regexp_replace(out, _PUNCT, "")
    return out


def char_entropy_table(df, id_col: str = "doc_id", text_col: str = "text"):
    """(id, char_entropy6) via explode + two hash aggregates — the
    THROUGHPUT form of `char_entropy` (identical values; equality is
    test-pinned).  The expression form's nested HOF costs
    O(len x distinct) *interpreted* ops per row (Spark HOFs don't
    codegen — the same reason MinHash runs as a hash aggregate, see
    docs/SCALE.md); this one is all codegen'd: explode chars ->
    count per (id, char) -> per-id DECIMAL term sum.  Two shuffles
    keyed on the id, both map-side combined.  Docs with no characters
    (empty/NULL text) have no rows here — coalesce to 0.0 on join,
    matching the expression form."""
    c = F.col(text_col)
    chars = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.filter(F.split(c, ""), lambda ch: ch != F.lit(""))
        ).alias("__c"),
    )
    counts = chars.groupBy("__id", "__c").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    nd = F.col("__n").cast("double")
    return (
        counts.groupBy("__id")
        .agg(
            F.sum("__n").cast("long").alias("__total"),
            F.sum(
                F.round(nd * F.log(nd), 9).cast("decimal(25,9)")
            ).alias("__s"),
        )
        .select(
            F.col("__id").alias(id_col),
            F.round(
                (
                    F.log(F.col("__total").cast("double"))
                    - F.col("__s").cast("double")
                    / F.col("__total").cast("double")
                )
                / F.lit(_LN2),
                6,
            ).alias("char_entropy6"),
        )
    )
