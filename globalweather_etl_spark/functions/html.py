"""HTML → text extraction kernel: all-expression (zero UDFs), the
boilerplate-stripping front door of every web-corpus pipeline.

Public background: web curation (Common Crawl WET generation,
trafilatura-class extractors) starts by deleting non-content blocks
(script/style/comments), turning block-level boundaries into line
breaks, stripping the remaining markup, and decoding entities. This
module is the scan-stage core of that recipe as pure
`regexp_replace`/`replace` chains — whole-stage-codegen'd, linear in
input bytes, no Python anywhere — plus a visible-text-ratio quality
signal. A full DOM-aware extractor (readability scoring, link-density
per node) needs a parser and is out of scope; for corpus curation the
regex kernel is the published 90% answer.

Every pattern is written in the common subset of Java regex (Spark)
and RE2 (DuckDB) — `(?is)` flags, lazy quantifiers, character classes
— so the kernel has an exact cross-engine twin; the pytest DuckDB
parity test pins byte-identical output on adversarial fixtures.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["strip_html", "visible_text_ratio", "STRIP_HTML_SQL"]

# non-content blocks whose INNER TEXT must vanish with the tags.
# One pattern per tag, NOT a backreference — RE2 (the DuckDB twin's
# engine) has no backreferences, and cross-engine identity is the
# contract here
_BLOCK_KILL = [
    rf"(?is)<{t}\b.*?</{t}\s*>"
    for t in ("script", "style", "noscript", "template")
]
_COMMENT = r"(?s)<!--.*?-->"
_DOCTYPE = r"(?i)<!doctype[^>]*>"
# CLOSING block-level boundaries (plus void br/hr) become newlines so
# adjacent blocks don't fuse; opening tags fall through to _ANY_TAG's
# single space — mapping both sides would double every break
_BLOCK_BREAK = (
    r"(?i)<(br|hr|/p|/div|/li|/h[1-6]|/tr|/table|/ul|/ol|/blockquote|"
    r"/section|/article|/header|/footer|/title|/head)\b[^>]*>"
)
_ANY_TAG = r"<[^>]*>"

# decode order matters: &amp; LAST, else "&amp;lt;" double-decodes
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def strip_html(html: Column) -> Column:
    """Visible text of an HTML document: kill script/style/comment
    blocks, break on block-level tags, strip remaining markup, decode
    the common entities, normalize whitespace (runs of spaces/tabs to
    one space, 3+ newlines to a blank line, trimmed lines)."""
    t = html
    for pat in _BLOCK_KILL:
        t = F.regexp_replace(t, pat, "")
    t = F.regexp_replace(t, _COMMENT, "")
    t = F.regexp_replace(t, _DOCTYPE, "")
    t = F.regexp_replace(t, _BLOCK_BREAK, "\n")
    t = F.regexp_replace(t, _ANY_TAG, " ")
    for ent, rep in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.regexp_replace(t, r"[ \t\x0b\f\r]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n{3,}", "\n\n")
    # trim() strips spaces only; edges may hold newlines too
    return F.regexp_replace(t, r"(?s)^[ \n]+|[ \n]+$", "")


def visible_text_ratio(html: Column) -> Column:
    """len(visible text) / len(raw html) — the classic boilerplate
    signal: content pages sit high, chrome-heavy pages near zero.
    NULL-safe; empty html scores 0.0."""
    raw_len = F.length(html)
    return F.when(
        raw_len.isNull() | (raw_len == 0), F.lit(0.0)
    ).otherwise(
        F.length(strip_html(html)).cast("double") / raw_len
    )


def STRIP_HTML_SQL(col: str) -> str:
    """The DuckDB (RE2) twin of strip_html, as a SQL expression over
    ``col`` — the cross-engine contract the parity test pins."""
    t = col
    for pat in _BLOCK_KILL:
        t = f"regexp_replace({t}, '{pat}', '', 'g')"
    t = f"regexp_replace({t}, '{_COMMENT}', '', 'g')"
    t = f"regexp_replace({t}, '{_DOCTYPE}', '', 'g')"
    block = _BLOCK_BREAK.replace("'", "''")
    t = f"regexp_replace({t}, '{block}', chr(10), 'g')"
    t = f"regexp_replace({t}, '{_ANY_TAG}', ' ', 'g')"
    for ent, rep in _ENTITIES:
        rep_sql = rep.replace("'", "''")
        t = f"replace({t}, '{ent}', '{rep_sql}')"
    t = f"regexp_replace({t}, '[ \\t\\x0b\\f\\r]+', ' ', 'g')"
    t = f"regexp_replace({t}, ' ?\\n ?', chr(10), 'g')"
    t = f"regexp_replace({t}, '\\n{{3,}}', chr(10)||chr(10), 'g')"
    return f"regexp_replace({t}, '(?s)^[ \\n]+|[ \\n]+$', '', 'g')"
