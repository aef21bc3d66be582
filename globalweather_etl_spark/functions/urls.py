"""URL analysis expressions: host extraction, normalization, domain
grouping — the keys web-corpus pipelines filter, dedupe, and rate-limit
by.

All pure Column expressions. Spark's `parse_url` is JVM-side but has no
DuckDB twin, so these use regexp with Java/RE2-identical syntax — every
function here is oracle-checkable like the rest of the text kernel.

Normalization policy (deliberately minimal and lossless enough for
dedup keys): lowercase scheme+host, strip a single trailing slash on
bare-path URLs, drop fragments, keep query strings (they distinguish
content on many sites; callers wanting stronger canonicalization drop
them explicitly).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme://host[:port][/path...] — host is captured; RE2 and Java agree
# on non-capturing groups and leftmost-first alternation.
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]+)"

# Common non-registrable suffix heuristic: a real public-suffix list is
# data, not code — callers needing exactness join one. Two-label
# suffixes cover the dominant cases (co.uk, com.au, ...).
_TWO_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tr", "com.ar", "co.za",
)


def url_host(url: Column) -> Column:
    """Lowercased host of an absolute URL; NULL when the value does not
    parse as scheme://host..."""
    h = F.regexp_extract(url, _HOST_RE, 1)
    return F.when(h == "", F.lit(None).cast("string")).otherwise(F.lower(h))


def url_normalize(url: Column) -> Column:
    """Dedup-key normalization: lowercase scheme+host, strip #fragment,
    strip one trailing slash from a bare authority ('http://A/' ->
    'http://a'). Path/query case is preserved (significant on most
    servers)."""
    no_frag = F.regexp_replace(url, r"#.*$", "")
    # lowercase only the scheme://host prefix; the path/query tail is
    # re-attached byte-for-byte via substring on the prefix length
    prefix = F.regexp_extract(no_frag, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    lowered = F.concat(
        F.lower(prefix),
        F.substring(no_frag, F.length(prefix) + 1, F.lit(1 << 30)),
    )
    return F.regexp_replace(lowered, r"^([a-z][a-z0-9+.-]*://[^/?#]*)/$", r"$1")


def registered_domain(host: Column) -> Column:
    """Registrable-domain heuristic: last two labels, or last three when
    the last two are a known multi-label suffix (co.uk etc.). IPv4
    hosts pass through unchanged."""
    is_ip = host.rlike(r"^[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}$")
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    suffix_set = F.array(*[F.lit(s) for s in _TWO_LABEL_SUFFIXES])
    return (
        F.when(host.isNull() | is_ip | (n <= 2), host)
        .when(F.array_contains(suffix_set, last2) & (n >= 3), last3)
        .otherwise(last2)
    )
