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


# A compact positive-rule subset of the Public Suffix List
# (publicsuffix.org — public data; ship the full list as a data file in
# production and load it with `suffix_table`). Covers the two- and
# three-label suffixes that dominate web corpora; single-label TLDs
# need no entry (they are the PSL default rule). Wildcard/exception
# rules (*.ck / !www.ck) are out of scope and documented as such.
PSL_SUBSET = (
    # ccTLD second-level registries
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in",
    "co.kr", "or.kr", "ne.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "com.tr", "org.tr", "net.tr", "gov.tr", "edu.tr",
    "com.ar", "org.ar", "net.ar", "gob.ar", "edu.ar",
    "co.za", "org.za", "net.za", "web.za", "gov.za", "ac.za",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "geek.nz",
    "com.sg", "org.sg", "net.sg", "edu.sg", "gov.sg",
    "com.hk", "org.hk", "net.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.tw", "org.tw", "net.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.my", "org.my", "net.my", "edu.my", "gov.my",
    "co.id", "or.id", "web.id", "ac.id", "sch.id", "go.id",
    "com.ph", "org.ph", "net.ph", "edu.ph", "gov.ph",
    "com.vn", "org.vn", "net.vn", "edu.vn", "gov.vn",
    "com.eg", "org.eg", "net.eg", "edu.eg", "gov.eg",
    "com.sa", "org.sa", "net.sa", "edu.sa", "gov.sa", "med.sa",
    "com.ua", "org.ua", "net.ua", "edu.ua", "gov.ua", "in.ua",
    "com.pl", "org.pl", "net.pl", "edu.pl", "gov.pl", "waw.pl",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "com.co", "org.co", "net.co", "edu.co", "gov.co", "nom.co",
    "com.pe", "org.pe", "net.pe", "edu.pe", "gob.pe", "nom.pe",
    "com.ve", "org.ve", "net.ve", "co.ve", "gob.ve", "edu.ve",
    "com.ec", "org.ec", "net.ec", "edu.ec", "gob.ec", "med.ec",
    "com.uy", "org.uy", "net.uy", "edu.uy", "gub.uy",
    "co.th", "or.th", "in.th", "ac.th", "go.th", "net.th",
    "com.pk", "org.pk", "net.pk", "edu.pk", "gov.pk",
    "com.bd", "org.bd", "net.bd", "edu.bd", "gov.bd", "ac.bd",
    "com.ng", "org.ng", "net.ng", "edu.ng", "gov.ng", "sch.ng",
    "co.ke", "or.ke", "ne.ke", "ac.ke", "go.ke", "sc.ke",
    "com.gh", "org.gh", "edu.gh", "gov.gh", "mil.gh",
    # common three-label suffixes
    "pvt.k12.ma.us", "cc.ca.us", "k12.ca.us", "lib.ca.us",
)


def suffix_table(spark, suffixes=None, path: str | None = None):
    """Public-suffix rules as a 1-column DataFrame ('suffix') for
    registered_domain_join. Default: the built-in PSL_SUBSET. `path`
    loads a publicsuffix.org-format data file instead (one rule per
    line, '//' comments and wildcard/exception rules skipped) — the
    production route to the full list."""
    if path is not None:
        rules = []
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith("//"):
                    continue
                if line.startswith(("*", "!")):
                    continue  # wildcard/exception rules unsupported
                if "." in line:  # single-label TLDs are the default rule
                    rules.append(line.lower())
        suffixes = tuple(rules)
    elif suffixes is None:
        suffixes = PSL_SUBSET
    # distinct: a duplicate rule would fan out the broadcast join
    return spark.createDataFrame(
        [(s,) for s in sorted(set(suffixes))], "suffix string"
    )


def registered_domain_join(
    df,
    host_col: str,
    suffixes,
    out_col: str = "registered_domain",
):
    """Data-driven registrable domain: longest-positive-rule match
    against a suffix table (PSL semantics minus wildcard/exception
    rules; no match falls back to the default rule = last two labels,
    IPv4 hosts pass through).

    Scale shape: the suffix table is broadcast THREE times (matched
    against the host's last 2, 3, and 4 labels — registered domain =
    matched suffix + 1 label, so rules up to 4 labels deep are
    honored); each probe is a broadcast hash join with no fan-out, so
    the corpus never shuffles and the cost is three codegen'd hash
    lookups per row. Unlike the expression-literal heuristic
    (registered_domain), the rule set here is data, swappable without
    a plan recompile.
    """
    host = F.col(host_col)
    parts = F.split(host, r"\.")
    n = F.size(parts)

    def last_k(k: int) -> Column:
        # try_element_at: join conditions evaluate for every row with
        # no when() short-circuit, and ANSI element_at throws on hosts
        # with fewer than k labels. concat_ws skips the NULLs, and the
        # (n > k) conjunct keeps short hosts from matching anyway.
        return F.concat_ws(
            ".", *[F.try_element_at(parts, F.lit(-i)) for i in range(k, 0, -1)]
        )

    out = df
    for k in (2, 3, 4):
        sfx = F.broadcast(
            suffixes.select(F.lower(F.col("suffix")).alias(f"__sfx{k}"))
        )
        out = out.join(
            sfx, (n > k) & (last_k(k) == F.col(f"__sfx{k}")), "left"
        )
    is_ip = host.rlike(r"^[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}$")
    domain = (
        F.when(host.isNull() | is_ip | (n <= 2), host)
        .when(F.col("__sfx4").isNotNull(), last_k(5))
        .when(F.col("__sfx3").isNotNull(), last_k(4))
        .when(F.col("__sfx2").isNotNull(), last_k(3))
        .otherwise(last_k(2))
    )
    return out.withColumn(out_col, domain).drop("__sfx2", "__sfx3", "__sfx4")


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


def filter_domains(
    df,
    url_col: str,
    domains,
    mode: str = "block",
    suffixes=None,
):
    """Domain allow/block filtering — the crawl-pipeline gate that sits
    in front of every other curation stage (licensing blocklists,
    curated-source allowlists, spam domains).

    ``domains`` is a 1-column DataFrame ('domain') or an iterable of
    strings, matched case-insensitively against the PSL-derived
    REGISTRABLE domain of each row's URL (so 'example.co.uk' covers
    every subdomain of it). mode='block' drops matching rows;
    mode='allow' keeps ONLY matching rows. Rows whose URL yields no
    host (non-URLs, NULLs) are kept under 'block' (nothing matched)
    and dropped under 'allow' (nothing matched).

    Scale shape: registrable-domain derivation is the broadcast
    suffix-table probe of registered_domain_join (corpus never
    shuffles); the list membership test is a broadcast LEFT SEMI/ANTI
    join on the domain — block/allow lists are list-sized by
    definition. Helper columns are dropped; the output schema equals
    the input schema.
    """
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    spark = df.sparkSession
    if not hasattr(domains, "columns"):
        domains = spark.createDataFrame(
            [(d,) for d in domains], "domain string"
        )
    if suffixes is None:
        suffixes = suffix_table(spark)
    tagged = df.withColumn("__fd_host", url_host(F.col(url_col)))
    tagged = registered_domain_join(
        tagged, "__fd_host", suffixes, out_col="__fd_domain"
    )
    dlist = F.broadcast(
        domains.select(F.lower(F.col("domain")).alias("__fd_domain")).distinct()
    )
    how = "left_anti" if mode == "block" else "left_semi"
    kept = tagged.join(dlist, "__fd_domain", how)
    return kept.drop("__fd_host", "__fd_domain")
