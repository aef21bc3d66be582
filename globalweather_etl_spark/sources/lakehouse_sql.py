"""SQL surface for the lakehouse verbs — the reference's idiom is pure
SQL (sql/ETL_GlobalWeather_DB.sql:1-188 runs everything as statements;
Snowflake supplies `AT (OFFSET ...)`, `CREATE TABLE ... CLONE`,
`MERGE INTO` underneath), while `SnapshotTable` exposes the same
capabilities as a Python API. This module is the thin dispatcher
between them: a documented statement subset parses onto the existing
table methods, and everything else passes through to ``spark.sql``
untouched.

Grammar (one statement per call; table paths are quoted strings —
these tables live at filesystem roots, not in a metastore):

  OPTIMIZE '<path>' [ZORDER BY (c1, c2, ...)] [CLUSTER BY (...)]
      [USING MORTON|HILBERT]
      [FULL] [AUTO FULL THRESHOLD <x>]
  VACUUM '<path>' [RETAIN <n> VERSIONS] [DRY RUN]
  RESTORE '<path>' TO VERSION AS OF <v>
  CREATE TABLE '<dest>' CLONE '<src>' [VERSION AS OF <v>]
  DESCRIBE HISTORY '<path>'
  DESCRIBE DETAIL '<path>' [VERSION AS OF <v> | VERSION AS OF '<tag>']
      — metadata-only detail dict (version, mode, n_files, n_rows,
      stored_form inline/flat-sidecar/tree/delta, clustering spec,
      tags pinning the version, committed_at); never decodes a tree
      checkpoint's listing
  ALTER TABLE '<path>' ADD COLUMN <name> <ddl-type>
  ALTER TABLE '<path>' DROP COLUMN <name>
  ALTER TABLE '<path>' CREATE TAG <name> [VERSION AS OF <v>]
  ALTER TABLE '<path>' DROP TAG <name>
  DELETE FROM '<path>' WHERE <predicate>
  INSERT INTO '<path>' <select>
  INSERT OVERWRITE '<path>' <select>
  INSERT INTO '<path>' REPLACE WHERE <predicate> <select>
  MERGE INTO '<path>' [AS t] USING <view-or-(subquery)> [AS s]
      ON <equi-conjunction>
      [WHEN MATCHED THEN {UPDATE SET * | UPDATE SET col = <expr>
          [, col = <expr> ...] | DELETE}]
      [WHEN NOT MATCHED THEN INSERT *]
      — the column-level SET list (expressions over t.* and s.*)
      dispatches to merge_into_set: a pre-join builds the row image
      merge_into applies; target keys must be unique
  SELECT ... FROM '<path>' [VERSION AS OF <v> | VERSION AS OF '<tag>'
      | TIMESTAMP AS OF '<ts>'] [AS alias] ...
  SELECT ... FROM CHANGES('<path>', <since>[, <to>], KEY (k1, ...))
      — the op-tagged CDC feed (read_changes) as a table function;
      <since>/<to> are versions or TIMESTAMP '<ts>' (version_asof)
  SELECT ... FROM GEO_RADIUS_JOIN(<tbl> (lx, ly), <tbl> (rx, ry),
      RADIUS <n> [, CELL <n>])
      — spatial radius join (operators/geo.planar_radius_join) as a
      table function; <tbl> is a bare view/catalog identifier or a
      quoted snapshot-table path
  SELECT ... FROM GEO_KNN_JOIN(<tbl> <id> (lx, ly), <tbl> <id>
      (rx, ry), K <k>, RADIUS <r> [, COMPLETE] [, CELL <n>])
      — radius-bounded kNN join; with COMPLETE, RADIUS is the
      expanding-ring escalation's initial radius and every left point
      gets its true k nearest (planar_knn_join_complete)
  SELECT ... FROM GEO_SPHERE_JOIN(<tbl> <id> (lat, lon), <tbl> <id>
      (rlat, rlon), KM <r> [, K <k>] [, MAXLAT <d>])
      — great-circle radius join in km (sphere_radius_join_km);
      with K the pairs rank per left point into a radius-bounded
      spherical kNN (sphere_knn_join_km, knn_rank column); MAXLAT
      caps |latitude| to keep the longitude window finite
  SELECT ... FROM GEO_PIP_JOIN(<tbl> <id> (x, y), <tbl> <id>
      (<vertices-col>) [, SPHERE [MAXLAT <d>] [MAXEDGE <d>]]
      [, CELL <n>])
      — point-in-polygon containment join
      (planar_point_in_polygon_join); the polygon operand names its
      array<struct<x,y>> vertex column. With SPHERE the coordinates
      are decimal-degree (lat, lon) / array<struct<lat,lon>> and the
      geodesic form runs (sphere_point_in_polygon_join): MAXLAT caps
      |latitude| (default 85), MAXEDGE caps per-edge longitude span
      (default 90; antimeridian-crossing polygons must be pre-split)

Design notes:
- MERGE supports the row-image form (UPDATE SET * / INSERT *), which
  is what `SnapshotTable.merge_into` implements (the source row wins
  whole) — column-level SET lists would need expression rewriting the
  underlying method doesn't do, so they are a loud error, not a wrong
  answer.
- The ON clause must be a conjunction of `t.k = s.k` equalities
  (any alias spelling); merge keys fall out of it. Theta-ON is
  rejected loudly for the same reason Delta restricts pruning ones.
- SELECT time travel rewrites the quoted path (+ optional AS OF) to a
  registered temp view over `table.read(version)` /
  `read_asof(timestamp)` and hands the rewritten text to Catalyst —
  projection/filter semantics stay 100% Spark SQL; this module never
  interprets the query itself.
- Statements parse with anchored regexes over a whitespace-normalized
  head; anything unrecognized that doesn't start with a lakehouse
  verb falls through to ``spark.sql`` verbatim, so the dispatcher can
  front an existing SQL workload.

Parity with the Python API is test-pinned in
tests/test_lakehouse_sql.py (every verb vs its direct method call).
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import DataFrame, SparkSession

from globalweather_etl_spark.sources.snapshots import SnapshotTable

__all__ = ["lakehouse_sql", "lakehouse_sql_txn"]

_PATH = r"'(?P<path>[^']+)'"
_WS = re.compile(r"\s+")

_OPTIMIZE = re.compile(
    rf"^OPTIMIZE {_PATH}"
    r"(?: ZORDER BY \((?P<zorder>[^)]+)\))?"
    r"(?: CLUSTER BY \((?P<cluster>[^)]+)\))?"
    r"(?: USING (?P<curve>MORTON|HILBERT))?"
    r"(?P<full> FULL)?"
    r"(?: AUTO FULL THRESHOLD (?P<thr>[0-9.]+))?$",
    re.IGNORECASE,
)
_VACUUM = re.compile(
    rf"^VACUUM {_PATH}"
    r"(?: RETAIN (?P<keep>\d+) VERSIONS)?"
    r"(?P<dry> DRY RUN)?$",
    re.IGNORECASE,
)
_RESTORE = re.compile(
    rf"^RESTORE {_PATH} TO VERSION AS OF (?P<v>\d+)$", re.IGNORECASE
)
_CLONE = re.compile(
    r"^CREATE TABLE '(?P<dest>[^']+)' CLONE '(?P<src>[^']+)'"
    r"(?: VERSION AS OF (?P<v>\d+))?$",
    re.IGNORECASE,
)
_DELETE = re.compile(
    rf"^DELETE FROM {_PATH} WHERE (?P<pred>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_HISTORY = re.compile(
    rf"^DESCRIBE HISTORY {_PATH}$", re.IGNORECASE
)
_DETAIL = re.compile(
    rf"^DESCRIBE DETAIL {_PATH}"
    r"(?: VERSION AS OF (?:(?P<v>\d+)|'(?P<vtag>[^']+)'))?$",
    re.IGNORECASE,
)
_ALTER = re.compile(
    rf"^ALTER TABLE {_PATH} "
    r"(?:ADD COLUMN (?P<add>\w+) (?P<type>.+)"
    r"|DROP COLUMN (?P<drop>\w+)"
    r"|CREATE TAG (?P<ctag>[A-Za-z0-9][\w.\-]*)"
    r"(?: VERSION AS OF (?P<ctagv>\d+))?"
    r"|DROP TAG (?P<dtag>[A-Za-z0-9][\w.\-]*))$",
    re.IGNORECASE,
)
_INSERT = re.compile(
    rf"^INSERT (?P<over>INTO|OVERWRITE) {_PATH}"
    r"(?: REPLACE WHERE (?P<pred>.+?))?"
    r" (?P<select>\(?SELECT .+)$",
    re.IGNORECASE | re.DOTALL,
)
_MERGE = re.compile(
    rf"^MERGE INTO {_PATH}(?: AS (?P<talias>\w+))?"
    r" USING (?P<src>\([^)]+\)|[\w.]+)(?: AS (?P<salias>\w+))?"
    r" ON (?P<on>.+?)"
    r"(?P<clauses>(?: WHEN (?:NOT )?MATCHED THEN .+)?)$",
    re.IGNORECASE | re.DOTALL,
)
_WHEN = re.compile(
    r"WHEN (?P<not>NOT )?MATCHED THEN "
    r"(?P<action>UPDATE SET \*|INSERT \*|DELETE)",
    re.IGNORECASE,
)
_TRAVEL = re.compile(
    rf"{_PATH}(?: VERSION AS OF (?:(?P<v>\d+)|'(?P<vtag>[^']+)')"
    r"| TIMESTAMP AS OF '(?P<ts>[^']+)')?",
)
# CHANGES('<path>', <since>[, <to>], KEY (k1, k2)) — the op-tagged
# CDC feed (SnapshotTable.read_changes) as a table function; KEY
# names the diff key (this feed derives changes by keyed diff — it
# is not a stored change log). Bounds are version numbers or
# TIMESTAMP '<ts>' (resolved via version_asof: the table state AT
# that wall-clock instant, Snowflake's CHANGES ... AT(TIMESTAMP))
_CHG_BOUND = r"(?:\d+|TIMESTAMP\s+'[^']+')"
_CHANGES = re.compile(
    rf"CHANGES\(\s*'(?P<path>[^']+)'\s*,\s*(?P<lo>{_CHG_BOUND})"
    rf"(?:\s*,\s*(?P<hi>{_CHG_BOUND}))?"
    r"\s*,\s*KEY\s*\((?P<keys>[^)]+)\)\s*\)",
    re.IGNORECASE,
)
_ON_EQ = re.compile(r"^(?:\w+\.)?(?P<l>\w+)\s*=\s*(?:\w+\.)?(?P<r>\w+)$")


def _geo_tbl(prefix: str) -> str:
    """One GEO join table operand: a quoted snapshot-table path or a
    bare view/catalog identifier."""
    return rf"(?:'(?P<{prefix}path>[^']+)'|(?P<{prefix}name>[\w.]+))"


# GEO_RADIUS_JOIN(left (lx, ly), right (rx, ry), RADIUS n [, CELL n])
# — operators/geo.planar_radius_join as a SQL table function; the
# spatial family's SQL spelling (every other operator family has one)
_GEO_RJ = re.compile(
    rf"GEO_RADIUS_JOIN\(\s*{_geo_tbl('l')}\s*"
    r"\(\s*(?P<lx>\w+)\s*,\s*(?P<ly>\w+)\s*\)\s*,\s*"
    rf"{_geo_tbl('r')}\s*"
    r"\(\s*(?P<rx>\w+)\s*,\s*(?P<ry>\w+)\s*\)\s*,\s*"
    r"RADIUS\s+(?P<radius>\d+)"
    r"(?:\s*,\s*CELL\s+(?P<cell>\d+))?\s*\)",
    re.IGNORECASE,
)
# GEO_PIP_JOIN(points pid (x, y), polygons gid (vertices) [, CELL n])
# — point-in-polygon containment join
# (geo.planar_point_in_polygon_join); `vertices` names the
# array<struct<x,y>> polygon column
_GEO_PIP = re.compile(
    rf"GEO_PIP_JOIN\(\s*{_geo_tbl('l')}\s+(?P<pid>\w+)\s*"
    r"\(\s*(?P<lx>\w+)\s*,\s*(?P<ly>\w+)\s*\)\s*,\s*"
    rf"{_geo_tbl('r')}\s+(?P<gid>\w+)\s*"
    r"\(\s*(?P<vcol>\w+)\s*\)"
    r"(?P<sphere>\s*,\s*SPHERE"
    r"(?:\s+MAXLAT\s+(?P<maxlat>\d+(?:\.\d+)?))?"
    r"(?:\s+MAXEDGE\s+(?P<maxedge>\d+(?:\.\d+)?))?)?"
    r"(?:\s*,\s*CELL\s+(?P<cell>\d+))?\s*\)",
    re.IGNORECASE,
)
# GEO_SPHERE_JOIN(left lid (lat, lon), right rid (rlat, rlon),
#                 KM r [, MAXLAT d])
# — great-circle radius join in km (sphere_radius_join_km); MAXLAT is
# the |latitude| cap that keeps the longitude window finite (default
# 80, the operator's own default)
_GEO_SPH = re.compile(
    rf"GEO_SPHERE_JOIN\(\s*{_geo_tbl('l')}\s+(?P<lid>\w+)\s*"
    r"\(\s*(?P<lx>\w+)\s*,\s*(?P<ly>\w+)\s*\)\s*,\s*"
    rf"{_geo_tbl('r')}\s+(?P<rid>\w+)\s*"
    r"\(\s*(?P<rx>\w+)\s*,\s*(?P<ry>\w+)\s*\)\s*,\s*"
    r"KM\s+(?P<km>\d+(?:\.\d+)?)"
    r"(?:\s*,\s*K\s+(?P<k>\d+))?"
    r"(?:\s*,\s*MAXLAT\s+(?P<maxlat>\d+(?:\.\d+)?))?\s*\)",
    re.IGNORECASE,
)
# GEO_KNN_JOIN(left lid (lx, ly), right rid (rx, ry), K k, RADIUS r
#              [, COMPLETE] [, CELL n])
# — bounded kNN (planar_knn_join); with COMPLETE the RADIUS operand
# becomes the escalation's initial radius (planar_knn_join_complete)
_GEO_KNN = re.compile(
    rf"GEO_KNN_JOIN\(\s*{_geo_tbl('l')}\s+(?P<lid>\w+)\s*"
    r"\(\s*(?P<lx>\w+)\s*,\s*(?P<ly>\w+)\s*\)\s*,\s*"
    rf"{_geo_tbl('r')}\s+(?P<rid>\w+)\s*"
    r"\(\s*(?P<rx>\w+)\s*,\s*(?P<ry>\w+)\s*\)\s*,\s*"
    r"K\s+(?P<k>\d+)\s*,\s*RADIUS\s+(?P<radius>\d+)"
    r"(?P<complete>\s*,\s*COMPLETE)?"
    r"(?:\s*,\s*CELL\s+(?P<cell>\d+))?\s*\)",
    re.IGNORECASE,
)


def _to_unix(ts: str) -> float:
    """TIMESTAMP AS OF operand -> unix seconds: either a bare number
    or an ISO timestamp (naive reads as UTC — the manifest stamps are
    wall-clock UTC seconds)."""
    import datetime as _dt

    try:
        return float(ts)
    except ValueError:
        d = _dt.datetime.fromisoformat(ts)
        if d.tzinfo is None:
            d = d.replace(tzinfo=_dt.timezone.utc)
        return d.timestamp()


def _keys_from_on(on: str) -> list[str]:
    keys = []
    for conj in re.split(r"(?i)\s+AND\s+", on.strip()):
        m = _ON_EQ.match(conj.strip())
        if not m or m.group("l") != m.group("r"):
            raise ValueError(
                "MERGE ON must be a conjunction of same-name "
                f"equalities (t.k = s.k); cannot map {conj.strip()!r} "
                "onto merge_into keys"
            )
        keys.append(m.group("l"))
    return keys


def _sql_with_travel(spark: SparkSession, text: str) -> DataFrame:
    """Run ``text`` through the travel rewrite, execute it, then drop
    the per-query temp views the rewrite registered.  Dropping after
    ``spark.sql`` is safe: temp views resolve EAGERLY at analysis
    time, so the returned DataFrame's plan no longer references the
    catalog entry — without the drop, every CHANGES()/AS OF query
    would leak one uuid view into the session catalog forever."""
    views: list[str] = []
    df = spark.sql(_travel_rewrite(spark, text, views))
    for v in views:
        spark.catalog.dropTempView(v)
    return df


def _travel_rewrite(
    spark: SparkSession, text: str, views: list[str] | None = None
) -> str:
    """Rewrite every quoted snapshot-table path (+ optional AS OF) in
    ``text`` to a temp view over the pinned read. Only strings that
    actually root a committed snapshot table rewrite — ordinary string
    literals pass through untouched (the root check runs before any
    table handle, whose constructor would mkdir).  Created view names
    are appended to ``views`` (if given) so the caller can drop them
    after execution."""

    def _is_table_root(path: str) -> bool:
        jvm = spark._jvm
        try:
            # constructor INSIDE the try: _TRAVEL matches any quoted
            # string, and a non-path literal like ':' (e.g. a
            # concat_ws separator) makes Hadoop's Path constructor
            # itself throw URISyntaxException — that just means "not
            # a table root", never an error
            hp = jvm.org.apache.hadoop.fs.Path(
                f"{path.rstrip('/')}/_manifests"
            )
            fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())
            if not fs.exists(hp):
                return False
            for st in fs.listStatus(hp):
                name = st.getPath().getName()
                if name.startswith("v") and name.endswith(".json"):
                    return True
            return False
        except Exception:
            return False

    def _sub_changes(tm: re.Match) -> str:
        # same root guard as the travel rewrite: a typo'd path must
        # fail LOUDLY here, not let the SnapshotTable constructor
        # mkdir _manifests/_data at the bogus location first
        if not _is_table_root(tm.group("path")):
            raise ValueError(
                f"CHANGES(): {tm.group('path')!r} is not a snapshot "
                "table root (no committed _manifests)"
            )
        t = SnapshotTable(spark, tm.group("path"))

        def _bound(text_b: str | None) -> int | None:
            if text_b is None:
                return None
            if text_b.isdigit():
                return int(text_b)
            ts = re.match(
                r"(?is)^TIMESTAMP\s+'([^']+)'$", text_b
            ).group(1)
            return t.version_asof(_to_unix(ts))

        df = t.read_changes(
            _bound(tm.group("lo")),
            [k.strip() for k in tm.group("keys").split(",")],
            version=_bound(tm.group("hi")),
        )
        view = f"__chg_{uuid.uuid4().hex[:12]}"
        df.createOrReplaceTempView(view)
        if views is not None:
            views.append(view)
        return view

    text = _CHANGES.sub(_sub_changes, text)

    def _geo_side(tm: re.Match, prefix: str) -> DataFrame:
        name = tm.group(f"{prefix}name")
        if name is not None:
            return spark.table(name)
        path = tm.group(f"{prefix}path")
        if not _is_table_root(path):
            raise ValueError(
                f"GEO join: {path!r} is not a snapshot table root "
                "(no committed _manifests)"
            )
        return SnapshotTable(spark, path).read()

    def _geo_view(df: DataFrame) -> str:
        view = f"__geo_{uuid.uuid4().hex[:12]}"
        df.createOrReplaceTempView(view)
        if views is not None:
            views.append(view)
        return view

    def _sub_geo_rj(tm: re.Match) -> str:
        from globalweather_etl_spark.operators.geo import (
            planar_radius_join,
        )

        return _geo_view(
            planar_radius_join(
                _geo_side(tm, "l"),
                _geo_side(tm, "r"),
                int(tm.group("radius")),
                left_cols=(tm.group("lx"), tm.group("ly")),
                right_cols=(tm.group("rx"), tm.group("ry")),
                cell=int(tm.group("cell")) if tm.group("cell") else None,
            )
        )

    def _sub_geo_knn(tm: re.Match) -> str:
        from globalweather_etl_spark.operators.geo import (
            planar_knn_join,
            planar_knn_join_complete,
        )

        common = dict(
            left_cols=(tm.group("lx"), tm.group("ly")),
            right_cols=(tm.group("rx"), tm.group("ry")),
            cell=int(tm.group("cell")) if tm.group("cell") else None,
            right_id=tm.group("rid"),
        )
        left = _geo_side(tm, "l")
        right = _geo_side(tm, "r")
        k = int(tm.group("k"))
        radius = int(tm.group("radius"))
        lid = tm.group("lid")
        if tm.group("complete"):
            df = planar_knn_join_complete(
                left, right, k, radius, lid, **common
            )
        else:
            df = planar_knn_join(left, right, k, radius, lid, **common)
        return _geo_view(df)

    def _sub_geo_sph(tm: re.Match) -> str:
        from globalweather_etl_spark.operators.geo import (
            sphere_knn_join_km,
            sphere_radius_join_km,
        )

        kwargs = dict(
            left_id=tm.group("lid"),
            right_id=tm.group("rid"),
            left_cols=(tm.group("lx"), tm.group("ly")),
            right_cols=(tm.group("rx"), tm.group("ry")),
        )
        if tm.group("maxlat"):
            kwargs["max_abs_lat"] = float(tm.group("maxlat"))
        sides = (_geo_side(tm, "l"), _geo_side(tm, "r"))
        if tm.group("k"):
            # K k: radius-bounded spherical kNN (rank on the DECIMAL
            # km rounding, deterministic tiebreak)
            return _geo_view(
                sphere_knn_join_km(
                    *sides,
                    int(tm.group("k")),
                    float(tm.group("km")),
                    **kwargs,
                )
            )
        return _geo_view(
            sphere_radius_join_km(*sides, float(tm.group("km")), **kwargs)
        )

    def _sub_geo_pip(tm: re.Match) -> str:
        from globalweather_etl_spark.operators.geo import (
            planar_point_in_polygon_join,
            sphere_point_in_polygon_join,
        )

        common = dict(
            point_cols=(tm.group("lx"), tm.group("ly")),
            polygon_col=tm.group("vcol"),
            cell=int(tm.group("cell")) if tm.group("cell") else None,
        )
        sides = (
            _geo_side(tm, "l"),
            _geo_side(tm, "r"),
            tm.group("pid"),
            tm.group("gid"),
        )
        if tm.group("sphere"):
            # SPHERE: lat/lon degrees via the geodesic form (point
            # cols are (lat, lon), vertices array<struct<lat,lon>>)
            if tm.group("maxlat"):
                common["max_abs_lat"] = float(tm.group("maxlat"))
            if tm.group("maxedge"):
                common["max_edge_deg"] = float(tm.group("maxedge"))
            return _geo_view(
                sphere_point_in_polygon_join(*sides, **common)
            )
        return _geo_view(planar_point_in_polygon_join(*sides, **common))

    # GEO substitutions must run BEFORE the travel rewrite: _TRAVEL
    # matches any quoted path, including one inside GEO_*(...) args
    text = _GEO_PIP.sub(_sub_geo_pip, text)
    text = _GEO_SPH.sub(_sub_geo_sph, text)
    text = _GEO_KNN.sub(_sub_geo_knn, text)
    text = _GEO_RJ.sub(_sub_geo_rj, text)

    def _sub(tm: re.Match) -> str:
        if not _is_table_root(tm.group("path")):
            return tm.group(0)
        t = SnapshotTable(spark, tm.group("path"))
        if tm.group("ts") is not None:
            df = t.read_asof(_to_unix(tm.group("ts")))
        elif tm.group("vtag") is not None:
            # VERSION AS OF 'name' — a named tag (Iceberg's spelling)
            df = t.read_tag(tm.group("vtag"))
        else:
            df = t.read(
                int(tm.group("v")) if tm.group("v") else None
            )
        view = f"__snap_{uuid.uuid4().hex[:12]}"
        df.createOrReplaceTempView(view)
        if views is not None:
            views.append(view)
        return view

    return _TRAVEL.sub(_sub, text)


def _split_assignments(text: str) -> dict[str, str]:
    """``a = expr, b = expr`` -> {col: expr}, splitting on TOP-LEVEL
    commas only (expressions may contain commas inside parens, e.g.
    greatest(t.a, s.b), or inside single-quoted string literals,
    e.g. concat(t.v, ',x') — quoted text never counts as structure;
    SQL's '' escape is handled because each quote just toggles)."""
    parts, depth, buf, in_str = [], 0, [], False
    for ch in text:
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
        if ch == "," and depth == 0 and not in_str:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if buf:
        parts.append("".join(buf))
    out: dict[str, str] = {}
    for p in parts:
        m = re.match(r"(?s)^\s*(?:t\.)?(\w+)\s*=\s*(.+?)\s*$", p)
        if not m:
            raise ValueError(f"cannot parse SET assignment {p!r}")
        if m.group(1) in out:
            raise ValueError(f"column {m.group(1)!r} SET twice")
        out[m.group(1)] = m.group(2)
    return out


def _parse_merge(spark: SparkSession, m) -> tuple:
    """Shared MERGE clause parsing: (source_df, keys, when_matched,
    when_not_matched, set_exprs) from a _MERGE regex match —
    set_exprs is None for the row-image forms, a {col: sql-expr}
    dict for a column-level ``UPDATE SET a = ...`` list (dispatched
    to merge_into_set)."""
    src = m.group("src").strip()
    source: DataFrame = (
        spark.sql(f"SELECT * FROM {src} AS __merge_src")
        if src.startswith("(")
        else spark.table(src)
    )
    keys = _keys_from_on(m.group("on"))
    when_matched, when_not_matched = "update", "insert"
    set_exprs: dict[str, str] | None = None
    clauses = m.group("clauses") or ""
    if clauses.strip():
        when_matched = when_not_matched = "ignore"
        for part in re.split(r"(?i)\bWHEN\b", clauses):
            part = part.strip()
            if not part:
                continue
            w = re.match(r"(?is)^(NOT )?MATCHED THEN (.+)$", part)
            if not w:
                raise ValueError(f"cannot parse MERGE clause {part!r}")
            body = _WS.sub(" ", w.group(2).strip())
            action = body.upper()
            if w.group(1):
                if action != "INSERT *":
                    raise ValueError(
                        "WHEN NOT MATCHED supports INSERT * only"
                    )
                when_not_matched = "insert"
            elif action == "DELETE":
                when_matched = "delete"
            elif action == "UPDATE SET *":
                when_matched = "update"
            elif action.startswith("UPDATE SET "):
                # column-level SET list (ANSI): expressions over t./s.
                when_matched = "update"
                set_exprs = _split_assignments(
                    body[len("UPDATE SET "):]
                )
            else:
                raise ValueError(
                    f"unsupported WHEN MATCHED action {action!r}"
                    " — UPDATE SET * / UPDATE SET col = expr, ... / "
                    "DELETE"
                )
    return source, keys, when_matched, when_not_matched, set_exprs


def lakehouse_sql(spark: SparkSession, statement: str):
    """Execute one statement from the grammar above. Returns what the
    matching Python call returns (a dict for OPTIMIZE/VACUUM/DELETE/
    MERGE result summaries, an int version for RESTORE, a
    SnapshotTable for CLONE, a DataFrame for SELECT / passthrough)."""
    stmt = _WS.sub(" ", statement.strip()).rstrip(";").strip()

    m = _OPTIMIZE.match(stmt)
    if m:
        t = SnapshotTable(spark, m.group("path"))
        cols = m.group("zorder") or m.group("cluster")
        if cols is None:
            # Delta's bare OPTIMIZE: plain file compaction (bin-pack
            # rewrite, dataChange=false) — FULL / AUTO FULL make no
            # sense without a clustering spec
            if m.group("full") or m.group("thr"):
                raise ValueError(
                    "FULL / AUTO FULL THRESHOLD need ZORDER BY or "
                    "CLUSTER BY"
                )
            return {"version": t.compact()}
        cols = [c.strip() for c in cols.split(",")]
        kw = dict(
            full=bool(m.group("full")),
            auto_full_threshold=(
                float(m.group("thr")) if m.group("thr") else None
            ),
        )
        if m.group("zorder"):
            if m.group("curve"):
                kw["curve"] = m.group("curve").lower()
            return t.optimize(zorder_by=cols, **kw)
        if m.group("curve"):
            raise ValueError("USING <curve> needs ZORDER BY")
        return t.optimize(cluster_by=cols, **kw)

    m = _VACUUM.match(stmt)
    if m:
        t = SnapshotTable(spark, m.group("path"))
        return t.vacuum(
            keep_last=int(m.group("keep") or 1),
            dry_run=bool(m.group("dry")),
        )

    m = _RESTORE.match(stmt)
    if m:
        return SnapshotTable(spark, m.group("path")).restore(
            int(m.group("v"))
        )

    m = _CLONE.match(stmt)
    if m:
        return SnapshotTable(spark, m.group("src")).clone(
            m.group("dest"),
            version=int(m.group("v")) if m.group("v") else None,
        )

    m = _HISTORY.match(stmt)
    if m:
        hist = SnapshotTable(spark, m.group("path")).history()
        return spark.createDataFrame(
            [(h.version, h.mode, h.n_files, h.n_rows) for h in hist],
            "version int, mode string, n_files int, n_rows long",
        )

    m = _DETAIL.match(stmt)
    if m:
        # METADATA-ONLY table detail (Delta's DESCRIBE DETAIL): one
        # raw-manifest read — n_files comes from the stored n_files
        # (tree/flat checkpoints) or the inline listing length; the
        # listing is never decoded for a tree, so this is O(1) at any
        # file count
        t = SnapshotTable(spark, m.group("path"))
        v = t._read_version(
            int(m.group("v"))
            if m.group("v")
            else (m.group("vtag") or None)
        )
        if v is None:
            raise ValueError(f"no commits yet at {t.path}")
        raw = t._raw_manifest(v)
        if raw.get("delta"):
            # a delta head needs its chain resolved anyway (n_files
            # is not stored on deltas); checkpoints below stay raw
            resolved = t._manifest(v)
            n_files = len(resolved["files"])
            form = "delta"
            mcl = resolved.get("clustering")
        else:
            n_files = raw.get("n_files") or len(raw.get("files", ()))
            form = (
                "tree"
                if raw.get("files_tree")
                else ("flat-sidecar" if raw.get("files_ext") else "inline")
            )
            mcl = raw.get("clustering")
        cl = (
            {k: v2 for k, v2 in mcl.items() if k != "files"}
            if mcl is not None
            else None
        )
        return {
            "version": v,
            "mode": raw.get("mode"),
            "n_files": int(n_files),
            "n_rows": int(raw["n_rows"]),
            "stored_form": form,
            "clustering": cl,
            "tags": {
                name: tv
                for name, tv in t.tags().items()
                if tv == v
            },
            "committed_at": raw.get("committed_at"),
        }

    m = _ALTER.match(stmt)
    if m:
        t = SnapshotTable(spark, m.group("path"))
        if m.group("add"):
            return {
                "version": t.add_column(m.group("add"), m.group("type"))
            }
        if m.group("ctag"):
            return {
                "tag": m.group("ctag"),
                "version": t.create_tag(
                    m.group("ctag"),
                    int(m.group("ctagv")) if m.group("ctagv") else None,
                ),
            }
        if m.group("dtag"):
            t.delete_tag(m.group("dtag"))
            return {"tag": m.group("dtag"), "dropped": True}
        return {"version": t.drop_column(m.group("drop"))}

    m = _DELETE.match(stmt)
    if m:
        return SnapshotTable(spark, m.group("path")).delete_where(
            m.group("pred")
        )

    m = _INSERT.match(stmt)
    if m:
        t = SnapshotTable(spark, m.group("path"))
        # the select body may itself read snapshot paths (incl. AS OF)
        df = _sql_with_travel(spark, m.group("select"))
        if m.group("pred") is not None:
            if m.group("over").upper() == "OVERWRITE":
                raise ValueError(
                    "REPLACE WHERE composes with INSERT INTO only — "
                    "INSERT OVERWRITE already replaces the whole table"
                )
            return t.replace_where(df, m.group("pred").strip())
        mode = (
            "overwrite" if m.group("over").upper() == "OVERWRITE"
            else "append"
        )
        return {"version": t.write(df, mode=mode)}

    m = _MERGE.match(stmt)
    if m:
        t = SnapshotTable(spark, m.group("path"))
        source, keys, when_matched, when_not_matched, set_exprs = (
            _parse_merge(spark, m)
        )
        if set_exprs is not None:
            return t.merge_into_set(
                source,
                keys=keys,
                set_exprs=set_exprs,
                when_not_matched=when_not_matched,
            )
        return t.merge_into(
            source,
            keys=keys,
            when_matched=when_matched,
            when_not_matched=when_not_matched,
        )

    # SELECT (and anything else): rewrite quoted snapshot paths (+
    # optional AS OF) to temp views over the pinned reads, then let
    # Catalyst do the rest (_travel_rewrite documents the root check
    # that keeps ordinary string literals untouched).
    return _sql_with_travel(spark, stmt)


def lakehouse_sql_txn(
    spark: SparkSession,
    catalog,
    statements: list[str],
    parallelism: int = 1,
) -> dict[str, int]:
    """Execute a list of INSERT statements as ONE atomic multi-table
    transaction (sources/catalog.py) — the SQL spelling of the
    reference's transactional ELT session (the whole of ETL:17-136
    runs as one Snowflake session; readers see the rebuild all at
    once).

    Unlike ``lakehouse_sql``, table references here are CATALOG TABLE
    NAMES (quoted, resolved under ``catalog.root``), because the
    atomic unit is the catalog's decision log::

        lakehouse_sql_txn(spark, cat, [
            "INSERT OVERWRITE 'dim_date' SELECT ...",
            "INSERT OVERWRITE 'fact_weather_day' SELECT ...",
        ], parallelism=2)

    The full mutating verb set composes: INSERT INTO (append) / INSERT
    OVERWRITE (full rebuild) stage files and publish nothing until the
    decision; INSERT INTO ... REPLACE WHERE / MERGE INTO / DELETE FROM
    run as staged rewrite verbs (their compute holds their own table's
    pending window — Transaction's ops note documents the trade).  At
    most one statement per table per transaction.  Select bodies may
    read snapshot paths with VERSION/TIMESTAMP AS OF, same as
    lakehouse_sql.

    Returns the committed {table-name: version} map; on any error the
    transaction aborts and nothing is visible."""
    txn = catalog.begin()
    try:
        for statement in statements:
            stmt = _WS.sub(" ", statement.strip()).rstrip(";").strip()
            m = _INSERT.match(stmt)
            if m:
                df = _sql_with_travel(spark, m.group("select"))
                if m.group("pred") is not None:
                    if m.group("over").upper() == "OVERWRITE":
                        raise ValueError(
                            "REPLACE WHERE composes with INSERT INTO "
                            "only — INSERT OVERWRITE already replaces "
                            "the whole table"
                        )
                    txn.replace_where(
                        m.group("path"), df, m.group("pred").strip()
                    )
                else:
                    mode = (
                        "overwrite"
                        if m.group("over").upper() == "OVERWRITE"
                        else "append"
                    )
                    txn.write(m.group("path"), df, mode=mode)
                continue
            m = _DELETE.match(stmt)
            if m:
                txn.delete_where(m.group("path"), m.group("pred"))
                continue
            m = _MERGE.match(stmt)
            if m:
                source, keys, wm, wnm, sx = _parse_merge(spark, m)
                if sx is not None:
                    raise ValueError(
                        "column-level UPDATE SET is not available "
                        "inside a transaction: its pre-join reads the "
                        "head at call time, which a deferred-publish "
                        "window cannot pin — use UPDATE SET * or run "
                        "it as a standalone MERGE"
                    )
                txn.merge_into(
                    m.group("path"), source, keys,
                    when_matched=wm, when_not_matched=wnm,
                )
                continue
            raise ValueError(
                f"not transactional: {stmt[:60]!r} — INSERT INTO/"
                "OVERWRITE [REPLACE WHERE], MERGE INTO and DELETE "
                "FROM compose into a multi-table transaction (see "
                "docstring)"
            )
    except BaseException:
        if txn.state == "open":
            txn.abort()
        raise
    return txn.commit(parallelism=parallelism)


def _split_script(text: str) -> list[str]:
    """Split a SQL script on top-level semicolons — quote-aware so a
    ';' inside a '...'-quoted path/literal never splits (standard ''
    escaping: two quotes inside a literal toggle twice, harmless)."""
    out: list[str] = []
    buf: list[str] = []
    in_q = False
    for ch in text:
        if ch == "'":
            in_q = not in_q
            buf.append(ch)
        elif ch == ";" and not in_q:
            s = "".join(buf).strip()
            if s:
                out.append(s)
            buf = []
        else:
            buf.append(ch)
    s = "".join(buf).strip()
    if s:
        out.append(s)
    return out


_BEGIN = re.compile(r"BEGIN(\s+(TRANSACTION|WORK))?$", re.I)


def lakehouse_sql_script(
    spark: SparkSession,
    catalog,
    script: str,
    parallelism: int = 1,
) -> dict[str, int]:
    """``BEGIN; <statements>; COMMIT;`` — the reference's SESSION
    idiom as one string (the whole ELT script runs inside a Snowflake
    session and lands transactionally; ETL:17-136).  Parses the
    bracketed block and routes the body through ``lakehouse_sql_txn``
    (same verb set, same atomic decision), so the two spellings are
    parity-equal by construction (test-pinned).

    ``BEGIN [TRANSACTION|WORK]`` must open the script and ``COMMIT``
    or ``ROLLBACK`` must close it — anything else is a loud error
    (half a transaction silently executed would be the worst
    outcome).  ``ROLLBACK`` validates the bracket and publishes
    nothing (the body's statements are never executed: a rolled-back
    transaction has no observable effects, including its reads).

    Returns the committed {table: version} map ({} for ROLLBACK)."""
    stmts = _split_script(script)
    if not stmts or not _BEGIN.match(_WS.sub(" ", stmts[0]).strip()):
        raise ValueError(
            "transaction script must open with BEGIN "
            "[TRANSACTION|WORK] — got "
            f"{(stmts[0][:40] if stmts else '')!r}"
        )
    term = _WS.sub(" ", stmts[-1]).strip().upper()
    if term not in ("COMMIT", "COMMIT WORK", "ROLLBACK", "ROLLBACK WORK"):
        raise ValueError(
            "transaction script must close with COMMIT or ROLLBACK — "
            f"got {stmts[-1][:40]!r}"
        )
    body = stmts[1:-1]
    if term.startswith("ROLLBACK"):
        return {}
    return lakehouse_sql_txn(
        spark, catalog, body, parallelism=parallelism
    )
