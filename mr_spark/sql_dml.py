"""SQL-text DML over snapshot views — ``execute_dml(spark, "DELETE
FROM v WHERE ...")`` routing statement text to SnapshotTable methods
(VERDICT r7 #3: completes the pure-SQL session story that
register_snapshot_view's read surface started, while ``CREATE TABLE
... USING snapshot`` stays blocked by the measured catalog-properties
engine gap pinned in tests/test_sources.py).

Statements (case-insensitive keywords; names resolve through
register_snapshot_view's bindings — unpinned views only, a
version/timestamp-pinned view is read-only history):

* ``DELETE FROM <view> [WHERE <pred>]``
* ``UPDATE <view> SET col = <expr> [, col = <expr> ...] [WHERE <pred>]``
* ``MERGE INTO <view> [AS] t USING <any table/view> [AS] s
  ON t.<col> = s.<col> [AND <extra conjunct> ...]
  [WHEN MATCHED [AND <cond>] THEN UPDATE SET * | SET c = <expr>, ...]
  [WHEN MATCHED [AND <cond>] THEN DELETE]
  [WHEN NOT MATCHED [AND <cond>] THEN INSERT *]
  [WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN UPDATE SET ... | DELETE]``

Write statements (the INSERT family — positional column alignment and
ANSI store-assignment casts, like Spark/Delta's INSERT):

* ``INSERT INTO <view> [(c1, c2, ...)] VALUES (...), (...)`` /
  ``INSERT INTO <view> [(c1, ...)] SELECT ...`` → ``append`` (omitted
  columns fill from write defaults or NULL; identity columns are never
  insertable and are excluded from the default column list)
* ``INSERT OVERWRITE <view> [(c1, ...)] VALUES ... | SELECT ...`` →
  ``overwrite`` — ONE atomic commit replacing the table's content
* ``INSERT OVERWRITE <view> PARTITION (<pcol> = <lit>) VALUES/SELECT``
  → ``replace_where`` — the static-partition overwrite (the source
  must omit the partition column; it is supplied by the spec)
* ``TRUNCATE TABLE <view>`` → ``delete(where=None)`` — pure manifest
  metadata, zero bytes read or written
* ``COPY INTO <view> FROM '<path>' [FILEFORMAT = PARQUET|CSV|JSON]``
  → ``copy_into`` — file-level idempotent ingest; ``<path>`` may be a
  single file or a directory (its non-hidden files are listed);
  returns ``(version, n_loaded, n_skipped)``, not a bare version

DDL statements (the catalog's ``CREATE TABLE ... USING snapshot`` path
is engine-blocked — the properties-drop canary in tests/test_sources.py
— so the dispatcher owns table lifecycle too):

* ``CREATE TABLE <name> USING snapshot LOCATION '<path>'
  PARTITIONED BY (bucket(<n>, <keycol>)[, <pcol>]) AS SELECT ...`` —
  Iceberg's transform spelling: exactly one ``bucket(n, col)``
  transform declares the hash-bucket layout (the engine's key), an
  optional bare column adds value partitioning; the view is registered
  on success
* ``CONVERT TO SNAPSHOT '<source dir>' AS <name> LOCATION '<path>'
  KEY (<col>)`` — Delta's CONVERT TO DELTA analog: in-place conversion
  of an existing parquet directory (absolute refs, zero data movement;
  see SnapshotTable.convert for the single-bucket layout rule); the
  view is registered on success
* ``CREATE TABLE <name> SHALLOW|DEEP CLONE <view> [VERSION AS OF n]
  LOCATION '<path>'`` — Delta's CLONE SQL: shallow = metadata-only
  fork referencing the source's files; deep = fully localized copy in
  one commit; the new view is registered on success
* ``DROP TABLE <view>`` — unregisters the view binding and drops the
  Spark view; the data stays on disk (external-location semantics,
  like dropping an external Delta table)

Introspection: ``SHOW PARTITIONS <view>`` returns one row per live
partition value of a value-partitioned table, read from the manifest's
bucket map alone — zero data files touched.

CDF reads — Delta's TVF spelling: ``SELECT ... FROM
table_changes('<view>', v_from[, v_to])`` returns the per-commit change
feed (``_change_type`` / ``_commit_version`` + table columns). Python
sources cannot register TVFs, so the dispatcher binds each reference's
``feed()`` frame to a temp view and rewrites the reference in place;
pinned views are allowed (history reads are immutable).

Utility statements (Delta's SQL surface for the same operations):

* ``OPTIMIZE <view> [WHERE <pcol> = <literal>] [ZORDER BY (c1, c2)]``
  → ``compact(partition=..., zorder_by=...)`` (the WHERE must be one
  equality on the table's partition column — Delta's OPTIMIZE WHERE
  rule)
* ``VACUUM <view> [RETAIN <n> HOURS] [DRY RUN]`` → ``vacuum(...)``;
  returns the removed (or would-be-removed) path list, not a version
* ``RESTORE <view> TO VERSION AS OF <n> | TO TIMESTAMP AS OF
  <unix-seconds>`` → ``restore(...)`` (the timestamp form resolves
  through version_at — Delta's RESTORE TIMESTAMP AS OF)
* ``APPLY CHANGES INTO <view> FROM <table/view> [BATCH <n>]
  [APP '<id>']`` → ``apply_changes`` — the DLT verb: apply one
  CDF-shaped feed slice (``_change_type`` + table columns) in one
  atomic commit, with the usual monotonic (app, batch) replay
  protection
* ``ANALYZE [TABLE] <view> [COMPUTE STATISTICS]`` → ``analyze()`` —
  footer-metadata-only stats (+bloom) recompute
* ``GENERATE symlink_format_manifest FOR TABLE <view>`` →
  ``generate()`` — Delta's GENERATE spelling; returns the written
  manifest path list, not a version

ALTER statements (all metadata-only commits):

* ``ALTER TABLE <view> ADD COLUMN <name> <type>
  [DEFAULT <lit>] [INITIAL DEFAULT <lit>]`` — DEFAULT is the WRITE
  default (Delta's allowColumnDefaults: later omitting writers get
  it); INITIAL DEFAULT is Iceberg v3's initial-default (pre-existing
  rows read it — the metadata-only backfill); both may appear
* ``ALTER TABLE <view> RENAME COLUMN <a> TO <b>``
* ``ALTER TABLE <view> DROP COLUMN <c>``
* ``ALTER TABLE <view> ALTER COLUMN <c> TYPE <type>`` — lossless type
  widening only (widen_column's rules)
* ``ALTER TABLE <view> ADD CONSTRAINT <name> CHECK (<expr>)`` /
  ``ALTER TABLE <view> DROP CONSTRAINT <name>``
* ``ALTER TABLE <view> ADD PARTITION FIELD <col>`` /
  ``DROP PARTITION FIELD <col>`` /
  ``REPLACE PARTITION FIELD <col> WITH <col>`` — Iceberg's
  partition-evolution DDL → ``set_partition_spec`` (metadata-only;
  old files stay under their spec)

Introspection statements (return a DataFrame, not a version):

* ``DESCRIBE HISTORY <view> [LIMIT <n>]`` — one row per commit,
  newest first: version, timestamp, operation, params (JSON text)
* ``DESCRIBE DETAIL <view>`` — one row of table metrics (nested maps
  as JSON text)
* ``DESCRIBE FILES <view>`` — one row per live data file straight from
  the manifest (bucket, entry, on-disk bytes, DV flag, stats JSON) —
  Iceberg's ``.files`` metadata table as a statement; zero data reads

``<pred>`` is the shared data-skipping grammar (mr_spark/predicates.py
— comparisons, BETWEEN, IN, NOT IN, IS [NOT] NULL, parenthesised OR
groups, joined by AND), so SQL-text DELETE/UPDATE plans from manifest
stats exactly like the Python API: the trichotomy, metadata-only
drops, and DV modes all apply (``mode="dv"`` selects merge-on-read).
SET/merge expressions pass through to the engine as Spark SQL and must
reference merge rows via the REQUIRED aliases ``t`` (target) and ``s``
(source) — enforcing the aliases keeps pass-through sound. Anything
outside the grammar fails loudly; nothing falls back to a silent full
scan.

After a successful write the view is RE-REGISTERED over the same path,
so the next ``spark.sql`` against it reads the new version regardless
of any engine-side relation caching.

Scale: the statement itself adds no work — it parses to the same
predicate conjuncts and method calls as the Python API, so a SQL-only
retention job gets the identical O(manifest) planning.
"""

from __future__ import annotations

import re

__all__ = ["execute_dml", "sql"]


def _strip_quotes_spans(text: str):
    """Index ranges of single-quoted literals ('' escapes)."""
    spans = []
    i = 0
    while i < len(text):
        if text[i] == "'":
            j = i + 1
            while j < len(text):
                if text[j] == "'":
                    if j + 1 < len(text) and text[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            spans.append((i, j))
            i = j + 1
        else:
            i += 1
    return spans


def _find_top_keyword(text: str, keyword: str, start: int = 0) -> int:
    """Position of ``keyword`` (word-bounded, case-insensitive) outside
    quotes and parentheses, or -1."""
    spans = _strip_quotes_spans(text)

    def quoted(pos):
        return any(a <= pos <= b for a, b in spans)

    depth = 0
    pat = re.compile(rf"\b{keyword}\b", re.IGNORECASE)
    for i, ch in enumerate(text):
        if quoted(i):
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and i >= start:
            m = pat.match(text, i)
            if m:
                return i
    return -1


def _split_top_commas(text: str) -> list[str]:
    spans = _strip_quotes_spans(text)

    def quoted(pos):
        return any(a <= pos <= b for a, b in spans)

    parts, depth, last = [], 0, 0
    for i, ch in enumerate(text):
        if quoted(i):
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(text[last:i])
            last = i + 1
    parts.append(text[last:])
    return [p.strip() for p in parts if p.strip()]


def _resolve(view: str):
    from .sources.snapshot_source import _VIEW_BINDINGS

    b = _VIEW_BINDINGS.get(view.lower())
    if b is None:
        raise ValueError(
            f"{view!r} is not a registered snapshot view — bind it with "
            "register_snapshot_view(spark, name, path) first"
        )
    if b["pinned"]:
        raise ValueError(
            f"view {view!r} is pinned (version / timestamp_as_of / "
            "where) — pinned views are read-only history; register an "
            "unpinned view over the same path to write"
        )
    return b["path"]


def _table(spark, view: str):
    from .acid import SnapshotTable

    return SnapshotTable(spark, _resolve(view))


def _rebind(spark, view: str) -> None:
    """Re-register the view after a write so the next spark.sql reads
    the new version regardless of engine-side relation caching."""
    from .sources.snapshot_source import register_snapshot_view

    register_snapshot_view(spark, view, _resolve(view))


def _parse_where_tail(tail: str):
    from .predicates import parse_sql_where

    tail = tail.strip()
    if not tail:
        return None
    return parse_sql_where(tail)


def _parse_set_list(text: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for item in _split_top_commas(text):
        m = re.match(r"^\s*([A-Za-z_]\w*)\s*=\s*(.+)$", item, re.DOTALL)
        if not m:
            raise ValueError(
                f"cannot parse SET assignment {item!r} — expected "
                "col = <expr>"
            )
        col, expr = m.group(1), m.group(2).strip()
        if col in out:
            raise ValueError(f"column {col!r} assigned twice in SET")
        out[col] = expr
    if not out:
        raise ValueError("empty SET list")
    return out


_MERGE_HEAD = re.compile(
    r"^\s*MERGE\s+INTO\s+([A-Za-z_]\w*)\s+(?:AS\s+)?([A-Za-z_]\w*)\s+"
    r"USING\s+([A-Za-z_][\w.]*)\s+(?:AS\s+)?([A-Za-z_]\w*)\s+"
    r"ON\s+(.+?)\s*$",
    re.IGNORECASE | re.DOTALL,
)

_ON_COND = re.compile(
    r"^\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*$"
)


def _parse_merge(spark, stmt: str):
    # split off the WHEN clauses first (quote/paren aware)
    clauses = []
    rest = stmt
    positions = []
    start = 0
    while True:
        i = _find_top_keyword(rest, "WHEN", start)
        if i < 0:
            break
        positions.append(i)
        start = i + 4
    if positions:
        head = rest[: positions[0]]
        for a, b in zip(positions, positions[1:] + [len(rest)]):
            clauses.append(rest[a:b].strip())
    else:
        head = rest
    m = _MERGE_HEAD.match(head)
    if not m:
        raise ValueError(
            "cannot parse MERGE header — expected MERGE INTO <view> "
            "[AS] t USING <table> [AS] s ON t.<key> = s.<key>"
        )
    target, t_alias, source, s_alias, on = m.groups()
    if (t_alias.lower(), s_alias.lower()) != ("t", "s"):
        raise ValueError(
            "MERGE requires the aliases 't' (target) and 's' (source) — "
            "clause expressions pass through to the engine under those "
            f"names (got {t_alias!r}, {s_alias!r})"
        )
    # ON = one t.<col> = s.<col> equality (the anchor) plus optional
    # extra conjuncts (Delta's arbitrary ON, VERDICT r8 #4): the anchor
    # drives matching (bucket-pruned when it is the table key; the
    # documented full-closure path otherwise), the rest becomes the
    # engine-side on_condition. A pure non-equi ON (no t=s equality
    # conjunct at all) would be a cartesian match — refused.
    conjs = []
    rest_on = on
    while True:
        ai = _find_top_keyword(rest_on, "AND")
        if ai < 0:
            conjs.append(rest_on.strip())
            break
        conjs.append(rest_on[:ai].strip())
        rest_on = rest_on[ai + 3 :]
    key = None
    extras: list[str] = []
    for c in conjs:
        oc = _ON_COND.match(c)
        if oc and key is None:
            a1, c1, a2, c2 = oc.groups()
            refs = {a1.lower(): c1, a2.lower(): c2}
            if set(refs) == {"t", "s"} and refs["t"] == refs["s"]:
                key = refs["t"]
                continue
        extras.append(f"({c})")
    if key is None:
        raise ValueError(
            "MERGE ON needs at least one t.<col> = s.<col> equality "
            f"conjunct to anchor matching (got {on!r}) — a pure "
            "non-equi ON would match every pair (cartesian)"
        )
    kw: dict = {}
    _CL = re.compile(
        r"^WHEN\s+(NOT\s+MATCHED\s+BY\s+SOURCE|NOT\s+MATCHED|MATCHED)"
        r"(?:\s+AND\s+(.+?))?\s+THEN\s+(.+)$",
        re.IGNORECASE | re.DOTALL,
    )
    for cl in clauses:
        m2 = _CL.match(cl)
        if not m2:
            raise ValueError(f"cannot parse MERGE clause {cl!r}")
        kind = re.sub(r"\s+", " ", m2.group(1).upper())
        cond = m2.group(2).strip() if m2.group(2) else None
        action = m2.group(3).strip()
        au = action.upper()
        if kind == "MATCHED":
            if au == "DELETE":
                _put(kw, "matched_delete", True, cond,
                     "matched_delete_condition")
            elif au.startswith("UPDATE SET"):
                body = action[len("UPDATE SET"):].strip()
                val = "*" if body == "*" else _parse_set_list(body)
                _put(kw, "matched_update", val, cond,
                     "matched_update_condition")
            else:
                raise ValueError(
                    f"WHEN MATCHED supports UPDATE SET or DELETE, got {action!r}"
                )
        elif kind == "NOT MATCHED":
            if au == "INSERT *" or au == "INSERT":
                _put(kw, "not_matched_insert", "*", cond,
                     "not_matched_insert_condition")
            else:
                raise ValueError(
                    "WHEN NOT MATCHED supports INSERT * only (column "
                    f"lists are not part of this grammar), got {action!r}"
                )
        else:  # NOT MATCHED BY SOURCE
            if au == "DELETE":
                _put(kw, "not_matched_by_source_delete", True, cond,
                     "not_matched_by_source_delete_condition")
            elif au.startswith("UPDATE SET"):
                body = action[len("UPDATE SET"):].strip()
                _put(kw, "not_matched_by_source_update",
                     _parse_set_list(body), cond,
                     "not_matched_by_source_update_condition")
            else:
                raise ValueError(
                    "WHEN NOT MATCHED BY SOURCE supports UPDATE SET or "
                    f"DELETE, got {action!r}"
                )
    if not kw:
        raise ValueError("MERGE has no WHEN clauses")
    if extras:
        kw["on_condition"] = " AND ".join(extras)
    src_df = spark.table(source)
    return target, key, src_df, kw


def _put(kw: dict, name: str, val, cond, cond_name: str) -> None:
    if name in kw:
        raise ValueError(f"duplicate MERGE clause kind {name!r}")
    kw[name] = val
    if cond:
        kw[cond_name] = cond


def _insert_frame(spark, view: str, cols_txt: str | None, body: str):
    """Build the source DataFrame for an INSERT statement: ``body`` is
    the statement tail (``VALUES ...`` or ``SELECT ...``), aligned
    POSITIONALLY to the explicit column list (or the table schema minus
    identity columns — never insertable) and cast to the table's column
    types (ANSI store assignment, like Spark's INSERT)."""
    import json

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    t = _table(spark, view)
    m = t._manifest(t.latest_version())
    schema = StructType.fromJson(json.loads(m["schema"]))
    types = {f.name: f.dataType for f in schema.fields}
    ident = set(m.get("identity") or {})
    if cols_txt is not None:
        cols = [c.strip() for c in _split_top_commas(cols_txt)]
        unknown = [c for c in cols if c not in types]
        if unknown:
            raise ValueError(
                f"INSERT column list names columns not in the table "
                f"schema: {unknown}"
            )
        provided_ident = [c for c in cols if c in ident]
        if provided_ident:
            raise ValueError(
                f"identity columns are always generated — cannot insert "
                f"into {provided_ident}"
            )
        if len(set(cols)) != len(cols):
            raise ValueError(f"duplicate column in INSERT list: {cols}")
    else:
        cols = [f.name for f in schema.fields if f.name not in ident]
    body = body.strip()
    if re.match(r"^VALUES\b", body, re.IGNORECASE):
        src = spark.sql(
            f"SELECT * FROM {body} AS __ins({', '.join(cols)})"
        )
    elif re.match(r"^SELECT\b", body, re.IGNORECASE):
        src = spark.sql(body)
        if len(src.columns) != len(cols):
            raise ValueError(
                f"INSERT SELECT produces {len(src.columns)} columns but "
                f"the target list has {len(cols)} — alignment is "
                "positional"
            )
        src = src.toDF(*cols)
    else:
        raise ValueError(
            f"INSERT body must start with VALUES or SELECT, got {body!r}"
        )
    return t, src.select([F.col(c).cast(types[c]).alias(c) for c in cols])


def _parse_literal(text: str):
    """One literal token for ALTER defaults — reuses the shared
    tokenizer so quoting/number rules match the WHERE grammar."""
    from .predicates import _tokenize

    toks = _tokenize(text.strip())
    if len(toks) != 1 or toks[0][0] != "lit":
        raise ValueError(f"expected one literal, got {text!r}")
    return toks[0][1]


_TYPE_RE = r"[A-Za-z_][\w]*(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?"


_LIT_RE = r"('(?:[^']|'')*'|-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"


def _alter(spark, view: str, action: str) -> int:
    t = _table(spark, view)
    m = re.match(
        rf"^ADD\s+COLUMN\s+([A-Za-z_]\w*)\s+({_TYPE_RE})\s*(.*)$",
        action,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        col, dtype, tail = m.group(1), m.group(2), m.group(3).strip()
        init = write = None
        while tail:
            m2 = re.match(
                rf"^(INITIAL\s+)?DEFAULT\s+{_LIT_RE}\s*(.*)$",
                tail,
                re.IGNORECASE | re.DOTALL,
            )
            if not m2:
                raise ValueError(
                    f"cannot parse ADD COLUMN clause {tail!r} — expected "
                    "[INITIAL] DEFAULT <literal>"
                )
            val = _parse_literal(m2.group(2))
            if m2.group(1):
                if init is not None:
                    raise ValueError("INITIAL DEFAULT given twice")
                init = val
            else:
                if write is not None:
                    raise ValueError("DEFAULT given twice")
                write = val
            tail = m2.group(3).strip()
        return t.add_column(
            col, dtype, initial_default=init, write_default=write
        )
    m = re.match(
        r"^RENAME\s+COLUMN\s+([A-Za-z_]\w*)\s+TO\s+([A-Za-z_]\w*)\s*$",
        action,
        re.IGNORECASE,
    )
    if m:
        return t.rename_column(m.group(1), m.group(2))
    m = re.match(
        r"^DROP\s+COLUMN\s+([A-Za-z_]\w*)\s*$", action, re.IGNORECASE
    )
    if m:
        return t.drop_column(m.group(1))
    m = re.match(
        rf"^ALTER\s+COLUMN\s+([A-Za-z_]\w*)\s+TYPE\s+({_TYPE_RE})\s*$",
        action,
        re.IGNORECASE,
    )
    if m:
        return t.widen_column(m.group(1), m.group(2))
    m = re.match(
        r"^ADD\s+CONSTRAINT\s+([A-Za-z_]\w*)\s+CHECK\s*\((.+)\)\s*$",
        action,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        return t.add_constraint(m.group(1), m.group(2).strip())
    m = re.match(
        r"^DROP\s+CONSTRAINT\s+([A-Za-z_]\w*)\s*$", action, re.IGNORECASE
    )
    if m:
        return t.drop_constraint(m.group(1))
    # Iceberg's partition-evolution DDL (spec §Partition Evolution;
    # single-field specs in this layer, so ADD requires an unpartitioned
    # current spec and REPLACE swaps the one field) — all metadata-only.
    # Fields accept Iceberg's hidden-partitioning transform spellings:
    # col | days(col) | months(col) | years(col) | hours(col) |
    # truncate(width, col) | bucket(n, col).
    _FIELD = (
        r"([A-Za-z_]\w*"
        r"|(?:days|months|years|hours)\s*\(\s*[A-Za-z_]\w*\s*\)"
        r"|(?:truncate|bucket)\s*\(\s*\d+\s*,\s*[A-Za-z_]\w*\s*\))"
    )

    def _parse_field(text: str):
        f = re.match(
            r"^(days|months|years|hours)\s*\(\s*([A-Za-z_]\w*)\s*\)$",
            text,
            re.IGNORECASE,
        )
        if f:
            return (f.group(1).lower(), f.group(2))
        f = re.match(
            r"^(truncate|bucket)\s*\(\s*(\d+)\s*,\s*([A-Za-z_]\w*)\s*\)$",
            text,
            re.IGNORECASE,
        )
        if f:
            return (f.group(1).lower(), int(f.group(2)), f.group(3))
        return text

    m = re.match(
        rf"^ADD\s+PARTITION\s+FIELD\s+{_FIELD}\s*$", action, re.IGNORECASE
    )
    if m:
        cur = t._manifest(t.latest_version()).get("partition_by")
        if cur:
            raise ValueError(
                f"table already partitions by {cur!r} — this layer's "
                "specs have ONE field; use REPLACE PARTITION FIELD "
                f"{cur} WITH {m.group(1)}"
            )
        return t.set_partition_spec(_parse_field(m.group(1)))
    m = re.match(
        rf"^DROP\s+PARTITION\s+FIELD\s+{_FIELD}\s*$", action, re.IGNORECASE
    )
    if m:
        mfst = t._manifest(t.latest_version())
        spec = _parse_field(m.group(1))
        cur = mfst.get("partition_by")
        named = spec if isinstance(spec, str) else spec[-1]
        if cur != named:
            raise ValueError(
                f"current partition field is on {cur!r}, not {named!r}"
            )
        return t.set_partition_spec(None)
    m = re.match(
        rf"^REPLACE\s+PARTITION\s+FIELD\s+{_FIELD}\s+WITH\s+{_FIELD}\s*$",
        action,
        re.IGNORECASE,
    )
    if m:
        cur = t._manifest(t.latest_version()).get("partition_by")
        old = _parse_field(m.group(1))
        named = old if isinstance(old, str) else old[-1]
        if cur != named:
            raise ValueError(
                f"current partition field is on {cur!r}, not {named!r}"
            )
        return t.set_partition_spec(_parse_field(m.group(2)))
    raise ValueError(
        f"unsupported ALTER action {action!r} — supported: ADD COLUMN "
        "[DEFAULT/INITIAL DEFAULT], RENAME COLUMN, DROP COLUMN, ALTER "
        "COLUMN TYPE (lossless widening), ADD/DROP CONSTRAINT, "
        "ADD/DROP/REPLACE PARTITION FIELD (partition-spec evolution)"
    )


def execute_dml(spark, sql_text: str, mode: str = "cow") -> int:
    """Execute one statement (module docstring has the grammar)
    against its snapshot view's table; returns the committed version
    (VACUUM instead returns its removed-paths list). ``mode`` selects
    copy-on-write vs merge-on-read (deletion vectors) for
    DELETE/UPDATE — Delta's SQL has no mode syntax either (it is a
    table property there); other statements ignore it."""
    stmt = sql_text.strip().rstrip(";").strip()
    if re.match(r"^\s*SELECT\b", stmt, re.IGNORECASE):
        # Two Delta read spellings get rewritten in place (history is
        # immutable, so pinned views are fine — these are reads):
        #
        # * ``table_changes('v', v_from[, v_to])`` — the CDF TVF.
        #   Python sources cannot register TVFs, so each reference's
        #   change feed (feed() — the per-commit shape table_changes
        #   returns: _change_type + _commit_version + table columns)
        #   binds to a temp view;
        # * ``<view> VERSION AS OF n`` / ``<view> TIMESTAMP AS OF
        #   <lit>`` — time travel: the reference binds to a PINNED
        #   snapshot-source view (planning prunes from that version's
        #   manifest exactly like any pinned registration).
        from .acid import SnapshotTable
        from .sources.snapshot_source import (
            _VIEW_BINDINGS,
            register_snapshot_view,
        )

        def path_of(view):
            b = _VIEW_BINDINGS.get(view.lower())
            if b is None:
                raise ValueError(
                    f"{view!r} is not a registered snapshot view"
                )
            return b["path"]

        tc_pat = re.compile(
            r"\btable_changes\s*\(\s*'([A-Za-z_]\w*)'\s*,\s*(\d+)"
            r"\s*(?:,\s*(\d+)\s*)?\)",
            re.IGNORECASE,
        )
        tt_pat = re.compile(
            r"\b([A-Za-z_]\w*)\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+"
            rf"(\d+(?:\.\d+)?|{_LIT_RE})",
            re.IGNORECASE,
        )
        if not tc_pat.search(stmt) and not tt_pat.search(stmt):
            raise ValueError(
                "plain SELECT goes straight to spark.sql — execute_dml "
                "only rewrites SELECTs referencing table_changes('view', "
                "v_from[, v_to]) or '<view> VERSION/TIMESTAMP AS OF ...'"
            )

        def bind_tc(mm):
            view, v_from, v_to = mm.group(1), int(mm.group(2)), mm.group(3)
            t = SnapshotTable(spark, path_of(view))
            fd = t.feed(v_from, int(v_to) if v_to else None)
            tmp = f"__mrspark_tc_{view.lower()}_{v_from}_{v_to or 'latest'}"
            fd.createOrReplaceTempView(tmp)
            return tmp

        def bind_tt(mm):
            view, kind, lit = mm.group(1), mm.group(2).upper(), mm.group(3)
            path = path_of(view)
            if kind == "VERSION":
                n = int(lit)
                tmp = f"__mrspark_vao_{view.lower()}_{n}"
                register_snapshot_view(spark, tmp, path, version=n)
            else:
                ts = float(_parse_literal(lit)) if lit.startswith("'") else float(lit)
                tmp = f"__mrspark_tao_{view.lower()}_{str(ts).replace('.', '_')}"
                register_snapshot_view(spark, tmp, path, timestamp_as_of=ts)
            return tmp

        return spark.sql(tc_pat.sub(bind_tc, tt_pat.sub(bind_tt, stmt)))
    m = re.match(
        r"^\s*INSERT\s+(INTO|OVERWRITE)\s+([A-Za-z_]\w*)\s+(.*)$",
        stmt,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        kind, view, tail = m.group(1).upper(), m.group(2), m.group(3).strip()
        part_col = part_val = None
        pm = re.match(
            r"^PARTITION\s*\(\s*([A-Za-z_]\w*)\s*=\s*(.+?)\s*\)\s*(.*)$",
            tail,
            re.IGNORECASE | re.DOTALL,
        )
        if pm:
            if kind != "OVERWRITE":
                raise ValueError(
                    "PARTITION spec is only valid on INSERT OVERWRITE "
                    "(the static-partition overwrite)"
                )
            part_col, part_val = pm.group(1), _parse_literal(pm.group(2))
            tail = pm.group(3).strip()
        cols_txt = None
        cm = re.match(r"^\(([^)]*)\)\s*(.*)$", tail, re.DOTALL)
        if cm and re.match(
            r"^(VALUES|SELECT)\b", cm.group(2).strip(), re.IGNORECASE
        ):
            cols_txt, tail = cm.group(1), cm.group(2).strip()
        t, src = _insert_frame(spark, view, cols_txt, tail)
        if part_col is not None:
            from pyspark.sql import functions as F

            mfst = t._manifest(t.latest_version())
            pcol = mfst.get("partition_by")
            if part_col != pcol:
                raise ValueError(
                    f"PARTITION column {part_col!r} is not the table's "
                    f"partition column {pcol!r}"
                )
            if part_col in src.columns:
                raise ValueError(
                    "a static PARTITION spec supplies the partition "
                    "column — the INSERT source must omit it"
                )
            import json as _json

            from pyspark.sql.types import StructType

            ptype = {
                f.name: f.dataType
                for f in StructType.fromJson(_json.loads(mfst["schema"]))
            }[part_col]
            src = src.withColumn(part_col, F.lit(part_val).cast(ptype))
            v = t.replace_where(part_val, src)
        elif kind == "OVERWRITE":
            v = t.overwrite(src)
        else:
            v = t.append(src)
        _rebind(spark, view)
        return v
    m = re.match(
        r"^\s*TRUNCATE\s+TABLE\s+([A-Za-z_]\w*)\s*$", stmt, re.IGNORECASE
    )
    if m:
        view = m.group(1)
        t = _table(spark, view)
        v = t.delete(where=None)
        _rebind(spark, view)
        return v
    m = re.match(
        r"^\s*COPY\s+INTO\s+([A-Za-z_]\w*)\s+FROM\s+'([^']+)'"
        r"(?:\s+FILEFORMAT\s*=\s*([A-Za-z]+))?\s*$",
        stmt,
        re.IGNORECASE,
    )
    if m:
        import os

        view, path, fmt = m.group(1), m.group(2), (m.group(3) or "parquet")
        if os.path.isdir(path):
            paths = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if not f.startswith((".", "_"))
                and os.path.isfile(os.path.join(path, f))
            )
        else:
            paths = [path]
        t = _table(spark, view)
        result = t.copy_into(paths, source_format=fmt.lower())
        _rebind(spark, view)
        return result  # (version, n_loaded, n_skipped)
    m = re.match(
        r"^\s*CREATE\s+TABLE\s+([A-Za-z_]\w*)\s+USING\s+snapshot\s+"
        r"LOCATION\s+'([^']+)'\s+PARTITIONED\s+BY\s*\((.*?)\)\s+"
        r"AS\s+(SELECT\b.*)$",
        stmt,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        from .acid import SnapshotTable
        from .sources.snapshot_source import _VIEW_BINDINGS, register_snapshot_view

        name, path, spec_txt, select = m.groups()
        if name.lower() in _VIEW_BINDINGS:
            raise ValueError(f"view {name!r} is already a registered snapshot view")
        key = n_buckets = pcol = None
        for item in _split_top_commas(spec_txt):
            bm = re.match(
                r"^bucket\s*\(\s*(\d+)\s*,\s*([A-Za-z_]\w*)\s*\)$",
                item,
                re.IGNORECASE,
            )
            if bm:
                if key is not None:
                    raise ValueError(
                        "exactly one bucket(n, col) transform is required"
                    )
                n_buckets, key = int(bm.group(1)), bm.group(2)
            elif re.match(r"^[A-Za-z_]\w*$", item):
                if pcol is not None:
                    raise ValueError(
                        "at most one value-partition column is supported"
                    )
                pcol = item
            else:
                raise ValueError(
                    f"unsupported PARTITIONED BY item {item!r} — use "
                    "bucket(n, col) and at most one bare column"
                )
        if key is None:
            raise ValueError(
                "PARTITIONED BY must declare the hash layout with one "
                "bucket(n, col) transform (Iceberg's transform spelling) "
                "— the snapshot engine buckets every table on a key"
            )
        df = spark.sql(select)
        t = SnapshotTable.create(
            spark, path, df, key=key, n_buckets=n_buckets, partition_by=pcol
        )
        register_snapshot_view(spark, name, t.path)
        return t.latest_version()
    m = re.match(
        r"^\s*CONVERT\s+TO\s+SNAPSHOT\s+'([^']+)'\s+AS\s+([A-Za-z_]\w*)\s+"
        r"LOCATION\s+'([^']+)'\s+KEY\s*\(\s*([A-Za-z_]\w*)\s*\)\s*$",
        stmt,
        re.IGNORECASE,
    )
    if m:
        from .acid import SnapshotTable
        from .sources.snapshot_source import _VIEW_BINDINGS, register_snapshot_view

        source, name, path, key = m.groups()
        if name.lower() in _VIEW_BINDINGS:
            raise ValueError(
                f"view {name!r} is already a registered snapshot view"
            )
        t = SnapshotTable.convert(spark, path, source, key=key)
        register_snapshot_view(spark, name, t.path)
        return t.latest_version()
    m = re.match(
        r"^\s*CREATE\s+TABLE\s+([A-Za-z_]\w*)\s+(SHALLOW|DEEP)\s+CLONE\s+"
        r"([A-Za-z_]\w*)(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s+"
        r"LOCATION\s+'([^']+)'\s*$",
        stmt,
        re.IGNORECASE,
    )
    if m:
        from .sources.snapshot_source import _VIEW_BINDINGS, register_snapshot_view

        name, kind, src_view, ver, path = m.groups()
        if name.lower() in _VIEW_BINDINGS:
            raise ValueError(
                f"view {name!r} is already a registered snapshot view"
            )
        src = _table(spark, src_view)
        out = src.clone(
            path,
            version=int(ver) if ver else None,
            deep=kind.upper() == "DEEP",
        )
        register_snapshot_view(spark, name, out.path)
        return out.latest_version()
    m = re.match(
        r"^\s*DROP\s+TABLE\s+([A-Za-z_]\w*)\s*$", stmt, re.IGNORECASE
    )
    if m:
        from .sources.snapshot_source import _VIEW_BINDINGS

        view = m.group(1)
        if view.lower() not in _VIEW_BINDINGS:
            raise ValueError(
                f"{view!r} is not a registered snapshot view"
            )
        del _VIEW_BINDINGS[view.lower()]
        spark.catalog.dropTempView(view)
        return None  # external-location semantics: the data stays
    m = re.match(
        r"^\s*SHOW\s+PARTITIONS\s+([A-Za-z_]\w*)\s*$", stmt, re.IGNORECASE
    )
    if m:
        from .acid import _part_of

        t = _table(spark, m.group(1))
        mfst = t._manifest(t.latest_version())
        pcol = mfst.get("partition_by")
        if not pcol:
            raise ValueError(
                f"table behind {m.group(1)!r} is not value-partitioned"
            )
        from .acid import SnapshotTable as _ST
        from .acid import _sid_of, _spec_field

        # spec evolution: only the CURRENT spec's buckets are partitions
        # of this layout; foreign-spec buckets' composite values mean a
        # different column/transform entirely. Header = the spec FIELD
        # (col, col_day, col_trunc — Iceberg's naming).
        dsid = mfst.get("default_spec_id", 0)
        field = _spec_field(_ST._specs_of(mfst)[dsid])
        vals = sorted(
            {_part_of(b) for b in mfst["files"] if _sid_of(b) == dsid}
            - {None}
        )
        return spark.createDataFrame([(v,) for v in vals], f"{field} string")
    m = re.match(r"^\s*DELETE\s+FROM\s+([A-Za-z_]\w*)\s*(.*)$", stmt,
                 re.IGNORECASE | re.DOTALL)
    if m:
        view, tail = m.group(1), m.group(2).strip()
        where = None
        if tail:
            w = re.match(r"^WHERE\s+(.+)$", tail, re.IGNORECASE | re.DOTALL)
            if not w:
                raise ValueError(f"cannot parse DELETE tail {tail!r}")
            where = _parse_where_tail(w.group(1))
        t = _table(spark, view)
        v = t.delete(where=where, mode=mode)
        _rebind(spark, view)
        return v
    m = re.match(r"^\s*UPDATE\s+([A-Za-z_]\w*)\s+SET\s+(.+)$", stmt,
                 re.IGNORECASE | re.DOTALL)
    if m:
        view, rest = m.group(1), m.group(2)
        wi = _find_top_keyword(rest, "WHERE")
        where = None
        if wi >= 0:
            where = _parse_where_tail(rest[wi + len("WHERE"):])
            rest = rest[:wi]
        assigns = _parse_set_list(rest)
        t = _table(spark, view)
        v = t.update(assigns, where=where, mode=mode)
        _rebind(spark, view)
        return v
    if re.match(r"^\s*MERGE\b", stmt, re.IGNORECASE):
        target, key, src_df, kw = _parse_merge(spark, stmt)
        t = _table(spark, target)
        mkey = t._manifest(t.latest_version())["key"]
        if mkey != key:
            # non-key ON anchor: the documented FULL-CLOSURE path —
            # every bucket is read and rewritten (Delta's cost for an
            # un-clustered ON, stated in merge()'s docstring)
            kw["on_key"] = key
        v = t.merge(src_df, **kw)
        _rebind(spark, target)
        return v
    m = re.match(
        r"^\s*OPTIMIZE\s+([A-Za-z_]\w*)"
        r"(?:\s+WHERE\s+(.+?))?"
        r"(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*$",
        stmt,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        view, where_txt, zorder_txt = m.groups()
        t = _table(spark, view)
        partition = None
        if where_txt:
            cj = _parse_where_tail(where_txt)
            pcol = t._manifest(t.latest_version()).get("partition_by")
            if (
                len(cj) != 1
                or len(cj[0]) != 1
                or cj[0][0][0] != "cmp"
                or cj[0][0][2] != "eq"
            ):
                raise ValueError(
                    "OPTIMIZE WHERE must be a single equality on the "
                    "partition column (Delta's OPTIMIZE WHERE rule), "
                    f"got {where_txt!r}"
                )
            col, val = cj[0][0][1], cj[0][0][3]
            if col != pcol:
                raise ValueError(
                    f"OPTIMIZE WHERE column {col!r} is not the table's "
                    f"partition column {pcol!r}"
                )
            partition = val
        zorder = None
        if zorder_txt is not None:
            zorder = tuple(
                c.strip() for c in zorder_txt.split(",") if c.strip()
            )
            if not zorder:
                raise ValueError("empty ZORDER BY column list")
        v = t.compact(zorder_by=zorder, partition=partition)
        _rebind(spark, view)
        return v
    m = re.match(
        r"^\s*VACUUM\s+([A-Za-z_]\w*)"
        r"(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?"
        r"(?:\s+(DRY\s+RUN))?\s*$",
        stmt,
        re.IGNORECASE,
    )
    if m:
        view, hours, dry = m.groups()
        t = _table(spark, view)
        return t.vacuum(
            min_age_seconds=float(hours) * 3600.0 if hours else 3600.0,
            dry_run=dry is not None,
        )
    m = re.match(
        r"^\s*RESTORE\s+([A-Za-z_]\w*)\s+TO\s+"
        r"(VERSION|TIMESTAMP)\s+AS\s+OF\s+(\d+(?:\.\d+)?)\s*$",
        stmt,
        re.IGNORECASE,
    )
    if m:
        view, kind, lit = m.groups()
        t = _table(spark, view)
        target = (
            int(lit)
            if kind.upper() == "VERSION"
            else t.version_at(float(lit))
        )
        v = t.restore(target)
        _rebind(spark, view)
        return v
    m = re.match(
        r"^\s*APPLY\s+CHANGES\s+INTO\s+([A-Za-z_]\w*)\s+FROM\s+"
        r"([A-Za-z_][\w.]*)(?:\s+BATCH\s+(\d+))?(?:\s+APP\s+'([^']+)')?\s*$",
        stmt,
        re.IGNORECASE,
    )
    if m:
        view, src, batch, app = m.groups()
        t = _table(spark, view)
        kw = {}
        if batch is not None:
            kw["batch_id"] = int(batch)
        if app is not None:
            kw["app_id"] = app
        v = t.apply_changes(spark.table(src), **kw)
        _rebind(spark, view)
        return v
    m = re.match(
        r"^\s*DESCRIBE\s+FILES\s+([A-Za-z_]\w*)\s*$", stmt, re.IGNORECASE
    )
    if m:
        import json as _json
        import os

        t = _table(spark, m.group(1))
        mfst = t._manifest(t.latest_version())
        dvs = mfst.get("dvs", {})
        rows = []
        for b, rels in sorted(mfst["files"].items()):
            for rel in rels:
                full = t._entry_full(rel)
                rows.append(
                    (
                        b,
                        rel,
                        int(os.path.getsize(full))
                        if os.path.exists(full)
                        else -1,
                        1 if dvs.get(rel) else 0,
                        _json.dumps(
                            mfst.get("stats", {}).get(rel, {}),
                            sort_keys=True,
                        ),
                    )
                )
        return spark.createDataFrame(
            rows,
            "bucket string, file string, bytes bigint, has_dv bigint, "
            "stats string",
        )
    m = re.match(
        r"^\s*ALTER\s+TABLE\s+([A-Za-z_]\w*)\s+(.+)$",
        stmt,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        view, action = m.group(1), m.group(2).strip()
        v = _alter(spark, view, action)
        _rebind(spark, view)
        return v
    m = re.match(
        r"^\s*ANALYZE\s+(?:TABLE\s+)?([A-Za-z_]\w*)"
        r"(?:\s+COMPUTE\s+STATISTICS)?\s*$",
        stmt,
        re.IGNORECASE,
    )
    if m:
        view = m.group(1)
        t = _table(spark, view)
        v = t.analyze()
        _rebind(spark, view)
        return v
    m = re.match(
        r"^\s*GENERATE\s+symlink_format_manifest\s+FOR\s+TABLE\s+"
        r"([A-Za-z_]\w*)\s*$",
        stmt,
        re.IGNORECASE,
    )
    if m:
        t = _table(spark, m.group(1))
        return t.generate()  # list of written manifest paths, not a version
    m = re.match(
        r"^\s*DESCRIBE\s+HISTORY\s+([A-Za-z_]\w*)(?:\s+LIMIT\s+(\d+))?\s*$",
        stmt,
        re.IGNORECASE,
    )
    if m:
        import json as _json

        view, lim = m.group(1), m.group(2)
        t = _table(spark, view)
        rows = [
            (
                r["version"],
                float(r["timestamp"]),
                r["operation"],
                _json.dumps(r.get("params", {}), sort_keys=True),
            )
            for r in t.history(limit=int(lim) if lim else None)
        ]
        return spark.createDataFrame(
            rows,
            "version bigint, timestamp double, operation string, params string",
        )
    m = re.match(
        r"^\s*DESCRIBE\s+DETAIL\s+([A-Za-z_]\w*)\s*$", stmt, re.IGNORECASE
    )
    if m:
        import json as _json

        t = _table(spark, m.group(1))
        d = t.detail()
        row = {
            k: (v if isinstance(v, (int, float, str, bool)) else _json.dumps(v, sort_keys=True))
            for k, v in d.items()
        }
        def sql_type(v) -> str:
            if isinstance(v, bool):
                return "boolean"
            if isinstance(v, int):
                return "bigint"
            if isinstance(v, float):
                return "double"
            return "string"

        keys = sorted(row)
        schema = ", ".join(f"{k} {sql_type(row[k])}" for k in keys)
        return spark.createDataFrame([tuple(row[k] for k in keys)], schema)
    raise ValueError(
        "unsupported statement — execute_dml handles INSERT INTO/"
        "OVERWRITE / DELETE FROM / UPDATE ... SET / MERGE INTO / "
        "TRUNCATE TABLE / COPY INTO / CREATE TABLE ... USING snapshot "
        "AS SELECT / DROP TABLE / SHOW PARTITIONS / OPTIMIZE / VACUUM / "
        "RESTORE over registered snapshot views"
    )


def sql(spark, sql_text: str, mode: str = "cow"):
    """ONE-CALL SQL SESSION FACADE: route any statement to the right
    engine — snapshot DML/DDL/utility/introspection statements (and
    SELECTs using the rewritten spellings: ``table_changes(...)``,
    ``VERSION/TIMESTAMP AS OF``) go through :func:`execute_dml`; every
    other statement goes straight to ``spark.sql``. A session that
    talks only SQL needs exactly this function plus
    ``register_snapshot_view`` (or ``CREATE TABLE ... USING snapshot
    AS SELECT``, which self-registers)."""
    stmt = sql_text.strip().rstrip(";").strip()
    if re.match(r"^\s*SELECT\b", stmt, re.IGNORECASE) and not re.search(
        r"\btable_changes\s*\(|\b(VERSION|TIMESTAMP)\s+AS\s+OF\b",
        stmt,
        re.IGNORECASE,
    ):
        return spark.sql(stmt)
    try:
        return execute_dml(spark, stmt, mode=mode)
    except ValueError as e:
        if "unsupported statement" not in str(e):
            raise
        return spark.sql(stmt)  # not ours (CTE, SHOW TABLES, ...) — engine SQL
