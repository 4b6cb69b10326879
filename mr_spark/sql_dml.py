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
  ON t.<key> = s.<key>
  [WHEN MATCHED [AND <cond>] THEN UPDATE SET * | SET c = <expr>, ...]
  [WHEN MATCHED [AND <cond>] THEN DELETE]
  [WHEN NOT MATCHED [AND <cond>] THEN INSERT *]
  [WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN UPDATE SET ... | DELETE]``

Utility statements (Delta's SQL surface for the same operations):

* ``OPTIMIZE <view> [WHERE <pcol> = <literal>] [ZORDER BY (c1, c2)]``
  → ``compact(partition=..., zorder_by=...)`` (the WHERE must be one
  equality on the table's partition column — Delta's OPTIMIZE WHERE
  rule)
* ``VACUUM <view> [RETAIN <n> HOURS] [DRY RUN]`` → ``vacuum(...)``;
  returns the removed (or would-be-removed) path list, not a version
* ``RESTORE <view> TO VERSION AS OF <n>`` → ``restore(n)``

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

Introspection statements (return a DataFrame, not a version):

* ``DESCRIBE HISTORY <view> [LIMIT <n>]`` — one row per commit,
  newest first: version, timestamp, operation, params (JSON text)
* ``DESCRIBE DETAIL <view>`` — one row of table metrics (nested maps
  as JSON text)

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

__all__ = ["execute_dml"]


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
    oc = _ON_COND.match(on)
    if not oc:
        raise ValueError(
            "MERGE ON must be a single key equality t.<key> = s.<key> "
            f"(got {on!r}) — the snapshot MERGE is bucket-keyed"
        )
    a1, c1, a2, c2 = oc.groups()
    refs = {a1.lower(): c1, a2.lower(): c2}
    if set(refs) != {"t", "s"} or refs["t"] != refs["s"]:
        raise ValueError(
            "MERGE ON must equate the SAME column across t and s "
            f"(got {on!r})"
        )
    key = refs["t"]
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
    src_df = spark.table(source)
    return target, key, src_df, kw


def _put(kw: dict, name: str, val, cond, cond_name: str) -> None:
    if name in kw:
        raise ValueError(f"duplicate MERGE clause kind {name!r}")
    kw[name] = val
    if cond:
        kw[cond_name] = cond


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
    raise ValueError(
        f"unsupported ALTER action {action!r} — supported: ADD COLUMN "
        "[DEFAULT/INITIAL DEFAULT], RENAME COLUMN, DROP COLUMN, ALTER "
        "COLUMN TYPE (lossless widening), ADD/DROP CONSTRAINT"
    )


def execute_dml(spark, sql_text: str, mode: str = "cow") -> int:
    """Execute one statement (module docstring has the grammar)
    against its snapshot view's table; returns the committed version
    (VACUUM instead returns its removed-paths list). ``mode`` selects
    copy-on-write vs merge-on-read (deletion vectors) for
    DELETE/UPDATE — Delta's SQL has no mode syntax either (it is a
    table property there); other statements ignore it."""
    stmt = sql_text.strip().rstrip(";").strip()
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
            raise ValueError(
                f"MERGE ON column {key!r} is not the table's bucket key "
                f"{mkey!r} — the snapshot MERGE joins on the key"
            )
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
        r"^\s*RESTORE\s+([A-Za-z_]\w*)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*$",
        stmt,
        re.IGNORECASE,
    )
    if m:
        view, ver = m.groups()
        t = _table(spark, view)
        v = t.restore(int(ver))
        _rebind(spark, view)
        return v
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
        "unsupported statement — execute_dml handles DELETE FROM / "
        "UPDATE ... SET / MERGE INTO / OPTIMIZE / VACUUM / RESTORE "
        "over registered snapshot views"
    )
