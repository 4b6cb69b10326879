"""Data-skipping predicate grammar shared by the SnapshotTable read /
DML planners (acid.py), the ``snapshot`` DataSource's ``where`` option
(sources/snapshot_source.py), and the SQL-text DML dispatcher.

The reference engine (BugenZhao/6.824-MapReduce) has no predicate
planner at all — this module is part of the lakehouse extension tier,
implementing the published Delta/Iceberg data-skipping model (per-file
min/max + null-count + bloom stats classify files before any read)
from first principles.

## Grammar

A ``where`` value is a CONJUNCTION (list) of conjuncts; each conjunct
is either a single atom or an ``("or", [atom, ...])`` disjunction —
i.e. CNF one level deep, which is what file-level skipping can use
(arbitrary nesting would classify no better than its CNF'd form).

Atom forms (tuples; the first element is a reserved tag, so a column
literally named "in"/"or"/"<" etc. cannot head a legacy range tuple):

    (col, lo, hi)                         closed range — legacy BETWEEN
    ("in", col, [v, ...])                 IN-list
    ("=", col, v)  (also "==")            equality
    ("<>", col, v) (also "!=", "ne")      not-equal
    ("<", col, v) ("<=", ">" , ">=")      comparisons
    ("is_null", col)                      IS NULL
    ("not_null", col)                     IS NOT NULL

``parse_sql_where`` accepts the same grammar as SQL text:
``a = 5 AND (b BETWEEN 1 AND 3 OR b IN (7, 9)) AND c IS NOT NULL AND
d <> 'x'`` — parenthesised OR groups, BETWEEN/IN/IS [NOT] NULL, the
six comparators, single-quoted strings ('' escapes a quote), int and
float literals. ``NOT IN (...)`` is accepted at conjunction level and
expands to one ``<>`` conjunct per value.

## File classification

``conjunct_verdict`` maps (atoms, one file's footer stats) to
disjoint / covered / straddle:

* disjoint — PROOF no row matches (every disjunct disjoint);
* covered — PROOF every row matches some disjunct: one atom covers, or
  the disjuncts are closed intervals over ONE column whose merged
  union (integer-adjacent ranges coalesce for integral columns)
  contains the file's [min, max], with a recorded zero null count;
* straddle — everything unprovable. Callers re-apply the row-level
  predicate to straddlers, so classification is advisory for reads and
  only its PROOFS are load-bearing (metadata-only DELETE).

NULL semantics are SQL's throughout: a NULL comparison never matches,
so "covered" claims additionally require a recorded zero null count,
and IS NULL coverage requires nulls == the file's row count (the
reserved "__rows__" footer stat).
"""

from __future__ import annotations

import re

__all__ = [
    "normalize_where",
    "pred_columns",
    "pred_expr",
    "pred_json",
    "conjunct_verdict",
    "parse_sql_where",
    "spark_cast_form",
    "canon_time_const",
]

_CMP_ALIASES = {
    "=": "eq",
    "==": "eq",
    "eq": "eq",
    "<>": "ne",
    "!=": "ne",
    "ne": "ne",
    "not_eq": "ne",
    "<": "lt",
    "lt": "lt",
    "<=": "lte",
    "lte": "lte",
    ">": "gt",
    "gt": "gt",
    ">=": "gte",
    "gte": "gte",
}

_NULL_TAGS = {"is_null": True, "isnull": True, "not_null": False, "notnull": False, "is_not_null": False}


def _canon_const(v):
    """Canonicalize a predicate constant: datetime/date become the
    fixed-width ISO strings the manifest stores for time columns
    (acid._footer_stats) — lexicographic order == time order, so stats
    comparisons stay homogeneous (str vs str), and the engine-side row
    filter casts the string back to the column's type natively.

    ISO-shaped STRING constants are deliberately left untouched here —
    the constant might target a genuine string column, where padding
    would change row semantics. Type-aware widening happens inside
    ``conjunct_verdict`` via ``time_cols`` (see ``canon_time_const``)."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


# "yyyy-MM-dd[ T]HH:MM:SS.ffffff" — the manifest's canonical fixed-width
# timestamp form (and Spark's cast output minus trailing-zero trimming)
_TS_FULL = re.compile(r"^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}\.\d{1,6}$")
# anything that *starts* like an ISO date — the cheap gate before we pay
# for datetime.fromisoformat in canon_time_const
_ISOISH = re.compile(r"^\d{4}-\d{2}-\d{2}([ T].*)?$")


def spark_cast_form(s):
    """Mirror Spark's ``CAST(timestamp AS STRING)`` on a canonical
    ISO string: trailing fractional zeros are trimmed and an emptied
    fraction drops its dot, so "2024-01-25 12:00:00.000000" becomes
    "2024-01-25 12:00:00" and "...00.500000" becomes "...00.5".
    Identity on everything else — idempotent on Spark cast output,
    which is exactly what identity-partition bucket ids carry. EXACT
    partition-value comparisons run both sides through this so the
    manifest's microsecond-width canonical constants and Spark-cast
    pvals meet in one form."""
    if isinstance(s, str) and _TS_FULL.match(s):
        head, frac = s.rsplit(".", 1)
        frac = frac.rstrip("0")
        return head + ("." + frac) if frac else head
    return s


def canon_time_const(v, kind: str):
    """Widen/narrow an ISO-shaped STRING constant to the manifest's
    canonical stats form for a column KNOWN to be time-typed:
    kind "ts" pads to the fixed microsecond width ("2024-01-25" →
    "2024-01-25 00:00:00.000000", second precision gains ".000000") —
    semantically exact, because Spark's string→timestamp cast yields
    precisely that instant; kind "date" truncates a datetime-shaped
    string to its date part, mirroring Spark's string→date cast.
    Non-string / non-ISO-shaped values pass through unchanged (the
    stats comparison then stays as conservative as before)."""
    if not isinstance(v, str) or not _ISOISH.match(v):
        return v
    import datetime as _dt

    try:
        dt = _dt.datetime.fromisoformat(v)
    except ValueError:
        return v
    if dt.tzinfo is not None:
        # manifest stats are naive UTC instants (acid._footer_stats)
        dt = dt.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    if kind == "date":
        return dt.date().isoformat()
    return dt.isoformat(sep=" ", timespec="microseconds")


def _canon_atoms_for_time(atoms, time_of, phys_of):
    """Rewrite one conjunct's atoms so every constant targeting a
    time-typed column is in the manifest's canonical stats form.
    ``time_of`` maps a PHYSICAL column name to "ts"/"date" (absent =
    not a time column). Only the stats-side verdict sees the rewrite —
    row-level filters keep the user's original constants."""
    out = []
    changed = False
    for a in atoms:
        kind = time_of.get(phys_of(a[1]) if phys_of else a[1])
        if kind is None:
            out.append(a)
            continue
        tag = a[0]
        if tag == "between":
            na = ("between", a[1], canon_time_const(a[2], kind), canon_time_const(a[3], kind))
        elif tag == "cmp":
            na = ("cmp", a[1], a[2], canon_time_const(a[3], kind))
        elif tag == "in":
            na = ("in", a[1], tuple(canon_time_const(v, kind) for v in a[2]))
        else:
            na = a
        changed = changed or na != a
        out.append(na)
    return out if changed else atoms


def _norm_atom(a) -> tuple:
    """One atom -> normalized ("between", col, lo, hi) |
    ("cmp", col, op, v) | ("in", col, (v, ...)) | ("null", col, bool)."""
    if not isinstance(a, (tuple, list)) or not a:
        raise ValueError(f"predicate atom must be a non-empty tuple, got {a!r}")
    tag = a[0]
    # already-normalized atoms pass through (normalize_where is
    # idempotent, so parse_sql_where output can feed any where= API)
    if tag == "between" and len(a) == 4:
        return ("between", a[1], _canon_const(a[2]), _canon_const(a[3]))
    if tag == "cmp" and len(a) == 4 and a[2] in (
        "eq", "ne", "lt", "lte", "gt", "gte"
    ):
        return ("cmp", a[1], a[2], _canon_const(a[3]))
    if tag == "null" and len(a) == 3 and isinstance(a[2], bool):
        return tuple(a)
    if isinstance(tag, str):
        low = tag.lower()
        if low in _CMP_ALIASES and len(a) == 3:
            return ("cmp", a[1], _CMP_ALIASES[low], _canon_const(a[2]))
        if low == "in":
            if len(a) != 3:
                raise ValueError(f"IN atom must be ('in', col, values), got {a!r}")
            vals = tuple(_canon_const(v) for v in a[2])
            if not vals:
                raise ValueError("IN atom with an empty value list matches nothing — refuse rather than guess")
            return ("in", a[1], vals)
        if low in _NULL_TAGS:
            if len(a) != 2:
                raise ValueError(f"null-test atom must be ('{low}', col), got {a!r}")
            return ("null", a[1], _NULL_TAGS[low])
        if low == "or":
            raise ValueError("('or', ...) cannot nest inside another disjunction")
    if len(a) == 3:  # legacy closed range (col, lo, hi)
        return ("between", a[0], _canon_const(a[1]), _canon_const(a[2]))
    raise ValueError(f"cannot parse predicate atom {a!r}")


def normalize_where(where) -> list[list[tuple]]:
    """``where`` -> list of conjuncts, each a list of OR'd normalized
    atoms. Accepts None, a single atom tuple, or a list of conjuncts
    (atoms and/or ("or", [atoms]) groups) — the superset of the
    original (col, lo, hi) range grammar."""
    if where is None:
        return []
    if isinstance(where, tuple):
        where = [where]
    out = []
    for conj in where:
        if isinstance(conj, (tuple, list)) and conj and conj[0] == "or":
            if len(conj) != 2 or not isinstance(conj[1], (list, tuple)):
                raise ValueError(f"disjunction must be ('or', [atom, ...]), got {conj!r}")
            atoms = [_norm_atom(x) for x in conj[1]]
            if not atoms:
                raise ValueError("('or', []) is empty")
            out.append(atoms)
        elif (
            isinstance(conj, list)
            and conj
            and all(isinstance(x, tuple) for x in conj)
        ):
            # a normalized conjunct (list of OR'd atoms) passes through
            out.append([_norm_atom(x) for x in conj])
        else:
            out.append([_norm_atom(conj)])
    return out


def atom_column(atom) -> str:
    return atom[1]


def pred_columns(conjuncts: list[list[tuple]]) -> set[str]:
    return {atom_column(a) for atoms in conjuncts for a in atoms}


# ---- row-level Spark expression ---------------------------------------


def _atom_expr(atom, col_of):
    from pyspark.sql import functions as F

    kind = atom[0]
    c = F.col(col_of(atom[1]) if col_of else atom[1])
    if kind == "between":
        return c.between(F.lit(atom[2]), F.lit(atom[3]))
    if kind == "in":
        return c.isin(list(atom[2]))
    if kind == "null":
        return c.isNull() if atom[2] else c.isNotNull()
    op = atom[2]
    v = F.lit(atom[3])
    return {
        "eq": c == v,
        "ne": c != v,
        "lt": c < v,
        "lte": c <= v,
        "gt": c > v,
        "gte": c >= v,
    }[op]


def pred_expr(conjuncts: list[list[tuple]], col_of=None):
    """The row-level Column for normalized conjuncts: AND of ORs.
    SQL WHERE semantics are the caller's job at the top (wrap in
    ``coalesce(expr, false)`` where a NULL result must not match) —
    matching the previous single-range behavior."""
    from pyspark.sql import functions as F

    e = F.lit(True)
    for atoms in conjuncts:
        d = _atom_expr(atoms[0], col_of)
        for a in atoms[1:]:
            d = d | _atom_expr(a, col_of)
        e = e & d
    return e


def pred_json(conjuncts: list[list[tuple]]):
    """JSON-safe operation-record payload (documentation, not replayed):
    non-scalar bounds record as their string form."""
    if not conjuncts:
        return None

    def safe(v):
        return v if isinstance(v, (bool, int, float, str, type(None))) else str(v)

    def atom(a):
        if a[0] == "in":
            return ["in", a[1], [safe(v) for v in a[2]]]
        if a[0] == "null":
            return ["is_null" if a[2] else "not_null", a[1]]
        return [a[0], a[1]] + [safe(x) for x in a[2:]]

    return [[atom(a) for a in atoms] for atoms in conjuncts]


# ---- file-level classification ----------------------------------------


def _atom_verdict(
    atom,
    fstats: dict,
    *,
    phys_of,
    pval,
    pcol,
    bloom_phys,
    use_blooms,
    bloom_might_contain,
) -> str:
    kind = atom[0]
    col = atom[1]
    phys = phys_of(col) if phys_of else col
    nulls = fstats.get("__nulls__", {}).get(phys)
    if kind == "null":
        want_null = atom[2]
        if pcol is not None and col == pcol:
            # partition values are never NULL (write-time guard)
            return "disjoint" if want_null else "covered"
        rows = fstats.get("__rows__")
        if want_null:
            if nulls == 0:
                return "disjoint"
            if rows is not None and nulls == rows:
                return "covered"
        else:
            if rows is not None and nulls is not None and nulls == rows:
                return "disjoint"
            if nulls == 0:
                return "covered"
        return "straddle"
    # EXACT partition-value decisions (canonical string compare — the
    # partition guard restricts values to types whose Python str()
    # matches Spark's cast): equality-shaped atoms classify both ways.
    # Both sides pass through spark_cast_form so the manifest's
    # microsecond-width canonical timestamp constants meet Spark-cast
    # pvals ("...12:00:00.000000" vs "...12:00:00") in one form.
    if pcol is not None and col == pcol and pval is not None:
        pv = spark_cast_form(pval)
        if kind == "in":
            return (
                "covered"
                if pv in {spark_cast_form(str(v)) for v in atom[2]}
                else "disjoint"
            )
        if kind == "between" and atom[2] == atom[3]:
            return "covered" if pv == spark_cast_form(str(atom[2])) else "disjoint"
        if kind == "cmp" and atom[2] in ("eq", "ne"):
            same = pv == spark_cast_form(str(atom[3]))
            if atom[2] == "eq":
                return "covered" if same else "disjoint"
            return "disjoint" if same else "covered"
        # range comparisons on the partition column: fall through to
        # the per-file stats (the composite id carries only strings)
    s = fstats.get(phys)

    def absent(v) -> bool:
        if not use_blooms or phys not in bloom_phys:
            return False
        bloom = fstats.get("__bloom__", {}).get(phys)
        return bloom is not None and not bloom_might_contain(bloom, v)

    try:
        if kind == "between":
            lo, hi = atom[2], atom[3]
            if s is not None:
                if s[1] < lo or s[0] > hi:
                    return "disjoint"
                if lo <= s[0] and s[1] <= hi and nulls == 0:
                    return "covered"
            if lo == hi and absent(lo):
                return "disjoint"
            return "straddle"
        if kind == "in":
            vals = atom[2]
            if all(
                absent(v) or (s is not None and (v < s[0] or v > s[1]))
                for v in vals
            ):
                return "disjoint"
            if s is not None and nulls == 0 and s[0] == s[1] and s[0] in vals:
                return "covered"
            return "straddle"
        # cmp
        op, v = atom[2], atom[3]
        if op == "eq":
            if absent(v) or (s is not None and (v < s[0] or v > s[1])):
                return "disjoint"
            if s is not None and s[0] == s[1] == v and nulls == 0:
                return "covered"
        elif op == "ne":
            # NULL rows fail both <> v and = v, so min==max==v proves
            # disjoint regardless of nulls; coverage still needs nulls==0
            if s is not None and s[0] == s[1] == v:
                return "disjoint"
            if nulls == 0 and (
                absent(v) or (s is not None and (v < s[0] or v > s[1]))
            ):
                return "covered"
        elif s is not None:
            mn, mx = s[0], s[1]
            if op == "lt":
                if mn >= v:
                    return "disjoint"
                if mx < v and nulls == 0:
                    return "covered"
            elif op == "lte":
                if mn > v:
                    return "disjoint"
                if mx <= v and nulls == 0:
                    return "covered"
            elif op == "gt":
                if mx <= v:
                    return "disjoint"
                if mn > v and nulls == 0:
                    return "covered"
            elif op == "gte":
                if mx < v:
                    return "disjoint"
                if mn >= v and nulls == 0:
                    return "covered"
        return "straddle"
    except TypeError:
        # bound/stat types don't compare (numeric bound on a string
        # column, ...) — nothing provable either way
        return "straddle"


def _closed_intervals(atoms) -> tuple[str, list] | None:
    """If every atom is a closed interval over ONE column (between, eq,
    in), return (col, [(lo, hi), ...]); else None. Half-open cmp atoms
    are excluded — union coverage over mixed open/closed endpoints
    needs endpoint-topology bookkeeping that the canonical shapes
    (IN-lists, OR of BETWEENs) never exercise."""
    col = None
    ivs: list = []
    for a in atoms:
        c = a[1]
        if col is None:
            col = c
        elif c != col:
            return None
        if a[0] == "between":
            ivs.append((a[2], a[3]))
        elif a[0] == "cmp" and a[2] == "eq":
            ivs.append((a[3], a[3]))
        elif a[0] == "in":
            ivs.extend((v, v) for v in a[2])
        else:
            return None
    return (col, ivs) if col is not None and ivs else None


def conjunct_verdict(
    atoms: list[tuple],
    fstats: dict,
    *,
    phys_of=None,
    pval=None,
    pcol=None,
    bloom_phys=frozenset(),
    use_blooms=True,
    bloom_might_contain=None,
    int_cols=frozenset(),
    time_cols=None,
) -> str:
    """disjoint / covered / straddle for one OR-of-atoms conjunct
    against one file's footer stats (see module docstring). ``int_cols``
    names integral-typed PHYSICAL columns, enabling integer-adjacent
    interval coalescing (IN (1,2,3) covers a file with [min,max] =
    [1,3]). ``time_cols`` maps timestamp/date-typed PHYSICAL columns to
    "ts"/"date": string constants over those columns are widened to the
    manifest's fixed-width canonical stats form before comparison, so a
    second-precision bound like "2024-01-25 12:00:00" matches a stats
    value "2024-01-25 12:00:00.000000" at the same instant (exactly the
    executor-side cast semantics) instead of falsely proving disjoint."""
    if bloom_might_contain is None:
        from .acid import _bloom_might_contain as bloom_might_contain
    if time_cols:
        atoms = _canon_atoms_for_time(atoms, time_cols, phys_of)
    vs = [
        _atom_verdict(
            a,
            fstats,
            phys_of=phys_of,
            pval=pval,
            pcol=pcol,
            bloom_phys=bloom_phys,
            use_blooms=use_blooms,
            bloom_might_contain=bloom_might_contain,
        )
        for a in atoms
    ]
    if all(v == "disjoint" for v in vs):
        return "disjoint"
    if any(v == "covered" for v in vs):
        return "covered"
    # union coverage: closed intervals over one column whose merged
    # union contains [min, max], with a recorded zero null count
    ci = _closed_intervals(atoms)
    if ci is not None:
        col, ivs = ci
        phys = phys_of(col) if phys_of else col
        s = fstats.get(phys)
        nulls = fstats.get("__nulls__", {}).get(phys)
        if s is not None and nulls == 0:
            try:
                merged: list[list] = []
                adjacency = 1 if phys in int_cols else 0
                for lo, hi in sorted(ivs):
                    if hi < lo:
                        continue
                    if merged and lo <= merged[-1][1] + adjacency:
                        merged[-1][1] = max(merged[-1][1], hi)
                    else:
                        merged.append([lo, hi])
                if any(lo <= s[0] and s[1] <= hi for lo, hi in merged):
                    return "covered"
            except TypeError:
                pass
    return "straddle"


def pcol_point_values(atoms: list[tuple], pcol: str) -> set[str] | None:
    """If EVERY atom of a conjunct is a point-equality shape on the
    partition column (eq / between lo==hi / in), the conjunct restricts
    the partition value to a finite set — returned in canonical string
    form for the O(buckets) bucket-map prune. None = not restrictive.
    Values pass through ``spark_cast_form`` — bucket pvals are Spark
    CAST(col AS STRING) output, which trims trailing fractional zeros
    the canonical datetime constants carry."""
    vals: set[str] = set()
    for a in atoms:
        if a[1] != pcol:
            return None
        if a[0] == "cmp" and a[2] == "eq":
            vals.add(spark_cast_form(str(a[3])))
        elif a[0] == "between" and a[2] == a[3]:
            vals.add(spark_cast_form(str(a[2])))
        elif a[0] == "in":
            vals.update(spark_cast_form(str(v)) for v in a[2])
        else:
            return None
    return vals or None


# ---- SQL-text WHERE parser --------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(?:
      (?P<str>'(?:[^']|'')*')
    | (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
    | (?P<op><>|!=|>=|<=|==|=|<|>)
    | (?P<lp>\()
    | (?P<rp>\))
    | (?P<comma>,)
    | (?P<word>[A-Za-z_][\w.]*)
    )""",
    re.X,
)

_KEYWORDS = {"and", "or", "between", "in", "is", "not", "null"}


def _tokenize(text: str) -> list[tuple[str, object]]:
    toks: list[tuple[str, object]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            rest = text[pos:].strip()
            if not rest:
                break
            raise ValueError(f"cannot tokenize WHERE clause at {rest[:30]!r}")
        pos = m.end()
        if m.group("str") is not None:
            toks.append(("lit", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("num") is not None:
            t = m.group("num")
            toks.append(("lit", float(t) if ("." in t or "e" in t.lower()) else int(t)))
        elif m.group("op") is not None:
            toks.append(("op", m.group("op")))
        elif m.group("lp"):
            toks.append(("lp", "("))
        elif m.group("rp"):
            toks.append(("rp", ")"))
        elif m.group("comma"):
            toks.append(("comma", ","))
        else:
            w = m.group("word")
            toks.append(
                ("kw", w.lower()) if w.lower() in _KEYWORDS else ("ident", w)
            )
    return toks


class _P:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, kind=None, val=None):
        if self.i >= len(self.toks):
            return None
        k, v = self.toks[self.i]
        if kind is not None and k != kind:
            return None
        if val is not None and v != val:
            return None
        return self.toks[self.i]

    def take(self, kind, val=None, what=""):
        t = self.peek(kind, val)
        if t is None:
            got = self.toks[self.i] if self.i < len(self.toks) else ("end", "")
            raise ValueError(
                f"WHERE parse error: expected {what or val or kind}, got {got[1]!r}"
            )
        self.i += 1
        return t

    def done(self):
        return self.i >= len(self.toks)


def _parse_atom(p: _P) -> list[tuple]:
    """One atom -> list of normalized atoms (NOT IN expands to several
    ne atoms, which the caller treats as separate conjuncts)."""
    col = p.take("ident", what="a column name")[1]
    if p.peek("op"):
        op = p.take("op")[1]
        lit = p.take("lit", what="a literal")[1]
        return [_norm_atom((op, col, lit))]
    if p.peek("kw", "between"):
        p.take("kw", "between")
        lo = p.take("lit", what="a literal")[1]
        p.take("kw", "and", what="AND")
        hi = p.take("lit", what="a literal")[1]
        return [("between", col, lo, hi)]
    if p.peek("kw", "is"):
        p.take("kw", "is")
        if p.peek("kw", "not"):
            p.take("kw", "not")
            p.take("kw", "null", what="NULL")
            return [("null", col, False)]
        p.take("kw", "null", what="NULL")
        return [("null", col, True)]
    neg = False
    if p.peek("kw", "not"):
        p.take("kw", "not")
        neg = True
    if p.peek("kw", "in"):
        p.take("kw", "in")
        p.take("lp", what="'('")
        vals = [p.take("lit", what="a literal")[1]]
        while p.peek("comma"):
            p.take("comma")
            vals.append(p.take("lit", what="a literal")[1])
        p.take("rp", what="')'")
        if neg:
            return [("cmp", col, "ne", v) for v in vals]
        return [_norm_atom(("in", col, vals))]
    raise ValueError(
        f"WHERE parse error after column {col!r}: expected a comparison, "
        "BETWEEN, IN, or IS [NOT] NULL"
    )


def parse_sql_where(text: str) -> list[list[tuple]]:
    """SQL WHERE text -> normalized conjuncts (see module docstring).
    Supported: the six comparators, BETWEEN a AND b, IN (...), NOT IN
    (...) (conjunction level only — it expands to AND'd <> atoms),
    IS [NOT] NULL, parenthesised OR groups of atoms, all joined by AND.
    Anything else fails loudly: this is a data-skipping grammar, not a
    SQL dialect."""
    p = _P(_tokenize(text))
    if p.done():
        raise ValueError("empty WHERE clause")
    conjuncts: list[list[tuple]] = []
    while True:
        if p.peek("lp"):
            p.take("lp")
            atoms = _parse_atom(p)
            if len(atoms) != 1 and p.peek("kw", "or"):
                raise ValueError("NOT IN cannot appear inside an OR group")
            while p.peek("kw", "or"):
                p.take("kw", "or")
                more = _parse_atom(p)
                if len(more) != 1:
                    raise ValueError("NOT IN cannot appear inside an OR group")
                atoms.extend(more)
            p.take("rp", what="')'")
            conjuncts.append(atoms)
        else:
            atoms = _parse_atom(p)
            if p.peek("kw", "or"):
                # unparenthesised OR is legal only when the WHOLE clause
                # is one disjunction — mixing bare OR with AND would
                # silently mis-associate vs SQL's AND-binds-tighter rule
                if conjuncts or len(atoms) != 1:
                    raise ValueError(
                        "parenthesise OR groups mixed with AND: "
                        "... AND (a OR b) AND ..."
                    )
                while p.peek("kw", "or"):
                    p.take("kw", "or")
                    more = _parse_atom(p)
                    if len(more) != 1:
                        raise ValueError("NOT IN cannot appear inside an OR group")
                    atoms.extend(more)
                if not p.done():
                    raise ValueError(
                        "parenthesise OR groups mixed with AND: "
                        "... AND (a OR b) AND ..."
                    )
                conjuncts.append(atoms)
            else:
                # NOT IN at conjunction level: one conjunct per value
                conjuncts.extend([a] for a in atoms)
        if p.done():
            return conjuncts
        p.take("kw", "and", what="AND")
