"""Unit pins for the shared predicate grammar (mr_spark/predicates.py):
normalization (incl. idempotence), the SQL-text parser, and the
file-classification verdict matrix — pure-Python, no Spark session.
The soundness stakes: a wrong "disjoint" silently loses rows from
reads; a wrong "covered" makes predicate DELETE drop a whole file
metadata-only. Every cell here is hand-computed."""

from __future__ import annotations

import pytest

from mr_spark.predicates import (
    conjunct_verdict,
    normalize_where,
    parse_sql_where,
    pcol_point_values,
    pred_json,
)


def V(where, fs, **kw):
    cj = normalize_where(where)
    assert len(cj) == 1
    kw.setdefault("bloom_might_contain", lambda b, v: True)
    return conjunct_verdict(cj[0], fs, **kw)


FS = {"x": [10, 20], "__nulls__": {"x": 0}, "__rows__": 100}
FS_NULLS = {"x": [10, 20], "__nulls__": {"x": 7}, "__rows__": 100}
FS_ALLNULL = {"__nulls__": {"x": 100}, "__rows__": 100}
FS_NOSTATS: dict = {}


@pytest.mark.parametrize(
    "where,fs,expect",
    [
        # ranges
        (("x", 12, 15), FS, "straddle"),
        (("x", 5, 25), FS, "covered"),
        (("x", 30, 40), FS, "disjoint"),
        (("x", 5, 25), FS_NULLS, "straddle"),  # NULL rows never match
        (("x", 5, 25), FS_NOSTATS, "straddle"),  # conservative
        # IN-lists
        ([("in", "x", [5, 25])], FS, "disjoint"),  # both outside [10,20]
        ([("in", "x", [15, 25])], FS, "straddle"),
        ([("in", "x", [15])], {"x": [15, 15], "__nulls__": {"x": 0}}, "covered"),
        # comparisons
        ([("<", "x", 10)], FS, "disjoint"),
        ([("<", "x", 21)], FS, "covered"),
        ([("<", "x", 21)], FS_NULLS, "straddle"),
        ([(">=", "x", 10)], FS, "covered"),
        ([(">", "x", 20)], FS, "disjoint"),
        # not-equal: NULL rows fail both = and <>, so min==max==v is
        # disjoint even WITH nulls; coverage still needs nulls == 0
        ([("<>", "x", 25)], FS, "covered"),
        ([("<>", "x", 15)], FS, "straddle"),
        ([("<>", "x", 12)], {"x": [12, 12], "__nulls__": {"x": 9}}, "disjoint"),
        ([("<>", "x", 25)], FS_NULLS, "straddle"),
        # null tests (need __rows__ for the covered/disjoint proofs)
        ([("is_null", "x")], FS, "disjoint"),
        ([("is_null", "x")], FS_ALLNULL, "covered"),
        ([("is_null", "x")], FS_NULLS, "straddle"),
        ([("not_null", "x")], FS, "covered"),
        ([("not_null", "x")], FS_ALLNULL, "disjoint"),
        ([("not_null", "x")], FS_NOSTATS, "straddle"),
        # incomparable bound types: nothing provable
        (("x", "a", "z"), FS, "straddle"),
    ],
)
def test_verdict_matrix(where, fs, expect):
    assert V(where, fs) == expect


def test_or_union_coverage_and_int_adjacency():
    # two closed ranges covering [10,20] only via integer adjacency
    w = [("or", [("x", 5, 14), ("x", 15, 25)])]
    assert V(w, FS) == "straddle"  # reals: 14.5 matches neither
    assert V(w, FS, int_cols={"x"}) == "covered"
    # IN enumerating every integer in [min,max]
    w2 = [("in", "x", list(range(10, 21)))]
    assert V(w2, FS, int_cols={"x"}) == "covered"
    assert V(w2, FS_NULLS, int_cols={"x"}) == "straddle"
    # disjunction is disjoint only when EVERY atom is
    assert V([("or", [("x", 30, 40), ("x", 50, 60)])], FS) == "disjoint"
    assert V([("or", [("x", 30, 40), ("x", 12, 13)])], FS) == "straddle"


def test_partition_exact_verdicts():
    kw = dict(pval="d1", pcol="day")
    assert V([("=", "day", "d1")], {}, **kw) == "covered"
    assert V([("=", "day", "d2")], {}, **kw) == "disjoint"
    assert V([("<>", "day", "d1")], {}, **kw) == "disjoint"
    assert V([("<>", "day", "d2")], {}, **kw) == "covered"
    assert V([("in", "day", ["d1", "d9"])], {}, **kw) == "covered"
    assert V([("in", "day", ["d8", "d9"])], {}, **kw) == "disjoint"
    # partition values are never NULL (write guard)
    assert V([("is_null", "day")], {}, **kw) == "disjoint"
    assert V([("not_null", "day")], {}, **kw) == "covered"


def test_pcol_point_values():
    cj = normalize_where(
        [("in", "day", ["d1", "d2"]), ("=", "day", "d1"), ("x", 1, 5)]
    )
    assert pcol_point_values(cj[0], "day") == {"d1", "d2"}
    assert pcol_point_values(cj[1], "day") == {"d1"}
    assert pcol_point_values(cj[2], "day") is None  # other column
    assert pcol_point_values(normalize_where([(">", "day", "d0")])[0], "day") is None


def test_normalize_idempotent_and_json():
    w = [("x", 1, 5), ("in", "g", ["a"]), ("or", [("x", 1, 2), ("<>", "y", 3)]),
         ("is_null", "z")]
    cj = normalize_where(w)
    assert normalize_where(cj) == cj
    assert pred_json(cj) == [
        [["between", "x", 1, 5]],
        [["in", "g", ["a"]]],
        [["between", "x", 1, 2], ["cmp", "y", "ne", 3]],
        [["is_null", "z"]],
    ]
    with pytest.raises(ValueError, match="empty value list"):
        normalize_where([("in", "x", [])])
    with pytest.raises(ValueError, match="cannot nest"):
        normalize_where([("or", [("or", [("x", 1, 2)])])])


def test_sql_parser_round_trips_grammar():
    cj = parse_sql_where(
        "x BETWEEN 1 AND 5 AND g IN ('a', 'b') AND "
        "(x <= 2 OR x = 9) AND y <> 3 AND z IS NOT NULL AND "
        "name = 'O''Brien' AND k NOT IN (1, 2)"
    )
    assert cj == [
        [("between", "x", 1, 5)],
        [("in", "g", ("a", "b"))],
        [("cmp", "x", "lte", 2), ("cmp", "x", "eq", 9)],
        [("cmp", "y", "ne", 3)],
        [("null", "z", False)],
        [("cmp", "name", "eq", "O'Brien")],
        [("cmp", "k", "ne", 1)],
        [("cmp", "k", "ne", 2)],
    ]
    # whole-clause bare OR is fine; mixing bare OR with AND refuses
    assert parse_sql_where("a = 1 OR a = 2") == [
        [("cmp", "a", "eq", 1), ("cmp", "a", "eq", 2)]
    ]
    with pytest.raises(ValueError, match="parenthesise"):
        parse_sql_where("a = 1 OR b = 2 AND c = 3")
    with pytest.raises(ValueError, match="parenthesise"):
        parse_sql_where("c = 3 AND a = 1 OR b = 2")
    with pytest.raises(ValueError, match="expected a comparison"):
        parse_sql_where("a LIKE 'x%'")
    with pytest.raises(ValueError, match="empty WHERE"):
        parse_sql_where("   ")


# ---- time-typed canonicalization (ADVICE r8: boundary-instant bugs) ----

MID = "2024-01-25 12:00:00"
MIDW = "2024-01-25 12:00:00.000000"
TS_FS = {"ts": [MIDW, "2024-01-25 18:30:00.250000"], "__nulls__": {"ts": 0}}
TS_KIND = {"ts": "ts"}


def test_spark_cast_form_trims_like_spark():
    from mr_spark.predicates import spark_cast_form

    assert spark_cast_form(MIDW) == MID
    assert spark_cast_form("2024-01-25 12:00:00.500000") == "2024-01-25 12:00:00.5"
    assert spark_cast_form(MID) == MID  # idempotent on cast output
    assert spark_cast_form("2024-01-25") == "2024-01-25"
    assert spark_cast_form("plain") == "plain"
    assert spark_cast_form(42) == 42


def test_canon_time_const_widens_exactly():
    from mr_spark.predicates import canon_time_const

    assert canon_time_const(MID, "ts") == MIDW
    assert canon_time_const("2024-01-25", "ts") == "2024-01-25 00:00:00.000000"
    assert canon_time_const("2024-01-25 12:00:00.5", "ts") == "2024-01-25 12:00:00.500000"
    assert canon_time_const("2024-01-25 12:30:30", "date") == "2024-01-25"
    assert canon_time_const("2024-01-25", "date") == "2024-01-25"
    assert canon_time_const("not a time", "ts") == "not a time"
    assert canon_time_const(7, "ts") == 7


def test_second_precision_constant_not_falsely_disjoint():
    # file min IS the queried boundary instant at microsecond width —
    # bare-second constants must not prove disjointness (row loss)
    assert V([("=", "ts", MID)], TS_FS, time_cols=TS_KIND) != "disjoint"
    assert V([(">=", "ts", MID)], TS_FS, time_cols=TS_KIND) == "covered"
    assert V([("<", "ts", MID)], TS_FS, time_cols=TS_KIND) == "disjoint"
    assert V([("ts", MID, MID)], {"ts": [MIDW, MIDW], "__nulls__": {"ts": 0}},
             time_cols=TS_KIND) == "covered"
    # bare DATE constant against timestamp stats: midnight instant
    assert V([("=", "ts", "2024-01-25")],
             {"ts": ["2024-01-25 00:00:00.000000", "2024-01-25 00:00:00.000000"],
              "__nulls__": {"ts": 0}},
             time_cols=TS_KIND) == "covered"
    # datetime-shaped constant against a DATE column truncates like cast
    assert V([("=", "d", "2024-01-25 12:00:00")],
             {"d": ["2024-01-25", "2024-01-25"], "__nulls__": {"d": 0}},
             time_cols={"d": "date"}) == "covered"
    # WITHOUT the type gate nothing is widened (string-column safety)
    assert V([("=", "s", MID)],
             {"s": [MIDW, MIDW], "__nulls__": {"s": 0}}) == "disjoint"


def test_identity_ts_pval_meets_canonical_constant():
    # identity-partition pvals are Spark CAST output (trimmed); the
    # canonical datetime constant carries ".000000" — both sides meet
    # in spark_cast_form (ADVICE r8 #2)
    kw = dict(pval=MID, pcol="ts")
    assert V([("=", "ts", MIDW)], {}, **kw) == "covered"
    assert V([("<>", "ts", MIDW)], {}, **kw) == "disjoint"
    assert V([("in", "ts", [MIDW, "2024-01-26 00:00:00.000000"])], {}, **kw) == "covered"
    assert V([("ts", MIDW, MIDW)], {}, **kw) == "covered"
    assert V([("=", "ts", "2024-01-25 13:00:00.000000")], {}, **kw) == "disjoint"
    cj = normalize_where([("=", "ts", MIDW)])
    assert pcol_point_values(cj[0], "ts") == {MID}
