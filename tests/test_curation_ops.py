"""Brute-force twins for the round-3 curation operators (the oracle shares
each operator's algebra; these recompute the SEMANTICS independently in
pure Python on constructed corpora):

* ngram_novelty — per-doc share of 40-char windows unique to that doc
* dup_span_stats — gaps-and-islands longest verbatim duplicated span
* dsir_importance_weights — hashed-bigram log importance (Xie et al.)
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from mr_spark.operators.dedup import _SUBSTR_L

DOCS = {
    1: "A" * 10 + "the shared boilerplate chunk of text lives right here!" + "B" * 10,
    2: "C" * 12 + "the shared boilerplate chunk of text lives right here!" + "D" * 8,
    3: "an entirely unique document with no duplicated windows anywhere at all zz",
    4: "A" * 10 + "the shared boilerplate chunk of text lives right here!" + "B" * 10,
    5: "short",  # < 40 chars — excluded by every operator
}


def _write_docs(spark, tmp_path, docs, sources=None):
    rows = [
        (i, t, "en", (sources or {}).get(i, "src1"), len(t))
        for i, t in docs.items()
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path / "corpus")
    df.write.parquet(path + "/documents.parquet")
    return path


def _windows(text):
    return [text[i : i + _SUBSTR_L] for i in range(len(text) - _SUBSTR_L + 1)]


def test_ngram_novelty_matches_bruteforce(spark, tmp_path):
    from mr_spark.operators.dedup import ngram_novelty

    path = _write_docs(spark, tmp_path, DOCS)
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["novelty"])
        for r in ngram_novelty(spark, path).collect()
    }

    wins = {d: set(_windows(t)) for d, t in DOCS.items() if len(t) >= _SUBSTR_L}
    df = Counter(w for ws in wins.values() for w in ws)
    for d, ws in wins.items():
        n, dup = len(ws), sum(1 for w in ws if df[w] >= 2)
        assert got[d] == (n, dup, round(1.0 - dup / n, 6)), d
    assert 5 not in got  # sub-window doc excluded
    # docs 1 and 4 are exact copies: every window duplicated, novelty 0
    assert got[1][2] == 0.0
    # doc 3 shares nothing: novelty 1
    assert got[3][2] == 1.0


def test_dup_span_stats_matches_bruteforce(spark, tmp_path):
    from mr_spark.operators.dedup import dup_span_stats

    path = _write_docs(spark, tmp_path, DOCS)
    got = {
        r["doc_id"]: (r["n_dup_positions"], r["longest_dup_span_chars"])
        for r in dup_span_stats(spark, path).collect()
    }

    wins = {d: _windows(t) for d, t in DOCS.items() if len(t) >= _SUBSTR_L}
    # doc frequency of each distinct window
    df = Counter(w for ws in wins.values() for w in set(ws))
    for d, ws in wins.items():
        dup_pos = [i for i, w in enumerate(ws) if df[w] >= 2]
        runs, cur = [], 0
        for j, i in enumerate(dup_pos):
            cur = cur + 1 if j and dup_pos[j - 1] == i - 1 else 1
            runs.append(cur)
        longest = (max(runs) + _SUBSTR_L - 1) if runs else 0
        assert got[d] == (len(dup_pos), longest), d
    # docs 1/4 are identical: every position duplicated, span = full doc
    assert got[1] == (len(wins[1]), len(DOCS[1]))
    assert got[3] == (0, 0)
    assert 5 not in got


def _md5_tail_bucket(s: str, mod: int) -> int:
    return (
        int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")
        % 2**63
        % mod
    )


def test_dsir_importance_matches_bruteforce(spark, tmp_path):
    from mr_spark.operators.pipeline import (
        _DSIR_B,
        _DSIR_TARGET,
        dsir_importance_weights,
    )

    docs = {
        1: "alpha beta alpha beta alpha beta",          # pure target language
        2: "gamma delta gamma delta gamma delta",       # pure off-target
        3: "alpha beta gamma delta alpha beta",         # mixed
        4: "alpha beta alpha beta gamma delta epsilon zeta",
    }
    sources = {1: _DSIR_TARGET, 2: "src1", 3: "src1", 4: "src2"}
    path = _write_docs(spark, tmp_path, docs, sources)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["log_weight"])
        for r in dsir_importance_weights(spark, path).collect()
    }

    def bigram_buckets(text):
        ws = text.split()
        return [
            _md5_tail_bucket(f"bg_{a}_{b}", _DSIR_B) for a, b in zip(ws, ws[1:])
        ]

    raw: Counter = Counter()
    tgt: Counter = Counter()
    per_doc = {}
    for d, t in docs.items():
        bs = bigram_buckets(t)
        per_doc[d] = Counter(bs)
        raw.update(bs)
        if sources[d] == _DSIR_TARGET:
            tgt.update(bs)
    rn, tn = sum(raw.values()), sum(tgt.values())
    for d, cnt in per_doc.items():
        lw = sum(
            c
            * (
                math.log((tgt[b] + 1) / (tn + _DSIR_B))
                - math.log((raw[b] + 1) / (rn + _DSIR_B))
            )
            for b, c in sorted(cnt.items())
        )
        assert got[d][0] == sum(cnt.values()), d
        assert abs(got[d][1] - round(lw, 6)) < 1e-6, (d, got[d][1], lw)
    # the target-language doc must outscore the off-target doc
    assert got[1][1] > got[2][1]
    # and the mixed doc sits strictly between them
    assert got[2][1] < got[3][1] < got[1][1]


def test_split_leakage_audit_matches_bruteforce(spark, tmp_path):
    """Two exact-duplicate pairs with hand-checkable doc_ids: the audit
    must count exactly the pairs whose endpoints' md5-tail split buckets
    differ (computed independently in Python here)."""
    from mr_spark.operators.dedup import split_leakage_audit

    base = (
        "the quick brown fox jumps over the lazy dog again and again today "
        "while the patient grey owl watches from the old oak tree nearby"
    )
    other = (
        "completely different subject matter entirely about ships and the "
        "sea with long voyages across cold northern waters under pale stars"
    )
    docs = {11: base, 12: base, 21: other, 22: other}
    path = _write_docs(spark, tmp_path, docs)
    row = split_leakage_audit(spark, path).collect()[0]

    def split(doc_id):
        b = _md5_tail_bucket(f"doc_{doc_id}", 100)
        return "train" if b < 90 else "val"

    pairs = [(11, 12), (21, 22)]
    n_cross = sum(1 for a, b in pairs if split(a) != split(b))
    assert row["n_neardup_pairs"] == len(pairs)
    assert row["n_cross_split"] == n_cross
    assert row["leak_share"] == round(n_cross / len(pairs), 6)


def test_dedup_lines_transform_matches_bruteforce(spark):
    """Keep-first line dedup on a constructed corpus with hand-computed
    expectations: the first global instance (doc_id, pos order) of each
    trimmed non-empty line survives; later instances drop; documents
    reassemble in position order; fully-boilerplate docs vanish."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [
        (1, "alpha\ncommon line\nbeta"),
        (2, "common line\ngamma"),          # 'common line' dup -> dropped
        (3, "  common line  \n\n delta "),  # trims to dup + empty + delta
        (4, "common line"),                 # reduces to zero lines -> gone
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    lines = (
        docs.select(
            "doc_id", F.posexplode(F.split("text", "\n")).alias("pos", "raw")
        )
        .select("doc_id", "pos", F.trim("raw").alias("line"))
        .where(F.col("line") != "")
    )
    w = Window.partitionBy("line").orderBy("doc_id", "pos")
    kept = lines.withColumn("rn", F.row_number().over(w)).where("rn = 1")
    cleaned = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s.line,
            ),
            "\n",
        ).alias("text_out")
    )
    got = {r["doc_id"]: r["text_out"] for r in cleaned.collect()}
    assert got == {
        1: "alpha\ncommon line\nbeta",
        2: "gamma",
        3: "delta",
    }  # doc 4 dropped entirely


def test_dedup_spans_matches_bruteforce(spark, tmp_path):
    """Remove-all exact-substring transform on a constructed corpus with
    hand-computed expectations: docs 1/4 are identical (fully covered →
    cut to zero chars → drop out), doc 2 shares only the boilerplate
    sentence (its covered region is cut, the C/D flanks survive), doc 3
    is untouched, doc 5 (< window) passes through verbatim."""
    from mr_spark.operators.dedup import dedup_spans

    path = _write_docs(spark, tmp_path, DOCS)
    row = dedup_spans(spark, path).collect()[0]

    wins = {d: _windows(t) for d, t in DOCS.items() if len(t) >= _SUBSTR_L}
    df = Counter(w for ws in wins.values() for w in set(ws))
    covered, spans = {}, {}
    for d, t in DOCS.items():
        cov = set()
        for i, w in enumerate(wins.get(d, [])):
            if df[w] >= 2:
                cov.update(range(i, i + _SUBSTR_L))
        covered[d] = cov
        n, prev = 0, None
        for j in sorted(cov):
            if prev is None or j != prev + 1:
                n += 1
            prev = j
        spans[d] = n
    cleaned = {
        d: "".join(c for j, c in enumerate(t) if j not in covered[d])
        for d, t in DOCS.items()
    }
    assert row["n_docs_in"] == len(DOCS)
    assert row["n_docs_out"] == sum(1 for c in cleaned.values() if c)
    assert row["spans_removed"] == sum(spans.values())
    assert row["chars_removed"] == sum(len(c) for c in covered.values())
    assert row["chars_out_total"] == sum(len(c) for c in cleaned.values())
    # the designed shape actually happened: the twins vanished, doc 2
    # lost exactly its shared-sentence cover, docs 3 and 5 intact
    assert not cleaned[1] and not cleaned[4]
    assert cleaned[3] == DOCS[3] and cleaned[5] == DOCS[5]
    assert 0 < len(cleaned[2]) < len(DOCS[2])
