"""Independent semantic checks for the quality/audit operators:
injected-corruption detection, sketch-vs-exact equality, and
distribution-identity baselines."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mr_spark import operators as ops
from mr_spark.sources import load_table

from conftest import SF_DIR


def test_heavy_hitters_equals_exact_computation(spark):
    """The MG-candidates + exact-verify pipeline must return EXACTLY the
    set a plain groupBy threshold returns — the sketch may only shrink
    the candidate set, never the answer."""
    got = {
        (r["word"], r["freq"])
        for r in ops.queries()["heavy_hitters"](spark, SF_DIR).collect()
    }
    from mr_spark.functions import tokens

    tok = load_table(spark, SF_DIR, "documents").select(
        F.explode(tokens("text")).alias("word")
    )
    c = tok.groupBy("word").agg(F.count("*").alias("c"))
    n = tok.count()
    expect = {
        (r["word"], r["c"]) for r in c.collect() if 50 * r["c"] > n
    }
    assert got == expect and got


def test_attribution_shares_partition_purchases(spark):
    """Channels partition all purchases: shares sum to 1 and counts sum
    to the purchase total; channels ⊆ {click, view, organic}."""
    rows = ops.queries()["attribution_last_touch"](spark, SF_DIR).collect()
    n_purch = (
        load_table(spark, SF_DIR, "events")
        .where(F.col("event_type") == "purchase")
        .count()
    )
    assert sum(r["n_purchases"] for r in rows) == n_purch
    assert math.isclose(sum(r["share"] for r in rows), 1.0, abs_tol=1e-4)
    assert {r["channel"] for r in rows} <= {"click", "view", "organic"}


def test_attribution_credits_recent_touch(spark, tmp_path):
    """Constructed stream: click 10 min before purchase → credited to
    click; purchase with a 2-hour-stale view → organic."""
    from mr_spark.operators.quality import attribution_last_touch

    rows = [
        (1, "2024-01-01 10:00:00", 100, "click", 0.0, "{}"),
        (2, "2024-01-01 10:10:00", 100, "purchase", 1.0, "{}"),
        (3, "2024-01-01 08:00:00", 200, "view", 0.0, "{}"),
        (4, "2024-01-01 10:00:00", 200, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    path = str(tmp_path / "ev")
    df.write.parquet(path + "/events.parquet")
    out = {r["channel"]: r["n_purchases"] for r in attribution_last_touch(spark, path).collect()}
    assert out == {"click": 1, "organic": 1}


def test_table_profile_key_column_is_unique_and_nonnull(spark):
    rows = {r["column_name"]: r for r in ops.queries()["table_profile"](spark, SF_DIR).collect()}
    pk = rows["o_orderkey"]
    assert pk["n_nulls"] == 0
    assert pk["n_distinct"] == pk["n_rows"]
    assert rows["o_orderstatus"]["n_distinct"] <= 3


def test_referential_integrity_detects_injected_corruption(spark, tmp_path):
    """Clean data audits to zero; after injecting an orphan order, a
    duplicate customer PK, and an orphan lineitem, the audit reports the
    exact violation counts."""
    from mr_spark.operators.quality import referential_integrity

    clean = {r["check_name"]: r["n_violations"] for r in referential_integrity(spark, SF_DIR).collect()}
    assert set(clean.values()) == {0}

    path = str(tmp_path / "dirty")
    o = load_table(spark, SF_DIR, "orders")
    cu = load_table(spark, SF_DIR, "customer")
    li = load_table(spark, SF_DIR, "lineitem")
    orphan_o = (
        o.limit(1)
        .withColumn("o_custkey", F.lit(-999).cast("bigint"))
        .withColumn("o_orderkey", F.lit(-1).cast("bigint"))
    )
    o.unionAll(orphan_o).write.parquet(path + "/orders.parquet")
    cu.unionAll(cu.limit(1)).write.parquet(path + "/customer.parquet")
    orphan_l = li.limit(1).withColumn("l_orderkey", F.lit(-999).cast("bigint"))
    li.unionAll(orphan_l).write.parquet(path + "/lineitem.parquet")

    dirty = {r["check_name"]: r["n_violations"] for r in referential_integrity(spark, path).collect()}
    assert dirty["orders_orphan_custkey"] == 1
    assert dirty["customer_dup_pk"] == 1
    assert dirty["lineitem_orphan_orderkey"] == 1
    assert dirty["orders_dup_pk"] == 0


def test_psi_zero_for_identical_distributions(spark, tmp_path):
    """The same price multiset on both sides of the split → PSI = 0
    (Laplace smoothing preserves p=q when counts are equal)."""
    from mr_spark.operators.quality import psi_drift

    prices = [100.0 + i for i in range(50)]
    data = [
        (k, 1, "O", p, d, "1-URGENT")
        for k, (p, d) in enumerate(
            [(p, d) for p in prices for d in ("1995-06-01", "1999-06-01")]
        )
    ]
    df = spark.createDataFrame(
        data,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    path = str(tmp_path / "psi")
    df.write.parquet(path + "/orders.parquet")
    out = psi_drift(spark, path).collect()[0]
    assert out["n_early"] == out["n_late"] == 50
    assert out["psi"] == 0.0
    # and on real data PSI is non-negative (termwise (p-q)ln(p/q) >= 0)
    assert ops.queries()["psi_drift"](spark, SF_DIR).collect()[0]["psi"] >= 0


def test_datacard_consistency(spark, tmp_path):
    """Datacard on a constructed corpus: known dup rate, language share,
    and uniform-source entropy ln(k); real-data entropy is bounded by
    ln(#sources)."""
    import math

    from mr_spark.operators.quality import corpus_datacard

    rows = [
        (1, "a b c", "en", "s1", 5),
        (2, "a b c", "en", "s2", 5),  # exact dup of doc 1
        (3, "d e", "fr", "s1", 3),
        (4, "f g", "en", "s2", 3),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path / "dc")
    df.write.parquet(path + "/documents.parquet")
    out = corpus_datacard(spark, path).collect()[0]
    assert out["n_docs"] == 4 and out["n_tokens"] == 10 and out["n_vocab"] == 7
    assert out["dup_rate"] == 0.25
    assert out["share_en"] == 0.75
    assert math.isclose(out["source_entropy"], math.log(2), abs_tol=1e-6)

    real = ops.queries()["corpus_datacard"](spark, SF_DIR).collect()[0]
    n_sources = load_table(spark, SF_DIR, "documents").select("source").distinct().count()
    assert 0 <= real["source_entropy"] <= math.log(n_sources) + 1e-9
    assert 0 <= real["dup_rate"] < 1


def test_gopher_rules_on_constructed_corpus(spark, tmp_path):
    """Hand-built documents exercise every Gopher rule in BOTH
    directions (the synthetic corpus has no bullets/ellipses/junk
    words): each doc trips exactly the rules it was built to trip."""
    good = " ".join(
        ["the", "a", "of"] + [f"word{i}" for i in range(60)]
    )  # 63 words, all alpha, 3 stopwords, mean len in range
    # doc_ids 17..23 ≡ 4..10 (mod 13): OUTSIDE the query's bullet/ellipsis
    # augmentation slices, so the hand-computed expectations below count
    # exactly these seven docs
    docs = [
        (17, good),                                    # passes everything
        (18, "the a " + " ".join(["x"] * 60)),         # mean word len 1.*: fails rule 2
        (19, good + " " + " ".join(["####"] * 30)),    # symbols: fails rule 3
        (20, "\n".join(["- the a item"] * 10)),        # all bullets: fails 4 (and 1)
        (21, " ".join(["the", "a"] + ["123"] * 70)),   # digits: fails alpha rule 5
        (22, " ".join([f"word{i}" for i in range(60)])),  # no stopwords: fails 6
        (23, "the a short doc"),                       # fails word count 1
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    df.createOrReplaceTempView("__gopher_docs")
    from mr_spark.operators.text import gopher_rules

    # run the registry body against the constructed frame by swapping
    # the loader's table: easiest is to re-derive via the same exprs —
    # here we just call the query against a parquet dir shaped like a
    # sf_dir with only documents.parquet
    import os

    df.select("doc_id", "text", F.lit("en").alias("lang"),
              F.lit("t").alias("source"),
              F.length("text").cast("bigint").alias("n_chars")) \
      .coalesce(1).write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    out = gopher_rules(spark, str(tmp_path)).collect()[0].asDict()
    assert out == {
        "n_docs": 7,
        "pass_word_count": 5,     # 20 (31 words) and 23 (4 words) fail
        "pass_mean_word_len": 5,  # 18 (len-1 words) and 21 (mostly len-3) fail
        "pass_symbol_ratio": 6,   # 19 fails
        "pass_line_rules": 6,     # 20 (all bullet lines) fails
        "pass_alpha_words": 5,    # 19 (#### words) and 21 (digit words) fail
        "pass_stopwords": 6,      # 22 (no stopwords) fails
        "pass_all": 1,            # only doc 17
    }


def test_gopher_line_rule_moves_both_ways_on_real_corpus(spark):
    """VERDICT r6 #7: the registered query's bullet/ellipsis counters
    must carry real signal at every sf — the doc_id%13 augmentation
    slices make pass_line_rules strictly interior (some augmented docs
    fail rule 4 by bullets/ellipses, some pass with live counts)."""
    out = ops.queries()["gopher_rules"](spark, SF_DIR).collect()[0]
    assert 0 < out["pass_line_rules"] < out["n_docs"], (
        f"pass_line_rules={out['pass_line_rules']} of {out['n_docs']} — "
        "rule 4 is degenerate again"
    )


def test_c4_rules_on_constructed_corpus(spark, tmp_path):
    """Hand-built documents exercise every C4 rule in BOTH directions;
    doc_ids 6..12 (mod 17) sit OUTSIDE the query's augmentation slices,
    so the expectations below count exactly these five docs."""
    import os

    five_sent = "The cat sat here. " * 5  # 5 sentences, 4-word lines
    docs = [
        (23, five_sent.strip()),                       # passes everything
        (24, "no terminal punct here\nshort."),        # kept=1 line, 1 sent: fails min-sentences
        (25, five_sent + " lorem ipsum is here."),     # fails no_lorem
        (26, five_sent + "\ncode { x } ahead."),       # fails no_brace
        (27, "please enable javascript now. " * 5),    # all lines dropped: fails min-sentences
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    df.select("doc_id", "text", F.lit("en").alias("lang"),
              F.lit("t").alias("source"),
              F.length("text").cast("bigint").alias("n_chars")) \
      .coalesce(1).write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    from mr_spark.operators.text import c4_rules

    out = c4_rules(spark, str(tmp_path)).collect()[0].asDict()
    assert out == {
        "n_docs": 5,
        "lines_total": 7,          # 1 + 2 + 1 + 2 + 1 (per-doc line counts)
        "lines_kept": 4,           # 23:1; 24:0 (no punct / <3 words);
                                   # 25:1; 26:2; 27:0 (javascript line)
        "pass_min_sentences": 3,   # 24 (0 kept lines) and 27 (0 kept) fail
        "pass_no_lorem": 4,        # 25 fails
        "pass_no_brace": 4,        # 26 fails
        "pass_all": 1,             # only 23 passes every page rule
    }


def test_c4_rules_move_both_ways_on_real_corpus(spark):
    """Every C4 counter must be strictly interior at every sf — the
    doc_id%17 augmentation slices guarantee both directions."""
    out = ops.queries()["c4_rules"](spark, SF_DIR).collect()[0]
    for col in ("pass_min_sentences", "pass_no_lorem", "pass_no_brace",
                "pass_all"):
        assert 0 < out[col] < out["n_docs"], (
            f"{col}={out[col]} of {out['n_docs']} — degenerate"
        )
    assert 0 < out["lines_kept"] < out["lines_total"]


def test_quality_classifier_matches_bruteforce(spark, tmp_path):
    """Pure-Python recompute of the hashed-linear scorer on a
    constructed corpus: md5-tail bucket, count-weighted fixed-order
    dot product, sigmoid, rounded-threshold routing."""
    import hashlib
    import re as _re
    from collections import Counter

    from mr_spark.operators.quality import _QC_B, quality_classifier

    docs = {
        1: "alpha beta gamma alpha beta",
        2: "solo",
        3: "the quick brown fox jumps over the lazy dog",
        4: "",  # zero tokens — excluded
    }
    rows = [(i, t, "en", "src1", len(t)) for i, t in docs.items()]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "c" / "documents.parquet"))
    got = {
        r["doc_id"]: (r["n_feats"], r["quality_prob"], r["kept"])
        for r in quality_classifier(spark, str(tmp_path / "c")).collect()
    }

    def bucket(f):
        return (
            int.from_bytes(hashlib.md5(f.encode()).digest()[8:], "little")
            % 2**63
            % _QC_B
        )

    def weight(b):
        return ((b * 2654435761 + 11) % 1000) / 999.0 - 0.5

    for d, text in docs.items():
        # ASCII corpus: [^a-zA-Z]+ is the \p{L} splitter's restriction
        toks = [t for t in _re.split(r"[^a-zA-Z]+", text) if t]
        if not toks:
            assert d not in got
            continue
        feats = ["ug_" + t for t in toks] + [
            f"bg_{a}_{b}" for a, b in zip(toks, toks[1:])
        ]
        cnt = Counter(bucket(f) for f in feats)
        s = sum(c * weight(b) for b, c in sorted(cnt.items())) / len(feats)
        p = round(1.0 / (1.0 + math.exp(-4.0 * s)), 6)
        assert got[d] == (len(feats), p, 1 if p >= 0.5 else 0), d
