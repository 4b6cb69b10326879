"""Information-theoretic corpus metrics + deterministic weighted
sampling: per-doc character-trigram entropy, per-source KL divergence
against the corpus unigram distribution, per-dimension embedding
moments, and Efraimidis–Spirakis weighted sampling.

Float-sum determinism: Shannon/KL sums are FIXED-ORDER folds — Spark
folds an array_sort'ed (key, count) array left-to-right with
F.aggregate; the oracle uses DuckDB's ordered aggregate
``SUM(term ORDER BY key)``. Both accumulate the identical doubles in
the identical order, so the sums are bit-equal (the house rule that a
bare float SUM() is summation-order-dependent and never comparable
across engines — see bm25_topk's pivot for the fixed-arity variant).
Embedding moments are quantized to 1e-6 integers first (exact
DECIMAL(38,0)/HUGEINT sums), mirroring semantic_dedup's quantized dot
products. Quantization tie rule: a float32 value CAN land exactly on a
.5 boundary after ×1e6 (e.g. 1/128 → 7812.5 — the odd numerator cancels
the 5⁶ factor), and both engines resolve it the same way — ROUND half
AWAY from zero (Spark HALF_UP == DuckDB round). Any replay (including
the numpy tests) must use half-away, not banker's rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from . import query
from .text import _md5_lower64

_TOKS_SQL = "list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), x -> x <> '')"


@query(
    "char_ngram_entropy",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, length(text) - 1),
                                   i -> substring(text, i, 3))) AS g
      FROM documents WHERE length(text) >= 3
    ),
    c AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY 1, 2),
    a AS (
      SELECT doc_id, SUM(c) AS n, COUNT(*) AS d,
             SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) ORDER BY g) AS s
      FROM c GROUP BY doc_id
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_grams, CAST(d AS BIGINT) AS n_distinct,
           ROUND(ln(CAST(n AS DOUBLE)) - s / CAST(n AS DOUBLE), 6) AS entropy
    FROM a
    """,
)
def char_ngram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-trigram Shannon entropy — the
    compressibility proxy quality filters use to catch boilerplate and
    keyboard-mash (low H = repetitive template, near-max H = random
    noise; natural text sits in a band). H = ln N − (Σ c·ln c)/N on
    exact integer counts; the Σ is a fixed-order fold over the
    gram-sorted count array (see module docstring).

    ZERO-shuffle plan: the whole computation is row-side. Each doc's
    trigram array is sorted in-row and a single run-length fold walks it
    (state = current run's gram/length + distinct count + Σ c·ln c so
    far) — a (doc, gram) groupBy here would shuffle a corpus×len(text)
    trigram stream, which at 8× data showed GC/spill variance up to 10×
    wall despite partial aggs. Run contributions land in ascending gram
    order, exactly the oracle's ``SUM(c·ln c ORDER BY g)`` float order.
    Per-row cost is O(len·log len) inside codegen; memory is one doc's
    trigram array, bounded by document length, never corpus size. Plan
    pinned shuffle-free in tests/test_plans.py."""
    docs = load_table(spark, sf_dir, "documents").where(F.length("text") >= 3)
    arr = F.array_sort(
        F.transform(
            F.sequence(F.lit(1), F.length("text") - 2),
            lambda i: F.col("text").substr(i, F.lit(3)),
        )
    )

    def step(acc, x):
        run_s = F.when(
            acc["run"] > 0,
            acc["run"].cast("double") * F.log(acc["run"].cast("double")),
        ).otherwise(F.lit(0.0))
        return F.when(
            x == acc["prev"],
            F.struct(
                acc["prev"].alias("prev"),
                (acc["run"] + 1).alias("run"),
                acc["d"].alias("d"),
                acc["s"].alias("s"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"),
                F.lit(1).cast("bigint").alias("run"),
                (acc["d"] + 1).alias("d"),
                (acc["s"] + run_s).alias("s"),
            )
        )

    def finish(acc):
        last_s = F.when(
            acc["run"] > 0,
            acc["run"].cast("double") * F.log(acc["run"].cast("double")),
        ).otherwise(F.lit(0.0))
        return F.struct(acc["d"].alias("d"), (acc["s"] + last_s).alias("s"))

    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("d"),
        F.lit(0.0).alias("s"),
    )
    folded = docs.select(
        "doc_id",
        (F.length("text") - 2).cast("bigint").alias("n"),
        F.aggregate(arr, init, step, finish).alias("a"),
    )
    n = F.col("n")
    return folded.select(
        "doc_id",
        n.cast("bigint").alias("n_grams"),
        F.col("a.d").cast("bigint").alias("n_distinct"),
        F.round(
            F.log(n.cast("double")) - F.col("a.s") / n.cast("double"), 6
        ).alias("entropy"),
    )


_KL_V = 100  # vocabulary cap: top-V corpus words by frequency


@query(
    "kl_source_drift",
    oracle=f"""
    WITH tok AS (SELECT source, unnest({_TOKS_SQL}) AS word FROM documents),
    wc AS (SELECT word, COUNT(*) AS qc FROM tok GROUP BY word),
    vocab AS (SELECT word, qc FROM wc ORDER BY qc DESC, word LIMIT {_KL_V}),
    tot AS (SELECT SUM(qc) AS q, COUNT(*) AS v FROM vocab),
    sc AS (
      SELECT source, word, COUNT(*) AS c FROM tok
      WHERE word IN (SELECT word FROM vocab) GROUP BY 1, 2
    ),
    grid AS (
      SELECT s.source, v.word, v.qc, COALESCE(sc.c, 0) AS c
      FROM (SELECT DISTINCT source FROM documents) s
      CROSS JOIN vocab v
      LEFT JOIN sc ON sc.source = s.source AND sc.word = v.word
    ),
    ns AS (SELECT source, SUM(c) AS n FROM grid GROUP BY source)
    SELECT g.source, CAST(ns.n AS BIGINT) AS n_vocab_tokens,
           ROUND(SUM(
             (CAST(g.c + 1 AS DOUBLE) / CAST(ns.n + tot.v AS DOUBLE))
             * ln((CAST(g.c + 1 AS DOUBLE) / CAST(ns.n + tot.v AS DOUBLE))
                  / (CAST(g.qc + 1 AS DOUBLE) / CAST(tot.q + tot.v AS DOUBLE)))
             ORDER BY g.word), 6) AS kl
    FROM grid g JOIN ns ON g.source = ns.source CROSS JOIN tot
    GROUP BY g.source, ns.n
    """,
)
def kl_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift per source: KL(source ‖ corpus) over the
    Laplace-smoothed top-V unigram distribution — the mixture-monitoring
    signal that flags a source whose language shifted from the corpus it
    feeds (`mixture_weights` rebalances sizes; this watches content).
    The vocab is a broadcast top-V (exact integer counts, word
    tie-break); every source scores the SAME fixed vocabulary, absent
    words smoothed via the source×vocab grid, and the Σ p·ln(p/q) is a
    fixed-order fold over the word-sorted grid. Heavy relation sees one
    (source, word) count shuffle; the grid is |sources|×V rows."""
    docs = load_table(spark, sf_dir, "documents")
    from ..functions import tokens
    from ..session import persist_tracked

    tok = docs.select("source", F.explode(tokens("text")).alias("word"))
    # ONE tokenize+explode pass: aggregate straight to (source, word)
    # counts and persist that small relation — the corpus-wide word counts
    # (for the vocab) and the per-source counts (for the grid) both derive
    # from it, where the previous shape re-tokenized the whole corpus for
    # each (the vocab collect executed one pass eagerly, then sc's lazy
    # subtree ran the explode again)
    sw = persist_tracked(
        tok.groupBy("source", "word").agg(F.count("*").alias("c"))
    )
    wc = sw.groupBy("word").agg(F.sum("c").alias("qc"))
    # the top-V vocab is referenced three times downstream (totals, the
    # count semi-join, the smoothing grid); Spark has no cross-subtree
    # CSE for TakeOrdered subplans, so materialize the ≤V rows on the
    # driver once (the kcenter pattern) instead of re-aggregating per
    # reference
    vocab_rows = wc.orderBy(F.desc("qc"), F.asc("word")).limit(_KL_V).collect()
    vocab = spark.createDataFrame(
        [(r["word"], int(r["qc"])) for r in vocab_rows], "word string, qc bigint"
    )
    tot = vocab.agg(F.sum("qc").alias("q"), F.count("*").alias("v"))
    sc = sw.join(F.broadcast(vocab.select("word")), "word").select(
        "source", "word", "c"
    )
    grid = (
        docs.select("source")
        .distinct()
        .crossJoin(F.broadcast(vocab))
        .join(sc, ["source", "word"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0)))
    )
    ns = grid.groupBy("source").agg(F.sum("c").alias("n"))
    g = grid.join(ns, "source").crossJoin(F.broadcast(tot))
    a = g.groupBy("source", "n").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("word", "c", "qc", "n", "q", "v"))),
            F.lit(0.0),
            lambda acc, x: acc
            + (
                (x["c"] + 1).cast("double") / (x["n"] + x["v"]).cast("double")
            )
            * F.log(
                ((x["c"] + 1).cast("double") / (x["n"] + x["v"]).cast("double"))
                / ((x["qc"] + 1).cast("double") / (x["q"] + x["v"]).cast("double"))
            ),
        ).alias("kl_raw")
    )
    return a.select(
        "source",
        F.col("n").cast("bigint").alias("n_vocab_tokens"),
        F.round("kl_raw", 6).alias("kl"),
    )


@query(
    "embedding_dim_stats",
    oracle="""
    WITH q AS (
      SELECT CAST(i - 1 AS BIGINT) AS dim,
             CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS qv
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    a AS (
      SELECT dim, COUNT(*) AS n, SUM(qv) AS s,
             SUM(CAST(qv AS HUGEINT) * qv) AS sq
      FROM q GROUP BY dim
    )
    SELECT dim, CAST(n AS BIGINT) AS n_vecs,
           ROUND(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6), 6) AS mean,
           ROUND((CAST(n AS DOUBLE) * CAST(sq AS DOUBLE)
                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1e12), 6) AS variance
    FROM a
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding moments (mean/variance) — the feature
    screen before ANN indexing or dimensionality reduction (dead and
    dominant dimensions distort cosine geometry; `ann_ivf_topk` trains on
    these columns). Values quantize to 1e-6 integers; Σq and Σq² run
    exact in DECIMAL(38,0)/HUGEINT (at 1e11 vectors Σq² ~ 1e23 overflows
    BIGINT), variance = (nΣq² − (Σq)²)/(n²·10¹²) is one float expression
    on identical integers. One posexplode + one 64-group agg — fully
    partial-aggregated, shuffles 64 rows per map partition."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.select(
        F.posexplode("embedding").alias("dim", "val")
    ).select(
        F.col("dim").cast("bigint").alias("dim"),
        F.round(F.col("val").cast("double") * 1000000, 0).cast("bigint").alias("qv"),
    )
    a = qv.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum("qv").alias("s"),
        F.sum(F.col("qv").cast("decimal(38,0)") * F.col("qv")).alias("sq"),
    )
    n, s, sq = F.col("n").cast("double"), F.col("s").cast("double"), F.col("sq").cast("double")
    return a.select(
        "dim",
        F.col("n").cast("bigint").alias("n_vecs"),
        F.round(s / (n * F.lit(1e6)), 6).alias("mean"),
        F.round((n * sq - s * s) / (n * n * F.lit(1e12)), 6).alias("variance"),
    )


_WS_K = 64  # weighted sample size
_POW53 = 9007199254740992  # 2^53


@query(
    "weighted_sample",
    oracle=f"""
    WITH h AS (
      SELECT o_orderkey, o_totalprice,
             CAST(md5_number_lower('ws_' || CAST(o_orderkey AS VARCHAR))
                  % 9223372036854775808 AS BIGINT) % {_POW53} AS h53
      FROM orders
    ),
    k AS (
      SELECT o_orderkey, o_totalprice,
             ROUND(ln((CAST(h53 AS DOUBLE) + 0.5) / {_POW53}) * 1000000
                   / o_totalprice, 6) AS es_key
      FROM h
    )
    SELECT o_orderkey, o_totalprice, es_key
    FROM k ORDER BY es_key DESC, o_orderkey LIMIT {_WS_K}
    """,
)
def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis):
    P(selected) ∝ o_totalprice, via key = ln(u)/w with u a content-hash
    uniform — rank by key descending, keep top-k. The distributed
    one-pass weighted sampler (a TakeOrdered top-k — no global sort, no
    driver state), and deterministic: u derives from the md5-tail
    machinery shared with hash_sample, and ranking uses the ROUNDED key
    with an o_orderkey tie-break, so a last-ulp ln() divergence can
    never reorder the boundary. The key is SCALED ×1e6 before rounding:
    with weights ~1e5, the raw quotient sits at ~1e-5 where a 6-decimal
    round collapses thousands of rows into one tie bucket and the
    tie-break (not the weights) would pick the sample — measured at
    sf0.1 before the fix: 17k orders shared the top rounded key.
    ln(u)/w is order-isomorphic to the textbook u^(1/w) (exp is
    monotone) without pow(); the positive scale factor preserves the
    order exactly."""
    o = load_table(spark, sf_dir, "orders")
    h53 = _md5_lower64(F.concat(F.lit("ws_"), F.col("o_orderkey").cast("string"))) % _POW53
    u = (h53.cast("double") + 0.5) / F.lit(float(_POW53))
    k = o.select(
        "o_orderkey",
        "o_totalprice",
        F.round(F.log(u) * 1000000 / F.col("o_totalprice"), 6).alias("es_key"),
    )
    return k.orderBy(F.desc("es_key"), F.asc("o_orderkey")).limit(_WS_K)
