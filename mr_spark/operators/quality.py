"""Data-quality / audit / drift operators: two-pass heavy hitters
(Misra–Gries candidates + exact verify), marketing-style last-touch
attribution, a one-pass table profiler, referential-integrity audits,
and PSI distribution drift between time halves.

heavy_hitters is the third sketch family (after HLL distinct and GK
quantiles): the sketch bounds the CANDIDATE set, a second exact pass
makes the OUTPUT exact — so unlike approx_distinct_sketch it carries a
full-strength oracle. PSI uses the fixed-order fold pattern from
infometrics (10-bin grid, both engines sum identical doubles in bin
order)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import tokens
from ..sources import load_table
from . import query

_TOKS_SQL = "list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), x -> x <> '')"

_HH_FRAC = 50  # heavy hitter = frequency > n/50 (2%)
_MG_K = 4 * _HH_FRAC  # per-partition Misra–Gries width (safety factor 4)


@query(
    "heavy_hitters",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS_SQL}) AS word FROM documents),
    c AS (SELECT word, COUNT(*) AS c FROM tok GROUP BY word),
    n AS (SELECT SUM(c) AS n FROM c)
    SELECT word, CAST(c AS BIGINT) AS freq,
           ROUND(CAST(c AS DOUBLE) / CAST(n AS DOUBLE), 6) AS share
    FROM c, n WHERE {_HH_FRAC} * c > n
    """,
)
def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent items with the classic two-pass sketch: pass 1 runs a
    Misra–Gries(k=200) summary PER PARTITION inside mapInPandas (a
    dict carried across that partition's Arrow batches — no shuffle of
    raw tokens), whose union provably contains every item with global
    frequency > n/200; pass 2 exactly counts ONLY the candidates
    (semi-join on the broadcast candidate set) and keeps freq > n/50.
    The sketch bounds candidate-set size (≤ k per partition regardless of
    data volume); the exact pass makes the output identical to the plain
    groupBy the oracle runs — approximation in the plan, none in the
    answer. The global token total rides out of the MG pass as one
    sentinel row per partition (persisted ≤k+1 rows/partition), so the
    corpus is tokenized exactly twice, not three times. Thresholds
    compare as 50·c > n in exact integers."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens("text")).alias("word"))
    mg = _mg_sketch(tok).persist()
    # Candidates (≤ _MG_K per partition — bounded regardless of data
    # volume) and the scalar total are materialized HERE, inside the
    # persist scope, so the cache can be released before returning —
    # a lazily-returned plan holding the persist would leak cached blocks
    # across the bench harness's repeated invocations.
    try:
        cand = [
            r["word"]
            for r in mg.where(F.col("word").isNotNull())
            .select("word")
            .distinct()
            .collect()
        ]
        # sum over zero sentinel rows (empty/zero-partition corpus) is
        # NULL — treat as 0 so the query degrades to an empty result
        # instead of a TypeError below
        n_total = mg.agg(F.sum("n_part")).collect()[0][0] or 0
    finally:
        mg.unpersist()
    candidates = spark.createDataFrame([(w,) for w in cand], "word string")
    exact = (
        tok.join(F.broadcast(candidates), "word")
        .groupBy("word")
        .agg(F.count("*").alias("c"))
        .where(_HH_FRAC * F.col("c") > F.lit(int(n_total)))
    )
    return exact.select(
        "word",
        F.col("c").cast("bigint").alias("freq"),
        F.round(F.col("c").cast("double") / F.lit(float(n_total)), 6).alias(
            "share"
        ),
    )


def _mg_sketch(tok: DataFrame) -> DataFrame:
    """Pass-1 Misra–Gries partition sketch over a (word) relation —
    split out so tests can pin its plan (mapInPandas directly over the
    tokenize Generate, no Exchange of raw tokens)."""

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n_part = 0
        for pdf in batches:
            n_part += len(pdf)
            for w in pdf["word"]:
                if w in counters:
                    counters[w] += 1
                elif len(counters) < _MG_K:
                    counters[w] = 1
                else:  # decrement-all step
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        # candidates + one sentinel row carrying this partition's token
        # count — the global n falls out of the SAME pass instead of a
        # second full tokenize scan
        words = list(counters.keys()) + [None]
        yield pd.DataFrame(
            {
                "word": pd.Series(words, dtype="object"),
                "n_part": pd.Series([0] * (len(words) - 1) + [n_part], dtype="int64"),
            }
        )

    return tok.mapInPandas(mg_partition, schema="word string, n_part bigint")


_ATTR_WINDOW_US = 3_600_000_000  # 1 hour, in microseconds


@query(
    "attribution_last_touch",
    oracle=f"""
    WITH ev AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
                FROM events),
    t AS (
      SELECT user_id, event_id, event_type, ts,
             last_value(CASE WHEN event_type IN ('click', 'view') THEN ts END
                        IGNORE NULLS) OVER w AS lt_ts,
             last_value(CASE WHEN event_type IN ('click', 'view') THEN event_type END
                        IGNORE NULLS) OVER w AS lt_type
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    p AS (
      SELECT CASE WHEN lt_ts IS NOT NULL
                       AND epoch_us(ts) - epoch_us(lt_ts) <= {_ATTR_WINDOW_US}
                  THEN lt_type ELSE 'organic' END AS channel
      FROM t WHERE event_type = 'purchase'
    ),
    c AS (SELECT channel, COUNT(*) AS n FROM p GROUP BY channel),
    tot AS (SELECT SUM(n) AS t FROM c)
    SELECT channel, CAST(n AS BIGINT) AS n_purchases,
           ROUND(CAST(n AS DOUBLE) / CAST(t AS DOUBLE), 6) AS share
    FROM c, tot
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase credits the most
    recent click/view by the same user within 1 hour, else 'organic'.
    The last-touch ts and type come from two IGNORE NULLS last_value
    windows over the SAME predicate, so they always describe the same
    row; (ts, event_id) ordering is total, so ties can't swap the touch.
    One per-user window (same exchange as sessionization), then a
    channel-cardinality count — exact integers into one division."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("click", "view")
    t = ev.select(
        "event_type",
        "ts",
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True).over(w).alias("lt_ts"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("lt_type"),
    )
    within = (
        F.col("lt_ts").isNotNull()
        & (
            F.unix_micros("ts") - F.unix_micros("lt_ts") <= _ATTR_WINDOW_US
        )
    )
    p = t.where(F.col("event_type") == "purchase").select(
        F.when(within, F.col("lt_type")).otherwise(F.lit("organic")).alias("channel")
    )
    c = p.groupBy("channel").agg(F.count("*").alias("n"))
    tot = c.agg(F.sum("n").alias("t"))
    return c.crossJoin(F.broadcast(tot)).select(
        "channel",
        F.col("n").cast("bigint").alias("n_purchases"),
        F.round(F.col("n").cast("double") / F.col("t").cast("double"), 6).alias(
            "share"
        ),
    )


_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


@query(
    "table_profile",
    oracle=f"""
    WITH a AS (
      SELECT COUNT(*) AS n,
             {", ".join(
                 f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS nn_{c},"
                 f" COUNT(DISTINCT {c}) AS nd_{c}"
                 for c in _PROFILE_COLS
             )}
      FROM orders
    )
    {" UNION ALL ".join(
        f"SELECT '{c}' AS column_name, CAST(n AS BIGINT) AS n_rows,"
        f" CAST(nn_{c} AS BIGINT) AS n_nulls, CAST(nd_{c} AS BIGINT) AS n_distinct"
        f" FROM a"
        for c in _PROFILE_COLS
    )}
    """,
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiler over ``orders``: row count, null count,
    and exact distinct count per column — the stats a catalog or
    data-contract check wants. ONE aggregation computes all 13 measures
    (multiple COUNT(DISTINCT)s expand to Spark's single expand-node
    plan), then the wide row explodes into (column, stats) rows — no
    per-column rescan, no driver loop. At 100 TB swap exact distinct for
    approx_count_distinct per column (the HLL contract of
    approx_distinct_sketch) — the profiler shape is unchanged."""
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("n")]
    for c in _PROFILE_COLS:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    a = o.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n").cast("bigint").alias("n_rows"),
                F.col(f"nn_{c}").cast("bigint").alias("n_nulls"),
                F.col(f"nd_{c}").cast("bigint").alias("n_distinct"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return a.select(F.explode(pairs).alias("p")).select(
        "p.column_name", "p.n_rows", "p.n_nulls", "p.n_distinct"
    )


@query(
    "referential_integrity",
    oracle="""
    SELECT 'orders_orphan_custkey' AS check_name,
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_checked,
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'lineitem_orphan_orderkey',
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
    UNION ALL
    SELECT 'customer_dup_pk',
           CAST((SELECT COUNT(*) FROM customer) AS BIGINT),
           CAST((SELECT COALESCE(SUM(c - 1), 0) FROM
                  (SELECT COUNT(*) AS c FROM customer GROUP BY c_custkey) t
                 WHERE c > 1) AS BIGINT)
    UNION ALL
    SELECT 'orders_dup_pk',
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
           CAST((SELECT COALESCE(SUM(c - 1), 0) FROM
                  (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey) t
                 WHERE c > 1) AS BIGINT)
    """,
)
def referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit: FK orphans (LEFT ANTI joins — at scale the
    orders→customer probe broadcasts or shuffles on the key exactly like
    any join; no row-at-a-time lookup) and PK duplicate counts
    (groupBy-HAVING). Returns (check, n_checked, n_violations) — all
    exact integers; zeros on clean data are the point (the audit must be
    silent-negative-proof, pinned by an injected-corruption test)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cu = load_table(spark, sf_dir, "customer")

    def row(name: str, checked: DataFrame, viol) -> DataFrame:
        return (
            checked.agg(F.count("*").alias("n_checked"))
            .crossJoin(viol)
            .select(
                F.lit(name).alias("check_name"),
                F.col("n_checked").cast("bigint"),
                F.col("n_violations").cast("bigint"),
            )
        )

    orphan_o = o.join(
        cu, o.o_custkey == cu.c_custkey, "left_anti"
    ).agg(F.count("*").alias("n_violations"))
    orphan_l = li.join(
        o, li.l_orderkey == o.o_orderkey, "left_anti"
    ).agg(F.count("*").alias("n_violations"))

    def dup(df: DataFrame, key: str) -> DataFrame:
        return (
            df.groupBy(key)
            .agg(F.count("*").alias("c"))
            .where(F.col("c") > 1)
            .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("n_violations"))
        )

    return (
        row("orders_orphan_custkey", o, orphan_o)
        .unionAll(row("lineitem_orphan_orderkey", li, orphan_l))
        .unionAll(row("customer_dup_pk", cu, dup(cu, "c_custkey")))
        .unionAll(row("orders_dup_pk", o, dup(o, "o_orderkey")))
    )


_PSI_SPLIT = "1998-01-01"
_PSI_BINS = 10


@query(
    "psi_drift",
    oracle=f"""
    WITH b AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders),
    binned AS (
      SELECT LEAST({_PSI_BINS - 1},
                   CAST(FLOOR((o_totalprice - b.lo)
                              / ((b.hi - b.lo) / {_PSI_BINS})) AS BIGINT)) AS bin,
             (o_orderdate < TIMESTAMP '{_PSI_SPLIT}') AS early
      FROM orders, b
    ),
    grid AS (
      SELECT s.bin,
             COALESCE(SUM(CASE WHEN early THEN 1 ELSE 0 END), 0) AS ce,
             COALESCE(SUM(CASE WHEN NOT early THEN 1 ELSE 0 END), 0) AS cl
      FROM unnest(range(0, {_PSI_BINS})) AS s(bin)
      LEFT JOIN binned ON binned.bin = s.bin
      GROUP BY s.bin
    ),
    n AS (SELECT SUM(ce) AS ne, SUM(cl) AS nl FROM grid)
    SELECT CAST(n.ne AS BIGINT) AS n_early, CAST(n.nl AS BIGINT) AS n_late,
           ROUND(SUM(
             ((CAST(g.ce + 1 AS DOUBLE) / CAST(n.ne + {_PSI_BINS} AS DOUBLE))
              - (CAST(g.cl + 1 AS DOUBLE) / CAST(n.nl + {_PSI_BINS} AS DOUBLE)))
             * ln((CAST(g.ce + 1 AS DOUBLE) / CAST(n.ne + {_PSI_BINS} AS DOUBLE))
                  / (CAST(g.cl + 1 AS DOUBLE) / CAST(n.nl + {_PSI_BINS} AS DOUBLE)))
             ORDER BY g.bin), 6) AS psi
    FROM grid g CROSS JOIN n
    GROUP BY n.ne, n.nl
    """,
)
def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the early (pre-1998) and
    late order-price distributions — the numeric-feature drift monitor
    that pairs with kl_source_drift's text drift. 10 equal-width bins
    (bounds from one min/max agg, bin arithmetic an identical float
    expression on both engines), Laplace-smoothed shares, and
    PSI = Σ (p−q)·ln(p/q) as a fixed-order fold over the 10-bin grid
    (absent bins zero-filled via the sequence spine, so both engines fold
    the same 10 terms). One scan, one 10-group agg."""
    o = load_table(spark, sf_dir, "orders")
    b = o.agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
    binned = o.crossJoin(F.broadcast(b)).select(
        F.least(
            F.lit(_PSI_BINS - 1),
            F.floor(
                (F.col("o_totalprice") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / _PSI_BINS)
            ),
        )
        .cast("bigint")
        .alias("bin"),
        (F.col("o_orderdate") < F.lit(_PSI_SPLIT).cast("timestamp")).alias("early"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("early"), 1).otherwise(0)).alias("ce"),
        F.sum(F.when(~F.col("early"), 1).otherwise(0)).alias("cl"),
    )
    spine = spark.range(_PSI_BINS).select(F.col("id").alias("bin"))
    grid = (
        spine.join(counts, "bin", "left")
        .select(
            "bin",
            F.coalesce("ce", F.lit(0)).alias("ce"),
            F.coalesce("cl", F.lit(0)).alias("cl"),
        )
    )
    n = grid.agg(F.sum("ce").alias("ne"), F.sum("cl").alias("nl"))
    g = grid.crossJoin(F.broadcast(n))
    a = g.groupBy("ne", "nl").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("bin", "ce", "cl", "ne", "nl"))),
            F.lit(0.0),
            lambda acc, x: acc
            + (
                (x["ce"] + 1).cast("double") / (x["ne"] + _PSI_BINS).cast("double")
                - (x["cl"] + 1).cast("double") / (x["nl"] + _PSI_BINS).cast("double")
            )
            * F.log(
                ((x["ce"] + 1).cast("double") / (x["ne"] + _PSI_BINS).cast("double"))
                / ((x["cl"] + 1).cast("double") / (x["nl"] + _PSI_BINS).cast("double"))
            ),
        ).alias("psi_raw")
    )
    return a.select(
        F.col("ne").cast("bigint").alias("n_early"),
        F.col("nl").cast("bigint").alias("n_late"),
        F.round("psi_raw", 6).alias("psi"),
    )


@query(
    "corpus_datacard",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang, source, md5(text) AS digest,
             CAST(len({_TOKS_SQL}) AS BIGINT) AS n_toks
      FROM documents
    ),
    srcs AS (SELECT source, COUNT(*) AS c FROM d GROUP BY source),
    tok AS (SELECT unnest({_TOKS_SQL}) AS w FROM documents),
    agg AS (
      SELECT (SELECT COUNT(*) FROM d) AS n_docs,
             (SELECT SUM(n_toks) FROM d) AS n_tokens,
             (SELECT COUNT(DISTINCT w) FROM tok) AS n_vocab,
             (SELECT COUNT(DISTINCT digest) FROM d) AS n_unique,
             (SELECT SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) FROM d) AS n_en,
             (SELECT SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) ORDER BY source)
              FROM srcs) AS slnl
      FROM (SELECT 1)
    )
    SELECT CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_vocab AS BIGINT) AS n_vocab,
           ROUND(CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
             AS avg_doc_tokens,
           ROUND(1.0 - CAST(n_unique AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
             AS dup_rate,
           ROUND(CAST(n_en AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS share_en,
           ROUND(ln(CAST(n_docs AS DOUBLE)) - slnl / CAST(n_docs AS DOUBLE), 6)
             AS source_entropy
    FROM agg
    """,
)
def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus data card — the capstone summary a dataset release
    ships: scale (docs, tokens, vocabulary), density (tokens/doc),
    exact-duplicate rate (1 − |distinct digests|/n), language share, and
    the Shannon entropy of the source mixture (the number
    mixture_weights rebalances toward). Every count is exact; the
    entropy Σ c·ln c is the fixed-order fold (infometrics pattern).
    Three scans of the corpus (doc-level, token explode, digest
    distinct), each a partial-aggregated tree — nothing holds state
    beyond counters at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        "source",
        F.md5(F.encode("text", "utf-8")).alias("digest"),
        F.size(tokens("text")).cast("bigint").alias("n_toks"),
    )
    srcs = d.groupBy("source").agg(F.count("*").alias("c"))
    slnl = srcs.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "c"))),
            F.lit(0.0),
            lambda acc, x: acc + x["c"].cast("double") * F.log(x["c"].cast("double")),
        ).alias("slnl")
    )
    tok = docs.select(F.explode(tokens("text")).alias("w"))
    agg = d.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
        F.countDistinct("digest").alias("n_unique"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_en"),
    )
    vocab = tok.agg(F.countDistinct("w").alias("n_vocab"))
    j = agg.crossJoin(F.broadcast(vocab)).crossJoin(F.broadcast(slnl))
    nd = F.col("n_docs").cast("double")
    return j.select(
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_vocab").cast("bigint").alias("n_vocab"),
        F.round(F.col("n_tokens").cast("double") / nd, 6).alias("avg_doc_tokens"),
        F.round(F.lit(1.0) - F.col("n_unique").cast("double") / nd, 6).alias("dup_rate"),
        F.round(F.col("n_en").cast("double") / nd, 6).alias("share_en"),
        F.round(F.log(nd) - F.col("slnl") / nd, 6).alias("source_entropy"),
    )


_QC_B = 4096  # hashed-feature buckets (fastText hashes into 2M; 4096
# keeps the synthetic corpus non-degenerate while the algebra matches)


def _qc_weight_sql(b: str) -> str:
    """Deterministic per-bucket weight in [-0.5, 0.5] — integer hash of
    the bucket id, exact on both engines (stand-in for trained
    coefficients; see quality_classifier)."""
    return f"(CAST(({b} * 2654435761 + 11) % 1000 AS DOUBLE) / 999.0 - 0.5)"


@query(
    "quality_classifier",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    feats AS (
      SELECT doc_id, 'ug_' || t[i] AS f
      FROM toks, unnest(range(1, len(t) + 1)) AS u(i)
      UNION ALL
      SELECT doc_id, 'bg_' || t[i] || '_' || t[i + 1] AS f
      FROM toks, unnest(range(1, len(t))) AS u(i)
      WHERE len(t) >= 2
    ),
    bk AS (
      SELECT doc_id,
             CAST(md5_number_lower(f) % 9223372036854775808 AS BIGINT)
               % {_QC_B} AS b
      FROM feats
    ),
    dc AS (SELECT doc_id, b, COUNT(*) AS c FROM bk GROUP BY 1, 2),
    scored AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_feats,
             SUM(c * {_qc_weight_sql('b')} ORDER BY b) / SUM(c) AS s
      FROM dc GROUP BY doc_id
    )
    SELECT doc_id, n_feats,
           ROUND(1.0 / (1.0 + exp(-4.0 * s)), 6) AS quality_prob,
           CAST(CASE WHEN ROUND(1.0 / (1.0 + exp(-4.0 * s)), 6) >= 0.5
                     THEN 1 ELSE 0 END AS BIGINT) AS kept
    FROM scored
    """,
)
def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FASTTEXT-STYLE QUALITY CLASSIFIER scoring — the linear
    hashed-ngram filter every major curation pipeline runs (CCNet /
    LLaMA use a fastText head over char+word n-grams; GPT-3 a logistic
    head over hashed features): word unigrams + bigrams hash into
    _QC_B buckets, a linear head pools them (mean of per-bucket
    weights, count-weighted), and a sigmoid yields the keep
    probability thresholded at 0.5.

    The WEIGHTS are a deterministic integer hash of the bucket id
    (exact on both engines) standing in for trained coefficients —
    this image ships no trained model, and random-but-fixed weights
    exercise every real code path: the hashed-feature extraction, the
    count-weighted linear pool, the sigmoid, the threshold routing. At
    deployment the weight expression swaps for a broadcast join against
    a ≤_QC_B-row trained weight table; nothing else changes.

    Cross-engine exactness: features hash via the md5-tail contract
    (hash VALUES feed arithmetic, so engine-internal digests would
    diverge — sampling.py's rule); the per-doc dot product folds in
    FIXED bucket order (the kl_source_drift contract) so float sums are
    bit-identical; ``kept`` thresholds the ROUNDED probability, never a
    raw float boundary.

    Scale: one (doc_id, bucket) count shuffle bounded by corpus tokens;
    the fold is per-doc over ≤_QC_B entries; no joins, no pair
    emission — linear at any corpus size, and the trained-weights
    variant adds one broadcast of a 4096-row table."""
    from .text import _md5_lower64

    docs = load_table(spark, sf_dir, "documents")
    t = F.col("t")
    ug = F.transform(t, lambda x: F.concat(F.lit("ug_"), x))
    bg = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 2),
            lambda i: F.concat(
                F.lit("bg_"),
                F.element_at(t, i + 1),
                F.lit("_"),
                F.element_at(t, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = (
        docs.select("doc_id", tokens("text").alias("t"))
        .where(F.size(t) >= 1)
        .select("doc_id", F.explode(F.concat(ug, bg)).alias("f"))
        .select("doc_id", (_md5_lower64(F.col("f")) % _QC_B).alias("b"))
    )
    dc = feats.groupBy("doc_id", "b").agg(F.count("*").alias("c"))
    w = lambda b: (
        (b * F.lit(2654435761) + 11) % 1000
    ).cast("double") / 999.0 - 0.5
    g = dc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_feats"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("b", "c"))),
            F.lit(0.0),
            lambda acc, x: acc + x["c"].cast("double") * w(x["b"]),
        ).alias("dot"),
    )
    s = F.col("dot") / F.col("n_feats")
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(F.lit(-4.0) * s)), 6)
    return g.select(
        "doc_id",
        "n_feats",
        prob.alias("quality_prob"),
        F.when(prob >= 0.5, 1).otherwise(0).cast("bigint").alias("kept"),
    )
