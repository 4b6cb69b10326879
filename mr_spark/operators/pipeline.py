"""Training-data pipeline operators over ``documents`` — the corpus-prep
stages between raw text and a tokenized training set: context-window
chunking, concat-and-split sequence packing, benchmark decontamination,
and tokenizer-vocabulary construction.

All JVM-side column expressions (no Python UDFs); every query is
oracle-checked. Ratios are single divisions of exact integer counts —
bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import tokens
from ..session import persist_tracked
from ..sources import load_table
from . import query

_TOKS_SQL = "list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), x -> x <> '')"

_CHUNK_SIZE = 32  # tokens per chunk (a stand-in for a model context window)
_CHUNK_STRIDE = 24  # overlap of CHUNK_SIZE - STRIDE = 8 tokens


@query(
    "doc_chunking",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS ws FROM documents)
    SELECT doc_id,
           CAST(s // {_CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           CAST(s AS BIGINT) AS chunk_start,
           CAST(len(ws[s+1 : s+{_CHUNK_SIZE}]) AS BIGINT) AS n_chunk_tokens,
           array_to_string(ws[s+1 : s+{_CHUNK_SIZE}], ' ') AS chunk_text
    FROM toks, unnest(range(0, len(ws), {_CHUNK_STRIDE})) AS t(s)
    """,
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking: each document's token stream is
    cut into 32-token chunks every 24 tokens (8-token overlap) — the
    standard prep for embedding/retrieval indexing and for long-doc
    training. Pure per-row array ops (sequence → posexplode → slice):
    embarrassingly parallel, no shuffle at all."""
    docs = load_table(spark, sf_dir, "documents")
    ws = tokens("text")
    n = F.size(ws)
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(_CHUNK_STRIDE))
    ).otherwise(F.array().cast("array<int>"))
    chunked = docs.select(
        "doc_id", ws.alias("ws"), F.posexplode(starts).alias("chunk_id", "s")
    )
    chunk = F.slice(F.col("ws"), F.col("s") + 1, F.lit(_CHUNK_SIZE))
    return chunked.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.col("s").cast("bigint").alias("chunk_start"),
        F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


_CTX = 256  # tokens per packed context window
_BLOCK = 1024  # docs per prefix-sum block


@query(
    "pack_context_windows",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens FROM documents
    ), pre AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strm
      FROM toks
    )
    SELECT doc_id, n_tokens,
           CAST(strm // {_CTX} AS BIGINT) AS first_window,
           CAST((strm + n_tokens - 1) // {_CTX} AS BIGINT) AS last_window,
           CAST((strm + n_tokens - 1) // {_CTX} - strm // {_CTX} + 1 AS BIGINT)
             AS n_windows
    FROM pre
    """,
)
def pack_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split sequence packing: documents are concatenated in
    doc_id order into one token stream and split into fixed 256-token
    context windows; each doc reports the window range it lands in — the
    bookkeeping LLM-pretraining packing needs.

    The global running sum is computed as a DISTRIBUTED two-level prefix
    sum, not a single-partition window: per-block (1024 docs) totals are
    tiny (corpus/1024 rows), their exclusive running sum broadcasts back,
    and the intra-block window shuffles only on block id — the same plan
    at 100 TB, where a global ORDER BY window would serialize on one
    executor."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
        F.floor(F.col("doc_id") / _BLOCK).cast("bigint").alias("block"),
    )
    block_w = Window.orderBy("block").rowsBetween(Window.unboundedPreceding, -1)
    block_pre = (
        toks.groupBy("block")
        .agg(F.sum("n_tokens").alias("block_total"))
        .select(
            "block",
            F.coalesce(F.sum("block_total").over(block_w), F.lit(0)).alias(
                "block_before"
            ),
        )
    )
    intra_w = (
        Window.partitionBy("block")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = toks.join(F.broadcast(block_pre), "block").select(
        "doc_id",
        "n_tokens",
        (
            F.col("block_before")
            + F.coalesce(F.sum("n_tokens").over(intra_w), F.lit(0))
        ).alias("strm"),
    )
    first = F.floor(F.col("strm") / _CTX).cast("bigint")
    last = F.floor((F.col("strm") + F.col("n_tokens") - 1) / _CTX).cast("bigint")
    return pre.select(
        "doc_id",
        "n_tokens",
        first.alias("first_window"),
        last.alias("last_window"),
        (last - first + 1).alias("n_windows"),
    )


_BENCH_SOURCE = "src0"  # stands in for the held-out benchmark corpus
_CONTAM_K = 5  # 5-gram collision — the usual decontamination unit


@query(
    "contamination_ngrams",
    oracle=f"""
    WITH toks AS (SELECT doc_id, source, {_TOKS_SQL} AS ws FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, source,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                   || ' ' || ws[i+4] AS g
      FROM toks, unnest(range(1, len(ws) - 3)) AS t(i)
      WHERE len(ws) >= {_CONTAM_K}
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE source = '{_BENCH_SOURCE}')
    SELECT doc_id,
           COUNT(*) AS n_grams,
           CAST(COUNT(b.g) AS BIGINT) AS n_contaminated,
           CAST(COUNT(b.g) AS DOUBLE) / COUNT(*) AS contamination
    FROM grams LEFT JOIN bench b USING (g)
    WHERE source <> '{_BENCH_SOURCE}'
    GROUP BY doc_id
    """,
)
def contamination_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per training document, the fraction of
    its distinct word 5-grams that collide with the benchmark corpus
    (here: docs from source 'src0' stand in for the eval set).

    Plan: the benchmark's distinct-gram set is eval-benchmark-sized —
    small by construction even at 100 TB of training data — so it
    BROADCASTS and the check is a map-side left join over the training
    grams; no shuffle touches the big side until the per-doc count."""
    from .dedup import word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", "source", F.explode(word_ngrams("text", _CONTAM_K)).alias("g")
    )
    bench = (
        grams.where(F.col("source") == _BENCH_SOURCE)
        .select("g")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        grams.where(F.col("source") != _BENCH_SOURCE)
        .join(F.broadcast(bench), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count("hit").cast("bigint").alias("n_contaminated"),
            (F.count("hit").cast("double") / F.count("*")).alias("contamination"),
        )
    )


_PII_SALT = "mrspark"  # stand-in for a managed per-dataset salt


@query(
    "pii_pseudonymize",
    oracle=f"""
    SELECT event_id,
           sha256('{_PII_SALT}:' || CAST(user_id AS VARCHAR)) AS user_pseudo,
           event_type,
           regexp_replace(props, '[0-9]+', '#', 'g') AS props_redacted,
           CAST(FLOOR(value / 10) * 10 AS BIGINT) AS value_bucket
    FROM events
    """,
)
def pii_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Governance pass a training pipeline runs before data leaves the
    trust boundary: user ids are replaced by a salted SHA-256 pseudonym
    (joinable, not reversible), free-text props have digit runs redacted,
    and the numeric value is generalized to a coarse bucket (k-anonymity
    style). Pure per-row codegen'd expressions — no shuffle, scales as a
    map-only pass."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.sha2(
            F.concat(F.lit(f"{_PII_SALT}:"), F.col("user_id").cast("string")), 256
        ).alias("user_pseudo"),
        "event_type",
        F.regexp_replace("props", "[0-9]+", "#").alias("props_redacted"),
        (F.floor(F.col("value") / 10) * 10).cast("bigint").alias("value_bucket"),
    )


_VOCAB_TOP = 32


@query(
    "vocab_coverage",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS_SQL}) AS word FROM documents),
    counts AS (SELECT word, COUNT(*) AS cnt FROM tok GROUP BY word),
    ranked AS (
      SELECT word, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS rank,
             SUM(cnt) OVER (ORDER BY cnt DESC, word
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cnt) OVER () AS total
      FROM counts
    )
    SELECT word, cnt, CAST(rank AS BIGINT) AS rank,
           CAST(cum AS DOUBLE) / total AS cum_share
    FROM ranked WHERE rank <= {_VOCAB_TOP}
    """,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary construction: top-32 tokens by global count
    with the cumulative share of the corpus each prefix of the vocabulary
    covers (the coverage curve that sizes a real vocab).

    The vocabulary is NOT window-sized data — distinct tokens grow with the
    corpus (billions at web scale), so ranking it with an unpartitioned
    window would funnel the whole vocab through one task. Instead the
    top-32 is cut FIRST with ``orderBy().limit()`` (TakeOrderedAndProject:
    per-partition heaps, 32-row driver merge) and the corpus total comes
    from one scalar aggregate; the rank/cumulative windows then run over
    exactly 32 rows, which is single-partition by construction and correct
    at any scale. The top-32 prefix of the full-vocab cumulative sum is
    identical to the cumulative sum over the top-32 rows, so this matches
    the oracle bit-for-bit. Plan pinned in tests/test_plans.py."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .persist()  # the scalar total and the top-32 cut are separate
        # subtrees; without the cache the tokenize+groupBy — the dominant
        # cost — runs twice. Both are materialized inside the persist
        # scope (32 rows + one scalar), then the cache is released.
    )
    try:
        total = counts.agg(F.sum("cnt")).collect()[0][0] or 0
        top_rows = [
            (r["word"], r["cnt"])
            for r in counts.orderBy(F.desc("cnt"), F.asc("word"))
            .limit(_VOCAB_TOP)
            .collect()
        ]
    finally:
        counts.unpersist()
    top = spark.createDataFrame(top_rows, "word string, cnt bigint")
    order_w = Window.orderBy(F.desc("cnt"), F.asc("word"))
    cum_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return top.select(
        "word",
        "cnt",
        F.row_number().over(order_w).cast("bigint").alias("rank"),
        (F.sum("cnt").over(cum_w).cast("double") / F.lit(int(total))).alias(
            "cum_share"
        ),
    )


_MIN_TOKENS = 20
_MIN_ALPHA = 0.80


@query(
    "corpus_curation",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, source,
             md5(trim(regexp_replace(lower(text), '[^\\p{{L}}]+', ' ', 'g'))) AS fp,
             (len({_TOKS_SQL}) >= {_MIN_TOKENS}
              AND CAST(length(regexp_replace(text, '[^\\p{{L}}]', '', 'g')) AS DOUBLE)
                  / length(text) >= {_MIN_ALPHA}) AS ok
      FROM documents
    ), canon AS (
      SELECT source, ok,
             ok AND doc_id = MIN(CASE WHEN ok THEN doc_id END)
                             OVER (PARTITION BY fp) AS keep
      FROM q
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN NOT ok THEN 1 ELSE 0 END) AS BIGINT) AS n_drop_quality,
           CAST(SUM(CASE WHEN ok AND NOT keep THEN 1 ELSE 0 END) AS BIGINT)
             AS n_drop_dup
    FROM canon GROUP BY source
    """,
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation accounting — the composed pipeline a corpus
    actually runs: cheap quality gates (token count, alphabetic ratio),
    then exact dedup keeping the min-doc_id canonical copy per content
    fingerprint, reported as per-source kept/dropped counts.

    Plan: one scan computes tokens/ratio/fingerprint; canonicalization is
    a window over fp (the 16-byte digest is the only thing shuffled — the
    same trick doc_fingerprint documents); the final agg shuffles
    source-sized rows. Two narrow shuffles total at any scale."""
    from pyspark.sql import Window

    from ..functions import normalized_text

    docs = load_table(spark, sf_dir, "documents")
    ws = tokens("text")
    alpha = (
        F.length(F.regexp_replace("text", r"[^\p{L}]", "")).cast("double")
        / F.length("text")
    )
    q = docs.select(
        "doc_id",
        "source",
        F.md5(normalized_text("text")).alias("fp"),
        ((F.size(ws) >= _MIN_TOKENS) & (alpha >= _MIN_ALPHA)).alias("ok"),
    )
    w = Window.partitionBy("fp")
    canon = q.select(
        "source",
        "ok",
        (
            F.col("ok")
            & (
                F.col("doc_id")
                == F.min(F.when(F.col("ok"), F.col("doc_id"))).over(w)
            )
        ).alias("keep"),
    )
    return canon.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum(F.when(~F.col("ok"), 1).otherwise(0)).cast("bigint")
        .alias("n_drop_quality"),
        F.sum(F.when(F.col("ok") & ~F.col("keep"), 1).otherwise(0)).cast("bigint")
        .alias("n_drop_dup"),
    )


# target mixture: upweight the benchmark-adjacent source, downweight the
# rest uniformly (literal so both engines share it; a real pipeline reads
# this from a mixture config)
_MIX_TARGET_SRC = "src1"
_MIX_TARGET_SHARE = 0.25


@query(
    "mixture_weights",
    oracle=f"""
    WITH tok AS (
      SELECT source, CAST(len({_TOKS_SQL}) AS BIGINT) AS n FROM documents
    ),
    per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n) AS BIGINT) AS n_tokens
            FROM tok GROUP BY source),
    tot AS (SELECT SUM(n_tokens) AS total FROM per)
    SELECT source, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) / total AS actual_share,
           CASE WHEN source = '{_MIX_TARGET_SRC}' THEN {_MIX_TARGET_SHARE}
                ELSE {(1 - _MIX_TARGET_SHARE)} / ((SELECT COUNT(*) FROM per) - 1)
           END AS target_share,
           (CASE WHEN source = '{_MIX_TARGET_SRC}' THEN {_MIX_TARGET_SHARE}
                 ELSE {(1 - _MIX_TARGET_SHARE)} / ((SELECT COUNT(*) FROM per) - 1)
            END) / (CAST(n_tokens AS DOUBLE) / total) AS sample_weight
    FROM per CROSS JOIN tot
    """,
)
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture rebalancing (the domain-weights step of pretraining
    curation, à la The Pile / DoReMi's input): per-source token counts,
    actual corpus share, a target mixture (one source upweighted to 25%,
    the rest uniform), and the per-source sampling weight
    target/actual that a weighted sampler applies downstream.

    Plan: one explode-free token count per doc (array length, no explode),
    one source-level agg (sources ≪ corpus), totals broadcast back — at
    100 TB this is a metadata-sized result computed in one corpus scan.
    Exactness: integer token counts, then divisions in the same literal
    order on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "source", F.size(tokens("text")).cast("bigint").alias("n")
    ).groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n").cast("bigint").alias("n_tokens"),
    )
    per = persist_tracked(per)
    tot = per.agg(F.sum("n_tokens").alias("total"))
    n_src = per.agg(F.count("*").alias("n_sources"))
    target = F.when(
        F.col("source") == _MIX_TARGET_SRC, F.lit(_MIX_TARGET_SHARE)
    ).otherwise(F.lit(1 - _MIX_TARGET_SHARE) / (F.col("n_sources") - 1))
    actual = F.col("n_tokens").cast("double") / F.col("total")
    return (
        per.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n_src))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            actual.alias("actual_share"),
            target.alias("target_share"),
            (target / actual).alias("sample_weight"),
        )
    )


_DSIR_B = 1024  # hashed-feature buckets (DSIR uses 10k; 1024 keeps the
# synthetic-corpus buckets non-degenerate while the algebra is identical)
_DSIR_TARGET = "src0"  # the target domain whose distribution docs score against


@query(
    "dsir_importance_weights",
    oracle=f"""
    WITH toks AS (SELECT doc_id, source, {_TOKS_SQL} AS t FROM documents),
    bk AS (
      SELECT doc_id, source,
             CAST(md5_number_lower('bg_' || t[i] || '_' || t[i+1])
                  % 9223372036854775808 AS BIGINT) % {_DSIR_B} AS b
      FROM toks, unnest(range(1, len(t))) AS u(i)
      WHERE len(t) >= 2
    ),
    dc AS (SELECT doc_id, b, COUNT(*) AS c FROM bk GROUP BY 1, 2),
    raw AS (SELECT b, COUNT(*) AS r FROM bk GROUP BY b),
    tgt AS (SELECT b, COUNT(*) AS tc FROM bk
            WHERE source = '{_DSIR_TARGET}' GROUP BY b),
    tot AS (SELECT (SELECT COUNT(*) FROM bk) AS rn,
                   (SELECT COUNT(*) FROM bk WHERE source = '{_DSIR_TARGET}') AS tn)
    SELECT dc.doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
           ROUND(SUM(
             c * (ln(CAST(COALESCE(tgt.tc, 0) + 1 AS DOUBLE)
                     / CAST(tot.tn + {_DSIR_B} AS DOUBLE))
                  - ln(CAST(raw.r + 1 AS DOUBLE)
                       / CAST(tot.rn + {_DSIR_B} AS DOUBLE)))
             ORDER BY dc.b), 6) AS log_weight
    FROM dc JOIN raw USING (b) LEFT JOIN tgt USING (b) CROSS JOIN tot
    GROUP BY dc.doc_id
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, "Data Selection for Language
    Modeling via Importance Resampling"): per-document log importance
    weight log p_target(doc)/p_raw(doc) under hashed-bigram bag-of-ngrams
    distributions — the score a pretraining pipeline Gumbel-top-k samples
    against to tilt a raw corpus toward a target domain (here: source
    'src0' stands in for the target).

    Word bigrams hash into _DSIR_B=1024 buckets via the cross-engine
    md5-tail (bucket ids must agree with the oracle — this is the
    sampling.py md5-tail contract, not the internal-digest xxhash one);
    both distributions are Laplace-smoothed bucket histograms. Scale
    shape: one (doc_id, bucket) count shuffle; the raw/target histograms
    derive from that SAME relation (persisted — no re-tokenize per
    reference) and are ≤1024-row broadcasts; the per-doc
    Σ c·(ln t̂_b − ln r̂_b) is the
    fixed-order bucket fold (kl_source_drift's contract), so five ln/mul
    float ops land bit-identically on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    from .text import _md5_lower64

    t = F.col("t")
    bigram = F.transform(
        F.sequence(F.lit(0), F.size(t) - 2),
        lambda i: F.concat(
            F.element_at(t, i + 1), F.lit("_"), F.element_at(t, i + 2)
        ),
    )
    bk = (
        docs.select("doc_id", "source", tokens("text").alias("t"))
        .where(F.size(t) >= 2)
        .select("doc_id", "source", F.explode(bigram).alias("bg"))
        .select(
            "doc_id",
            "source",
            (_md5_lower64(F.concat(F.lit("bg_"), F.col("bg"))) % _DSIR_B).alias(
                "b"
            ),
        )
    )
    dc = persist_tracked(
        bk.groupBy("doc_id", "source", "b").agg(F.count("*").alias("c"))
    )  # feeds the per-doc join AND both histograms — ≤B rows per doc
    raw = dc.groupBy("b").agg(F.sum("c").alias("r"))
    tgt = (
        dc.where(F.col("source") == _DSIR_TARGET)
        .groupBy("b")
        .agg(F.sum("c").alias("tc"))
    )
    dists = raw.join(tgt, "b", "left").withColumn(
        "tc", F.coalesce("tc", F.lit(0))
    )
    tot = dists.agg(F.sum("r").alias("rn"), F.sum("tc").alias("tn"))
    g = dc.join(F.broadcast(dists), "b").crossJoin(F.broadcast(tot))
    lw = F.aggregate(
        F.array_sort(F.collect_list(F.struct("b", "c", "r", "tc", "rn", "tn"))),
        F.lit(0.0),
        lambda acc, x: acc
        + x["c"].cast("double")
        * (
            F.log(
                (x["tc"] + 1).cast("double")
                / (x["tn"] + _DSIR_B).cast("double")
            )
            - F.log(
                (x["r"] + 1).cast("double")
                / (x["rn"] + _DSIR_B).cast("double")
            )
        ),
    )
    return g.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_bigrams"),
        F.round(lw, 6).alias("log_weight"),
    )


_URL_BLOCKLIST = ("tracker.adnet.example",)  # the RefinedWeb-style denylist


@query(
    "url_domain_stats",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 = 0
                     THEN ' https://site' || CAST(doc_id % 7 AS VARCHAR)
                          || '.example/p/' || CAST(doc_id % 13 AS VARCHAR)
                     ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                     THEN ' http://tracker.adnet.example/x?id='
                          || CAST(doc_id AS VARCHAR)
                     ELSE '' END AS text
      FROM documents
    ),
    hosts AS (
      SELECT doc_id, unnest(regexp_extract_all(text,
               'https?://([^/\\s?]+)', 1)) AS domain
      FROM aug
    ),
    per AS (
      SELECT domain, COUNT(*) AS n_urls,
             COUNT(DISTINCT doc_id) AS n_docs
      FROM hosts GROUP BY domain
    )
    SELECT domain,
           CAST(n_urls AS BIGINT) AS n_urls,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(CASE WHEN domain IN ('tracker.adnet.example')
                     THEN 1 ELSE 0 END AS BIGINT) AS blocked,
           ROUND(CAST(n_urls AS DOUBLE)
                 / (SELECT SUM(n_urls) FROM per), 6) AS url_share
    FROM per
    """,
)
def url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL/DOMAIN FILTERING REPORT — the curation stage C4 and
    RefinedWeb (Penedo et al. 2023) run before any text heuristic:
    extract every URL, aggregate by registered host, and flag
    blocklisted domains (adult/fraud/tracker denylists) whose documents
    the pipeline drops. Per domain: url count, distinct-document reach,
    a blocklist flag, and the corpus url share a mixture audit reads.

    The synthetic corpus carries no URLs, so two deterministic
    augmentation slices give the extraction real signal at every sf
    (the gopher r6 lesson; the oracle replays the same augmentation):
    doc_id%3 docs gain a https://siteN.example deep link (7 domains ×
    13 paths), doc_id%5 docs a blocklisted tracker URL. Extraction is
    one JVM-side regexp_extract_all — identical pattern semantics on
    both engines — so the report is exact regardless of what the base
    text contains.

    Scale: explode → one groupBy(domain) exchange with map-side partial
    agg (domain cardinality ≪ corpus) + a single-row total; no joins,
    no UDFs. At 100 TB this is the cheapest shape in the pipeline —
    strings shuffle only as (domain) keys, never full documents."""
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                d % 3 == 0,
                F.concat(
                    F.lit(" https://site"),
                    (d % 7).cast("string"),
                    F.lit(".example/p/"),
                    (d % 13).cast("string"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                d % 5 == 0,
                F.concat(
                    F.lit(" http://tracker.adnet.example/x?id="),
                    d.cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    hosts = aug.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"https?://([^/\s?]+)"), 1
            )
        ).alias("domain"),
    )
    per = hosts.groupBy("domain").agg(
        F.count("*").cast("bigint").alias("n_urls"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    )
    tot = per.agg(F.sum("n_urls").alias("total"))
    return per.crossJoin(F.broadcast(tot)).select(
        "domain",
        "n_urls",
        "n_docs",
        F.col("domain")
        .isin(*_URL_BLOCKLIST)
        .cast("bigint")
        .alias("blocked"),
        F.round(F.col("n_urls").cast("double") / F.col("total"), 6).alias(
            "url_share"
        ),
    )
