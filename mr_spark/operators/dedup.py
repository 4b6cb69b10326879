"""Deduplication operators over the ``documents`` table — north-star
extensions for a training-data pipeline (SURVEY.md §7 M4).

* exact dedup        — hash-groupBy on normalized text (oracle-checked)
* n-gram Jaccard     — EXACT word-trigram Jaccard pairs (oracle-checked)
* MinHash + LSH      — signature → bands → bucket-join → exact verify
                       (approximate by construction → rows-only check)
* SimHash            — 16-bit fingerprint, hamming-≤2 pairs via half-band
                       buckets (engine-hash-dependent → rows-only check)

Scale design: every step is a hash-shuffle on a bounded key (shingle,
band signature, simhash half) — no cross join anywhere. The exact-pair
verification joins are gated by candidate generation, so the quadratic
blow-up is bounded by bucket sizes (salt/split hot buckets at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import normalized_text, tokens
from ..session import persist_tracked
from ..sources import load_table
from . import query

JACCARD_THRESHOLD = 0.5
_PPJOIN_DOC_THRESHOLD = 100_000  # docs; below this the naive join is faster
# Duplication-aware second gate: the naive inverted-index join costs
# Σ_g df(g)² pair instances while the corpus is only Σ_g df(g) shingle
# rows, so the BLOWUP ratio Σdf²/Σdf is exactly the join's amplification
# factor. Natural corpora sit low (measured 2.1 at sf0.01, 10.7 at
# sf0.1); an 8×-duplicated corpus measured 85.8 — and there PPJoin ran
# 3.2× faster (33.7 s vs 107.8 s). Above this ratio the prefix filter
# wins regardless of document count.
_PPJOIN_BLOWUP = 32


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g'))) AS fp,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS keep_doc_id
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-text fingerprint: one hash shuffle on the
    md5 — at 100 TB shuffle 16-byte digests, never the text itself."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(normalized_text("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keep_doc_id"))
    )


def word_ngrams(col: str = "text", k: int = 3, *, distinct: bool = True) -> F.Column:
    """array<string> of word k-grams (the shingle unit for the
    exact-Jaccard, MinHash, and winnowing paths). ``distinct=False``
    preserves the positional sequence (needed for rolling windows).

    Built with k aligned slices + zip_with rather than
    transform-with-element_at: a lambda that closes over the token array
    re-inlines the tokenizer PER ELEMENT after projection collapse
    (measured 10× slower on the shingle build at sf0.1)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    ws = tokens(col)
    n = F.size(ws)
    length = F.greatest(n - (k - 1), F.lit(0))
    grams = F.slice(ws, 1, length)
    for i in range(1, k):
        grams = F.zip_with(
            grams,
            F.slice(ws, i + 1, length),
            lambda acc, nxt: F.concat(acc, F.lit(" "), nxt),
        )
    if distinct:
        grams = F.array_distinct(grams)
    return F.when(n >= k, grams).otherwise(F.array().cast("array<string>"))


def _trigrams(col: str = "text", *, distinct: bool = True) -> F.Column:
    """Word 3-grams — the default shingle for the dedup family."""
    return word_ngrams(col, 3, distinct=distinct)


# DuckDB twin of _trigrams as a FROM-able fragment: (doc_id, g) distinct
_TRIGRAMS_SQL = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), x -> x <> '') AS ws
      FROM documents
    ), tri AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
      FROM toks, unnest(range(1, len(ws) - 1)) AS t(i)
      WHERE len(ws) >= 3
    )
"""


@query(
    "ngram_jaccard_pairs",
    oracle=_TRIGRAMS_SQL
    + """
    , sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tri GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM tri a JOIN tri b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) AS jaccard
    FROM inter
    JOIN sizes sa ON inter.doc_a = sa.doc_id
    JOIN sizes sb ON inter.doc_b = sb.doc_id
    WHERE CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) >= 0.5
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT near-dup pairs: word-trigram Jaccard ≥ 0.5.

    Two-signal strategy choice (both paths produce IDENTICAL results —
    pinned by test and by the oracle): PPJoin prefix filtering engages
    when EITHER the corpus exceeds _PPJOIN_DOC_THRESHOLD docs OR the
    measured shingle blowup Σdf²/Σdf exceeds _PPJOIN_BLOWUP — the second
    signal catches duplication-dense corpora (exactly what a dedup
    operator gets fed) where the naive join's df² pair instances explode
    long before the document count does; otherwise the naive inverted-
    index join wins (one codegen'd join + count, no window pass). PPJoin:
    only each doc's |d| − ⌈t·|d|⌉ + 1 globally-rarest shingles enter the
    self-join. The df stats come from one cheap agg over the persisted
    hashed-shingle relation both paths consume anyway.

    Shingles are 64-bit hashes before any shuffle (collision odds ~n²/2^64)."""
    docs = load_table(spark, sf_dir, "documents")
    tri_arr = persist_tracked(_tri_arr(docs))
    tri = tri_arr.select("doc_id", F.explode("tset").alias("h"))
    st = (
        tri.groupBy("h")
        .agg(F.count("*").alias("df"))
        .agg(
            F.sum("df").alias("s1"),
            F.sum(F.col("df") * F.col("df")).alias("s2"),
        )
        .collect()[0]
    )
    n_docs = tri_arr.count()
    blowup = (st["s2"] / st["s1"]) if st["s1"] else 0.0
    if n_docs > _PPJOIN_DOC_THRESHOLD or blowup > _PPJOIN_BLOWUP:
        return _jaccard_ppjoin(tri_arr)
    return _jaccard_naive(tri_arr)


def _tri_arr(docs: DataFrame) -> DataFrame:
    """(doc_id, array<bigint> hashed distinct trigrams) — the shared input
    both strategies (and the dispatcher's df stats) consume; persist it at
    the call site: it feeds several plan subtrees and the regex tokenize +
    trigram explode is the most expensive projection in the pipeline
    (measured ~2 s of pure recompute per extra consumer at sf0.1)."""
    return docs.select(
        "doc_id",
        F.transform(_trigrams("text"), lambda g: F.xxhash64(g)).alias("tset"),
    )


def _jaccard_naive(tri_arr: DataFrame) -> DataFrame:
    """Inverted shingle index → self-join → count/union. Optimal while the
    per-shingle df² pair-instance count stays small."""
    tri = tri_arr.select("doc_id", F.explode("tset").alias("g"))
    sizes = tri.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = tri.alias("a")
    b = tri.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common").cast("double")
                / (F.col("sa.sz") + F.col("sb.sz") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def _jaccard_ppjoin(tri_arr: DataFrame) -> DataFrame:
    """PPJoin (Chaudhuri/Xiao et al.): prefix-filtered candidates +
    array_intersect verification — the corpus-scale path."""
    tri = tri_arr.select("doc_id", F.explode("tset").alias("h"))
    df = tri.groupBy("h").agg(F.count("*").alias("df"))
    sizes = tri.groupBy("doc_id").agg(F.count("*").alias("sz"))
    w = Window.partitionBy("doc_id").orderBy("df", "h")
    prefix_len = F.col("sz") - F.ceil(F.col("sz") * F.lit(JACCARD_THRESHOLD)) + 1
    # NO broadcast hints here: df is vocabulary-sized (one row per distinct
    # shingle hash — billions at 100 TB) and sizes is corpus-sized (one row
    # per doc). A mandatory BroadcastExchange on either is an executor-OOM
    # scale-killer in exactly the regime this path is selected for. Plain
    # equi-joins let AQE promote to broadcast when a side is measured small
    # (same pattern as the substring cap's hot-set join below).
    prefix = (
        tri.join(df, "h")
        .join(sizes, "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= prefix_len)
        .select("doc_id", "h")
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    candidates = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ta = tri_arr.select(F.col("doc_id").alias("doc_a"), F.col("tset").alias("ta"))
    tb = tri_arr.select(F.col("doc_id").alias("doc_b"), F.col("tset").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.size("ta") + F.size("tb") - inter
    return (
        candidates.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (inter.cast("double") / union).alias("jaccard"),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


# ---- MinHash + LSH ---------------------------------------------------------

N_HASHES = 64
N_BANDS = 16  # rows per band = 4
_MERSENNE = (1 << 31) - 1
# deterministic permutation parameters (any fixed odd-ish constants work;
# generated once from a fixed LCG so the signature is reproducible)


def _perm_params() -> list[tuple[int, int]]:
    params, x = [], 88172645463325252
    for _ in range(N_HASHES):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (x % (_MERSENNE - 1)) + 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = x % _MERSENNE
        params.append((a, b))
    return params


def _build_minhash_oracle() -> str:
    """DuckDB twin of the FULL MinHash+LSH pipeline, generated: identical
    integer arithmetic end to end (cross-engine md5-tail shingle hash →
    affine permutations mod Mersenne → per-band signature tuples →
    candidate join → exact-Jaccard verification). Even the approximate
    operator is therefore oracle-checked exactly — candidates and verified
    pairs match, not just row counts."""
    p = _MERSENNE
    rows_per_band = N_HASHES // N_BANDS
    sig_cols = ",\n             ".join(
        f"MIN(({a} * h + {b}) % {p}) AS s{i}"
        for i, (a, b) in enumerate(_perm_params())
    )
    band_selects = "\n      UNION ALL ".join(
        "SELECT doc_id, {bi} AS band, {ks} FROM sig".format(
            bi=bi,
            ks=", ".join(
                f"s{bi * rows_per_band + j} AS k{j}" for j in range(rows_per_band)
            ),
        )
        for bi in range(N_BANDS)
    )
    band_eq = " AND ".join(f"l.k{j} = r.k{j}" for j in range(rows_per_band))
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '[^\\p{{L}}]+'), x -> x <> '') AS ws
      FROM documents
    ), tri AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
      FROM toks, unnest(range(1, len(ws) - 1)) AS t(i)
      WHERE len(ws) >= 3
    ), hm AS (
      SELECT doc_id,
             CAST(md5_number_lower(g) % 9223372036854775808 AS BIGINT) % {p} AS h
      FROM tri
    ), sig AS (
      SELECT doc_id,
             {sig_cols}
      FROM hm GROUP BY doc_id
    ), bands AS (
      {band_selects}
    ), cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM bands l JOIN bands r
        ON l.band = r.band AND {band_eq} AND l.doc_id < r.doc_id
    ), sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tri GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS nc
      FROM tri a JOIN tri b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b,
           CAST(nc AS DOUBLE) / (sa.sz + sb.sz - nc) AS jaccard
    FROM cand c
    JOIN inter ON inter.ia = c.doc_a AND inter.ib = c.doc_b
    JOIN sizes sa ON c.doc_a = sa.doc_id
    JOIN sizes sb ON c.doc_b = sb.doc_id
    WHERE CAST(nc AS DOUBLE) / (sa.sz + sb.sz - nc) >= {JACCARD_THRESHOLD}
    """


@query("minhash_lsh_pairs", oracle=_build_minhash_oracle())
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + LSH(16 bands × 4) near-dup candidates, verified with
    exact trigram Jaccard ≥ 0.5. This is the 100 TB path: signature build is
    one agg per doc; banding shuffles 16 small keys per doc; only same-bucket
    pairs are ever verified (no quadratic step).

    shingle → cross-engine md5-tail hash (text._md5_lower64) →
    h_i = (a_i·x + b_i) mod M (Mersenne 2^31-1) → sig = min per i →
    band = TUPLE of 4 consecutive sig entries (not an engine hash of them),
    so the entire approximate pipeline is integer arithmetic both engines
    replay identically — see _build_minhash_oracle.
    Verification computes Jaccard ONLY for candidate pairs via
    array_intersect of the per-doc shingle-hash sets — never the full
    pairwise join.
    """
    from .text import _md5_lower64

    docs = load_table(spark, sf_dir, "documents")
    # explode FIRST, hash as a scalar expression: the shingle hash stays in
    # whole-stage codegen (an array-lambda hash runs interpreted per element
    # and measured ~5× slower on this stage); the per-doc hash arrays needed
    # for candidate verification are rebuilt with one small collect_list agg
    tri = persist_tracked(
        docs.select("doc_id", F.explode(_trigrams("text")).alias("g")).select(
            "doc_id", _md5_lower64(F.col("g")).alias("hg")
        )
    )  # feeds the signature agg AND (via tri_arr) both verify sides
    tri_arr = tri.groupBy("doc_id").agg(F.collect_list("hg").alias("tset"))
    hashed = tri.select("doc_id", (F.col("hg") % _MERSENNE).alias("h"))
    sig = hashed.groupBy("doc_id").agg(
        *[
            F.min(F.pmod(F.col("h") * F.lit(a) + F.lit(b), F.lit(_MERSENNE))).alias(f"s{i}")
            for i, (a, b) in enumerate(_perm_params())
        ]
    )
    rows_per_band = N_HASHES // N_BANDS
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        *[
                            F.col(f"s{bi * rows_per_band + j}").alias(f"k{j}")
                            for j in range(rows_per_band)
                        ],
                    )
                    for bi in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.*")
    l = bands.alias("l")
    r = bands.alias("r")
    band_cond = (F.col("l.band") == F.col("r.band")) & (
        F.col("l.doc_id") < F.col("r.doc_id")
    )
    for j in range(rows_per_band):
        band_cond = band_cond & (F.col(f"l.k{j}") == F.col(f"r.k{j}"))
    candidates = (
        l.join(r, band_cond)
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact verification ONLY for candidate pairs: two hash joins to pull
    # each side's shingle-hash set, then array_intersect — candidate-
    # bounded, never quadratic
    ta = tri_arr.select(F.col("doc_id").alias("doc_a"), F.col("tset").alias("ta"))
    tb = tri_arr.select(F.col("doc_id").alias("doc_b"), F.col("tset").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.size("ta") + F.size("tb") - inter
    return (
        candidates.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (inter.cast("double") / union).alias("jaccard"),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


@query(
    "simhash_buckets",
    oracle="""
    WITH tok AS (
      SELECT doc_id, word AS tok, COUNT(*) AS w FROM (
        SELECT doc_id, unnest(regexp_split_to_array(text, '[^\\p{L}]+')) AS word
        FROM documents
      ) WHERE word <> '' GROUP BY doc_id, word
    ),
    h AS (
      SELECT doc_id,
             CAST(md5_number_lower(tok) % 9223372036854775808 AS BIGINT) AS mh, w
      FROM tok
    ),
    votes AS (
      SELECT doc_id,
             SUM(CASE WHEN (mh >> 0) & 1 = 1 THEN w ELSE -w END) AS v0,
             SUM(CASE WHEN (mh >> 1) & 1 = 1 THEN w ELSE -w END) AS v1,
             SUM(CASE WHEN (mh >> 2) & 1 = 1 THEN w ELSE -w END) AS v2,
             SUM(CASE WHEN (mh >> 3) & 1 = 1 THEN w ELSE -w END) AS v3,
             SUM(CASE WHEN (mh >> 4) & 1 = 1 THEN w ELSE -w END) AS v4,
             SUM(CASE WHEN (mh >> 5) & 1 = 1 THEN w ELSE -w END) AS v5,
             SUM(CASE WHEN (mh >> 6) & 1 = 1 THEN w ELSE -w END) AS v6,
             SUM(CASE WHEN (mh >> 7) & 1 = 1 THEN w ELSE -w END) AS v7,
             SUM(CASE WHEN (mh >> 8) & 1 = 1 THEN w ELSE -w END) AS v8,
             SUM(CASE WHEN (mh >> 9) & 1 = 1 THEN w ELSE -w END) AS v9,
             SUM(CASE WHEN (mh >> 10) & 1 = 1 THEN w ELSE -w END) AS v10,
             SUM(CASE WHEN (mh >> 11) & 1 = 1 THEN w ELSE -w END) AS v11,
             SUM(CASE WHEN (mh >> 12) & 1 = 1 THEN w ELSE -w END) AS v12,
             SUM(CASE WHEN (mh >> 13) & 1 = 1 THEN w ELSE -w END) AS v13,
             SUM(CASE WHEN (mh >> 14) & 1 = 1 THEN w ELSE -w END) AS v14,
             SUM(CASE WHEN (mh >> 15) & 1 = 1 THEN w ELSE -w END) AS v15
      FROM h GROUP BY doc_id
    ),
    sim AS (SELECT doc_id, CAST(CASE WHEN v0 > 0 THEN 1 ELSE 0 END + CASE WHEN v1 > 0 THEN 2 ELSE 0 END + CASE WHEN v2 > 0 THEN 4 ELSE 0 END + CASE WHEN v3 > 0 THEN 8 ELSE 0 END + CASE WHEN v4 > 0 THEN 16 ELSE 0 END + CASE WHEN v5 > 0 THEN 32 ELSE 0 END + CASE WHEN v6 > 0 THEN 64 ELSE 0 END + CASE WHEN v7 > 0 THEN 128 ELSE 0 END + CASE WHEN v8 > 0 THEN 256 ELSE 0 END + CASE WHEN v9 > 0 THEN 512 ELSE 0 END + CASE WHEN v10 > 0 THEN 1024 ELSE 0 END + CASE WHEN v11 > 0 THEN 2048 ELSE 0 END + CASE WHEN v12 > 0 THEN 4096 ELSE 0 END + CASE WHEN v13 > 0 THEN 8192 ELSE 0 END + CASE WHEN v14 > 0 THEN 16384 ELSE 0 END + CASE WHEN v15 > 0 THEN 32768 ELSE 0 END AS INT) AS simhash FROM votes),
    halves AS (
      SELECT doc_id, simhash, 0 AS half, simhash % 256 AS key FROM sim
      UNION ALL
      SELECT doc_id, simhash, 1, simhash // 256 FROM sim
    )
    SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
           CAST(bit_count(xor(l.simhash, r.simhash)) AS INT) AS hamming
    FROM halves l JOIN halves r
      ON l.half = r.half AND l.key = r.key AND l.doc_id < r.doc_id
    WHERE bit_count(xor(l.simhash, r.simhash)) <= 2
    """,
)
def simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document + hamming-≤2 near-dup pairs found via the
    two 8-bit half buckets (a pair within hamming 2 of a 16-bit code shares
    at least one exact half — standard pigeonhole banding).

    Weighted bit votes from token frequencies; the token hash is the
    cross-engine md5-tail (see text._md5_lower64), so the fingerprints —
    and therefore the pair set — are oracle-checked exactly."""
    docs = load_table(spark, sf_dir, "documents")
    from .text import _md5_lower64

    # one scalar md5 per token OCCURRENCE in a codegen projection (the
    # oracle's per-distinct-token count× weighting sums to the same integer
    # votes), then a single partial-aggregated shuffle on doc_id — the
    # previous shape hashed the token inside each of the 16 aggregates
    occ = docs.select("doc_id", F.explode(tokens("text")).alias("tok")).select(
        "doc_id", _md5_lower64(F.col("tok")).alias("mh")
    )
    votes = occ.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("mh"), i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
            ).alias(f"v{i}")
            for i in range(16)
        ]
    )
    sim = votes.select(
        "doc_id",
        sum(
            [F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0)) for i in range(16)],
            F.lit(0),
        ).cast("int").alias("simhash"),
    )
    halves = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("half"), (F.col("simhash") % 256).alias("key")),
                F.struct(F.lit(1).alias("half"), (F.col("simhash") / 256).cast("int").alias("key")),
            )
        ).alias("hb"),
    ).select("doc_id", "simhash", "hb.half", "hb.key")
    l = halves.alias("l")
    r = halves.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.half") == F.col("r.half"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).cast("int").alias("hamming"),
        )
        .distinct()
    )
    return pairs.where(F.col("hamming") <= 2)


@query(
    "dedup_keep_best",
    oracle="""
    WITH fps AS (
      SELECT doc_id, n_chars,
             md5(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g'))) AS fp
      FROM documents
    ), ranked AS (
      SELECT doc_id, fp, n_chars,
             ROW_NUMBER() OVER (PARTITION BY fp
                                ORDER BY n_chars DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY fp) AS n_copies
      FROM fps
    )
    SELECT doc_id AS keep_doc_id, fp, CAST(n_copies AS BIGINT) AS n_copies
    FROM ranked WHERE rn = 1
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection: within each exact-duplicate cluster
    (normalized-text md5), keep the BEST copy — longest text, doc_id
    tie-break — rather than dedup_exact's arbitrary min-id. This is the
    curation rule real pipelines want when near-identical copies differ in
    truncation or boilerplate. One window over the fingerprint shuffle;
    at 100 TB the 16-byte digest is the only wide shuffle key."""
    docs = load_table(spark, sf_dir, "documents")
    fps = docs.select(
        "doc_id", "n_chars", F.md5(normalized_text("text")).alias("fp")
    )
    w = Window.partitionBy("fp").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    wall = Window.partitionBy("fp")
    return (
        fps.withColumn("rn", F.row_number().over(w))
        .withColumn("n_copies", F.count("*").over(wall))
        .where(F.col("rn") == 1)
        .select(
            F.col("doc_id").alias("keep_doc_id"),
            "fp",
            F.col("n_copies").cast("bigint").alias("n_copies"),
        )
    )


_SUBSTR_L = 40  # window length, chars (Lee et al. use 50 BPE tokens)
# Hot-shingle cap: a window (after per-doc dedup) present in more than this
# many DOCUMENTS is boilerplate (license header, template chrome) and is
# dropped before the self-join — df docs would otherwise emit df²/2 pair
# instances through ONE hash key, the classic skewed-shuffle job-killer at
# corpus scale. Lee et al. 2022 likewise exclude such cluster-busting
# substrings. The cap is a property of the window TEXT (its doc frequency),
# not of either engine's hash, so it is mirrored exactly in the oracle.
_SUBSTR_DF_CAP = 256


@query(
    "exact_substring_pairs",
    oracle=f"""
    WITH wins AS (
      SELECT DISTINCT doc_id,
             CAST(md5_number_lower(substr(text, i, {_SUBSTR_L}))
                  % 9223372036854775808 AS BIGINT) AS h
      FROM documents, unnest(range(1, length(text) - {_SUBSTR_L - 2})) AS t(i)
      WHERE length(text) >= {_SUBSTR_L}
    ),
    keep AS (
      SELECT h FROM wins GROUP BY h HAVING COUNT(*) <= {_SUBSTR_DF_CAP}
    ),
    w2 AS (SELECT wins.doc_id, wins.h FROM wins JOIN keep USING (h))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM w2 a JOIN w2 b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
)
def exact_substring_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup criterion (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): document pairs sharing
    at least one VERBATIM 40-char substring, with the count of shared
    windows. Complements the set-overlap (Jaccard) and sampled-fingerprint
    (winnowing) criteria — verbatim overlap catches quotation/boilerplate
    reuse that shingle sets dilute.

    Implementation: every stride-1 character window hashes to a 64-bit
    digest, deduped per doc BEFORE the shuffle, then the same inverted
    hash-index self-join as the Jaccard path. The digest is an INTERNAL
    join key — only the resulting (doc_a, doc_b) pairs are output — so
    each engine uses its own fast native hash (Spark xxhash64, DuckDB
    md5-tail) and the pair sets still agree exactly up to ~n²/2⁶⁴
    collision odds; the cross-engine-identical md5-tail construction is
    only needed where hash VALUES are output (winnowing, sampling). The
    md5 chain here cost 4× the whole join (12 s → 3 s at sf0.1).

    Hot-shingle cap (always on, oracle-mirrored): windows whose doc
    frequency exceeds _SUBSTR_DF_CAP are dropped before the self-join —
    the df agg is a safe partial-aggregated count, the hot set is removed
    with a left_anti join (no broadcast hint: AQE broadcasts it when
    small, shuffles when boilerplate is genuinely plentiful), and no hash
    key can emit more than _SUBSTR_DF_CAP²/2 pair instances. At 100 TB
    only 8-byte digests shuffle, never text. Cap behavior unit-tested on
    a constructed boilerplate corpus in tests/test_substring_cap.py."""
    docs = load_table(spark, sf_dir, "documents")
    return _substring_pairs(docs)


def _win_digests(docs: DataFrame) -> DataFrame:
    """(doc_id, h): per-doc DISTINCT 40-char-window xxhash64 digests — the
    shared base relation of the substring family (exact_substring_pairs,
    ngram_novelty); its SQL twin is the wins CTE both oracles embed.
    Persist at the call site: the stride-1 window explode is the most
    expensive projection in these pipelines."""
    return _win_positions(docs).select("doc_id", "h").distinct()


def _win_positions(docs: DataFrame) -> DataFrame:
    """(doc_id, i, h): every stride-1 window's 1-based start position and
    xxhash64 digest. Explodes the POSITION sequence and hashes
    ``substr(text, i, L)`` per row, rather than materializing the array
    of window strings first (``transform(sequence, substr)`` allocates an
    L× copy of the text per document before the generator runs; hashing
    after the explode allocates one window at a time — measured ~20%
    faster on the sf0.1 corpus, byte-identical output)."""
    return (
        docs.where(F.length("text") >= _SUBSTR_L)
        .select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(F.lit(1), F.length("text") - (_SUBSTR_L - 1))
            ).alias("i"),
        )
        .select(
            "doc_id",
            "i",
            F.xxhash64(F.col("text").substr(F.col("i"), F.lit(_SUBSTR_L))).alias("h"),
        )
    )


def _substring_pairs(docs: DataFrame) -> DataFrame:
    """Windows → per-doc distinct digests → df cap → inverted-index
    self-join. Split out so tests can drive it on constructed corpora.

    The df cap is an aggregative window, not a df-agg + anti-join back
    (guide §2.4, same rewrite as ngram_novelty's df-gate): ``wins`` holds
    one row per (doc, digest), so the digest's window COUNT IS its doc
    frequency, and ``count ≤ cap`` keeps exactly the rows the left_anti
    against the hot set kept. The capped relation is persisted already
    h-partitioned, so BOTH self-join sides read it with no further
    exchange."""
    wins = _win_digests(docs)
    wh = Window.partitionBy("h")
    wins = persist_tracked(
        wins.withColumn("__df", F.count("*").over(wh))
        .where(F.col("__df") <= _SUBSTR_DF_CAP)
        .drop("__df")
    )  # feeds both self-join sides
    a, b = wins.alias("a"), wins.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )


# Shared windows CTE for the per-doc substring family (novelty / spans):
# per-doc DISTINCT 40-char window digests, md5-tail hashed (DuckDB side).
_WINS_SQL = f"""
    wins AS (
      SELECT DISTINCT doc_id,
             CAST(md5_number_lower(substr(text, i, {_SUBSTR_L}))
                  % 9223372036854775808 AS BIGINT) AS h
      FROM documents, unnest(range(1, length(text) - {_SUBSTR_L - 2})) AS t(i)
      WHERE length(text) >= {_SUBSTR_L}
    )"""


@query(
    "ngram_novelty",
    oracle=f"""
    WITH {_WINS_SQL},
    df AS (SELECT h, COUNT(*) AS df FROM wins GROUP BY h)
    SELECT w.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_windows,
           ROUND(1.0 - CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END)
                            AS DOUBLE) / COUNT(*), 6) AS novelty
    FROM wins w JOIN df ON w.h = df.h
    GROUP BY w.doc_id
    """,
)
def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the share of a doc's distinct 40-char windows
    that appear in NO other document (df = 1) — the memorization/content-
    reuse score a curation pipeline thresholds on (low novelty = mostly
    boilerplate or copies; Lee et al. 2022 motivate exactly this metric).

    Unlike exact_substring_pairs this is LINEAR, never pair-emitting: a
    window is duplicated iff ≥2 DISTINCT docs carry its digest, and since
    ``wins`` holds one row per (doc, digest), that is exactly
    ``min(doc_id) ≠ max(doc_id)`` over the digest's partition — one
    aggregative window function, no df relation, no join back, and the
    windows relation has a single consumer so nothing needs persisting
    (guide §2.4: the df-agg + self-join shape paid two extra exchanges
    plus a cache materialization for the same answer). Hot boilerplate
    windows cost one partition's min/max — no df² blow-up. Digests are
    engine-internal (Spark xxhash64 / DuckDB md5-tail); duplication is a
    property of the window TEXT, identical on both."""
    docs = load_table(spark, sf_dir, "documents")
    wins = _win_digests(docs)
    wh = Window.partitionBy("h")
    dup = F.when(
        F.min("doc_id").over(wh) != F.max("doc_id").over(wh), 1
    ).otherwise(0)
    return (
        wins.select("doc_id", dup.alias("is_dup"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_windows"),
            F.sum("is_dup").cast("bigint").alias("n_dup_windows"),
            F.round(
                F.lit(1.0) - F.sum("is_dup").cast("double") / F.count("*"), 6
            ).alias("novelty"),
        )
    )


@query(
    "dup_span_stats",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, i,
             CAST(md5_number_lower(substr(text, i, {_SUBSTR_L}))
                  % 9223372036854775808 AS BIGINT) AS h
      FROM documents, unnest(range(1, length(text) - {_SUBSTR_L - 2})) AS t(i)
      WHERE length(text) >= {_SUBSTR_L}
    ),
    df AS (SELECT h, COUNT(DISTINCT doc_id) AS df FROM pos GROUP BY h),
    dup AS (
      SELECT pos.doc_id, pos.i FROM pos JOIN df ON pos.h = df.h
      WHERE df.df >= 2
    ),
    runs AS (
      SELECT doc_id, grp, COUNT(*) AS cnt FROM (
        SELECT doc_id,
               i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
        FROM dup
      ) GROUP BY doc_id, grp
    ),
    per_doc AS (
      SELECT doc_id, MAX(cnt) AS max_run, SUM(cnt) AS n_dup
      FROM runs GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.n_dup, 0) AS BIGINT) AS n_dup_positions,
           CAST(COALESCE(p.max_run + {_SUBSTR_L - 1}, 0) AS BIGINT)
             AS longest_dup_span_chars
    FROM (SELECT doc_id FROM documents WHERE length(text) >= {_SUBSTR_L}) d
    LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    """,
)
def dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lee et al. 2022's ACTUAL dedup unit, per document: maximal VERBATIM
    spans duplicated somewhere else in the corpus. A char position is
    'duplicated' when the 40-char window starting there occurs in ≥2
    documents; consecutive duplicated positions merge into spans
    (gaps-and-islands: position − row_number is constant within a run),
    and a run of L consecutive windows covers L+39 chars. Output per doc:
    duplicated-position count and the longest duplicated span in chars —
    the quantity Lee et al. threshold at 50 tokens to cut spans out.

    Scale shape: positions keep (doc_id, i, 8-byte digest) — text never
    shuffles; 'occurs in ≥2 docs' is ``min(doc_id) ≠ max(doc_id)`` over
    the digest's window partition (exactly COUNT(DISTINCT doc_id) ≥ 2,
    answered by an aggregative window instead of a distinct-agg + join
    back — guide §2.4: one h-exchange instead of three exchanges plus a
    persisted positions cache). Like ngram_novelty this is linear —
    never a pair join."""
    docs = load_table(spark, sf_dir, "documents")
    pos = _win_positions(docs)
    wh = Window.partitionBy("h")
    dup = (
        pos.withColumn("__mn", F.min("doc_id").over(wh))
        .withColumn("__mx", F.max("doc_id").over(wh))
        .where(F.col("__mn") != F.col("__mx"))
        .select("doc_id", "i")
    )
    w1 = Window.partitionBy("doc_id").orderBy("i")
    runs = (
        dup.withColumn("grp", F.col("i") - F.row_number().over(w1))
        .groupBy("doc_id", "grp")
        .agg(F.count("*").alias("cnt"))
    )
    per_doc = runs.groupBy("doc_id").agg(
        F.max("cnt").alias("max_run"), F.sum("cnt").alias("n_dup")
    )
    return (
        docs.where(F.length("text") >= _SUBSTR_L)
        .select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_dup"), F.lit(0))
            .cast("bigint")
            .alias("n_dup_positions"),
            F.coalesce(F.col("max_run") + (_SUBSTR_L - 1), F.lit(0))
            .cast("bigint")
            .alias("longest_dup_span_chars"),
        )
    )


@query(
    "dedup_spans",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, i,
             CAST(md5_number_lower(substr(text, i, {_SUBSTR_L}))
                  % 9223372036854775808 AS BIGINT) AS h
      FROM documents, unnest(range(1, length(text) - {_SUBSTR_L - 2})) AS t(i)
      WHERE length(text) >= {_SUBSTR_L}
    ),
    df AS (SELECT h, COUNT(DISTINCT doc_id) AS df FROM pos GROUP BY h),
    dup AS (
      SELECT pos.doc_id, pos.i FROM pos JOIN df ON pos.h = df.h
      WHERE df.df >= 2
    ),
    brk AS (
      SELECT doc_id, i,
             CASE WHEN LAG(i) OVER w IS NULL
                    OR i - LAG(i) OVER w > {_SUBSTR_L}
                  THEN 1 ELSE 0 END AS is_brk
      FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY i)
    ),
    isl AS (
      SELECT doc_id, MIN(i) AS s, MAX(i) + {_SUBSTR_L - 1} AS e
      FROM (
        SELECT doc_id, i,
               SUM(is_brk) OVER (PARTITION BY doc_id ORDER BY i) AS grp
        FROM brk
      ) GROUP BY doc_id, grp
    ),
    perdoc AS (
      SELECT doc_id, COUNT(*) AS n_spans, SUM(e - s + 1) AS removed
      FROM isl GROUP BY doc_id
    ),
    joined AS (
      SELECT d.doc_id, length(d.text) AS len,
             COALESCE(p.n_spans, 0) AS n_spans,
             COALESCE(p.removed, 0) AS removed
      FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_in,
           CAST(SUM(CASE WHEN len - removed > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_out,
           CAST(SUM(n_spans) AS BIGINT) AS spans_removed,
           CAST(SUM(removed) AS BIGINT) AS chars_removed,
           CAST(SUM(len - removed) AS BIGINT) AS chars_out_total
    FROM joined
    """,
)
def dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-SUBSTRING DEDUP TRANSFORM — the companion that actually
    CUTS the spans dup_span_stats reports (Lee et al. 2022's ExactSubstr
    unit): every character covered by a 40-char window occurring in ≥2
    documents is removed from EVERY document, and each document's
    cleaned text is stitched from the surviving fragments (the released
    deduplicate-text-datasets tool's remove-all-occurrences behavior —
    the paper notes it over-removes slightly vs keep-one; the keep-first
    variant of this family is dedup_lines). Documents cut to zero
    characters drop out.

    Overlapping windows merge into maximal removed regions with the
    gap-tolerant islands rule (a new region starts when the next
    duplicated position exceeds the previous one by more than the
    window length — adjacent and overlapping covers coalesce). The
    string surgery itself is a JVM-side fold: per doc the sorted region
    list feeds F.aggregate, accumulating the between-region substrings
    — no Python UDF touches the text.

    The result row BINDS transform to report: Spark computes
    chars_removed / chars_out_total THROUGH the actual surgery
    (len − length(cleaned), length(cleaned)), while the oracle
    recomputes both from the islands interval arithmetic
    (Σ(max−min+40)) — two independent strategies that must hash-equal,
    proving the stitched text removed exactly the covered chars.

    Scale: positions shuffle as (doc_id, i, 8-byte digest) — text never
    shuffles until the final doc_id-partitioned surgery join; 'occurs
    in ≥2 docs' is the same aggregative-window test as dup_span_stats
    (min ≠ max of doc_id over the digest partition ⟺ COUNT(DISTINCT
    doc_id) ≥ 2 — one h-exchange, no df join, no persisted positions);
    islands windows partition by doc_id. Same shape as dup_span_stats
    plus one doc_id exchange for the stitch."""
    docs = load_table(spark, sf_dir, "documents")
    pos = _win_positions(docs)
    wh = Window.partitionBy("h")
    dup = (
        pos.withColumn("__mn", F.min("doc_id").over(wh))
        .withColumn("__mx", F.max("doc_id").over(wh))
        .where(F.col("__mn") != F.col("__mx"))
        .select("doc_id", "i")
    )
    w1 = Window.partitionBy("doc_id").orderBy("i")
    lag = F.lag("i").over(w1)
    brk = dup.withColumn(
        "is_brk",
        F.when(lag.isNull() | (F.col("i") - lag > _SUBSTR_L), 1).otherwise(0),
    )
    isl = (
        brk.withColumn(
            "grp",
            F.sum("is_brk").over(
                w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("doc_id", "grp")
        .agg(
            F.min("i").alias("s"),
            (F.max("i") + (_SUBSTR_L - 1)).alias("e"),
        )
    )
    regions = isl.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("s", "e"))).alias("regions"),
        F.count("*").cast("bigint").alias("n_spans"),
    )
    # the surgery: slice out the text BETWEEN the sorted regions, then
    # the tail after the last one, and concatenate ONCE — all JVM-side.
    # (This replaced an F.aggregate fold whose acc = concat(acc, frag)
    # re-copied the accumulated string per region — O(n_regions × len)
    # bytes; the transform builds each fragment directly from the text
    # and concat_ws assembles them in one pass, O(len). Fragment j keeps
    # [prev.e+1, s_j) — identical to the fold because islands are
    # disjoint and ascending by construction, and the greatest(…, 0)
    # clamp matches the fold's.)
    regs = F.col("regions")

    def nxt(j):
        # 1-based slice start: char after the previous region (j is the
        # transform's 0-based index; greatest() keeps element_at's index
        # ≥ 1 on the never-taken branch)
        return F.when(j == 0, F.lit(1)).otherwise(
            F.element_at(regs, F.greatest(j, F.lit(1))).getField("e") + 1
        )

    frags = F.transform(
        regs,
        lambda r, j: F.col("text").substr(
            nxt(j), F.greatest(r.getField("s") - nxt(j), F.lit(0))
        ),
    )
    last_e = F.element_at(regs, -1).getField("e")
    tail = F.col("text").substr(
        last_e + 1, F.greatest(F.length("text") - last_e, F.lit(0))
    )
    stitched = (
        docs.join(regions, "doc_id", "left")
        .select(
            "doc_id",
            F.length("text").alias("len"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.when(F.col("regions").isNull(), F.col("text"))
            .otherwise(F.concat(F.concat_ws("", frags), tail))
            .alias("cleaned"),
        )
    )
    return stitched.agg(
        F.count("*").cast("bigint").alias("n_docs_in"),
        F.sum(F.when(F.length("cleaned") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_docs_out"),
        F.sum("n_spans").cast("bigint").alias("spans_removed"),
        F.sum(F.col("len") - F.length("cleaned"))
        .cast("bigint")
        .alias("chars_removed"),
        F.sum(F.length("cleaned")).cast("bigint").alias("chars_out_total"),
    )


_FUZZY_PREFIX = 16  # blocking-key width (chars of normalized text)
_FUZZY_LEN_BAND = 20  # max length difference worth comparing
_FUZZY_MAX_DIST = 20  # edit-distance match threshold


@query(
    "fuzzy_match_pairs",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '[^\\p{{L}}]+', ' ', 'g')) AS n
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, n, substr(n, 1, {_FUZZY_PREFIX}) AS k FROM norm
      UNION ALL
      SELECT doc_id, n, substr(n, length(n) - {_FUZZY_PREFIX - 1}, {_FUZZY_PREFIX})
      FROM norm WHERE length(n) >= {_FUZZY_PREFIX}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb
      FROM keyed a JOIN keyed b
        ON a.k = b.k AND a.doc_id < b.doc_id
           AND abs(length(a.n) - length(b.n)) <= {_FUZZY_LEN_BAND}
    )
    SELECT doc_a, doc_b, CAST(levenshtein(na, nb) AS BIGINT) AS edit_dist
    FROM cand WHERE levenshtein(na, nb) <= {_FUZZY_MAX_DIST}
    """,
)
def fuzzy_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-duplicate pairs with BLOCKING — the classic
    entity-resolution shape: candidates come from two cheap equi-join
    blocking passes (shared 16-char prefix OR shared 16-char suffix of the
    normalized text, plus a length band), and the quadratic-cost
    levenshtein runs only on blocked candidates, never all pairs. Two
    blocking keys raise recall (an edit in the first chars breaks the
    prefix block but not the suffix block); at 100 TB you'd add more
    passes (token-sorted key, minhash band) — each is another cheap
    equi-join feeding the same verify.

    Scale-critical detail: levenshtein runs on DISTINCT normalized texts,
    never on documents. Exact copies are grouped first (one md5-width
    shuffle); intra-group pairs are emitted as edit-distance 0 by
    construction, and verified inter-TEXT matches expand back to document
    pairs with two cheap joins. The first cut verified doc-level pairs
    directly and the 8× scale probe caught it at ratio 48 (every
    duplicated text made its whole block quadratic); with text-level
    verify the lev cost is bound by distinct-text pairs and the probe
    drops back under the replication factor — the only super-linear part
    left is the output itself, which is inherent. Complements the
    token-level (jaccard/minhash) and chunk-level (winnow/substring)
    dedup criteria with a character-level one."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", normalized_text("text").alias("n")
    )
    # five downstream branches (intra pairs, two blocking passes, two
    # expansion joins) read this relation — persist or each re-runs the
    # scan + normalize + groupBy
    groups = persist_tracked(
        docs.groupBy("n")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
    )

    ids = F.col("ids")
    combos = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size(ids) - 2),
            lambda i: F.transform(
                F.sequence(i + 1, F.size(ids) - 1),
                lambda j: F.struct(
                    F.element_at(ids, i + 1).alias("a"),
                    F.element_at(ids, j + 1).alias("b"),
                ),
            ),
        )
    )
    intra = (
        groups.where(F.size(ids) >= 2)
        .select(F.explode(combos).alias("p"))
        .select(
            F.col("p.a").alias("doc_a"),
            F.col("p.b").alias("doc_b"),
            F.lit(0).cast("bigint").alias("edit_dist"),
        )
    )

    texts = groups.select("n")
    prefix = texts.select("n", F.substring("n", 1, _FUZZY_PREFIX).alias("k"))
    suffix = texts.where(F.length("n") >= _FUZZY_PREFIX).select(
        "n",
        F.substring(
            "n", F.length("n") - (_FUZZY_PREFIX - 1), F.lit(_FUZZY_PREFIX)
        ).alias("k"),
    )
    keyed = prefix.unionAll(suffix)
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.n") < F.col("b.n"))
            & (
                F.abs(F.length(F.col("a.n")) - F.length(F.col("b.n")))
                <= _FUZZY_LEN_BAND
            ),
        )
        .select(F.col("a.n").alias("na"), F.col("b.n").alias("nb"))
        .distinct()
    )
    verified = cand.select(
        "na", "nb", F.levenshtein("na", "nb").cast("bigint").alias("edit_dist")
    ).where(F.col("edit_dist") <= _FUZZY_MAX_DIST)

    ga = groups.select(F.col("n").alias("na"), F.col("ids").alias("ids_a"))
    gb = groups.select(F.col("n").alias("nb"), F.col("ids").alias("ids_b"))
    inter = (
        verified.join(ga, "na")
        .join(gb, "nb")
        .select("edit_dist", F.explode("ids_a").alias("ia"), "ids_b")
        .select("edit_dist", "ia", F.explode("ids_b").alias("ib"))
        .select(
            F.least("ia", "ib").alias("doc_a"),
            F.greatest("ia", "ib").alias("doc_b"),
            "edit_dist",
        )
    )
    return intra.unionByName(inter.select("doc_a", "doc_b", "edit_dist"))


_SPLIT_SQL = """
    splits AS (
      SELECT doc_id,
             CASE WHEN CAST(md5_number_lower('doc_' || CAST(doc_id AS VARCHAR))
                       % 9223372036854775808 AS BIGINT) % 100 < 90
                  THEN 'train' ELSE 'val' END AS split
      FROM documents
    )"""


@query(
    "split_leakage_audit",
    oracle=_TRIGRAMS_SQL
    + """
    , sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tri GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM tri a JOIN tri b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON inter.doc_a = sa.doc_id
      JOIN sizes sb ON inter.doc_b = sb.doc_id
      WHERE CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) >= 0.5
    ),"""
    + _SPLIT_SQL
    + """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_neardup_pairs,
           CAST(SUM(CASE WHEN s1.split <> s2.split THEN 1 ELSE 0 END) AS BIGINT)
             AS n_cross_split,
           ROUND(CAST(SUM(CASE WHEN s1.split <> s2.split THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS leak_share
    FROM pairs
    JOIN splits s1 ON pairs.doc_a = s1.doc_id
    JOIN splits s2 ON pairs.doc_b = s2.doc_id
    """,
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val leakage audit: of the near-duplicate pairs (word-trigram
    Jaccard ≥ 0.5 — the ngram_jaccard_pairs criterion, including its
    size-gated PPJoin strategy), how many CROSS the content-hash 90/10
    split (train_val_split's md5-tail rule)? Cross-split near-dups are
    exactly the leakage that inflates validation metrics — the audit every
    corpus release should publish next to its split. One row:
    pair count, crossing count, leak share.

    Scale shape: the expensive part IS the pair pipeline, which is the
    (already scale-audited) jaccard path; the split column is a scalar
    hash expression joined to the pair endpoints by doc_id — two equi
    joins against a pairs relation that near-dup density, not corpus
    size, determines."""
    from .sampling import _bucket

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    key = F.concat(F.lit("doc_"), F.col("doc_id").cast("string"))
    splits = docs.select(
        "doc_id",
        F.when(_bucket(key) < 90, F.lit("train")).otherwise(F.lit("val")).alias(
            "split"
        ),
    )
    s1 = splits.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    s2 = splits.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    cross = F.when(F.col("split_a") != F.col("split_b"), 1).otherwise(0)
    return (
        pairs.join(s1, "doc_a")
        .join(s2, "doc_b")
        .agg(
            F.count("*").cast("bigint").alias("n_neardup_pairs"),
            F.sum(cross).cast("bigint").alias("n_cross_split"),
            F.round(F.sum(cross).cast("double") / F.count("*"), 6).alias(
                "leak_share"
            ),
        )
    )


def _boilerplate_corpus(docs: DataFrame) -> DataFrame:
    """The line-dedup demo corpus: documents plus two deterministic
    boilerplate augmentation slices (the synthetic corpus has no
    cross-document repeated lines, so the counters would be degenerate
    at every sf without them — the gopher r6 lesson): a newsletter
    footer as new single-line docs for doc_id%11==0, a two-line cookie
    banner for %11==1. Shared by line_dedup_stats (the report) and
    dedup_lines (the transform) so their corpora cannot drift; both
    oracles replay the same augmentation."""
    m = F.col("doc_id") % 11
    corpus = docs.select("doc_id", "text")
    corpus = corpus.unionAll(
        docs.where(m == 0).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.lit("subscribe to our newsletter today.").alias("text"),
        )
    )
    return corpus.unionAll(
        docs.where(m == 1).select(
            (F.col("doc_id") + 20_000_000).alias("doc_id"),
            F.lit(
                "we use cookies to improve your experience.\n"
                "accept all cookies."
            ).alias("text"),
        )
    )


_LINE_CORPUS_SQL = """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000000, 'subscribe to our newsletter today.'
      FROM documents WHERE doc_id % 11 = 0
      UNION ALL
      SELECT doc_id + 20000000,
             'we use cookies to improve your experience.' || chr(10) ||
             'accept all cookies.'
      FROM documents WHERE doc_id % 11 = 1
    ),
    lines AS (
      SELECT doc_id, pos, line FROM (
        SELECT doc_id,
               generate_subscripts(regexp_split_to_array(text, chr(10)), 1)
                 AS pos,
               trim(unnest(regexp_split_to_array(text, chr(10)))) AS line
        FROM corpus
      ) WHERE line <> ''
    )
"""


@query(
    "dedup_lines",
    oracle=_LINE_CORPUS_SQL
    + """
    , flagged AS (
      SELECT doc_id, pos, line,
             ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, pos)
               AS rn
      FROM lines
    ),
    -- removed counters via the GROUP BY identity (the line_dedup_stats
    -- strategy) — a DIFFERENT computation than the transform's window,
    -- so a divergence between report and transform hash-mismatches
    per AS (SELECT line, COUNT(*) AS n_inst FROM lines GROUP BY line),
    removed AS (
      SELECT CAST(SUM(n_inst) - COUNT(*) AS BIGINT) AS lines_removed,
             CAST(SUM((n_inst - 1) * length(line)) AS BIGINT)
               AS chars_removed
      FROM per
    ),
    kept_docs AS (
      SELECT doc_id, COUNT(*) AS n_lines, SUM(length(line)) AS n_chars
      FROM flagged WHERE rn = 1 GROUP BY doc_id
    ),
    out AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_lines) AS BIGINT) AS lines_kept,
             CAST(SUM(n_chars + n_lines - 1) AS BIGINT) AS chars_out_total
      FROM kept_docs
    )
    SELECT out.n_docs, out.lines_kept, removed.lines_removed,
           removed.chars_removed, out.chars_out_total
    FROM out, removed
    """,
)
def dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-DOCUMENT LINE DEDUP — the TRANSFORM companion to
    line_dedup_stats (VERDICT r7 #5): FineWeb/RefinedWeb actually
    REMOVE repeated lines, they don't just report them. Keep-first
    rule: every distinct trimmed non-empty line survives only at its
    first global instance (ordered by doc_id, then line position);
    every later instance is dropped, and each document's cleaned text
    is reassembled from its surviving lines in original order
    (documents reduced to zero lines drop out, C4's behavior).

    The result row binds the TRANSFORM to the REPORT: lines_removed /
    chars_removed are computed here from the window path, while the
    oracle recomputes them via line_dedup_stats' GROUP BY identity
    (SUM(n_inst)-COUNT, SUM((n_inst-1)*len)) — two independent
    strategies that must hash-equal, proving chars_removable is
    actually removed. chars_out_total additionally pins the
    reassembly (per-doc sum of kept-line lengths + newline count).

    Scale: ONE exchange more than the report — the window partitions
    by line (same key as the report's groupBy, same map-side skew
    collapse... no: windows don't partial-agg, but the per-line group
    is the duplicate count, bounded by corpus duplication), then the
    reassembly exchanges on doc_id with collect_list bounded by
    document line counts. No joins, no pair emission — linear in
    corpus size at any duplication level."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    lines = (
        _boilerplate_corpus(docs)
        .select(
            "doc_id",
            F.posexplode(F.split("text", "\n")).alias("pos", "raw"),
        )
        .select("doc_id", (F.col("pos") + 1).alias("pos"), F.trim("raw").alias("line"))
        .where(F.col("line") != "")
    )
    w = Window.partitionBy("line").orderBy("doc_id", "pos")
    flagged = lines.withColumn("rn", F.row_number().over(w))
    removed = flagged.where(F.col("rn") > 1).agg(
        F.count("*").cast("bigint").alias("lines_removed"),
        F.coalesce(F.sum(F.length("line")), F.lit(0))
        .cast("bigint")
        .alias("chars_removed"),
    )
    cleaned = (
        flagged.where(F.col("rn") == 1)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s.line,
                ),
                "\n",
            ).alias("text_out")
        )
    )
    out = cleaned.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (
            F.sum(F.size(F.split("text_out", "\n")))
        ).cast("bigint").alias("lines_kept"),
        F.sum(F.length("text_out")).cast("bigint").alias("chars_out_total"),
    )
    return out.crossJoin(removed).select(
        "n_docs", "lines_kept", "lines_removed", "chars_removed",
        "chars_out_total",
    )


@query(
    "line_dedup_stats",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000000, 'subscribe to our newsletter today.'
      FROM documents WHERE doc_id % 11 = 0
      UNION ALL
      SELECT doc_id + 20000000,
             'we use cookies to improve your experience.' || chr(10) ||
             'accept all cookies.'
      FROM documents WHERE doc_id % 11 = 1
    ),
    lines AS (
      SELECT doc_id, trim(l) AS line
      FROM corpus, UNNEST(regexp_split_to_array(text, chr(10))) AS t(l)
      WHERE trim(l) <> ''
    ),
    per AS (
      SELECT line, COUNT(*) AS n_inst, COUNT(DISTINCT doc_id) AS nd
      FROM lines GROUP BY line
    )
    SELECT CAST(SUM(n_inst) AS BIGINT) AS lines_total,
           CAST(COUNT(*) AS BIGINT) AS lines_distinct,
           CAST(SUM(n_inst) - COUNT(*) AS BIGINT) AS dup_instances,
           CAST(SUM(CASE WHEN nd >= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS boilerplate_lines,
           CAST(SUM(CASE WHEN nd >= 3 THEN n_inst ELSE 0 END) AS BIGINT)
             AS boilerplate_instances,
           CAST(SUM((n_inst - 1) * length(line)) AS BIGINT)
             AS chars_removable
    FROM per
    """,
)
def line_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINE-LEVEL DEDUPLICATION REPORT — the boilerplate-removal signal
    of C4's line filtering and FineWeb/RefinedWeb's cross-document line
    dedup (navigation bars, cookie banners, newsletter footers repeat
    across thousands of pages; dropping repeated lines is one of the
    highest-leverage web-corpus cleaning steps). Per distinct trimmed
    non-empty line: instance count and document frequency; reported as
    one corpus-level row — total vs distinct lines, duplicate
    instances, boilerplate lines (doc frequency ≥ 3), and the exact
    characters a keep-one-copy line dedup would remove.

    The synthetic corpus has no cross-document repeated lines, so both
    engines AUGMENT it with two deterministic boilerplate slices (a
    newsletter footer for doc_id%11=0 as new single-line docs, a
    two-line cookie banner for %11=1) — the boilerplate counters carry
    real signal that scales with sf, and the oracle replays the
    augmentation exactly.

    Scale: ONE shuffle — groupBy(line) with map-side partial
    aggregation (heavily duplicated lines collapse before the
    exchange, exactly the skew this workload has), then a single-row
    global aggregate. No joins, no windows, no pair emission."""
    docs = load_table(spark, sf_dir, "documents")
    lines = (
        _boilerplate_corpus(docs).select(
            "doc_id", F.explode(F.split("text", "\n")).alias("raw")
        )
        .select("doc_id", F.trim("raw").alias("line"))
        .where(F.col("line") != "")
    )
    per = lines.groupBy("line").agg(
        F.count("*").alias("n_inst"),
        F.countDistinct("doc_id").alias("nd"),
    )
    return per.agg(
        F.sum("n_inst").cast("bigint").alias("lines_total"),
        F.count("*").cast("bigint").alias("lines_distinct"),
        (F.sum("n_inst") - F.count("*")).cast("bigint").alias("dup_instances"),
        F.sum(F.when(F.col("nd") >= 3, 1).otherwise(0))
        .cast("bigint")
        .alias("boilerplate_lines"),
        F.sum(F.when(F.col("nd") >= 3, F.col("n_inst")).otherwise(0))
        .cast("bigint")
        .alias("boilerplate_instances"),
        F.sum((F.col("n_inst") - 1) * F.length("line"))
        .cast("bigint")
        .alias("chars_removable"),
    )
