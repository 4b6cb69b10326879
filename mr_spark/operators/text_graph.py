"""Word-graph text analytics over ``documents``: bigram collocation
scoring (PMI) and TextRank keyword extraction (PageRank over the word
co-occurrence graph — Mihalcea & Tarau 2004, Page et al. 1999).

Bigram extraction is row-side (transform over each doc's token array —
no shuffle until the count); the graph relations (vocabulary-sized) are
broadcast. TextRank's 5 power iterations follow the same cross-engine
determinism contract as the minhash oracle: the ENTIRE iteration is
replayed in generated SQL, with per-step rounding to 12dp and exact
decimal sums so neither engine's float accumulation order can leak into
the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import tokens
from ..sources import load_table
from . import query

# lowercased letter-run tokens — DuckDB twin of tokens(lower(text))
_TOKSL_SQL = "list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), x -> x <> '')"

# adjacent-pair stream: every (t[i], t[i+1]) across the corpus
_BIGRAM_SQL = f"""
  toks AS (SELECT {_TOKSL_SQL} AS t FROM documents),
  big AS (
    SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                  i -> {{'w1': t[i], 'w2': t[i+1]}})) AS bg
    FROM toks WHERE len(t) >= 2
  ),
  bg AS (SELECT bg.w1 AS w1, bg.w2 AS w2 FROM big)
"""

_MIN_PAIR = 20  # support floor: rare pairs have unstable PMI and bloat output


def _bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w1, w2) adjacent-token pairs, one row per occurrence."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("t")
    pair = F.transform(
        F.sequence(F.lit(0), F.size(t) - 2),
        lambda i: F.struct(
            F.element_at(t, i + 1).alias("w1"), F.element_at(t, i + 2).alias("w2")
        ),
    )
    return (
        docs.select(tokens(F.lower(F.col("text"))).alias("t"))
        .where(F.size(t) >= 2)
        .select(F.explode(pair).alias("p"))
        .select("p.w1", "p.w2")
    )


@query(
    "pmi_collocations",
    oracle=f"""
    WITH {_BIGRAM_SQL},
    bc AS (SELECT w1, w2, COUNT(*) AS c_xy FROM bg GROUP BY 1, 2),
    uni AS (SELECT unnest(t) AS w FROM toks),
    uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY 1),
    tot AS (SELECT COUNT(*) AS n FROM uni)
    SELECT bc.w1, bc.w2, CAST(bc.c_xy AS BIGINT) AS c_xy,
           ROUND(LN(CAST(bc.c_xy * tot.n AS DOUBLE)
                    / CAST(u1.c * u2.c AS DOUBLE)), 6) AS pmi
    FROM bc, tot
    JOIN uc u1 ON bc.w1 = u1.w
    JOIN uc u2 ON bc.w2 = u2.w
    WHERE bc.c_xy >= {_MIN_PAIR}
    """,
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: pointwise mutual information of adjacent word
    pairs, PMI = ln(c_xy·N / (c_x·c_y)) on exact integer counts (one ln +
    one division of identical integers — deterministic). Unigram marginals
    are vocabulary-sized → broadcast; the bigram count is the only big
    shuffle. Support floor keeps the output the interesting head, not the
    long tail."""
    bg = _bigrams(spark, sf_dir)
    bc = bg.groupBy("w1", "w2").agg(F.count("*").alias("c_xy")).where(
        F.col("c_xy") >= _MIN_PAIR
    )
    docs = load_table(spark, sf_dir, "documents")
    uni = docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("w"))
    uc = uni.groupBy("w").agg(F.count("*").alias("c"))
    tot = uni.agg(F.count("*").alias("n"))
    u1 = uc.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uc.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    return (
        bc.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c_xy").cast("bigint").alias("c_xy"),
            F.round(
                F.log(
                    (F.col("c_xy") * F.col("n")).cast("double")
                    / (F.col("c1") * F.col("c2")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
    )


_DAMPING = 0.85
_ITERS = 5


def _textrank_oracle() -> str:
    """Generated SQL replaying the full TextRank iteration in DuckDB.

    Determinism contract (mirrored exactly in the Spark code): each
    contribution is ROUND(r·w/outw, 12) in double (identical IEEE ops both
    engines), summed EXACTLY as DECIMAL(28,12), and each new rank is
    ROUND(0.15/N + 0.85·sum, 12)."""
    parts = [
        f"WITH {_BIGRAM_SQL}",
        """,
    und AS (
      SELECT w1 AS src, w2 AS dst FROM bg WHERE w1 <> w2
      UNION ALL
      SELECT w2 AS src, w1 AS dst FROM bg WHERE w1 <> w2
    ),
    edges AS (SELECT src, dst, COUNT(*) AS w FROM und GROUP BY 1, 2),
    outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY 1),
    nn AS (SELECT COUNT(*) AS n FROM outw),
    r0 AS (SELECT src AS word, ROUND(1.0 / (SELECT n FROM nn), 12) AS r FROM outw)""",
    ]
    for i in range(1, _ITERS + 1):
        parts.append(f""",
    r{i} AS (
      SELECT e.dst AS word,
             ROUND(0.15 / (SELECT n FROM nn)
                   + 0.85 * CAST(SUM(CAST(ROUND(p.r * e.w / o.ow, 12)
                                          AS DECIMAL(28,12))) AS DOUBLE), 12) AS r
      FROM edges e
      JOIN r{i - 1} p ON e.src = p.word
      JOIN outw o ON e.src = o.src
      GROUP BY e.dst
    )""")
    parts.append(f"""
    SELECT word, ROUND(r, 6) AS rank FROM r{_ITERS}""")
    return "".join(parts)


# Above this vocabulary size the per-iteration rank vector no longer
# belongs on the driver (it grows with the corpus, unlike k-means
# centroids) — switch to the distributed equi-join power iteration.
_TEXTRANK_COLLECT_MAX = 1_000_000


@query("textrank_keywords", oracle=_textrank_oracle())
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword scoring: PageRank (d=0.85, 5 power iterations)
    over the undirected word co-occurrence graph (edge weight = adjacency
    count, self-loops dropped).

    Size-gated iteration strategy (same gate pattern as semantic_dedup's
    quantizer and neardup_components' union-find): vocabularies up to
    _TEXTRANK_COLLECT_MAX words collect the rank vector each round and
    broadcast-join it into the persisted edge relation — one groupBy
    shuffle per round, no deep AQE stage chains (the distributed join
    measured ~10× slower at sf0.1 on pure stage-scheduling latency).
    Bigger vocabularies take `_textrank_distributed`: the SAME algebra
    with the broadcast swapped for a shuffled equi-join and zero driver
    round-trips — the rank vector never leaves the executors. Both paths
    round every contribution to 12dp and sum in exact decimal, so they
    are bit-identical to each other (pinned in
    tests/test_insights.py::test_textrank_strategies_identical) and to
    the generated-SQL oracle — same technique as minhash_lsh_pairs."""
    bg = _bigrams(spark, sf_dir).where(F.col("w1") != F.col("w2"))
    und = bg.select(F.col("w1").alias("src"), F.col("w2").alias("dst")).unionAll(
        bg.select(F.col("w2").alias("src"), F.col("w1").alias("dst"))
    )
    edges = und.groupBy("src", "dst").agg(F.count("*").alias("w"))
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    e2 = edges.join(outw, "src").select("src", "dst", "w", "ow")
    # ONE pass over the bigram scan: materialize e2 first, then read the
    # vocabulary (size + node list) off the cached relation — the previous
    # shape (outw.count(), then a nodes collect, then the first rank step)
    # recomputed the full tokenize→bigram→aggregate subtree three times,
    # since Spark has no cross-action CSE
    e2 = e2.persist()
    # ONE bounded action decides the strategy AND fetches the node list:
    # limit(MAX+1) caps the driver materialization at the gate size
    # (collecting an unbounded vocabulary before the gate is exactly what
    # the distributed path exists to avoid), and getting MAX+1 rows back
    # proves the vocabulary exceeds the gate without revealing its size —
    # the distributed path recomputes the exact n it needs
    probe = (
        e2.select("src").distinct().limit(_TEXTRANK_COLLECT_MAX + 1).collect()
    )
    if len(probe) <= _TEXTRANK_COLLECT_MAX:
        nodes = [r["src"] for r in probe]
        return _textrank_broadcast(spark, e2, nodes, len(nodes))
    # big-vocab path only: the exact scalar n (cheap off the cached e2;
    # never an unbounded collect)
    n = e2.select("src").distinct().count()
    # the distributed path composes ONE lazy 5-join plan: the e2 subtree
    # repeats per iteration but Spark reuses its exchange within the job
    # (ReusedExchange), so a cache would only leak blocks the lazily
    # returned plan never releases — drop the gate probe's blocks now
    e2.unpersist()
    return _textrank_distributed(e2, n)


def _rank_step(e2: DataFrame, ranks: DataFrame, n: int) -> DataFrame:
    """One power iteration: ranks(word, r) -> ranks(word, r). The exact
    12dp-round + decimal-sum contract shared by both strategies and the
    oracle lives HERE, once."""
    return (
        e2.join(ranks, e2.src == ranks.word)
        .select(
            "dst",
            F.round(F.col("r") * F.col("w") / F.col("ow"), 12).alias("contrib"),
        )
        .groupBy("dst")
        .agg(F.sum(F.col("contrib").cast("decimal(28,12)")).alias("s"))
        .select(
            F.col("dst").alias("word"),
            F.round(
                F.lit(0.15) / F.lit(float(n))
                + F.lit(0.85) * F.col("s").cast("double"),
                12,
            ).alias("r"),
        )
    )


def _textrank_broadcast(
    spark: SparkSession, e2: DataFrame, nodes: list, n: int
) -> DataFrame:
    """≤ gate: rank vector collected + broadcast each round. The per-round
    driver round-trip moves through Arrow both ways (toPandas / pandas
    createDataFrame) — the row-pickle path serialized the whole rank
    vector tuple-by-tuple five times per query. float64 survives Arrow
    bit-exact, so the 12dp contract is untouched."""
    import pandas as pd

    r0 = round(1.0 / n, 12)
    ranks_pdf = pd.DataFrame({"word": pd.Series(nodes, dtype=object),
                              "r": r0})
    for _ in range(_ITERS):
        ranks_df = F.broadcast(
            spark.createDataFrame(ranks_pdf, "word string, r double")
        )
        ranks_pdf = _rank_step(e2, ranks_df, n).toPandas()
    e2.unpersist()
    final = spark.createDataFrame(
        ranks_pdf.rename(columns={"r": "rank"}), "word string, rank double"
    )
    return final.select("word", F.round("rank", 6).alias("rank"))


def _textrank_distributed(e2: DataFrame, n: int) -> DataFrame:
    """> gate: the rank vector stays a distributed relation; each round is
    a shuffled equi-join + groupBy against the edge relation. Fully
    lazy — _ITERS is small and fixed, so the composed 5-join plan executes
    as ONE job with no driver materialization at all."""
    ranks = e2.select("src").distinct().select(
        F.col("src").alias("word"), F.lit(round(1.0 / n, 12)).alias("r")
    )
    for _ in range(_ITERS):
        ranks = _rank_step(e2, ranks, n)
    return ranks.select("word", F.round("r", 6).alias("rank"))


@query(
    "triangle_count",
    oracle=f"""
    WITH {_BIGRAM_SQL},
    und AS (
      SELECT LEAST(w1, w2) AS u, GREATEST(w1, w2) AS v
      FROM bg WHERE w1 <> w2
    ),
    e AS (SELECT DISTINCT u, v FROM und),
    nodes AS (SELECT COUNT(DISTINCT x) AS n_nodes
              FROM (SELECT u AS x FROM e UNION SELECT v FROM e)),
    tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM e e1 JOIN e e2 ON e1.v = e2.u JOIN e e3
           ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT CAST(nodes.n_nodes AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST(tri.n_triangles AS BIGINT) AS n_triangles
    FROM nodes, tri
    """,
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the word co-occurrence graph via DEGREE
    ORDERING (the compact-forward algorithm): orient every edge from the
    lower-(degree, node) endpoint to the higher, so each triangle is
    counted exactly once and — the scale property — every node's
    out-neighborhood is O(sqrt(|E|)), which bounds the wedge join even on
    power-law graphs where a naive lexicographic orientation lets one hub
    generate a quadratic wedge explosion. Two self-equi-joins, no
    broadcast of the edge set. The oracle counts the same triangles with
    the simple a<b<c triple join — same count, different (non-scalable)
    plan."""
    bg = _bigrams(spark, sf_dir).where(F.col("w1") != F.col("w2"))
    und = bg.select(
        F.least("w1", "w2").alias("u"), F.greatest("w1", "w2").alias("v")
    ).distinct()
    deg = (
        und.select(F.col("u").alias("x"))
        .unionAll(und.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    ranked = und.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    fwd = ranked.select(
        F.when(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
            F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
        )
        .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
        .alias("e")
    ).select("e.s", "e.t")
    # A triangle's acyclic orientation has exactly one length-2 path
    # (source→middle→sink) and its closing edge is source→sink, forward —
    # so one equi-join on the (source, sink) key counts each triangle once.
    e1 = fwd.select(F.col("s").alias("a"), F.col("t").alias("b"))
    e2 = fwd.select(F.col("s").alias("b"), F.col("t").alias("c"))
    e3 = fwd.select(F.concat_ws("\x00", "s", "t").alias("ac_key"))
    wedges = e1.join(e2, "b").select(
        F.concat_ws("\x00", "a", "c").alias("ac_key")
    )
    tri = wedges.join(e3, "ac_key").agg(F.count("*").alias("n_triangles"))
    n_nodes = deg.agg(F.count("*").alias("n_nodes"))
    n_edges = und.agg(F.count("*").alias("n_edges"))
    return (
        n_nodes.crossJoin(n_edges)
        .crossJoin(tri)
        .select(
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            F.col("n_edges").cast("bigint").alias("n_edges"),
            F.col("n_triangles").cast("bigint").alias("n_triangles"),
        )
    )
