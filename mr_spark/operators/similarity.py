"""Similarity search over the ``embeddings`` table (array<float> column).

* brute-force cosine top-k  — exact baseline, numpy-blocked (oracle-checked)
* sign-LSH bucketed top-k   — the scale path: candidates restricted to the
                              query's sign bucket, pure DataFrame built-ins
                              (oracle-checked)
* embedding near-dup pairs  — all pairs above a threshold, numpy-blocked
                              (oracle-checked)

Determinism design (the interesting bit): floating-point dot products are
summation-order-dependent, so Spark (SIMD/BLAS) and DuckDB (sequential
fold) disagree in the last ulp. We L2-normalize each vector once, then
QUANTIZE components to integer-valued doubles (round(x·10^6)). Integer
products are ≤ 10^12 and 64-element sums ≤ 6.4·10^13 < 2^53 — EXACT in
float64 under ANY summation order. Associativity restored → numpy matmul
(Arrow-batched mapInPandas) gives bit-identical results to DuckDB's
list_dot_product. Similarity = quantized dot / 10^12 (cosine at 1e-6
component precision — far below any near-dup threshold's noise floor).

100 TB notes: the numpy kernels broadcast the smaller side (query set /
corpus block) and stream the big side through Arrow batches — the same
block-matmul shape a GPU ANN pipeline uses. The LSH variant is the
million-query path (equi-join on bucket, no broadcast of the corpus).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import persist_tracked
from ..sources import load_table
from . import query

N_QUERIES = 5  # vec_id < 5 are the query vectors
TOP_K = 5
SCALE = 1_000_000.0
SCALE_SQ = SCALE * SCALE
NEARDUP_THRESHOLD = 0.35

# DuckDB twin of the quantized-normalized relation: (vec_id, q)
_EMB_Q = f"""
    SELECT vec_id,
           list_transform(
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                              CAST(embedding AS DOUBLE[])))),
             x -> round(x * {SCALE})) AS q
    FROM embeddings
"""
_SIM_SQL = f"list_dot_product(a.q, b.q) / {SCALE_SQ}"


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, q): L2-normalized, quantized to integer-valued doubles.
    Same op order as the SQL twin: fold-sum of squares → sqrt → divide →
    scale → round."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    return emb.select(
        "vec_id",
        F.transform(v, lambda x: F.round(x / norm * SCALE)).alias("q"),
    )


def _matmul_kernel(b_ids: np.ndarray, b_mat: np.ndarray, mode: str):
    """Arrow-batch kernel: rows × broadcast-matrix exact integer matmul.
    mode='neardup' emits pairs (a<b) above threshold; mode='topk' emits all
    scored rows (window top-k happens afterwards, distributed)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            m = np.stack(pdf["q"].to_numpy())  # integer-valued float64
            sims = (m @ b_mat.T) / SCALE_SQ  # exact: see module docstring
            if mode == "neardup":
                ai, bi = np.nonzero(
                    (ids[:, None] < b_ids[None, :]) & (sims >= NEARDUP_THRESHOLD)
                )
                yield pd.DataFrame(
                    {"vec_a": ids[ai], "vec_b": b_ids[bi], "sim": sims[ai, bi]}
                )
            else:
                ai, bi = np.nonzero(ids[:, None] != b_ids[None, :])
                yield pd.DataFrame(
                    {
                        "neighbor_id": ids[ai],
                        "query_id": b_ids[bi],
                        "sim": sims[ai, bi],
                    }
                )

    return fn


@query(
    "ann_cosine_topk",
    oracle=f"""
    WITH e AS ({_EMB_Q}),
    scored AS (
      SELECT a.vec_id AS neighbor_id, b.vec_id AS query_id, {_SIM_SQL} AS sim
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
      WHERE b.vec_id < {N_QUERIES}
    )
    SELECT query_id, neighbor_id, sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= {TOP_K}
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the query set (tiny) is collected and
    closed over as a numpy matrix; the corpus streams through the matmul
    kernel in Arrow batches; per-query top-k via window (deterministic
    tie-break on neighbor_id)."""
    emb = _quantized(spark, sf_dir)
    qrows = emb.where(F.col("vec_id") < N_QUERIES).collect()
    q_ids = np.array([r["vec_id"] for r in qrows])
    q_mat = np.stack([np.asarray(r["q"]) for r in qrows])
    scored = emb.mapInPandas(
        _matmul_kernel(q_ids, q_mat, "topk"),
        schema="neighbor_id bigint, query_id bigint, sim double",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "sim")
    )


def _sign_bucket_expr():
    """8-bit sign bucket over the first 8 dims — deterministic coarse
    quantizer usable identically in Spark and DuckDB (normalization and
    quantization keep signs for any |x| ≥ 5e-7; the twin buckets the
    quantized vector too, so even the sub-quantum edge case agrees)."""
    bits = [
        F.when(F.element_at(F.col("q"), i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(8)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


_BUCKET_SQL = (
    "CAST(" + " + ".join(
        f"CASE WHEN q[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END" for i in range(8)
    ) + " AS INT)"
)


@query(
    "ann_lsh_topk",
    oracle=f"""
    WITH e AS ({_EMB_Q}),
    eb AS (SELECT vec_id, q, {_BUCKET_SQL} AS bucket FROM e),
    scored AS (
      SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id, {_SIM_SQL} AS sim
      FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
      WHERE b.vec_id < {N_QUERIES}
    )
    SELECT query_id, neighbor_id, sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= {TOP_K}
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN, pure DataFrame built-ins: candidates share the
    query's 8-bit sign bucket → equi-join on bucket (hash join), score with
    a zip_with/aggregate dot (candidate set is ~N/256 per query — the HOF
    overhead is immaterial here), per-query top-k. This is the shape that
    scales to millions of queries: no corpus broadcast, one shuffle on
    bucket."""
    eb = _quantized(spark, sf_dir).withColumn("bucket", _sign_bucket_expr())
    q = eb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("bucket").alias("qbucket"),
    )
    from ..functions import dot as dot_fn

    dot = dot_fn(F.col("q"), F.col("qq"))
    scored = (
        eb.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot / F.lit(SCALE_SQ)).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "sim")
    )


# Above this corpus size the collect-broadcast matrix would strain driver
# memory; switch to the distributed block-pair matmul (identical results —
# pinned by test_neardup_strategies and by the shared oracle).
_NEARDUP_BROADCAST_LIMIT = 100_000
_NEARDUP_BLOCKS = 16


@query(
    "embedding_neardup",
    oracle=f"""
    WITH e AS ({_EMB_Q})
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_SIM_SQL} AS sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE {_SIM_SQL} >= {NEARDUP_THRESHOLD}
    """,
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (sim ≥ 0.35), EXACT all-pairs.

    Size-based strategy (both paths produce IDENTICAL results — same
    quantized-integer matmul, pinned by test and oracle): below
    _NEARDUP_BROADCAST_LIMIT rows, collect the corpus once as the
    broadcast matrix and stream the other side through the Arrow kernel
    (one corpus pass, zero shuffle). Above it, the distributed block-pair
    matmul — no driver collect anywhere, so a 100 TB embeddings table
    cannot OOM the driver. Exact + deterministic per the module-level
    quantization argument."""
    # gate on the RAW table's row count — a parquet metadata read — not
    # on count() of the quantized projection; the select is 1:1 so the
    # counts are equal, and the previous shape paid a full quantize scan
    # just to pick a strategy (then two more for the collect + stream)
    n = load_table(spark, sf_dir, "embeddings").count()
    emb = _quantized(spark, sf_dir)
    if n <= _NEARDUP_BROADCAST_LIMIT:
        # one quantize pass total: materialized here, read back by both
        # the broadcast-matrix collect and the streamed matmul side
        return _neardup_broadcast(persist_tracked(emb))
    return _neardup_blocked(spark, emb)


def _neardup_broadcast(emb: DataFrame) -> DataFrame:
    """Small-corpus path: corpus collected once as the broadcast matrix,
    streamed side matmuls against it block-wise. The collect moves
    through Arrow (toPandas) — row-pickling an array<double> column was
    the slow half of this path; quantized integer-valued doubles
    round-trip Arrow bit-exact."""
    pdf = emb.toPandas()
    b_ids = pdf["vec_id"].to_numpy()
    b_mat = np.stack(pdf["q"].to_numpy())
    return emb.mapInPandas(
        _matmul_kernel(b_ids, b_mat, "neardup"),
        schema="vec_a bigint, vec_b bigint, sim double",
    )


def _neardup_blocked(
    spark: SparkSession, emb: DataFrame, n_blocks: int = _NEARDUP_BLOCKS
) -> DataFrame:
    """Scale path: exact all-pairs via block-pair matmul, fully distributed.

    Rows hash into `n_blocks` blocks; a tiny block-pair index (bi ≤ bj,
    n_blocks·(n_blocks+1)/2 rows) is broadcast and each row replicates to
    every pair touching its block. groupBy (bi, bj) then evaluates each
    UNORDERED vector pair in exactly one task (cross-block: A×B matmul;
    diagonal: upper triangle), so no dedup pass is needed. Costs are the
    inherent ones of exact all-pairs — n_blocks× replication shuffle and
    O(n²/2) compute — with no driver-memory term; size n_blocks so two
    blocks of vectors fit one task's memory at the target corpus size."""
    bl = emb.withColumn(
        "blk", F.pmod(F.xxhash64("vec_id"), F.lit(n_blocks)).cast("int")
    )
    pair_idx = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "bi int, bj int",
    )
    repl = bl.join(
        F.broadcast(pair_idx),
        (F.col("blk") == F.col("bi")) | (F.col("blk") == F.col("bj")),
    )

    def _block_pair(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = key
        empty = pd.DataFrame({"vec_a": [], "vec_b": [], "sim": []})
        if bi == bj:
            ids = pdf["vec_id"].to_numpy()
            m = np.stack(pdf["q"].to_numpy())
            sims = (m @ m.T) / SCALE_SQ
            ai, bix = np.nonzero(
                (ids[:, None] < ids[None, :]) & (sims >= NEARDUP_THRESHOLD)
            )
            if not len(ai):
                return empty
            return pd.DataFrame(
                {"vec_a": ids[ai], "vec_b": ids[bix], "sim": sims[ai, bix]}
            )
        a = pdf[pdf["blk"] == bi]
        b = pdf[pdf["blk"] == bj]
        if not len(a) or not len(b):
            return empty
        ids_a = a["vec_id"].to_numpy()
        ids_b = b["vec_id"].to_numpy()
        sims = (np.stack(a["q"].to_numpy()) @ np.stack(b["q"].to_numpy()).T) / SCALE_SQ
        ai, bix = np.nonzero(sims >= NEARDUP_THRESHOLD)
        if not len(ai):
            return empty
        va, vb = ids_a[ai], ids_b[bix]
        return pd.DataFrame(
            {
                "vec_a": np.minimum(va, vb),
                "vec_b": np.maximum(va, vb),
                "sim": sims[ai, bix],
            }
        )

    return repl.groupBy("bi", "bj").applyInPandas(
        _block_pair, schema="vec_a bigint, vec_b bigint, sim double"
    )


NPROBE = 2
KMEANS_ITERS = 2

_EMB_QL = _EMB_Q.replace("SELECT vec_id,", "SELECT vec_id, label,")

# one rounded-mean-per-dim centroid table from an assignment relation
# (src must expose (cell, q)); integer-valued doubles throughout
_CENT_SQL = """
    {name} AS (
      SELECT cell, list(h ORDER BY dim) AS c FROM (
        SELECT cell, dim, round(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS h
        FROM (SELECT cell, generate_subscripts(q, 1) AS dim, unnest(q) AS v
              FROM {src})
        GROUP BY cell, dim
      ) GROUP BY cell
    )"""


def _ivf_kmeans_sql(iters: int) -> str:
    """DuckDB twin of the whole IVF pipeline: label-means init, then
    `iters` unrolled Lloyd steps (argmax-dot assignment with tie-break on
    smallest cell id, rounded-mean centroid update) — every comparison is
    exact integer-valued-double math, so the replay is engine-independent."""
    parts = [
        f"WITH e AS ({_EMB_QL})",
        _CENT_SQL.format(name="cent0", src="(SELECT label AS cell, q FROM e)"),
    ]
    for i in range(1, iters + 1):
        parts.append(f"""
    assign{i} AS (
      SELECT vec_id, q, cell FROM (
        SELECT e.vec_id, e.q, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY list_dot_product(e.q, c.c) DESC,
                                           c.cell) AS rn
        FROM e, cent{i - 1} c
      ) WHERE rn = 1
    )""")
        parts.append(_CENT_SQL.format(name=f"cent{i}", src=f"assign{i}"))
    last = iters
    parts.append(f"""
    qs AS (SELECT vec_id AS query_id, q AS qq FROM e WHERE vec_id < {N_QUERIES}),
    cells AS (
      SELECT query_id, qq, cell FROM (
        SELECT qs.query_id, qs.qq, c.cell,
               ROW_NUMBER() OVER (PARTITION BY qs.query_id
                                  ORDER BY list_dot_product(qs.qq, c.c) DESC,
                                           c.cell) AS rn
        FROM qs, cent{last} c
      ) WHERE rn <= {NPROBE}
    ),
    cand AS (
      SELECT cells.query_id, a.vec_id AS neighbor_id,
             list_dot_product(cells.qq, a.q) / {SCALE_SQ} AS sim
      FROM cells JOIN assign{last} a
        ON a.cell = cells.cell AND a.vec_id <> cells.query_id
    )""")
    return ",".join(parts) + f"""
    SELECT query_id, neighbor_id, sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS rn
      FROM cand
    ) WHERE rn <= {TOP_K}
    """


def _assign_kernel(cell_ids: np.ndarray, cent_mat: np.ndarray):
    """Arrow-batch Lloyd assignment: nearest centroid by max dot product
    (normalized vectors ⇒ same ranking as min Euclidean). `cent_mat` rows
    are sorted by cell id ascending, so numpy argmax's first-max rule
    reproduces the SQL tie-break (dot DESC, cell ASC). Exact: integer
    products ≤ 1e12, 64-dim sums < 2^53."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["q"].to_numpy())
            best = np.argmax(m @ cent_mat.T, axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "q": pdf["q"], "cell": cell_ids[best]}
            )

    return fn


def _rounded_mean_cent(assign: DataFrame) -> DataFrame:
    """(cell, c): per-cell per-dim rounded mean of the quantized vectors —
    one narrow shuffle on (cell, dim), partial aggregation map-side."""
    return (
        assign.select("cell", F.posexplode("q").alias("dim", "v"))
        .groupBy("cell", "dim")
        .agg(F.round(F.sum("v") / F.count("*")).alias("h"))
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "h"))), lambda s: s["h"]
            ).alias("c")
        )
    )


@query("ann_ivf_topk", oracle=_ivf_kmeans_sql(KMEANS_ITERS))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a real k-means coarse quantizer: centroids initialized
    from the `label` column's per-cell means, then KMEANS_ITERS Lloyd
    iterations (assign to nearest centroid, recompute rounded means). All
    math is exact integer-valued doubles (module docstring), so the DuckDB
    oracle replays the identical iterations and hash-matches.

    Plan shape at 100 TB: per iteration, one mapInPandas pass over the
    corpus with the k×d centroid matrix closed over (no shuffle — the
    classic broadcast-Lloyd step MLlib uses) plus one narrow (cell, dim)
    shuffle for the update; k centroids round-trip through the driver
    (k·d doubles — tiny). Queries rank the broadcast centroid table, probe
    NPROBE cells, and score only those cells' members via an equi-join on
    cell id — corpus never broadcast, never cross-joined.

    The quantized corpus and each Lloyd assignment are persisted
    (MEMORY_AND_DISK): every per-iteration centroid collect() is an action,
    and without the cache each one — plus the final probe plan, which reads
    the last assignment twice (centroid broadcast + candidate join) — would
    re-run every upstream Arrow kernel pass (~5 corpus passes instead of 2;
    measured 2.5× slower). Same iterative-dataset caching Lloyd/Pregel
    always needs on Spark."""
    from ..functions import dot as dot_fn

    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    e = persist_tracked(
        emb.select(
            "vec_id", "label",
            F.transform(v, lambda x: F.round(x / norm * SCALE)).alias("q"),
        )
    )

    cent_df = _rounded_mean_cent(e.select(F.col("label").alias("cell"), "q"))
    assign = prev = None
    for _ in range(KMEANS_ITERS):
        rows = sorted(cent_df.collect(), key=lambda r: r["cell"])
        if prev is not None:
            prev.unpersist()
        cell_ids = np.array([r["cell"] for r in rows])
        cent_mat = np.stack([np.asarray(r["c"]) for r in rows])
        assign = persist_tracked(
            e.mapInPandas(
                _assign_kernel(cell_ids, cent_mat),
                schema="vec_id bigint, q array<double>, cell bigint",
            )
        )
        cent_df = _rounded_mean_cent(assign)
        prev = assign

    qs = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq")
    )
    w_cell = Window.partitionBy("query_id").orderBy(F.desc("cell_score"), F.asc("cell"))
    cells = (
        qs.crossJoin(F.broadcast(cent_df))
        .withColumn("cell_score", dot_fn(F.col("qq"), F.col("c")))
        .withColumn("rn", F.row_number().over(w_cell))
        .where(F.col("rn") <= NPROBE)
        .select("query_id", "qq", F.col("cell").alias("cell_label"))
    )
    cand = (
        assign.join(
            F.broadcast(cells),
            (assign.cell == cells.cell_label) & (assign.vec_id != cells.query_id),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot_fn(F.col("qq"), F.col("q")) / F.lit(SCALE_SQ)).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "sim")
    )


_CENT_SQL = f"""
    WITH q AS ({_EMB_Q.replace("SELECT vec_id,", "SELECT vec_id, label,")}),
    sizes AS (SELECT label, COUNT(*) AS n FROM q GROUP BY label),
    cent AS (
      SELECT label, d.i AS dim, SUM(q[d.i]) AS s
      FROM q, unnest(range(1, len(q)+1)) AS d(i)
      GROUP BY label, d.i
    ),
    svecs AS (SELECT label, array_agg(s ORDER BY dim) AS svec FROM cent GROUP BY label)
    SELECT q.vec_id, q.label, n,
           CAST(list_sum(list_transform(range(1, len(q.q)+1),
                i -> (CAST(n AS HUGEINT)*CAST(q.q[i] AS HUGEINT)
                      - CAST(svec[i] AS HUGEINT))
                   * (CAST(n AS HUGEINT)*CAST(q.q[i] AS HUGEINT)
                      - CAST(svec[i] AS HUGEINT))))
                AS DOUBLE) / ((n*n) * {SCALE_SQ}) AS dist2
    FROM q JOIN svecs USING (label) JOIN sizes USING (label)
"""


@query("label_outlier_scores", oracle=_CENT_SQL)
def label_outlier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise detection: each vector's squared distance to its
    label's centroid — the score that surfaces mislabeled training
    examples. The GROUPED-MAP applyInPandas surface: one Arrow batch per
    label group, a numpy/int kernel per group (a centroid is holistic —
    built-ins cannot stream it per row).

    Exactness (the HUGEINT twin): with quantized integer vectors q and
    per-dim group sums S, n²·dist2 = Σ_d (n·q_d − S_d)² is INTEGER
    arithmetic — order-independent, overflow-proof in Python ints (the
    oracle uses HUGEINT) — and the single final division matches DuckDB's
    double op order exactly.

    Scale: groups shuffle on label; a label's members must fit one task
    (same contract as any grouped-map op). For degenerate single-label
    corpora, pre-aggregate per-partition (S, n) instead."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    q = emb.select(
        "vec_id",
        "label",
        F.transform(v, lambda x: F.round(x / norm * SCALE)).alias("q"),
    )

    def _outliers(pdf: pd.DataFrame) -> pd.DataFrame:
        qs = np.stack(pdf["q"].to_numpy())  # integer-valued float64
        n = len(pdf)
        s_ints = [int(s) for s in qs.sum(axis=0)]  # exact: |Σ| < 2^53
        denom = (n * n) * SCALE_SQ
        dist2 = []
        for row in qs:
            num = 0
            for x, s in zip(row, s_ints):
                d = n * int(x) - s
                num += d * d
            dist2.append(float(num) / denom)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"].astype("int64"),
                "label": pdf["label"].astype("int64"),
                "n": pd.Series([n] * n, dtype="int64"),
                "dist2": pd.Series(dist2, dtype="float64"),
            }
        )

    return q.groupBy("label").applyInPandas(
        _outliers, schema="vec_id bigint, label bigint, n bigint, dist2 double"
    )


# ---- semantic dedup (SemDeDup-style) ----------------------------------------

SEMDEDUP_THRESHOLD = 0.30

# k ∝ n: sign-LSH bucket width by corpus size, so per-cluster pairwise
# work stays bounded as the corpus grows (adding 6 bits per 100× ≈
# cluster sizes constant). Tiers are exact-integer thresholds — both
# engines derive the same width from the same COUNT(*).
_SEMDEDUP_TIERS = ((100_000, 8), (10_000_000, 14), (1_000_000_000, 20))
_SEMDEDUP_MAX_BITS = 26

_ADAPTIVE_BITS_SQL = (
    "CASE "
    + " ".join(f"WHEN COUNT(*) <= {n} THEN {b}" for n, b in _SEMDEDUP_TIERS)
    + f" ELSE {_SEMDEDUP_MAX_BITS} END"
)


def _adaptive_bits_col(n_col):
    """Spark twin of _ADAPTIVE_BITS_SQL over a corpus-count column."""
    expr = F.lit(_SEMDEDUP_MAX_BITS)
    for n, b in reversed(_SEMDEDUP_TIERS):
        expr = F.when(n_col <= n, F.lit(b)).otherwise(expr)
    return expr.cast("int")


def _adaptive_sign_bucket(bits_col):
    """First-`bits` sign bits of the quantized vector as a bigint bucket
    (2^i via pow — exact for i ≤ 52; the oracle's 1<<i yields the same
    integers)."""
    return F.aggregate(
        F.sequence(F.lit(0), bits_col - 1),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc
        + F.when(
            F.element_at(F.col("q"), (i + 1).cast("int")) >= 0,
            F.pow(F.lit(2.0), i).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint")),
    )


@query(
    "semantic_dedup",
    oracle=f"""
    WITH e0 AS ({_EMB_QL}),
    nb AS (SELECT {_ADAPTIVE_BITS_SQL} AS b FROM e0),
    e AS (SELECT vec_id, label, q,
          CAST(list_sum(list_transform(range(0, (SELECT b FROM nb)),
               i -> CASE WHEN q[i + 1] >= 0 THEN CAST(1 AS BIGINT) << i
                         ELSE 0 END)) AS BIGINT) AS bucket
          FROM e0),
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM e a JOIN e b ON a.label = b.label AND a.bucket = b.bucket
                       AND a.vec_id < b.vec_id
      WHERE list_dot_product(a.q, b.q) / {SCALE_SQ} >= {SEMDEDUP_THRESHOLD}
    )
    SELECT e.vec_id, e.label,
           e.vec_id NOT IN (SELECT vec_id FROM dropped) AS is_kept
    FROM e
    """,
)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic deduplication (Abbas et al. 2023): cluster
    the corpus with a coarse quantizer, compare pairs only WITHIN a
    cluster, and drop every vector that has an earlier (lower vec_id)
    same-cluster vector above the similarity threshold. The quantizer is
    (label × adaptive sign-LSH bucket): SemDeDup's semantics are
    quantizer-defined, and the cluster count MUST grow with the corpus to
    bound per-cluster pairwise work — a static label column alone went
    quadratic in the 8× scale probe (32× wall). The bucket width is
    k ∝ n: 8 sign bits up to 1e5 vectors, +6 bits per ~100× beyond
    (14/20/26), so expected cluster sizes stay roughly constant at any
    corpus size — production SemDeDup's "scale k with n", both engines
    deriving the width from the same exact COUNT(*) (ann_ivf_topk's
    broadcast-Lloyd k-means is the learned version of this quantizer).

    Plan: equi-join on (label, bucket) — hash shuffle, never a cross
    join; the pairwise blow-up is bounded per cluster, the whole point of
    SemDeDup — exact quantized-integer dot filter, distinct dropped set,
    then a left join back to flag keeps. A hot cluster salts/splits like
    any skewed key."""
    from ..functions import dot as dot_fn

    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    cnt = emb.agg(F.count("*").alias("n_corpus"))
    e = (
        emb.select(
            "vec_id",
            "label",
            F.transform(v, lambda x: F.round(x / norm * SCALE)).alias("q"),
        )
        .crossJoin(F.broadcast(cnt))
        .withColumn("bucket", _adaptive_sign_bucket(_adaptive_bits_col(F.col("n_corpus"))))
    )
    a, b = e.alias("a"), e.alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .where(
            dot_fn(F.col("a.q"), F.col("b.q")) / F.lit(SCALE_SQ)
            >= SEMDEDUP_THRESHOLD
        )
        .select(F.col("b.vec_id").alias("dropped_id"))
        .distinct()
    )
    return e.join(
        dropped, e.vec_id == F.col("dropped_id"), "left"
    ).select("vec_id", "label", F.col("dropped_id").isNull().alias("is_kept"))


# ---- contrastive mining + centroid-classifier eval --------------------------

_HN_ANCHOR_MOD = 50  # hash-pick ~2% as candidates...
_HN_ANCHOR_CAP = 64  # ...then cap at a FIXED mini-batch size


@query(
    "hard_negative_mining",
    oracle=f"""
    WITH e0 AS ({_EMB_QL}),
    anchors AS (
      SELECT vec_id, label, q FROM e0
      WHERE CAST(md5_number_lower('hn_' || CAST(vec_id AS VARCHAR))
                 % 9223372036854775808 AS BIGINT) % {_HN_ANCHOR_MOD} = 0
      ORDER BY vec_id LIMIT {_HN_ANCHOR_CAP}
    ),
    scored AS (
      SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
             b.vec_id AS cand_id, b.label AS cand_label,
             {_SIM_SQL} AS sim
      FROM anchors a JOIN e0 b ON a.vec_id <> b.vec_id
    ),
    pos AS (
      SELECT anchor_id, cand_id, sim FROM (
        SELECT anchor_id, cand_id, sim,
               ROW_NUMBER() OVER (PARTITION BY anchor_id
                                  ORDER BY sim DESC, cand_id) AS rn
        FROM scored WHERE anchor_label = cand_label
      ) WHERE rn = 1
    ),
    neg AS (
      SELECT anchor_id, cand_id, sim FROM (
        SELECT anchor_id, cand_id, sim,
               ROW_NUMBER() OVER (PARTITION BY anchor_id
                                  ORDER BY sim DESC, cand_id) AS rn
        FROM scored WHERE anchor_label <> cand_label
      ) WHERE rn = 1
    )
    SELECT p.anchor_id, p.cand_id AS pos_id, ROUND(p.sim, 6) AS pos_sim,
           n.cand_id AS neg_id, ROUND(n.sim, 6) AS neg_sim,
           ROUND(p.sim - n.sim, 6) AS margin
    FROM pos p JOIN neg n ON p.anchor_id = n.anchor_id
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-pair mining for metric-learning batches: for a
    hash-picked anchor mini-batch CAPPED at a fixed 64 anchors, the most
    similar SAME-label vector (positive) and the most similar
    OTHER-label vector (the hard negative), with the triplet margin
    pos_sim − neg_sim. The cap is the scale contract: a fixed-FRACTION
    anchor set made anchors×corpus quadratic (the 8× probe measured
    22.7×) — a fixed-BUDGET mini-batch keeps the product linear in the
    corpus, which is also how contrastive training actually consumes
    pairs (one batch at a time; full-corpus mining would reuse
    ann_lsh_topk's sign-bucket join instead). Similarities are exact
    integer-valued-double dots of the shared quantized relation; argmax
    picks break ties on cand_id via ROW_NUMBER, so the mined pairs are
    engine- and partition-stable."""
    from ..functions import dot as dot_fn

    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    e = emb.select(
        "vec_id", "label", F.transform(v, lambda x: F.round(x / norm * SCALE)).alias("q")
    )
    from .text import _md5_lower64

    anchors = (
        e.where(
            _md5_lower64(F.concat(F.lit("hn_"), F.col("vec_id").cast("string")))
            % _HN_ANCHOR_MOD
            == 0
        )
        .orderBy("vec_id")
        .limit(_HN_ANCHOR_CAP)
        .select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("anchor_label"),
            F.col("q").alias("aq"),
        )
    )
    scored = (
        F.broadcast(anchors)
        .join(e, F.col("anchor_id") != F.col("vec_id"))
        .select(
            "anchor_id",
            "anchor_label",
            F.col("vec_id").alias("cand_id"),
            F.col("label").alias("cand_label"),
            (dot_fn(F.col("aq"), F.col("q")) / F.lit(SCALE_SQ)).alias("sim"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    pos = (
        scored.where(F.col("anchor_label") == F.col("cand_label"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("anchor_id", F.col("cand_id").alias("pos_id"), F.col("sim").alias("ps"))
    )
    neg = (
        scored.where(F.col("anchor_label") != F.col("cand_label"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("anchor_id", F.col("cand_id").alias("neg_id"), F.col("sim").alias("ns"))
    )
    return pos.join(neg, "anchor_id").select(
        "anchor_id",
        "pos_id",
        F.round("ps", 6).alias("pos_sim"),
        "neg_id",
        F.round("ns", 6).alias("neg_sim"),
        F.round(F.col("ps") - F.col("ns"), 6).alias("margin"),
    )


@query(
    "centroid_confusion",
    oracle=f"""
    WITH e0 AS ({_EMB_QL}),
    cent AS (
      SELECT cell, list(h ORDER BY dim) AS c FROM (
        SELECT label AS cell, dim,
               round(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS h
        FROM (SELECT label, generate_subscripts(q, 1) AS dim, unnest(q) AS v
              FROM e0)
        GROUP BY label, dim
      ) GROUP BY cell
    ),
    scored AS (
      SELECT e.vec_id, e.label,
             c.cell AS pred,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                ORDER BY list_dot_product(e.q, c.c) DESC,
                                         c.cell) AS rn
      FROM e0 e CROSS JOIN cent c
    )
    SELECT CAST(label AS BIGINT) AS true_label,
           CAST(pred AS BIGINT) AS pred_label,
           COUNT(*) AS n_vecs
    FROM scored WHERE rn = 1
    GROUP BY 1, 2
    """,
)
def centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classifier evaluation: per-label centroids
    (rounded per-dim means — exact integer-valued doubles, the
    ann_ivf_topk centroid machinery with label as the cell), every
    vector scored against all 10 broadcast centroids by exact dot,
    argmax with label tie-break, and the (true, predicted) confusion
    counts — the embedding-quality eval a labeling pipeline runs after
    reclustering. One posexplode agg for centroids (10×64 rows), one
    broadcast product scan, one count shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    e = emb.select(
        "vec_id", "label", F.transform(v, lambda x: F.round(x / norm * SCALE)).alias("q")
    )
    cent = (
        e.select("label", F.posexplode("q").alias("dim", "val"))
        .groupBy("label", "dim")
        .agg(F.round(F.sum("val") / F.count("*")).alias("h"))
        .groupBy(F.col("label").alias("cell"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "h"))), lambda s: s.h
            ).alias("c")
        )
    )
    from ..functions import dot as dot_fn

    scored = e.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        F.col("cell").alias("pred"),
        dot_fn(F.col("q"), F.col("c")).alias("d"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("d"), F.asc("pred"))
    top = scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return top.groupBy(
        F.col("label").cast("bigint").alias("true_label"),
        F.col("pred").cast("bigint").alias("pred_label"),
    ).agg(F.count("*").alias("n_vecs"))


@query(
    "ann_recall_at_k",
    oracle=f"""
    WITH e AS ({_EMB_Q}),
    eb AS (SELECT vec_id, q, {_BUCKET_SQL} AS bucket FROM e),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY b.vec_id
                                  ORDER BY {_SIM_SQL} DESC, a.vec_id) AS rn
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
        WHERE b.vec_id < {N_QUERIES}
      ) WHERE rn <= {TOP_K}
    ),
    lsh AS (
      SELECT query_id, neighbor_id FROM (
        SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY b.vec_id
                                  ORDER BY {_SIM_SQL} DESC, a.vec_id) AS rn
        FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
        WHERE b.vec_id < {N_QUERIES}
      ) WHERE rn <= {TOP_K}
    )
    SELECT x.query_id, CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hits,
           ROUND(CAST(COUNT(l.neighbor_id) AS DOUBLE) / {TOP_K}, 6)
             AS recall_at_k
    FROM exact x LEFT JOIN lsh l
      ON x.query_id = l.query_id AND x.neighbor_id = l.neighbor_id
    GROUP BY x.query_id
    """,
)
def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: recall@k of the sign-LSH index against the
    exact brute-force top-k, per query — the measurement that tunes an
    approximate index (bucket bits, probe count) before anyone trusts it
    at corpus scale. Composes the two registered pipelines (ann_cosine_topk
    exact baseline, ann_lsh_topk candidate path) and counts agreement;
    both use the same quantized-integer similarity and (sim DESC, id)
    tie-break, so recall is deterministic and the oracle replays BOTH
    pipelines relationally. A bucket with fewer than k candidates yields
    recall < 1 by construction — that is the finding, not an error."""
    exact = ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    lsh = (
        ann_lsh_topk(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        exact.join(lsh, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").cast("bigint").alias("n_hits"),
            F.round(F.count("hit").cast("double") / TOP_K, 6).alias(
                "recall_at_k"
            ),
        )
    )


# ---- product quantization (PQ) ANN ------------------------------------

PQ_M = 8  # subspaces
PQ_K = 32  # codes per sub-codebook (vector -> 8 codes = 8 bytes at K<=256)
PQ_DSUB = 8  # dims per subspace (embedding dim 64 = PQ_M * PQ_DSUB)


def _pq_sql() -> str:
    """DuckDB twin of the whole PQ pipeline: per-subspace codebooks
    initialized from vec_id % K means, ONE Lloyd step (argmin exact
    L2 via ||c||^2 - 2 x.c over integer-valued doubles, ties to the
    smallest code), re-encode against the trained codebooks, then
    asymmetric-distance (ADC) scoring: sim(query, vec) = sum over
    subspaces of (query subvector . codeword) / SCALE^2 — every number
    an exact integer < 2^53, so the replay hash-matches."""
    argmin = (
        "ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m "
        "ORDER BY list_dot_product(c.c, c.c) "
        "- 2 * list_dot_product(s.sub, c.c), c.k)"
    )
    means = """
      SELECT m, {key} AS k, list(h ORDER BY dim) AS c FROM (
        SELECT m, {key}, dim, round(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS h
        FROM (SELECT vec_id, m, code, generate_subscripts(sub, 1) AS dim,
                     unnest(sub) AS v FROM {src})
        GROUP BY m, {key}, dim
      ) GROUP BY m, k"""
    return f"""
    WITH e AS ({_EMB_Q}),
    subs AS (
      SELECT vec_id, m,
             list_slice(q, m * {PQ_DSUB} + 1, m * {PQ_DSUB} + {PQ_DSUB}) AS sub
      FROM e, (SELECT unnest(range({PQ_M})) AS m)
    ),
    cent0 AS ({means.format(key="code", src=f"(SELECT vec_id, m, vec_id % {PQ_K} AS code, sub FROM subs)")}),
    assign1 AS (
      SELECT vec_id, m, sub, k AS code FROM (
        SELECT s.vec_id, s.m, s.sub, c.k, {argmin} AS rn
        FROM subs s JOIN cent0 c ON c.m = s.m
      ) WHERE rn = 1
    ),
    cent1 AS ({means.format(key="code", src="assign1")}),
    codes AS (
      SELECT vec_id, m, k AS code FROM (
        SELECT s.vec_id, s.m, c.k, {argmin} AS rn
        FROM subs s JOIN cent1 c ON c.m = s.m
      ) WHERE rn = 1
    ),
    lut AS (
      SELECT q.vec_id AS query_id, c.m, c.k,
             list_dot_product(q.sub, c.c) AS dp
      FROM subs q JOIN cent1 c ON c.m = q.m
      WHERE q.vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT l.query_id, t.vec_id AS neighbor_id,
             SUM(l.dp) / {SCALE_SQ} AS sim
      FROM codes t JOIN lut l ON l.m = t.m AND l.k = t.code
      WHERE t.vec_id <> l.query_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= {TOP_K}
    """


def _pq_rounded_means(assign: DataFrame) -> DataFrame:
    """(m, code, c): per-(subspace, code) per-dim rounded mean of the
    assigned subvectors — the codebook update step; one narrow shuffle on
    (m, code, dim) with map-side partial aggregation."""
    return (
        assign.select("m", "code", F.posexplode("sub").alias("dim", "v"))
        .groupBy("m", "code", "dim")
        .agg(F.round(F.sum("v") / F.count("*")).alias("h"))
        .groupBy("m", "code")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "h"))),
                lambda s: s["h"],
            ).alias("c")
        )
    )


def _collect_pq_codebooks(cent_df: DataFrame) -> dict[int, tuple]:
    """{m: (code ids ascending, K×DSUB matrix)} — M*K*DSUB integers, a
    bounded driver collect at any corpus size (the codebook IS the
    compressed model)."""
    out: dict[int, tuple] = {}
    rows = sorted(cent_df.collect(), key=lambda r: (r["m"], r["code"]))
    for m in range(PQ_M):
        mine = [r for r in rows if r["m"] == m]
        out[m] = (
            np.array([r["code"] for r in mine]),
            np.stack([np.asarray(r["c"]) for r in mine]),
        )
    return out


def _pq_encode_kernel(cb: dict[int, tuple]):
    """Arrow-batch PQ encoder: one corpus pass, each vector's M codes by
    exact-integer argmin L2 against the closed-over codebooks (numpy's
    first-min rule reproduces the SQL tie-break: distance ASC, code ASC,
    because codebook rows are sorted by code). Emits the vector WITH its
    codes so the codebook-update aggregation needs no join back."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["q"].to_numpy())
            codes = []
            for m in range(PQ_M):
                ks, cmat = cb[m]
                xm = x[:, m * PQ_DSUB : (m + 1) * PQ_DSUB]
                dist = (cmat * cmat).sum(axis=1)[None, :] - 2.0 * (xm @ cmat.T)
                codes.append(ks[np.argmin(dist, axis=1)])
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "q": pdf["q"],
                    "codes": list(np.stack(codes, axis=1)),
                }
            )

    return fn


def _pq_score_kernel(q_ids: np.ndarray, lut: np.ndarray):
    """ADC scoring pass: ``lut[qi, m, k]`` holds (query qi's subvector m)
    · (codeword k) as exact integers; a database vector's approximate
    similarity is the sum of M table lookups — no vector arithmetic at
    query time, the PQ speed/memory trade (Jégou et al. 2011, §IV)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        marange = np.arange(PQ_M)
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["codes"].to_numpy())  # N x M
            ids = pdf["vec_id"].to_numpy()
            frames = []
            for qi, qid in enumerate(q_ids):
                sims = lut[qi][marange[None, :], codes].sum(axis=1) / SCALE_SQ
                keep = ids != qid
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": ids[keep],
                            "sim": sims[keep],
                        }
                    )
                )
            yield pd.concat(frames)

    return fn


@query("ann_pq_topk", oracle=_pq_sql())
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCT-QUANTIZATION ANN (Jégou et al. 2011): the 64-dim embedding
    splits into PQ_M=8 subspaces; each learns a PQ_K=32-codeword codebook
    (init from vec_id % K means, one exact Lloyd step), compressing every
    vector to M small codes — 64 floats → 8 codes, the memory-bound ANN
    regime IVF/LSH don't cover. Queries score candidates by ASYMMETRIC
    DISTANCE: per query, an M×K lookup table of (subvector · codeword)
    dots is precomputed once, and each database vector's similarity is M
    table lookups summed — no per-pair vector math. All arithmetic is
    exact integer-valued doubles (module docstring), so the DuckDB oracle
    replays codebook training, encoding and ADC bit-for-bit.

    Plan shape at 100 TB: codebooks are M·K·(d/M) integers — broadcast
    into Arrow-batched corpus passes (train: 2 passes, encode: 1); the
    codes table is ~M bytes/vector (the point of PQ — it FITS in memory
    where raw vectors don't); scoring is one mapInPandas pass over codes
    with the query LUTs closed over, then a distributed per-query top-k
    window. No shuffle touches raw vectors after encoding; the only
    driver traffic is the codebook (KBs)."""
    e = persist_tracked(_quantized(spark, sf_dir))

    def exploded(assign: DataFrame) -> DataFrame:
        # (m, code, sub) rows for the codebook-update aggregation
        entries = F.array(
            *[
                F.struct(
                    F.lit(m).alias("m"),
                    F.col("codes")[m].alias("code"),
                    F.slice("q", m * PQ_DSUB + 1, PQ_DSUB).alias("sub"),
                )
                for m in range(PQ_M)
            ]
        )
        return assign.select(F.explode(entries).alias("s")).select(
            "s.m", "s.code", "s.sub"
        )

    # init codebooks: vec_id % K assignment, rounded means per subspace
    init = e.select(
        "vec_id",
        "q",
        F.array(*[(F.col("vec_id") % PQ_K) for _ in range(PQ_M)]).alias("codes"),
    )
    cb0 = _collect_pq_codebooks(_pq_rounded_means(exploded(init)))
    # one Lloyd step: re-assign, recompute the means
    assign1 = persist_tracked(
        e.mapInPandas(
            _pq_encode_kernel(cb0),
            schema="vec_id bigint, q array<double>, codes array<bigint>",
        )
    )
    cb1 = _collect_pq_codebooks(_pq_rounded_means(exploded(assign1)))
    # final encode against the trained codebooks
    codes = e.mapInPandas(
        _pq_encode_kernel(cb1),
        schema="vec_id bigint, q array<double>, codes array<bigint>",
    ).select("vec_id", "codes")
    # query LUTs: exact integer dots of each query subvector x codeword.
    # lut is dense K-wide; codebooks may have FEWER live codes — scatter
    # by code id so codes index directly
    q_rows = sorted(
        e.where(F.col("vec_id") < N_QUERIES).collect(), key=lambda r: r["vec_id"]
    )
    q_ids = np.array([r["vec_id"] for r in q_rows])
    q_mat = np.stack([np.asarray(r["q"]) for r in q_rows])
    lut = np.zeros((len(q_ids), PQ_M, PQ_K))
    for m in range(PQ_M):
        ks, cmat = cb1[m]
        sub = q_mat[:, m * PQ_DSUB : (m + 1) * PQ_DSUB]
        lut[:, m, ks] = sub @ cmat.T
    scored = codes.mapInPandas(
        _pq_score_kernel(q_ids, lut),
        schema="query_id bigint, neighbor_id bigint, sim double",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "sim")
    )
