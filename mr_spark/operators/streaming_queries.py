"""Structured Streaming entries for the driver harness.

The ``events`` parquet drives a real streaming query (readStream →
watermark + tumbling window → memory sink, processAllAvailable) whose final
result is returned as a batch DataFrame — so the streaming path is exercised
by the same oracle machinery as everything else. Tumbling windows align to
epoch hour boundaries, so the DuckDB twin is date_trunc('hour').
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import normalize_event_ts
from . import query

_SINK = "mrspark_stream_hourly"


@query(
    "stream_hourly_agg",
    oracle="""
    SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour_start,
           event_type,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed aggregation run as a REAL streaming query
    (file source, complete mode, memory sink) drained synchronously.

    Watermarking note: complete mode keeps all windows, so the batch parity
    holds exactly; the append-mode + watermark variant (late-data handling)
    is exercised in tests/test_streaming.py."""
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # the file stream source takes a directory; pathGlobFilter selects the
    # events table out of the sf_dir
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    stream = normalize_event_ts(stream)
    agg = (
        stream.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
    )
    from ..streaming import run_to_completion

    result = run_to_completion(
        agg, name=_SINK, output_mode="complete", state_partitions=8
    )
    return result.select(
        F.col("window.start").alias("hour_start"), "event_type", "n", "total_value"
    )


@query(
    "stream_stream_join",
    oracle="""
    WITH ev AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
                FROM events),
    p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts FROM ev
          WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS click_id, user_id, ts AS c_ts FROM ev
          WHERE event_type = 'click')
    SELECT p.purchase_id, c.click_id, p.user_id
    FROM p JOIN c ON p.user_id = c.user_id
       AND c.c_ts BETWEEN p.p_ts - INTERVAL 1 HOUR AND p.p_ts
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM inner join with an event-time range condition:
    purchases joined to same-user clicks from the preceding hour, both
    sides read as streams. Watermarks bound each side's join state; the
    time-range condition lets Spark evict rows that can no longer match.
    With the watermark wider than the data span, append-mode emits exactly
    the batch join — which is the oracle."""
    from ..streaming import events_file_stream, run_to_completion

    path = os.path.join(sf_dir, "events.parquet")
    purchases = (
        events_file_stream(spark, path)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "720 hours")
    )
    clicks = (
        events_file_stream(spark, path)
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "720 hours")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    ).select("purchase_id", "click_id", "user_id")
    return run_to_completion(
        joined, name="mrspark_stream_join", output_mode="append", state_partitions=8
    )


@query(
    "stream_session_window",
    oracle="""
    WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM islands GROUP BY user_id, sid
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's BUILT-IN session_window (dynamic gap windows) as a streaming
    query, complete mode — the declarative counterpart of the custom
    applyInPandasWithState operator (stream_sessionize_stateful). Oracle:
    batch gaps-and-islands; session_window's end = last event + gap."""
    from ..streaming import events_file_stream, run_to_completion

    stream = events_file_stream(spark, os.path.join(sf_dir, "events.parquet"))
    agg = (
        stream.withWatermark("ts", "720 hours")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    result = run_to_completion(
        agg, name="mrspark_session_window", output_mode="complete", state_partitions=8
    )
    return result.select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events",
    )


@query(
    "stream_static_join",
    oracle="""
    SELECT c.c_mktsegment AS segment, e.event_type, COUNT(*) AS n
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC join: the streaming side enriched against a static
    dimension (the broadcast-dimension pattern for streams — no state, the
    static side is re-read per micro-batch). Complete-mode agg equals the
    batch join = oracle."""
    from ..sources import load_table
    from ..streaming import events_file_stream, run_to_completion

    stream = events_file_stream(spark, os.path.join(sf_dir, "events.parquet"))
    customers = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = stream.join(customers, stream.user_id == customers.c_custkey)
    agg = joined.groupBy(
        F.col("c_mktsegment").alias("segment"), F.col("event_type")
    ).agg(F.count("*").alias("n"))
    return run_to_completion(
        agg, name="mrspark_stream_static", output_mode="complete", state_partitions=8
    )


@query(
    "stream_dedup_events",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING EXACT DEDUP under at-least-once delivery: the events file
    is fed TWICE (two micro-batches of identical data — the classic
    replayed-Kafka-offset failure), dropDuplicates state collapses the
    replay, and the per-type counts must equal the SINGLE copy's counts —
    which is exactly the oracle. A non-deduplicating pipeline would double
    every count, so the pass is direct evidence the operator works.

    State design at 100 TB: dedup state is keyed by (event_id, ts) and the
    watermark bounds it — ids older than the delay are evicted, so memory
    is O(events within the watermark window), not O(stream history)."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from ..streaming import events_file_stream, run_to_completion, stream_dedup

    from ._demo import mkdtemp_scratch

    src = _os.path.join(sf_dir, "events.parquet")
    stream_dir = mkdtemp_scratch("mrspark_dedup_")
    for i in range(2):
        _shutil.copy(src, _os.path.join(stream_dir, f"batch_{i}.parquet"))
        _os.utime(
            _os.path.join(stream_dir, f"batch_{i}.parquet"),
            (1_700_000_000 + i, 1_700_000_000 + i),
        )
    stream = events_file_stream(spark, stream_dir, max_files_per_trigger=1)
    # the per-type agg runs INSIDE the streaming query (complete mode), so
    # the memory sink holds 5 rows, not the whole deduped stream
    agg = (
        stream_dedup(stream, watermark="720 hours")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    try:
        return run_to_completion(
            agg,
            name="mrspark_stream_dedup",
            output_mode="complete",
            state_partitions=8,
        )
    finally:
        _shutil.rmtree(stream_dir, ignore_errors=True)


@query(
    "stream_trending_topk",
    oracle="""
    WITH counts AS (
      SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour_start,
             event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT hour_start, event_type, n FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY hour_start
                                   ORDER BY n DESC, event_type) AS rn
      FROM counts
    ) WHERE rn <= 2
    """,
)
def stream_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending-items pattern: a streaming windowed count (real readStream,
    complete mode) with the per-window top-k rank applied to the sink
    output — the standard split, since rank-over-aggregate isn't an
    incremental streaming operator: the stream maintains the counts, the
    serving read ranks them (in production, the same rank runs inside
    foreachBatch or on the results table). Deterministic event_type
    tie-break."""
    from pyspark.sql import Window

    from ..streaming import run_to_completion

    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    stream = normalize_event_ts(stream)
    counts = stream.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count("*").alias("n")
    )
    result = run_to_completion(
        counts, name="mrspark_stream_topk", output_mode="complete",
        state_partitions=8,
    )
    w = Window.partitionBy("hour_start").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        result.select(F.col("window.start").alias("hour_start"), "event_type", "n")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("hour_start", "event_type", "n")
    )


# per-process memo for the event-time-ordered replay dir (immutable once
# written; pid-scoped via _demo.demo_path, cleaned at exit)
_ORDERED_REPLAY: dict = {}


def _ordered_events_replay(spark: SparkSession, sf_dir: str, n_files: int = 4) -> str:
    """EVENT-TIME-ORDERED file replay of the events table: rows
    range-partitioned on ``ts`` into ``n_files`` parquet files whose
    modification times are forced ascending, so the file stream
    (maxFilesPerTrigger=1) delivers micro-batches in event-time order —
    batch i+1's earliest row is never older than batch i's watermark.
    That makes a SMALL watermark sound for correctness tests: nothing is
    ever late, yet the watermark genuinely advances between batches and
    drives state eviction (the thing a 720-hour everything-is-early
    watermark can never exercise). This is the streaming-test analog of
    replaying a Kafka topic partitioned by time."""
    import time as _time

    key = (sf_dir, n_files)
    path = _ORDERED_REPLAY.get(key)
    if path and os.path.isdir(path):
        return path
    from ..sources import load_table
    from ._demo import demo_path

    # the dir name must carry the SOURCE identity too: the memo is keyed
    # by (sf_dir, n_files), so a shared name would let a second sf_dir
    # (scale probe, multi-SF test run) overwrite the first's files while
    # the first's memo still points there
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = demo_path(f"events_ordered_{n_files}_{tag}")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    (
        ev.repartitionByRange(n_files, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(path)
    )
    # range partition i holds the i-th ts slice and lands as part-0000i-*;
    # force mtimes ascending in that order so the file source (which
    # sorts by modification time) picks them up oldest-slice first
    parts = sorted(fn for fn in os.listdir(path) if fn.endswith(".parquet"))
    base_t = _time.time() - 3600
    for i, fn in enumerate(parts):
        os.utime(os.path.join(path, fn), (base_t + i, base_t + i))
    _ORDERED_REPLAY[key] = path
    return path


@query(
    "stream_stream_left_join",
    # unmatched purchases emit ONLY once the watermark proves no click
    # can still arrive — the 2h cutoff keeps every retained purchase
    # strictly below the final watermark (max ts - 1h), so the streaming
    # result is exactly the relational left join the oracle computes
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      FROM events
    ),
    mx AS (
      SELECT LEAST(
        MAX(CASE WHEN event_type = 'purchase' THEN ts END),
        MAX(CASE WHEN event_type = 'click' THEN ts END)
      ) AS m
      FROM ev
    ),
    p AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts
      FROM ev, mx
      WHERE event_type = 'purchase' AND ts <= m - INTERVAL 2 HOUR
    ),
    c AS (
      SELECT event_id AS click_id, user_id AS c_user_id, ts AS c_ts
      FROM ev WHERE event_type = 'click'
    )
    SELECT purchase_id, click_id, user_id
    FROM p LEFT JOIN c
      ON user_id = c_user_id
     AND c_ts >= p_ts - INTERVAL 1 HOUR
     AND c_ts <= p_ts
    """,
)
def stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM LEFT OUTER join with WATERMARK STATE EVICTION — the
    join mode the inner stream_stream_join cannot exercise: an unmatched
    purchase is held in the state store until the watermark passes the
    last instant a matching click could still arrive (here p_ts, the
    range's upper bound), and only then emits with a NULL click — Spark's
    outer-join eviction contract. The inner query's 720-hour watermark
    would never evict, so this query replays events in EVENT-TIME ORDER
    (range-partitioned files with ascending mtimes — see
    _ordered_events_replay) and uses a 1-hour watermark: nothing is ever
    late, yet the watermark advances every micro-batch and flushes each
    resolved purchase. Purchases near the stream's end are excluded from
    the RESULT (sink-side here, WHERE-clause in the oracle) because
    their no-more-matches proof never arrives before a finite stream
    ends — and the cutoff anchors to the COMBINED watermark, which is
    the MIN over both sides' own event-time maxima (each side's
    watermark sees only its event_type's rows; Spark's
    multipleWatermarkPolicy=min), minus the 1h delay: every retained
    purchase sits strictly below it, so the streaming result equals the
    relational left join exactly.

    Scale: outer-join state is bounded by the watermark horizon — each
    side holds only rows younger than (watermark − join range), evicted
    continuously; a day-long range over a year-long stream keeps a day
    of state, not a year. State store partitions = shuffle partitions,
    sized via run_to_completion(state_partitions=8)."""
    from ..streaming import run_to_completion

    replay = _ordered_events_replay(spark, sf_dir)
    schema = spark.read.parquet(replay).schema
    # the cutoff anchors to the COMBINED final watermark, which under the
    # default multipleWatermarkPolicy=min is the MINIMUM over both sides'
    # own event-time maxima (each side's watermark advances only on the
    # rows that pass ITS event_type filter) minus the 1h delay — the
    # global MAX(ts) would overshoot whenever one side's last event lags
    # the other's by more than the margin, leaving unmatched purchases
    # below the cutoff but above the real watermark stuck in state
    # (1-row bounded batch aggregate, mirrored by the oracle's LEAST)
    from ..sources import load_table

    mx = (
        load_table(spark, sf_dir, "events")
        .agg(
            F.least(
                F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
                F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
            )
        )
        .collect()[0][0]
    )

    def side(event_type: str):
        # two replay files per micro-batch: per-trigger fixed cost
        # (offset log, planning, state-store commit — measured ~850 ms
        # per trigger against ~600 ms of useful addBatch work) halves.
        # OUTPUT-IDENTITY INVARIANT (do not weaken): this is safe only
        # because _ordered_events_replay writes files in strict
        # event-time order, so no row is ever late — batching can never
        # change which rows sit in state when their partner arrives or
        # when the watermark evicts them; the final combined watermark
        # (the only input to the eviction proofs above) is unchanged
        # too. If the replay file layout ever stops being time-ordered,
        # the emitted set becomes trigger-size-dependent.
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(replay)
            .where(F.col("event_type") == event_type)
        )

    # the 2h cutoff is applied to the SINK OUTPUT, not the input stream:
    # filtering purchases by the cutoff before withWatermark would cap
    # the purchase side's own watermark at (cutoff − 1h), and the
    # no-more-matches proof uses the COMBINED (min) watermark — the last
    # retained purchases could then never evict. Uncapped, the combined
    # watermark reaches min(side maxima) − 1h = cutoff + 1h, strictly
    # above every retained p_ts.
    purchases = (
        side("purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        side("click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left_outer",
    ).select("purchase_id", "click_id", "user_id", "p_ts")
    out = run_to_completion(
        joined,
        name="mrspark_stream_left_join",
        output_mode="append",
        state_partitions=8,
    )
    return out.where(
        F.col("p_ts") <= F.lit(mx) - F.expr("INTERVAL 2 HOUR")
    ).select("purchase_id", "click_id", "user_id")


@query(
    "stream_stream_full_join",
    # BOTH unmatched sides emit only once the combined watermark proves
    # no partner can still arrive: purchases evict past p_ts (the range's
    # upper bound for clicks), clicks past c_ts + 1h (the last purchase
    # instant that could still match) — so the symmetric 2h cutoff keeps
    # every retained row's eviction point strictly below the final
    # combined watermark (min of both sides' maxima − 1h), and the
    # streaming result equals the relational FULL OUTER join exactly
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      FROM events
    ),
    mx AS (
      SELECT LEAST(
        MAX(CASE WHEN event_type = 'purchase' THEN ts END),
        MAX(CASE WHEN event_type = 'click' THEN ts END)
      ) AS m
      FROM ev
    ),
    p_all AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts
      FROM ev WHERE event_type = 'purchase'
    ),
    c_all AS (
      SELECT event_id AS click_id, user_id AS c_user_id, ts AS c_ts
      FROM ev WHERE event_type = 'click'
    ),
    p_cut AS (
      SELECT * FROM p_all, mx WHERE p_ts <= m - INTERVAL 2 HOUR
    ),
    c_cut AS (
      -- STRICT: a click at exactly m - 2h has eviction point c_ts + 1h
      -- equal to (not strictly below) the final combined watermark
      -- m - 1h, so its NULL-purchase row may never emit — the click
      -- side has no slack at the boundary (the purchase side has 1h)
      SELECT * FROM c_all, mx WHERE c_ts < m - INTERVAL 2 HOUR
    )
    SELECT purchase_id, click_id, user_id
    FROM p_cut LEFT JOIN c_all
      ON user_id = c_user_id
     AND c_ts >= p_ts - INTERVAL 1 HOUR
     AND c_ts <= p_ts
    UNION ALL
    SELECT NULL AS purchase_id, click_id, c_user_id AS user_id
    FROM c_cut
    WHERE NOT EXISTS (
      SELECT 1 FROM p_all
      WHERE p_all.user_id = c_cut.c_user_id
        AND p_all.p_ts >= c_cut.c_ts
        AND p_all.p_ts <= c_cut.c_ts + INTERVAL 1 HOUR
    )
    """,
)
def stream_stream_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM FULL OUTER join — the last join mode in the matrix
    (inner: stream_stream_join; left: stream_stream_left_join): BOTH
    sides hold unmatched rows in state until the combined watermark
    proves no partner can still arrive, then emit with a NULL other
    side. A purchase's proof point is p_ts itself (clicks match in
    [p_ts − 1h, p_ts]); a click's is c_ts + 1h (purchases match in
    [c_ts, c_ts + 1h]) — so the SYMMETRIC sink-side 2h cutoff keeps
    every retained row's eviction point strictly below the final
    combined watermark (min over both sides' own event-time maxima,
    multipleWatermarkPolicy=min, minus the 1h delay), making the finite
    stream's output exactly the relational FULL OUTER join the oracle
    computes (left part ∪ never-matched clicks, matched-pair rows
    keyed by the purchase cutoff exactly like the left-join query).

    Same ordered replay + uncapped-input discipline as the left join:
    cutoffs apply to the SINK OUTPUT only — pre-filtering either input
    would cap that side's watermark below what the eviction proofs
    need.

    Scale: state on EACH side is bounded by the watermark horizon
    (rows younger than watermark − range), evicted continuously — the
    same bound as the left join, now paid symmetrically."""
    from ..sources import load_table
    from ..streaming import run_to_completion

    replay = _ordered_events_replay(spark, sf_dir)
    schema = spark.read.parquet(replay).schema
    mx = (
        load_table(spark, sf_dir, "events")
        .agg(
            F.least(
                F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
                F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
            )
        )
        .collect()[0][0]
    )

    def side(event_type: str):
        # two replay files per micro-batch: per-trigger fixed cost
        # (offset log, planning, state-store commit — measured ~850 ms
        # per trigger against ~600 ms of useful addBatch work) halves.
        # OUTPUT-IDENTITY INVARIANT (do not weaken): this is safe only
        # because _ordered_events_replay writes files in strict
        # event-time order, so no row is ever late — batching can never
        # change which rows sit in state when their partner arrives or
        # when the watermark evicts them; the final combined watermark
        # (the only input to the eviction proofs above) is unchanged
        # too. If the replay file layout ever stops being time-ordered,
        # the emitted set becomes trigger-size-dependent.
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(replay)
            .where(F.col("event_type") == event_type)
        )

    purchases = (
        side("purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        side("click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "full_outer",
    ).select(
        "purchase_id", "click_id", "user_id", "c_user_id", "p_ts", "c_ts"
    )
    out = run_to_completion(
        joined,
        name="mrspark_stream_full_join",
        output_mode="append",
        state_partitions=8,
    )
    cutoff = F.lit(mx) - F.expr("INTERVAL 2 HOUR")
    # click-only rows use STRICT < : their eviction point is c_ts + 1h,
    # which at c_ts == cutoff only EQUALS the final combined watermark —
    # no slack, so the emission proof is missing exactly at the boundary
    return out.where(
        F.when(F.col("purchase_id").isNotNull(), F.col("p_ts") <= cutoff)
        .otherwise(F.col("c_ts") < cutoff)
    ).select(
        "purchase_id",
        "click_id",
        F.coalesce(F.col("user_id"), F.col("c_user_id")).alias("user_id"),
    )
