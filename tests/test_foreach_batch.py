"""Exactly-once streaming sink via foreachBatch: idempotent writes keyed by
(batch_id) so replayed micro-batches don't duplicate output — the standard
pattern for sinks without native transactional support."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mr_spark.sources import load_table
from mr_spark.streaming import events_file_stream

from conftest import SF_DIR


def test_foreach_batch_idempotent_sink(spark, tmp_path):
    out_dir = str(tmp_path / "batches")
    seen: set[int] = set()
    double_called: list[int] = []

    def write_batch(df, batch_id: int):
        # idempotence: a replayed batch_id overwrites its own directory
        # rather than appending — rerunning a batch is harmless
        target = os.path.join(out_dir, f"batch_id={batch_id}")
        df.write.mode("overwrite").parquet(target)
        if batch_id in seen:
            double_called.append(batch_id)
        seen.add(batch_id)
        # simulate a replay of the first batch: call the writer again
        if batch_id == 0 and not double_called:
            df.write.mode("overwrite").parquet(target)

    stream = events_file_stream(
        spark, os.path.join(SF_DIR, "events.parquet"), max_files_per_trigger=1
    )
    q = (
        stream.select("event_id", "user_id", "event_type")
        .writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    result = spark.read.parquet(out_dir)
    golden = load_table(spark, SF_DIR, "events").count()
    assert result.count() == golden  # no duplicates despite the replayed write
    assert result.select("event_id").distinct().count() == golden
