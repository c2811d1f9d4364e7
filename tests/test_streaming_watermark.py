"""Watermark semantics: late rows are dropped once their window's
state has been evicted — exercised with a real three-micro-batch file
stream (maxFilesPerTrigger=1), not a mock.

Timing subtlety this test pins down: a late row that arrives in the
SAME batch where its window finalizes still merges (state exists until
end-of-batch eviction); the drop happens when the row arrives AFTER
eviction. Hence three batches: on-time data → watermark advance +
window emission → late arrival (dropped).
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

SRC = "/root/repo/.scratch/stream_late"


def _write_batches():
    shutil.rmtree(SRC, ignore_errors=True)
    os.makedirs(SRC, exist_ok=True)
    base = pd.Timestamp("2024-01-01 10:00:00")
    # Batch 0 (on time): one event per minute 10:00..10:49, plus two
    # extra in the 10:05 window. End-of-batch watermark: 10:39.
    b0 = [base + pd.Timedelta(minutes=m) for m in range(50)]
    b0 += [base + pd.Timedelta(minutes=5, seconds=s) for s in (10, 20)]
    # Batch 1: fresh event at 11:00. Runs with wm=10:39 → emits+evicts
    # all windows ending ≤ 10:39 (10:05 emits with count 3);
    # end-of-batch watermark: 10:50.
    b1 = [base + pd.Timedelta(minutes=60)]
    # Batch 2: LATE event at 10:05:30 — its window was evicted, row is
    # dropped by the watermark.
    b2 = [base + pd.Timedelta(minutes=5, seconds=30)]
    for i, ts in enumerate([b0, b1, b2]):
        tbl = pa.table({"ts": pa.array(ts, type=pa.timestamp("us"))})
        path = os.path.join(SRC, f"batch{i}.parquet")
        pq.write_table(tbl, path)
        os.utime(path, (time.time() + i * 10, time.time() + i * 10))


def test_watermark_drops_late_rows(spark):
    _write_batches()
    schema = spark.read.parquet(SRC).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(SRC)
    )
    agg = (
        # Watermarks require TIMESTAMP (tz-aware); plain parquet micros
        # arrive as TIMESTAMP_NTZ.
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sink = f"wm_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = [
        (r.w.start.strftime("%H:%M"), r.n) for r in spark.table(sink).collect()
    ]
    rows = dict(emitted)
    assert len(emitted) == len(rows), f"window emitted twice: {sorted(emitted)}"
    # 10:05 window closed before the late row arrived: count is the
    # on-time 3, and no second emission happened for the late row.
    assert rows["10:05"] == 3, rows
    assert rows["10:00"] == 1 and rows["10:49"] == 1
    # The 11:00 window is still open (final wm 10:50) → not emitted.
    assert "11:00" not in rows
    # The state operator actually counted the dropped late row.
    dropped = sum(
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1, f"expected exactly the late row dropped, got {dropped}"
