"""Checkpoint recovery: a stateful streaming aggregation stopped and
restarted from its checkpoint must (a) not reprocess already-committed
input and (b) restore its state store — so the serving table it
maintains via foreachBatch MERGE ends bit-equal to the batch
aggregation over ALL input, regardless of the restart.

Deterministic construction (no timing games): run 1 drains file A with
availableNow and stops; file B is added only AFTER run 1 commits; run
2 restarts from the same checkpoint and drains what's new. If the
restart lost state, user totals spanning both files would be wrong; if
it reprocessed file A, totals would double — the final equality check
catches both.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from fuzzy_item_matching_spark.operators.merge import merge_upsert

ROOT = "/root/repo/.scratch/stream_recovery"
SRC = os.path.join(ROOT, "src")
CKPT = os.path.join(ROOT, "ckpt")
TARGET = os.path.join(ROOT, "target")


def _write_file(name: str, lo: int, hi: int) -> None:
    vals = list(range(lo, hi))
    tbl = pa.table(
        {
            "user_id": pa.array([v % 7 for v in vals], type=pa.int64()),
            "v": pa.array(vals, type=pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(SRC, name))


def _run_once(spark) -> None:
    schema = spark.read.parquet(SRC).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(SRC)
    )
    agg = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")
    )

    def upsert(batch_df, batch_id: int) -> None:
        tgt = spark.read.parquet(TARGET)
        merged = merge_upsert(tgt, batch_df, keys=["user_id"])
        tmp = f"{TARGET}__b{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(TARGET)
        os.rename(tmp, TARGET)

    q = (
        agg.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", CKPT)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_restart_resumes_from_checkpoint(spark):
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(SRC, exist_ok=True)
    spark.createDataFrame(
        [], "user_id long, n long, total long"
    ).write.mode("overwrite").parquet(TARGET)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        _write_file("a.parquet", 0, 50)
        _run_once(spark)
        after_a = {
            r["user_id"]: (r["n"], r["total"])
            for r in spark.read.parquet(TARGET).collect()
        }
        assert sum(n for n, _ in after_a.values()) == 50

        _write_file("b.parquet", 50, 100)
        _run_once(spark)  # restart: same checkpoint, new file only
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    final = {
        r["user_id"]: (r["n"], r["total"])
        for r in spark.read.parquet(TARGET).collect()
    }
    expected = {
        u: (
            sum(1 for v in range(100) if v % 7 == u),
            sum(v for v in range(100) if v % 7 == u),
        )
        for u in range(7)
    }
    # state restored AND file A not reprocessed -> exact batch totals
    assert final == expected
