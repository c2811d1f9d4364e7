"""train_sparse_logreg iteration-cost experiment (r15, VERDICT ask #7).

Times the sparse GD fit at iters = 1, 2, 4 (declared query: 4) with
the noop sink, twice each, to decompose the query into fixed cost
(postings build + persists) vs per-iteration cost (one corpus-keyed
z-aggregate + one j-keyed gradient exchange + one eager checkpoint per
iteration). Measurement-only — the declared query never changes;
"fewer, heavier iterations" (guide §2.2) would change the GD trace the
oracle replays, so the options on the table are only scheduling-level.

Usage: python scripts/sparse_logreg_iters.py [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()
    os.environ.setdefault(
        "SPARK_GRAFT_SCRATCH", f"/root/repo/.scratch/slr-{os.getpid()}"
    )

    from pyspark.sql import functions as F

    from fuzzy_item_matching_spark import get_spark
    from fuzzy_item_matching_spark.functions.text import (
        md5_bucket,
        regex_tokenize,
    )
    from fuzzy_item_matching_spark.operators.logreg import (
        sparse_logistic_gd_fit,
    )
    from fuzzy_item_matching_spark.queries.training import (
        _QD_DIM,
        _QD_LR,
        _qd_doc_frame,
    )
    from fuzzy_item_matching_spark.tables import load_table

    spark = get_spark(app_name="sparse-logreg-iters-r15")
    spark.range(1000).selectExpr("sum(id)").collect()
    sf_dir = args.sf_dir

    def build():
        docs = _qd_doc_frame(spark, sf_dir)
        rows = docs.select(F.col("doc_id").alias("row_id"), "label")
        d = load_table(spark, sf_dir, "documents")
        pres = (
            d.select("doc_id", F.explode(regex_tokenize("text")).alias("tok"))
            .select(
                F.col("doc_id").alias("row_id"),
                (md5_bucket("tok", _QD_DIM) + 1).cast("int").alias("j"),
            )
            .groupBy("row_id", "j")
            .agg((F.count(F.lit(1)) / 8.0).alias("x"))
        )
        inter = rows.select(
            "row_id", F.lit(0).alias("j"), F.lit(1.0).alias("x")
        )
        return rows, inter.unionByName(pres)

    for iters in (1, 2, 4):
        for p in range(args.passes):
            spark.catalog.clearCache()
            rows, postings = build()
            spark.sparkContext.setJobDescription(f"sparse GD iters={iters}")
            t0 = time.monotonic()
            out = sparse_logistic_gd_fit(
                rows, postings, iters=iters, lr=_QD_LR, n_features=_QD_DIM
            )
            out.write.mode("overwrite").format("noop").save()
            dt = time.monotonic() - t0
            spark.sparkContext.setJobDescription(None)
            print(f"iters={iters} pass={p + 1}: {dt:.3f}s", flush=True)


if __name__ == "__main__":
    main()
