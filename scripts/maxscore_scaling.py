"""sim_maxscore_topk Σdf² scaling evidence (r15, VERDICT r14 ask #7).

The r14 analysis claims MaxScore's essential-terms split prunes the
Σ df² candidate shuffle and that the pruning ratio GROWS with the
corpus. This script converts the analysis into numbers: at each SF it
counts (a) total postings, (b) essential postings (the candidate
join's probe side), (c) candidate pairs generated from essential
postings (what the query shuffles), and (d) candidate pairs a plain
full-postings join would generate (the Σ df² baseline the pruning
avoids) — plus the wall time of the candidate stage both ways.

Measurement-only: the declared query is never changed.

Usage: python scripts/maxscore_scaling.py [--sf-dirs DIR ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dirs", nargs="+",
        default=["/root/testdata/sf0.01", "/root/testdata/sf0.1"],
    )
    args = ap.parse_args()
    os.environ.setdefault(
        "SPARK_GRAFT_SCRATCH", f"/root/repo/.scratch/maxsc-{os.getpid()}"
    )

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from fuzzy_item_matching_spark import get_spark
    from fuzzy_item_matching_spark.functions.text import regex_tokenize
    from fuzzy_item_matching_spark.operators.features import tfidf_features
    from fuzzy_item_matching_spark.queries.similarity import (
        _MAXSCORE_QMOD,
        _MAXSCORE_THETA,
    )
    from fuzzy_item_matching_spark.tables import load_table

    spark = get_spark(app_name="maxscore-scaling-r15")
    spark.range(1000).selectExpr("sum(id)").collect()

    for sf_dir in args.sf_dirs:
        d = load_table(spark, sf_dir, "documents")
        toks = d.select("doc_id", regex_tokenize("text").alias("toks"))
        feats = tfidf_features(
            toks, ["doc_id"], "toks", binary=True, max_df_ratio=0.9
        ).persist()
        n_post = feats.count()
        ub = feats.groupBy("term").agg(F.max("weight").alias("ub"))
        wq = feats.filter(F.col("doc_id") % _MAXSCORE_QMOD == 0).select(
            F.col("doc_id").alias("q"), "term", F.col("weight").alias("wq")
        )
        qt = wq.join(ub, "term").withColumn("c", F.col("wq") * F.col("ub"))
        cum = Window.partitionBy("q").orderBy("c", "term").rowsBetween(
            Window.unboundedPreceding, 0
        )
        ess = (
            qt.withColumn("csum", F.sum("c").over(cum))
            .filter(F.col("csum") >= _MAXSCORE_THETA)
            .select("q", "term")
            .persist()
        )
        n_q = wq.count()
        n_ess = ess.count()

        post = feats.select(F.col("doc_id").alias("d"), "term")

        spark.sparkContext.setJobDescription("maxscore: pruned candidates")
        t0 = time.monotonic()
        n_cand = (
            ess.join(post, "term")
            .filter(F.col("d") != F.col("q"))
            .select("q", "d")
            .distinct()
            .count()
        )
        t_pruned = time.monotonic() - t0

        spark.sparkContext.setJobDescription("maxscore: full Σdf² candidates")
        t0 = time.monotonic()
        n_full = (
            wq.select("q", "term")
            .join(post, "term")
            .filter(F.col("d") != F.col("q"))
            .select("q", "d")
            .distinct()
            .count()
        )
        t_full = time.monotonic() - t0
        spark.sparkContext.setJobDescription(None)

        print(
            f"{sf_dir}: postings={n_post} query_postings={n_q} "
            f"essential={n_ess} ({100.0 * n_ess / max(n_q, 1):.1f}% of "
            f"query postings) cand_pruned={n_cand} ({t_pruned:.2f}s) "
            f"cand_full={n_full} ({t_full:.2f}s) "
            f"cand_ratio={n_cand / max(n_full, 1):.3f}",
            flush=True,
        )
        feats.unpersist()
        ess.unpersist()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
