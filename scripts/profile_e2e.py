"""serve_end_to_end stage profile (r15, VERDICT r14 ask #8).

Times each lifecycle stage of serve_end_to_end separately with the
noop sink (same session, same caches the composed query would hit),
so OPTIMIZATION_r15.md can carry a stage table proving no stage
regained dominance after the r14 component optimizations.

The stage boundaries mirror queries/serving.py serve_end_to_end; this
script never changes the query — it re-runs the same constructors the
query calls, labeled per stage (guide §1.5).

Usage: python scripts/profile_e2e.py [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    os.environ.setdefault(
        "SPARK_GRAFT_SCRATCH", f"/root/repo/.scratch/e2e-{os.getpid()}"
    )
    from pyspark.sql import functions as F

    from fuzzy_item_matching_spark import get_spark
    from fuzzy_item_matching_spark.queries import load_all

    spark = get_spark(app_name="profile-e2e-r15")
    registry = load_all()
    spark.range(1000).selectExpr("sum(id)").collect()

    sf_dir = args.sf_dir

    def timed(label, fn):
        spark.sparkContext.setJobDescription(f"e2e profile: {label}")
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        print(f"{label:28s} {dt:7.3f}s", flush=True)
        spark.sparkContext.setJobDescription(None)
        return out

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    # Whole query first (cold in this session), then stage-by-stage.
    q = registry["serve_end_to_end"]
    timed("whole query (cold)", lambda: noop(q.fn(spark, sf_dir)))
    spark.catalog.clearCache()

    # --- stages, mirroring queries/serving.py serve_end_to_end ---
    from fuzzy_item_matching_spark.functions.vector import squared_dist
    from fuzzy_item_matching_spark.operators.boosting import gboost_fit
    from fuzzy_item_matching_spark.operators.lsh import lsh_sqdist_join
    from fuzzy_item_matching_spark.operators.merge import merge_upsert
    from fuzzy_item_matching_spark.operators.pipeline import (
        Pipeline,
        column_stage,
        sql_stage,
    )
    from fuzzy_item_matching_spark.queries.serving import (
        _E2E_BUCKET_CAP,
        _E2E_FEATS,
        _E2E_ROUNDS,
        _cap_candidates,
    )
    from fuzzy_item_matching_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    featurize = Pipeline().add(
        "cast", column_stage(emb=F.col("embedding").cast("array<double>"))
    ).add("project", sql_stage("SELECT vec_id, emb FROM __THIS__"))
    base = featurize.transform(e)
    timed("1 featurize", lambda: noop(base))

    updates = base.filter(F.col("vec_id") % 7 == 0).withColumn(
        "emb", F.transform("emb", lambda x: x * F.lit(1.1))
    )
    inserts = base.filter(F.col("vec_id") % 9 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("emb", lambda x: x * F.lit(0.9)).alias("emb"),
    )
    merged = merge_upsert(
        base, updates.unionByName(inserts), keys=["vec_id"]
    ).persist()
    timed("2 merge_upsert (persist)", lambda: noop(merged))

    new_items = merged.filter(F.col("vec_id") >= 1000000)
    stored = merged.filter(F.col("vec_id") < 1000000)
    lsh_pairs = _cap_candidates(
        lsh_sqdist_join(
            new_items, stored, "vec_id", "emb", threshold=1.5,
            n_tables=10, bucket_length=1.0, seed=42, dim=64,
            bucket_cap=_E2E_BUCKET_CAP,
        )
    )
    timed("3 LSH candidate join", lambda: noop(lsh_pairs))

    golden = base.filter(F.col("vec_id") % 9 == 0).select(
        (F.col("vec_id") + 1000000).alias("id_a"),
        F.col("vec_id").alias("id_b"),
    )
    cand = lsh_pairs.unionByName(golden).distinct()
    a = new_items.select(F.col("vec_id").alias("id_a"), F.col("emb").alias("__ea"))
    b = stored.select(F.col("vec_id").alias("id_b"), F.col("emb").alias("__eb"))
    sl = lambda c, lo, n: F.slice(F.col(c), lo, n)  # noqa: E731
    labeled = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .join(golden.withColumn("__g", F.lit(1)), ["id_a", "id_b"], "left")
        .select(
            "id_a", "id_b",
            F.coalesce(F.col("__g"), F.lit(0)).alias("label"),
            squared_dist(sl("__ea", 1, 64), sl("__eb", 1, 64)).alias("full_sqd"),
            squared_dist(sl("__ea", 1, 32), sl("__eb", 1, 32)).alias("head_sqd"),
            squared_dist(sl("__ea", 33, 32), sl("__eb", 33, 32)).alias("tail_sqd"),
        )
        .persist()
    )
    timed("4 label join (persist)", lambda: noop(labeled))

    timed(
        "5 gboost fit (collect)",
        lambda: gboost_fit(labeled, _E2E_FEATS, rounds=_E2E_ROUNDS).collect(),
    )

    # 6 registry + score + sort: whole query minus the above, measured
    # as a warm full run (caches populated by the stages above are NOT
    # the query's own persists, so clear and run the query warm).
    spark.catalog.clearCache()
    timed("whole query (warm file cache)", lambda: noop(q.fn(spark, sf_dir)))


if __name__ == "__main__":
    main()
