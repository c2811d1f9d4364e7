"""Order-insensitivity claims behind the exact oracles.

Two properties the round-3 oracles depend on:
- IVF centroids refine through exact DECIMAL sums, so the whole index
  (and its top-k output) must be IDENTICAL at any parallelism — float
  avg() would differ with partition merge order.
- blocked_pair_stats scores blocks with dimension-ordered numpy
  accumulation, claimed bitwise-equal to the per-pair Catalyst
  expression forms (dot / squared_dist / hoisted-norm cosine).
"""

from pyspark.sql import functions as F

from tests.conftest import SF_CHECK


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ivf_topk_identical_across_parallelism(spark):
    from fuzzy_item_matching_spark.operators.ivf import ivf_cosine_topk
    from fuzzy_item_matching_spark.tables import load_table

    e = load_table(spark, SF_CHECK, "embeddings")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        low = _rows(
            ivf_cosine_topk(e.repartition(3), "vec_id", "embedding", k=3,
                            n_centroids=16, n_probe=8, refine_iters=1)
        )
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        high = _rows(
            ivf_cosine_topk(e.repartition(17), "vec_id", "embedding", k=3,
                            n_centroids=16, n_probe=8, refine_iters=1)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert low == high  # bitwise: cosine doubles compare exactly


def test_blocked_pair_stats_matches_expression_form(spark):
    from fuzzy_item_matching_spark.functions.vector import (
        dot,
        l2_norm,
        squared_dist,
    )
    from fuzzy_item_matching_spark.operators.similarity import blocked_pair_stats
    from fuzzy_item_matching_spark.tables import load_table

    e = load_table(spark, SF_CHECK, "embeddings")
    blockwise = _rows(blocked_pair_stats(e, "vec_id", "embedding", "label"))

    withn = e.select(
        "vec_id", "label", "embedding", l2_norm("embedding").alias("nrm")
    )
    a, b = withn.alias("a"), withn.alias("b")
    nn = F.col("a.nrm") * F.col("b.nrm")
    expression = _rows(
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        ).select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            dot(F.col("a.embedding"), F.col("b.embedding")).alias("dp"),
            squared_dist(F.col("a.embedding"), F.col("b.embedding")).alias(
                "sqdist"
            ),
            F.when(nn == 0.0, F.lit(0.0))
            .otherwise(
                dot(F.col("a.embedding"), F.col("b.embedding")) / nn
            )
            .alias("cosine"),
        )
    )
    assert blockwise == expression  # bitwise float equality, all 3 stats


def test_keyed_sample_and_split_partition_invariant(spark):
    from fuzzy_item_matching_spark.functions.sampling import (
        keyed_sample,
        keyed_split,
    )
    from fuzzy_item_matching_spark.tables import load_table

    o = load_table(spark, SF_CHECK, "orders").select("o_orderkey")
    key = F.col("o_orderkey")
    a = _rows(keyed_sample(o.repartition(3), key, 0.1))
    b = _rows(keyed_sample(o.repartition(17), key, 0.1))
    assert a == b and 0.05 < len(a) / o.count() < 0.15

    w = {"train": 0.7, "validate": 0.15, "test": 0.15}
    sa = _rows(keyed_split(o.repartition(3), key, w))
    sb = _rows(keyed_split(o.repartition(17), key, w))
    assert sa == sb
    labels = [r[1] for r in sa]
    assert 0.6 < labels.count("train") / len(labels) < 0.8


def test_shuffle_and_packing_partition_invariant(spark):
    """ts_corpus_shuffle's position and ts_seq_packing's manifest are
    pure functions of the data — identical at any input partitioning
    (the content-keyed ordering, not Spark's physical layout, defines
    the sequence)."""
    from fuzzy_item_matching_spark.queries import load_all

    reg = load_all()
    for name in ("ts_corpus_shuffle", "ts_seq_packing"):
        base = _rows(reg[name].fn(spark, SF_CHECK))
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            narrow = _rows(reg[name].fn(spark, SF_CHECK))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        assert base == narrow, f"{name} drifts with shuffle width"
