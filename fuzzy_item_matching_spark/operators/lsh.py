"""Bucketed random-projection LSH — engine-native approxSimilarityJoin.

The reference's V2/J4 (`02_Build Training Pairs.py:62-69, 92-106`;
`03_Train & Deploy Model.py:506-538`) uses
``BucketedRandomProjectionLSH(bucketLength, numHashTables)``:
hash_i(v) = floor(dot(v, g_i) / bucketLength) for seeded unit gaussian
vectors g_i; two rows are candidates iff they collide in ≥1 table, and
the join keeps candidates with true distance ≤ threshold.

This module is the same algorithm as explicit DataFrame ops:
hyperplanes are tiny seeded constants folded into the plan (a few KB —
a driver-side literal, broadcast with the task binary), bucketing is a
JVM-side array expression, and the candidate join is a plain equi-join
on (table_idx, bucket) that Catalyst shuffles/AQE-balances. Recall < 1
by construction; precision = 1 after the exact distance filter.
Correctness contract (SURVEY §7.3): LSH pairs ⊆ exact pairs, recall
reported vs `exact_sqdist_join` — never hash-equality.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fuzzy_item_matching_spark.functions.vector import dot, squared_dist


def random_hyperplanes(dim: int, n_tables: int, seed: int = 42) -> list[list[float]]:
    """Seeded unit gaussian projection vectors (one per hash table) —
    the engine-native equivalent of MLlib's seeded randUnitVectors."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_tables, dim))
    planes /= np.linalg.norm(planes, axis=1, keepdims=True)
    return [[float(x) for x in p] for p in planes]


def brp_hashes(
    vec: Column | str, planes: list[list[float]], bucket_length: float = 1.0
) -> Column:
    """array of bucket ids, one per hash table:
    floor(dot(v, g_i) / bucketLength)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.array(
        *[
            F.floor(
                dot(v, F.array(*[F.lit(x) for x in plane])) / F.lit(bucket_length)
            ).cast("long")
            for plane in planes
        ]
    )


def sign_lsh_buckets(
    vec: Column | str,
    planes: list[list[float]],
    n_tables: int,
    bits_per_table: int,
) -> Column:
    """Sign-bit (SRP) LSH buckets for COSINE similarity: per table, a
    bit-string of sign(dot(v, g_i)) over that table's hyperplanes.
    P[bit match] = 1 - θ/π — collision probability tracks the angle."""
    v = F.col(vec) if isinstance(vec, str) else vec
    assert len(planes) == n_tables * bits_per_table
    buckets = []
    for t in range(n_tables):
        bits = [
            F.when(
                dot(v, F.array(*[F.lit(x) for x in planes[t * bits_per_table + b]]))
                >= 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for b in range(bits_per_table)
        ]
        buckets.append(F.concat(*bits))
    return F.array(*buckets)


def lsh_cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    n_tables: int = 16,
    bits_per_table: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k per vector — the ANN scale path
    (brute-force twin: queries/vectors.vec_knn_bruteforce).

    Candidates come from sign-LSH bucket collisions (any table);
    exact cosine ranks them; row_number keeps k per query id. Shuffles
    touch (table, bucket) keys and candidate pairs only — work scales
    with collision counts (tunable via bits_per_table), never n².
    Recall < 1 by construction; graded in tests/ vs brute force.
    """
    from pyspark.sql.window import Window

    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = random_hyperplanes(dim, n_tables * bits_per_table, seed)

    buckets = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            sign_lsh_buckets(vec_col, planes, n_tables, bits_per_table)
        ).alias("__tbl", "__bkt"),
    ).persist()  # n_tables×bits dot products per row; referenced by
    # both sides of the candidate self-join
    cand = (
        buckets.alias("q")
        .join(buckets.alias("n"), ["__tbl", "__bkt"])
        .filter(F.col("q.__id") != F.col("n.__id"))
        .select(F.col("q.__id").alias("qid"), F.col("n.__id").alias("nid"))
        .distinct()
    )
    from fuzzy_item_matching_spark.functions.vector import l2_norm

    # Hoist per-row norms out of the per-candidate cosine (bitwise
    # equivalent; saves 2 array folds per candidate pair).
    vq = df.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("__vq"),
        l2_norm(vec_col).alias("__nq"),
    )
    vn = df.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("__vn"),
        l2_norm(vec_col).alias("__nn"),
    )
    denom = F.col("__nq") * F.col("__nn")
    scored = (
        cand.join(vq, "qid")
        .join(vn, "nid")
        .withColumn(
            "cosine",
            F.when(denom == 0.0, F.lit(0.0)).otherwise(
                dot("__vq", "__vn") / denom
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "nid", "cosine", "rnk")
    )


def lsh_sqdist_join(
    left: DataFrame,
    right: DataFrame | None,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_tables: int = 10,
    bucket_length: float = 1.0,
    seed: int = 42,
    dim: int | None = None,
    dist_col: str = "sqdist",
) -> DataFrame:
    """Approximate squared-distance join (J4). ``right=None`` → self-join
    dedup mode (unordered pairs, id_a < id_b).

    Plan: bucket arrays (narrow) → posexplode (n_tables× fanout of ids
    only, vectors are NOT carried through the explode) → equi-join on
    (table_idx, bucket) → distinct candidate id pairs → re-join both
    sides' vectors → exact distance filter. The candidate set, not
    |A|×|B|, bounds all shuffle volume; bucket skew (dense regions)
    is AQE's skew-join case, tunable via bucket_length.
    """
    if dim is None:
        dim = len(left.select(vec_col).first()[0])
    planes = random_hyperplanes(dim, n_tables, seed)

    def buckets(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.posexplode(brp_hashes(vec_col, planes, bucket_length)).alias(
                "__tbl", "__bkt"
            ),
        )

    self_mode = right is None
    right_df = left if self_mode else right
    ba = buckets(left, "id_a").persist()  # n_tables dot products per row
    # — compute once; in self mode the right side is the same frame
    # re-keyed, not a recomputation.
    bb = (
        ba.select(F.col("id_a").alias("id_b"), "__tbl", "__bkt")
        if self_mode
        else buckets(right_df, "id_b")
    )
    cand = ba.join(bb, ["__tbl", "__bkt"])
    if self_mode:
        cand = cand.filter(F.col("id_a") < F.col("id_b"))
    else:
        cand = cand.filter(F.col("id_a").isNotNull())
    cand = cand.select("id_a", "id_b").distinct()

    va = left.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    vb = right_df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(dist_col, squared_dist("__va", "__vb"))
        .filter(F.col(dist_col) <= F.lit(threshold))
        .select("id_a", "id_b", dist_col)
    )
