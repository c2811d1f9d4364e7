"""Vector math queries over the `embeddings` table (SURVEY §2.H).

Replaces the reference's Scala ``squared_dist`` UDF surface
(V1, `03_Train & Deploy Model.py:86-96`) and Normalizer
(T9, `01_Feature Engineering.py:292-295`) with native array expressions.

Exactness: Spark's ``F.aggregate`` and DuckDB's ``list_sum`` both fold
the array left-to-right in double, so dot/sqdist/cosine/norm are
BITWISE identical across engines (verified empirically at sf0.01) —
these oracles are exact, not tolerance checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fuzzy_item_matching_spark.functions.vector import (
    cosine_similarity,
    l2_norm,
    l2_normalize,
)
from fuzzy_item_matching_spark.queries import query
from fuzzy_item_matching_spark.tables import load_table

# DuckDB fragments mirroring functions/vector.py exactly.
_D_SQ = "list_sum(list_transform({v}::DOUBLE[], x -> x*x))"
_D_NORM = f"sqrt({_D_SQ})"
_D_DOT = "list_sum(list_transform(list_zip({a}::DOUBLE[], {b}::DOUBLE[]), s -> s[1]*s[2]))"
_D_SQD = (
    "list_sum(list_transform(list_zip({a}::DOUBLE[], {b}::DOUBLE[]),"
    " s -> (s[1]-s[2])*(s[1]-s[2])))"
)


@query(
    "vec_l2_norm",
    oracle=f"""
    SELECT vec_id,
           {_D_NORM.format(v="embedding")} AS norm,
           embedding[1]::DOUBLE / {_D_NORM.format(v="embedding")} AS e0_unit
    FROM embeddings
    """,
)
def vec_l2_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norm + first component of the unit vector (T9 Normalizer
    parity, `01_Feature Engineering.py:292-295`). Narrow projection —
    no shuffle at any scale."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        l2_norm("embedding").alias("norm"),
        F.element_at(l2_normalize("embedding"), 1).alias("e0_unit"),
    )


@query(
    "vec_label_pair_stats",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_D_DOT.format(a="a.embedding", b="b.embedding")} AS dp,
           {_D_SQD.format(a="a.embedding", b="b.embedding")} AS sqdist,
           {_D_DOT.format(a="a.embedding", b="b.embedding")}
             / ({_D_NORM.format(v="a.embedding")} * {_D_NORM.format(v="b.embedding")}) AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    """,
)
def vec_label_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked pairwise distances: dot/sqdist/cosine for same-label
    pairs (V1 applied `03_Train & Deploy Model.py:100-107`). The label
    IS the blocking key — work is Σ per-label n², never global n².
    One shuffle on label, then each block scores in a single Arrow
    kernel (dimension-ordered accumulation keeps results bitwise equal
    to the fold/list_sum oracle; the per-pair interpreted-HOF join form
    measured ~2.5× slower at sf0.1)."""
    from fuzzy_item_matching_spark.operators.similarity import blocked_pair_stats

    e = load_table(spark, sf_dir, "embeddings")
    return blocked_pair_stats(e, "vec_id", "embedding", "label")


@query(
    "vec_centroid_by_label",
    oracle="""
    SELECT label, i - 1 AS pos, AVG(x) AS centroid
    FROM (SELECT label, unnest(embedding::DOUBLE[]) AS x,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings)
    GROUP BY label, i ORDER BY label, pos
    """,
)
def vec_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid via posexplode + hash agg (F3 UDTF surface,
    `01_Feature Engineering.py:213`). |labels|×dim output rows; the agg
    is partial+final so the shuffle carries only group sums."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("centroid"))
        .orderBy("label", "pos")
    )


@query(
    "vec_knn_bruteforce",
    oracle=f"""
    WITH pairs AS (
      SELECT a.vec_id AS qid, b.vec_id AS nid,
             {_D_DOT.format(a="a.embedding", b="b.embedding")}
               / ({_D_NORM.format(v="a.embedding")} * {_D_NORM.format(v="b.embedding")}) AS cosine
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    )
    SELECT qid, nid, cosine, rnk FROM (
      SELECT qid, nid, cosine,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rnk
      FROM pairs) t
    WHERE rnk <= 3
    """,
)
def vec_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k per query vector — the exact ANN
    baseline (SURVEY §4.3 extension). O(n²) by design: this is the
    oracle twin that `sim_lsh_bucketed_pairs` and the IVF path are
    recall-checked against; at 100 TB you run those, not this.
    Deterministic tie-break on neighbor id."""
    e = load_table(spark, sf_dir, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    pairs = a.join(b, F.col("a.vec_id") != F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("qid"),
        F.col("b.vec_id").alias("nid"),
        cosine_similarity(F.col("a.embedding"), F.col("b.embedding")).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("qid", "nid", "cosine", "rnk")
    )
