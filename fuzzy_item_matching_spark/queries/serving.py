"""Serving-surface queries: model-as-UDF scoring (F2), pipeline
composition (T12/T13), incremental MERGE upsert (S6).

The reference's serving flow (`03_Train & Deploy Model.py:433-446,
472-495, 567-580`): reload featurizer pipelines, MERGE new rows into
the feature table, compute pair distances, score with a registered
model UDF inside ``f.expr``. Re-expressed here with a vectorized
pandas_udf (Arrow-batched — the 10-100× path vs row-at-a-time Python)
and the anti-join+union MERGE.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from fuzzy_item_matching_spark.functions.text import regex_tokenize
from fuzzy_item_matching_spark.functions.vector import squared_dist
from fuzzy_item_matching_spark.operators.merge import merge_upsert
from fuzzy_item_matching_spark.operators.pipeline import (
    Pipeline,
    column_stage,
    sql_stage,
)
from fuzzy_item_matching_spark.queries import query
from fuzzy_item_matching_spark.tables import load_table


def _match_score(d1: pd.Series, d2: pd.Series, d3: pd.Series) -> pd.Series:
    """Vectorized pair scorer: rational decay of summed distances.

    Stand-in for the reference's mlflow.pyfunc XGBoost UDF
    (`03_Train & Deploy Model.py:433-443`) with the same invocation
    surface (registered SQL function over three distance features,
    applied via F.expr). Rational form (no exp) keeps the value
    bit-identical to the SQL oracle.
    """
    return 1.0 / (1.0 + d1 + d2 + d3)


def make_match_score_udf():
    """Build the Arrow-batched scorer UDF. Deferred (not a module-level
    decorator) because pandas_udf type parsing needs an active session."""
    return pandas_udf(_match_score, "double")


_D_SQD_SLICE = (
    "list_sum(list_transform("
    "list_zip((a.embedding::DOUBLE[])[{lo}:{hi}], (b.embedding::DOUBLE[])[{lo}:{hi}]),"
    " s -> (s[1]-s[2])*(s[1]-s[2])))"
)


@query(
    "serve_match_score",
    oracle=f"""
    WITH pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_D_SQD_SLICE.format(lo=1, hi=64)} AS full_sqd,
             {_D_SQD_SLICE.format(lo=1, hi=32)} AS head_sqd,
             {_D_SQD_SLICE.format(lo=33, hi=64)} AS tail_sqd
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND b.vec_id = a.vec_id + 1
    )
    SELECT id_a, id_b, full_sqd, head_sqd, tail_sqd,
           1.0 / (1.0 + full_sqd + head_sqd + tail_sqd) AS score
    FROM pairs
    """,
)
def serve_match_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 model-as-UDF: three distance features per candidate pair,
    scored by a registered pandas_udf invoked through F.expr — the
    reference's `match_score(...)` call shape
    (`03_Train & Deploy Model.py:571-575`). Arrow-batched; the UDF is
    the only Python hop in the plan."""
    spark.udf.register("match_score", make_match_score_udf())
    e = load_table(spark, sf_dir, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    emb = lambda s, lo, n: F.slice(F.col(f"{s}.embedding"), lo, n)  # noqa: E731
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("b.vec_id") == F.col("a.vec_id") + 1),
    ).select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        squared_dist(emb("a", 1, 64), emb("b", 1, 64)).alias("full_sqd"),
        squared_dist(emb("a", 1, 32), emb("b", 1, 32)).alias("head_sqd"),
        squared_dist(emb("a", 33, 32), emb("b", 33, 32)).alias("tail_sqd"),
    )
    return pairs.withColumn(
        "score", F.expr("match_score(full_sqd, head_sqd, tail_sqd)")
    )


@query(
    "serve_pipeline_featurize",
    oracle="""
    WITH toks AS (
      SELECT p_partkey,
             list_filter(regexp_split_to_array(lower(p_name), '[^\\w\\d]'),
                         x -> length(x) >= 1) AS toks
      FROM part
    )
    SELECT p_partkey, len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct
    FROM toks
    """,
)
def serve_pipeline_featurize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12/T13: a composed Pipeline — a column stage then a
    SQLTransformer-style ``__THIS__`` SQL stage
    (`01_Feature Engineering.py:205-216, 298`). The composition is pure
    plan construction; Catalyst sees one fused query."""
    p = load_table(spark, sf_dir, "part")
    pipe = Pipeline().add(
        "tokenize", column_stage(toks=regex_tokenize("p_name"))
    ).add(
        "stats",
        sql_stage(
            "SELECT p_partkey, size(toks) AS n_tokens, "
            "size(array_distinct(toks)) AS n_distinct FROM __THIS__"
        ),
    )
    return pipe.transform(p)


@query(
    "serve_vector_assembly",
    oracle="""
    SELECT p_partkey, 0 AS pos,
           CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS value,
           CASE WHEN p_retailprice IS NULL THEN 1 ELSE 0 END AS has_invalid
    FROM part
    UNION ALL
    SELECT p_partkey, 1 AS pos, CAST(p_size AS DOUBLE) AS value,
           CASE WHEN p_retailprice IS NULL THEN 1 ELSE 0 END AS has_invalid
    FROM part
    """,
)
def serve_vector_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T11 VectorAssembler parity (`01_Feature Engineering.py:465-470`):
    scalar columns → one feature array, invalids kept (handleInvalid=
    'keep' → NaN survives; here flagged explicitly). Array-native:
    F.array beats a VectorUDT column for Arrow/oracle interop.

    The assembled array is emitted one row per (pos, value) — raw
    array cells crash the driver's pandas canonicalizer, and doubles
    can't be string-rendered portably across engines, so the exploded
    form is the deterministic exact-check shape.
    """
    p = load_table(spark, sf_dir, "part")
    assembled = p.select(
        "p_partkey",
        F.array(
            F.col("p_retailprice").cast("decimal(18,2)").cast("double"),
            F.col("p_size").cast("double"),
        ).alias("features"),
        F.when(F.col("p_retailprice").isNull(), 1).otherwise(0).alias("has_invalid"),
    )
    return assembled.select(
        "p_partkey",
        F.posexplode("features").alias("pos", "value"),
        "has_invalid",
    )


@query(
    "serve_merge_upsert",
    oracle="""
    WITH source AS (
      SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
             CAST(c_acctbal AS DECIMAL(18,2)) + 100 AS c_acctbal
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey + 1000000, c_name, c_nationkey, c_mktsegment,
             CAST(c_acctbal AS DECIMAL(18,2))
      FROM customer WHERE c_custkey % 100 = 0
    ),
    target AS (
      SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
             CAST(c_acctbal AS DECIMAL(18,2)) AS c_acctbal
      FROM customer
    ),
    merged AS (
      SELECT * FROM source
      UNION ALL
      SELECT t.* FROM target t ANTI JOIN source s USING (c_custkey)
    )
    SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(c_acctbal) AS DOUBLE) AS total_balance
    FROM merged GROUP BY c_mktsegment
    """,
)
def serve_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 MERGE semantics (`03_Train & Deploy Model.py:480-495`) as
    anti-join + union: updates (every 10th customer gets +100 balance)
    win over target rows; inserts (new ids) append. Verified via a
    post-merge aggregate. AQE broadcasts the small source side — the
    incremental-trickle shape MERGE exists for."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment",
        F.col("c_acctbal").cast("decimal(18,2)").alias("c_acctbal"),
    )
    updates = c.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 100
    )
    inserts = c.filter(F.col("c_custkey") % 100 == 0).withColumn(
        "c_custkey", F.col("c_custkey") + 1000000
    )
    merged = merge_upsert(c, updates.unionByName(inserts), keys=["c_custkey"])
    return merged.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c_acctbal").cast("double").alias("total_balance"),
    )
