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


_E2E_CAND_CAP = 32  # LSH candidates kept per arriving item
_E2E_BUCKET_CAP = 256  # stored rows indexed per (table, bucket)


def _cap_candidates(lsh: "DataFrame") -> "DataFrame":
    """Keep the _E2E_CAND_CAP nearest LSH candidates per NEW item
    (sqdist ASC, id_b tie-break — a total order on bit-identical
    doubles, replayed verbatim in the oracles' crn window).

    Why: "all pairs within threshold t" is an answer that grows
    QUADRATICALLY on a densifying corpus — the ×25 scaling run
    measured serve_end_to_end at 64× cost for 25× data purely because
    the threshold-1.5 pair count grew ~k² (per-pair throughput
    actually improved; see docs/SCALING.md round-12). A production
    matcher bounds work per ARRIVING item: the labeled-pair frame,
    booster fit and scoring downstream are then linear in the arrival
    batch regardless of how dense the stored corpus gets — the same
    fixed-size-panel discipline that fixed serve_als_topk in r11."""
    from pyspark.sql.window import Window as _W

    w = _W.partitionBy("id_a").orderBy("sqdist", "id_b")
    return (
        lsh.withColumn("crn", F.row_number().over(w))
        .filter(F.col("crn") <= _E2E_CAND_CAP)
        .select("id_a", "id_b")
    )


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


def _incremental_scoring_oracle(
    n_tables: int, bucket_length: float, seed: int, dim: int, threshold: float
) -> str:
    """SQL replica of the full incremental-scoring flow: MERGE →
    LSH candidate join → ensure_positives union → sqdist features →
    match_score → ordered limit. The LSH buckets replay the same
    seeded hyperplane literals as the Spark plan (see
    queries/similarity.py)."""
    from fuzzy_item_matching_spark.operators.lsh import random_hyperplanes
    from fuzzy_item_matching_spark.queries.similarity import _sql_plane_dot

    planes = random_hyperplanes(dim, n_tables, seed)

    def bkt(src: str) -> str:
        return "\n      UNION ALL\n".join(
            f"      SELECT vec_id, {t} AS tbl,"
            f" CAST(floor(({_sql_plane_dot('emb', p)})"
            f" / {bucket_length!r}) AS BIGINT) AS bucket FROM {src}"
            for t, p in enumerate(planes)
        )

    sqd = (
        "list_sum(list_transform(list_zip(a.emb[{lo}:{hi}], b.emb[{lo}:{hi}]),"
        " s -> (s[1]-s[2])*(s[1]-s[2])))"
    )
    return f"""
    WITH upd AS (
      SELECT vec_id, list_transform(embedding::DOUBLE[], x -> x * 1.1::DOUBLE) AS emb
      FROM embeddings WHERE vec_id % 7 = 0
    ),
    ins AS (
      SELECT vec_id + 1000000 AS vec_id,
             list_transform(embedding::DOUBLE[], x -> x * 0.9::DOUBLE) AS emb
      FROM embeddings WHERE vec_id % 9 = 0
    ),
    src AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
    tgt AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    merged AS (
      SELECT * FROM src
      UNION ALL
      SELECT t.* FROM tgt t ANTI JOIN src s USING (vec_id)
    ),
    newitems AS (SELECT * FROM merged WHERE vec_id >= 1000000),
    stored AS (SELECT * FROM merged WHERE vec_id < 1000000),
    nb AS (
{bkt('newitems')}
    ),
    sb AS (
      SELECT vec_id, tbl, bucket FROM (
        SELECT vec_id, tbl, bucket,
               row_number() OVER (PARTITION BY tbl, bucket
                                  ORDER BY vec_id) AS brn
        FROM (
{bkt('stored')}
        )
      ) WHERE brn <= {_E2E_BUCKET_CAP}
    ),
    lsh_cand AS (
      SELECT DISTINCT n.vec_id AS id_a, s.vec_id AS id_b
      FROM nb n JOIN sb s ON n.tbl = s.tbl AND n.bucket = s.bucket
    ),
    lsh_pairs AS (
      SELECT id_a, id_b FROM (
        SELECT c.id_a, c.id_b,
               row_number() OVER (
                 PARTITION BY c.id_a
                 ORDER BY {sqd.format(lo=1, hi=dim)}, c.id_b) AS crn
        FROM lsh_cand c
        JOIN newitems a ON a.vec_id = c.id_a
        JOIN stored b ON b.vec_id = c.id_b
        WHERE {sqd.format(lo=1, hi=dim)} <= {threshold}
      ) WHERE crn <= {_E2E_CAND_CAP}
    ),
    golden AS (
      SELECT vec_id + 1000000 AS id_a, vec_id AS id_b
      FROM embeddings WHERE vec_id % 9 = 0
    ),
    cand AS (SELECT * FROM lsh_pairs UNION SELECT * FROM golden),
    feats AS (
      SELECT c.id_a, c.id_b,
             {sqd.format(lo=1, hi=dim)} AS full_sqd,
             {sqd.format(lo=1, hi=dim // 2)} AS head_sqd,
             {sqd.format(lo=dim // 2 + 1, hi=dim)} AS tail_sqd
      FROM cand c
      JOIN newitems a ON a.vec_id = c.id_a
      JOIN stored b ON b.vec_id = c.id_b
    )
    SELECT id_a, id_b, full_sqd, head_sqd, tail_sqd,
           1.0 / (1.0 + full_sqd + head_sqd + tail_sqd) AS score
    FROM feats
    ORDER BY score DESC, id_a, id_b
    LIMIT 100
    """


@query(
    "serve_incremental_scoring",
    oracle=_incremental_scoring_oracle(
        n_tables=10, bucket_length=1.0, seed=42, dim=64, threshold=1.5
    ),
)
def serve_incremental_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry point 2 — the reference's incremental 'new products' flow
    (`03_Train & Deploy Model.py:454-580`) as ONE composed plan:

    batch arrival (deterministic id-mod filters standing in for the
    seeded sample, S7) → MERGE upsert into the feature table (S6:
    re-ingested items drift ×1.1, new items arrive as ×0.9 copies with
    shifted ids) → BucketedRandomProjectionLSH candidate join of new
    items vs the stored side (J4, threshold-filtered) → union with the
    golden matches BEFORE labeling/scoring — the reference's
    `ensure_positives` quirk (SURVEY §7.4(4),
    `02_Build Training Pairs.py:213-218`): known positives bypass the
    LSH threshold so every true match is scored — → full/head/tail
    squared distances (V1/J3) → registered pandas_udf `match_score`
    via F.expr (F2) → global sort + limit over a total order (P9).

    One plan: Catalyst sees MERGE's anti-join, the bucket explode
    equi-join, and the feature joins together; the only Python hop is
    the Arrow-batched scorer.
    """
    spark.udf.register("match_score", make_match_score_udf())
    from fuzzy_item_matching_spark.operators.lsh import lsh_sqdist_join

    e = load_table(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    updates = base.filter(F.col("vec_id") % 7 == 0).withColumn(
        "emb", F.transform("emb", lambda x: x * F.lit(1.1))
    )
    inserts = base.filter(F.col("vec_id") % 9 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("emb", lambda x: x * F.lit(0.9)).alias("emb"),
    )
    merged = merge_upsert(
        base, updates.unionByName(inserts), keys=["vec_id"]
    ).persist()  # feature table feeds the LSH join AND both feature sides
    new_items = merged.filter(F.col("vec_id") >= 1000000)
    stored = merged.filter(F.col("vec_id") < 1000000)

    lsh_pairs = _cap_candidates(
        lsh_sqdist_join(
            new_items, stored, "vec_id", "emb", threshold=1.5,
            n_tables=10, bucket_length=1.0, seed=42, dim=64,
            bucket_cap=_E2E_BUCKET_CAP,
        )
    )
    golden = base.filter(F.col("vec_id") % 9 == 0).select(
        (F.col("vec_id") + 1000000).alias("id_a"),
        F.col("vec_id").alias("id_b"),
    )
    cand = lsh_pairs.unionByName(golden).distinct()

    a = new_items.select(F.col("vec_id").alias("id_a"), F.col("emb").alias("__ea"))
    b = stored.select(F.col("vec_id").alias("id_b"), F.col("emb").alias("__eb"))
    sl = lambda c, lo, n: F.slice(F.col(c), lo, n)  # noqa: E731
    feats = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            squared_dist(sl("__ea", 1, 64), sl("__eb", 1, 64)).alias("full_sqd"),
            squared_dist(sl("__ea", 1, 32), sl("__eb", 1, 32)).alias("head_sqd"),
            squared_dist(sl("__ea", 33, 32), sl("__eb", 33, 32)).alias("tail_sqd"),
        )
    )
    scored = feats.withColumn(
        "score", F.expr("match_score(full_sqd, head_sqd, tail_sqd)")
    )
    return scored.orderBy(
        F.desc("score"), F.asc("id_a"), F.asc("id_b")
    ).limit(100)


def _e2e_pairs_sql(
    n_tables: int, bucket_length: float, seed: int, dim: int, threshold: float
) -> str:
    """The labeled-pair CTE chain of the end-to-end flow: MERGE →
    LSH candidate join → golden union → left-join labeling →
    full/head/tail squared distances. Shared structure with
    _incremental_scoring_oracle; the output SELECT exposes exactly
    what a booster fit needs (id_a, id_b, label, features)."""
    from fuzzy_item_matching_spark.operators.lsh import random_hyperplanes
    from fuzzy_item_matching_spark.queries.similarity import _sql_plane_dot

    planes = random_hyperplanes(dim, n_tables, seed)

    def bkt(src: str) -> str:
        return "\n      UNION ALL\n".join(
            f"      SELECT vec_id, {t} AS tbl,"
            f" CAST(floor(({_sql_plane_dot('emb', p)})"
            f" / {bucket_length!r}) AS BIGINT) AS bucket FROM {src}"
            for t, p in enumerate(planes)
        )

    sqd = (
        "list_sum(list_transform(list_zip(a.emb[{lo}:{hi}], b.emb[{lo}:{hi}]),"
        " s -> (s[1]-s[2])*(s[1]-s[2])))"
    )
    return f"""
    WITH upd AS (
      SELECT vec_id, list_transform(embedding::DOUBLE[], x -> x * 1.1::DOUBLE) AS emb
      FROM embeddings WHERE vec_id % 7 = 0
    ),
    ins AS (
      SELECT vec_id + 1000000 AS vec_id,
             list_transform(embedding::DOUBLE[], x -> x * 0.9::DOUBLE) AS emb
      FROM embeddings WHERE vec_id % 9 = 0
    ),
    src AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
    tgt AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    merged AS (
      SELECT * FROM src
      UNION ALL
      SELECT t.* FROM tgt t ANTI JOIN src s USING (vec_id)
    ),
    newitems AS (SELECT * FROM merged WHERE vec_id >= 1000000),
    stored AS (SELECT * FROM merged WHERE vec_id < 1000000),
    nb AS (
{bkt('newitems')}
    ),
    sb AS (
      SELECT vec_id, tbl, bucket FROM (
        SELECT vec_id, tbl, bucket,
               row_number() OVER (PARTITION BY tbl, bucket
                                  ORDER BY vec_id) AS brn
        FROM (
{bkt('stored')}
        )
      ) WHERE brn <= {_E2E_BUCKET_CAP}
    ),
    lsh_cand AS (
      SELECT DISTINCT n.vec_id AS id_a, s.vec_id AS id_b
      FROM nb n JOIN sb s ON n.tbl = s.tbl AND n.bucket = s.bucket
    ),
    lsh_pairs AS (
      SELECT id_a, id_b FROM (
        SELECT c.id_a, c.id_b,
               row_number() OVER (
                 PARTITION BY c.id_a
                 ORDER BY {sqd.format(lo=1, hi=dim)}, c.id_b) AS crn
        FROM lsh_cand c
        JOIN newitems a ON a.vec_id = c.id_a
        JOIN stored b ON b.vec_id = c.id_b
        WHERE {sqd.format(lo=1, hi=dim)} <= {threshold}
      ) WHERE crn <= {_E2E_CAND_CAP}
    ),
    golden AS (
      SELECT vec_id + 1000000 AS id_a, vec_id AS id_b
      FROM embeddings WHERE vec_id % 9 = 0
    ),
    cand AS (SELECT * FROM lsh_pairs UNION SELECT * FROM golden)
    SELECT c.id_a, c.id_b,
           CASE WHEN g.id_a IS NOT NULL THEN 1 ELSE 0 END AS label,
           {sqd.format(lo=1, hi=dim)} AS full_sqd,
           {sqd.format(lo=1, hi=dim // 2)} AS head_sqd,
           {sqd.format(lo=dim // 2 + 1, hi=dim)} AS tail_sqd
    FROM cand c
    JOIN newitems a ON a.vec_id = c.id_a
    JOIN stored b ON b.vec_id = c.id_b
    LEFT JOIN golden g ON g.id_a = c.id_a AND g.id_b = c.id_b
    """


_E2E_ROUNDS = 2
_E2E_FEATS = ["full_sqd", "head_sqd", "tail_sqd"]


def _end_to_end_oracle() -> str:
    """Fit replay + scoring through the fitted best{t} CTEs + the
    total-order top-k, all over the labeled-pair chain above — the
    gboost_score_sql pattern with the label and registry-evidence
    columns carried through."""
    from fuzzy_item_matching_spark.operators.boosting import (
        GB_ETA,
        gboost_ctes,
    )

    pairs_sql = _e2e_pairs_sql(
        n_tables=10, bucket_length=1.0, seed=42, dim=64, threshold=1.5
    )
    ctes, _ = gboost_ctes(pairs_sql, _E2E_FEATS, rounds=_E2E_ROUNDS)
    terms = []
    froms = ["pairs"]
    for t in range(1, _E2E_ROUNDS + 1):
        b = f"b{t}"
        froms.append(f"best{t} {b}")
        feat_case = (
            f"CASE {b}.feature "
            + " ".join(f"WHEN '{f_}' THEN {f_}" for f_ in _E2E_FEATS)
            + " END"
        )
        terms.append(
            f"({GB_ETA!r} * (CASE WHEN {feat_case} <= {b}.thr"
            f" THEN {b}.w_le ELSE {b}.w_gt END))"
        )
    score = " + ".join(terms)
    return (
        ctes
        + f"""
    SELECT id_a, id_b, label, score,
           CASE WHEN score > 0 THEN 1 ELSE 0 END AS pred,
           1 AS prod_version, 1 AS n_versions
    FROM (
      SELECT id_a, id_b, label, {score} AS score
      FROM {", ".join(froms)}
    ) ORDER BY score DESC, id_a ASC, id_b ASC LIMIT 20"""
    )


@query("serve_end_to_end", oracle=_end_to_end_oracle())
def serve_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE reference lifecycle as one oracle-checked flow —
    the three notebooks chained the way `RUNME:35-91` runs them
    (01 featurize → 02 build training pairs → 03 train & deploy):

    featurize Pipeline (T12/T13: column stage + __THIS__ SQL stage
    casts the raw embedding to the double feature array) → MERGE
    upsert of the arriving batch into the feature table (S6: ×1.1
    drift for re-ingested items, ×0.9 inserts at shifted ids) →
    BucketedRandomProjectionLSH candidate join of new vs stored (J4,
    threshold 1.5, the seeded-hyperplane family every sim oracle
    replays) → union with the golden matches (`ensure_positives`,
    `02_Build Training Pairs.py:213-218`) → LEFT-JOIN labeling
    against the golden pairs (J2: label = matched? 1 : 0) →
    second-order gradient-boosting fit on the labeled pairs (M7,
    operators/boosting.gboost_fit, 2 rounds) → model registered,
    promoted to Production, and RELOADED from the registry (M8: the
    fitted trees travel as an MLWritable SQLTransformer whose
    statement walks the split literals — the mlflow register→serve
    hop, with the scoring staying JVM-side) → score every candidate
    through the reloaded artifact → global sort + limit over a total
    order (P9). The oracle replays the whole chain: the labeled-pair
    CTEs feed gboost_ctes' unrolled fit, and the tail scores through
    the fitted best{t} CTEs — so the hash check covers featurize,
    MERGE, LSH, labeling, fit, AND serve in one verdict.

    Scale: identical shapes to the proven pieces — the labeled-pair
    frame persists once and feeds the fit's bounded passes (each a
    map-side-combinable aggregate; the collect is the model table, 2
    rows); scoring is one narrow projection over the candidate frame.
    """
    import os
    import shutil

    from pyspark.ml import Pipeline as MLPipeline
    from pyspark.ml.feature import SQLTransformer

    from fuzzy_item_matching_spark.operators.boosting import (
        GB_ETA,
        gboost_fit,
    )
    from fuzzy_item_matching_spark.operators.lsh import lsh_sqdist_join
    from fuzzy_item_matching_spark.operators.registry import (
        PRODUCTION,
        ModelRegistry,
    )
    from fuzzy_item_matching_spark.queries.sources import SCRATCH

    e = load_table(spark, sf_dir, "embeddings")
    featurize = Pipeline().add(
        "cast", column_stage(emb=F.col("embedding").cast("array<double>"))
    ).add("project", sql_stage("SELECT vec_id, emb FROM __THIS__"))
    base = featurize.transform(e)

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
    new_items = merged.filter(F.col("vec_id") >= 1000000)
    stored = merged.filter(F.col("vec_id") < 1000000)

    lsh_pairs = _cap_candidates(
        lsh_sqdist_join(
            new_items, stored, "vec_id", "emb", threshold=1.5,
            n_tables=10, bucket_length=1.0, seed=42, dim=64,
            bucket_cap=_E2E_BUCKET_CAP,
        )
    )
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
            "id_a",
            "id_b",
            F.coalesce(F.col("__g"), F.lit(0)).alias("label"),
            squared_dist(sl("__ea", 1, 64), sl("__eb", 1, 64)).alias("full_sqd"),
            squared_dist(sl("__ea", 1, 32), sl("__eb", 1, 32)).alias("head_sqd"),
            squared_dist(sl("__ea", 33, 32), sl("__eb", 33, 32)).alias("tail_sqd"),
        )
        .persist()  # feeds the fit's bounded passes AND the scoring
    )

    model_rows = sorted(
        gboost_fit(labeled, _E2E_FEATS, rounds=_E2E_ROUNDS).collect(),
        key=lambda r: r["round"],
    )
    # CAST every literal to DOUBLE: a bare 0.3 in Spark SQL parses as
    # DECIMAL and the whole sum would run in decimal arithmetic, while
    # the oracle multiplies the fit CTE's DOUBLE columns — 1-ulp drift.
    terms = [
        f"(CAST({GB_ETA!r} AS DOUBLE) * (CASE"
        f" WHEN {r['feature']} <= CAST({r['thr']!r} AS DOUBLE)"
        f" THEN CAST({r['w_le']!r} AS DOUBLE)"
        f" ELSE CAST({r['w_gt']!r} AS DOUBLE) END))"
        for r in model_rows
    ]
    stmt = (
        "SELECT id_a, id_b, label, "
        + " + ".join(terms)
        + " AS score FROM __THIS__"
    )

    root = os.path.join(SCRATCH, "registry_e2e")
    shutil.rmtree(root, ignore_errors=True)
    reg = ModelRegistry(root)
    artifact = MLPipeline(stages=[SQLTransformer(statement=stmt)]).fit(
        spark.createDataFrame(
            [(0, 0, 0, 0.0, 0.0, 0.0)],
            ["id_a", "id_b", "label", *_E2E_FEATS],
        )
    )
    name = "match_model_e2e"
    v1 = reg.register(name, artifact)
    reg.promote(name, v1, PRODUCTION)
    model = reg.load(name, stage=PRODUCTION)
    n_versions = len(reg.versions(name))

    scored = model.transform(labeled).select(
        "id_a",
        "id_b",
        "label",
        "score",
        F.when(F.col("score") > 0, 1).otherwise(0).alias("pred"),
        F.lit(v1).alias("prod_version"),
        F.lit(n_versions).alias("n_versions"),
    )
    return scored.orderBy(
        F.desc("score"), F.asc("id_a"), F.asc("id_b")
    ).limit(20)


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


@query(
    "serve_model_registry",
    oracle="""
    SELECT p_partkey,
           CAST(p_retailprice * 3 AS DOUBLE) AS score,
           2 AS prod_version,
           1 AS archived_version,
           2 AS n_versions
    FROM part WHERE p_partkey <= 3
    """,
)
def serve_model_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7+M8 as one checkable lifecycle (`03_Train & Deploy
    Model.py:324-343`): register model v1 (score = price×2), promote
    it to Production; register v2 (score = price×3), promote it —
    archive-then-promote moves v1 to Archived; then resolve
    ``stage=Production`` and score three fixed rows with the RELOADED
    artifact. The returned frame is evidence of every step: score
    column = price×3 proves the reload picked v2, prod/archived
    version columns prove the stage flow, n_versions proves both
    registrations persisted.

    The artifact is an MLWritable SQLTransformer pipeline — the same
    save/load surface a fitted PipelineModel uses, so the round-trip
    exercises the real persistence path, not a pickle. Registry state
    is per-process scratch (no shared global state; at scale ``root``
    is any Hadoop-FS URI)."""
    import os
    import shutil

    from pyspark.ml import Pipeline
    from pyspark.ml.feature import SQLTransformer

    from fuzzy_item_matching_spark.operators.registry import (
        ARCHIVED,
        PRODUCTION,
        ModelRegistry,
    )
    from fuzzy_item_matching_spark.queries.sources import SCRATCH

    root = os.path.join(SCRATCH, "registry_q")
    shutil.rmtree(root, ignore_errors=True)
    reg = ModelRegistry(root)

    def fitted(mult: int):
        stage = SQLTransformer(
            statement=(
                "SELECT p_partkey, CAST(p_retailprice * "
                f"{mult} AS DOUBLE) AS score FROM __THIS__"
            )
        )
        return Pipeline(stages=[stage]).fit(
            spark.createDataFrame([(0, 0.0)], ["p_partkey", "p_retailprice"])
        )

    name = "part_scorer"
    v1 = reg.register(name, fitted(2))
    reg.promote(name, v1, PRODUCTION)
    v2 = reg.register(name, fitted(3))
    reg.promote(name, v2, PRODUCTION)  # archives v1 first

    metas = {m["version"]: m["stage"] for m in reg.versions(name)}
    prod = reg.resolve(name, stage=PRODUCTION)
    archived = max(v for v, s in metas.items() if s == ARCHIVED)
    model = reg.load(name, stage=PRODUCTION)

    rows = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 3)
    return model.transform(rows.select("p_partkey", "p_retailprice")).select(
        "p_partkey",
        "score",
        F.lit(prod).alias("prod_version"),
        F.lit(archived).alias("archived_version"),
        F.lit(len(metas)).alias("n_versions"),
    )
