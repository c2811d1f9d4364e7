"""ml.Pipeline ↔ array-native parity checks (SURVEY §7.2 stage 4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fuzzy_item_matching_spark.functions.text import regex_tokenize, remove_stopwords
from fuzzy_item_matching_spark.operators.mlbridge import (
    fit_name_pipeline,
    to_array,
    to_vector,
)
from fuzzy_item_matching_spark.tables import load_table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def part(spark):
    return load_table(spark, SF_SMOKE, "part").select("p_partkey", "p_name").cache()


def test_ml_tokenizer_matches_array_native(spark, part):
    from pyspark.ml.feature import RegexTokenizer, StopWordsRemover

    tok = RegexTokenizer(
        inputCol="p_name", outputCol="words", pattern=r"[^\w\d]", minTokenLength=1
    )
    stop = StopWordsRemover(inputCol="words", outputCol="kept")
    ml_out = stop.transform(tok.transform(part)).select("p_partkey", "kept")
    native = part.select(
        "p_partkey", remove_stopwords(regex_tokenize("p_name")).alias("kept")
    )
    diff = (
        ml_out.withColumnRenamed("kept", "ml_kept")
        .join(native, "p_partkey")
        .filter(F.col("ml_kept") != F.col("kept"))
        .count()
    )
    assert diff == 0, "ml.feature token/stopword stages diverge from array kernels"


def test_name_pipeline_unit_norms(spark, part):
    from pyspark.ml.functions import vector_to_array

    from fuzzy_item_matching_spark.functions.vector import l2_norm

    model = fit_name_pipeline(part, "p_partkey", "p_name")
    out = model.transform(part).select(
        "p_partkey", vector_to_array("features").alias("feat")
    )
    stats = out.select(
        F.min(F.round(l2_norm("feat"), 6)).alias("lo"),
        F.max(F.round(l2_norm("feat"), 6)).alias("hi"),
    ).first()
    assert stats.lo == pytest.approx(1.0, abs=1e-5)
    assert stats.hi == pytest.approx(1.0, abs=1e-5)


def test_pipeline_persist_reload(spark, part, tmp_path_factory):
    """M8 artifact persistence (`01_Feature Engineering.py:516-531`,
    reload `03_Train & Deploy Model.py:357-429`): fitted PipelineModel
    saved, reloaded, and applied with identical output."""
    from pyspark.ml import PipelineModel
    from pyspark.ml.functions import vector_to_array

    model = fit_name_pipeline(part, "p_partkey", "p_name")
    path = "/root/repo/.scratch/name_pipeline_model"
    model.write().overwrite().save(path)
    reloaded = PipelineModel.load(path)

    def norms(m):
        return {
            r.p_partkey: r.f
            for r in m.transform(part)
            .select("p_partkey", vector_to_array("features").alias("f"))
            .collect()
        }

    assert norms(model) == norms(reloaded)


def test_vector_array_roundtrip(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0])], ["id", "arr"])
    back = (
        df.withColumn("vec", to_vector("arr"))
        .withColumn("arr2", to_array("vec"))
        .select("arr", "arr2")
        .first()
    )
    assert back.arr == back.arr2


def test_model_registry_version_promote_load(spark, part, tmp_path_factory):
    """M7 registry parity (`03_Train & Deploy Model.py:324-343`):
    register two versions, archive-then-promote, load by stage."""
    from fuzzy_item_matching_spark.operators.registry import (
        ARCHIVED,
        PRODUCTION,
        ModelRegistry,
    )

    reg = ModelRegistry(str(tmp_path_factory.mktemp("registry")))
    m1 = fit_name_pipeline(part, "p_partkey", "p_name")
    m2 = fit_name_pipeline(part, "p_partkey", "p_name", num_features=1024)
    assert reg.register("name_matcher", m1) == 1
    assert reg.register("name_matcher", m2) == 2

    reg.promote("name_matcher", 1)
    assert reg.resolve("name_matcher", stage=PRODUCTION) == 1
    # archive-then-promote: v2 takes Production, v1 is archived
    reg.promote("name_matcher", 2)
    assert reg.resolve("name_matcher", stage=PRODUCTION) == 2
    stages = {m["version"]: m["stage"] for m in reg.versions("name_matcher")}
    assert stages == {1: ARCHIVED, 2: PRODUCTION}

    served = reg.load("name_matcher", stage=PRODUCTION)
    got = served.transform(part).select("p_partkey", "features").first()
    assert got["features"].size == 1024  # it's v2, not v1

    with pytest.raises(ValueError):
        reg.load("name_matcher", version=3)
    with pytest.raises(ValueError):
        reg.resolve("name_matcher", stage="Staging")
