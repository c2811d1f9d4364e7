"""Rows-only surfaces get real checks here: seeded-sample determinism,
MERGE idempotence, pipeline composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from fuzzy_item_matching_spark.operators.merge import merge_upsert
from fuzzy_item_matching_spark.operators.pipeline import Pipeline, column_stage, sql_stage
from fuzzy_item_matching_spark.tables import load_table

from .conftest import SF_CHECK


def test_seeded_sample_deterministic_and_fractional(spark):
    li = load_table(spark, SF_CHECK, "lineitem")
    a = li.sample(fraction=0.1, seed=42).count()
    b = li.sample(fraction=0.1, seed=42).count()
    total = li.count()
    assert a == b, "same seed must give the same sample"
    assert 0.05 * total < a < 0.15 * total


def test_merge_upsert_idempotent_and_correct(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "name", "v"]
    )
    source = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], ["id", "name", "v"]
    )
    once = merge_upsert(target, source, ["id"])
    rows = {r.id: (r.name, r.v) for r in once.collect()}
    assert rows == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}
    twice = merge_upsert(once, source, ["id"])
    assert {tuple(r) for r in twice.collect()} == {tuple(r) for r in once.collect()}


def test_merge_upsert_rejects_schema_mismatch(spark):
    import pytest

    t = spark.createDataFrame([(1, "a")], ["id", "x"])
    s = spark.createDataFrame([(1, 2.0)], ["id", "y"])
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(t, s, ["id"])


def test_pipeline_composition_and_sql_stage(spark):
    df = spark.createDataFrame([("hello world",), ("spark",)], ["text"])
    p1 = Pipeline().add("up", column_stage(up=F.upper("text")))
    p2 = Pipeline().add(
        "sql", sql_stage("SELECT up, length(up) AS n FROM __THIS__")
    )
    out = (p1 | p2).transform(df).collect()
    assert {(r.up, r.n) for r in out} == {("HELLO WORLD", 11), ("SPARK", 5)}


def test_versioned_table_commit_and_vacuum(spark):
    """Time-travel protocol: versions are immutable once committed,
    the manifest is the commit point (an orphan snapshot directory
    without a manifest entry is invisible), and vacuum removes exactly
    the expired snapshots."""
    import json
    import os
    import shutil

    import pytest

    from fuzzy_item_matching_spark.operators.versioned import VersionedTable

    path = "/root/repo/.scratch/vt_protocol"
    shutil.rmtree(path, ignore_errors=True)
    vt = VersionedTable(spark, path)
    v1 = vt.write_version(spark.range(10))
    v2 = vt.write_version(spark.range(20))
    v3 = vt.write_version(spark.range(30))
    assert (v1, v2, v3) == (1, 2, 3)
    assert vt.read(version=v1).count() == 10
    assert vt.read().count() == 30

    # an uncommitted (orphan) snapshot directory must be invisible
    os.makedirs(os.path.join(path, "v=99"), exist_ok=True)
    assert vt.versions() == [1, 2, 3]
    with pytest.raises(ValueError, match="not in committed set"):
        vt.read(version=99)

    dropped = vt.vacuum(keep_last=1)
    assert dropped == [1, 2]
    assert vt.versions() == [3]
    assert vt.read().count() == 30
    assert not os.path.exists(os.path.join(path, "v=1"))
    with pytest.raises(ValueError, match="not in committed set"):
        vt.read(version=1)
    # manifest reflects exactly the surviving set
    with open(os.path.join(path, "_versions.json")) as f:
        assert json.load(f) == {"versions": [3]}
