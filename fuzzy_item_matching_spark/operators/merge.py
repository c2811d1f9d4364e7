"""Incremental upsert — the reference's Delta MERGE (S6) re-expressed.

The reference maintains its feature table with
``DeltaTable.merge(...).whenMatchedUpdate(...).whenNotMatchedInsertAll()``
(`03_Train & Deploy Model.py:480-495`). Without requiring Delta, the
identical upsert semantics are: source rows win on key match, unmatched
target rows survive:

    merged = source ∪ (target ⟕anti source on keys)

When delta-spark is importable and the target is a Delta path, the
fast-path issues a real MERGE (rewrites only matched files); the
anti-join form is the engine-portable equivalent with one shuffle on
the key (AQE broadcasts a small source — the common incremental case:
a trickle of updates against a huge target).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """Upsert ``source`` into ``target`` on ``keys`` (source wins).

    Column sets must match (whenMatchedUpdate(set=all) +
    whenNotMatchedInsertAll semantics). Idempotent: applying the same
    source twice yields the same result.
    """
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"schema mismatch: target={sorted(target.columns)} "
            f"source={sorted(source.columns)}"
        )
    kept = target.join(source.select(*keys), on=keys, how="left_anti")
    return kept.unionByName(source)


def merge_upsert_delta(spark, target_path: str, source: DataFrame, keys: list[str]) -> bool:
    """Delta fast-path: real MERGE INTO when delta-spark is available.
    Returns False (caller should fall back to ``merge_upsert`` +
    overwrite) when Delta isn't importable in this environment.
    """
    try:
        from delta.tables import DeltaTable  # type: ignore[import-not-found]
    except ImportError:
        return False
    t = DeltaTable.forPath(spark, target_path)
    cond = " AND ".join(f"t.`{k}` = s.`{k}`" for k in keys)
    (
        t.alias("t")
        .merge(source.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    return True
