"""Content-keyed sampling — reproducible randomness for pipelines.

Spark's ``df.sample``/``randomSplit`` are seeded per PARTITION
(XORShiftRandom over the row stream), so the selected set changes with
partitioning, file layout, and engine — reproducible only within one
exact physical plan. At 100 TB the production requirement is usually
stronger: the same ROW must land in the same sample/split on every
run, cluster size, and engine (else train/test leak across reruns).
Content-keyed sampling delivers that: u = f(md5(seed:key)) per row,
a pure column expression — deterministic, shuffle-free, portable, and
exactly DuckDB-replicable (the same construction backs the
hyperparameter sampler, operators/tuning.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fuzzy_item_matching_spark.functions.text import hex_long_once


def keyed_uniform(key: Column, seed: int = 42) -> Column:
    """u ~ [0,1) from the first 8 md5 hex digits of ``seed:key`` —
    content-keyed, so the draw survives repartitioning and engine
    swaps. SQL twin:
    ``CAST(CAST('0x'||substr(md5(seed||':'||key),1,8) AS BIGINT)
    AS DOUBLE) / 4294967296.0``.

    Built on ``hex_long_once`` (single-reference conv) because this
    Column lands inline in filter conditions, where codegen would
    otherwise recompute the md5 16× per row (measured 8× slowdown)."""
    k = F.concat_ws(":", F.lit(str(seed)), key.cast("string"))
    return hex_long_once(F.md5(k.cast("binary")), 1).cast("double") / F.lit(
        float(2**32)
    )


def keyed_sample(
    df: DataFrame, key: Column, fraction: float, seed: int = 42
) -> DataFrame:
    """Bernoulli(fraction) keep decision per row, keyed on ``key``
    (S7's reproducible form). Rows where u < fraction survive."""
    return df.filter(keyed_uniform(key, seed) < F.lit(fraction))


def keyed_split(
    df: DataFrame,
    key: Column,
    weights: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic dataset split (M5's reproducible form): cumulative
    [0,1) ranges per label over the keyed uniform. Weights must sum to
    ~1; the last label absorbs the remainder."""
    labels = list(weights)
    # bind u once — the when-chain references it per branch
    bound_df = df.withColumn("__u", keyed_uniform(key, seed))
    u = F.col("__u")
    expr = F.lit(labels[-1])
    hi = 0.0
    branches: list[tuple[float, str]] = []
    for name in labels[:-1]:
        hi += weights[name]
        branches.append((hi, name))
    for bound, name in reversed(branches):
        expr = F.when(u < F.lit(bound), F.lit(name)).otherwise(expr)
    return bound_df.withColumn(split_col, expr).drop("__u")
