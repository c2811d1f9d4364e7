"""Skew mitigation: salted joins and bucketed (co-located) joins.

AQE's skew-join handling (on in session.py) covers most skew at
runtime by splitting oversized partitions. Salting is the explicit
form for the pathological case AQE can't fix — a single join key whose
rows exceed one executor's memory: spread the hot key across S
sub-keys and replicate the other side S times.

Bucketing is the complementary technique for REPEATED joins on the
same key: pay the shuffle once at write time (bucketBy), then every
subsequent join/aggregation on that key is exchange-free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the big side's hot keys spread across ``salt``
    sub-partitions and the small side replicated ``salt`` times.

    Result is row-identical to ``big.join(small, on, how)`` for
    ``how`` in {inner, left, left_semi}; the only change is physical:
    the shuffle key becomes (on, salt_id), so one hot key occupies
    ``salt`` reducers instead of one. right/full joins are rejected —
    the explode replicates every unmatched small-side row ``salt``
    times, so null-extended rows would duplicate. Salt assignment is
    deterministic (hash of the big side's full row) — reruns produce
    identical partitioning. Cost: small side ×salt (keep it
    broadcast-sized × salt).
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports how in {sorted(allowed)}, got {how!r}: "
            "right/full would duplicate unmatched small-side rows "
            f"{salt}x via the salt explode"
        )
    big_salted = big.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    small_rep = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_salted.join(small_rep, [on, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int = 16
) -> None:
    """Persist ``df`` bucketed+sorted by ``key`` (saveAsTable — bucket
    metadata lives in the catalog). Subsequent equi-joins between
    tables bucketed the same way run WITHOUT a shuffle on either side
    (SortMergeJoin over pre-bucketed scans)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS `{table_name}`")
    # A stale location from a previous session (table gone from the
    # in-memory catalog, files still on disk) blocks saveAsTable.
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table_name.lower())
    shutil.rmtree(loc, ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table_name)
    )
