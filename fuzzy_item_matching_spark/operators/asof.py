"""As-of (point-in-time) join — a custom operator Spark lacks.

For each left row, attach the latest right row of the same key with
right.ts ≤ left.ts. The naive theta-join (t1 ≥ t2 + window per pair)
is quadratic per key; the scalable form is the UNION-AND-CARRY
pattern: tag both sides, union, sort within key by (ts, side), and
carry the last right payload forward with an ignore-nulls window —
ONE shuffle on the key, state is a single row regardless of key size.
DuckDB's native ASOF JOIN is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """For each left row: columns of the latest right row (same key,
    right_ts ≤ left_ts), NULL if none precedes (how='left') or row
    dropped (how='inner').

    Ties (right_ts == left_ts) match — the right side sorts before the
    left at equal timestamps.
    """
    lt = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = right.withColumn("__side", F.lit(0)).withColumn("__ts", F.col(right_ts))
    for c in payload_cols:
        lt = lt.withColumn(f"__p_{c}", F.lit(None).cast(right.schema[c].dataType))
        rt = rt.withColumn(f"__p_{c}", F.col(c))
    lcols = [c for c in left.columns]
    unioned = lt.select(
        *lcols, "__side", "__ts", *[f"__p_{c}" for c in payload_cols]
    ).unionByName(
        rt.select(
            *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
            F.col(key),
            "__side",
            "__ts",
            *[f"__p_{c}" for c in payload_cols],
        ),
        allowMissingColumns=False,
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.asc("__ts"), F.asc("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *lcols,
        "__side",
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(c2)
            for c, c2 in [(c, f"asof_{c}") for c in payload_cols]
        ],
    )
    out = carried.filter(F.col("__side") == 1).drop("__side")
    if how == "inner":
        out = out.filter(F.col(f"asof_{payload_cols[0]}").isNotNull())
    return out
