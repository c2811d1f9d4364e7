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

    The whole payload travels as ONE struct carried by a single
    ignore-nulls last(): a right row with NULL payload values still
    produces a non-null struct, so it correctly shadows older rows
    (per-column carries would skip the NULL and resurrect a stale
    value — and could even mix columns from different right rows), and
    'inner' keys off row presence, not a payload value. Matches DuckDB
    ASOF JOIN under NULL payloads (tests/test_asof.py).
    """
    from pyspark.sql import types as T

    payload_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in payload_cols]
    )
    lt = left.select(
        *left.columns,
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(payload_type).alias("__p"),
    )
    rt = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c != key
        ],
        F.col(key),
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        F.struct(*[F.col(c).alias(c) for c in payload_cols]).alias("__p"),
    )
    lcols = list(left.columns)
    unioned = lt.select(*lcols, "__side", "__ts", "__p").unionByName(
        rt.select(*lcols, "__side", "__ts", "__p"), allowMissingColumns=False
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.asc("__ts"), F.asc("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *lcols,
        "__side",
        F.last("__p", ignorenulls=True).over(w).alias("__pc"),
    )
    out = carried.filter(F.col("__side") == 1)
    if how == "inner":
        out = out.filter(F.col("__pc").isNotNull())
    return out.select(
        *lcols,
        *[F.col("__pc").getField(c).alias(f"asof_{c}") for c in payload_cols],
    )
