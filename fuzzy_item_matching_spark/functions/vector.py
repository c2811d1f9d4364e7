"""Vector math over ``array<float|double>`` columns.

Replaces the reference's Scala ``squared_dist`` UDF
(`03_Train & Deploy Model.py:86-96`) and Normalizer
(`01_Feature Engineering.py:292-295`) with native higher-order-function
expressions: zero UDF overhead, whole-stage codegen, and exact DuckDB
oracles via list_* functions. Engine-wide vector type is array<float>
(SURVEY §7.0); math is done in double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ, folded in array order (deterministic)."""
    prod = F.zip_with(
        _c(a).cast("array<double>"), _c(b).cast("array<double>"), lambda x, y: x * y
    )
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def squared_dist(a: Column | str, b: Column | str) -> Column:
    """Σ (aᵢ-bᵢ)² — Vectors.sqdist parity (V1, `03_Train & Deploy Model.py:92-96`)."""
    diff = F.zip_with(
        _c(a).cast("array<double>"),
        _c(b).cast("array<double>"),
        lambda x, y: (x - y) * (x - y),
    )
    return F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def l2_normalize(a: Column | str) -> Column:
    """v / ||v||₂ with ||v||=0 passed through as zeros — Normalizer(p=2)
    parity (T9, `01_Feature Engineering.py:292-295`).

    r14 (guide §4.1, the HOF-CSE trap): ``transform(v, x -> x / n)``
    inlined the whole O(dim) norm fold into the lambda, re-running it
    per ELEMENT — O(dim²) interpreted ops per row (measured 2.1 s for
    a 2000×64 scan at sf0.1). ``array_repeat`` evaluates the norm
    ONCE per row and the zip_with divides by the repeated value —
    identical IEEE divisions, O(dim) per row (measured 0.2 s)."""
    v = _c(a).cast("array<double>")
    n = l2_norm(v)
    return F.when(n == 0.0, v).otherwise(
        F.zip_with(
            v, F.array_repeat(n, F.size(v)), lambda x, nn: x / nn
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (||a||·||b||); 0.0 when either norm is 0."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)
