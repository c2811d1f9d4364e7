"""Named query registry — the engine's checkable capability surface.

Every operator from SURVEY.md §2 (plus the scale extensions: dedup,
similarity search, text analysis) is exposed as a named query:

    (spark, sf_dir) -> DataFrame            # Spark-first implementation
    oracle: str | None                      # equivalent DuckDB SQL

The driver (and tests/) runs both at sf0.01 and compares row count,
schema, and an order-insensitive value hash. Queries whose semantics are
not SQL-expressible (LSH bucketing, streaming state) register
``oracle=None`` → rows-only check, with stronger checks in tests/.

Determinism rules for oracle-checked queries:
- every computed column is aliased identically in Spark and SQL;
- floating aggregates go through DECIMAL(18,2) (exact, order-insensitive)
  or are rounded to a fixed scale both sides;
- LIMIT only after a total order (unique tie-break key);
- no wall-clock, no unseeded randomness.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over pre-registered views, or None
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as a named engine query with an optional oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY)."""
    from fuzzy_item_matching_spark.queries import (  # noqa: F401
        dedup,
        multimodal,
        relational,
        serving,
        similarity,
        sources,
        streaming,
        training,
        text,
        textstats,
        vectors,
    )

    return REGISTRY
