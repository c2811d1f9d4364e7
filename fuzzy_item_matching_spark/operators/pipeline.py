"""Composable featurizer pipelines (T12, `01_Feature Engineering.py:298`).

The reference composes ml.feature stages into ``ml.Pipeline`` objects
fit once and applied to any conforming DataFrame. The engine-native
equivalent is a named chain of DataFrame→DataFrame transforms — no
VectorUDT, no JVM estimator state; "fitting" corpus statistics (IDF)
is itself a transform that closes over nothing, so the same pipeline
object is reusable across inputs and scales (each stage is a lazy
plan extension, the composition never materializes intermediates).

SQL-stage parity (T13 SQLTransformer, `01_Feature Engineering.py:205-216`):
``sql_stage`` runs an arbitrary SQL statement with ``__THIS__`` bound
to the current DataFrame, exactly the SQLTransformer contract.
"""

from __future__ import annotations

import uuid
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

Transform = Callable[[DataFrame], DataFrame]


@dataclass
class Pipeline:
    """Ordered, named DataFrame transforms; ``transform`` folds them."""

    stages: list[tuple[str, Transform]] = field(default_factory=list)

    def add(self, name: str, fn: Transform) -> "Pipeline":
        self.stages.append((name, fn))
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        for _, fn in self.stages:
            df = fn(df)
        return df

    def __or__(self, other: "Pipeline") -> "Pipeline":
        return Pipeline(stages=self.stages + other.stages)


def sql_stage(statement: str) -> Transform:
    """SQLTransformer parity: ``statement`` contains ``__THIS__`` as the
    input-table placeholder (`01_Feature Engineering.py:205-216`)."""

    def fn(df: DataFrame) -> DataFrame:
        view = f"__this_{uuid.uuid4().hex[:12]}"
        df.createOrReplaceTempView(view)
        return df.sparkSession.sql(statement.replace("__THIS__", view))

    return fn


def column_stage(**cols) -> Transform:
    """withColumn for each (name, Column expression) pair."""

    def fn(df: DataFrame) -> DataFrame:
        for name, col in cols.items():
            df = df.withColumn(name, col)
        return df

    return fn
