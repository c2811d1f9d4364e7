"""Distributed hyperparameter evaluation (F4/M4) — engine-native.

The reference ships its objective closure to executors with
hyperopt SparkTrials (`03_Train & Deploy Model.py:202-253`): each trial
is a 1-task job evaluating one parameter point. The engine-native,
dependency-free form: the parameter grid is a DataFrame, the objective
is an ``applyInPandas`` group map (one group = one parameter point),
and the evaluation data rides along via a join — the same
closure-to-executor shape, deterministic and seedable, no hyperopt.

At scale: grid points evaluate in parallel across executors; the eval
data is replicated per point via the cross join (broadcast — grids are
small), never collected to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RESULT_SCHEMA = "param double, score double, n long"


def grid_search_threshold(
    scored: DataFrame,
    thresholds: list[float],
    label_col: str = "label",
    score_col: str = "score",
    objective: Callable[[pd.DataFrame, float], float] | None = None,
) -> DataFrame:
    """Evaluate a threshold grid against (label, score) rows; return
    (param, score=F1, n) per grid point.

    Each grid point's evaluation runs as one ``applyInPandas`` group on
    an executor — the closure-shipping pattern of SparkTrials with
    deterministic results. Default objective: F1 of predicting
    positive when score ≥ threshold.
    """
    spark = scored.sparkSession
    grid = spark.createDataFrame([(float(t),) for t in thresholds], ["param"])
    # Small side (grid) broadcast against the eval rows.
    joined = scored.select(
        F.col(label_col).alias("label"), F.col(score_col).alias("score")
    ).crossJoin(F.broadcast(grid))

    def evaluate(pdf: pd.DataFrame) -> pd.DataFrame:
        t = float(pdf["param"].iloc[0])
        if objective is not None:
            f1 = objective(pdf, t)
        else:
            pred = pdf["score"] >= t
            tp = int((pred & (pdf["label"] == 1)).sum())
            fp = int((pred & (pdf["label"] == 0)).sum())
            fn = int((~pred & (pdf["label"] == 1)).sum())
            f1 = (2.0 * tp / (2 * tp + fp + fn)) if (2 * tp + fp + fn) else 0.0
        return pd.DataFrame({"param": [t], "score": [f1], "n": [len(pdf)]})

    return joined.groupBy("param").applyInPandas(evaluate, schema=RESULT_SCHEMA)
