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
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

RESULT_SCHEMA = "param double, score double, n long"


@dataclass(frozen=True)
class ParamSpec:
    """One dimension of a hyperparameter search space (M2/M3,
    `03_Train & Deploy Model.py:163-192`).

    kind: 'uniform' | 'quniform' | 'loguniform' | 'choice'.
    quniform quantizes with floor(x/q + 0.5)*q — floor is bit-identical
    across engines, unlike round() (Spark HALF_UP vs numpy half-even).
    ``as_int`` applies the reference's param coercion (depth /
    child-weight cast to int before reaching the trainer).
    """

    name: str
    kind: str = "uniform"
    lo: float = 0.0
    hi: float = 1.0
    q: float = 1.0
    options: tuple[str, ...] = field(default_factory=tuple)
    as_int: bool = False


def _hash_uniform(seed: int, trial: Column, name: str) -> Column:
    """Deterministic u ~ [0,1) from (seed, trial, param name): first 8
    md5 hex digits as a 32-bit int, scaled by 2^-32. md5 is
    bit-identical across engines, and /2^32 is an exact binary scaling,
    so every draw is exactly reproducible in SQL — the property
    hyperopt's TPE sampler can't offer."""
    from fuzzy_item_matching_spark.functions.text import hex_long_once

    key = F.concat_ws(":", F.lit(str(seed)), trial.cast("string"), F.lit(name))
    h = hex_long_once(F.md5(key.cast("binary")), 1)
    return h.cast("double") / F.lit(float(2**32))


def _spec_value(spec: ParamSpec, u: Column) -> Column:
    span = F.lit(spec.hi) - F.lit(spec.lo)
    if spec.kind == "uniform":
        v = F.lit(spec.lo) + u * span
    elif spec.kind == "quniform":
        raw = F.lit(spec.lo) + u * span
        v = F.floor(raw / F.lit(spec.q) + F.lit(0.5)) * F.lit(spec.q)
    elif spec.kind == "loguniform":
        import math

        lo, hi = math.log(spec.lo), math.log(spec.hi)
        v = F.exp(F.lit(lo) + u * (F.lit(hi) - F.lit(lo)))
    elif spec.kind == "choice":
        arr = F.array(*[F.lit(o) for o in spec.options])
        return F.element_at(arr, (F.floor(u * len(spec.options)) + 1).cast("int"))
    else:  # pragma: no cover - guarded by callers
        raise ValueError(f"unknown spec kind: {spec.kind}")
    return v.cast("long") if spec.as_int else v


def sample_search_space(
    spark: SparkSession,
    n_trials: int,
    specs: list[ParamSpec],
    seed: int = 42,
    fixed: dict[str, object] | None = None,
) -> DataFrame:
    """M2+M3: a seeded hyperparameter search space as a DataFrame —
    one row per trial, one column per parameter.

    The reference draws its 9-dim XGBoost space with hp.quniform /
    hp.loguniform under hyperopt's stateful TPE
    (`03_Train & Deploy Model.py:163-192`); the engine-native form is a
    stateless low-discrepancy hash draw: param_value = f(md5(seed,
    trial, name)), entirely JVM-side expressions. Trials are plan rows,
    so the space feeds grid_search_threshold / applyInPandas evaluators
    (M4) without ever touching the driver, and any slice of it is
    reproducible on any engine. ``fixed`` appends the reference's
    constant params (tree_method='hist', scale_pos_weight, ...)."""
    t = spark.range(n_trials).select(F.col("id").alias("trial_id"))
    cols: list[Column] = []
    for spec in specs:
        u = _hash_uniform(seed, F.col("trial_id"), spec.name)
        cols.append(_spec_value(spec, u).alias(spec.name))
    for k, v in (fixed or {}).items():
        cols.append(F.lit(v).alias(k))
    return t.select("trial_id", *cols)


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


HALVING_SCHEMA = "trial_id long, param double, score double, n long"


def successive_halving(
    scored: DataFrame,
    configs: DataFrame,
    rungs: list[tuple[float, int]],
    label_col: str = "label",
    score_col: str = "score",
    u_col: str = "u",
    param_col: str = "param",
) -> DataFrame:
    """Adaptive hyperparameter search (M4) as pure dataflow: seeded
    successive halving over the applyInPandas evaluation skeleton of
    :func:`grid_search_threshold`.

    The reference runs hyperopt TPE with SparkTrials — adaptive but
    stateful and non-replayable (`03_Train & Deploy Model.py:243-253`).
    The engine-native adaptive form trades TPE's model for a replayable
    schedule: rung r evaluates the surviving configs on a keyed-uniform
    data subset (``u < fraction``), ranks by objective, and keeps the
    top-k for the next (larger) rung — cheap broad exploration first,
    full-data evaluation only for finalists, exactly the
    budget-allocation idea of Hyperband's inner loop.

    EVERYTHING is a plan: subsets are filters on the content-keyed
    uniform (reproducible under any partitioning), each rung's
    evaluation is one applyInPandas group per config (closure-shipping,
    F4), survivor selection is a window rank + join — no driver
    collect anywhere, and every intermediate is exactly replayable in
    SQL (the oracle replays all rungs). ``rungs`` is a list of
    (data_fraction, keep) pairs; the final rung's keep marks the
    winner. Returns the full trace: (rung, trial_id, param, score, n,
    rnk, kept).
    """
    from pyspark.sql.window import Window

    def evaluate(pdf: pd.DataFrame) -> pd.DataFrame:
        t = float(pdf[param_col].iloc[0])
        pred = pdf["__score"] >= t
        tp = int((pred & (pdf["__label"] == 1)).sum())
        fp = int((pred & (pdf["__label"] == 0)).sum())
        fn = int((~pred & (pdf["__label"] == 1)).sum())
        f1 = (2.0 * tp / (2 * tp + fp + fn)) if (2 * tp + fp + fn) else 0.0
        return pd.DataFrame(
            {
                "trial_id": [int(pdf["trial_id"].iloc[0])],
                param_col: [t],
                "score": [f1],
                "n": [len(pdf)],
            }
        )

    rows = scored.select(
        F.col(label_col).alias("__label"),
        F.col(score_col).alias("__score"),
        F.col(u_col).alias("__u"),
    )
    current = configs
    trace = []
    w = Window.orderBy(F.desc("score"), F.asc("trial_id"))
    for rung, (fraction, keep) in enumerate(rungs):
        sub = rows.filter(F.col("__u") < F.lit(fraction))
        joined = sub.crossJoin(F.broadcast(current))
        evals = joined.groupBy("trial_id", param_col).applyInPandas(
            evaluate,
            # schema follows param_col — HALVING_SCHEMA is its
            # default-name instance; a custom param_col must surface in
            # the output column too or applyInPandas rejects the frame.
            schema=f"trial_id long, {param_col} double, score double, n long",
        )
        ranked = evals.withColumn("rnk", F.row_number().over(w))
        last = rung == len(rungs) - 1
        kept = F.col("rnk") <= F.lit(1 if last else keep)
        trace.append(
            ranked.select(
                F.lit(rung).alias("rung"),
                "trial_id",
                F.col(param_col),
                "score",
                "n",
                "rnk",
                kept.cast("int").alias("kept"),
            )
        )
        if not last:
            current = (
                ranked.filter(F.col("rnk") <= F.lit(keep))
                .select("trial_id", param_col)
            )
    out = trace[0]
    for t in trace[1:]:
        out = out.unionByName(t)
    return out


TPE_SCHEMA = "round int, trial_id long, param double, score double, n long"


def tpe_lite(
    scored: DataFrame,
    lo: float,
    hi: float,
    n_init: int = 8,
    rounds: int = 2,
    n_candidates: int = 16,
    k_per_round: int = 4,
    gamma: float = 0.25,
    seed: int = 19,
    label_col: str = "label",
    score_col: str = "score",
) -> DataFrame:
    """Deterministic TPE-shaped adaptive search (M4's density-model
    proposal step) — the replayable skeleton of hyperopt's
    ``fmin(tpe.suggest)`` (`03_Train & Deploy Model.py:243-253`):

    1. evaluate ``n_init`` md5-seeded threshold configs (F1 on the
       full (label, score) frame — a JVM-side conditional-count
       aggregate, no UDF);
    2. per round: split observed trials at the γ-quantile into good/
       bad (window rank, total tie-break), draw ``n_candidates``
       proposals from the GOOD set's Parzen mixture (md5-seeded kernel
       pick + triangular offset, clamped to [lo, hi]), score each by
       the TPE acquisition l(x)/g(x) with triangular kernels
       (polynomial — no transcendentals, so the density is exactly
       SQL-replayable; per-pair terms round to 9 then DECIMAL-sum),
       and evaluate only the top ``k_per_round`` by the ratio;
    3. the trace of every evaluated trial is the output:
       (round, trial_id, param, score, n), round 0 = the init batch.

    Unlike hyperopt's stateful sampler, every draw, split, density,
    and elimination here is a pure column expression — identical on
    any engine or partitioning. Scale: each round costs one broadcast
    crossJoin (k configs × data) + one grouped count aggregate; the
    observed-trial frames are tens of rows.
    """
    from pyspark.sql.window import Window

    spark = scored.sparkSession
    h_prop = (hi - lo) / 8.0  # proposal kernel half-width
    h_dens = (hi - lo) / 4.0  # density kernel half-width
    rows = scored.select(
        F.col(label_col).alias("__label"), F.col(score_col).alias("__score")
    ).persist()

    def evaluate(cfgs: DataFrame, rnd: int) -> DataFrame:
        """F1 per config — JVM-side conditional counts, UDF-free."""
        pos = F.col("__score") >= F.col("param")
        ev = (
            rows.crossJoin(F.broadcast(cfgs))
            .groupBy("trial_id", "param")
            .agg(
                F.sum(F.when(pos & (F.col("__label") == 1), 1).otherwise(0))
                .alias("tp"),
                F.sum(F.when(pos & (F.col("__label") == 0), 1).otherwise(0))
                .alias("fp"),
                F.sum(F.when(~pos & (F.col("__label") == 1), 1).otherwise(0))
                .alias("fn"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        denom = 2 * F.col("tp") + F.col("fp") + F.col("fn")
        return ev.select(
            F.lit(rnd).alias("round"),
            "trial_id",
            "param",
            F.when(denom == 0, 0.0)
            .otherwise(2.0 * F.col("tp") / denom)
            .alias("score"),
            "n",
        )

    init = spark.range(n_init).select(F.col("id").alias("trial_id"))
    u0 = _hash_uniform(seed, F.col("trial_id"), "param")
    cfg0 = init.select(
        "trial_id", (F.lit(lo) + u0 * (F.lit(hi) - F.lit(lo))).alias("param")
    )
    obs = evaluate(cfg0, 0).localCheckpoint(eager=True)

    w = Window.orderBy(F.desc("score"), F.asc("trial_id"))
    n_obs = n_init
    for r in range(1, rounds + 1):
        import math

        # Clamp to n_obs - 1 so the bad set is never empty: with
        # gamma high enough that ceil(gamma*n) == n, the acquisition's
        # g(x) denominator would be float(0) -> NaN/inf ratios and an
        # arbitrary proposal ranking.
        good_n = min(max(1, math.ceil(gamma * n_obs)), n_obs - 1)
        if good_n < 1:
            raise ValueError(
                f"tpe_lite needs n_init >= 2 observed trials (got {n_obs})"
            )
        ranked = obs.withColumn("rnk", F.row_number().over(w))
        cand = spark.range(n_candidates).select(F.col("id").alias("cand_id"))
        u1 = _hash_uniform(seed, F.col("cand_id"), f"pick{r}")
        u2 = _hash_uniform(seed, F.col("cand_id"), f"off{r}")
        cand = cand.select(
            "cand_id",
            (F.floor(u1 * F.lit(good_n)) + 1).cast("int").alias("pick_rnk"),
            u2.alias("u2"),
        )
        good = ranked.filter(F.col("rnk") <= good_n).select(
            F.col("rnk").alias("pick_rnk"), F.col("param").alias("center")
        )
        x = F.least(
            F.greatest(
                F.col("center")
                + (F.lit(2.0) * F.col("u2") - F.lit(1.0)) * F.lit(h_prop),
                F.lit(lo),
            ),
            F.lit(hi),
        )
        props = cand.join(F.broadcast(good), "pick_rnk").select(
            "cand_id", x.alias("x")
        )
        # TPE acquisition: triangular-kernel Parzen densities over the
        # good and bad observed sets (terms rounded to 9, DECIMAL-sum)
        term = F.round(
            F.greatest(
                F.lit(0.0),
                F.lit(1.0)
                - F.abs(F.col("x") - F.col("param")) / F.lit(h_dens),
            ),
            9,
        )
        dec = "decimal(38,18)"
        dens = (
            props.crossJoin(F.broadcast(ranked))
            .groupBy("cand_id", "x")
            .agg(
                F.sum(
                    F.when(F.col("rnk") <= good_n, term)
                    .otherwise(0.0)
                    .cast(dec)
                )
                .cast("double")
                .alias("l_sum"),
                F.sum(
                    F.when(F.col("rnk") > good_n, term)
                    .otherwise(0.0)
                    .cast(dec)
                )
                .cast("double")
                .alias("g_sum"),
            )
        )
        ratio = F.round(
            (F.col("l_sum") / F.lit(float(good_n)) + F.lit(1e-9))
            / (F.col("g_sum") / F.lit(float(n_obs - good_n)) + F.lit(1e-9)),
            9,
        )
        wr = Window.orderBy(F.desc("ratio"), F.asc("cand_id"))
        top = (
            dens.withColumn("ratio", ratio)
            .withColumn("prnk", F.row_number().over(wr))
            .filter(F.col("prnk") <= k_per_round)
            .select(
                (F.lit(n_obs) + F.col("prnk") - 1)
                .cast("long")
                .alias("trial_id"),
                F.col("x").alias("param"),
            )
        )
        obs = obs.unionByName(evaluate(top, r)).localCheckpoint(eager=True)
        n_obs += k_per_round
    rows.unpersist()
    return obs
