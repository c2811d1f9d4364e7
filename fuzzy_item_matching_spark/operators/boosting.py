"""Engine-native boosted stumps (AdaBoost) — the exact-oracle twin of
the reference's boosted-tree classifier shape.

The reference's match model is XGBoost over three squared-distance
features (`03_Train & Deploy Model.py:176-192,283-305`). Its exact
algorithm is not replayable (histogram binning + multi-threaded split
search), but the CAPABILITY — a boosted ensemble of axis-aligned
threshold splits over the distance features — is: AdaBoost with
depth-1 trees (decision stumps) is a sequence of weighted aggregates,
so the whole fit runs as Spark plans and replays in SQL:

- stump candidates: a FIXED grid of thresholds per feature
  (min + k·(max−min)/G, exact double arithmetic) × both polarities;
- per round: weighted error of every candidate in one crossJoin +
  aggregate (DECIMAL-summed, order-insensitive), argmin with a total
  tie-break, α = ½·ln((1−err)/err) rounded to 9 digits, and the TWO
  weight factors e^{∓α} rounded to 9 digits — so the only
  transcendentals are 3 scalars per round, quantized before they can
  compound (the logistic-GD discipline, operators/logreg.py);
- weight update: per-row multiplication by one of the two quantized
  scalars — no per-row transcendental anywhere.

Scale: per round, one pass over the (persisted) training frame against
a broadcast candidate grid, one vocabulary-of-candidates aggregate,
one 1-row argmin collect (the BPE-argmax budget, KB-scale), one
projection updating the weight column. K rounds = K passes.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRID = 16  # thresholds per feature: k = 1..GRID-1
ERR_FLOOR = 1e-9  # clamp keeps alpha finite on degenerate rounds


def _alpha_factors(err: float) -> tuple[float, float, float]:
    """(alpha, f_correct, f_wrong), each rounded to 9 digits — the
    only transcendental evaluations in the fit, quantized so libm
    last-ulp differences can't compound across rounds."""
    e = min(max(err, ERR_FLOOR), 1.0 - ERR_FLOOR)
    alpha = round(0.5 * math.log((1.0 - e) / e), 9)
    return alpha, round(math.exp(-alpha), 9), round(math.exp(alpha), 9)


def adaboost_stumps(
    pairs: DataFrame,
    features: list[str],
    label: str = "label",
    rounds: int = 5,
    grid: int = GRID,
) -> DataFrame:
    """Fit ``rounds`` boosted stumps on ±1 labels derived from the 0/1
    ``label`` column; return the model table
    (round, feature, thr, pol, err, alpha).

    pol=+1 predicts +1 where x <= thr; pol=-1 predicts +1 where
    x > thr. err is the weighted error of the chosen stump on the
    weights entering that round (unnormalized — the ratio form is
    scale-invariant, so no per-round renormalization drift).
    """
    spark = pairs.sparkSession

    stats = pairs.agg(
        *[
            c
            for f_ in features
            for c in (
                F.min(f_).alias(f"mn_{f_}"),
                F.max(f_).alias(f"mx_{f_}"),
            )
        ]
    ).first()

    cand_rows = []
    for f_ in features:
        mn, mx = float(stats[f"mn_{f_}"]), float(stats[f"mx_{f_}"])
        for k in range(1, grid):
            thr = mn + k * (mx - mn) / float(grid)
            for pol in (1, -1):
                cand_rows.append((f_, thr, pol))
    cands = F.broadcast(
        spark.createDataFrame(cand_rows, "feature string, thr double, pol int")
    )

    df = pairs.select(
        (2 * F.col(label) - 1).alias("__y"), *features
    ).withColumn("__w", F.lit(1.0))
    df = df.persist()

    feat_val = F.when(F.col("feature") == features[0], F.col(features[0]))
    for f_ in features[1:]:
        feat_val = feat_val.when(F.col("feature") == f_, F.col(f_))

    model: list[tuple[int, str, float, int, float, float]] = []
    for t in range(1, rounds + 1):
        joined = df.crossJoin(cands).withColumn("__x", feat_val)
        pred = F.when(
            ((F.col("pol") == 1) & (F.col("__x") <= F.col("thr")))
            | ((F.col("pol") == -1) & (F.col("__x") > F.col("thr"))),
            1,
        ).otherwise(-1)
        wrong = F.when(pred != F.col("__y"), F.col("__w")).otherwise(0.0)
        evals = (
            joined.groupBy("feature", "thr", "pol")
            .agg(
                (
                    F.sum(wrong.cast("decimal(38,18)")).cast("double")
                    / F.sum(F.col("__w").cast("decimal(38,18)")).cast("double")
                ).alias("err")
            )
            .orderBy(F.asc("err"), F.asc("feature"), F.asc("thr"), F.asc("pol"))
            .limit(1)
        )
        [best] = evals.collect()  # 1 row — the BPE-argmax budget
        alpha, f_corr, f_wrong = _alpha_factors(best["err"])
        model.append(
            (t, best["feature"], best["thr"], best["pol"], best["err"], alpha)
        )
        bx = F.col(best["feature"])
        h = F.when(
            (bx <= F.lit(best["thr"]))
            if best["pol"] == 1
            else (bx > F.lit(best["thr"])),
            1,
        ).otherwise(-1)
        nxt = df.withColumn(
            "__w",
            F.col("__w")
            * F.when(h == F.col("__y"), F.lit(f_corr)).otherwise(F.lit(f_wrong)),
        )
        nxt = nxt.localCheckpoint(eager=True)
        df.unpersist()
        df = nxt
    return spark.createDataFrame(
        model,
        "round int, feature string, thr double, pol int, err double,"
        " alpha double",
    )


def adaboost_ctes(
    pairs_sql: str, features: list[str], rounds: int = 5, grid: int = GRID
) -> tuple[str, str]:
    """The unrolled fit as (WITH-clause body, model-table UNION tail) —
    shared by the model query and the scoring query."""
    mn_mx = ", ".join(
        f"MIN({f_}) AS mn_{f_}, MAX({f_}) AS mx_{f_}" for f_ in features
    )
    cand_arms = []
    for f_ in features:
        for k in range(1, grid):
            thr = f"(mn_{f_} + {k} * (mx_{f_} - mn_{f_}) / {float(grid)!r})"
            for pol in (1, -1):
                cand_arms.append(
                    f"SELECT '{f_}' AS feature, {thr} AS thr,"
                    f" {pol} AS pol FROM stats"
                )
    feat_case = "CASE feature " + " ".join(
        f"WHEN '{f_}' THEN {f_}" for f_ in features
    ) + " END"
    parts = [
        f"WITH pairs AS MATERIALIZED ({pairs_sql})",
        f"stats AS MATERIALIZED (SELECT {mn_mx} FROM pairs)",
        "cands AS MATERIALIZED (" + " UNION ALL ".join(cand_arms) + ")",
        "w0 AS MATERIALIZED (SELECT 2 * label - 1 AS y, "
        + ", ".join(features)
        + ", 1.0 AS w FROM pairs)",
    ]
    e_clamp = (
        f"LEAST(GREATEST(err, {ERR_FLOOR!r}), {1.0 - ERR_FLOOR!r})"
    )
    arms = []
    for t in range(1, rounds + 1):
        parts.append(f"""ev{t} AS MATERIALIZED (
      SELECT feature, thr, pol,
             CAST(SUM(CAST(CASE WHEN (CASE WHEN (pol = 1 AND {feat_case} <= thr)
                                          OR (pol = -1 AND {feat_case} > thr)
                                     THEN 1 ELSE -1 END) != y
                            THEN w ELSE 0.0 END AS DECIMAL(38,18))) AS DOUBLE)
             / CAST(SUM(CAST(w AS DECIMAL(38,18))) AS DOUBLE) AS err
      FROM w{t - 1}, cands GROUP BY feature, thr, pol
    )""")
        parts.append(f"""best{t} AS MATERIALIZED (
      SELECT feature, thr, pol, err,
             round(0.5 * ln((1.0 - {e_clamp}) / {e_clamp}), 9) AS alpha
      FROM ev{t} ORDER BY err ASC, feature ASC, thr ASC, pol ASC LIMIT 1
    )""")
        parts.append(f"""w{t} AS MATERIALIZED (
      SELECT y, {", ".join(features)},
             w * (CASE WHEN (CASE WHEN (b.pol = 1 AND {feat_case} <= b.thr)
                                      OR (b.pol = -1 AND {feat_case} > b.thr)
                                 THEN 1 ELSE -1 END) = y
                       THEN round(exp(-b.alpha), 9)
                       ELSE round(exp(b.alpha), 9) END) AS w
      FROM w{t - 1}, best{t} b
    )""")
        arms.append(
            f"SELECT {t} AS round, feature, thr, pol, err, alpha FROM best{t}"
        )
    return ",\n".join(parts), "\nUNION ALL\n".join(arms)


def adaboost_stumps_sql(
    pairs_sql: str, features: list[str], rounds: int = 5, grid: int = GRID
) -> str:
    """DuckDB twin of :func:`adaboost_stumps`: identical candidate
    grid, weighted-error argmin, quantized alpha/factors, and weight
    recursion — unrolled one CTE level per round (MATERIALIZED:
    inlining re-expands the recursion exponentially)."""
    ctes, model_union = adaboost_ctes(pairs_sql, features, rounds, grid)
    return ctes + "\n" + model_union


def adaboost_score_sql(
    pairs_sql: str,
    features: list[str],
    rounds: int = 5,
    grid: int = GRID,
    id_cols: tuple[str, str] = ("id_a", "id_b"),
    limit: int = 20,
) -> str:
    """DuckDB twin of scoring through the fitted ensemble: the same
    unrolled fit CTEs, then margin = Σ_t ±alpha_t per pair (the 1-row
    best CTEs cross-joined in), ranked by (margin DESC, id ASC).
    ``pairs_sql`` must also expose ``id_cols``."""
    ctes, _ = adaboost_ctes(pairs_sql, features, rounds, grid)
    ida, idb = id_cols
    terms = []
    froms = ["pairs"]
    for t in range(1, rounds + 1):
        b = f"b{t}"
        froms.append(f"best{t} {b}")
        feat_case = "CASE " + " ".join(
            f"WHEN {b}.feature = '{f_}' THEN {f_}" for f_ in features
        ) + " END"
        terms.append(
            f"(CASE WHEN ({b}.pol = 1 AND {feat_case} <= {b}.thr)"
            f" OR ({b}.pol = -1 AND {feat_case} > {b}.thr)"
            f" THEN {b}.alpha ELSE -{b}.alpha END)"
        )
    margin = " + ".join(terms)
    return (
        ctes
        + f"""
    SELECT {ida}, {idb}, margin,
           CASE WHEN margin > 0 THEN 1 ELSE 0 END AS pred
    FROM (
      SELECT {ida}, {idb}, {margin} AS margin
      FROM {", ".join(froms)}
    ) ORDER BY margin DESC, {ida} ASC LIMIT {limit}"""
    )
