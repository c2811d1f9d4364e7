"""Search-space sampler properties (M2/M3, operators/tuning.py)."""

from fuzzy_item_matching_spark.operators.tuning import (
    ParamSpec,
    sample_search_space,
)

SPECS = [
    ParamSpec("depth", "quniform", 3.0, 18.0, as_int=True),
    ParamSpec("lr", "loguniform", 0.005, 0.5),
    ParamSpec("sub", "uniform", 0.5, 1.0),
    ParamSpec("booster", "choice", options=("gbtree", "dart")),
]


def test_search_space_bounds_and_types(spark):
    rows = sample_search_space(
        spark, 200, SPECS, seed=7, fixed={"tree_method": "hist"}
    ).collect()
    assert len(rows) == 200
    for r in rows:
        assert isinstance(r["depth"], int) and 3 <= r["depth"] <= 18
        assert 0.005 <= r["lr"] <= 0.5
        assert 0.5 <= r["sub"] < 1.0
        assert r["booster"] in ("gbtree", "dart")
        assert r["tree_method"] == "hist"
    # the draw actually explores the space
    assert len({r["depth"] for r in rows}) > 5
    assert len({r["booster"] for r in rows}) == 2


def test_search_space_deterministic_and_seed_sensitive(spark):
    a = sample_search_space(spark, 50, SPECS, seed=7).collect()
    b = sample_search_space(spark, 50, SPECS, seed=7).collect()
    c = sample_search_space(spark, 50, SPECS, seed=8).collect()
    assert a == b
    assert a != c


def test_successive_halving_schedule_properties(spark):
    """Rung survivors nest: every config in rung r+1 was kept in rung
    r; ranks are a permutation; the winner is rank 1 of the full-data
    rung."""
    from fuzzy_item_matching_spark.queries.training import (
        _SH_RUNGS,
        _SH_TRIALS,
        train_successive_halving,
    )
    from .conftest import SF_SMOKE

    rows = train_successive_halving(spark, SF_SMOKE).collect()
    by_rung = {}
    for r in rows:
        by_rung.setdefault(r.rung, []).append(r)
    assert len(by_rung[0]) == _SH_TRIALS
    for rung, (frac, keep) in enumerate(_SH_RUNGS[:-1]):
        kept_ids = {r.trial_id for r in by_rung[rung] if r.kept}
        next_ids = {r.trial_id for r in by_rung[rung + 1]}
        assert next_ids == kept_ids, f"rung {rung + 1} configs != rung {rung} keeps"
        assert len(kept_ids) == keep
    final = by_rung[len(_SH_RUNGS) - 1]
    assert sorted(r.rnk for r in final) == list(range(1, len(final) + 1))
    winner = [r for r in final if r.kept]
    assert len(winner) == 1 and winner[0].rnk == 1
    best = max(final, key=lambda r: (r.score, -r.trial_id))
    assert winner[0].trial_id == best.trial_id


def test_successive_halving_custom_param_col(spark):
    """The applyInPandas output schema follows param_col (r06 ADVICE:
    it was hardcoded to 'param', so any non-default name failed at
    runtime)."""
    from fuzzy_item_matching_spark.functions.sampling import keyed_uniform
    from fuzzy_item_matching_spark.operators.tuning import successive_halving

    import pyspark.sql.functions as F

    scored = spark.range(200).select(
        (F.col("id") % 2).cast("int").alias("label"),
        (F.col("id") % 100 / 100.0).alias("score"),
        keyed_uniform(F.col("id").cast("string"), seed=3).alias("u"),
    )
    configs = spark.createDataFrame(
        [(0, 0.2), (1, 0.5), (2, 0.8)], "trial_id long, threshold double"
    )
    rows = successive_halving(
        scored,
        configs,
        rungs=[(0.5, 2), (1.0, 1)],
        param_col="threshold",
    ).collect()
    assert {r.rung for r in rows} == {0, 1}
    assert all(hasattr(r, "threshold") for r in rows)
    winners = [r for r in rows if r.rung == 1 and r.kept]
    assert len(winners) == 1
