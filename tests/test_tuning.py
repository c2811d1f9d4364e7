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
