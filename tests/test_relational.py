"""Relational-core queries vs DuckDB oracle at sf0.01 (driver's t2 gate)."""

from __future__ import annotations

import pytest

from fuzzy_item_matching_spark.queries import load_all
from tests.conftest import SF_CHECK, assert_matches_oracle

REGISTRY = load_all()
REL_NAMES = sorted(n for n in REGISTRY if n.startswith("rel_"))


@pytest.mark.parametrize("name", REL_NAMES)
def test_relational_oracle(spark, duck, name):
    q = REGISTRY[name]
    assert q.oracle is not None, f"{name} must carry an exact oracle"
    df = q.fn(spark, SF_CHECK)
    assert_matches_oracle(df, duck, q.oracle)


def test_histo_quantile_within_one_bin_of_exact(spark):
    """The histogram estimate must sit within one bin width of the
    exact interpolated quantile (the sketch's documented error
    bound)."""
    from pyspark.sql import functions as F

    from fuzzy_item_matching_spark.queries import load_all
    from fuzzy_item_matching_spark.tables import load_table

    from .conftest import SF_CHECK

    est = load_all()["rel_histo_quantiles"].fn(spark, SF_CHECK).collect()
    li = load_table(spark, SF_CHECK, "lineitem")
    exact = {
        (r["l_returnflag"], q): r[f"p{q}"]
        for q in (0.5, 0.9, 0.99)
        for r in li.groupBy("l_returnflag")
        .agg(F.expr(f"percentile(cast(l_extendedprice as double), {q})").alias(f"p{q}"))
        .collect()
    }
    widths = {
        r["l_returnflag"]: (r["mx"] - r["mn"]) / 64
        for r in li.groupBy("l_returnflag")
        .agg(
            F.min(F.col("l_extendedprice").cast("double")).alias("mn"),
            F.max(F.col("l_extendedprice").cast("double")).alias("mx"),
        )
        .collect()
    }
    assert len(est) == 9
    for r in est:
        w = widths[r["l_returnflag"]]
        assert abs(r["est"] - exact[(r["l_returnflag"], r["q"])]) <= w + 1e-9
