"""Property tests for the round-10 operators — invariants the exact
oracle equivalence (driver, tests/test_all_oracles.py) can't express:
colsample_bynode's per-node draw being real and respected by the fit,
and the non-convergence guard on the star connected-components loop.
"""

from __future__ import annotations

import pytest

from .conftest import SF_SMOKE

FEATS = ["x1", "x2", "x3"]


def _pairs(spark):
    from fuzzy_item_matching_spark.queries.training import _lr_pairs

    return _lr_pairs(spark, SF_SMOKE)


def test_col_subset_bynode_varies_across_siblings():
    """The node-keyed draw must give SIBLING nodes different feature
    menus somewhere in the tree — otherwise bynode degenerates to
    bylevel and the oracle check is vacuous. Pin the seed-13 draw the
    train_gboost_colsample_node query uses."""
    from fuzzy_item_matching_spark.operators.gboost_deep import col_subset

    subs = {
        (t, level, n): tuple(
            col_subset(FEATS, t, level, 2.0 / 3.0, 13, node=n)
        )
        for t in (1, 2)
        for level in range(3)
        for n in range(2**level, 2 ** (level + 1))
    }
    # every subset keeps exactly 2 of 3 features, in original order
    assert all(len(s) == 2 for s in subs.values())
    # siblings diverge at (t=1, level=1) and (t=2, level=2)
    assert subs[(1, 1, 2)] != subs[(1, 1, 3)]
    assert subs[(2, 2, 5)] != subs[(2, 2, 6)]
    # node-keyed draw is independent of the level-keyed one
    level_draw = tuple(col_subset(FEATS, 1, 1, 2.0 / 3.0, 13))
    assert any(
        subs[(1, 1, n)] != level_draw for n in (2, 3)
    ), "bynode draw degenerated to the bylevel draw"


def test_gboost_bynode_fit_respects_node_menus(spark):
    """Every fitted SPLIT node's feature must come from that node's
    own subset, and the bynode model must differ from the plain
    depth-3 fit (the restriction actually bound somewhere)."""
    from fuzzy_item_matching_spark.operators.gboost_deep import (
        col_subset,
        gboost_deep_fit,
    )

    kw = dict(rounds=2, depth=3, colsample_bynode=2.0 / 3.0, seed=13)
    rows = gboost_deep_fit(_pairs(spark), FEATS, **kw).collect()
    assert [(r.round, r.node) for r in rows] == [
        (t, n) for t in (1, 2) for n in range(1, 8)
    ]
    for r in rows:
        level = r.node.bit_length() - 1
        allowed = col_subset(
            FEATS, r.round, level, 2.0 / 3.0, 13, node=r.node
        )
        if r.gain != 0.0:  # real splits only; fallbacks inherit parent
            assert r.feature in allowed, (r.round, r.node, r.feature)
    plain = gboost_deep_fit(_pairs(spark), FEATS, rounds=2, depth=3).collect()
    assert [(r.feature, r.thr) for r in rows] != [
        (r.feature, r.thr) for r in plain
    ], "bynode restriction never bound — pick a different seed"


def test_star_cc_raises_without_fixpoint(spark):
    """connected_components_star's output contract is component =
    the MINIMUM node id; exhausting max_iter before the star fixpoint
    must raise, never return intermediate labels silently."""
    from fuzzy_item_matching_spark.operators.dedup import (
        connected_components_star,
    )

    # a path graph long enough that 1 round cannot finish
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components_star(edges, max_iter=1)
    # ample budget converges to the true labels
    labels = {
        r.node: r.component
        for r in connected_components_star(edges, max_iter=25).collect()
    }
    assert labels == {i: 0 for i in range(21)}


def test_tpe_lite_gamma_clamp(spark):
    """gamma large enough that ceil(gamma*n) == n must not produce a
    zero-size bad set (NaN/inf acquisition); the draw clamps to
    n_obs - 1 and the search still returns a full trace."""
    from fuzzy_item_matching_spark.operators.tuning import tpe_lite

    scored = spark.createDataFrame(
        [(i % 2, (i % 10) / 10.0) for i in range(200)],
        "label int, score double",
    )
    out = tpe_lite(
        scored, 0.0, 1.0, n_init=4, rounds=1, n_candidates=8,
        k_per_round=2, gamma=0.99,
    ).collect()
    assert len(out) == 6  # 4 init + 2 evaluated proposals
    assert all(r.score is not None for r in out)
