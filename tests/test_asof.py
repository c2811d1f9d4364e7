"""asof_join semantics under NULL right payloads, vs DuckDB ASOF JOIN.

The carry must take the WHOLE payload from the single latest preceding
right row: a legitimately NULL payload value in that row shadows older
non-null values (a per-column ignore-nulls carry would resurrect
them), and how='inner' keys off row presence, not payload nullness.
"""

from __future__ import annotations

import duckdb
import pytest

from fuzzy_item_matching_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (2, 10), (3, 10)],
        "k int, lts int",
    )
    # k=1: latest row at ts 15 has v=NULL, w=7 — v must come out NULL
    # at lts 20/30 (not the older 100); k=2: no preceding row; k=3: the
    # only preceding row is all-NULL payload — still a match for inner.
    right = spark.createDataFrame(
        [
            (1, 5, 100, 1),
            (1, 15, None, 7),
            (2, 99, 5, 5),
            (3, 10, None, None),
        ],
        "k int, rts int, v int, w int",
    )
    return left, right


def _duck_asof(left_rows, right_rows, how):
    con = duckdb.connect()
    con.execute("CREATE TABLE l(k INT, lts INT)")
    con.executemany("INSERT INTO l VALUES (?, ?)", left_rows)
    con.execute("CREATE TABLE r(k INT, rts INT, v INT, w INT)")
    con.executemany("INSERT INTO r VALUES (?, ?, ?, ?)", right_rows)
    join = "ASOF LEFT JOIN" if how == "left" else "ASOF JOIN"
    return set(
        con.execute(
            f"SELECT l.k, l.lts, r.v, r.w FROM l {join} r"
            " ON l.k = r.k AND l.lts >= r.rts"
        ).fetchall()
    )


@pytest.mark.parametrize("how", ["left", "inner"])
def test_asof_join_null_payload_matches_duckdb(spark, frames, how):
    left, right = frames
    got = {
        (r["k"], r["lts"], r["asof_v"], r["asof_w"])
        for r in asof_join(
            left, right, "k", "lts", "rts", ["v", "w"], how=how
        ).collect()
    }
    want = _duck_asof(
        [tuple(r) for r in left.collect()],
        [tuple(r) for r in right.collect()],
        how,
    )
    assert got == want


def test_asof_payload_not_mixed_across_rows(spark, frames):
    left, right = frames
    rows = {
        (r["k"], r["lts"]): (r["asof_v"], r["asof_w"])
        for r in asof_join(
            left, right, "k", "lts", "rts", ["v", "w"], how="left"
        ).collect()
    }
    # at lts=20/30 the latest right row (ts 15) is (v=NULL, w=7): v NULL
    # must NOT be backfilled from the ts-5 row's v=100
    assert rows[(1, 20)] == (None, 7)
    assert rows[(1, 30)] == (None, 7)
    assert rows[(1, 10)] == (100, 1)
