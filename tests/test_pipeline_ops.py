"""Last-mile pipeline ops: sequence packing, PII redaction, ANN recall.

Oracle parity at sf0.01 (the driver's t2 contract) plus the semantic
invariants the oracles can't express: packing conserves tokens and
fills shards front-to-back, redaction leaves no digit behind, recall
is a valid ratio with the LSH index beating a random-candidate floor.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fuzzy_item_matching_spark.queries import load_all
from tests.conftest import SF_CHECK, SF_SMOKE, assert_matches_oracle

REGISTRY = load_all()


@pytest.mark.parametrize(
    "name", ["ts_seq_packing", "ts_redact_pii", "sim_ann_recall"]
)
def test_pipeline_op_oracle(spark, duck, name):
    q = REGISTRY[name]
    assert q.oracle is not None, f"{name} must carry an exact oracle"
    assert_matches_oracle(q.fn(spark, SF_CHECK), duck, q.oracle)


def test_seq_packing_conserves_tokens(spark):
    from fuzzy_item_matching_spark.functions.text import regex_tokenize
    from fuzzy_item_matching_spark.tables import load_table

    manifest = REGISTRY["ts_seq_packing"].fn(spark, SF_SMOKE)
    packed_total = manifest.agg(F.sum("seq_tokens")).collect()[0][0]
    docs = load_table(spark, SF_SMOKE, "documents")
    raw_total = docs.select(
        F.sum(F.size(regex_tokenize("text"))).alias("t")
    ).collect()[0][0]
    assert packed_total == raw_total

    # every shard's packing starts at sequence 0 and doc-id spans of
    # consecutive sequences never interleave (contiguous fill)
    rows = sorted(
        manifest.collect(), key=lambda r: (r["shard"], r["seq_id"])
    )
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        assert shard_rows[0]["seq_id"] == 0
        for prev, cur in zip(shard_rows, shard_rows[1:]):
            assert prev["last_doc"] < cur["first_doc"]


def test_redact_pii_leaves_no_digits(spark):
    out = REGISTRY["ts_redact_pii"].fn(spark, SF_SMOKE)
    bad = out.filter(F.col("clean_note").rlike("[0-9]")).count()
    assert bad == 0
    # c_phone guarantees at least one structured phone per row
    assert out.filter(F.col("n_phones") < 1).count() == 0


def test_ann_recall_is_valid_ratio(spark):
    row = REGISTRY["sim_ann_recall"].fn(spark, SF_SMOKE).collect()[0]
    assert row["n_exact"] > 0
    assert 0 <= row["n_hits"] <= row["n_exact"]
    assert row["recall"] == pytest.approx(row["n_hits"] / row["n_exact"])
    # 16 tables x 5 bits on 64-dim unit-ish vectors should comfortably
    # beat a random-candidate baseline
    assert row["recall"] >= 0.3
