"""Scale-technique checks: salted joins preserve semantics; bucketed
joins eliminate the exchange (asserted on the physical plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fuzzy_item_matching_spark.operators.skew import salted_join, write_bucketed
from fuzzy_item_matching_spark.tables import load_table

from .conftest import SF_CHECK


def test_salted_join_matches_plain_join(spark):
    o = load_table(spark, SF_CHECK, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, SF_CHECK, "customer").select("c_custkey", "c_mktsegment")
    small = c.withColumnRenamed("c_custkey", "o_custkey")
    plain = big_rows = (
        o.join(small, "o_custkey").groupBy("c_mktsegment").count().collect()
    )
    salted = (
        salted_join(o, small, "o_custkey", salt=4)
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    assert {(r.c_mktsegment, r["count"]) for r in salted} == {
        (r.c_mktsegment, r["count"]) for r in big_rows
    }


def test_salted_join_spreads_shuffle_key(spark):
    o = load_table(spark, SF_CHECK, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, SF_CHECK, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plan = salted_join(o, c, "o_custkey", salt=4)._jdf.queryExecution().toString()
    assert "__salt" in plan, "salt column must participate in the join key"


def test_bucketed_join_has_no_shuffle_exchange(spark):
    o = load_table(spark, SF_CHECK, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, SF_CHECK, "customer").select("c_custkey", "c_name")
    write_bucketed(o, "orders_b", "o_custkey", 8)
    write_bucketed(
        c.withColumnRenamed("c_custkey", "o_custkey"), "customer_b", "o_custkey", 8
    )
    # At sf0.01 the planner prefers a broadcast join (which ignores
    # bucketing entirely); disable it to exercise the big-big case
    # bucketing exists for.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed-bucketed equi-join must not shuffle:\n" + plan
        )
        assert "Bucketed: true" in plan
        assert joined.count() == o.join(c, o.o_custkey == c.c_custkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
