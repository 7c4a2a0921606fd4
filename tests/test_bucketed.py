"""Bucketed co-located joins: the write-once-shuffle-never pattern.
The join of two tables bucketed on the same key with the same bucket
count must contain NO shuffle exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_user_session_analysis_spark.sources.bucketed import read_table, write_bucketed
from data_engineering_user_session_analysis_spark.sources.tables import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    lineitem = load_table(spark, sf_small, "lineitem")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8, ["o_orderkey"])
    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], 8, ["l_orderkey"])

    joined = read_table(spark, "lineitem_b").join(
        read_table(spark, "orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    # and it still computes the right thing
    n = joined.count()
    direct = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).count()
    assert n == direct

    # aggregation on the bucket key is also exchange-free
    agg = read_table(spark, "lineitem_b").groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    agg_plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in agg_plan, agg_plan

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
