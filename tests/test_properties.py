"""Algebraic identity checks (SURVEY.md §5.2.4) on the sf0.001 corpus.

Cheap global invariants that catch whole families of operator bugs:
partition laws (semi ∪ anti = input), containment (rollup ⊇ groupBy),
frame laws (unbounded window sum = group sum), idempotence (dedup).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from join_example_spark.operators.dedup import exact_dedup
from join_example_spark.sources.readers import read_table
from tests.conftest import SF_SMOKE


def test_semi_union_anti_partitions_left(spark):
    orders = read_table(spark, SF_SMOKE, "orders")
    li = read_table(spark, SF_SMOKE, "lineitem").where(F.col("l_returnflag") == "R")
    semi = orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
    anti = orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
    assert semi.count() + anti.count() == orders.count()
    assert semi.intersect(anti).count() == 0


def test_rollup_contains_groupby(spark):
    customer = read_table(spark, SF_SMOKE, "customer")
    plain = customer.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
    rolled = (
        customer.rollup("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("c_mktsegment").isNotNull())
    )
    assert plain.subtract(rolled).count() == 0
    assert rolled.subtract(plain).count() == 0


def test_unbounded_window_sum_equals_group_sum(spark):
    orders = read_table(spark, SF_SMOKE, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    via_window = (
        orders.select(
            "o_custkey",
            F.sum(F.expr("CAST(o_totalprice AS DECIMAL(25,6))")).over(w).alias("s"),
        )
        .groupBy("o_custkey")
        .agg(F.max("s").alias("total"))
    )
    via_group = orders.groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(o_totalprice AS DECIMAL(25,6))")).alias("total")
    )
    assert via_window.subtract(via_group).count() == 0
    assert via_group.subtract(via_window).count() == 0


def test_exact_dedup_idempotent(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    once = exact_dedup(docs).drop("text_hash")
    twice = exact_dedup(once).drop("text_hash")
    assert once.count() == twice.count()
    assert once.subtract(twice).count() == 0


def test_union_all_counts_add(spark):
    events = read_table(spark, SF_SMOKE, "events")
    a = events.where(F.col("value") > 50.0)
    b = events.where(F.col("value") <= 50.0)
    assert a.count() + b.count() == events.count()
    assert a.unionByName(b).count() == events.count()


def test_asof_result_unique_per_left_row(spark):
    from join_example_spark.registry import load_all

    out = load_all()["q_join_asof"].fn(spark, SF_SMOKE)
    total = out.count()
    distinct_lefts = out.select("purchase_id").distinct().count()
    assert total == distinct_lefts  # as-of yields at most one match per left row


def test_topk_is_subset_of_ranked(spark):
    from join_example_spark.registry import load_all

    topk = load_all()["q_win_topk_per_group"].fn(spark, SF_SMOKE)
    per_group_max = topk.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    assert per_group_max.where(F.col("n") > 3).count() == 0
