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


def test_salted_join_equals_plain_join(spark):
    from join_example_spark.operators.skew import salted_join

    li = read_table(spark, SF_SMOKE, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"), "l_quantity", "l_orderkey"
    )
    s = read_table(spark, SF_SMOKE, "supplier").select("s_suppkey", "s_nationkey")
    salted = salted_join(li, s, on="s_suppkey", salt_src="l_orderkey", n_salt=5)
    plain = li.join(s, "s_suppkey")
    assert salted.count() == plain.count()
    cols = sorted(set(salted.columns) & set(plain.columns))
    assert salted.select(cols).subtract(plain.select(cols)).count() == 0
    assert plain.select(cols).subtract(salted.select(cols)).count() == 0


def test_bucketed_range_join_equals_plain_range_join(spark):
    from join_example_spark.operators.temporal import range_join, range_join_bucketed

    ev = read_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "ts")
    plain = range_join(
        ev, ev, on=["user_id"], left_ts="ts", right_ts="ts",
        lower="INTERVAL 0 SECOND", upper="INTERVAL 3600 SECOND",
    )
    bucketed = range_join_bucketed(ev, ev, "ts", "ts", window_seconds=3600, on=["user_id"])
    pc, bc = plain.count(), bucketed.count()
    assert pc == bc, (pc, bc)
    key_cols = ["l_event_id", "r_event_id"]
    assert plain.select(key_cols).subtract(bucketed.select(key_cols)).count() == 0
    assert bucketed.select(key_cols).subtract(plain.select(key_cols)).count() == 0


def test_ivf_recall_vs_exact_topk(spark):
    # IVF with nprobe=1 is approximate; its results must still be a
    # plausible ANN: every returned neighbor's similarity is <= the exact
    # top-1 for that probe, and recall@3 vs exact top-3 is substantial.
    from join_example_spark.operators.similarity import cosine_topk, ivf_topk

    emb = read_table(spark, SF_SMOKE, "embeddings").withColumn("one", F.lit(1))
    exact = cosine_topk(emb, k=3, block_col="one", probe_pred="vec_id % 100 = 0")
    approx = ivf_topk(emb, n_centroids=8, k=3, probe_pred="vec_id % 100 = 0")
    e = {(r.probe_id, r.cand_id) for r in exact.collect()}
    a = {(r.probe_id, r.cand_id) for r in approx.collect()}
    assert a, "IVF returned nothing"
    recall = len(e & a) / max(len(e), 1)
    assert recall >= 0.3, f"IVF recall collapsed: {recall}"
