"""Bucketed co-located join: the 100 TB fact-fact strategy.

Writing both join sides bucketed (and sorted) on the join key means the
shuffle that a sort-merge join would otherwise need simply disappears —
each bucket pair joins locally. This is the storage-layout decision SCALE.md
§2.2 defers to, proven here end-to-end: same results as the shuffled join,
and zero Exchange nodes in the physical plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from join_example_spark.sources.readers import read_table
from tests.conftest import SF_SMOKE

N_BUCKETS = 4


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = read_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = read_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    (
        li.write.mode("overwrite")
        .bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
    )
    (
        o.write.mode("overwrite")
        .bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("o_bucketed")
    )
    yield spark.table("li_bucketed"), spark.table("o_bucketed")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_b, o_b = bucketed_tables
    # At sf0.001 the orders side would auto-broadcast, which makes the
    # planner bypass bucketing entirely; disable broadcast to exercise the
    # fact-fact path that bucketing exists for.
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"


def test_bucketed_join_matches_shuffled_join(spark, bucketed_tables):
    li_b, o_b = bucketed_tables
    bucketed = (
        li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)").alias("q"),
        )
        .collect()[0]
    )
    li = read_table(spark, SF_SMOKE, "lineitem")
    o = read_table(spark, SF_SMOKE, "orders")
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)").alias("q"),
        )
        .collect()[0]
    )
    assert tuple(bucketed) == tuple(plain)


def test_bucketed_agg_has_no_shuffle(spark, bucketed_tables):
    # Bucketing serves aggregation too: groupBy on the bucket key reuses the
    # existing distribution instead of re-shuffling.
    li_b, _ = bucketed_tables
    agg = li_b.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed agg still shuffles:\n{plan}"


def test_bucketed_cell_store_pair_join_zero_shuffle(spark):
    """The ANN-family version of the bucketed-layout claim (SCALE.md §3.5):
    a vector store persisted BUCKETED BY the coarse-quantizer cell key
    turns the candidate pair-generation self-join — the one shuffle the
    IVF/IMI dedup path pays per run — into a zero-Exchange local join,
    with the identical candidate-pair set as the in-memory shuffled path.
    At 100 TB this is the difference between re-shuffling the corpus per
    dedup run and reading pre-bucketed cell files."""
    from join_example_spark.operators.similarity import (
        ivf_candidate_pairs,
        ivf_cells,
    )

    emb = read_table(spark, SF_SMOKE, "embeddings")
    cells = ivf_cells(emb, n_centroids=16, nprobe=2)
    spark.sql("DROP TABLE IF EXISTS cells_bucketed")
    try:
        (
            cells.write.mode("overwrite")
            .bucketBy(N_BUCKETS, "cell")
            .sortBy("cell")
            .saveAsTable("cells_bucketed")
        )
        cb = spark.table("cells_bucketed")
        a = cb.select(F.col("vec_id").alias("id_a"), "cell")
        b = cb.select(F.col("vec_id").alias("id_b"), "cell")
        thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, "cell").where(F.col("id_a") < F.col("id_b"))
            plan = joined._jdf.queryExecution().executedPlan().toString()
            got = {(r.id_a, r.id_b) for r in joined.select("id_a", "id_b").collect()}
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Exchange" not in plan, f"bucketed cell join still shuffles:\n{plan}"
        want = {
            (r.id_a, r.id_b)
            for r in ivf_candidate_pairs(emb, n_centroids=16, nprobe=2)
            .select("id_a", "id_b")
            .collect()
        }
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS cells_bucketed")
