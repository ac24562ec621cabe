"""§2.2 — projection, predicates, stream branching.

KStreams analogs: ``mapValues`` (projection), ``filter``/``filterNot``
(predicates), ``split()/branch()`` (tagged disjoint subsets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from join_example_spark.registry import register
from join_example_spark.sources.readers import read_table


@register(
    "q_project_rename",
    oracle="""
SELECT l_orderkey,
       l_linenumber,
       l_quantity AS qty,
       l_extendedprice * (1.0 - l_discount) AS net_price
FROM lineitem
""",
    tags=("project",),
)
def q_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + computed column + rename (KStreams mapValues)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("qty"),
        # Same IEEE expression shape as the oracle: one sub, one mul.
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("net_price"),
    )


@register(
    "q_filter_pred",
    oracle="""
SELECT *
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_returnflag IN ('A', 'R')
  AND (l_discount BETWEEN 0.02 AND 0.08 OR l_quantity < 10.0)
  AND l_linestatus LIKE 'F%'
""",
    note="conjunctive+disjunctive predicates, BETWEEN/IN/LIKE; pushdown-eligible",
    tags=("filter",),
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_returnflag").isin("A", "R")
        & (F.col("l_discount").between(0.02, 0.08) | (F.col("l_quantity") < 10.0))
        & F.col("l_linestatus").like("F%")
    )


@register(
    "q_filter_branch",
    oracle="""
SELECT o_orderkey, o_totalprice, 'high' AS branch
FROM orders WHERE o_totalprice >= 200000.0
UNION ALL
SELECT o_orderkey, o_totalprice, 'low' AS branch
FROM orders WHERE o_totalprice < 200000.0
""",
    note="KStreams split()/branch(): disjoint predicate split, tagged, re-merged",
    tags=("filter",),
)
def q_filter_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    high = orders.where(F.col("o_totalprice") >= 200000.0).select(
        "o_orderkey", "o_totalprice", F.lit("high").alias("branch")
    )
    low = orders.where(F.col("o_totalprice") < 200000.0).select(
        "o_orderkey", "o_totalprice", F.lit("low").alias("branch")
    )
    return high.unionByName(low)
