"""§2.6 — global sort / limit / pagination.

Every LIMIT sits under a total order (unique tiebreak key) so the selected
row *set* is deterministic; the driver's comparison is order-insensitive.
Spark plans `orderBy().limit()` as TakeOrderedAndProject — per-partition
top-k then a k-sized merge on the driver, no global sort at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from join_example_spark.registry import register
from join_example_spark.sources.readers import read_table


@register(
    "q_sort_limit",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
    tags=("sort",),
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "q_limit_offset",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_orderkey
LIMIT 20 OFFSET 10
""",
    tags=("sort",),
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.orderBy("o_orderkey")
        .offset(10)
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )
