"""§2.7 — set operations.

KStreams analog: ``merge(stream1, stream2)`` is UNION ALL; the distinct
variants have no DSL analog (they need a state store) and are native here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from join_example_spark.registry import register
from join_example_spark.sources.readers import read_table


def _slice_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "events")
        .where(F.col("value") > 50.0)
        .select("user_id", "event_type")
    )


def _slice_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "view"))
        .select("user_id", "event_type")
    )


_A = "SELECT user_id, event_type FROM events WHERE value > 50.0"
_B = "SELECT user_id, event_type FROM events WHERE event_type IN ('click', 'view')"


@register("q_set_union_all", oracle=f"{_A}\nUNION ALL\n{_B}", tags=("setop",))
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — KStreams merge()."""
    return _slice_a(spark, sf_dir).unionByName(_slice_b(spark, sf_dir))


@register("q_set_union_distinct", oracle=f"{_A}\nUNION\n{_B}", tags=("setop",))
def q_set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _slice_a(spark, sf_dir).unionByName(_slice_b(spark, sf_dir)).distinct()


@register("q_set_intersect", oracle=f"{_A}\nINTERSECT\n{_B}", tags=("setop",))
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _slice_a(spark, sf_dir).intersect(_slice_b(spark, sf_dir))


@register("q_set_except", oracle=f"{_A}\nEXCEPT\n{_B}", tags=("setop",))
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DataFrame.subtract == SQL EXCEPT (distinct) semantics.
    return _slice_a(spark, sf_dir).subtract(_slice_b(spark, sf_dir))


@register(
    "q_set_except_all",
    oracle=f"{_A}\nEXCEPT ALL\n{_B}",
    note="bag difference (multiplicity-aware, unlike EXCEPT's set semantics)",
    tags=("setop",),
)
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _slice_a(spark, sf_dir).exceptAll(_slice_b(spark, sf_dir))


@register(
    "q_set_intersect_all",
    oracle=f"{_A}\nINTERSECT ALL\n{_B}",
    note="bag intersection: min(multiplicity) per row both sides",
    tags=("setop",),
)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _slice_a(spark, sf_dir).intersectAll(_slice_b(spark, sf_dir))
