"""§2.1 — scans, sources, JSON-at-the-edge.

KStreams analog: ``builder.stream(topic, Consumed.with(serde))`` — a scan is
the Spark-side equivalent of consuming a topic with a serde applied at the
edge (here: parquet footer schema + `from_json` for the JSON payload column).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from join_example_spark.registry import register
from join_example_spark.sources.readers import TABLES, read_table


@register(
    "q_scan_parquet",
    oracle="SELECT * FROM lineitem",
    tags=("scan",),
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan of the widest table, all columns projected."""
    return read_table(spark, sf_dir, "lineitem")


_COUNT_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{t}' AS table_name, COUNT(*) AS n_rows FROM {t}" for t in TABLES
)


@register("q_scan_count", oracle=_COUNT_ORACLE, tags=("scan",))
def q_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(*) per table — exercises metadata/scan pushdown on every source."""
    parts = [
        read_table(spark, sf_dir, t).agg(
            F.lit(t).alias("table_name"), F.count(F.lit(1)).alias("n_rows")
        )
        for t in TABLES
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


@register(
    "q_scan_json_props",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
""",
    tags=("scan", "json"),
)
def q_scan_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serde-at-the-edge: parse the JSON payload column, extract a typed field."""
    events = read_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
