"""Parquet sources with explicit, deterministic normalization.

Design notes (100 TB posture):

- All reads are plain ``spark.read.parquet`` — the vectorized parquet
  reader, predicate pushdown, and column pruning apply untouched because
  normalization below is expressed as Catalyst column expressions, never
  Python UDFs.
- No schema inference beyond the parquet footer (deterministic).
- ``events.ts`` is parquet ``TIMESTAMP(NANOS)`` which Spark 4.x cannot read
  natively; with ``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as
  int64 nanoseconds. We convert with *integer* division (``ts div 1000``)
  so the µs value is exact (a float division would round through a 53-bit
  mantissa and can be off by 1 µs at 2024-era epochs). The result is
  bit-identical to DuckDB's ns→µs truncating read — verified empirically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from join_example_spark.conf import ensure_session_confs

#: Every table the driver pre-registers as a DuckDB view, in a stable order.
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Convert the nanosAsLong int64 ``ts`` to TimestampType (exact ns→µs
    truncation via integer division). The single home of this recipe —
    batch and streaming readers must both go through it."""
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the ``events`` stream table with the ns-timestamp recipe.

    Returns ``ts`` as a proper ``TimestampType`` (µs precision, truncated
    from ns exactly like DuckDB does), all other columns untouched.
    """
    ensure_session_confs(spark)
    raw = spark.read.parquet(_path(sf_dir, "events"))
    return normalize_event_ts(raw)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read any fixture table by name, applying per-table normalization."""
    if name == "events":
        return read_events(spark, sf_dir)
    ensure_session_confs(spark)
    return spark.read.parquet(_path(sf_dir, name))


def register_temp_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register fixture tables as temp views (for ``spark.sql`` paths)."""
    for name in names:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
