"""Format adapters beyond parquet: CSV, JSON-lines, and writer/sink helpers.

Rules that hold at 100 TB:

- Every read takes an EXPLICIT StructType — schema inference is banned
  (non-deterministic across file orderings, and it forces a full pre-scan).
- Text formats (csv/json) are row-oriented and unsplittable when gzipped;
  they exist as ingest/egress edges. The engine's internal interchange
  format is parquet: columnar, splittable, predicate-pushdown-capable.
- Writers partition by low-cardinality columns only (partitionBy on a
  high-cardinality key creates a small-files explosion), and coalesce is
  left to the caller — the helpers never force a single-file write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from join_example_spark.conf import ensure_session_confs


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV source with explicit schema; malformed rows fail fast (ANSI spirit)."""
    ensure_session_confs(spark)
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("sep", sep)
        .option("mode", "FAILFAST")
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSON-lines source with explicit schema; no sampling pre-pass."""
    ensure_session_confs(spark)
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Parquet sink, optionally hive-partitioned by low-cardinality keys.

    Partition values become directory names, so downstream scans get
    partition pruning for free on those columns.
    """
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_orc(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """ORC source with explicit schema.

    ORC is the second columnar interchange format Spark ships natively:
    splittable, predicate-pushdown- and column-pruning-capable like parquet
    (pinned by tests/test_formats.py::test_orc_round_trip_and_pushdown), so
    an ORC-resident lake needs no conversion pass to be queried.
    """
    ensure_session_confs(spark)
    return spark.read.schema(schema).orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """ORC sink, optionally hive-partitioned by low-cardinality keys."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    buckets: int,
    bucket_cols: tuple[str, ...],
    sort_cols: tuple[str, ...] = (),
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet table hash-bucketed (and optionally sorted) on the join key.

    THE storage-layout lever for repeated big joins at 100 TB: two tables
    bucketed into the same bucket count on the join key co-locate matching
    keys file-by-file, so a join between them plans with **no Exchange** —
    the shuffle is paid once at write time and amortized over every
    subsequent join/aggregation on that key
    (pinned by tests/test_plans.py::test_bucketed_join_has_no_shuffle).
    Bucketing requires the table catalog (``saveAsTable``); ``path`` makes
    it external so the data lands where the caller wants it.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", header).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
