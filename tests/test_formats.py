"""Round-trip tests for the non-parquet format adapters: a fixture table
written to CSV / JSON-lines / partitioned parquet must read back identical
(same rows, same types) under an explicit schema."""

from __future__ import annotations

from pyspark.sql import functions as F

from join_example_spark.sources.formats import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
    write_parquet,
)
from join_example_spark.sources.readers import read_table
from tests.conftest import SF_SMOKE


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_round_trip(spark, tmp_path):
    src = read_table(spark, SF_SMOKE, "nation")
    p = str(tmp_path / "nation_csv")
    write_csv(src, p)
    back = read_csv(spark, p, src.schema)
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)


def test_jsonl_round_trip(spark, tmp_path):
    src = read_table(spark, SF_SMOKE, "supplier")
    p = str(tmp_path / "supplier_jsonl")
    write_jsonl(src, p)
    back = read_jsonl(spark, p, src.schema)
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)


def test_partitioned_parquet_prunes(spark, tmp_path):
    src = read_table(spark, SF_SMOKE, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    p = str(tmp_path / "orders_by_year")
    write_parquet(src, p, partition_by=("o_year",))

    back = spark.read.parquet(p)
    assert back.count() == src.count()

    # Partition pruning: a filter on the partition column must prune the
    # listing to that directory — visible as PartitionFilters in the scan.
    pruned = back.where(F.col("o_year") == 1997)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_year" in plan.split("PartitionFilters")[1][:200]
    expected = src.where(F.col("o_year") == 1997).count()
    assert pruned.count() == expected


def test_csv_explicit_schema_no_inference(spark, tmp_path):
    # The adapter must not silently infer: reading with the explicit schema
    # yields typed columns even though CSV itself is untyped text.
    src = read_table(spark, SF_SMOKE, "region")
    p = str(tmp_path / "region_csv")
    write_csv(src, p)
    back = read_csv(spark, p, src.schema)
    assert [f.dataType for f in back.schema.fields] == [
        f.dataType for f in src.schema.fields
    ]


def test_orc_round_trip_and_pushdown(spark, tmp_path):
    from join_example_spark.plans.audit import executed_plan
    from join_example_spark.sources.formats import read_orc, write_orc

    src = read_table(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(src, path)
    back = read_orc(spark, path, src.schema)
    assert _sorted_rows(back) == _sorted_rows(src)
    # predicate pushdown reaches the ORC scan like it does for parquet
    plan = executed_plan(back.where(F.col("o_orderkey") < 100).select("o_orderkey"))
    assert "PushedFilters: [" in plan and "o_orderkey" in plan, plan
