"""Physical-plan audit helpers — the 100 TB design-rule enforcement.

These inspect the executed (post-AQE-planning) SparkPlan string so tests
can assert structural properties the scale posture depends on:

- small dims join via BroadcastHashJoin (no shuffle of the fact side);
- predicates reach the parquet scan (PushedFilters);
- column pruning reaches the scan (ReadSchema carries only needed columns);
- no row-at-a-time Python UDFs (BatchEvalPython) anywhere in the engine.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    # Scan metadata (PushedFilters/ReadSchema) is truncated to
    # spark.sql.maxMetadataStringLength chars by default; widen while
    # rendering so audits see the full filter/schema lists.
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "10000")
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(key, old)


def formatted_explain(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def has_python_udf(df: DataFrame) -> bool:
    plan = executed_plan(df)
    return "BatchEvalPython" in plan or "PythonUDF" in plan


def pushed_filters(df: DataFrame) -> list[str]:
    """All non-empty PushedFilters lists appearing in the plan."""
    plan = executed_plan(df)
    return [m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if m.strip()]


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column name lists of each parquet ReadSchema in the plan."""
    plan = executed_plan(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return [
        [c.split(":")[0].strip() for c in s.split(",") if c.strip()] for s in schemas
    ]
