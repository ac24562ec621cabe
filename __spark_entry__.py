"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``join_example_spark`` package; this module is
a thin adapter over its declared-query registry (SURVEY.md §2 inventory).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from join_example_spark.registry import load_all  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Stream-enrichment join (events ⋈ customer) + event-time daily window —
    the reference's Kafka Streams join essence, idiomatic Spark.
    """
    registry = load_all()
    return registry["q_flagship_daily_enrich"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query.

    Complete since round 8 — every declared query ships an oracle (the
    driver has no rows-only mode; ``tests/test_round8_ops.py`` pins the
    100%-oracle-able invariant). The ``is not None`` guard is kept as a
    safety net for future declarations, not an expected path.
    """
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
