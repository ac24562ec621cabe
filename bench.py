#!/usr/bin/env python
"""Benchmark harness: run every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Results are materialized with the noop datasource (full execution, no
collect-to-driver bottleneck — the honest way to time a distributed plan).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from join_example_spark.conf import build_local_session
    from join_example_spark.registry import load_all

    spark = build_local_session(
        app_name="join_example_spark-bench", cores=cpus, shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    registry = load_all()

    # Warm the JVM/codegen paths once on the smallest SF so per-query times
    # measure the plan, not first-call JIT/classloading.
    warm = registry["q_flagship_daily_enrich"].fn(spark, "/root/testdata/sf0.001")
    warm.write.format("noop").mode("overwrite").save()
    # Warm the file-listing/footer metadata for the bench SF so the first
    # registry query isn't charged the one-time listing cost.
    from pyspark.sql import functions as F

    from join_example_spark.sources.readers import TABLES, read_table

    for t in TABLES:
        read_table(spark, sf_dir, t).select(F.lit(1)).limit(1).collect()

    timings: dict[str, float] = {}
    for name, spec in registry.items():
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "declared_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "n_queries": len(timings),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
