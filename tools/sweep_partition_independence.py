"""Full partition-independence sweep: run EVERY oracle-backed declared
query under deliberately odd parallelism (local[5], 7 shuffle partitions —
co-prime with the fixtures' 32-partition layout) and compare each against
its DuckDB oracle with the driver's normalization.

This is the committed version of the out-of-band sweep quoted in
tests/test_determinism.py (the in-tree test re-checks a fast sensitive
subset per run; this tool re-proves the whole registry). A mismatch here
means some query's result depends on physical parallelism — merge order,
collect_list order, LIMIT ties — which the decimal-bridge / total-order
conventions (SURVEY §5.3) exist to prevent.

Usage:  python tools/sweep_partition_independence.py [sf_dir]
Output: one MISMATCH line per offender, then a summary line; exit 1 on
any mismatch.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession

    from join_example_spark.conf import ensure_session_confs
    from join_example_spark.registry import load_all
    from tests.oracle_utils import run_compare

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[5]")
        .config("spark.sql.shuffle.partitions", "7")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    ensure_session_confs(spark)
    reg = load_all()
    names = [n for n, s in reg.items() if s.oracle]
    bad = []
    t0 = time.time()
    for i, n in enumerate(names):
        try:
            errs = run_compare(spark, n, sf_dir)
        except Exception as ex:  # noqa: BLE001 — a crash is a finding, not an abort
            errs = [f"EXC {type(ex).__name__}: {ex}"]
        if errs:
            bad.append(n)
            print(f"MISMATCH {n}: {errs[:2]}", flush=True)
        if (i + 1) % 40 == 0:
            print(f"...{i + 1}/{len(names)} ({time.time() - t0:.0f}s)", flush=True)
    print(
        f"SWEEP DONE: {len(names)} oracle queries under local[5]/7-shuffle,"
        f" {len(bad)} mismatches, {time.time() - t0:.0f}s"
    )
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
