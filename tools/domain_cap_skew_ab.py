"""A/B the two q_llm_domain_cap plans on a PLANTED pathological host
(round 13, VERDICT r12 task 5 evidence): naive single-window top-K vs the
shipped two-pass salted plan, on a synthetic corpus where one host holds
90% of all rows — the exact skew the cap exists to bound, far beyond what
the fixtures exercise.

The fixtures' host groups are tiny (~240 canonical keys x ~25 rows at
sf0.1), so the shipped plan's skew-safety is invisible in bench numbers;
this experiment measures it at the tier where it matters. Equality of the
two plans' outputs is asserted distributed (exceptAll both ways == 0) at
every tier before timing is trusted.

Usage:  python tools/domain_cap_skew_ab.py [--rows 2000000] [--reps 3]
Output: one JSON line per (plan, rep) + a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def skewed_hosts(spark, n_rows: int):
    """90% of rows on one mega-host; the remaining 10% spread over 1000
    distinct cold hosts (ids ending in 9 -> id % 10000 takes the 1000
    values ending in 9, ~n/10000 rows each). n_chars = doc_id % 9973
    plants heavy ties so the doc_id tiebreak (and therefore the full
    sort, not a cheap top-k shortcut) is exercised."""
    from pyspark.sql import functions as F

    return spark.range(n_rows).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 9973).cast("int").alias("n_chars"),
        F.when(F.col("id") % 10 < 9, F.lit("megahost.example"))
        .otherwise(F.concat(F.lit("h"), (F.col("id") % 10000).cast("string")))
        .alias("host"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from join_example_spark.conf import build_local_session
    from join_example_spark.queries.llm_dedup import (
        domain_cap_naive_plan,
        domain_cap_plan,
    )

    spark = build_local_session(
        app_name="domain-cap-skew-ab", cores="32", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    hosts = skewed_hosts(spark, args.rows)
    a = domain_cap_naive_plan(hosts, cap=12)
    b = domain_cap_plan(hosts, cap=12, salts=32)

    # correctness first: the plans must be row-identical on this geometry
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert diff == 0, f"plans diverged on planted skew: {diff} rows"
    print(json.dumps({"rows": args.rows, "plans_identical": True}), flush=True)

    timings: dict[str, list[float]] = {"naive_window": [], "two_pass_salted": []}
    for rep in range(args.reps):
        # alternate order so session warm-up doesn't bias one arm
        order = (
            [("naive_window", a), ("two_pass_salted", b)]
            if rep % 2 == 0
            else [("two_pass_salted", b), ("naive_window", a)]
        )
        for name, df in order:
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            sec = round(time.perf_counter() - t0, 2)
            timings[name].append(sec)
            print(json.dumps({"plan": name, "rep": rep, "sec": sec}), flush=True)

    summary = {
        name: {"min": min(v), "median": sorted(v)[len(v) // 2], "max": max(v)}
        for name, v in timings.items()
    }
    print(json.dumps({"rows": args.rows, "summary": summary}), flush=True)


if __name__ == "__main__":
    main()
