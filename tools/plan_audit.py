#!/usr/bin/env python
"""Audit every declared query's physical plan for optimization smells.

Usage:
    python tools/plan_audit.py [--out /tmp/plans_all] [--sf-dir D]

Driver-side only (no jobs). For each declared query, writes the formatted
plan to <out>/<name>.txt and prints a TSV summary line:

    name  n_exchange  n_scan  n_pyeval  n_sort  dup_expensive  notes

- dup_expensive: count of operators whose detail text contains >= 2
  occurrences of an expensive call (split(/aggregate(/transform(/
  levenshtein(/regexp_/sha2(/md5(/xxhash64() — the in-operator recompute
  smell (round-15 lesson: lambda bodies re-evaluate inlined aliases
  per element; pushed-down join-key null filters re-evaluate derived
  join keys below the projection that computes them).
- n_scan counts parquet scans; > number of distinct tables touched
  usually means a referenced subplan executes more than once (round-5
  lesson) — sometimes deliberate (cheaper than a checkpoint barrier).
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPENSIVE = re.compile(
    r"split\(|aggregate\(|transform\(|levenshtein\(|regexp_|sha2\(|md5\(|"
    r"xxhash64\(|array_sort\(|sort_array\("
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/plans_all")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", nargs="*", default=None)
    args = ap.parse_args()

    from join_example_spark.conf import build_local_session
    from join_example_spark.registry import load_all

    spark = build_local_session(app_name="plan-audit", cores=4)
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    os.makedirs(args.out, exist_ok=True)
    names = args.queries or list(registry)
    print("name\tn_exchange\tn_scan\tn_pyeval\tn_sort\tdup_expensive\tnotes")
    for name in names:
        try:
            df = registry[name].fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{name}\tERROR\t{type(exc).__name__}: {exc}"[:200])
            continue
        with open(os.path.join(args.out, f"{name}.txt"), "w") as f:
            f.write(plan)
        n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
        n_scan = len(re.findall(r"\(\d+\) Scan parquet", plan))
        n_pyeval = len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow", plan)
        )
        n_sort = len(re.findall(r"\(\d+\) Sort\b", plan))
        # split into per-operator detail blocks: "(N) OpName ..." sections
        blocks = re.split(r"\n\((\d+)\) ", plan)
        dup = 0
        notes = []
        for i in range(1, len(blocks), 2):
            body = blocks[i + 1]
            op = body.split("\n", 1)[0]
            hits = EXPENSIVE.findall(body)
            if len(hits) >= 2:
                dup += 1
                notes.append(f"op{blocks[i]}:{op.strip()[:24]}x{len(hits)}")
        print(
            f"{name}\t{n_exchange}\t{n_scan}\t{n_pyeval}\t{n_sort}\t{dup}\t"
            + ";".join(notes[:6])
        )
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
