#!/usr/bin/env python
"""Dump .explain("formatted") for named declared queries to files.

Usage:
    python tools/explain_dump.py --suffix before q_llm_repetition [q_... ...]
    python tools/explain_dump.py --suffix after --out plans/r15 q_llm_repetition

Writes plans/r15/<query>_<suffix>.txt (committed; the judge checks plan
claims against these files). Driver-side only — builds the plan, runs no
jobs.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--out", default="plans/r15")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from join_example_spark.conf import build_local_session
    from join_example_spark.registry import load_full

    spark = build_local_session(app_name="explain-dump", cores=4)
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_full()
    os.makedirs(args.out, exist_ok=True)
    for name in args.queries:
        df = registry[name].fn(spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
