#!/usr/bin/env python
"""A/B the fanout_repartition lever per query (round-15 single-split finding).

Usage:
    python tools/fanout_ab.py [--queries q1 q2 ...] [--n 2] [--sf-dir D]

For each declared query, times the noop-sink execution twice: once with the
stock readers.read_table, once with read_table monkeypatched to apply
fanout_repartition to every fixture read. Prints per-query A (stock) and B
(fanned) best-of-n warm seconds and the delta. Measurement tool only — the
monkeypatch never touches production code paths.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from join_example_spark.conf import build_local_session
    from join_example_spark.registry import load_all
    from join_example_spark.sources import readers

    spark = build_local_session(
        app_name="fanout-ab", cores=args.cores, shuffle_partitions=int(args.cores)
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    names = args.queries or list(registry)

    stock_read = readers.read_table

    def fanned_read(spark, sf_dir, name):
        return readers.fanout_repartition(stock_read(spark, sf_dir, name))

    def best(fn, n):
        draws = []
        for _ in range(n + 1):  # +1 warm draw; min over the REST only
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            draws.append(time.perf_counter() - t0)
        # ADVICE r15: the first (cold) draw must not enter the min, or the
        # A/B can report a cold-draw time as the warm best.
        return min(draws[1:])

    print("query\tA_stock\tB_fanned\tdelta")
    for name in names:
        spec = registry[name]
        try:
            readers.read_table = stock_read
            # also re-point the symbol imported into query modules
            _patch_modules(stock_read)
            a = best(spec.fn, args.n)
            readers.read_table = fanned_read
            _patch_modules(fanned_read)
            b = best(spec.fn, args.n)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}\tERROR\t{type(exc).__name__}: {exc}"[:160])
            continue
        finally:
            readers.read_table = stock_read
            _patch_modules(stock_read)
        print(f"{name}\t{a:.3f}\t{b:.3f}\t{b - a:+.3f}")
        sys.stdout.flush()
    spark.stop()


def _patch_modules(fn) -> None:
    """Query modules do `from ...readers import read_table` — rebind each."""
    import importlib
    import pkgutil

    import join_example_spark.queries as qpkg

    for mod in pkgutil.iter_modules(qpkg.__path__):
        m = importlib.import_module(f"join_example_spark.queries.{mod.name}")
        if hasattr(m, "read_table"):
            m.read_table = fn
    import join_example_spark.operators as opkg

    for mod in pkgutil.iter_modules(opkg.__path__):
        m = importlib.import_module(f"join_example_spark.operators.{mod.name}")
        if hasattr(m, "read_table"):
            m.read_table = fn


if __name__ == "__main__":
    main()
