#!/usr/bin/env python
"""q_llm_sim_imipq scan-consolidation probe at the 8x rotation tier
(VERDICT r15 task 6).

q_llm_sim_imipq's plan scans the embeddings table 18 times (highest scan
count in the suite) — triaged in round 15 as independent fold families
with no shared subplan worth a barrier AT FIXTURE SFs. At 100 TB, 18
scans are 18 full reads, so this probe measures the alternative at the
8x rotation tier (16k vectors, written to parquet so every scan pays a
real read): A = stock imipq_topk over the parquet read; B = the same
with the base projection (id, embedding) eager-localCheckpointed once —
one read, 17 reuses.

Interleaved A/B (A,B,A,B,... then B,A,...) per the 8c03dfc protocol.

Usage: python tools/imipq_scan_probe.py [--copies 8] [--pairs 3]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=8)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from join_example_spark.conf import build_local_session
    from join_example_spark.operators.similarity import imipq_topk
    from join_example_spark.sources.readers import read_table, table_row_count
    from tools.nsw_dial_sweep import rotation_tier

    spark = build_local_session(
        app_name="imipq-scan-probe", cores=args.cores,
        shuffle_partitions=int(args.cores),
    )
    spark.sparkContext.setLogLevel("ERROR")

    n0 = table_row_count(args.sf_dir, "embeddings")
    base = read_table(spark, args.sf_dir, "embeddings")
    tier_path = f"/tmp/imipq_tier_{args.copies}x_{os.getpid()}.parquet"
    rotation_tier(base, args.copies, n0).write.mode("overwrite").parquet(tier_path)
    emb = spark.read.parquet(tier_path)
    print(f"tier: {args.copies}x = {emb.count()} vectors at {tier_path}",
          file=sys.stderr)

    def draw_stock():
        t0 = time.perf_counter()
        imipq_topk(spark.read.parquet(tier_path), k=3).write.format(
            "noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def draw_shared():
        t0 = time.perf_counter()
        shared = (
            spark.read.parquet(tier_path)
            .select("vec_id", "embedding")
            .localCheckpoint(eager=True)
        )
        imipq_topk(shared, k=3).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # discard one warm draw each
    draw_stock(), draw_shared()
    res = {"A": [], "B": []}
    for order in ("AB", "BA"):
        block = {"A": [], "B": []}
        for _ in range(args.pairs):
            for v in order:
                d = draw_stock() if v == "A" else draw_shared()
                block[v].append(d)
                res[v].append(d)
        print(f"[{order}] A(stock) {block['A']} B(shared-ckpt) {block['B']}",
              flush=True)
    print(
        f"VERDICT: A(stock 18-scan) med={statistics.median(res['A'])} "
        f"B(shared base ckpt) med={statistics.median(res['B'])}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
