#!/usr/bin/env python
"""Interleaved A/B: plain min-label CC vs star-contraction CC inside the
two declared clustering consumers (round 16, OPTIMIZATION_r16.md 7b).

Per query: full-collect result-equality check first (both formulations
label every node with the minimum reachable id — the swap is only legal
because this holds), then one discarded warm draw per variant, then
3 x A,B followed by 3 x B,A (the 8c03dfc reverse-then-interleave
protocol). Measured verdict: star wins BOTH orders in
q_llm_cluster_dbscan, plain wins BOTH orders in q_llm_cluster_quality —
the swap was applied to dbscan only.

Usage: python tools/cc_swap_ab.py
"""
import os, sys, time, statistics
sys.path.insert(0, "/root/repo")
from join_example_spark.conf import build_local_session
import join_example_spark.operators.graph as g
from join_example_spark.registry import load_all

spark = build_local_session(app_name="cc-swap-ab", cores="32", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
reg = load_all()
SF = "/root/testdata/sf0.1"
plain = g.connected_components

def draw(q):
    t0 = time.perf_counter()
    reg[q].fn(spark, SF).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)

for q in ("q_llm_cluster_dbscan", "q_llm_cluster_quality"):
    # result equality check once
    rows_a = sorted(map(tuple, reg[q].fn(spark, SF).collect()))
    g.connected_components = g.connected_components_star
    rows_b = sorted(map(tuple, reg[q].fn(spark, SF).collect()))
    g.connected_components = plain
    print(q, "rows_equal", rows_a == rows_b, len(rows_a), flush=True)
    # interleave: discard one warm each, then A,B,A,B then B,A,B,A
    draw(q); g.connected_components = g.connected_components_star; draw(q); g.connected_components = plain
    res = {"A": [], "B": []}
    for order in ("AB", "BA"):
        blk = {"A": [], "B": []}
        for _ in range(3):
            for v in order:
                g.connected_components = plain if v == "A" else g.connected_components_star
                blk[v].append(draw(q))
        g.connected_components = plain
        print(q, order, "A(plain)", blk["A"], "B(star)", blk["B"],
              "medA", statistics.median(blk["A"]), "medB", statistics.median(blk["B"]), flush=True)
        res["A"] += blk["A"]; res["B"] += blk["B"]
    print(q, "OVERALL medA", statistics.median(res["A"]), "medB", statistics.median(res["B"]), flush=True)
spark.stop()
