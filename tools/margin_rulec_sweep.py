"""Sweep the SYMMETRIZED margin-miner screen: corpus-side multi-assign
(each candidate lives in its top-q cells, not just its home cell) x probe
dial p, measuring accept recall/cost against the flat truth dumped by
tools/margin_grayzone_probe.py (SPARK_GRAFT_GRAYZONE_DUMP).

Why: the round-9 screen is ASYMMETRIC — probes multi-probe p cells but a
candidate is findable only through its single home cell, so the per-member
hit probability R is one-sided; the dedup family's symmetric multi-assign
is what its audited pair recall rests on. Multi-assigning the corpus at q
gives each top-2 member q chances (miss ~ (1-R)^q), aiming accept recall
>= 0.85 at the 64x tier within ~2x of the round-9 screen wall (VERDICT r9
task #2), with a residual eps gray-zone escalation measured on top.

Usage:  python tools/margin_grayzone_probe.py   # first, with DUMP set
        python tools/margin_rulec_sweep.py
Env:    SPARK_GRAFT_PROBE_COPIES=64       tier multipliers
        SPARK_GRAFT_GRAYZONE_DUMP=path    truth dump (required)
        SPARK_GRAFT_RULEC_GRID="1:40,2:20,2:40,3:14"   q:p combos
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = [int(x) for x in os.environ.get("SPARK_GRAFT_PROBE_COPIES", "64").split(",")]
DUMP = os.environ.get("SPARK_GRAFT_GRAYZONE_DUMP", "/tmp/grayzone_dump.json")
GRID = [
    tuple(int(v) for v in combo.split(":"))
    for combo in os.environ.get(
        "SPARK_GRAFT_RULEC_GRID", "1:40,2:20,2:40,3:14,3:27"
    ).split(",")
]
EPS_GRID = [0.0, 0.005, 0.01, 0.02, 0.03]


def main() -> None:
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from join_example_spark.conf import ensure_session_confs
    from join_example_spark.operators.similarity import (
        DOT_SQL,
        _by_cell,
        ivf_cells,
    )

    with open(DUMP) as fh:
        dump = json.load(fh)

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    ensure_session_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n0 = base.count()
    results = {}

    for copies in COPIES:
        truth = {
            int(p): v for p, v in dump[f"{copies}x_truth"].items()
        }  # probe -> [best_id, best_sim, margin]
        true_acc = {
            p: v for p, v in truth.items() if v[2] >= 0.05 and v[1] >= 0.3
        }
        big = base
        for k in range(1, copies):
            r = k % 63 + 1
            big = big.union(
                base.select(
                    (F.col("vec_id") + F.lit(k * n0)).alias("vec_id"),
                    F.expr(
                        f"concat(slice(embedding, {r + 1}, {64 - r}),"
                        f" slice(embedding, 1, {r}))"
                    ).alias("embedding"),
                    F.col("label"),
                )
            )
        big = big.repartition(32).localCheckpoint(eager=True)
        n = big.count()
        n_cent = int(math.ceil(math.sqrt(n)))
        print(
            f"tier {copies}x: n={n} C={n_cent} true_accepts={len(true_acc)}",
            file=sys.stderr,
        )

        for q, p in GRID:
            t0 = time.perf_counter()
            corpus = (
                ivf_cells(big, n_cent, nprobe=q)
                .where(F.col("vec_id") % 50 != 0)
                .select(
                    F.col("vec_id").alias("cand_id"),
                    "cell",
                    F.col("embedding").alias("cv"),
                )
            )
            probes = (
                ivf_cells(big, n_cent, nprobe=p)
                .where(F.col("vec_id") % 50 == 0)
                .select(
                    F.col("vec_id").alias("probe_id"),
                    "cell",
                    F.col("embedding").alias("pv"),
                )
            )
            scored = (
                _by_cell(probes)
                .join(_by_cell(corpus), "cell")
                .select(
                    "probe_id",
                    "cand_id",
                    F.round(F.expr(DOT_SQL.format(a="pv", b="cv")), 4).alias(
                        "sim"
                    ),
                )
            )
            if q > 1:
                # a pair can now meet in up to q cells — dedup before the
                # top-2 window (identical sims, so MAX == the one value)
                scored = scored.groupBy("probe_id", "cand_id").agg(
                    F.max("sim").alias("sim")
                )
            w = Window.partitionBy("probe_id").orderBy(
                F.col("sim").desc(), F.col("cand_id")
            )
            rows = (
                scored.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") <= 2)
                .groupBy("probe_id")
                .agg(
                    F.max(F.when(F.col("rn") == 1, F.col("cand_id"))).alias(
                        "best_id"
                    ),
                    F.max(F.when(F.col("rn") == 1, F.col("sim"))).alias(
                        "best_sim"
                    ),
                    F.max(F.when(F.col("rn") == 2, F.col("sim"))).alias(
                        "second_sim"
                    ),
                )
                .where(F.col("second_sim").isNotNull())
                .select(
                    "probe_id",
                    "best_id",
                    "best_sim",
                    (F.col("best_sim") - F.col("second_sim")).alias("margin"),
                )
                .collect()
            )
            secs = round(time.perf_counter() - t0, 1)
            screen = {r["probe_id"]: r for r in rows}
            n_probes = len(screen)
            # screen-exact accept recall (no escalation): tentative accepts
            # whose screen best == truth best (they WILL survive the exact
            # verify and be emitted accepted)
            tent = {
                pid: s
                for pid, s in screen.items()
                if s["margin"] >= 0.05 and s["best_sim"] >= 0.3
            }
            tp = sum(1 for pid in tent if pid in true_acc)
            eps_tbl = {}
            for eps in EPS_GRID:
                esc = [
                    pid
                    for pid, s in screen.items()
                    if s["margin"] >= 0.05 - eps and s["best_sim"] >= 0.3 - eps
                ]
                hit = sum(1 for pid in esc if pid in true_acc)
                eps_tbl[str(eps)] = {
                    "escalated": len(esc),
                    "escalated_frac": round(len(esc) / max(n_probes, 1), 4),
                    "recall": round(hit / max(len(true_acc), 1), 4),
                }
            key = f"{copies}x_q{q}_p{p}"
            results[key] = {
                "n": n,
                "q": q,
                "p": p,
                "screen_sec": secs,
                "n_probes": n_probes,
                "n_tentative": len(tent),
                "tentative_precision": round(tp / max(len(tent), 1), 4),
                "recall_at_eps": eps_tbl,
            }
            print(
                f"  q={q} p={p}: {secs}s tent={len(tent)} "
                f"recall@0={eps_tbl['0.0']['recall']} "
                f"@.01={eps_tbl['0.01']['recall']}"
                f"(esc {eps_tbl['0.01']['escalated_frac']:.1%}) "
                f"@.02={eps_tbl['0.02']['recall']}"
                f"(esc {eps_tbl['0.02']['escalated_frac']:.1%})",
                file=sys.stderr,
            )

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
