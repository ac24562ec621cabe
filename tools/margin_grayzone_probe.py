"""Diagnose WHERE the margin miner's missed true accepts land in
(screen margin, screen best_sim) space, to size the round-10 gray-zone
escalation (VERDICT r9 task #2).

For each tier the tool computes the flat ground truth (per-probe exact
best/margin/accepted) and the SCREEN-ONLY estimates at both dial notches,
then reports, per missed true accept, its screen-stage (margin, best_sim)
— plus, for a grid of epsilon values, the escalation volume (how many
probes an `margin >= 0.05-eps AND best_sim >= 0.3-eps` gate would route
to the exact verifier) and the accept recall that gate would achieve
(escalated true accepts are ALWAYS recovered: the verifier emits exact
flat truth for every escalated probe, so recall@eps counts true accepts
whose screen row passes the widened gate).

Same corpus-enlargement protocol as tools/margin_tier_probe.py.

Usage:  python tools/margin_grayzone_probe.py
Env:    SPARK_GRAFT_PROBE_COPIES=8,64    tier multipliers
        SPARK_GRAFT_GRAYZONE_DUMP=path   also dump per-probe truth + screen
                                         coords (JSON) for offline rule
                                         evaluation
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = [int(x) for x in os.environ.get("SPARK_GRAFT_PROBE_COPIES", "8,64").split(",")]
EPS_GRID = [0.0, 0.005, 0.01, 0.02, 0.03, 0.04, 0.05, 0.075, 0.1, 0.15, 0.2]
DUMP = os.environ.get("SPARK_GRAFT_GRAYZONE_DUMP")


def main() -> None:
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from join_example_spark.conf import ensure_session_confs
    from join_example_spark.operators.similarity import (
        DOT_SQL,
        _by_cell,
        adaptive_nprobe,
        ivf_cells,
    )

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
    dump = {}

    def best2_rows(scored):
        w = Window.partitionBy("probe_id").orderBy(
            F.col("sim").desc(), F.col("cand_id")
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 2)
            .groupBy("probe_id")
            .agg(
                F.max(F.when(F.col("rn") == 1, F.col("cand_id"))).alias("best_id"),
                F.max(F.when(F.col("rn") == 1, F.col("sim"))).alias("best_sim"),
                F.max(F.when(F.col("rn") == 2, F.col("sim"))).alias("second_sim"),
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

    for copies in COPIES:
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
        print(f"tier {copies}x: n={n} C={n_cent}", file=sys.stderr)

        t0 = time.perf_counter()
        probes_flat = big.where(F.col("vec_id") % 50 == 0).select(
            F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pv")
        )
        corpus_flat = big.where(F.col("vec_id") % 50 != 0).select(
            F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv")
        )
        truth_rows = best2_rows(
            corpus_flat.crossJoin(F.broadcast(probes_flat)).select(
                "probe_id",
                "cand_id",
                F.round(F.expr(DOT_SQL.format(a="pv", b="cv")), 4).alias("sim"),
            )
        )
        print(
            f"  flat truth: {round(time.perf_counter() - t0, 1)}s "
            f"{len(truth_rows)} probes",
            file=sys.stderr,
        )
        truth = {
            r["probe_id"]: r
            for r in truth_rows
        }
        true_acc = {
            p: r
            for p, r in truth.items()
            if r["margin"] >= 0.05 and r["best_sim"] >= 0.3
        }
        if DUMP:
            dump[f"{copies}x_truth"] = {
                str(p): [r["best_id"], r["best_sim"], r["margin"]]
                for p, r in truth.items()
            }

        for notch, target in (("default", None), ("t090", 0.90)):
            nprobe = (
                adaptive_nprobe(n)
                if target is None
                else adaptive_nprobe(n, target_recall=target)
            )
            t0 = time.perf_counter()
            corpus = (
                ivf_cells(big, n_cent)
                .where(F.col("vec_id") % 50 != 0)
                .select(
                    F.col("vec_id").alias("cand_id"),
                    "cell",
                    F.col("embedding").alias("cv"),
                )
            )
            probes = (
                ivf_cells(big, n_cent, nprobe=nprobe)
                .where(F.col("vec_id") % 50 == 0)
                .select(
                    F.col("vec_id").alias("probe_id"),
                    "cell",
                    F.col("embedding").alias("pv"),
                )
            )
            screen_rows = best2_rows(
                _by_cell(probes)
                .join(_by_cell(corpus), "cell")
                .select(
                    "probe_id",
                    "cand_id",
                    F.round(F.expr(DOT_SQL.format(a="pv", b="cv")), 4).alias("sim"),
                )
            )
            secs = round(time.perf_counter() - t0, 1)
            screen = {r["probe_id"]: r for r in screen_rows}
            n_probes = len(screen)
            if DUMP:
                dump[f"{copies}x_screen_{notch}"] = {
                    str(p): [r["best_id"], r["best_sim"], r["margin"]]
                    for p, r in screen.items()
                }

            # where do the MISSED true accepts land in screen space?
            missed = []
            for p, tr in true_acc.items():
                s = screen.get(p)
                if s is None:
                    missed.append({"probe": p, "screen": None})
                elif not (s["margin"] >= 0.05 and s["best_sim"] >= 0.3):
                    missed.append(
                        {
                            "probe": p,
                            "s_margin": round(s["margin"], 4),
                            "s_best": round(s["best_sim"], 4),
                            "t_margin": round(tr["margin"], 4),
                            "t_best": round(tr["best_sim"], 4),
                        }
                    )
            eps_table = {}
            for eps in EPS_GRID:
                escal = [
                    p
                    for p, s in screen.items()
                    if s["margin"] >= 0.05 - eps and s["best_sim"] >= 0.3 - eps
                ]
                hit = sum(1 for p in escal if p in true_acc)
                eps_table[str(eps)] = {
                    "escalated": len(escal),
                    "escalated_frac": round(len(escal) / max(n_probes, 1), 4),
                    "recall": round(hit / max(len(true_acc), 1), 4),
                }
            key = f"{copies}x_{notch}"
            results[key] = {
                "n": n,
                "nprobe": nprobe,
                "screen_sec": secs,
                "n_probes": n_probes,
                "n_true_accepts": len(true_acc),
                "n_missed_at_eps0": len(missed),
                "missed_screen_coords": missed,
                "eps_table": eps_table,
            }
            print(
                f"  {notch} (p={nprobe}): {secs}s missed={len(missed)}"
                f"/{len(true_acc)}",
                file=sys.stderr,
            )
            for eps in EPS_GRID:
                e = eps_table[str(eps)]
                print(
                    f"    eps={eps}: escalate {e['escalated']}"
                    f" ({e['escalated_frac']:.1%}) -> recall {e['recall']}",
                    file=sys.stderr,
                )

    if DUMP:
        with open(DUMP, "w") as fh:
            json.dump(dump, fh)
        print(f"per-probe dump -> {DUMP}", file=sys.stderr)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
