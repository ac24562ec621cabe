"""Measure the margin-mining family's accept precision/recall on the
geometry the Artetxe & Schwenk rule is DESIGNED for — planted strong
pairs — plus the §3.7 clustered geometry as a negative control
(VERDICT r9 stretch task #6).

Geometries
----------
- ``planted``: isotropic background; every probe (vec_id % 50 == 0) gets
  one planted partner at exact cosine PLANT_COS (0.7) — the bitext-mining
  regime: best ≈ 0.7, second ≈ the isotropic crowding ceiling (~0.55 at
  n=128k), margin ≈ 0.15 >> 0.05, so essentially every probe is a true
  accept. The design claim under test: "in the separated regime both
  top-2 survive at the audited pair recall and the screen margin stays
  over threshold" (SCALE §3.12) — i.e. accept recall should be HIGH here,
  unlike the isotropic fixture's near-tie worst case.
- ``clustered``: the §3.7 K=32 tight-cluster corpus (noise 0.03). Here
  every probe's top-1 and top-2 are within-cluster near-ties (sims ~0.998
  apart by ~1e-3), margins << 0.05, so the TRUE accept set is (near-)
  empty. The family's claim on this geometry is precision: the verified
  plan must emit (near-)zero accepts — a screen-only plan would fabricate
  them whenever candidate restriction inflates a near-tie margin.

The screen shape is the DECLARED q_llm_mine_margin_ivf plan (corpus
multi-assign q, probe dial p from adaptive_nprobe, gray-zone widened gate
eps routing to the exact verify stage) — parameterized so dial candidates
can be compared.

Usage:  python tools/margin_planted_probe.py
Env:    SPARK_GRAFT_PROBE_COPIES=8,64   tier sizes (x2000 vectors)
        SPARK_GRAFT_GEOMS=planted,clustered

Dials come from the DECLARED plan (margin_screen_dials + the MARGIN_ESC_*
gray-zone literals), so the probe measures exactly what ships.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COPIES = [int(x) for x in os.environ.get("SPARK_GRAFT_PROBE_COPIES", "8,64").split(",")]
GEOMS = os.environ.get("SPARK_GRAFT_GEOMS", "planted,clustered").split(",")
PLANT_COS = 0.7
N0 = 2000


def main() -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from join_example_spark.conf import ensure_session_confs
    from join_example_spark.operators.similarity import (
        DOT_SQL,
        MARGIN_ESC_FLOOR,
        MARGIN_ESC_MARGIN,
        _by_cell,
        ivf_cells,
        margin_screen_dials,
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
    results = {}

    def make_corpus(n, geom, seed=13):
        rng = np.random.default_rng(seed)
        if geom == "clustered":
            K = 32
            cent = rng.normal(size=(K, 64))
            cent /= np.linalg.norm(cent, axis=1, keepdims=True)
            v = cent[np.arange(n) % K] + 0.03 * rng.normal(size=(n, 64))
            v /= np.linalg.norm(v, axis=1, keepdims=True)
        else:
            v = rng.normal(size=(n, 64))
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            # plant: partner at i+1 with EXACT cosine PLANT_COS to probe i
            for i in range(0, n - 1, 50):
                p = v[i]
                g = rng.normal(size=64)
                u = g - (g @ p) * p
                u /= np.linalg.norm(u)
                v[i + 1] = PLANT_COS * p + math.sqrt(1 - PLANT_COS**2) * u
        pdf = pd.DataFrame(
            {
                "vec_id": np.arange(n, dtype="int64"),
                "embedding": [row.astype("float32").tolist() for row in v],
                "label": (np.arange(n) % 10).astype("int32"),
            }
        )
        return (
            spark.createDataFrame(pdf)
            .repartition(32)
            .localCheckpoint(eager=True)
        )

    def best2(scored, dedup):
        if dedup:
            scored = scored.groupBy("probe_id", "cand_id").agg(
                F.max("sim").alias("sim")
            )
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
        )

    for geom in GEOMS:
        for copies in COPIES:
            n = N0 * copies
            big = make_corpus(n, geom)
            n_cent = int(math.ceil(math.sqrt(n)))
            probes_f = big.where(F.col("vec_id") % 50 == 0).select(
                F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pv")
            )
            corpus_f = big.where(F.col("vec_id") % 50 != 0).select(
                F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv")
            )
            t0 = time.perf_counter()
            truth = {
                r["probe_id"]: r
                for r in best2(
                    corpus_f.crossJoin(F.broadcast(probes_f)).select(
                        "probe_id",
                        "cand_id",
                        F.round(F.expr(DOT_SQL.format(a="pv", b="cv")), 4).alias(
                            "sim"
                        ),
                    ),
                    dedup=False,
                ).collect()
            }
            flat_sec = round(time.perf_counter() - t0, 1)
            true_acc = {
                p: r
                for p, r in truth.items()
                if r["margin"] >= 0.05 and r["best_sim"] >= 0.3
            }
            print(
                f"{geom} {copies}x: n={n} flat {flat_sec}s "
                f"true_accepts={len(true_acc)}/{len(truth)}",
                file=sys.stderr,
            )

            for notch, target in (("default", None), ("t090", 0.90)):
                q_assign, nprobe = margin_screen_dials(n, target_recall=target)
                t0 = time.perf_counter()
                corpus = (
                    ivf_cells(big, n_cent, nprobe=q_assign)
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
                est = best2(
                    _by_cell(probes)
                    .join(_by_cell(corpus), "cell")
                    .select(
                        "probe_id",
                        "cand_id",
                        F.round(F.expr(DOT_SQL.format(a="pv", b="cv")), 4).alias(
                            "sim"
                        ),
                    ),
                    dedup=q_assign > 1,
                ).localCheckpoint(eager=True)
                esc = est.where(
                    (F.col("margin") >= F.lit(MARGIN_ESC_MARGIN))
                    & (F.col("best_sim") >= F.lit(MARGIN_ESC_FLOOR))
                ).select("probe_id")
                acc_p = big.join(
                    F.broadcast(esc), big.vec_id == F.col("probe_id")
                ).select("probe_id", F.col("embedding").alias("pv"))
                vres = best2(
                    corpus_f.crossJoin(F.broadcast(acc_p)).select(
                        "probe_id",
                        "cand_id",
                        F.round(F.expr(DOT_SQL.format(a="pv", b="cv")), 4).alias(
                            "sim"
                        ),
                    ),
                    dedup=False,
                )
                out = (
                    est.join(
                        vres.select(
                            "probe_id",
                            F.col("best_id").alias("vb"),
                            F.col("best_sim").alias("vs"),
                            F.col("margin").alias("vm"),
                        ),
                        "probe_id",
                        "left",
                    )
                    .select(
                        "probe_id",
                        F.coalesce("vb", "best_id").alias("best_id"),
                        F.coalesce("vs", "best_sim").alias("best_sim"),
                        F.coalesce("vm", "margin").alias("margin"),
                    )
                    .withColumn(
                        "accepted",
                        (F.col("margin") >= F.lit(0.05))
                        & (F.col("best_sim") >= F.lit(0.3)),
                    )
                    .localCheckpoint(eager=True)
                )
                secs = round(time.perf_counter() - t0, 1)
                acc = {
                    r["probe_id"]: r["best_id"]
                    for r in out.where("accepted").collect()
                }
                n_esc = esc.count()
                tp = sum(
                    1
                    for p, b in acc.items()
                    if p in true_acc and true_acc[p]["best_id"] == b
                )
                key = f"{geom}_{copies}x_{notch}"
                results[key] = {
                    "n": n,
                    "q": q_assign,
                    "p": nprobe,
                    
                    "sec": secs,
                    "flat_sec": flat_sec,
                    "n_true_accepts": len(true_acc),
                    "n_escalated": n_esc,
                    "n_accepted": len(acc),
                    "accept_precision": round(tp / max(len(acc), 1), 4),
                    "accept_recall": round(tp / max(len(true_acc), 1), 4),
                }
                print(f"  {notch}: {results[key]}", file=sys.stderr)

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
