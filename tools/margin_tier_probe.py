"""Measure the margin-mining family's scale posture at rotation-enlarged
tiers: the flat probes x corpus scan (q_llm_mine_margin_baseline shape)
vs the IVF-front-end default (q_llm_mine_margin_ivf shape — the TWO-STAGE
SYMMETRIZED screen + gray-zone-escalated verify-the-positives plan,
round 10: corpus multi-assign q=4, halved probe dial, eps=0.01 widened
escalation gate) at the default dial and at the calibrated
target_recall=0.90 notch.

Same corpus-enlargement protocol as tools/calibrated_recall_sweep.py
(cyclic rotation isometry — distinct vectors, preserved geometry). The
probe split stays the declared one (vec_id % 50): the probe count grows
with the corpus, as a production mining workload's would.

Usage:  python tools/margin_tier_probe.py
Env:    SPARK_GRAFT_PROBE_COPIES=8,64    tier multipliers
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


def main() -> None:
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

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n0 = base.count()
    results = {}

    def margin_over(scored):
        w = Window.partitionBy("probe_id").orderBy(
            F.col("sim").desc(), F.col("cand_id")
        )
        best2 = (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 2)
            .groupBy("probe_id")
            .agg(
                F.max(F.when(F.col("rn") == 1, F.col("cand_id"))).alias("best_id"),
                F.max(F.when(F.col("rn") == 1, F.col("sim"))).alias("best_sim"),
                F.max(F.when(F.col("rn") == 2, F.col("sim"))).alias("second_sim"),
            )
        )
        m = F.col("best_sim") - F.col("second_sim")
        return best2.where(F.col("second_sim").isNotNull()).select(
            "probe_id",
            "best_id",
            "best_sim",
            m.alias("margin"),
            ((m >= F.lit(0.05)) & (F.col("best_sim") >= F.lit(0.3))).alias("accepted"),
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
        dials = {
            "flat": None,
            "ivf_default": margin_screen_dials(n),
            "ivf_t090": margin_screen_dials(n, target_recall=0.90),
        }
        print(f"tier {copies}x: n={n} C={n_cent} dials={dials}", file=sys.stderr)

        accepted = {}
        for name, dial in dials.items():
            q_assign, nprobe = dial if dial is not None else (None, None)
            t0 = time.perf_counter()
            if nprobe is None:
                probes = big.where(F.col("vec_id") % 50 == 0).select(
                    F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pv")
                )
                corpus = big.where(F.col("vec_id") % 50 != 0).select(
                    F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv")
                )
                scored = corpus.crossJoin(F.broadcast(probes)).select(
                    "probe_id",
                    "cand_id",
                    F.round(F.expr(DOT_SQL.format(a="pv", b="cv")), 4).alias("sim"),
                )
            else:
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
                    .groupBy("probe_id", "cand_id")
                    .agg(F.max("sim").alias("sim"))
                )
            out = margin_over(scored)
            if nprobe is not None:
                # the declared plan's verify stage: exact full-corpus
                # rescan of the tentative accepts PLUS the eps=0.01
                # gray zone (widened-gate escalation, round 10)
                est = out.localCheckpoint(eager=True)
                acc_ids = est.where(
                    (F.col("margin") >= F.lit(MARGIN_ESC_MARGIN))
                    & (F.col("best_sim") >= F.lit(MARGIN_ESC_FLOOR))
                ).select("probe_id")
                acc_p = big.join(
                    F.broadcast(acc_ids), big.vec_id == F.col("probe_id")
                ).select("probe_id", F.col("embedding").alias("pv"))
                corpus_full = big.where(F.col("vec_id") % 50 != 0).select(
                    F.col("vec_id").alias("cand_id"),
                    F.col("embedding").alias("cv"),
                )
                vres = margin_over(
                    corpus_full.crossJoin(F.broadcast(acc_p)).select(
                        "probe_id",
                        "cand_id",
                        F.round(
                            F.expr(DOT_SQL.format(a="pv", b="cv")), 4
                        ).alias("sim"),
                    )
                )
                out = est.join(
                    vres.select(
                        "probe_id",
                        F.col("best_id").alias("vb"),
                        F.col("best_sim").alias("vs"),
                        F.col("accepted").alias("va"),
                    ),
                    "probe_id",
                    "left",
                ).select(
                    "probe_id",
                    F.coalesce("vb", "best_id").alias("best_id"),
                    F.coalesce("vs", "best_sim").alias("best_sim"),
                    F.coalesce("va", F.lit(False)).alias("accepted"),
                )
            out = out.localCheckpoint(eager=True)
            secs = round(time.perf_counter() - t0, 1)
            acc = {
                r["probe_id"]: r["best_id"]
                for r in out.where("accepted").collect()
            }
            accepted[name] = acc
            results[f"{copies}x_{name}"] = {
                "n": n,
                "dial_q_p": dial,
                "sec": secs,
                "n_probes_out": out.count(),
                "n_accepted": len(acc),
            }
            print(
                f"  {name} (q,p={dial}): {secs}s accepted={len(acc)}",
                file=sys.stderr,
            )
        # fidelity vs the flat ground truth: accepted-set precision/recall
        truth = accepted["flat"]
        for name in ("ivf_default", "ivf_t090"):
            got = accepted[name]
            tp = sum(1 for p, b in got.items() if truth.get(p) == b)
            results[f"{copies}x_{name}"]["accept_precision"] = round(
                tp / max(len(got), 1), 4
            )
            results[f"{copies}x_{name}"]["accept_recall"] = round(
                tp / max(len(truth), 1), 4
            )

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
