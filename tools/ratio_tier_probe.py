"""Measure the RATIO-margin family's scale posture at rotation-enlarged
tiers: the flat exact plan (q_llm_mine_margin_ratio_baseline shape) vs
the symmetrized-screen + lossless-shortlist-verified scale default
(q_llm_mine_margin_ratio_ivf shape), walls + accept precision/recall.

Same corpus-enlargement protocol as tools/margin_tier_probe.py. The
plans are rebuilt here from the same operators the declared queries use
(margin_screen_dials, _top4_den, the shortlist bound), so the probe
measures what ships.

Usage:  python tools/ratio_tier_probe.py
Env:    SPARK_GRAFT_PROBE_COPIES=8,64
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

from pyspark import StorageLevel

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = [int(x) for x in os.environ.get("SPARK_GRAFT_PROBE_COPIES", "8,64").split(",")]


def main() -> None:
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from join_example_spark.conf import ensure_session_confs
    from join_example_spark.operators.similarity import (
        DOT_SQL,
        _by_cell,
        ivf_cells,
        margin_screen_dials,
    )
    from join_example_spark.queries.llm_similarity import _top4_den

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

    flat_fwd_holder = [None]  # exposes the flat sim table for geometry stats

    def flat_plan(big):
        probes = big.where(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pv")
        )
        corpus = big.where(F.col("vec_id") % 100 != 0).select(
            F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv")
        )
        fwd = (
            corpus.crossJoin(F.broadcast(probes))
            .select(
                "probe_id",
                "cand_id",
                F.round(F.expr(DOT_SQL.format(a="pv", b="cv")), 4).alias("sim"),
            )
            .persist(StorageLevel.DISK_ONLY)
        )
        fwd.count()
        flat_fwd_holder[0] = fwd
        fden = _top4_den(fwd, "probe_id", "cand_id", "den_x")
        bden = _top4_den(fwd, "cand_id", "probe_id", "den_y")
        sc = (
            fwd.join(fden, "probe_id")
            .join(bden, "cand_id")
            .withColumn("ratio", F.col("sim") / (F.col("den_x") + F.col("den_y")))
        )
        w = Window.partitionBy("probe_id").orderBy(
            F.col("ratio").desc(), F.col("cand_id")
        )
        return (
            sc.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(
                "probe_id",
                F.col("cand_id").alias("best_id"),
                F.col("sim").alias("best_sim"),
                "ratio",
                (
                    (F.col("ratio") >= F.lit(1.05)) & (F.col("sim") >= F.lit(0.3))
                ).alias("accepted"),
            )
        )

    def ivf_plan(big, n, n_cent):
        q_assign, nprobe = margin_screen_dials(n)
        corpus = (
            ivf_cells(big, n_cent, nprobe=q_assign)
            .where(F.col("vec_id") % 100 != 0)
            .select(
                F.col("vec_id").alias("cand_id"), "cell", F.col("embedding").alias("cv")
            )
        )
        probes = (
            ivf_cells(big, n_cent, nprobe=nprobe)
            .where(F.col("vec_id") % 100 == 0)
            .select(
                F.col("vec_id").alias("probe_id"), "cell", F.col("embedding").alias("pv")
            )
        )
        scored = (
            _by_cell(probes)
            .join(_by_cell(corpus), "cell")
            .select(
                "probe_id",
                "cand_id",
                F.round(F.expr(DOT_SQL.format(a="pv", b="cv")), 4).alias("sim"),
            )
            .groupBy("probe_id", "cand_id")
            .agg(F.max("sim").alias("sim"))
            .localCheckpoint(eager=True)
        )
        sdx = _top4_den(scored, "probe_id", "cand_id", "den_x")
        sdy = _top4_den(scored, "cand_id", "probe_id", "den_y")
        ssc = (
            scored.join(sdx, "probe_id")
            .join(sdy, "cand_id")
            .withColumn("ratio", F.col("sim") / (F.col("den_x") + F.col("den_y")))
        )
        wr = Window.partitionBy("probe_id").orderBy(
            F.col("ratio").desc(), F.col("cand_id")
        )
        est = (
            ssc.withColumn("rn", F.row_number().over(wr))
            .where(F.col("rn") == 1)
            .select(
                "probe_id",
                F.col("cand_id").alias("best_id"),
                F.col("sim").alias("best_sim"),
                "ratio",
            )
            .localCheckpoint(eager=True)
        )
        esc = (
            ssc.where(
                (F.col("ratio") >= F.lit(1.05)) & (F.col("sim") >= F.lit(0.3))
            )
            .select("probe_id")
            .distinct()
        )
        acc_p = big.join(F.broadcast(esc), big.vec_id == F.col("probe_id")).select(
            "probe_id", F.col("embedding").alias("pv")
        )
        corpus_full = big.where(F.col("vec_id") % 100 != 0).select(
            F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv")
        )
        vfwd = (
            corpus_full.crossJoin(F.broadcast(acc_p))
            .select(
                "probe_id",
                "cand_id",
                F.round(F.expr(DOT_SQL.format(a="pv", b="cv")), 4).alias("sim"),
            )
            .persist(StorageLevel.DISK_ONLY)
        )
        vfwd.count()
        vdx = _top4_den(vfwd, "probe_id", "cand_id", "vden_x")
        ws = Window.partitionBy("probe_id").orderBy(
            F.col("sim").desc(), F.col("cand_id")
        )
        vanch = (
            vfwd.withColumn("rn", F.row_number().over(ws))
            .where(F.col("rn") == 1)
            .select(
                "probe_id",
                F.col("cand_id").alias("anchor_id"),
                F.col("sim").alias("anchor_sim"),
            )
        )
        probes_all = big.where(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("p2_id"), F.col("embedding").alias("p2v")
        )
        anchor_emb = big.join(
            F.broadcast(vanch.select("anchor_id").distinct()),
            big.vec_id == F.col("anchor_id"),
        ).select("anchor_id", F.col("embedding").alias("av"))
        aback = probes_all.crossJoin(F.broadcast(anchor_emb)).select(
            F.col("anchor_id").alias("cand_id"),
            "p2_id",
            F.round(F.expr(DOT_SQL.format(a="av", b="p2v")), 4).alias("sim"),
        )
        aden = _top4_den(aback, "cand_id", "p2_id", "aden_y").select(
            F.col("cand_id").alias("anchor_id"), "aden_y"
        )
        lbound = (
            vanch.join(vdx, "probe_id")
            .join(aden, "anchor_id")
            .select(
                "probe_id",
                (
                    F.col("anchor_sim") / (F.col("vden_x") + F.col("aden_y"))
                ).alias("l_ratio"),
            )
        )
        short = (
            vfwd.join(vdx, "probe_id")
            .join(lbound, "probe_id")
            .where(
                (F.col("sim") > F.lit(0.0))
                & (
                    F.col("sim") / (F.col("vden_x") + F.col("sim") / F.lit(8.0))
                    >= F.col("l_ratio")
                )
            )
            .select("probe_id", "cand_id", "sim", "vden_x")
            .localCheckpoint(eager=True)
        )
        short_emb = big.join(
            F.broadcast(short.select("cand_id").distinct()),
            big.vec_id == F.col("cand_id"),
        ).select("cand_id", F.col("embedding").alias("sv"))
        sback = probes_all.crossJoin(F.broadcast(short_emb)).select(
            "cand_id",
            "p2_id",
            F.round(F.expr(DOT_SQL.format(a="sv", b="p2v")), 4).alias("sim"),
        )
        sden = _top4_den(sback, "cand_id", "p2_id", "vden_y")
        wvr = Window.partitionBy("probe_id").orderBy(
            F.col("vratio").desc(), F.col("cand_id")
        )
        vbest = (
            short.join(sden, "cand_id")
            .withColumn(
                "vratio", F.col("sim") / (F.col("vden_x") + F.col("vden_y"))
            )
            .withColumn("rn", F.row_number().over(wvr))
            .where(F.col("rn") == 1)
            .select(
                "probe_id",
                F.col("cand_id").alias("vbest_id"),
                F.col("sim").alias("vbest_sim"),
                "vratio",
            )
        )
        j = est.join(vbest, "probe_id", "left")
        best_sim_f = F.coalesce(F.col("vbest_sim"), F.col("best_sim"))
        ratio_f = F.coalesce(F.col("vratio"), F.col("ratio"))
        out = j.select(
            "probe_id",
            F.coalesce(F.col("vbest_id"), F.col("best_id")).alias("best_id"),
            best_sim_f.alias("best_sim"),
            ratio_f.alias("ratio"),
            ((ratio_f >= F.lit(1.05)) & (best_sim_f >= F.lit(0.3))).alias(
                "accepted"
            ),
        )
        return out, esc, short, (q_assign, nprobe)

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
        flat = flat_plan(big).localCheckpoint(eager=True)
        flat_sec = round(time.perf_counter() - t0, 1)
        # Negative-sim-geometry check (ADVICE r10): count negative slots
        # in the flat top-4 backward sets — the regime where the UNCLAMPED
        # dens' screening bounds were invalid. Nonzero here means this
        # tier actually exercises the clamp, so its precision/recall rows
        # certify the bound fix, not just benign geometry.
        bw = Window.partitionBy("cand_id").orderBy(
            F.col("sim").desc(), F.col("probe_id")
        )
        neg_top4 = (
            flat_fwd_holder[0]
            .withColumn("rn", F.row_number().over(bw))
            .where((F.col("rn") <= 4) & (F.col("sim") < 0))
            .count()
        )
        print(f"  neg top-4 backward slots: {neg_top4}", file=sys.stderr)
        truth = {r["probe_id"]: r for r in flat.collect()}
        true_acc = {p: r["best_id"] for p, r in truth.items() if r["accepted"]}
        print(
            f"  flat: {flat_sec}s accepted={len(true_acc)}/{len(truth)}",
            file=sys.stderr,
        )

        t0 = time.perf_counter()
        out, esc, short, dial = ivf_plan(big, n, n_cent)
        out = out.localCheckpoint(eager=True)
        ivf_sec = round(time.perf_counter() - t0, 1)
        got_acc = {
            r["probe_id"]: r["best_id"] for r in out.collect() if r["accepted"]
        }
        tp = sum(1 for p, b in got_acc.items() if true_acc.get(p) == b)
        results[f"{copies}x"] = {
            "n": n,
            "neg_top4_slots": neg_top4,
            "dial_q_p": dial,
            "flat_sec": flat_sec,
            "ivf_sec": ivf_sec,
            "n_true_accepts": len(true_acc),
            "n_ivf_accepts": len(got_acc),
            "n_escalated": esc.count(),
            "n_shortlist_pairs": short.count(),
            "accept_precision": round(tp / max(len(got_acc), 1), 4),
            "accept_recall": round(tp / max(len(true_acc), 1), 4),
        }
        print(f"  ivf: {ivf_sec}s {results[f'{copies}x']}", file=sys.stderr)

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
