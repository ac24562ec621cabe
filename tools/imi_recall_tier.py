"""Pair-recall audit of IMI vs IVF at a rotation-enlarged DISTINCT tier
(SCALE.md §3.5 follow-up: the round-5 verdict asked for the 64×/128k-vector
pair-recall point before deciding whether IMI becomes the semantic-dedup
family default).

Usage:  python tools/imi_recall_tier.py            # 64x tier
Env:    SPARK_GRAFT_PROBE_COPIES=N                 # tier multiplier

Protocol (same as q_llm_imi_recall / q_llm_ann_recall_nprobe, probe-side
sampled so the tier run stays cheap): ground truth = exact rounded dots of
a deterministic 1% probe sample against the whole corpus (sim >= 0.35);
a pair (p, x) is an index candidate iff p and x share an assigned cell —
computed by filtering the PROBE side of the cell join before the shuffle,
which bounds the join at |probe cells| x members-per-cell instead of the
full n² candidate materialization.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_PROBE_COPIES", "64"))
PROBE_MOD = 100  # 1% probe sample


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from join_example_spark.conf import ensure_session_confs
    from join_example_spark.operators.similarity import (
        DOT_SQL,
        imi_c_per_half,
        imi_cells,
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

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n0 = base.count()
    big = base
    for k in range(1, COPIES):
        r = k % 63 + 1  # cyclic rotation isometry, never identity
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
    print(f"tier: {COPIES}x -> n={n}", file=sys.stderr)

    # Ground truth: 1% probe sample x corpus, exact rounded dot.
    probes = big.where(F.col("vec_id") % PROBE_MOD == 0).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a")
    )
    dot = F.expr(DOT_SQL.format(a="vec_a", b="vec_b"))
    truth = (
        big.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b"))
        .crossJoin(F.broadcast(probes))
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(dot, 4))
        .where(F.col("sim") >= 0.35)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    n_true = truth.count()
    print(f"true pairs (probe-sampled, sim>=0.35): {n_true}", file=sys.stderr)

    def probe_filtered_recall(cells, label):
        # candidate(p, x) iff p and x share an assigned cell; probe side
        # filtered BEFORE the shuffle. Both (p<x) and (x<p) orders arise
        # from p's probe row, so orient with least/greatest.
        t0 = time.time()
        pc = cells.where(F.col("vec_id") % PROBE_MOD == 0).select(
            F.col("vec_id").alias("pid"), "cell"
        )
        oc = cells.select(F.col("vec_id").alias("oid"), "cell")
        cand = (
            pc.join(oc, "cell")
            .where(F.col("pid") != F.col("oid"))
            .select(
                F.least("pid", "oid").alias("id_a"),
                F.greatest("pid", "oid").alias("id_b"),
            )
            .distinct()
        )
        found = truth.join(cand, ["id_a", "id_b"], "left_semi").count()
        dt = time.time() - t0
        rec = found / n_true if n_true else None
        print(f"{label}: found {found}/{n_true} recall={rec:.4f} ({dt:.1f}s)",
              file=sys.stderr)
        return {"found": found, "recall": round(rec, 4), "sec": round(dt, 1)}

    out = {"copies": COPIES, "n": n, "n_true_sampled": n_true}

    c_half = imi_c_per_half(n)
    imi = imi_cells(big, c_per_half=c_half, nprobe_half=4, nprobe_cells=8)
    out["imi"] = probe_filtered_recall(
        imi.select("vec_id", "cell"), f"IMI C={c_half}/half p=4 T=8"
    )

    c_ivf = int(math.ceil(math.sqrt(n)))
    ivf = ivf_cells(big, n_centroids=c_ivf, nprobe=5)
    out["ivf"] = probe_filtered_recall(
        ivf.select("vec_id", "cell"), f"IVF C={c_ivf} nprobe=5"
    )

    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
