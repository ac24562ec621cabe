"""Pair-recall of the ADAPTIVE IVF dial (operators/similarity.adaptive_nprobe)
at rotation-enlarged distinct tiers — the round-7 deliverable closing the
§3.7b finding that FIXED nprobe recall falls with n (0.85 at n=2k → 0.37 at
n=128k for nprobe=5).

Usage:  python tools/adaptive_recall_tier.py            # 8x and 64x tiers
Env:    SPARK_GRAFT_PROBE_COPIES=N[,M...]               # tier multipliers
        SPARK_GRAFT_PROBE_IMI=1                         # also measure the
                                                        # IMI fixed (4,8) vs
                                                        # adaptive_imi_dials
                                                        # schedules

Protocol (same ground truth as tools/imi_recall_tier.py: exact rounded dots
of a deterministic 1% probe sample against the whole corpus, sim >= 0.35).
Recall is computed WITHOUT materializing the candidate join: a pair is an
index candidate iff its endpoints' top-p cell SETS overlap, so we build the
per-vector cell set once (n·C assignment dots + one narrow aggregate) and
evaluate arrays_overlap on the 10^5-ish true pairs. The candidate-work
audit comes from the cell-occupancy histogram (sum over cells of
assigned_a · assigned_b pairs = sum occ² here), not from paying the join —
the tool reports what a consumer WOULD pay so SCALE.md can state the
n^1.5·frac² work growth honestly next to the held recall.
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
PROBE_MOD = 100  # 1% probe sample
THRESHOLD = 0.35


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from join_example_spark.conf import ensure_session_confs
    from join_example_spark.operators.similarity import (
        DOT_SQL,
        adaptive_imi_dials,
        adaptive_nprobe,
        imi_c_per_half,
        imi_cells,
        ivf_cells,
    )

    do_imi = os.environ.get("SPARK_GRAFT_PROBE_IMI", "") == "1"

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
        big = base
        for k in range(1, copies):
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
        c = int(math.ceil(math.sqrt(n)))

        # Ground truth once per tier: 1% probe sample x corpus.
        probes = big.where(F.col("vec_id") % PROBE_MOD == 0).select(
            F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a")
        )
        dot = F.expr(DOT_SQL.format(a="vec_a", b="vec_b"))
        truth = (
            big.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b"))
            .crossJoin(F.broadcast(probes))
            .where(F.col("id_a") < F.col("id_b"))
            .where(F.round(dot, 4) >= THRESHOLD)
            .select("id_a", "id_b")
            .localCheckpoint(eager=True)
        )
        n_true = truth.count()
        print(f"tier {copies}x: n={n} C={c} true_pairs={n_true}", file=sys.stderr)

        configs = [
            ("ivf_fixed", lambda b: ivf_cells(b, n_centroids=c, nprobe=5), {"nprobe": 5}),
            (
                "ivf_adaptive",
                lambda b: ivf_cells(b, n_centroids=c, nprobe=adaptive_nprobe(n)),
                {"nprobe": adaptive_nprobe(n)},
            ),
        ]
        if do_imi:
            ch = imi_c_per_half(n)
            dp, dt = adaptive_imi_dials(n)
            configs += [
                (
                    "imi_fixed",
                    lambda b: imi_cells(b, c_per_half=ch, nprobe_half=4, nprobe_cells=8),
                    {"c_per_half": ch, "p": 4, "T": 8},
                ),
                (
                    "imi_adaptive",
                    lambda b: imi_cells(b, c_per_half=ch, nprobe_half=dp, nprobe_cells=dt),
                    {"c_per_half": ch, "p": dp, "T": dt},
                ),
            ]
        for dial_name, mk_cells, dial_info in configs:
            t0 = time.perf_counter()
            cell_sets = (
                mk_cells(big)
                .groupBy("vec_id")
                .agg(F.collect_set("cell").alias("cells"))
                .localCheckpoint(eager=True)
            )
            # recall: true pair is a candidate iff cell sets overlap
            hits = (
                truth.join(
                    cell_sets.select(
                        F.col("vec_id").alias("id_a"), F.col("cells").alias("ca")
                    ),
                    "id_a",
                )
                .join(
                    cell_sets.select(
                        F.col("vec_id").alias("id_b"), F.col("cells").alias("cb")
                    ),
                    "id_b",
                )
                .where(F.arrays_overlap("ca", "cb"))
                .count()
            )
            # work audit: pairs the generator would score = sum_c occ_c^2 / 2
            occ = (
                cell_sets.select(F.explode("cells").alias("cell"))
                .groupBy("cell")
                .agg(F.count(F.lit(1)).alias("o"))
                .agg(F.sum(F.expr("o * o")).alias("w"))
                .collect()[0]["w"]
            )
            secs = round(time.perf_counter() - t0, 1)
            rec = round(hits / max(n_true, 1), 4)
            results[f"{copies}x_{dial_name}"] = {
                "n": n,
                "C": c,
                **dial_info,
                "recall_pairs": rec,
                "work_pairs": int(occ // 2),
                "assign_plus_audit_sec": secs,
            }
            print(
                f"  {dial_name} {dial_info}: recall={rec}"
                f" work_pairs={occ // 2:,} ({secs}s)",
                file=sys.stderr,
            )

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
