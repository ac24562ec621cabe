"""Recall/cost sweep of the NSW graph-ANN dials at rotation-enlarged
distinct tiers — the committed, reproducible protocol behind the frontier
tables in operators/ann_graph.py (VERDICT r13 task 6: the 16k rows came
from a one-off probe; this pins the measurement as a tool, the
margin_rulec_sweep.py idiom).

Usage:  python tools/nsw_dial_sweep.py                 # 1x and 8x tiers
Env:    SPARK_GRAFT_NSW_TIERS=1,8        # corpus multipliers over the
                                         # sf0.1 embeddings (2000 rows;
                                         # 8x = the 16k DISTINCT tier)
        SPARK_GRAFT_NSW_DIALS="16,3,32,8;24,4,64,12"
                                         # explicit (degree,nprobe,beam,
                                         # rounds) configs; default = the
                                         # docstring frontier rows
        SPARK_GRAFT_NSW_ADAPTIVE=0       # set to 0 to skip the
                                         # adaptive_nsw_dials(n) row
                                         # (measured by default)

Protocol (matches the round-13 one-off probe exactly): corpus tiers are
cyclic-rotation isometries of the sf0.1 embeddings (rotation never changes
norms or the sim distribution; ids offset per copy, so every tier is
DISTINCT vectors); probes are ``vec_id % max(100, n // 50) = 0`` — 20
probes at the 2k tier (the operator's default split), 50 at 16k; truth is
the exact flat scan's top-3 per probe under the family (sim DESC, id ASC)
total order; recall = |truth ∩ search| / |truth|. Build and search are
timed separately (the edge table is materialized between them). The
pipeline is deterministic end to end, so printed recalls are exact values,
not samples.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TIERS = [int(x) for x in os.environ.get("SPARK_GRAFT_NSW_TIERS", "1,8").split(",")]
DIALS = [
    tuple(int(v) for v in cfg.split(","))
    for cfg in os.environ.get(
        "SPARK_GRAFT_NSW_DIALS", "16,3,32,8;24,4,64,12"
    ).split(";")
    if cfg
]
DO_ADAPTIVE = os.environ.get("SPARK_GRAFT_NSW_ADAPTIVE", "1") == "1"
EMB_DIM = 64  # pinned by tests/test_fixture_drift.py


def rotation_tier(base, copies: int, n0: int, dim: int = EMB_DIM):
    """Enlarge an embedding corpus ``copies``-fold with cyclic-rotation
    isometries (never identity), offsetting ids per copy — every tier is
    DISTINCT vectors with the same norm/sim distribution. Shared by this
    sweep and the two-tier recall tests (tests/test_round14_ops.py)."""
    from pyspark.sql import functions as F

    big = base
    for k in range(1, copies):
        r = k % (dim - 1) + 1
        big = big.union(
            base.select(
                (F.col("vec_id") + F.lit(k * n0)).alias("vec_id"),
                F.expr(
                    f"concat(slice(embedding, {r + 1}, {dim - r}),"
                    f" slice(embedding, 1, {r}))"
                ).alias("embedding"),
                F.col("label"),
            )
        )
    return big


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from join_example_spark.conf import ensure_session_confs
    from join_example_spark.operators.ann_graph import knn_graph, nsw_search
    from join_example_spark.operators.similarity import cosine_topk

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

    for copies in TIERS:
        big = rotation_tier(base, copies, n0)
        big = big.repartition(32).localCheckpoint(eager=True)
        n = big.count()
        nc = int(math.ceil(math.sqrt(n)))
        probe_pred = f"vec_id % {max(100, n // 50)} = 0"

        one = big.withColumn("one", F.lit(1))
        truth = (
            cosine_topk(one, k=3, block_col="one", probe_pred=probe_pred)
            .select("probe_id", "cand_id")
            .localCheckpoint(eager=True)
        )
        n_truth = truth.count()
        print(
            f"tier {copies}x: n={n} C={nc} probes={n_truth // 3}"
            f" truth_rows={n_truth}",
            file=sys.stderr,
        )

        dials = list(DIALS)
        labels = [f"fixed{cfg}" for cfg in dials]
        if DO_ADAPTIVE:
            try:
                from join_example_spark.operators.ann_graph import (
                    adaptive_nsw_dials,
                )

                cfg = adaptive_nsw_dials(n)
                dials.append(cfg)
                labels.append(f"adaptive{cfg}")
            except ImportError:
                print("adaptive_nsw_dials not shipped yet; skipping",
                      file=sys.stderr)

        for label, (degree, nprobe, beam, rounds) in zip(labels, dials):
            t0 = time.perf_counter()
            edges = knn_graph(
                big, degree=degree, n_centroids=nc, nprobe=nprobe
            ).localCheckpoint(eager=True)
            n_edges = edges.count()
            build_s = round(time.perf_counter() - t0, 1)
            t0 = time.perf_counter()
            got = (
                nsw_search(
                    big, edges, k=3, beam=beam, rounds=rounds,
                    probe_pred=probe_pred,
                )
                .select("probe_id", "cand_id")
                .localCheckpoint(eager=True)
            )
            got.count()
            search_s = round(time.perf_counter() - t0, 1)
            hits = truth.join(got, ["probe_id", "cand_id"]).count()
            rec = round(hits / max(n_truth, 1), 4)
            results[f"{copies}x_{label}"] = {
                "n": n,
                "degree": degree,
                "nprobe": nprobe,
                "beam": beam,
                "rounds": rounds,
                "recall_top3": rec,
                "n_edges": n_edges,
                "build_sec": build_s,
                "search_sec": search_s,
            }
            print(
                f"  {label}: recall={rec} edges={n_edges:,}"
                f" build={build_s}s search={search_s}s",
                file=sys.stderr,
            )

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
