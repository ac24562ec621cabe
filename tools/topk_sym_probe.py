"""Does the margin family's screen SYMMETRIZATION (corpus multi-assign q
with the probe dial cut to match volume) transfer to plain top-k search?

The round-10 margin result (SCALE §3.13): at matched candidate volume,
(q=4, p=20) lifts 64x-tier accept recall 0.656 -> 0.922 over the
asymmetric (q=1, p=40). Standard IVF search is exactly as asymmetric
(single-home-cell corpus, multi-probe queries), so the same coverage
argument predicts a top-k recall lift at matched volume. This probe
measures it directly: top-1 and top-3 recall of the screened candidate
set against the exact flat truth, per (q, p) combo.

Usage:  python tools/topk_sym_probe.py
Env:    SPARK_GRAFT_PROBE_COPIES=64
        SPARK_GRAFT_TOPK_GRID="1:40,2:20,4:20,3:27,1:80"
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
GRID = [
    tuple(int(v) for v in combo.split(":"))
    for combo in os.environ.get(
        "SPARK_GRAFT_TOPK_GRID", "1:40,2:20,4:20,3:27,1:80"
    ).split(",")
]
K = 3


def main() -> None:
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from join_example_spark.conf import ensure_session_confs
    from join_example_spark.operators.similarity import (
        DOT_SQL,
        _by_cell,
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

    def topk(scored, dedup):
        if dedup:
            scored = scored.groupBy("probe_id", "cand_id").agg(
                F.max("sim").alias("sim")
            )
        w = Window.partitionBy("probe_id").orderBy(
            F.col("sim").desc(), F.col("cand_id")
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= K)
            .groupBy("probe_id")
            .agg(F.collect_list(F.struct("rn", "cand_id")).alias("tops"))
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
        probes_f = big.where(F.col("vec_id") % 50 == 0).select(
            F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pv")
        )
        corpus_f = big.where(F.col("vec_id") % 50 != 0).select(
            F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv")
        )
        t0 = time.perf_counter()
        truth_rows = topk(
            corpus_f.crossJoin(F.broadcast(probes_f)).select(
                "probe_id",
                "cand_id",
                F.round(F.expr(DOT_SQL.format(a="pv", b="cv")), 4).alias("sim"),
            ),
            dedup=False,
        )
        flat_sec = round(time.perf_counter() - t0, 1)
        truth = {
            r["probe_id"]: {t["rn"]: t["cand_id"] for t in r["tops"]}
            for r in truth_rows
        }
        print(
            f"tier {copies}x: n={n} C={n_cent} flat {flat_sec}s "
            f"{len(truth)} probes",
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
            got_rows = topk(
                _by_cell(probes)
                .join(_by_cell(corpus), "cell")
                .select(
                    "probe_id",
                    "cand_id",
                    F.round(F.expr(DOT_SQL.format(a="pv", b="cv")), 4).alias(
                        "sim"
                    ),
                ),
                dedup=q > 1,
            )
            secs = round(time.perf_counter() - t0, 1)
            got = {
                r["probe_id"]: {t["rn"]: t["cand_id"] for t in r["tops"]}
                for r in got_rows
            }
            hit1 = 0
            hitk_num = 0
            hitk_den = 0
            for pid, tr in truth.items():
                g = got.get(pid, {})
                if g.get(1) == tr.get(1):
                    hit1 += 1
                tset = {c for c in tr.values()}
                gset = {c for c in g.values()}
                hitk_num += len(tset & gset)
                hitk_den += len(tset)
            key = f"{copies}x_q{q}_p{p}"
            results[key] = {
                "n": n,
                "q": q,
                "p": p,
                "volume_qp": q * p,
                "sec": secs,
                "recall_at_1": round(hit1 / max(len(truth), 1), 4),
                "recall_at_3": round(hitk_num / max(hitk_den, 1), 4),
            }
            print(f"  q={q} p={p}: {results[key]}", file=sys.stderr)

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
