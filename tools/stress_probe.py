"""8x stress probe (SCALE.md section 3.2): measure which operators absorb
a synthetic 8x data enlargement and which pay quadratically for it.

Usage:  python tools/stress_probe.py [query ...]

Builds an 8x embeddings table (the sf0.1 vectors unioned with 7 id-shifted
copies — near-dup-saturated, the adversarial case for candidate
generation), then times each named query once at sf0.1 and once at 8x in
the same warm session and prints name, both timings, and the ratio. The
default query list is the embedding family whose scale posture SCALE.md
documents. Timings go to stdout as one JSON line; everything else stderr.

This is the committed version of the ad-hoc probe used in rounds 3-4 so
the SCALE.md numbers stay reproducible.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "q_llm_pq_quantize",
    "q_llm_sim_pq_adc",
    "q_llm_sim_pq_rerank",
    "q_llm_decontaminate_semantic",
    "q_llm_dedup_semantic",
    "q_llm_dedup_semantic_ivf",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PROBE_DIR = os.environ.get("SPARK_GRAFT_PROBE_DIR", "/tmp/spark_graft_probe8x")
COPIES = 8


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from join_example_spark.conf import ensure_session_confs
    from join_example_spark.registry import load_all

    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    ensure_session_confs(spark)
    reg = load_all()

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = emb.count()
    big = emb
    for k in range(1, COPIES):
        big = big.union(
            emb.select(
                (F.col("vec_id") + F.lit(k * n)).alias("vec_id"),
                "embedding",
                "label",
            )
        )
    os.makedirs(PROBE_DIR, exist_ok=True)
    big.repartition(32).write.mode("overwrite").parquet(
        f"{PROBE_DIR}/embeddings.parquet"
    )
    log(f"probe table: {COPIES}x{n} vectors at {PROBE_DIR}")

    # Warm the session (codegen, broadcast machinery) before timing.
    reg[names[0]].fn(spark, SF_DIR).count()

    out = {}
    for name in names:
        t0 = time.time()
        reg[name].fn(spark, SF_DIR).count()
        base = time.time() - t0
        t0 = time.time()
        reg[name].fn(spark, PROBE_DIR).count()
        probed = time.time() - t0
        out[name] = {
            "sf0.1_sec": round(base, 2),
            "8x_sec": round(probed, 2),
            "ratio": round(probed / base, 2) if base > 0 else None,
        }
        log(f"{name}: {base:.2f}s -> {probed:.2f}s ({probed / base:.1f}x)")
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
