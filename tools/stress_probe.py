"""8x stress probe (SCALE.md section 3.2): measure which operators absorb
a synthetic 8x data enlargement and which pay quadratically for it.

Usage:  python tools/stress_probe.py [query ...]

Builds 8x embeddings/documents/events tables (the sf0.1 rows unioned with
7 id-shifted copies — near-dup-saturated, the adversarial case for
candidate generation; events keep their time axis so windows densify 8x
and copies get disjoint user ids so distinct counts grow), copies the
relational tables as-is, then times each named query once at sf0.1 and
once at 8x in the same warm session (noop sink — full materialization)
and prints name, both timings, and the ratio. The default query list is
the embedding family whose scale posture SCALE.md documents. Timings go
to stdout as one JSON line; everything else stderr.

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
    "q_llm_sim_pq_rerank_baseline",
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
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    ensure_session_confs(spark)
    reg = load_all()

    os.makedirs(PROBE_DIR, exist_ok=True)

    def enlarge(table: str, id_col: str, shift_cols: dict[str, str] | None = None):
        """Union COPIES id-shifted copies of a fixture table (near-dup-
        saturated — adversarial for dedup). ``shift_cols`` maps extra
        columns to shift expressions templated on {k} and {n}."""
        df = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
        n = df.count()
        big = df
        for k in range(1, COPIES):
            cols = []
            for c in df.columns:
                if c == id_col:
                    cols.append((F.col(c) + F.lit(k * n)).alias(c))
                elif shift_cols and c in shift_cols:
                    cols.append(
                        F.expr(shift_cols[c].format(k=k, n=n)).alias(c)
                    )
                else:
                    cols.append(F.col(c))
            big = big.union(df.select(*cols))
        big.repartition(32).write.mode("overwrite").parquet(
            f"{PROBE_DIR}/{table}.parquet"
        )
        log(f"probe table {table}: {COPIES}x{n} rows")

    enlarge("embeddings", "vec_id")
    enlarge("documents", "doc_id")
    # events: keep the ts axis identical (windows stay comparably dense —
    # 8x the rows per window, the worst case for frame buffering) and give
    # copies disjoint user ids so distinct counts grow with the data.
    enlarge("events", "event_id", {"user_id": "user_id + {k} * 100000"})
    # Small relational tables referenced through read_table: copy as-is.
    import shutil

    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        src = f"{SF_DIR}/{t}.parquet"
        dst = f"{PROBE_DIR}/{t}.parquet"
        if os.path.exists(src) and not os.path.exists(dst):
            shutil.copyfile(src, dst)

    def run(name, sf):
        # noop sink: full materialization of every output column — count()
        # would let Catalyst prune unevaluated projections (e.g. window
        # columns), silently under-measuring window-only queries.
        reg[name].fn(spark, sf).write.format("noop").mode("overwrite").save()

    # Warm the session (codegen, broadcast machinery) before timing.
    run(names[0], SF_DIR)

    out = {}
    for name in names:
        t0 = time.time()
        run(name, SF_DIR)
        base = time.time() - t0
        t0 = time.time()
        run(name, PROBE_DIR)
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
