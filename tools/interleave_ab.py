#!/usr/bin/env python
"""Reverse-then-interleave A/B for the four round-15 touched-but-driver-
unconfirmed paths (VERDICT r15 task 1): q_llm_curate_pipeline,
q_llm_ann_recall_nprobe, q_llm_search_hybrid, q_llm_select_dsir.

Protocol (the 8c03dfc lesson — a sequential A-then-B sweep measures warm
state, not the change): per path, one discarded warm draw of each variant,
then ALTERNATING draws A,B,A,B,... (--pairs each), then the REVERSED
alternation B,A,B,A,... — a variant only "wins" if its draws beat the
other's in BOTH orders. Reports per-variant min/median per order block.

Variant A is always the CURRENT (optimized) tree; variant B is the
reverted round-14 form, reconstructed faithfully:
  - curate:      separate split() per column (pre-fab5141)
  - dsir:        no coalesce sentinel on the bucket key (pre-b8040bf)
  - nprobe:      fanout_repartition monkeypatched to identity (pre-f92e661)
  - hybrid:      InferFiltersFromGenerate exclusion lifted for the draw

Usage: python tools/interleave_ab.py [--pairs 4] [--paths curate,dsir,...]
"""

from __future__ import annotations

import argparse
import contextlib
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _old_curate(spark, sf_dir):
    """q_llm_curate_pipeline as of fab5141^ (split evaluated per column)."""
    from pyspark.sql import Window

    from join_example_spark.operators.dedup_prefix import prefix_filter_pairs
    from join_example_spark.operators.sampling import id_hash
    from join_example_spark.sources.readers import read_table

    docs = (
        read_table(spark, sf_dir, "documents")
        .where(F.col("source").isin("src0", "src1") & F.col("text").isNotNull())
        .select(
            "doc_id",
            "n_chars",
            F.expr("array_distinct(split(LOWER(TRIM(text)), ' '))").alias("t"),
            F.expr("size(split(LOWER(TRIM(text)), ' '))").alias("n_tok"),
        )
    )
    quality = docs.where(
        (F.col("n_chars") >= 100) & (10 * F.size("t") >= 3 * F.col("n_tok"))
    ).select("doc_id", "n_chars", "t")
    pairs = prefix_filter_pairs(quality, id_col="doc_id", toks_col="t", num=4, den=5)
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    survivors = quality.join(dropped, "doc_id", "left_anti").select(
        "doc_id", "n_chars"
    )
    tickets = survivors.select(
        "doc_id",
        "n_chars",
        F.explode(
            F.expr("sequence(1, LEAST(GREATEST(n_chars DIV 50, 1), 20))")
        ).alias("tk"),
    )
    pri = (
        tickets.withColumn("h", id_hash("(doc_id * 64 + tk)"))
        .groupBy("doc_id")
        .agg(
            F.max("n_chars").cast("bigint").alias("n_chars"),
            F.min("h").cast("bigint").alias("priority"),
        )
    )
    top = pri.orderBy("priority", "doc_id").limit(100)
    w = Window.orderBy("priority", "doc_id")
    return top.withColumn("rnk", F.row_number().over(w).cast("bigint")).select(
        "doc_id", "n_chars", "priority", "rnk"
    )


def _old_dsir(spark, sf_dir):
    """q_llm_select_dsir as of b8040bf^ (no coalesce sentinel on f)."""
    from pyspark.sql import Window

    from join_example_spark.operators.sampling import str_hash
    from join_example_spark.queries.llm_training import _DSIR_BUCKETS
    from join_example_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    hashed = docs.select(
        "doc_id",
        "lang",
        F.explode(F.expr("split(LOWER(TRIM(text)), ' ')")).alias("tok"),
    ).select("doc_id", "lang", (str_hash("tok") % _DSIR_BUCKETS).alias("f"))
    stats = hashed.groupBy("f").agg(
        (F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)) + 1)
        .cast("bigint")
        .alias("ct"),
        (F.count(F.lit(1)) + 1).cast("bigint").alias("cr"),
    )
    w_all = Window.partitionBy()
    stats_t = stats.select(
        "f",
        "ct",
        "cr",
        F.sum("ct").over(w_all).cast("bigint").alias("nt"),
        F.sum("cr").over(w_all).cast("bigint").alias("nr"),
    )
    scored = (
        hashed.join(F.broadcast(stats_t), "f")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_toks"),
            F.sum("ct").cast("bigint").alias("sum_target"),
            F.sum("cr").cast("bigint").alias("sum_raw"),
            F.max("nt").alias("nt"),
            F.max("nr").alias("nr"),
        )
        .select(
            "doc_id",
            "n_toks",
            "sum_target",
            "sum_raw",
            (
                (F.col("sum_target") * F.col("nr")).cast("double")
                / (F.col("sum_raw") * F.col("nt")).cast("double")
            ).alias("score"),
        )
    )
    return scored.orderBy(F.col("score").desc(), "doc_id").limit(100)


@contextlib.contextmanager
def _no_fanout():
    """Monkeypatch the fanout helper to identity in the similarity module."""
    import join_example_spark.queries.llm_similarity as sim

    real = sim.fanout_repartition
    sim.fanout_repartition = lambda df, **kw: df
    try:
        yield
    finally:
        sim.fanout_repartition = real


@contextlib.contextmanager
def _no_exclusion(spark):
    """Lift the InferFiltersFromGenerate exclusion for the draw (and stop
    ensure_session_confs re-applying it mid-plan-build)."""
    from join_example_spark import conf as conf_mod

    key = "spark.sql.optimizer.excludedRules"
    saved = conf_mod.SESSION_CONFS.pop(key, None)
    spark.conf.set(key, "")
    try:
        yield
    finally:
        if saved is not None:
            conf_mod.SESSION_CONFS[key] = saved
            spark.conf.set(key, saved)


@contextlib.contextmanager
def _nothing(*_a):
    yield


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--paths", default="curate,dsir,nprobe,hybrid")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from join_example_spark.conf import build_local_session
    from join_example_spark.registry import load_all

    spark = build_local_session(
        app_name="interleave-ab", cores=args.cores, shuffle_partitions=int(args.cores)
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    # (name, optimized_fn, reverted_fn, reverted_ctx)
    paths = {
        "curate": ("q_llm_curate_pipeline", reg["q_llm_curate_pipeline"].fn,
                   _old_curate, _nothing),
        "dsir": ("q_llm_select_dsir", reg["q_llm_select_dsir"].fn,
                 _old_dsir, _nothing),
        "nprobe": ("q_llm_ann_recall_nprobe", reg["q_llm_ann_recall_nprobe"].fn,
                   reg["q_llm_ann_recall_nprobe"].fn, lambda *_: _no_fanout()),
        "hybrid": ("q_llm_search_hybrid", reg["q_llm_search_hybrid"].fn,
                   reg["q_llm_search_hybrid"].fn, lambda *_: _no_exclusion(spark)),
    }

    def draw(fn, ctx):
        with ctx(spark):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - t0, 3)

    for key in args.paths.split(","):
        qname, fa, fb, ctx_b = paths[key]
        spark.sparkContext.setJobDescription(f"ab {qname}")
        # discard one warm draw each
        draw(fa, _nothing), draw(fb, ctx_b)
        blocks = {}
        for order in ("AB", "BA"):
            res = {"A": [], "B": []}
            for _ in range(args.pairs):
                for v in order:
                    res[v].append(draw(fa, _nothing) if v == "A"
                                  else draw(fb, ctx_b))
            blocks[order] = res
            print(
                f"{qname} [{order}] "
                f"A(optimized) min={min(res['A'])} med={statistics.median(res['A'])} "
                f"B(reverted) min={min(res['B'])} med={statistics.median(res['B'])} "
                f"draws A={res['A']} B={res['B']}",
                flush=True,
            )
        a_all = blocks["AB"]["A"] + blocks["BA"]["A"]
        b_all = blocks["AB"]["B"] + blocks["BA"]["B"]
        both_orders = (
            statistics.median(blocks["AB"]["A"]) < statistics.median(blocks["AB"]["B"])
            and statistics.median(blocks["BA"]["A"]) < statistics.median(blocks["BA"]["B"])
        )
        print(
            f"{qname} VERDICT: A med={statistics.median(a_all)} "
            f"B med={statistics.median(b_all)} "
            f"A_wins_both_orders={both_orders}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
