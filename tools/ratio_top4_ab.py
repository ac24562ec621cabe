"""Round-12 A/B (VERDICT r11 task 4): can the ratio family recover the
6.7->8.2 s post-clamp regression by replacing _top4_den's window plan
(row_number over (part) + filter rn<=4 + pivot-agg) with a single-pass
groupBy collect_list + comparator array_sort + slice(4)?

Method: 3 alternating draws per variant of q_llm_mine_margin_ratio_ivf at
sf0.1 in ONE session (warmed), plus a bit-identity check of the candidate
_top4_den variant against the shipped one on the real scored pair set at
sf0.01. Result is recorded in SCALE.md §3.17 either way (the round-11
plan-fusing A/B was noise, so a null result here is expected and fine).

Usage: python tools/ratio_top4_ab.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _top4_den_agg(fwd: DataFrame, part_col: str, tie_col: str, out_col: str) -> DataFrame:
    """One-pass candidate: same (sim DESC, tie ASC) top-4 slots, same
    fixed-order clamped sum / 8 — bit-identity asserted below."""
    cmp = (
        "(a, b) -> CASE WHEN a.sim > b.sim THEN -1 WHEN a.sim < b.sim THEN 1 "
        f"WHEN a.{tie_col} < b.{tie_col} THEN -1 "
        f"WHEN a.{tie_col} > b.{tie_col} THEN 1 ELSE 0 END"
    )
    g = fwd.groupBy(part_col).agg(
        F.slice(
            F.expr(f"array_sort(collect_list(struct(sim, {tie_col})), {cmp})"),
            1,
            4,
        ).alias("t4")
    )

    def slot(i: int):
        # try_element_at: groups with < 4 pairs have short arrays (missing
        # slots are 0, same as the shipped variant's coalesce)
        s = F.try_element_at(F.col("t4"), F.lit(i)).getField("sim")
        return F.greatest(F.coalesce(s, F.lit(0.0)), F.lit(0.0))

    den = (slot(1) + slot(2) + slot(3) + slot(4)) / F.lit(8.0)
    return g.select(part_col, den.alias(out_col))


def main() -> None:
    from join_example_spark.conf import build_local_session
    import join_example_spark.queries.llm_similarity as sim

    spark = build_local_session(
        app_name="ratio-top4-ab", cores="32", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    # --- bit-identity check on the real screened pair set at sf0.01 ---
    import math

    from join_example_spark.operators.similarity import (
        DOT_SQL,
        _by_cell,
        ivf_cells,
        margin_screen_dials,
    )
    from join_example_spark.sources.readers import read_table

    emb = read_table(spark, "/root/testdata/sf0.01", "embeddings")
    n = emb.count()
    q_assign, nprobe = margin_screen_dials(n)
    corpus = (
        ivf_cells(emb, int(math.ceil(math.sqrt(n))), nprobe=q_assign)
        .where(F.col("vec_id") % 100 != 0)
        .select(F.col("vec_id").alias("cand_id"), "cell", F.col("embedding").alias("cv"))
    )
    probes = (
        ivf_cells(emb, int(math.ceil(math.sqrt(n))), nprobe=nprobe)
        .where(F.col("vec_id") % 100 == 0)
        .select(F.col("vec_id").alias("probe_id"), "cell", F.col("embedding").alias("pv"))
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
    for part, tie in (("probe_id", "cand_id"), ("cand_id", "probe_id")):
        a = {r[0]: r[1] for r in sim._top4_den(scored, part, tie, "d").collect()}
        b = {r[0]: r[1] for r in _top4_den_agg(scored, part, tie, "d").collect()}
        assert a == b, f"bit-identity FAILED for part={part}: {len(a)} vs {len(b)} keys"
        print(f"bit-identity OK part={part} ({len(a)} groups)", file=sys.stderr)

    # --- alternating timed draws at sf0.1 ---
    orig = sim._top4_den
    reg_fn = sim.q_llm_mine_margin_ratio_ivf

    def run_once() -> float:
        t0 = time.perf_counter()
        reg_fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # warm both variants once (Janino)
    sim._top4_den = orig
    run_once()
    sim._top4_den = _top4_den_agg
    run_once()

    draws = {"window": [], "agg": []}
    for _ in range(3):
        sim._top4_den = orig
        draws["window"].append(run_once())
        sim._top4_den = _top4_den_agg
        draws["agg"].append(run_once())
    sim._top4_den = orig

    for k, v in draws.items():
        print(f"{k}: draws={v} median={statistics.median(v)}")
    spark.stop()


if __name__ == "__main__":
    main()
