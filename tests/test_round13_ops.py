"""Round-13 pins.

1. Planted-skew equivalence for the two-pass q_llm_domain_cap plan
   (VERDICT r12 task 5): the salted partial-top-K + hash-aggregate-totals
   plan must be row-identical to the naive single-window semantics on an
   adversarial host distribution (one host holding ~90% of the corpus,
   heavy n_chars ties, a below-cap host), across salt counts including the
   degenerate salts=1.
2. URL-canonicalizer regression pins for the ADVICE r12 escape bug live in
   tests/test_round12_ops.py (planted wwwx.com / indexZhtml cases).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def _naive_domain_cap(hosts, cap: int):
    """The single-window reference semantics (the oracle's shape)."""
    w = Window.partitionBy("host").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    wc = Window.partitionBy("host")
    return (
        hosts.withColumn("host_rank", F.row_number().over(w))
        .withColumn("host_total", F.count(F.lit(1)).over(wc))
        .where(F.col("host_rank") <= cap)
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "host",
            F.col("host_rank").cast("bigint").alias("host_rank"),
            F.col("host_total").cast("bigint").alias("host_total"),
        )
    )


def _planted_skew_df(spark):
    # big.example: 900 rows — the pathological host the cap exists to bound;
    # n_chars = doc_id % 7 plants massive ties so the doc_id tiebreak is
    # load-bearing. tiny.example: 3 rows (below cap — rank must not pad).
    # ties.example: all n_chars equal (pure-tiebreak ordering).
    rows = [(i, i % 7, "big.example") for i in range(900)]
    rows += [(1000 + i, 50 + i, "tiny.example") for i in range(3)]
    rows += [(2000 + i, 5, "ties.example") for i in range(40)]
    return spark.createDataFrame(rows, "doc_id bigint, n_chars int, host string")


def test_domain_cap_planted_skew_equivalence(spark):
    from join_example_spark.queries.llm_dedup import domain_cap_plan

    hosts = _planted_skew_df(spark)
    want = sorted(map(tuple, _naive_domain_cap(hosts, cap=12).collect()))
    assert len(want) == 12 + 3 + 12
    for salts in (1, 5, 32):
        got = sorted(map(tuple, domain_cap_plan(hosts, cap=12, salts=salts).collect()))
        assert got == want, f"salts={salts} diverged from single-window semantics"


def test_table_row_count_footer_cache():
    """table_row_count reads parquet FOOTER metadata (exact), and caches:
    a second call for the same (sf_dir, table) must not re-open the file."""
    import pyarrow.parquet as pq

    from join_example_spark.sources import readers

    readers._ROW_COUNT_CACHE.clear()
    want = pq.read_metadata("/root/testdata/sf0.001/embeddings.parquet").num_rows
    assert readers.table_row_count("/root/testdata/sf0.001", "embeddings") == want
    # trailing-slash normalization shares the cache entry
    assert ("/root/testdata/sf0.001", "embeddings") in readers._ROW_COUNT_CACHE
    orig = pq.read_metadata
    try:
        def boom(*a, **k):
            raise AssertionError("cache miss: re-read footer")
        pq.read_metadata = boom
        assert readers.table_row_count("/root/testdata/sf0.001/", "embeddings") == want
    finally:
        pq.read_metadata = orig


def test_ann_plan_build_runs_no_scan_jobs(spark, monkeypatch):
    """Round-13 pin (VERDICT r12 task 4): the ANN-family index-sizing dials
    come from cached footer metadata — BUILDING these plans must launch
    zero DataFrame.count() actions (previously each execution paid a
    full-scan count job)."""
    from pyspark.sql import DataFrame

    from join_example_spark.registry import load_full

    def boom(self):
        raise AssertionError("plan-build ran a DataFrame.count() action")

    monkeypatch.setattr(DataFrame, "count", boom)
    full = load_full()
    for name in (
        "q_llm_ann_recall_nprobe",
        "q_llm_imi_recall",
        "q_llm_sim_pq_rerank_baseline",
        "q_llm_sim_ivfpq",
        "q_llm_embed_outliers",
        "q_llm_mine_margin_ivf",
    ):
        df = full[name].fn(spark, "/root/testdata/sf0.001")
        assert df.columns  # plan built, no action ran


def test_domain_cap_salt_stage_bounds_partitions(spark):
    """The property that makes the plan skew-safe: after the salted stage,
    no (host) group exceeds salts*cap rows — the final window never sees
    the raw host multiplicity."""
    from join_example_spark.queries.llm_dedup import domain_cap_plan  # noqa: F401

    hosts = _planted_skew_df(spark)
    salts, cap = 8, 12
    w_salt = Window.partitionBy("host", "salt").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    survivors = (
        hosts.withColumn("salt", F.pmod(F.col("doc_id"), F.lit(salts)).cast("int"))
        .withColumn("salt_rank", F.row_number().over(w_salt))
        .where(F.col("salt_rank") <= cap)
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_host = {r["host"]: r["n"] for r in survivors}
    assert by_host["big.example"] <= salts * cap
    assert by_host["tiny.example"] == 3
