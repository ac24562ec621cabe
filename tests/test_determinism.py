"""Partition-independence regression: results must not depend on the
physical parallelism. The full sweep (round 8: all 231 oracle queries —
trio re-declaration, one-job CC and fold-once MinHash included — under
local[5]/7-shuffle-partitions, 0 mismatches in 222 s — reproducible
via tools/sweep_partition_independence.py) was run out-of-band; this fast
version re-checks the most partition-sensitive query classes — float
aggregation merge order, collect_list order, LIMIT boundaries, window
ranking — with an odd shuffle-partition count at runtime."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_utils import run_compare

SENSITIVE = [
    "q_agg_group",        # decimal-accumulated sums under different merge trees
    "q_agg_stats",        # one-pass moment accumulators
    "q_agg_string_agg",   # collect_list order
    "q_sort_limit",       # LIMIT boundary ties
    "q_limit_offset",     # pagination boundary
    "q_win_topk_per_group",  # rank ties
    "q_llm_sim_topk",     # float dot-product fold + rank ties
    "q_llm_dedup_cluster",  # iterative fixpoint under different partitioning
    "q_multimodal_decode",  # Arrow batch boundaries differ with partitioning
    # round-2 additions
    "q_llm_dedup_keep_best",  # star-contraction fixpoint + window ties
    "q_recursive_chain",      # recursive-CTE frontier joins per step
    "q_win_share",            # whole-frame window over decimal sums
    "q_llm_ann_recall",       # two float-fold rank paths joined
    "q_agg_mode",             # count-rank ties under different merge trees
    # TPC-H completion + entropy (round 2)
    "q_tpch_q1",              # eight decimal aggregates under different merge trees
    "q_tpch_q2",              # double-equality min-join + rounded-order LIMIT ties
    "q_tpch_q15",             # MAX-equality scalar subquery on decimal-bridged sums
    "q_llm_char_entropy",     # decimal-space fold of IEEE ln() terms
    # round-3 additions
    "q_llm_dedup_semantic",   # star-contraction fixpoint over cosine edges
    "q_llm_embed_quantize",   # raw-double folds (no ROUND) must survive partitioning
    "q_llm_dedup_fuzzy",      # mintok second blocking key + levenshtein verify
    "q_llm_quality_gate",     # ntile bucket boundaries under different partitioning
    "q_llm_bigram_surprisal", # decimal-bridged ln fold + checkpointed global counts
    "q_llm_dedup_incremental",  # two semi-join verdict paths merged by left joins
    # round-4 additions
    "q_llm_pq_quantize",        # MIN(STRUCT) argmin + decimal error sum under merge trees
    "q_llm_sim_pq_rerank_baseline",  # two-stage shortlist boundary + rank ties
    "q_llm_sim_ivfpq",          # IVF cells x PQ LUT x shortlist x rerank composition
    "q_llm_decontaminate_semantic",  # MAX(STRUCT) best-match under different merge trees
    "q_llm_dedup_semantic_incr",     # left-join verdict merge + struct-max tiebreak
    "q_llm_mix_temperature",    # histogram partial-agg + IEEE weight derivation
    "q_llm_source_token_cap",   # window cumsum prefix under different partitioning
    "q_agg_approx_percentile",  # exact-regime sketch merge under different trees
    "q_agg_approx_distinct",    # HLL merge + exact anchor under different trees
    "q_win_sliding_distinct",   # collect_list range-frame under different partitioning
    "q_win_sliding_distinct_hll",  # windowed HLL union merge under different partitioning
    # round-5 additions
    "q_llm_split_leakage_safe",  # identity contraction + CC labels + cluster hash
    "q_llm_dedup_semantic_imi",  # product-cell candidates + contraction fixpoint
    "q_llm_imi_recall",          # two-codebook assignment + pair-hit join folds
    "q_llm_dedup_substring",     # window-hash histogram + per-doc rollup merge
    "q_audience_overlap_hll",    # HLL IE over per-type sketch merge trees
    "q_graph_pagerank",          # 3 chained decimal-bridged iterations + rank ties
    "q_llm_sim_imipq",           # IMI cells x PQ LUT x shortlist x rerank composition
    "q_ts_sim_search",           # frame-ordered collect_list + integer SSE + top-k ties
    "q_ts_rolling_corr",         # BIGINT moment window sums + one IEEE corr expression
    "q_dq_stats_drift",          # trailing decimal sums + ratio thresholds at boundaries
]


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_stable_under_odd_partitioning(spark, name):
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, "7")
    try:
        problems = run_compare(spark, name, SF_SMOKE)
    finally:
        spark.conf.set(key, old)
    assert not problems, problems
