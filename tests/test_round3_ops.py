"""Unit/property tests for the round-3 operators (the oracle mirror covers
hash-parity; these pin the algebraic invariants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from join_example_spark.registry import load_all
from join_example_spark.sources.readers import read_table
from tests.conftest import SF_SMOKE

_REG = load_all()


def test_semantic_clusters_partition_the_embeddings(spark):
    # Every vector lands in exactly one cluster; sizes sum to the table;
    # the elected representative is a true member with the maximum L2 norm
    # (vec_id tiebreak) — checked against an independently-computed
    # labeling (the O(diameter) min-label formulation, not star) over the
    # SAME edge set the default query declares (multi-probe IVF candidates
    # + exact verify, since the round-4 reroute away from exact all-pairs).
    import math

    from join_example_spark.operators.graph import connected_components
    from join_example_spark.operators.similarity import DOT_SQL, ivf_candidate_pairs

    out = _REG["q_llm_dedup_semantic"].fn(spark, SF_SMOKE)
    emb = read_table(spark, SF_SMOKE, "embeddings")
    n_vecs = emb.count()
    agg = out.agg(
        F.sum("cluster_size").alias("total"),
        F.count(F.lit(1)).alias("n_clusters"),
        F.min("cluster_size").alias("min_size"),
    ).collect()[0]
    assert agg.total == n_vecs
    assert 1 <= agg.n_clusters <= n_vecs
    assert agg.min_size >= 1

    dot = F.expr(DOT_SQL.format(a="vec_a", b="vec_b"))
    pairs = (
        ivf_candidate_pairs(
            emb, n_centroids=int(math.ceil(math.sqrt(n_vecs))), nprobe=5
        )
        .withColumn("sim", F.round(dot, 4))
        .where(F.col("sim") >= 0.35)
    )
    labels = connected_components(
        emb.select("vec_id"),
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        id_col="vec_id",
    ).select(F.col("id").alias("vec_id"), F.col("cluster_id").alias("want_cluster"))
    norm = F.expr(
        "sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
        " 0D, (acc, v) -> acc + v))"
    )
    members = labels.join(emb.select("vec_id", norm.alias("nrm")), "vec_id")
    best = {
        r.want_cluster: (r.vec_id, r.nrm)
        for r in members.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("want_cluster")
                .orderBy(F.col("nrm").desc(), F.col("vec_id"))
            ),
        ).where(F.col("rn") == 1).collect()
    }
    for r in out.collect():
        assert r.cluster_id in best
        assert best[r.cluster_id][0] == r.rep_vec_id, (
            r.cluster_id, best[r.cluster_id], r.rep_vec_id
        )


def test_block_audit_refined_scheme_never_coarser(spark):
    rows = {r.scheme: r for r in _REG["q_llm_dedup_block_audit"].fn(spark, SF_SMOKE).collect()}
    coarse, fine = rows["lang_len"], rows["lang_len_mintok"]
    # Adding a key can only split blocks: more (or equal) blocks, smaller
    # (or equal) max block, and strictly fewer-or-equal candidate pairs.
    assert fine.n_blocks >= coarse.n_blocks
    assert fine.max_block <= coarse.max_block
    assert fine.candidate_pairs <= coarse.candidate_pairs
    assert coarse.max_block >= 1 and coarse.candidate_pairs >= 0


def test_incremental_dedup_covers_batch_and_agrees_with_exact(spark):
    out = _REG["q_llm_dedup_incremental"].fn(spark, SF_SMOKE)
    docs = read_table(spark, SF_SMOKE, "documents")
    batch_n = docs.where(F.col("source") == "src1").count()
    # Every batch doc gets exactly one verdict.
    assert out.count() == batch_n
    assert out.select("doc_id").distinct().count() == batch_n
    # dup_exact verdicts must have a true content-hash twin in the corpus.
    h = F.md5(F.lower(F.trim(F.col("text"))))
    corpus_hashes = {
        r.h for r in docs.where(F.col("source") == "src0").select(h.alias("h")).collect()
    }
    batch_hash = {
        r.doc_id: r.h
        for r in docs.where(F.col("source") == "src1")
        .select("doc_id", h.alias("h"))
        .collect()
    }
    for r in out.collect():
        if r.status == "dup_exact":
            assert batch_hash[r.doc_id] in corpus_hashes
        elif r.status == "kept":
            assert batch_hash[r.doc_id] not in corpus_hashes


def test_simhash_exact_banding_has_full_recall_within_radius(spark):
    """Pigeonhole guarantee: the banded candidate join must recover EVERY
    pair within hamming radius 3 — verified against a DuckDB brute-force
    (no banding) over independently-computed signatures."""
    from tests.oracle_utils import duckdb_connection

    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in _REG["q_llm_dedup_simhash_exact"].fn(spark, SF_SMOKE).collect()
    }
    con = duckdb_connection(SF_SMOKE)
    try:
        brute = con.sql("""
WITH toks AS (
    SELECT doc_id, list_distinct(str_split(LOWER(TRIM(text)), ' ')) AS toks
    FROM documents WHERE source = 'src0' AND LEN(TRIM(text)) > 0
), hashed AS (
    SELECT doc_id,
           list_transform(toks,
             t -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(str_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
                  (acc, b) -> (acc * 31 + b) % 1000003)) AS th
    FROM toks
), sigs AS (
    SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(generate_series(0, 15),
               i -> CASE WHEN list_aggregate(list_transform(th,
                        h -> CASE WHEN (h // CAST(pow(2, i) AS BIGINT)) % 2 = 1
                             THEN 1 ELSE -1 END), 'sum') > 0
                    THEN CAST(pow(2, i) AS BIGINT) ELSE 0 END)),
             (a, b) -> a + b) AS sig
    FROM hashed
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(CAST(xor(a.sig, b.sig) AS BIT)) AS BIGINT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(CAST(xor(a.sig, b.sig) AS BIT)) <= 3
""").fetchall()
    finally:
        con.close()
    want = {(r[0], r[1], r[2]) for r in brute}
    assert got == want, (
        f"banding recall broken: missing={want - got} extra={got - want}"
    )


def test_quality_gate_keeps_top_three_quartiles_per_lang(spark):
    out = _REG["q_llm_quality_gate"].fn(spark, SF_SMOKE)
    docs = (
        read_table(spark, SF_SMOKE, "documents")
        .where(F.col("text").isNotNull() & (F.length(F.trim("text")) > 0))
    )
    per_lang_total = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    per_lang_kept = {r.lang: r.n for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, total in per_lang_total.items():
        kept = per_lang_kept.get(lang, 0)
        # ntile(4) drops exactly the first bucket: ceil/floor arithmetic
        # puts total - ceil(total/4) .. total - floor(total/4) in keep range.
        assert total - (total // 4 + (1 if total % 4 else 0)) <= kept <= total - total // 4
    # No kept quartile is 1, and quartiles are within range.
    qs = {r.quartile for r in out.select("quartile").distinct().collect()}
    assert qs <= {2, 3, 4}


def test_embed_quantize_invariants(spark):
    rows = _REG["q_llm_embed_quantize"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # int8 range by construction (scale = max|x|/127).
        assert -127 <= r.q_min <= r.q_max <= 127
        # Reconstruction error bounded by half a quantization step ...
        # which equals scale/2; scale <= max|x|/127 so err is tiny vs unit
        # vectors. Loose sanity bound: well under one step of 2/127.
        assert 0.0 <= r.max_abs_err < 2.0 / 127.0
        # Dequantized vector still points the same way.
        assert r.cos_orig_deq is None or r.cos_orig_deq > 0.999
