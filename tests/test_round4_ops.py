"""Round-4 pins. The oracle mirror covers hash parity; these keep
deliberate semantic trades, quality floors, and failure-mode guards
visible:

- the fuzzy-dedup mintok recall trade (round-3 ADVICE item 1);
- PQ invariants (code bounds, base-256 packing, self-quantization) and
  the two-stage shortlist's exact-top-1 coverage at BOTH corpus sizes;
- semantic decontamination's no-false-positives + recall floor;
- temperature mixing's weight algebra (flattening toward uniform) and the
  token cap's budget/prefix property;
- registry hygiene: no rows-only query inside the driver's top-50 prefix.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_MH_P = 1_000_003


def _polyhash(token: str) -> int:
    """Python twin of the portable polynomial token hash used for blocking
    ((acc*31 + unicode) % 1000003 — bit-identical in Spark and DuckDB)."""
    acc = 0
    for ch in token:
        acc = (acc * 31 + ord(ch)) % _MH_P
    return acc


def _fuzzy_pairs(spark, rows):
    """Mirror of q_llm_dedup_fuzzy's candidate generation + verify on an
    in-memory corpus: (lang, length-bucket, mintok) blocking, levenshtein
    ratio <= 0.7."""
    from join_example_spark.operators.dedup import length_bucket_pairs

    poly = (
        "aggregate(split(t, ''), CAST(0 AS BIGINT),"
        f" (acc, c) -> (acc * 31 + CAST(ASCII(c) AS BIGINT)) % {_MH_P})"
    )
    docs = (
        spark.createDataFrame(rows, ["doc_id", "lang", "ntext"])
        .withColumn("n_chars", F.length("ntext").cast("bigint"))
        .withColumn(
            "_mintok",
            F.expr(
                f"array_min(transform(array_distinct(split(ntext, ' ')), t -> {poly}))"
            ),
        )
    )
    pairs = length_bucket_pairs(
        docs, payload_col="ntext", width=20, extra_key_col="_mintok"
    )
    ratio = F.expr("levenshtein(ntext_a, ntext_b)").cast("double") / F.expr(
        "CAST(GREATEST(LENGTH(ntext_a), LENGTH(ntext_b)) AS DOUBLE)"
    )
    return {
        (r.id_a, r.id_b)
        for r in pairs.where(ratio <= 0.7).select("id_a", "id_b").collect()
    }


def test_fuzzy_dedup_mintok_recall_trade_stays_visible(spark):
    """Round-3 ADVICE item 1, pinned: the _mintok second blocking key is a
    DELIBERATE fan-out cap that narrows recall. A token-REORDERING near-dup
    preserves the token set (same mintok) and must still be found; a
    near-dup whose edit removed the minimum-hash token lands in a different
    block and is — by design — dropped, even though its edit ratio passes
    the verify threshold. If either half of this pin breaks, the trade
    changed semantics and the docstrings/SCALE.md must be re-examined."""
    toks = ["alpha", "beta", "gamma", "delta"]
    hashes = {t: _polyhash(t) for t in toks}
    min_tok = min(toks, key=lambda t: hashes[t])
    others = [t for t in toks if t != min_tok]
    # doc 1 / doc 2: same token set, reordered -> same mintok, near-dup kept.
    d1 = " ".join([min_tok] + others)
    d2 = " ".join([min_tok] + others[::-1])
    # doc 3: drop the min-hash token from doc 1 -> mintok changes; the pair
    # (1, 3) is a genuine near-dup by the verify metric but is never a
    # candidate. Crafting guard: deletion must actually change the min.
    d3 = " ".join(others)
    assert min(
        (_polyhash(t) for t in others)
    ) != hashes[min_tok], "craft broke: min token survived deletion"
    got = _fuzzy_pairs(
        spark,
        [(1, "en", d1), (2, "en", d2), (3, "en", d3)],
    )
    lev = spark.sql(
        f"SELECT levenshtein('{d1}', '{d3}') / GREATEST(LENGTH('{d1}'), LENGTH('{d3}')) AS r"
    ).collect()[0].r
    assert lev <= 0.7, "craft broke: (1,3) is not a near-dup under the verify metric"
    assert (1, 2) in got, "reordering near-dup (token set preserved) must be emitted"
    assert (1, 3) not in got, (
        "(1,3) emitted: the mintok blocking key no longer drops "
        "min-token-changing edits — recall semantics changed"
    )


def test_pq_codes_pack_and_bound(spark):
    """PQ invariants at the canonical 256-codes × 4-subspaces config:
    every per-subspace code is in [0, 256); the packed word is the exact
    base-256 positional encoding (fits in 32 bits); the reconstruction
    error is the sum of the selected per-subspace rounded distances
    (non-negative)."""
    from join_example_spark.operators.similarity import pq_assignments
    from join_example_spark.registry import load_all
    from join_example_spark.sources.readers import read_table
    from tests.conftest import SF_SMOKE

    emb = read_table(spark, SF_SMOKE, "embeddings")
    a = pq_assignments(emb)
    row = a.agg(
        F.min("code").alias("cmin"),
        F.max("code").alias("cmax"),
        F.min("d2r").alias("dmin"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert row.cmin >= 0 and row.cmax <= 255
    assert row.dmin >= 0.0
    assert row.n == emb.count() * 4  # exactly one code per (vector, subspace)

    q = load_all()["q_llm_pq_quantize"].fn(spark, SF_SMOKE)
    stats = q.agg(
        F.min("code_word").alias("wmin"), F.max("code_word").alias("wmax")
    ).collect()[0]
    assert 0 <= stats.wmin and stats.wmax < (1 << 32)
    # Codebook vectors quantize to themselves: vec k (k < 256) has code k
    # in every subspace and zero reconstruction error.
    first = {r.vec_id: (r.code_word, r.recon_err) for r in q.where("vec_id < 256").collect()}
    assert len(first) > 0
    for k, (word, err) in first.items():
        want = sum(k << (8 * s) for s in range(4))
        assert word == want, (k, word, want)
        assert err == 0.0, (k, err)


def test_pq_adc_rerank_recovers_exact_top1(spark):
    """The two-stage PQ search (ADC shortlist → exact re-rank) must put
    each probe's TRUE exact top-1 neighbor (unblocked brute force over the
    whole corpus) inside its re-ranked top-3 — the usable-search promise
    made in the q_llm_sim_pq_rerank_baseline docstring. The raw ADC ordering alone
    is NOT held to this bar (documented as approximate; this corpus is
    PQ's worst case) — the shortlist+re-rank is."""
    from tests.conftest import SF_SMOKE

    # Pin at BOTH measured corpus sizes: n=500 (SF_SMOKE) and n=2000
    # (sf0.1) — the worst ADC rank of the exact top-1 grows with n, and
    # round 4 caught the n/8 dial silently under-covering at sf0.1.
    for sf in (SF_SMOKE, "/root/testdata/sf0.1"):
        _assert_rerank_covers_exact_top1(spark, sf)


def _assert_rerank_covers_exact_top1(spark, sf_dir):
    import math

    from join_example_spark.operators.similarity import DOT_SQL, pq_adc_rerank_topk
    from join_example_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    shortlist = max(64, int(math.ceil(emb.count() / 4.0)))
    rr = pq_adc_rerank_topk(emb, k=3, shortlist=shortlist, probe_pred="vec_id % 100 = 0")
    got = {}
    for r in rr.collect():
        got.setdefault(r.probe_id, set()).add(r.cand_id)

    probes = emb.where("vec_id % 100 = 0").select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("vec_p")
    )
    cands = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("vec_c"))
    dot = F.expr(DOT_SQL.format(a="vec_p", b="vec_c"))
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(F.round(dot, 4).desc(), F.col("cand_id"))
    exact1 = (
        probes.crossJoin(cands)
        .where(F.col("probe_id") != F.col("cand_id"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .collect()
    )
    assert len(exact1) > 0
    for r in exact1:
        assert r.cand_id in got[r.probe_id], (
            f"probe {r.probe_id}: exact top-1 {r.cand_id} missing from re-ranked "
            f"top-3 {got[r.probe_id]} — PQ shortlist coverage regressed"
        )


def test_semantic_decontamination_no_false_positives_and_recall(spark):
    """Every flagged (train, eval) match must be a TRUE above-threshold
    neighbor (exact dot verify — no false positives by construction), and
    the IVF-candidate route must recover >= 70% of the training vectors an
    exact quadratic screen would flag (the audited multi-probe recall)."""
    from join_example_spark.operators.similarity import DOT_SQL
    from join_example_spark.registry import load_all
    from join_example_spark.sources.readers import read_table
    from tests.conftest import SF_SMOKE

    out = load_all()["q_llm_decontaminate_semantic"].fn(spark, SF_SMOKE)
    emb = read_table(spark, SF_SMOKE, "embeddings")
    v = emb.select(F.col("vec_id").alias("k"), F.col("embedding").alias("vec"))
    checked = (
        out.join(v.withColumnRenamed("k", "vec_id").withColumnRenamed("vec", "vec_t"), "vec_id")
        .join(v.withColumnRenamed("k", "eval_id").withColumnRenamed("vec", "vec_e"), "eval_id")
        .withColumn("true_sim", F.round(F.expr(DOT_SQL.format(a="vec_t", b="vec_e")), 4))
    )
    bad = checked.where(
        (F.col("true_sim") < 0.35) | (F.col("true_sim") != F.col("sim"))
    ).count()
    assert bad == 0

    train = emb.where("vec_id % 7 != 0").select(
        F.col("vec_id").alias("tid"), F.col("embedding").alias("vec_t")
    )
    ev = emb.where("vec_id % 7 = 0").select(
        F.col("vec_id").alias("eid"), F.col("embedding").alias("vec_e")
    )
    dot = F.expr(DOT_SQL.format(a="vec_t", b="vec_e"))
    truth = (
        train.crossJoin(ev)
        .where(F.round(dot, 4) >= 0.35)
        .select("tid")
        .distinct()
        .count()
    )
    flagged = out.count()
    assert flagged <= truth  # candidates are a subset of the exact screen
    assert truth == 0 or flagged / truth >= 0.7, (flagged, truth)


def test_temperature_mixing_flattens_the_distribution(spark):
    """Algebraic pins for q_llm_mix_temperature: weights sum to 1, kept
    counts never exceed totals, rates are valid permilles, and the
    alpha=0.5 temperature actually FLATTENS the mixture — every source's
    sampled share sits no further from uniform than its raw share
    (sqrt-scaling shrinks spread toward the mean by construction)."""
    from join_example_spark.registry import load_all
    from tests.conftest import SF_SMOKE

    rows = load_all()["q_llm_mix_temperature"].fn(spark, SF_SMOKE).collect()
    assert len(rows) > 1
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-9
    n_corpus = sum(r.n_total for r in rows)
    uniform = 1.0 / len(rows)
    for r in rows:
        assert 0 <= r.rate_permille <= 1000
        assert 0 <= r.n_kept <= r.n_total
        raw_share = r.n_total / n_corpus
        # weight (the target share) is between the raw share and uniform.
        lo, hi = sorted((raw_share, uniform))
        assert lo - 1e-9 <= r.weight <= hi + 1e-9, (r.source, raw_share, r.weight)


def test_source_token_cap_budget_and_order(spark):
    """q_llm_source_token_cap: every source stays within the 300-token
    budget, at least one doc per non-empty source survives iff its first
    doc fits, and the kept set is exactly the hash-order prefix (re-adding
    the next doc in hash order would breach the budget)."""
    from join_example_spark.operators.sampling import id_hash
    from join_example_spark.registry import load_all
    from join_example_spark.sources.readers import read_table
    from tests.conftest import SF_SMOKE

    out = load_all()["q_llm_source_token_cap"].fn(spark, SF_SMOKE)
    per_src = out.groupBy("source").agg(
        F.max("cum_toks").alias("mx"), F.count(F.lit(1)).alias("k")
    ).collect()
    assert len(per_src) > 0
    for r in per_src:
        assert r.mx <= 300

    # Prefix property: for one source, replay the full hash-ordered doc
    # list and check the kept set is its maximal budget-fitting prefix.
    src = per_src[0].source
    docs = (
        read_table(spark, SF_SMOKE, "documents")
        .where((F.col("source") == src) & F.col("text").isNotNull())
        .where(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            F.expr("CAST(size(split(LOWER(TRIM(text)), ' ')) AS BIGINT)").alias("t"),
            id_hash("doc_id").alias("h"),
        )
        .collect()
    )
    ordered = sorted(docs, key=lambda r: (r.h, r.doc_id))
    cum, want = 0, []
    for r in ordered:
        cum += r.t
        if cum > 300:
            break
        want.append(r.doc_id)
    got = [r.doc_id for r in out.where(F.col("source") == src).orderBy("cum_toks").collect()]
    assert got == want, (src, got, want)


def test_driver_priority_head_is_oracle_able():
    """Registry hygiene: the driver consumes only the first ~50 entries
    per round, and a rows-only query inside that prefix burns a slot on a
    structurally-ungreenable `no_oracle` row. Keep the head oracle-able —
    if a new rows-only query is deliberately prioritized, it must be
    re-ordered below the top 50 or this pin updated consciously.

    Round 7 spent 3 head slots (a conscious one-time allowance) to learn
    the driver has NO rows-only mode (`err: no_oracle`, CORRECTNESS_r07);
    round 8 re-declared those three queries with oracles, so the head must
    now be oracle-able with zero exceptions, unconditionally."""
    from join_example_spark.registry import load_all

    reg = load_all()
    head = list(reg.items())[:50]
    rows_only = [name for name, spec in head if spec.oracle is None]
    assert not rows_only, (
        f"rows-only queries inside the driver's top-50 prefix: {rows_only}"
    )
