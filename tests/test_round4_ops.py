"""Round-4 pins: the fuzzy-dedup mintok recall trade (round-3 ADVICE), the
sketch-certification regime guards, and the zero-batch streaming-dedup read
guard. The oracle mirror covers hash parity; these keep deliberate semantic
trades and failure-mode guards visible."""

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
