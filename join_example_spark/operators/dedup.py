"""Deduplication operators for training-data pipelines.

Exact (hash-groupBy), MinHash+LSH banding, SimHash, and token-Jaccard
near-dup — all JVM-side expressions (higher-order array functions +
xxhash64), zero Python UDFs, so every stage stays inside whole-stage
codegen and scales by shuffle on compact keys (hashes, band buckets).

Scale notes:
- Exact dedup: one shuffle on a 128-bit hash; at 100 TB the shuffle carries
  (hash, doc_id) pairs only, not the documents.
- MinHash/LSH: candidate generation shuffles on (band_idx, band_hash) — a
  compact key whose cardinality grows with corpus size, so partitioning
  stays balanced; the quadratic verify step runs only within LSH buckets.
- SimHash: 64-bit fingerprints; near-dup = hamming distance via bit_count
  on XOR — a cheap, broadcastable self-join within coarse blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TOKENIZE = "array_distinct(split(lower(trim({col})), ' '))"


def normalized_text_hash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append a deterministic 128-bit content hash of normalized text."""
    return df.withColumn("text_hash", F.md5(F.lower(F.trim(F.col(text_col)))))


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest-id representative per normalized-text hash.

    NULL text is not content: those rows pass through untouched rather than
    collapsing into one "duplicate" group (md5(NULL)=NULL would make the
    window treat every NULL-text doc as a copy of the lowest-id one).
    """
    hashed = normalized_text_hash(df, text_col)
    nulls = hashed.where(F.col(text_col).isNull())
    w = Window.partitionBy("text_hash").orderBy(F.col(id_col))
    kept = (
        hashed.where(F.col(text_col).isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return kept.unionByName(nulls)


def minhash_signature(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", num_perm: int = 16
) -> DataFrame:
    """``(id_col, minhash: array<bigint>)`` — num_perm min-hashes over tokens.

    Permutation i is simulated by xxhash64(token, i). Shape: explode tokens →
    num_perm MIN aggregates → pack to array. The MINs are whole-stage-codegen
    hash aggregates with map-side partial combine, so the shuffle carries one
    num_perm-wide row per (doc, partition) — the scalable shape (an earlier
    higher-order-function formulation was 25× slower: interpreted lambdas,
    re-hashing per seed).
    """
    toks = df.select(
        F.col(id_col), F.explode(F.expr(_TOKENIZE.format(col=text_col))).alias("tok")
    )
    mins = [
        F.min(F.expr(f"xxhash64(tok, {s})")).alias(f"_h{s}") for s in range(num_perm)
    ]
    return (
        toks.groupBy(id_col)
        .agg(*mins)
        .select(F.col(id_col), F.array(*[f"_h{s}" for s in range(num_perm)]).alias("minhash"))
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
    band_size: int = 4,
) -> DataFrame:
    """LSH banding: emit candidate (id_a, id_b) pairs sharing any band.

    shingle→minhash→band→bucket-join: explode each doc into
    num_perm/band_size (band_idx, band_hash) buckets, self-join on the
    bucket key (an equi-join — shuffle on compact keys), dedupe pairs.
    """
    if not (0 < band_size <= num_perm) or num_perm % band_size != 0:
        # A bad geometry would make SEQUENCE(0, -1) descend (garbage band
        # -1 with end-relative SLICE) or silently drop trailing hashes.
        raise ValueError(
            f"band_size must divide num_perm: got num_perm={num_perm}, "
            f"band_size={band_size}"
        )
    n_bands = num_perm // band_size
    sigs = minhash_signature(df, id_col, text_col, num_perm)
    bands = sigs.select(
        id_col,
        F.explode(
            F.expr(
                f"TRANSFORM(SEQUENCE(0, {n_bands - 1}), b -> "
                f"  STRUCT(b AS band_idx, "
                f"         xxhash64(CONCAT_WS(',', SLICE(minhash, b * {band_size} + 1, {band_size})), 42) AS band_hash))"
            )
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_hash")
    a = bands.select(
        F.col(id_col).alias("id_a"), "band_idx", "band_hash"
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), "band_idx", "band_hash"
    )
    pairs = (
        a.join(b, ["band_idx", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return pairs


def token_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Verify candidate pairs by exact token-set Jaccard >= threshold."""
    tokens = df.select(
        F.col(id_col), F.expr(_TOKENIZE.format(col=text_col)).alias("toks")
    )
    ta = tokens.select(F.col(id_col).alias("id_a"), F.col("toks").alias("toks_a"))
    tb = tokens.select(F.col(id_col).alias("id_b"), F.col("toks").alias("toks_b"))
    joined = candidates.join(ta, "id_a").join(tb, "id_b")
    jac = F.expr(
        "CAST(SIZE(ARRAY_INTERSECT(toks_a, toks_b)) AS DOUBLE)"
        " / CAST(SIZE(ARRAY_UNION(toks_a, toks_b)) AS DOUBLE)"
    )
    return joined.select("id_a", "id_b", jac.alias("jaccard")).where(
        F.col("jaccard") >= threshold
    )


def simhash64(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(id_col, simhash: bigint)`` — 64-bit SimHash over tokens.

    Bit j of the fingerprint is 1 iff more token-hashes have bit j set than
    unset. Shape: explode tokens → hash once per token → 64 signed-vote SUM
    aggregates (+1/-1 per bit) → pack sign bits into one BIGINT. All
    codegen'd hash aggregation with map-side combine; one shuffle on doc id.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.expr(_TOKENIZE.format(col=text_col))).alias("tok")
    ).withColumn("_h", F.expr("xxhash64(tok)"))
    votes = [
        F.sum(F.expr(f"CASE WHEN ((_h >> {j}) & 1) = 1 THEN 1 ELSE -1 END")).alias(f"_b{j}")
        for j in range(64)
    ]
    pack = " + ".join(
        f"(CASE WHEN _b{j} > 0 THEN SHIFTLEFT(CAST(1 AS BIGINT), {j}) ELSE CAST(0 AS BIGINT) END)"
        for j in range(64)
    )
    return toks.groupBy(id_col).agg(*votes).select(
        F.col(id_col), F.expr(pack).alias("simhash")
    )


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    block_col: str | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance (bit_count of XOR).

    Blocks on ``block_col`` (or the top-16 bits of the fingerprint) to keep
    the self-join sub-quadratic at scale.
    """
    sigs = simhash64(df, id_col, text_col)
    if block_col is None:
        sigs = sigs.withColumn("_blk", F.expr("simhash >> 48"))
        block_col = "_blk"
    else:
        sigs = sigs.join(df.select(id_col, block_col), id_col)
    a = sigs.select(
        F.col(id_col).alias("id_a"),
        F.col("simhash").alias("sim_a"),
        F.col(block_col).alias("blk"),
    )
    b = sigs.select(
        F.col(id_col).alias("id_b"),
        F.col("simhash").alias("sim_b"),
        F.col(block_col).alias("blk"),
    )
    return (
        a.join(b, "blk")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.expr("bit_count(sim_a ^ sim_b)"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_band_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
) -> DataFrame:
    """SimHash near-dup pairs via exact multi-index hamming LSH.

    Pigeonhole: 64 bits split into ``max_hamming + 1`` bands; two
    fingerprints within the radius must agree exactly on at least one band
    (d differing bits cannot touch d+1 disjoint bands). Candidate generation is therefore an EQUI-join on
    (band_index, band_value) — a balanced hash shuffle — followed by the
    exact ``bit_count(xor)`` verify. Unlike block-column all-pairs, cost
    scales with collisions per 7-bit bucket, not with block size squared;
    this is the 100 TB SimHash plan (radius-guaranteed: recall is exactly
    100% within the radius, not probabilistic). Wider bands (smaller radius)
    are more selective — pick the largest radius the dedup policy needs.
    """
    n_bands = max_hamming + 1
    if not 1 <= n_bands <= 16:
        raise ValueError(f"max_hamming must be in [0, 15], got {max_hamming}")
    sigs = simhash64(df, id_col, text_col)
    width = 64 // n_bands
    offsets = [
        (i, i * width, 64 - (n_bands - 1) * width if i == n_bands - 1 else width)
        for i in range(n_bands)
    ]
    def _band(i: int, off: int, width: int) -> str:
        # width=64 (single band / radius 0): the all-ones mask literal would
        # parse as DECIMAL(20,0) and break bitwise AND — it's a no-op anyway.
        masked = (
            f"shiftright(simhash, {off})"
            if width >= 64
            else f"shiftright(simhash, {off}) & {(1 << width) - 1}"
        )
        return f"named_struct('bi', {i}, 'bv', {masked})"

    band_exprs = ", ".join(_band(i, off, width) for i, off, width in offsets)
    banded = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(F.expr(f"array({band_exprs})")).alias("band"),
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sim_a"), "band"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sim_b"), "band"
    )
    cands = (
        a.join(b, "band")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .distinct()  # a pair may agree on several bands
    )
    return (
        cands.withColumn("hamming", F.expr("bit_count(sim_a ^ sim_b)"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def length_bucket_pairs(
    docs: DataFrame,
    payload_col: str,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    len_col: str = "n_chars",
    width: int = 20,
    extra_key_col: str | None = None,
) -> DataFrame:
    """Candidate pairs under (same lang, |len diff| <= width) blocking.

    The 100 TB rewrite shared by the token-set and n-gram Jaccard queries:
    |a.len - b.len| <= width implies the pair co-occurs in at least one of
    b's {bucket-1, bucket, bucket+1} at bucket = len DIV width, so the
    quadratic candidate space becomes an equi-join on (lang, bucket) with
    the exact length/lang residual re-applied. Each LEFT doc has exactly
    one bucket, so a pair matches in at most one exploded neighbor bucket —
    no pair-dedup needed (the invariant both callers rely on).

    ``extra_key_col``: optional second blocking key added to the equi-join
    (e.g. a min-token-hash). This caps block fan-out: a boilerplate-heavy
    corpus can concentrate documents into few (lang, length) blocks, and
    the within-block pair work goes quadratic at scale without a second,
    content-derived key splitting those blocks.

    Output: ``id_a < id_b`` pairs with ``{payload_col}_a/_b`` carried for
    the caller's exact similarity verify.
    """
    bucket = f"CAST({len_col} DIV {width} AS BIGINT)"
    a = docs.withColumn("_bkt", F.expr(bucket))
    b = docs.withColumn(
        "_bkt",
        F.explode(F.expr(f"ARRAY({bucket} - 1, {bucket}, {bucket} + 1)")),
    )
    join_keys = ["_bkt"] + ([extra_key_col] if extra_key_col else [])
    extra = [extra_key_col] if extra_key_col else []
    aa = a.select(
        F.col(id_col).alias("id_a"),
        F.col(lang_col).alias("_lang_a"),
        F.col(len_col).alias("_len_a"),
        F.col(payload_col).alias(f"{payload_col}_a"),
        "_bkt",
        *extra,
    )
    bb = b.select(
        F.col(id_col).alias("id_b"),
        F.col(lang_col).alias("_lang_b"),
        F.col(len_col).alias("_len_b"),
        F.col(payload_col).alias(f"{payload_col}_b"),
        "_bkt",
        *extra,
    )
    return (
        aa.join(bb, join_keys)
        .where(
            (F.col("_lang_a") == F.col("_lang_b"))
            & (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("_len_a") - F.col("_len_b")) <= width)
        )
        .select("id_a", "id_b", f"{payload_col}_a", f"{payload_col}_b")
    )


def editdist_band_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    threshold: int = 20,
) -> DataFrame:
    """LOSSLESS within-lang near-dup pairs by edit distance <= threshold.

    Levenshtein admits the exact lower bound dist(a, b) >= |len(a) -
    len(b)|, so length-band blocking at width = threshold (via
    :func:`length_bucket_pairs`, keyed on (band, lang)) provably drops no
    qualifying pair — the same per-row losslessness contract as the
    PPJoin prefix filter, certified by a naive within-lang quadratic
    oracle. The distance itself uses the THRESHOLDED 3-arg levenshtein
    (banded DP, O(threshold * len) per pair instead of O(len^2), -1
    sentinel above the cap) — the form a 100 TB near-dup verify wants.
    Lengths are taken on the NORMALIZED text (lower(trim)), not the raw
    n_chars column, because the bound must hold for the exact strings
    compared. At corpus scale the band join composes with a second
    content-derived blocking key exactly as ``length_bucket_pairs``
    documents (``extra_key_col``); the band residual stays lossless.

    Output: ``(id_a < id_b, dist)`` with dist <= threshold, BIGINT.
    """
    base = (
        docs.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.col(lang_col),
            F.lower(F.trim(F.col(text_col))).alias("_norm"),
        )
        .withColumn("_nlen", F.length("_norm").cast("bigint"))
    )
    cand = length_bucket_pairs(
        base,
        "_norm",
        id_col=id_col,
        lang_col=lang_col,
        len_col="_nlen",
        width=threshold,
        extra_key_col=lang_col,
    )
    dist = F.expr(f"levenshtein(_norm_a, _norm_b, {threshold})").cast("bigint")
    return (
        cand.withColumn("dist", dist)
        .where(F.col("dist") >= 0)
        .select("id_a", "id_b", "dist")
    )


def incremental_dedup_verdicts(batch: DataFrame, corpus: DataFrame) -> DataFrame:
    """Per-document dedup verdict of an ARRIVING batch against an EXISTING
    corpus: ``(doc_id, status)`` with status in kept/dup_exact/dup_near
    (exact wins).

    Exact = content-hash semi-join; near = cross-dataset (lang, length-
    bucket ±1) blocked token-Jaccard ≥ 0.5 (batch side keeps its single
    bucket, corpus side explodes ±1 — the one-match invariant of
    :func:`length_bucket_pairs`, cross-dataset). Verdicts depend only on
    (document, corpus) — never on other batch documents — so judging a
    stream micro-batch at a time produces exactly the one-shot answer;
    both the batch query (`q_llm_dedup_incremental`) and the streaming
    ingest demo (`stream_incremental_dedup`) call this one function.

    Both inputs need columns ``doc_id, lang, n_chars, text``. At 100 TB
    the corpus side is the stored hash/signature index, not a rescan.
    """
    toks_expr = "array_distinct(split(LOWER(TRIM(text)), ' '))"
    bkt = "CAST(n_chars DIV 20 AS BIGINT)"

    bh = batch.select("doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("h"))
    ch = corpus.select(F.md5(F.lower(F.trim(F.col("text")))).alias("h")).distinct()
    exact_ids = bh.join(ch, "h").select("doc_id").distinct()

    btoks = batch.select(
        "doc_id",
        "lang",
        "n_chars",
        F.expr(toks_expr).alias("toks"),
        F.expr(bkt).alias("_bkt"),
    )
    ctoks = corpus.select(
        F.col("lang").alias("c_lang"),
        F.col("n_chars").alias("c_len"),
        F.expr(toks_expr).alias("c_toks"),
        F.explode(F.expr(f"ARRAY({bkt} - 1, {bkt}, {bkt} + 1)")).alias("_bkt"),
    )
    jac = F.expr(
        "CAST(SIZE(ARRAY_INTERSECT(toks, c_toks)) AS DOUBLE)"
        " / CAST(SIZE(ARRAY_UNION(toks, c_toks)) AS DOUBLE)"
    )
    near_ids = (
        btoks.join(ctoks, "_bkt")
        .where(
            (F.col("lang") == F.col("c_lang"))
            & (F.abs(F.col("n_chars") - F.col("c_len")) <= 20)
            & (jac >= 0.5)
        )
        .select("doc_id")
        .distinct()
    )
    return (
        batch.select("doc_id")
        .join(exact_ids.withColumn("_e", F.lit(1)), "doc_id", "left")
        .join(near_ids.withColumn("_n", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id",
            F.expr(
                "CASE WHEN _e IS NOT NULL THEN 'dup_exact'"
                " WHEN _n IS NOT NULL THEN 'dup_near'"
                " ELSE 'kept' END"
            ).alias("status"),
        )
    )

