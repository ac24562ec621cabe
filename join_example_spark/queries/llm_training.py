"""Training-data pipeline surface: deterministic sampling, group-stable
splits, benchmark decontamination, token-budget sharding, source mixtures.

These are the operations between "deduped corpus" and "training shards" in
a large-scale LLM data pipeline. All of them run on portable hashes
(operators/sampling.py) so the declared queries carry exact DuckDB oracles;
the 100 TB scale path swaps the char-fold for xxhash64 with the same plan
shape. Every operator here is map-side or single-shuffle — nothing
quadratic, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from join_example_spark.operators.sampling import (
    HASH_P,
    hash_sample,
    id_hash,
    id_hash_sql,
    pack_chunks,
    split_assign,
    str_hash_sql,
)
from join_example_spark.registry import register
from join_example_spark.sources.readers import fanout_repartition, read_table


@register(
    "q_llm_sample_hash",
    oracle=f"""
SELECT doc_id, source, lang, n_chars
FROM documents
WHERE {id_hash_sql("doc_id")} % 100 < 10
""",
    note="deterministic 10% corpus sample by id-hash bucket — map-side "
    "filter, no shuffle, same rows on every run/partitioning (unlike "
    "rand()-based sampling); the reproducible-dev-corpus operator",
    tags=("llm", "training", "sample"),
)
def q_llm_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", 10).select("doc_id", "source", "lang", "n_chars")


@register(
    "q_llm_split_assign",
    oracle=f"""
SELECT doc_id, source,
       CASE WHEN {str_hash_sql("source")} % 100 < 80 THEN 'train'
            WHEN {str_hash_sql("source")} % 100 < 90 THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
    note="group-stable train/val/test split: the hash is over the GROUP "
    "key (source), so every document of a source lands in one split — the "
    "defense against near-dup leakage across the train/eval boundary. "
    "Map-side only",
    tags=("llm", "training", "split"),
)
def q_llm_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return split_assign(docs, "source").select("doc_id", "source", "split")


@register(
    "q_llm_decontaminate",
    oracle="""
WITH tr AS (
    SELECT doc_id, str_split(LOWER(TRIM(text)), ' ') AS toks
    FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3')
), bn AS (
    SELECT doc_id, str_split(LOWER(TRIM(text)), ' ') AS toks
    FROM documents WHERE source = 'src19'
), tr_sh AS (
    SELECT doc_id, UNNEST(list_distinct(list_transform(
               range(1, len(toks) - 2),
               i -> array_to_string(toks[i:i+3], ' ')))) AS sh
    FROM tr WHERE len(toks) >= 4
), bn_sh AS (
    SELECT DISTINCT UNNEST(list_distinct(list_transform(
               range(1, len(toks) - 2),
               i -> array_to_string(toks[i:i+3], ' ')))) AS sh
    FROM bn WHERE len(toks) >= 4
)
SELECT tr_sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM tr_sh JOIN bn_sh ON tr_sh.sh = bn_sh.sh
GROUP BY tr_sh.doc_id
""",
    note="benchmark decontamination: n-gram shingle overlap between the "
    "training sources and a held-out benchmark source, as an equi-join on "
    "the shingle — flags training docs that leak eval content. n=4 here "
    "because the synthetic fixture's tiny vocabulary makes real-world "
    "8-13-grams collisionless; the operator is n-parametric. Scale path: "
    "shuffle the 64-bit shingle hash instead of the string (same plan "
    "shape, ~10x narrower exchange); the word-shingle equi-join is the "
    "same candidate-generation shape as the MinHash band join — never "
    "all-pairs",
    tags=("llm", "training", "decontaminate"),
)
def q_llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")

    def shingles(df: DataFrame) -> DataFrame:
        toked = df.select(
            "doc_id", F.expr("split(LOWER(TRIM(text)), ' ')").alias("toks")
        ).where(F.size("toks") >= 4)
        # sequence(1, n-3) ascends only because n >= 4 is guaranteed above
        # (Spark's sequence DESCENDS when start > stop).
        sh = F.expr(
            "array_distinct(transform(sequence(1, size(toks) - 3),"
            " i -> concat_ws(' ', slice(toks, i, 4))))"
        )
        return toked.select("doc_id", F.explode(sh).alias("sh"))

    train = shingles(docs.where(F.col("source").isin("src0", "src1", "src2", "src3")))
    bench = shingles(docs.where(F.col("source") == "src19")).select("sh").distinct()
    return (
        train.join(bench, "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )


@register(
    "q_llm_pack_chunks",
    oracle="""
WITH sized AS (
    SELECT doc_id, source,
           CAST(len(str_split(TRIM(text), ' ')) AS BIGINT) AS n_tok
    FROM documents
)
SELECT doc_id, source, n_tok,
       CAST(FLOOR(COALESCE(SUM(n_tok) OVER (
            PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            / 256.0) AS BIGINT) AS shard_id
FROM sized
""",
    note="token-budget sharding: shard = floor(running-tokens-before / "
    "256) per source in doc_id order — the pack-the-corpus-into-shards "
    "operator for training serialization. One hash shuffle on source + "
    "one in-partition sort; deterministic order makes shard contents "
    "reproducible artifacts",
    tags=("llm", "training", "shard"),
)
def q_llm_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        "source",
        F.expr("CAST(size(split(TRIM(text), ' ')) AS BIGINT)").alias("n_tok"),
    )
    packed = pack_chunks(sized, "source", "doc_id", "n_tok", budget=256)
    return packed.select(
        "doc_id", "source", "n_tok", F.col("shard_id").cast("bigint").alias("shard_id")
    )


@register(
    "q_llm_mix_sources",
    oracle=f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN {id_hash_sql("doc_id")} % 100 <
                CASE WHEN source IN ('src0', 'src1') THEN 50
                     WHEN source IN ('src2', 'src3', 'src4') THEN 20
                     ELSE 5 END
            THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents
GROUP BY source
""",
    note="training-mixture construction: per-source sampling rates (high-"
    "quality sources upweighted) applied via the deterministic id-hash — "
    "one scan + one partial-aggregated groupBy, no per-source passes. The "
    "kept-row variant is the same predicate as a WHERE clause; the "
    "aggregate form audits realized vs target mixture weights",
    tags=("llm", "training", "mixture"),
)
def q_llm_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("source").isin("src0", "src1"), 50)
        .when(F.col("source").isin("src2", "src3", "src4"), 20)
        .otherwise(5)
    )
    kept = (id_hash("doc_id") % 100 < rate).cast("int")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum(kept).cast("bigint").alias("n_kept"),
    )


@register(
    "q_llm_sample_stratified",
    oracle=f"""
SELECT doc_id, source, lang, n_chars
FROM documents
WHERE {id_hash_sql("doc_id")} % 100 <
      CASE source WHEN 'src0' THEN 5 WHEN 'src1' THEN 20 ELSE 50 END
""",
    note="stratified deterministic sample: per-SOURCE keep-rates (5% / "
    "20% / 50%) applied through the same portable id-hash — the "
    "source-mixture rebalancing step of a training pipeline (downsample "
    "the over-represented crawl, keep most of the curated set). Still a "
    "pure map-side filter: the rate CASE rides the scan, no shuffle, no "
    "per-stratum pass",
    tags=("llm", "training", "sample"),
)
def q_llm_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("source") == "src0", F.lit(5))
        .when(F.col("source") == "src1", F.lit(20))
        .otherwise(F.lit(50))
    )
    return docs.where(id_hash("doc_id") % 100 < rate).select(
        "doc_id", "source", "lang", "n_chars"
    )


@register(
    "q_llm_chunk_overlap",
    oracle="""
WITH t AS (
    SELECT doc_id,
           CAST(LEN(string_split(TRIM(text), ' ')) AS BIGINT) AS n
    FROM documents
), c AS (
    SELECT doc_id, n, unnest(generate_series(0, n - 1, 48)) AS s
    FROM t
)
SELECT doc_id,
       CAST(s // 48 AS BIGINT) AS chunk_idx,
       CAST(s AS BIGINT) AS start_tok,
       CAST(LEAST(s + 64, n) AS BIGINT) AS end_tok,
       CAST(LEAST(s + 64, n) - s AS BIGINT) AS chunk_tokens
FROM c
""",
    note="sliding-window document chunking (64-token chunks, stride 48 -> "
    "16-token overlap): per-row sequence explode of chunk START OFFSETS "
    "only — the text itself is never replicated into the exploded rows "
    "(slice at consumption time), the same no-blob-inflation rule as the "
    "video frame-sample plan. Map-side only, no shuffle",
    tags=("llm", "training", "chunk"),
)
def q_llm_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.expr("CAST(SIZE(SPLIT(TRIM(text), ' ')) AS BIGINT)").alias("n"),
    )
    c = t.select(
        "doc_id",
        "n",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.col("n") - 1, F.lit(48).cast("bigint"))
        ).alias("s"),
    )
    return c.select(
        "doc_id",
        (F.col("s") / 48).cast("bigint").alias("chunk_idx"),
        F.col("s").cast("bigint").alias("start_tok"),
        F.least(F.col("s") + 64, F.col("n")).cast("bigint").alias("end_tok"),
        (F.least(F.col("s") + 64, F.col("n")) - F.col("s")).cast("bigint").alias("chunk_tokens"),
    )


@register(
    "q_llm_train_pipeline",
    oracle=f"""
WITH sampled AS (
    SELECT doc_id, source, text
    FROM documents
    WHERE {id_hash_sql("doc_id")} % 100 < 50
), keep AS (
    SELECT doc_id, source, text
    FROM (
        SELECT doc_id, source, text,
               ROW_NUMBER() OVER (PARTITION BY md5(LOWER(TRIM(text)))
                                  ORDER BY doc_id) AS rn
        FROM sampled
    ) WHERE rn = 1
), sized AS (
    SELECT doc_id, source,
           CAST(LEN(string_split(TRIM(text), ' ')) AS BIGINT) AS n
    FROM keep
), chunks AS (
    SELECT doc_id, source, n,
           unnest(generate_series(0, n - 1, 48)) AS s
    FROM sized
), toks AS (
    SELECT doc_id, source,
           CAST(LEAST(s + 64, n) - s AS BIGINT) AS chunk_tokens, s
    FROM chunks
), sharded AS (
    SELECT source, chunk_tokens,
           CAST(FLOOR(COALESCE(SUM(chunk_tokens) OVER (
                PARTITION BY source ORDER BY doc_id, s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                / 1024.0) AS BIGINT) AS shard_id
    FROM toks
)
SELECT source, shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(chunk_tokens) AS BIGINT) AS shard_tokens
FROM sharded
GROUP BY source, shard_id
""",
    note="the corpus->training-shards pipeline as ONE Catalyst plan: "
    "deterministic 50% hash sample (map-side) -> exact dedup keep-lowest "
    "(one shuffle on the content hash) -> 64/48 sliding chunks (offset "
    "explode, no text replication) -> 1024-token shard assignment "
    "(running-sum window per source) -> per-shard audit. Four stages, TWO "
    "shuffles total (measured: the final (source, shard_id) group-by "
    "reuses the window's source-hash partitioning — source alone already "
    "co-locates every group), everything JVM-side; each stage is also "
    "certified standalone by its own declared query",
    tags=("llm", "training", "pipeline"),
)
def q_llm_train_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    sampled = hash_sample(docs, "doc_id", 50).select("doc_id", "source", "text")
    wdup = Window.partitionBy(F.md5(F.lower(F.trim(F.col("text"))))).orderBy("doc_id")
    keep = (
        sampled.withColumn("rn", F.row_number().over(wdup))
        .where(F.col("rn") == 1)
        .select("doc_id", "source", "text")
    )
    sized = keep.select(
        "doc_id",
        "source",
        F.expr("CAST(SIZE(SPLIT(TRIM(text), ' ')) AS BIGINT)").alias("n"),
    )
    chunks = sized.select(
        "doc_id",
        "source",
        "n",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.col("n") - 1, F.lit(48).cast("bigint"))
        ).alias("s"),
    )
    toks = chunks.select(
        "doc_id",
        "source",
        "s",
        (F.least(F.col("s") + 64, F.col("n")) - F.col("s")).cast("bigint").alias("chunk_tokens"),
    )
    wshard = (
        Window.partitionBy("source")
        .orderBy("doc_id", "s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sharded = toks.withColumn(
        "shard_id",
        F.floor(F.coalesce(F.sum("chunk_tokens").over(wshard), F.lit(0)) / 1024.0).cast(
            "bigint"
        ),
    )
    return sharded.groupBy("source", "shard_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum("chunk_tokens").cast("bigint").alias("shard_tokens"),
    )


@register(
    "q_llm_mix_temperature",
    oracle=f"""
WITH h AS (
    SELECT source, {id_hash_sql("doc_id")} % 1000 AS bkt,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM documents
    GROUP BY source, {id_hash_sql("doc_id")} % 1000
), stats AS (
    SELECT source, CAST(SUM(c) AS BIGINT) AS n_total FROM h GROUP BY source
), tot AS (
    SELECT CAST(SUM(n_total) AS BIGINT) AS n_corpus,
           list_aggregate(list_transform(list_sort(list(n_total)),
               x -> sqrt(CAST(x AS DOUBLE))), 'sum') AS sum_sqrt
    FROM stats
), rates AS (
    SELECT s.source, s.n_total,
           sqrt(CAST(s.n_total AS DOUBLE)) / t.sum_sqrt AS weight,
           CAST(LEAST(1000.0, FLOOR(
               FLOOR(0.5 * CAST(t.n_corpus AS DOUBLE)) * (sqrt(CAST(s.n_total AS DOUBLE)) / t.sum_sqrt)
               / CAST(s.n_total AS DOUBLE) * 1000.0)) AS BIGINT) AS rate_permille
    FROM stats s CROSS JOIN tot t
)
SELECT r.source, r.n_total, r.weight, r.rate_permille,
       CAST(COALESCE(SUM(CASE WHEN h.bkt < r.rate_permille THEN h.c END), 0) AS BIGINT) AS n_kept
FROM rates r JOIN h ON h.source = r.source
GROUP BY r.source, r.n_total, r.weight, r.rate_permille
""",
    note="temperature-scaled source mixing (the multilingual-corpus "
    "p ~ n^alpha resampling, alpha=0.5): per-source weights w_s = "
    "sqrt(n_s)/sum sqrt, a half-corpus token target, and a deterministic "
    "permille keep-rate realized through the portable id-hash. ONE corpus "
    "scan: the scan partial-aggregates into a (source x hash-permille-"
    "bucket) histogram (<= sources x 1000 rows), and every downstream "
    "number — weights, rates, realized kept counts — derives from that "
    "tiny table, so retuning alpha or the target replays NO corpus scan. "
    "sum_sqrt is a SORTED sequential fold (collect_list -> array_sort -> "
    "aggregate | list_sort -> list_aggregate 'sum'), not a bare double "
    "SUM, so partial-agg merge order cannot perturb the last ulp even "
    "under non-uniform source sizes; weight is then one IEEE sqrt/div on "
    "identical operands both engines — bit-stable, no ROUND; rate "
    "boundaries are FLOOR on irrational products (no x.5 tie class). At 100 TB: one scan + one "
    "20k-row shuffle; the keep predicate itself (id_hash % 1000 < rate) "
    "is the same map-side filter as q_llm_mix_sources",
    tags=("llm", "training", "mixture"),
)
def q_llm_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    h = (
        docs.select("source", (id_hash("doc_id") % 1000).alias("bkt"))
        .groupBy("source", "bkt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    stats = h.groupBy("source").agg(F.sum("c").cast("bigint").alias("n_total"))
    tot = stats.agg(
        F.sum("n_total").cast("bigint").alias("n_corpus"),
        # Sequential fold over the SORTED per-source counts: double addition
        # is order-dependent, so a plain SUM(sqrt(n)) would be a partial-agg
        # merge-order lottery (masked today only by uniform fixture counts).
        # Sorting the ~sources-sized list and folding left-to-right gives the
        # identical IEEE operation sequence in both engines — bit-stable
        # without rounding the irrational sqrt values.
        F.expr(
            "aggregate(array_sort(collect_list(n_total)), CAST(0.0 AS DOUBLE),"
            " (acc, x) -> acc + sqrt(CAST(x AS DOUBLE)))"
        ).alias("sum_sqrt"),
    )
    rates = stats.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_total",
        (F.sqrt(F.col("n_total").cast("double")) / F.col("sum_sqrt")).alias("weight"),
        F.expr(
            "CAST(LEAST(1000.0D, FLOOR("
            " FLOOR(0.5D * CAST(n_corpus AS DOUBLE))"
            " * (sqrt(CAST(n_total AS DOUBLE)) / sum_sqrt)"
            " / CAST(n_total AS DOUBLE) * 1000.0D)) AS BIGINT)"
        ).alias("rate_permille"),
    )
    return (
        h.join(F.broadcast(rates), "source")
        .groupBy("source", "n_total", "weight", "rate_permille")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("bkt") < F.col("rate_permille"), F.col("c"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_kept")
        )
        .select("source", "n_total", "weight", "rate_permille", "n_kept")
    )


@register(
    "q_llm_source_token_cap",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, source,
           CAST(LEN(string_split(LOWER(TRIM(text)), ' ')) AS BIGINT) AS tok_cnt
    FROM documents
    WHERE text IS NOT NULL AND LEN(TRIM(text)) > 0
), ordered AS (
    SELECT doc_id, source, tok_cnt,
           CAST(SUM(tok_cnt) OVER (
               PARTITION BY source
               ORDER BY {id_hash_sql("doc_id")}, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_toks
    FROM toks
)
SELECT doc_id, source, tok_cnt, cum_toks
FROM ordered WHERE cum_toks <= 300
""",
    note="per-source token capping: each (over-represented) source is cut "
    "to a 300-token budget in a deterministic pseudo-random order (the "
    "portable id-hash, doc_id tiebreak) — token-denominated downsampling, "
    "the unit that matters for training mixtures (doc-count caps "
    "over-keep long-doc sources). Exact integer window cumsum — no float "
    "boundary class. One hash-shuffle on source; per-source window order "
    "is the hash, so the kept subset is partition-independent. At 100 TB "
    "a hot source's window serializes its partition — the documented "
    "rewrite is the grouped two-phase prefix sum (per-hash-bucket "
    "subtotals, then broadcast offsets), same output, and AQE skew "
    "handling covers the interim",
    tags=("llm", "training", "sample"),
)
def q_llm_source_token_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.where(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    ).select(
        "doc_id",
        "source",
        F.expr("CAST(size(split(LOWER(TRIM(text)), ' ')) AS BIGINT)").alias("tok_cnt"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(id_hash("doc_id"), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        toks.withColumn("cum_toks", F.sum("tok_cnt").over(w).cast("bigint"))
        .where(F.col("cum_toks") <= 300)
        .select("doc_id", "source", "tok_cnt", "cum_toks")
    )


@register(
    "q_llm_decontaminate_substring",
    oracle="""
WITH tr AS (
    SELECT doc_id,
           unnest(list_transform(range(0, ((length(text) - 40) // 20) + 1),
               i -> substring(text, CAST(i * 20 + 1 AS INT), 40))) AS w
    FROM documents WHERE source <> 'src19' AND length(text) >= 40
), evw AS (
    SELECT unnest(list_transform(range(0, length(text) - 40 + 1),
               i -> substring(text, CAST(i + 1 AS INT), 40))) AS w
    FROM documents WHERE source = 'src19' AND length(text) >= 40
), ev AS (
    SELECT DISTINCT list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(str_split(w, ''), c -> CAST(unicode(c) AS BIGINT))),
               (acc, b) -> (acc * 31 + b) % 1000000000000037) AS h
    FROM evw
), trh AS (
    SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(str_split(w, ''), c -> CAST(unicode(c) AS BIGINT))),
               (acc, b) -> (acc * 31 + b) % 1000000000000037) AS h
    FROM tr
)
SELECT trh.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(CASE WHEN ev.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked,
       SUM(CASE WHEN ev.h IS NOT NULL THEN 1 ELSE 0 END) > 0 AS is_contaminated
FROM trh LEFT JOIN ev ON trh.h = ev.h
GROUP BY trh.doc_id
""",
    note="EXACT-SUBSTRING decontamination — the third modality of the "
    "family (n-gram shingles: q_llm_decontaminate; embedding space: "
    "q_llm_decontaminate_semantic; verbatim character runs: here). "
    "Training docs (every non-benchmark source) shingle at stride 20; "
    "the benchmark source (src19) hashes EVERY alignment (stride 1), so "
    "a shared 40-char span is caught wherever it starts — any verbatim "
    "leak of >= 59 chars is caught with certainty (some train stride "
    "window then lies fully inside the run), >= 40 chars with "
    "probability (59 - run_len)/20 of missing. Same portable 31-poly "
    "fold mod the verified 1e15 prime as q_llm_dedup_substring. Output "
    "is the per-doc audit over ALL train docs (window count, leaked "
    "count, flag) rather than the flagged subset, so the certification "
    "exercises the full pipeline even at SFs where the fixture has no "
    "verbatim leak (sf0.01 measures 0 contaminated; sf0.1 measures 24 "
    "docs / 231 leaked windows). Cost shape: linear explode -> one "
    "hash-key semi-join against the DISTINCT eval-window set (tiny, "
    "broadcastable at any realistic eval size) -> one doc-key rollup",
    tags=("llm", "training", "decontaminate"),
)
def q_llm_decontaminate_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from join_example_spark.queries.llm_dedup import (
        _SUBSTR_FOLD_SPARK,
        _SUBSTR_STRIDE,
        _SUBSTR_WIN,
    )

    docs = fanout_repartition(read_table(spark, sf_dir, "documents"))
    long_enough = F.length("text") >= _SUBSTR_WIN
    tr = docs.where((F.col("source") != "src19") & long_enough).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(CAST(0 AS BIGINT),"
                f" (length(text) - {_SUBSTR_WIN}) DIV {_SUBSTR_STRIDE}),"
                f" i -> substring(text, CAST(i * {_SUBSTR_STRIDE} + 1 AS INT),"
                f" {_SUBSTR_WIN}))"
            )
        ).alias("w"),
    )
    ev = (
        docs.where((F.col("source") == "src19") & long_enough)
        .select(
            F.explode(
                F.expr(
                    f"transform(sequence(CAST(0 AS BIGINT),"
                    f" CAST(length(text) - {_SUBSTR_WIN} AS BIGINT)),"
                    f" i -> substring(text, CAST(i + 1 AS INT), {_SUBSTR_WIN}))"
                )
            ).alias("w")
        )
        .select(
            # h is the (non-preserved) right-side key of the left join, so
            # Catalyst infers isnotnull(h) and re-runs the whole char fold
            # in a pushed-down Filter (round-15 plan audit). w is never
            # NULL and the fold is >= 0 — the non-nullable coalesce
            # (unreachable -1 sentinel) is value-identical and stops the
            # inference on both sides.
            F.coalesce(F.expr(_SUBSTR_FOLD_SPARK), F.lit(-1).cast("bigint")).alias("h")
        )
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    trh = tr.select(
        "doc_id",
        F.coalesce(F.expr(_SUBSTR_FOLD_SPARK), F.lit(-1).cast("bigint")).alias("h"),
    )
    leaked = F.sum(F.coalesce(F.col("hit"), F.lit(0)))
    return (
        trh.join(F.broadcast(ev), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
            leaked.cast("bigint").alias("n_leaked"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_leaked",
            (F.col("n_leaked") > 0).alias("is_contaminated"),
        )
    )


@register(
    "q_llm_sample_weighted",
    oracle=f"""
WITH tickets AS (
    SELECT doc_id, n_chars,
           unnest(range(1, LEAST(GREATEST(n_chars // 50, 1), 20) + 1)) AS t
    FROM documents
), hashed AS (
    SELECT doc_id, n_chars, {id_hash_sql("(doc_id * 64 + t)")} AS h
    FROM tickets
), pri AS (
    SELECT doc_id, MAX(n_chars) AS n_chars,
           CAST(MIN(h) AS BIGINT) AS priority
    FROM hashed GROUP BY doc_id
), ranked AS (
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, priority,
           CAST(ROW_NUMBER() OVER (ORDER BY priority, doc_id) AS BIGINT) AS rnk
    FROM pri
)
SELECT doc_id, n_chars, priority, rnk FROM ranked WHERE rnk <= 50 ORDER BY rnk
""",
    note="deterministic WEIGHTED priority sampling (bottom-k over "
    "replicated tickets): each document draws w = clamp(n_chars/50, 1, "
    "20) portable-hash tickets, its priority is the MIN ticket hash, and "
    "the 50 lowest-priority docs win — longer documents draw more "
    "tickets so inclusion probability rises with length (the weighted "
    "generalization of q_llm_sample_hash's uniform bottom-k), while the "
    "whole draw stays a pure function of doc_id: reproducible across "
    "runs, partitionings, AND engines (all-integer portable hash, "
    "total-order tiebreak). The training-mix primitive for 'sample "
    "proportional to token count'. Scale shape: a <=20x map-side ticket "
    "explode of narrow rows, MIN partial-agg combines map-side, top-50 "
    "is TakeOrderedAndProject — no global sort, no rand(), no window "
    "over the corpus",
    tags=("llm", "training", "sampling"),
)
def q_llm_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    tickets = docs.select(
        "doc_id",
        "n_chars",
        F.explode(
            F.expr("sequence(1, LEAST(GREATEST(n_chars DIV 50, 1), 20))")
        ).alias("t"),
    )
    pri = (
        tickets.withColumn("h", id_hash("(doc_id * 64 + t)"))
        .groupBy("doc_id")
        .agg(
            F.max("n_chars").cast("bigint").alias("n_chars"),
            F.min("h").cast("bigint").alias("priority"),
        )
    )
    top = pri.orderBy("priority", "doc_id").limit(50)
    w = Window.orderBy("priority", "doc_id")
    return top.withColumn("rnk", F.row_number().over(w).cast("bigint")).select(
        "doc_id", "n_chars", "priority", "rnk"
    )


@register(
    "q_llm_curate_pipeline",
    oracle=f"""
WITH toked AS (
    SELECT doc_id, n_chars,
           list_distinct(str_split(LOWER(TRIM(text)), ' ')) AS t,
           len(str_split(LOWER(TRIM(text)), ' ')) AS n_tok
    FROM documents
    WHERE source IN ('src0', 'src1') AND text IS NOT NULL
), quality AS (
    SELECT doc_id, n_chars, t FROM toked
    WHERE n_chars >= 100 AND 10 * len(t) >= 3 * n_tok
), pairs AS (
    SELECT b.doc_id AS id_b
    FROM quality a
    JOIN quality b ON a.doc_id < b.doc_id
    WHERE 5 * LEN(list_intersect(a.t, b.t))
          >= 4 * LEN(list_distinct(list_concat(a.t, b.t)))
), survivors AS (
    SELECT q.doc_id, q.n_chars FROM quality q
    WHERE q.doc_id NOT IN (SELECT id_b FROM pairs)
), tickets AS (
    SELECT doc_id, n_chars,
           unnest(range(1, LEAST(GREATEST(n_chars // 50, 1), 20) + 1)) AS tk
    FROM survivors
), pri AS (
    SELECT doc_id, MAX(n_chars) AS n_chars,
           CAST(MIN({id_hash_sql("(doc_id * 64 + tk)")}) AS BIGINT) AS priority
    FROM tickets GROUP BY doc_id
), ranked AS (
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, priority,
           CAST(ROW_NUMBER() OVER (ORDER BY priority, doc_id) AS BIGINT) AS rnk
    FROM pri
)
SELECT doc_id, n_chars, priority, rnk FROM ranked WHERE rnk <= 100 ORDER BY rnk
""",
    note="curation pipeline capstone in ONE plan: quality gate (length "
    "floor + distinct-token ratio >= 0.3, exact integer cross-multiply) "
    "-> LOSSLESS prefix-filtered dedup (keep-lowest-id: drop any doc "
    "with a smaller Jaccard>=1/2 match — greedy keep-first, stated "
    "semantics, not CC-clustering) -> length-weighted priority sample "
    "of 100. The oracle replays the same three stages with the naive "
    "quadratic pair step, so the hash match certifies the composed "
    "pipeline end-to-end, including that the prefix filter loses "
    "nothing INSIDE a composition. Scale shape: each stage is the "
    "already-audited operator (map-side gate; contracted prefix join; "
    "ticket explode + TakeOrderedAndProject) fused by Catalyst into "
    "one DAG — no materialization barriers between stages",
    tags=("llm", "training", "dedup", "sampling"),
)
def q_llm_curate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from join_example_spark.operators.dedup_prefix import prefix_filter_pairs

    # The raw split is materialized once (_t0, referenced twice so
    # CollapseProject keeps it): the old form computed split() separately
    # for t and n_tok, and the pushed-down quality predicate then
    # re-evaluated both split copies AGAIN in a Filter — on BOTH
    # references of the `quality` subplan (round-15 plan audit). The
    # substituted filter now references the _t0 column instead.
    docs = (
        read_table(spark, sf_dir, "documents")
        .where(F.col("source").isin("src0", "src1") & F.col("text").isNotNull())
        .withColumn("_t0", F.expr("split(LOWER(TRIM(text)), ' ')"))
        .select(
            "doc_id",
            "n_chars",
            F.expr("array_distinct(_t0)").alias("t"),
            F.expr("size(_t0)").alias("n_tok"),
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


# DSIR-style importance selection (Xie et al., "Data Selection for
# Language Models via Importance Resampling", NeurIPS 2023): score every
# raw document by how much its hashed-feature distribution looks like a
# small trusted target corpus, then keep the top slice. The published
# method uses hashed n-gram counts and a log-likelihood-ratio weight;
# this operator keeps the hashed-feature machinery but scores with the
# RATIONAL likelihood ratio (sum of target feature counts over sum of
# raw feature counts, each normalized by its corpus total) so the score
# is one IEEE division of exact int64 products — bit-identical across
# engines with no log() in sight (log is not correctly-rounded-portable).
_DSIR_BUCKETS = 8192


@register(
    "q_llm_select_dsir",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, lang, unnest(str_split(LOWER(TRIM(text)), ' ')) AS tok
    FROM documents
), hashed AS (
    SELECT doc_id, lang, {str_hash_sql("tok")} % {_DSIR_BUCKETS} AS f
    FROM toks
), stats AS (
    SELECT f,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1 AS BIGINT) AS ct,
           CAST(COUNT(*) + 1 AS BIGINT) AS cr
    FROM hashed GROUP BY f
), totals AS (
    SELECT CAST(SUM(ct) AS BIGINT) AS nt, CAST(SUM(cr) AS BIGINT) AS nr
    FROM stats
), scored AS (
    SELECT h.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_toks,
           CAST(SUM(s.ct) AS BIGINT) AS sum_target,
           CAST(SUM(s.cr) AS BIGINT) AS sum_raw
    FROM hashed h JOIN stats s USING (f)
    GROUP BY h.doc_id
)
SELECT doc_id, n_toks, sum_target, sum_raw,
       CAST(sum_target * nr AS DOUBLE) / CAST(sum_raw * nt AS DOUBLE) AS score
FROM scored, totals
ORDER BY score DESC, doc_id
LIMIT 100
""",
    note="DSIR-style data selection (hashed-feature importance weights, "
    "Xie et al. 2023): tokens hash into 8192 buckets with the portable "
    "char fold; per-bucket add-one counts are taken over the trusted "
    "target slice (lang='en') and the whole raw corpus; a document's "
    "importance is the RATIONAL likelihood ratio "
    "(sum_target/Nt)/(sum_raw/Nr), computed as one IEEE division of "
    "exact int64 cross-products (no log(), which is not portable) — "
    "top-100 by (score, doc_id) win. Scale shape: token explode is "
    "map-side, the bucket histogram is one shuffle to a FIXED 8192 rows "
    "then broadcast back, the doc rollup is one doc_id shuffle, and the "
    "selection is TakeOrderedAndProject — no global window, no "
    "quadratic step; at 100 TB the histogram stays 8192 rows regardless "
    "of corpus size, which is exactly why DSIR hashes features",
    tags=("llm", "training", "sample"),
)
def q_llm_select_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from join_example_spark.operators.sampling import str_hash

    docs = read_table(spark, sf_dir, "documents")
    # f is both the histogram groupBy key and the broadcast-join key:
    # Catalyst infers isnotnull(f) and re-runs the whole char-fold mix in
    # a pushed-down Filter on BOTH references of `hashed` (round-15 plan
    # audit). tok is never NULL (explode of a split array), so the
    # non-nullable coalesce (the -1 sentinel is outside [0, 8192)) is
    # value-identical and stops the inference.
    hashed = docs.select(
        "doc_id",
        "lang",
        F.explode(F.expr("split(LOWER(TRIM(text)), ' ')")).alias("tok"),
    ).select(
        "doc_id",
        "lang",
        F.coalesce(
            str_hash("tok") % _DSIR_BUCKETS, F.lit(-1).cast("bigint")
        ).alias("f"),
    )
    stats = hashed.groupBy("f").agg(
        (F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)) + 1)
        .cast("bigint")
        .alias("ct"),
        (F.count(F.lit(1)) + 1).cast("bigint").alias("cr"),
    )
    from pyspark.sql import Window

    # Corpus totals ride the stats relation as unpartitioned windows over
    # the FIXED 8192-row histogram (and survive the doc rollup as MAX) —
    # a separate agg+crossJoin would reference `stats` twice and re-run
    # the token-histogram shuffle (SCALE.md §3.4 rule).
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


@register(
    "q_llm_shard_plan",
    oracle=f"""
WITH assigned AS (
    SELECT doc_id,
           {id_hash_sql("doc_id")} % 16 AS shard,
           len(str_split(LOWER(TRIM(text)), ' ')) AS n_tok,
           n_chars
    FROM documents
), per_shard AS (
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM assigned GROUP BY shard
), total AS (
    SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM per_shard
)
SELECT shard, n_docs, sum_tokens, sum_chars, min_doc, max_doc,
       CAST(n_docs * 16 AS DOUBLE) / CAST(n_total AS DOUBLE) AS balance
FROM per_shard, total
ORDER BY shard
""",
    note="deterministic training-shard plan: every document lands in "
    "shard = portable_id_hash(doc_id) % 16 (map-side, reproducible "
    "across runs/partitionings/engines — the property a resumable "
    "training job needs so shard 7 is the SAME shard 7 tomorrow); the "
    "output is the shard manifest a writer would act on — per-shard doc "
    "count, token and char volume, id range, and a balance factor "
    "(n_docs*16/total, one exact int64/int64 IEEE division; 1.0 = "
    "perfectly even) that audits hash-shard skew before any bytes are "
    "written. Scale shape: one rollup shuffle to 16 rows; the total is "
    "a window over that 16-row manifest (one subplan reference — no "
    "re-execution); the real writer is then df.repartition(shard)."
    "write — the manifest and the data path share the same hash",
    tags=("llm", "training", "shard"),
)
def q_llm_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    assigned = docs.select(
        "doc_id",
        (id_hash("doc_id") % 16).alias("shard"),
        F.expr("size(split(LOWER(TRIM(text)), ' '))").alias("n_tok"),
        "n_chars",
    )
    per_shard = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("sum_tokens"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.min("doc_id").cast("bigint").alias("min_doc"),
        F.max("doc_id").cast("bigint").alias("max_doc"),
    )
    from pyspark.sql import Window

    # Total via an unpartitioned window over the 16-row manifest — an
    # agg+crossJoin would reference `per_shard` twice and re-execute the
    # corpus rollup (SCALE.md §3.4 rule).
    n_total = F.sum("n_docs").over(Window.partitionBy()).cast("bigint")
    return (
        per_shard.select(
            F.col("shard").cast("bigint").alias("shard"),
            "n_docs",
            "sum_tokens",
            "sum_chars",
            "min_doc",
            "max_doc",
            (
                (F.col("n_docs") * F.lit(16)).cast("double")
                / n_total.cast("double")
            ).alias("balance"),
        )
        .orderBy("shard")
    )


@register(
    "q_llm_mix_epochs",
    oracle="""
WITH avail AS (
    SELECT source,
           CAST(SUM(len(str_split(LOWER(TRIM(text)), ' '))) AS BIGINT) AS avail_tokens
    FROM documents
    GROUP BY source
), budgeted AS (
    SELECT source, avail_tokens,
           4 * avail_tokens AS cap_tokens,
           CAST(2 * SUM(avail_tokens) OVER () AS BIGINT) AS budget,
           CAST(COUNT(*) OVER () AS BIGINT) AS n,
           CAST(ROW_NUMBER() OVER (ORDER BY 4 * avail_tokens, source)
                AS BIGINT) AS i,
           CAST(COALESCE(SUM(4 * avail_tokens) OVER (
                ORDER BY 4 * avail_tokens, source
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS p_before
    FROM avail
), flagged AS (
    SELECT *,
           CASE WHEN cap_tokens * (n - i + 1) <= budget - p_before
                THEN 1 ELSE 0 END AS saturated
    FROM budgeted
), k AS (
    SELECT CAST(SUM(saturated) AS BIGINT) AS k,
           CAST(SUM(saturated * cap_tokens) AS BIGINT) AS p_k,
           MAX(budget) AS budget, MAX(n) AS n
    FROM flagged
), alloc AS (
    SELECT f.source, f.avail_tokens, f.cap_tokens, f.saturated,
           CASE
             WHEN f.saturated = 1 THEN f.cap_tokens
             ELSE (k.budget - k.p_k) // (k.n - k.k)
                  + CASE WHEN f.i - k.k <= (k.budget - k.p_k) % (k.n - k.k)
                         THEN 1 ELSE 0 END
           END AS alloc_tokens
    FROM flagged f, k
)
SELECT source, avail_tokens, CAST(cap_tokens AS BIGINT) AS cap_tokens,
       CAST(saturated AS BIGINT) AS saturated,
       CAST(alloc_tokens AS BIGINT) AS alloc_tokens,
       CAST(alloc_tokens AS DOUBLE) / CAST(avail_tokens AS DOUBLE) AS epochs
FROM alloc
""",
    note="data-constrained mixture allocation (the repeat-epochs question "
    "of Muennighoff et al. 2023): split a training token budget (2x the "
    "corpus here) EQUALLY across sources by water-filling under a "
    "4-epoch repeat cap — sources too small to absorb their equal share "
    "saturate at 4 epochs and the leftover redistributes to the rest. "
    "Kept INTEGER-EXACT end-to-end: sort sources by cap, the saturated "
    "set is the prefix where cap_i*(n-i+1) <= budget - prefix_sum (a "
    "monotone all-integer test, so one window pass finds it), the free "
    "sources get DIV/MOD shares with the remainder assigned by the same "
    "total order, and epochs = one closing int64/int64 division. Scale "
    "shape: one source rollup is the only corpus-sized work; the "
    "water-filling runs on the |sources| spine (20 rows here, maybe 1e4 "
    "on a real crawl — always a broadcastable dimension)",
    tags=("llm", "training", "sample"),
)
def q_llm_mix_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    avail = docs.groupBy("source").agg(
        F.sum(F.expr("size(split(LOWER(TRIM(text)), ' '))"))
        .cast("bigint")
        .alias("avail_tokens")
    )
    cap = (F.lit(4).cast("bigint") * F.col("avail_tokens")).alias("cap_tokens")
    w_all = Window.partitionBy()
    w_ord = Window.orderBy(F.col("cap_tokens"), F.col("source"))
    budgeted = avail.select("source", "avail_tokens", cap).select(
        "source",
        "avail_tokens",
        "cap_tokens",
        (F.lit(2).cast("bigint") * F.sum("avail_tokens").over(w_all))
        .cast("bigint")
        .alias("budget"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
        F.row_number().over(w_ord).cast("bigint").alias("i"),
        F.coalesce(
            F.sum("cap_tokens").over(
                w_ord.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("p_before"),
    )
    flagged = budgeted.withColumn(
        "saturated",
        F.when(
            F.col("cap_tokens") * (F.col("n") - F.col("i") + 1)
            <= F.col("budget") - F.col("p_before"),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    # Saturated-set totals as unpartitioned windows over the |sources|
    # spine — an agg+crossJoin would reference `flagged` twice and
    # re-execute the corpus rollup (SCALE.md §3.4 rule).
    w_tot = Window.partitionBy()
    sat = flagged.select(
        "source",
        "avail_tokens",
        "cap_tokens",
        "i",
        "saturated",
        F.sum("saturated").over(w_tot).cast("bigint").alias("k"),
        F.sum(F.col("saturated") * F.col("cap_tokens"))
        .over(w_tot)
        .cast("bigint")
        .alias("p_k"),
        "budget",
        "n",
    )
    leftover = F.col("budget") - F.col("p_k")
    n_free = F.col("n") - F.col("k")
    alloc = sat.select(
        "source",
        "avail_tokens",
        "cap_tokens",
        F.col("saturated").cast("bigint").alias("saturated"),
        F.when(F.col("saturated") == 1, F.col("cap_tokens"))
        .otherwise(
            F.expr("(budget - p_k) DIV (n - k)")
            + F.when(
                F.col("i") - F.col("k") <= leftover % n_free, F.lit(1)
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("alloc_tokens"),
    )
    return alloc.select(
        "source",
        "avail_tokens",
        "cap_tokens",
        "saturated",
        "alloc_tokens",
        (
            F.col("alloc_tokens").cast("double")
            / F.col("avail_tokens").cast("double")
        ).alias("epochs"),
    )
