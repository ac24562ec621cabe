"""§2.10 — corpus-cleaning operators: repetition filters and PII redaction.

Gopher-style repetition signals (top-word / top-bigram fractions) computed
shuffle-free via higher-order functions, and a regexp PII-redaction pass.
The fixture corpus contains no real PII, so the redaction query first
augments each document with a deterministic synthetic contact string
(derived from ``doc_id``) — the operator is exercised with exactly one
email and one phone hit per document, and the oracle replays the identical
augmentation, so byte-parity of the redacted text is provable via md5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from join_example_spark.operators.text import (
    EMAIL_PATTERN,
    PHONE_PATTERN,
    redact_pii,
    repetition_features,
)
from join_example_spark.registry import register
from join_example_spark.sources.readers import fanout_repartition, read_table


@register(
    "q_llm_repetition",
    oracle="""
WITH w AS (
    SELECT doc_id, string_split(TRIM(text), ' ') AS words FROM documents
), b AS (
    SELECT doc_id, words, CAST(LEN(words) AS BIGINT) AS n_tokens,
           CASE WHEN LEN(words) >= 2 THEN
               list_transform(generate_series(1, LEN(words) - 1),
                              i -> words[i] || ' ' || words[i + 1])
           ELSE [] END AS bigrams
    FROM w
)
SELECT doc_id, n_tokens,
       CAST(list_max(list_transform(list_distinct(words),
                t -> len(list_filter(words, x -> x = t)))) AS DOUBLE)
         / n_tokens AS top_word_frac,
       CASE WHEN LEN(bigrams) >= 1 THEN
           CAST(list_max(list_transform(list_distinct(bigrams),
                    t -> len(list_filter(bigrams, x -> x = t)))) AS DOUBLE)
             / LEN(bigrams)
       ELSE NULL END AS top_bigram_frac
FROM b
""",
    note="Gopher-style repetition signals (top word/bigram fraction), zero-shuffle map",
    tags=("llm", "text", "cleaning"),
)
def q_llm_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fanout_repartition(read_table(spark, sf_dir, "documents"))
    return repetition_features(docs).select(
        "doc_id", "n_tokens", "top_word_frac", "top_bigram_frac"
    )


#: Deterministic synthetic contact suffix (the corpus has no real PII).
_AUGMENT_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@mail.example.com or +1-555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


@register(
    "q_llm_pii_redact",
    oracle=f"""
WITH aug AS (
    SELECT doc_id, {_AUGMENT_SQL} AS contact_text FROM documents
), red AS (
    SELECT doc_id, contact_text,
           regexp_replace(
               regexp_replace(contact_text, '{EMAIL_PATTERN}', '<EMAIL>', 'g'),
               '{PHONE_PATTERN}', '<PHONE>', 'g') AS redacted
    FROM aug
)
SELECT doc_id,
       CAST(len(regexp_extract_all(contact_text, '{EMAIL_PATTERN}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(contact_text, '{PHONE_PATTERN}')) AS BIGINT) AS n_phones,
       md5(redacted) AS redacted_md5,
       CAST(LENGTH(redacted) AS BIGINT) AS redacted_len
FROM red
""",
    note="PII redaction (email/phone regexp) over synthetically-augmented docs; md5 proves byte parity",
    tags=("llm", "text", "cleaning"),
)
def q_llm_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fanout_repartition(read_table(spark, sf_dir, "documents"))
    aug = docs.select(
        "doc_id",
        F.expr(
            "text || ' contact user' || CAST(doc_id AS STRING) || "
            "'@mail.example.com or +1-555-' || "
            "lpad(CAST(doc_id % 10000 AS STRING), 4, '0')"
        ).alias("contact_text"),
    )
    red = redact_pii(aug, text_col="contact_text", out_col="redacted")
    return red.select(
        "doc_id",
        F.regexp_count("contact_text", F.lit(EMAIL_PATTERN)).cast("bigint").alias("n_emails"),
        F.regexp_count("contact_text", F.lit(PHONE_PATTERN)).cast("bigint").alias("n_phones"),
        F.md5("redacted").alias("redacted_md5"),
        F.length("redacted").cast("bigint").alias("redacted_len"),
    )

@register(
    "q_llm_char_entropy",
    oracle="""
WITH pref AS (
    SELECT doc_id, LEFT(text, 512) AS p, LENGTH(LEFT(text, 512)) AS n
    FROM documents
), chars AS (
    SELECT doc_id, n, unnest(string_split(p, '')) AS ch
    FROM pref
), counts AS (
    SELECT doc_id, n, ch, COUNT(*) AS c
    FROM chars GROUP BY doc_id, n, ch
)
SELECT doc_id,
       CAST(n AS BIGINT) AS prefix_len,
       CAST(COUNT(*) AS BIGINT) AS distinct_chars,
       CAST(ROUND(SUM(CAST((CAST(c AS DOUBLE) / n) * ln(CAST(n AS DOUBLE) / c)
                           AS DECIMAL(25,6))), 4) AS DOUBLE) AS char_entropy
FROM counts
GROUP BY doc_id, n
""",
    note="Shannon character entropy over a 512-char prefix — the "
    "compressibility / perplexity proxy used to screen boilerplate and "
    "gibberish in corpus filtering. The prefix cap bounds the char-level "
    "explode to 512 rows/doc regardless of document size, so the two "
    "shuffles (per-(doc,char) count, per-doc fold) move bounded data at "
    "100 TB. Each -(p)ln(p) term is an identical IEEE expression on both "
    "sides; the per-doc fold runs through the decimal bridge so summation "
    "order cannot flip the output, and the ROUND happens in exact decimal "
    "space BEFORE the double cast — ROUND(double, 4) is engine-divergent "
    "when the exact sum lands on a ...50 half-boundary (observed at sf0.01)",
    tags=("llm", "text"),
)
def q_llm_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    pref = docs.select(
        "doc_id",
        F.substring("text", 1, 512).alias("p"),
        F.length(F.substring("text", 1, 512)).alias("n"),
    )
    chars = pref.select(
        "doc_id", "n", F.explode(F.split("p", "")).alias("ch")
    )
    counts = chars.groupBy("doc_id", "n", "ch").agg(
        F.count(F.lit(1)).alias("c")
    )
    term = "(CAST(c AS DOUBLE) / n) * ln(CAST(n AS DOUBLE) / c)"
    return (
        counts.groupBy("doc_id", "n")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("distinct_chars"),
            F.expr(
                f"CAST(ROUND(SUM(CAST({term} AS DECIMAL(25,6))), 4) AS DOUBLE)"
            ).alias("char_entropy"),
        )
        .select(
            "doc_id",
            F.col("n").cast("bigint").alias("prefix_len"),
            "distinct_chars",
            "char_entropy",
        )
    )


@register(
    "q_llm_quality_gate",
    oracle="""
WITH scored AS (
    SELECT doc_id, lang,
           CAST(LEN(list_distinct(string_split(LOWER(TRIM(text)), ' '))) AS DOUBLE)
             / CAST(LEN(string_split(LOWER(TRIM(text)), ' ')) AS DOUBLE) AS score
    FROM documents
    WHERE text IS NOT NULL AND LEN(TRIM(text)) > 0
),
ranked AS (
    SELECT doc_id, lang, score,
           CAST(ntile(4) OVER (PARTITION BY lang ORDER BY score, doc_id) AS BIGINT)
               AS quartile
    FROM scored
)
SELECT doc_id, lang, score, quartile
FROM ranked
WHERE quartile > 1
""",
    note="per-language quality-quantile curation gate: score = distinct-"
    "token ratio (exact int ratio — bit-stable), docs in the BOTTOM "
    "quartile of their own language are dropped. The threshold is RANK-"
    "based (ntile with a unique doc_id tiebreak), not a float-"
    "interpolated percentile value, so the keep/drop boundary is bit-"
    "exact on both engines and under any partitioning. The real-corpus "
    "pattern: per-language thresholds avoid high-resource languages "
    "setting the bar for low-resource ones. One window shuffle on lang",
    tags=("llm", "cleaning", "quality"),
)
def q_llm_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    scored = (
        read_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & (F.length(F.trim("text")) > 0))
        .select(
            "doc_id",
            "lang",
            F.expr(
                "CAST(size(array_distinct(split(LOWER(TRIM(text)), ' '))) AS DOUBLE)"
                " / CAST(size(split(LOWER(TRIM(text)), ' ')) AS DOUBLE)"
            ).alias("score"),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.col("score"), F.col("doc_id"))
    return (
        scored.withColumn("quartile", F.ntile(4).over(w).cast("bigint"))
        .where(F.col("quartile") > 1)
        .select("doc_id", "lang", "score", "quartile")
    )


@register(
    "q_llm_bigram_surprisal",
    oracle="""
WITH toks AS (
    SELECT doc_id, string_split(LOWER(TRIM(text)), ' ') AS t
    FROM documents
    WHERE text IS NOT NULL AND LEN(TRIM(text)) > 0
),
occ AS (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i + 1])) AS bg
    FROM toks
),
gcounts AS (
    SELECT bg, COUNT(*) AS c FROM occ GROUP BY bg
),
tot AS (
    SELECT COUNT(*) AS n FROM occ
),
agg AS (
    SELECT o.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(ROUND(SUM(CAST(ln(CAST(t.n AS DOUBLE) / g.c) AS DECIMAL(25,6))), 4)
                AS DOUBLE) AS surprisal_sum
    FROM occ o
    JOIN gcounts g USING (bg)
    CROSS JOIN tot t
    GROUP BY o.doc_id
)
SELECT doc_id, n_bigrams, surprisal_sum,
       surprisal_sum / n_bigrams AS avg_surprisal
FROM agg
""",
    note="corpus-LM quality score: mean bigram surprisal ln(N/c) of each "
    "document against the corpus's own bigram statistics — the cheap "
    "perplexity stand-in used to flag gibberish (high surprisal) and "
    "boilerplate (low) without an external model. Plan: one explode + "
    "count shuffle for the global bigram table, one broadcast of the "
    "1-row total, one equi-join occurrences->counts, one per-doc fold. "
    "Each ln term is an identical IEEE expression both sides; the per-doc "
    "fold runs the decimal bridge with ROUND in exact decimal space "
    "(q_llm_char_entropy's pattern), and avg is ONE IEEE division of "
    "identical operands. At 100 TB the bigram table is the only wide "
    "shuffle and it compacts to (bigram, count)",
    tags=("llm", "cleaning", "quality"),
)
def q_llm_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        read_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & (F.length(F.trim("text")) > 0))
        .select("doc_id", F.expr("split(LOWER(TRIM(text)), ' ')").alias("t"))
    )
    occ = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
                " (tok, i) -> concat(tok, ' ', t[i + 1]))"
            )
        ).alias("bg"),
    )
    # Materialize the compact (bigram, count) table once: the total then
    # derives from it for free and the verify join reads the materialized
    # table instead of re-scanning + re-exploding the corpus (plan went
    # from 3 FileScans to 2 — the remaining two are the one global-count
    # pass and the one scoring pass, the floor for any global-stats score).
    gcounts = (
        occ.groupBy("bg").agg(F.count(F.lit(1)).alias("c")).localCheckpoint(eager=True)
    )
    tot = gcounts.agg(F.sum("c").cast("bigint").alias("n"))
    term = "ln(CAST(n AS DOUBLE) / c)"
    agg = (
        occ.join(gcounts, "bg")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_bigrams"),
            F.expr(
                f"CAST(ROUND(SUM(CAST({term} AS DECIMAL(25,6))), 4) AS DOUBLE)"
            ).alias("surprisal_sum"),
        )
    )
    return agg.select(
        "doc_id",
        "n_bigrams",
        "surprisal_sum",
        (F.col("surprisal_sum") / F.col("n_bigrams")).alias("avg_surprisal"),
    )
