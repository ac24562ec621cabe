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
from join_example_spark.sources.readers import read_table


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
    docs = read_table(spark, sf_dir, "documents")
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
    docs = read_table(spark, sf_dir, "documents")
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
