"""§2.10 multimodal — the binary-column pipeline as a declared query.

The pipeline is: documents → binary media rows (payload = UTF-8 bytes) →
Arrow-batched ``mapInPandas`` decode (stubbed codec, real plumbing) →
metadata-level resize plan. The stub decoder derives width/height/checksum
deterministically from the payload bytes, and the corpus is pure ASCII
(verified: max codepoint 121), so the whole pipeline — including the
Python/Arrow round-trip — has an exact SQL twin: the oracle recomputes the
byte-fold checksum from character codes. A full hash-match here certifies
the Arrow boundary itself, not just JVM expressions.

This is the one sanctioned Python-boundary family in the batch surface
(tagged ``multimodal``; the no-Python-UDF plan audit exempts the tag).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from join_example_spark.multimodal import decode_media, documents_as_media
from join_example_spark.registry import register
from join_example_spark.sources.readers import read_table


@register(
    "q_multimodal_decode",
    oracle="""
WITH media AS (
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(str_split(substr(text, 1, 256), ''),
                   c -> CAST(unicode(c) AS BIGINT))),
               (acc, b) -> (acc * 131 + b) % 1000000007) AS checksum
    FROM documents
), decoded AS (
    SELECT media_id, n_bytes, checksum,
           64 + (checksum % 1024) AS width,
           64 + ((checksum // 1024) % 1024) AS height
    FROM media
)
SELECT media_id, n_bytes, width, height, checksum,
       CAST(ROUND(width * LEAST(1.0, 256.0 / GREATEST(width, height))) AS BIGINT)
           AS out_width,
       CAST(ROUND(height * LEAST(1.0, 256.0 / GREATEST(width, height))) AS BIGINT)
           AS out_height
FROM decoded
""",
    note="binary media pipeline: encode -> Arrow mapInPandas decode (stub "
    "codec) -> resize plan. Oracle recomputes the byte-fold from ASCII "
    "char codes, certifying the Python/Arrow round-trip bit-for-bit",
    tags=("multimodal", "llm"),
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    decoded = decode_media(documents_as_media(docs))
    # Resize dims computed inline on the SAME decode pass: Spark does not
    # CSE mapInPandas subtrees, so a decoded-join-resize(decoded) shape
    # would run the Python decode twice plus a shuffle join.
    scale = F.least(
        F.lit(1.0), F.lit(256.0) / F.greatest("width", "height").cast("double")
    )
    return decoded.select(
        "media_id",
        "n_bytes",
        "width",
        "height",
        "checksum",
        F.round(F.col("width") * scale).cast("bigint").alias("out_width"),
        F.round(F.col("height") * scale).cast("bigint").alias("out_height"),
    )


@register(
    "q_multimodal_frames",
    oracle="""
WITH media AS (
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents WHERE doc_id < 200
), plan AS (
    SELECT media_id,
           LEAST((n_bytes // 100) + 1, 32) AS n_frames
    FROM media
)
SELECT media_id,
       CAST(unnest(generate_series(0, n_frames - 1)) AS BIGINT) AS frame_idx
FROM plan
""",
    note="video frame-sampling plan: per-row frame-index explode with the "
    "payload kept OUT of the exploded rows (don't replicate blobs across "
    "frames — the 100 TB pattern); duration proxied by payload size (stub)",
    tags=("multimodal", "llm"),
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from join_example_spark.multimodal import documents_as_media, frame_sample_plan

    docs = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    plan = frame_sample_plan(documents_as_media(docs))
    return plan.select("media_id", F.col("frame_idx").cast("bigint").alias("frame_idx"))


@register(
    "q_multimodal_prune",
    oracle="""
WITH media AS (
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(str_split(substr(text, 1, 256), ''),
                   c -> CAST(unicode(c) AS BIGINT))),
               (acc, b) -> (acc * 131 + b) % 1000000007) AS checksum
    FROM documents
    WHERE lang = 'en' AND n_chars >= 200
)
SELECT media_id, n_bytes, checksum,
       64 + (checksum % 1024) AS width,
       64 + ((checksum // 1024) % 1024) AS height
FROM media
""",
    note="decode-after-prune ordering: the typed-metadata predicate (lang, "
    "n_chars) is pushed to the parquet scan, so only the surviving rows "
    "ever cross the Arrow boundary into the Python decode — at 100 TB the "
    "filter saves the decode, not just the output. Plan-audited: "
    "PushedFilters on the scan below the mapInPandas stage",
    tags=("multimodal", "llm"),
)
def q_multimodal_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").where(
        (F.col("lang") == "en") & (F.col("n_chars") >= 200)
    )
    decoded = decode_media(documents_as_media(docs))
    return decoded.select("media_id", "n_bytes", "checksum", "width", "height")
