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

from join_example_spark.multimodal import (
    decode_media,
    documents_as_media,
    resize_stub,
)
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
    resized = resize_stub(decoded, max_side=256)
    return decoded.select("media_id", "n_bytes", "width", "height", "checksum").join(
        resized.select("media_id", "out_width", "out_height"), "media_id"
    )
