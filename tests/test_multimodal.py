from __future__ import annotations

from pyspark.sql import functions as F

from join_example_spark.multimodal import (
    decode_media,
    documents_as_media,
    frame_sample_plan,
    resize_stub,
)
from join_example_spark.sources.readers import read_table
from tests.conftest import SF_SMOKE


def test_media_schema_and_decode_roundtrip(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    media = documents_as_media(docs)
    decoded = decode_media(media)
    rows = decoded.limit(5).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.width >= 64 and r.height >= 64
        assert 0 <= r.checksum < 1_000_000_007
    # determinism: same input -> same features
    again = decode_media(media).limit(5).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_decode_preserves_rowcount_and_prunes_payload(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    media = documents_as_media(docs)
    assert decode_media(media).count() == docs.count()
    # metadata-only query must not read the payload column at all
    meta_only = media.select("media_id", "n_bytes").where(F.col("n_bytes") > 100)
    plan = meta_only._jdf.queryExecution().optimizedPlan().toString()
    assert "payload" not in plan


def test_resize_plan_bounds(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    decoded = decode_media(documents_as_media(docs))
    resized = resize_stub(decoded, max_side=256)
    bad = resized.where(
        (F.col("out_width") > 256) | (F.col("out_height") > 256)
    ).count()
    assert bad == 0


def test_frame_sample_plan_shape(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    media = documents_as_media(docs)
    plan = frame_sample_plan(media)
    agg = plan.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).agg(
        F.max("n").alias("mx"), F.min("n").alias("mn")
    ).collect()[0]
    assert 1 <= agg.mn and agg.mx <= 32
