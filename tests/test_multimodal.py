"""Multimodal plumbing: binary columns + Arrow-batched mapInPandas decode."""

from __future__ import annotations

from cdc_poc_spark.operators import multimodal
from cdc_poc_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def test_media_schema_roundtrip(spark):
    media = multimodal.synthesize_media(load_table(spark, SF, "documents"))
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "media_type",
        "content",
        "metadata",
    ]
    row = media.filter("media_id = 0").collect()[0]
    assert isinstance(row.content, (bytes, bytearray))
    assert row.metadata.n_bytes == len(row.content)


def test_decode_features_deterministic(spark):
    media = multimodal.synthesize_media(load_table(spark, SF, "documents"))
    feats = multimodal.decode_features(media)
    a = sorted(map(str, feats.collect()))
    b = sorted(map(str, feats.collect()))
    assert a == b
    one = feats.filter("media_id = 0").collect()[0]
    assert one.width == 16 + one.n_bytes % 1024
    assert one.n_frames == (1 if one.media_type == "image" else 1 + one.n_bytes % 240)


def test_media_stats_covers_all_types(spark):
    media = multimodal.synthesize_media(load_table(spark, SF, "documents"))
    stats = multimodal.media_stats(multimodal.decode_features(media))
    got = {r.media_type: r.n_media for r in stats.collect()}
    assert set(got) == {"image", "audio", "video"}
    assert sum(got.values()) == load_table(spark, SF, "documents").count()
