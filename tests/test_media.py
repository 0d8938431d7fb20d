"""Multimodal binary-column plumbing: feature extraction via mapInPandas
and the .zseq roundtrip of binary payload columns."""

import pytest

from zseq import media


def test_extract_features(spark):
    df = media.synth_media(spark, 50)
    feats = {r.media_id: r for r in media.extract_features(df).collect()}
    assert len(feats) == 50
    for i in (0, 7, 49):
        p = media.fake_payload(i)
        assert feats[i].payload_bytes == len(p)
        assert feats[i].width == 16 + (i * 7) % 240
        assert feats[i].frames == 1 + (i % 5)


def test_media_zseq_roundtrip(spark, tmp_path):
    from zseq import decode as zdec
    from zseq import encode as zenc

    df = media.synth_media(spark, 40)
    out = str(tmp_path / "media")
    zenc.encode(df, out, partitions=2, mode="hash",
                partition_col="media_id")
    back = zdec.decode(spark, out)
    a = sorted((r.media_id, bytes(r.payload)) for r in df.collect())
    b = sorted((r.media_id, bytes(r.payload)) for r in back.collect())
    assert a == b


def test_real_decode_is_stubbed(spark):
    df = spark.createDataFrame(
        [(1, "image", b"\x89PNG....", "x")], media.MEDIA_SPARK_SCHEMA)
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        media.extract_features(df).collect()
    with pytest.raises(NotImplementedError):
        media.resize_images(df, 64, 64)
    with pytest.raises(NotImplementedError):
        media.sample_frames(df, 10)
