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
        assert feats[i].width == 8 + (i * 7) % 56
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
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        media.resize_images(df, 64, 64).collect()
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        media.sample_frames(df, 10).collect()


def test_resize_images_nearest_neighbor(spark):
    import numpy as np
    import struct

    df = media.synth_media(spark, 12)
    out = {r.media_id: bytes(r.payload)
           for r in media.resize_images(df, 10, 6).collect()}
    assert len(out) == 12
    for i in (0, 5, 11):
        src = media.fake_payload(i)
        w, h, frames = struct.unpack_from("<HHH", src, 4)
        planes = np.frombuffer(src, np.uint8, offset=10).reshape(
            frames, h, w)
        yi = (np.arange(6) * h) // 6
        xi = (np.arange(10) * w) // 10
        want = planes[:, yi][:, :, xi].tobytes()
        got = out[i]
        gw, gh, gf = struct.unpack_from("<HHH", got, 4)
        assert (gw, gh, gf) == (10, 6, frames)
        assert got[10:] == want
    # resized payloads re-enter the pipeline (still valid ZMK1)
    feats = media.extract_features(media.resize_images(df, 10, 6))
    assert feats.count() == 12


def test_sample_frames(spark):
    import numpy as np
    import struct

    df = media.synth_media(spark, 12)
    rows = media.sample_frames(df, 2).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    for i in range(12):
        frames = 1 + (i % 5)
        want_idx = list(range(0, frames, 2))
        got = sorted(by_media[i], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in got] == want_idx
        src = media.fake_payload(i)
        w, h, _ = struct.unpack_from("<HHH", src, 4)
        planes = np.frombuffer(src, np.uint8, offset=10).reshape(-1, h, w)
        for r in got:
            assert bytes(r.frame) == planes[r.frame_idx].tobytes()
