"""Multimodal plumbing: schemas, batch shapes, determinism, stub gating."""

import pytest
from pyspark.sql import functions as F

from bano_spark.operators import multimodal as M


def test_media_table_schema_and_determinism(spark):
    a = M.synth_media(spark, 60, partitions=2).orderBy("media_id").collect()
    b = M.synth_media(spark, 60, partitions=5).orderBy("media_id").collect()
    assert [bytes(r.payload) for r in a] == [bytes(r.payload) for r in b]
    assert a[0].meta.n_bytes == len(bytes(a[0].payload))
    assert {r.kind for r in a} == {"image", "audio", "video"}


def test_image_features_fake_decoder(spark):
    media = M.synth_media(spark, 90, partitions=3)
    feats = M.image_features(media, fake=True).orderBy("media_id").collect()
    assert len(feats) == 30  # every 3rd row is an image
    f = feats[0]
    assert f.width >= 16 and f.height >= 16 and 1 <= f.n_channels <= 3
    assert 0.0 <= f.mean_pixel <= 1.0 and len(f.phash) == 16
    # deterministic across partitionings
    again = M.image_features(M.synth_media(spark, 90, partitions=7),
                             fake=True).orderBy("media_id").collect()
    assert [r.phash for r in feats] == [r.phash for r in again]


def test_decode_stub_raises_without_fake(spark):
    if M.image_codec_available():
        pytest.skip("Pillow importable — real decoder path active")
    media = M.synth_media(spark, 9, partitions=1)
    # plan-build-time raise (driver side), no job launched
    with pytest.raises(NotImplementedError, match="Pillow"):
        M.image_features(media, fake=False)


def test_frame_sampling_one_to_many(spark):
    media = M.synth_media(spark, 90, partitions=3)
    frames = M.sample_frames(media, every_n=2, fake=True)
    rows = frames.collect()
    assert len(rows) > 30  # videos expand to multiple frames
    per = frames.groupBy("media_id").count().collect()
    assert all(r["count"] >= 1 for r in per)
    assert all(r.frame_idx % 2 == 0 for r in rows)


def test_audio_features_fake_path(spark):
    from bano_spark.operators.multimodal import audio_features, synth_media

    media = synth_media(spark, 30)
    out = audio_features(media, fake=True).collect()
    # ids with id % 3 == 1 are audio
    assert {r.media_id for r in out} == {i for i in range(30) if i % 3 == 1}
    for r in out:
        plen = 32 + (r.media_id % 5) * 64
        assert r.n_samples == (plen - 4) * 2
        assert r.sample_rate in (8000, 12000, 16000, 20000)
        assert r.duration_ms == r.n_samples * 1000 // r.sample_rate
        assert 0.0 <= r.mean_amp <= 1.0


def test_audio_features_codec_guard(spark):
    if M.audio_codec_available():
        pytest.skip("soundfile importable — real decoder path active")
    media = M.synth_media(spark, 6)
    with pytest.raises(NotImplementedError, match="soundfile"):
        M.audio_features(media, fake=False)


def test_video_codec_guard(spark):
    if M.video_codec_available():
        pytest.skip("PyAV/OpenCV importable — real demuxer path active")
    media = M.synth_media(spark, 6)
    with pytest.raises(NotImplementedError, match="PyAV|OpenCV"):
        M.sample_frames(media, fake=False)


# --- real-codec paths: run only where the optional dependency exists
# (the Iceberg round-trip discipline — guarded, skipped in bare
# containers, exercised wherever a user drops the lib in) ---


def test_image_features_real_pillow(spark):
    Image = pytest.importorskip("PIL.Image")
    import io

    buf = io.BytesIO()
    Image.new("RGB", (20, 10), color=(255, 0, 0)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, "image", bytearray(buf.getvalue()),
          {"mime": "image/png", "n_bytes": len(buf.getvalue()),
           "source_url": "mem://red.png"})], M.MEDIA_SCHEMA)
    row = M.image_features(media, fake=False).collect()[0]
    assert (row.width, row.height, row.n_channels) == (20, 10, 3)
    assert abs(row.mean_pixel - (255 / 3) / 255.0) < 1e-6  # solid red
    assert len(row.phash) == 16


def test_audio_features_real_soundfile(spark):
    sf = pytest.importorskip("soundfile")
    import io

    import numpy as np

    buf = io.BytesIO()
    sf.write(buf, np.zeros(1600), 16000, format="WAV", subtype="PCM_16")
    media = spark.createDataFrame(
        [(1, "audio", bytearray(buf.getvalue()),
          {"mime": "audio/wav", "n_bytes": len(buf.getvalue()),
           "source_url": "mem://silence.wav"})], M.MEDIA_SCHEMA)
    row = M.audio_features(media, fake=False).collect()[0]
    assert row.sample_rate == 16000
    assert row.n_samples == 1600
    assert row.duration_ms == 100
    assert row.mean_amp == 0.0
