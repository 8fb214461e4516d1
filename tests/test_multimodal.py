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
    media = M.synth_media(spark, 9, partitions=1)
    with pytest.raises(Exception, match="NotImplementedError|image codec"):
        M.image_features(media, fake=False).collect()


def test_frame_sampling_one_to_many(spark):
    media = M.synth_media(spark, 90, partitions=3)
    frames = M.sample_frames(media, every_n=2, fake=True)
    rows = frames.collect()
    assert len(rows) > 30  # videos expand to multiple frames
    per = frames.groupBy("media_id").count().collect()
    assert all(r["count"] >= 1 for r in per)
    assert all(r.frame_idx % 2 == 0 for r in rows)
