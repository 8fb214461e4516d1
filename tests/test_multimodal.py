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


def test_nonpng_payload_raises_in_batch_without_pillow(spark):
    if M.image_codec_available():
        pytest.skip("Pillow importable — stdlib PNG tier not active")
    # fake payloads are not PNGs: the stdlib real tier must fail
    # LOUDLY inside the batch, never silently mis-decode
    media = M.synth_media(spark, 9, partitions=1)
    from pyspark.errors import PySparkException
    with pytest.raises(PySparkException):
        M.image_features(media, fake=False).collect()


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


def test_nonwav_payload_raises_in_batch_without_soundfile(spark):
    if M.audio_codec_available():
        pytest.skip("soundfile importable — stdlib WAV tier not active")
    media = M.synth_media(spark, 6)
    from pyspark.errors import PySparkException
    with pytest.raises(PySparkException):
        M.audio_features(media, fake=False).collect()


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


# --- stdlib real tier: PNG (zlib+struct) and PCM WAV (wave module) —
# these run EVERYWHERE, no third-party codec needed (VERDICT r4 item 4)


def test_stdlib_png_roundtrip_kernel():
    import numpy as np

    # gradient RGB: every channel value distinct; decode must return
    # exactly what was encoded (filter-0 path), mean vs numpy
    h, w = 16, 24
    arr = ((np.arange(h)[:, None, None] * 31
            + np.arange(w)[None, :, None] * 7
            + np.arange(3)[None, None, :] * 53) % 256).astype("uint8")
    payload = M.encode_png(arr)
    W, H, ch, mean, phash = M._stdlib_png_decode(payload)
    assert (W, H, ch) == (w, h, 3)
    assert mean == round(float(arr.mean()) / 255.0, 6)
    assert len(phash) == 16
    # grayscale + alpha variants
    for a in (arr[:, :, 0], arr[:, :, :2], arr):
        W, H, ch, _, _ = M._stdlib_png_decode(M.encode_png(a))
        assert (W, H) == (w, h)
        assert ch == (1 if a.ndim == 2 else a.shape[2])


def test_stdlib_png_unfilter_all_types():
    import numpy as np

    # hand-filter a known image with each filter type per row and
    # check the unfilter reconstructs the original scanlines
    rng = [(r * 17 + c * 5) % 256 for r in range(5) for c in range(12)]
    orig = np.array(rng, dtype=np.uint8).reshape(5, 12)
    bpp, stride = 1, 12
    rows = []
    prev = bytes(stride)
    for r, ft in enumerate([0, 1, 2, 3, 4]):
        cur = orig[r].tobytes()
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = bytes((cur[i] - (cur[i - bpp] if i >= bpp else 0))
                        & 0xFF for i in range(stride))
        elif ft == 2:
            enc = bytes((cur[i] - prev[i]) & 0xFF for i in range(stride))
        elif ft == 3:
            enc = bytes((cur[i] - (((cur[i - bpp] if i >= bpp else 0)
                                    + prev[i]) >> 1)) & 0xFF
                        for i in range(stride))
        else:
            out = []
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out.append((cur[i] - pr) & 0xFF)
            enc = bytes(out)
        rows.append(bytes([ft]) + enc)
        prev = cur
    rec = M._png_unfilter(b"".join(rows), 5, stride, bpp)
    assert bytes(rec) == orig.tobytes()


def test_stdlib_png_two_tone_phash():
    import numpy as np

    # left half dark (a), right half light (b): block phash must be
    # exactly the right-half mask 0f0f0f0f0f0f0f0f
    a, b = 40, 200
    img = np.full((16, 16, 3), a, dtype=np.uint8)
    img[:, 8:, :] = b
    W, H, ch, mean, phash = M._stdlib_png_decode(M.encode_png(img))
    assert phash == "0f0f0f0f0f0f0f0f"
    assert mean == round((a + b) / 2.0 / 255.0, 6)


def test_stdlib_wav_roundtrip_kernel():
    import numpy as np

    rate, c = 16000, 4096
    samples = np.full(320, c, dtype=np.int16)
    payload = M.encode_wav_pcm16(samples, rate)
    r, n, dur, amp = M._stdlib_wav_decode(payload)
    assert (r, n, dur) == (rate, 320, 320 * 1000 // rate)
    assert amp == round(c / 32768.0, 6)
    # stereo: n counts ALL samples (soundfile data.size semantics),
    # duration counts frames
    st = M.encode_wav_pcm16(np.zeros(640, dtype=np.int16), 8000,
                            channels=2)
    r, n, dur, amp = M._stdlib_wav_decode(st)
    assert (r, n, dur, amp) == (8000, 640, 320 * 1000 // 8000, 0.0)


def test_image_features_real_stdlib_png(spark):
    import numpy as np

    # the real fake=False path through mapInPandas with stdlib PNGs
    imgs = {i: ((np.arange(8)[:, None, None] * (i + 3)
                 + np.arange(8)[None, :, None] * 7) % 256
                ).astype("uint8").repeat(3, axis=2) for i in range(4)}
    media = spark.createDataFrame(
        [(i, "image", bytearray(M.encode_png(a)),
          {"mime": "image/png", "n_bytes": 0, "source_url": "mem://"})
         for i, a in imgs.items()], M.MEDIA_SCHEMA)
    rows = {r.media_id: r for r in
            M.image_features(media, fake=False).collect()}
    assert len(rows) == 4
    for i, a in imgs.items():
        exp = M._stdlib_png_decode(M.encode_png(a))
        got = rows[i]
        if not M.image_codec_available():
            assert (got.width, got.height, got.n_channels,
                    got.mean_pixel, got.phash) == exp
        else:  # Pillow tier active: dims/mean agree, phash may differ
            assert (got.width, got.height, got.n_channels) == exp[:3]


def test_audio_features_real_stdlib_wav(spark):
    import numpy as np

    media = spark.createDataFrame(
        [(i, "audio",
          bytearray(M.encode_wav_pcm16(
              np.full(100 + 10 * i, 256 * i, dtype=np.int16),
              8000 + 4000 * i)),
          {"mime": "audio/wav", "n_bytes": 0, "source_url": "mem://"})
         for i in range(3)], M.MEDIA_SCHEMA)
    rows = {r.media_id: r for r in
            M.audio_features(media, fake=False).collect()}
    for i in range(3):
        n = 100 + 10 * i
        assert rows[i].sample_rate == 8000 + 4000 * i
        assert rows[i].n_samples == n
        assert rows[i].duration_ms == n * 1000 // (8000 + 4000 * i)
        assert rows[i].mean_amp == round(256 * i / 32768.0, 6)
