"""Multimodal (image/audio/video) column operators.

Design for 100 TB media pipelines: media travels as opaque ``binary``
columns with typed metadata structs; decode / feature-extract / resize
/ frame-sample are Arrow-batched pandas functions over ``mapInPandas``
so each batch amortizes the python crossing and codecs can release the
GIL. The actual codec calls are STUBBED in this container (no
image/audio libraries): `decode_image` raises NotImplementedError
unless `fake=True`, in which case a deterministic fake decoder (header
bytes -> width/height/nchannels, content hash -> mean "pixel") stands
in. The Spark-side plumbing — schemas, batch shapes, partitioning,
UDF signatures — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

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


def image_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """payload binary -> (width, height, channels, mean_pixel, phash).

    Real deployments drop a PIL/libvips call into `decode`; the batch
    shape and output schema stay identical."""

    def decode(batches):
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decoding requires an image codec library not "
                    "present in this container; pass fake=True for the "
                    "deterministic stand-in")
            rows = [_fake_decode(bytes(p)) for p in pdf["payload"]]
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


def sample_frames(media: DataFrame, every_n: int = 10, fake: bool = False) -> DataFrame:
    """Video payload -> sampled frames (1-to-many). The fake samples
    fixed-size byte windows; a real build calls the demuxer per batch."""

    def sample(batches):
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "frame sampling requires a video demuxer not present "
                    "in this container; pass fake=True")
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                n_frames = max(1, len(b) // 64)
                for i in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * 64:(i + 1) * 64])
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
    a real deployment drops a soundfile/ffmpeg call into ``decode``;
    the batch shape and output schema stay identical. The fake decoder
    is pure header+content arithmetic (rate from the first byte, two
    samples per post-header byte, amplitude = mean byte value), so a
    SQL oracle recomputes every output from the media ids alone."""

    def decode(batches):
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "audio decoding requires an audio codec library not "
                    "present in this container; pass fake=True for the "
                    "deterministic stand-in")
            ids, rates, counts, durs, amps = [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = np.frombuffer(bytes(p), dtype=np.uint8)
                rate = 8000 + int(b[0]) % 4 * 4000 if len(b) else 8000
                body = b[4:]
                n = int(len(body)) * 2
                ids.append(mid)
                rates.append(rate)
                counts.append(n)
                durs.append(n * 1000 // rate)
                amps.append(round(float(body.sum()) / (len(body) * 255.0), 6)
                            if len(body) else 0.0)
            yield pd.DataFrame({
                "media_id": ids, "sample_rate": rates, "n_samples": counts,
                "duration_ms": durs, "mean_amp": amps})

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "payload").mapInPandas(decode, AUDIO_FEATURES_SCHEMA)
