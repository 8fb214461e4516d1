"""ESRI shapefile (.shp) reader — S9 without the external tool.

The reference shells out to shp2pgsql for the cadastre buildings layer
(`update_cadastre_batiments.sh:19-22`, `-s 2154:4326`); here the .shp
main file is parsed natively so the load is `spark.read.format
("binaryFile")` (or any (id, content) DataFrame) -> mapInPandas parse
-> `geo.reproject` Lambert-93 kernel. Files are the unit of
parallelism, as with every binary format; inside a file the Point case
is a single numpy reshape (fixed 28-byte records, zero per-record
Python) and the Polygon case walks records with numpy slices for the
parts/points arrays.

Format (ESRI whitepaper, public): 100-byte main header (big-endian
file code 9994, little-endian shape type at offset 32), then records:
8-byte big-endian (record number, content length in 16-bit words)
header + little-endian content. Point content = int32 type, float64 x,
float64 y. Polygon content = int32 type, 4x float64 bbox, int32
numParts, int32 numPoints, int32 parts[], float64 points[][2].
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame, types as T

SHAPE_POINT = 1
SHAPE_POLYGON = 5


def make_point_shp(xs: np.ndarray, ys: np.ndarray) -> bytes:
    """Build a valid Point .shp blob (fixture/test helper) — vectorized
    record assembly, no per-point Python."""
    n = len(xs)
    rec = np.zeros(n, dtype=[("num", ">i4"), ("len", ">i4"), ("type", "<i4"),
                             ("x", "<f8"), ("y", "<f8")])
    rec["num"] = np.arange(1, n + 1)
    rec["len"] = 10  # (4 + 8 + 8) bytes = 10 16-bit words
    rec["type"] = SHAPE_POINT
    rec["x"], rec["y"] = xs, ys
    body = rec.tobytes()
    total_words = (100 + len(body)) // 2
    header = struct.pack(">7i", 9994, 0, 0, 0, 0, 0, total_words)
    header += struct.pack("<2i", 1000, SHAPE_POINT)
    header += struct.pack("<8d", float(xs.min()) if n else 0.0,
                          float(ys.min()) if n else 0.0,
                          float(xs.max()) if n else 0.0,
                          float(ys.max()) if n else 0.0, 0, 0, 0, 0)
    return header + body


def make_polygon_shp(rings_per_record: list[list[np.ndarray]]) -> bytes:
    """Build a Polygon .shp blob; each record is a list of closed rings."""
    body = b""
    for i, rings in enumerate(rings_per_record):
        pts = np.concatenate(rings)
        parts = np.cumsum([0] + [len(r) for r in rings[:-1]]).astype("<i4")
        content = struct.pack("<i", SHAPE_POLYGON)
        content += struct.pack("<4d", pts[:, 0].min(), pts[:, 1].min(),
                               pts[:, 0].max(), pts[:, 1].max())
        content += struct.pack("<2i", len(rings), len(pts))
        content += parts.tobytes()
        content += pts.astype("<f8").tobytes()
        body += struct.pack(">2i", i + 1, len(content) // 2) + content
    total_words = (100 + len(body)) // 2
    header = struct.pack(">7i", 9994, 0, 0, 0, 0, 0, total_words)
    header += struct.pack("<2i", 1000, SHAPE_POLYGON)
    header += struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
    return header + body


def parse_point_blob(blob: bytes):
    """Point .shp bytes -> (record_no int64[], x float64[], y float64[]).
    One reshape — no per-record loop."""
    assert struct.unpack(">i", blob[0:4])[0] == 9994, "not a shapefile"
    shape_type = struct.unpack("<i", blob[32:36])[0]
    assert shape_type == SHAPE_POINT, f"not a Point shapefile: {shape_type}"
    rec = np.frombuffer(blob, offset=100,
                        dtype=[("num", ">i4"), ("len", ">i4"), ("type", "<i4"),
                               ("x", "<f8"), ("y", "<f8")])
    return rec["num"].astype(np.int64), rec["x"].copy(), rec["y"].copy()


def parse_polygon_blob(blob: bytes):
    """Polygon .shp bytes -> list of (record_no, [ring arrays])."""
    assert struct.unpack(">i", blob[0:4])[0] == 9994, "not a shapefile"
    assert struct.unpack("<i", blob[32:36])[0] == SHAPE_POLYGON
    out = []
    off = 100
    while off < len(blob):
        num, words = struct.unpack(">2i", blob[off:off + 8])
        off += 8
        content = blob[off:off + words * 2]
        off += words * 2
        n_parts, n_points = struct.unpack("<2i", content[36:44])
        parts = np.frombuffer(content, "<i4", n_parts, 44)
        pts = np.frombuffer(content, "<f8", n_points * 2,
                            44 + 4 * n_parts).reshape(-1, 2)
        bounds = np.append(parts, n_points)
        rings = [pts[bounds[i]:bounds[i + 1]] for i in range(n_parts)]
        out.append((num, rings))
    return out


POINT_SCHEMA_SUFFIX = "record_no bigint, x double, y double"


def read_point_shp(files: DataFrame, content_col: str = "content",
                   key_cols: tuple[str, ...] = ("file_id",)) -> DataFrame:
    """(key..., content binary) -> (key..., record_no, x, y) rows."""
    import pandas as pd

    kt = {f.name: f.dataType.simpleString() for f in files.schema}
    schema = ", ".join(f"{k} {kt[k]}" for k in key_cols) + ", " + POINT_SCHEMA_SUFFIX
    keys = list(key_cols)

    def gen(batches):
        for pdf in batches:
            frames = []
            for _, row in pdf.iterrows():  # per FILE, not per record
                num, x, y = parse_point_blob(row[content_col])
                f = pd.DataFrame({"record_no": num, "x": x, "y": y})
                for k in keys:
                    f[k] = row[k]
                frames.append(f[keys + ["record_no", "x", "y"]])
            if frames:
                yield pd.concat(frames)

    return files.select(*keys, content_col).mapInPandas(gen, schema)
