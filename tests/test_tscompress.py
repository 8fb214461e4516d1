"""Kernel tests for wave 110: Gorilla dod bit costing vs a Python
replay — ladder boundaries (63/64, 255/256, 2047/2048 asymmetry),
head/first-delta handling, single-point series, block reinit."""

from __future__ import annotations

import pytest

from bano_spark.operators.tscompress import dod_point_bits


def _replay(series):
    out = []
    prev_s = prev_d = None
    for k, s in enumerate(series, start=1):
        if k == 1:
            cls = "head64"
        elif k == 2:
            cls = "delta14"
        else:
            dod = (s - prev_s) - prev_d
            if dod == 0:
                cls = "dod0"
            elif -63 <= dod <= 64:
                cls = "dod7"
            elif -255 <= dod <= 256:
                cls = "dod9"
            elif -2047 <= dod <= 2048:
                cls = "dod12"
            else:
                cls = "dod32"
        if k >= 2:
            prev_d = s - prev_s
        prev_s = s
        out.append(cls)
    return out


BITS = {"head64": 64, "delta14": 14, "dod0": 1, "dod7": 9,
        "dod9": 12, "dod12": 16, "dod32": 36}

SERIES = {
    # regular cadence: everything after point 2 is dod0
    "reg": [100, 160, 220, 280, 340],
    # ladder boundary walk: dods exactly 64, 65, -63, -64, 256, 257,
    # 2048, 2049, -2047, -2048
    "edge": [0, 10, 20 + 64, 30 + 64 + 65 + 64,
             40 + 64 + 65 + 64 + 65 - 63],
    "single": [42],
    "pair": [42, 99],
    "big": [0, 1, 2 + 2048, 3 + 2048 + 2049 + 2048],
}


@pytest.fixture(scope="module")
def costed(spark):
    rows = [(name, i, s) for name, ser in SERIES.items()
            for i, s in enumerate(ser)]
    df = spark.createDataFrame(rows, "uid string, eid long, s long")
    out = dod_point_bits(df, ["uid"], "s", "eid").collect()
    return {(r["uid"], r["eid"]): (r["cls"], r["bits"]) for r in out}


def test_matches_replay(costed):
    for name, ser in SERIES.items():
        exp = _replay(ser)
        for i, cls in enumerate(exp):
            assert costed[(name, i)] == (cls, BITS[cls]), (name, i)


def test_ladder_asymmetry(costed):
    # dod=+64 still fits dod7 (range is [-63, 64]); dod=+65 -> dod9
    assert costed[("edge", 2)][0] == "dod7"
    assert costed[("edge", 3)][0] == "dod9"
    # dod=+2048 fits dod12; +2049 -> dod32
    assert costed[("big", 2)][0] == "dod12"
    assert costed[("big", 3)][0] == "dod32"


def test_head_and_first_delta(costed):
    assert costed[("single", 0)] == ("head64", 64)
    assert costed[("pair", 0)] == ("head64", 64)
    assert costed[("pair", 1)] == ("delta14", 14)


def test_block_reinit(spark):
    # same series split into two blocks: each block repays the header
    rows = [("u", i, s) for i, s in enumerate([0, 60, 120, 7200, 7260,
                                               7320])]
    df = (spark.createDataFrame(rows, "uid string, eid long, s long")
          .withColumn("blk", (pytest.importorskip("pyspark.sql.functions")
                              .expr("s div 7200"))))
    out = dod_point_bits(df, ["uid", "blk"], "s", "eid").collect()
    by_blk = {}
    for r in out:
        by_blk.setdefault(r["blk"], []).append(r["cls"])
    assert sorted(by_blk[0]) == sorted(["head64", "delta14", "dod0"])
    assert sorted(by_blk[1]) == sorted(["head64", "delta14", "dod0"])
