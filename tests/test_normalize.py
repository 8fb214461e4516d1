"""Byte-identical parity of the normalize/format_toponyme cascades vs
reference goldens (generated from /root/reference/bano/helpers.py and
stored in golden_normalize*.json — the reference's own unit case
'Boulevard de Sébastopol' -> 'BD SEBASTOPOL' included,
tests/test_helpers.py:23-27)."""

import json
from pathlib import Path

import pandas as pd

from bano_spark.functions.normalize import format_toponyme_series, normalize_series

HERE = Path(__file__).parent


def test_normalize_goldens():
    g = json.loads((HERE / "golden_normalize.json").read_text())["normalize"]
    names = list(g)
    out = normalize_series(pd.Series(names))
    assert list(out) == [g[n] for n in names]


def test_normalize_fuzz_corpus():
    g = json.loads((HERE / "golden_normalize_fuzz.json").read_text())
    names = list(g)
    out = normalize_series(pd.Series(names))
    mismatches = [(n, g[n], m) for n, m in zip(names, out) if g[n] != m]
    assert mismatches == []


def test_reference_seed_case():
    # the reference's own assertion, tests/test_helpers.py:23-27
    assert normalize_series(pd.Series(["Boulevard de Sébastopol"]))[0] == "BD SEBASTOPOL"


def test_format_toponyme_goldens():
    g = json.loads((HERE / "golden_normalize.json").read_text())["toponyme"]
    names = list(g)
    out = format_toponyme_series(normalize_series(pd.Series(names)))
    assert list(out) == [g[n] for n in names]


def test_truncation_and_empty():
    s = pd.Series(["", None, "X" * 50])
    out = normalize_series(s)
    assert out[0] == "" and out[1] == "" and len(out[2]) == 30
