"""Kernel tests for wave 105: known-good/known-bad identifiers from
the published standards — Luhn on real card test numbers, IBAN
mod-97 on the ISO example, ISBN-10 including the 'X' check char."""

from __future__ import annotations

from pyspark.sql import functions as F

from bano_spark.operators.checksums import (
    iban_mod97_valid, isbn10_valid, luhn_valid)


def _eval(spark, rows, schema, col):
    df = spark.createDataFrame(rows, schema)
    return [r["v"] for r in df.select(col.alias("v")).collect()]


def test_luhn_known_cards(spark):
    # standard 16-digit test numbers (valid), plus one-digit flips
    cases = [("4539148803436467", True),
             ("4532015112830366", True),
             ("4539148803436468", False),
             ("1234567812345678", False)]
    got = _eval(spark, [(c,) for c, _ in cases], "s string",
                luhn_valid(F.col("s")))
    assert got == [e for _, e in cases]


def test_luhn_doubling_position_contract(spark):
    # 16 zeros valid; flipping an undoubled digit changes sum by d
    assert _eval(spark, [("0" * 16,)], "s string",
                 luhn_valid(F.col("s"))) == [True]
    # '0...05' (last digit 5, undoubled) -> sum 5 -> invalid
    assert _eval(spark, [("0" * 15 + "5",)], "s string",
                 luhn_valid(F.col("s"))) == [False]
    # doubled position: '0..050' with 5 at position 15 (doubled:
    # 2*5-9=1) -> sum 1 -> invalid
    assert _eval(spark, [("0" * 14 + "50",)], "s string",
                 luhn_valid(F.col("s"))) == [False]


def test_iban_mod97_iso_example(spark):
    # ISO 13616 example GB82WEST12345698765432 rearranges to
    # numeric 3214282912345698765432161182 — too long for bigint, so
    # reduce with the same chunked Horner the docstring describes
    n = 0
    for ch in "WEST12345698765432GB82":
        v = str(ord(ch) - 55) if ch.isalpha() else ch
        for d in v:
            n = (n * 10 + int(d)) % 97
    assert n == 1  # the standard's own example validates
    got = _eval(spark, [(100,), (1,), (98,), (50,)], "n long",
                iban_mod97_valid(F.col("n")))
    assert got == [False, True, True, False]  # 98 ≡ 1 (mod 97)


def test_isbn10_with_x(spark):
    cases = [("0306406152", True),    # Wikipedia's canonical example
             ("030640615X", False),
             ("097522980X", True),    # X check digit
             ("0975229801", False)]
    got = _eval(spark, [(c,) for c, _ in cases], "s string",
                isbn10_valid(F.col("s")))
    assert got == [e for _, e in cases]
