"""Identifier checksum validation as pure codegen expressions.

Payment-card (Luhn), IBAN (ISO 13616 mod-97) and ISBN-10 check-digit
validation are the classic ingest data-quality gates.  The naive
implementations are per-row Python loops; here each becomes a CLOSED
FORM over fixed-width digit extractions, so validation of 10^12 ids
is one whole-stage-codegen projection — no UDF, no fold lambda, no
shuffle at all until the rollup aggregate.

- **Luhn (fixed width)**: for a w-digit string with w even, double
  every digit at odd 1-based position (from the left), subtracting 9
  when the doubled value exceeds 9; valid iff the total ≡ 0 (mod 10).
  Emitted as w substring terms summed in one expression.
- **IBAN mod-97**: rearrange (move the first 4 chars to the end), map
  letters to numbers, interpret as a big integer mod 97; valid iff
  ≡ 1.  For BBANs short enough that the numeric form fits in 63 bits
  (<= 18 digits) the mod is a single BIGINT op; the general chunked
  Horner fold ((acc * 10^k + chunk) % 97) has the same plan shape,
  k chunks of constant count.
- **ISBN-10**: sum_i (11 - i) * d_i with d_10 = 10 for 'X'; valid iff
  ≡ 0 (mod 11).

Exactness: integer-only; identical CASE ladders on both engines.

Ref parity: the reference validates FANTOIR record keys and INSEE
code structure during load (bano/sources/fantoir.py RIVOLI key check
digit); these are the same ingest-time check-digit gates for payment
/ banking / publishing identifiers.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["luhn_valid", "luhn_sum_sql", "iban_mod97_valid",
           "isbn10_valid", "isbn10_sum_sql"]


def _digit(s: Column, i: int) -> Column:
    return F.substring(s, i, 1).cast("int")


def luhn_valid(s: Column, width: int = 16) -> Column:
    """True iff the fixed-width all-digit string passes Luhn.

    With even width, doubling hits odd 1-based positions from the
    left (equivalently: every second digit from the rightmost,
    moving left)."""
    total = F.lit(0)
    for i in range(1, width + 1):
        d = _digit(s, i)
        if (width - i) % 2 == 1:  # doubled positions
            term = F.when(d > 4, 2 * d - 9).otherwise(2 * d)
        else:
            term = d
        total = total + term
    return (total % 10) == 0


def luhn_sum_sql(col: str, width: int = 16) -> str:
    """DuckDB twin of luhn_valid's sum expression (linear text)."""
    terms = []
    for i in range(1, width + 1):
        d = f"CAST(substring({col}, {i}, 1) AS INT)"
        if (width - i) % 2 == 1:
            terms.append(f"(CASE WHEN {d} > 4 THEN 2 * {d} - 9 "
                         f"ELSE 2 * {d} END)")
        else:
            terms.append(d)
    return " + ".join(terms)


def iban_mod97_valid(numeric: Column) -> Column:
    """True iff the rearranged numeric IBAN value ≡ 1 (mod 97).

    `numeric` must already be the rearranged integer (BBAN digits,
    country-code letters mapped to numbers, check digits last) and
    fit in BIGINT (<= 18 digits; longer IBANs chunk with Horner —
    same algebra, k constant steps)."""
    return (numeric % 97) == 1


def isbn10_valid(s: Column) -> Column:
    """True iff the 10-char ISBN (digits, last may be 'X') validates:
    sum_i (11 - i) * d_i ≡ 0 (mod 11)."""
    total = F.lit(0)
    for i in range(1, 10):
        total = total + (11 - i) * _digit(s, i)
    last = F.substring(s, 10, 1)
    d10 = F.when(last == "X", F.lit(10)).otherwise(last.cast("int"))
    total = total + d10
    return (total % 11) == 0


def isbn10_sum_sql(col: str) -> str:
    terms = [f"({11 - i} * CAST(substring({col}, {i}, 1) AS INT))"
             for i in range(1, 10)]
    terms.append(f"(CASE WHEN substring({col}, 10, 1) = 'X' THEN 10 "
                 f"ELSE CAST(substring({col}, 10, 1) AS INT) END)")
    return " + ".join(terms)
