"""Phonetic encodings for blocking/linkage.

``soundex_expr`` — American Soundex exactly per the NARA rules,
including the two subtleties most implementations drop: letters
separated by H or W that share a code collapse into one digit
(Ashcraft -> A261, not A226), and the FIRST letter's own code
suppresses immediately-following same-code letters (Pfister -> P236).
Vowels (and Y) break runs.  Pure string/integer fold — JVM-side via
``translate`` + ``aggregate``, no Python, bit-identical to the DuckDB
``list_reduce`` replay.

Ref parity: the reference normalizes street/place names with
hand-written substitution tables before matching
(bano/sources/fantoir.py normalization + bano/core.py rapprochement);
Soundex is the classical phonetic key for the same "match despite
spelling variation" blocking step.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# A..Z -> digit codes; 0 = vowel/Y (breaks runs), 7 = H/W (transparent).
SOUNDEX_MAP = "01230127022455012623017202"


def soundex_sql(name_expr: str) -> str:
    """Spark-SQL text computing the Soundex code of ``name_expr``
    (any string expression). Empty/no-letter input yields ''."""
    u = f"upper(regexp_replace({name_expr}, '[^A-Za-z]', ''))"
    codes = (f"translate({u}, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
             f"'{SOUNDEX_MAP}')")
    pairs = (f"transform(sequence(1, length({u})), "
             f"i -> concat(substring({u}, i, 1), "
             f"substring({codes}, i, 1)))")
    return f"""
        aggregate(
          IF(length({u}) = 0, array(), {pairs}),
          named_struct('res', '', 'prev', ''),
          (acc, pc) -> IF(acc.res = '',
            named_struct('res', substring(pc, 1, 1),
                         'prev', substring(pc, 2, 1)),
            named_struct(
              'res', IF(substring(pc, 2, 1) BETWEEN '1' AND '6'
                          AND substring(pc, 2, 1) != acc.prev,
                        concat(acc.res, substring(pc, 2, 1)), acc.res),
              'prev', CASE WHEN substring(pc, 2, 1) = '7' THEN acc.prev
                           ELSE substring(pc, 2, 1) END)),
          acc -> CASE WHEN acc.res = '' THEN ''
                      ELSE rpad(substring(acc.res, 1, 4), 4, '0') END)
    """


def soundex_expr(col_name: str) -> Column:
    return F.expr(soundex_sql(col_name))


def soundex_duckdb_sql(name_expr: str) -> str:
    """The same fold as DuckDB SQL (list_reduce over 'letter||code'
    2-char cells with a 'res|prev' varchar accumulator; every branch
    constructs a fresh value — list_reduce vectorization gotcha)."""
    u = f"upper(regexp_replace({name_expr}, '[^A-Za-z]', '', 'g'))"
    codes = (f"translate({u}, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
             f"'{SOUNDEX_MAP}')")
    pairs = (f"list_transform(range(1, length({u}) + 1), "
             f"i -> substr({u}, CAST(i AS INT), 1) || "
             f"substr({codes}, CAST(i AS INT), 1))")
    fold = f"""
        list_reduce(
          list_prepend('|', {pairs}),
          (acc, pc) -> CASE WHEN string_split(acc, '|')[1] = ''
            THEN substr(pc, 1, 1) || '|' || substr(pc, 2, 1)
            ELSE
              (CASE WHEN substr(pc, 2, 1) BETWEEN '1' AND '6'
                      AND substr(pc, 2, 1)
                          != string_split(acc, '|')[2]
                    THEN string_split(acc, '|')[1] || substr(pc, 2, 1)
                    ELSE string_split(acc, '|')[1] END)
              || '|' ||
              (CASE WHEN substr(pc, 2, 1) = '7'
                    THEN string_split(acc, '|')[2]
                    ELSE substr(pc, 2, 1) END)
            END)
    """
    return (f"CASE WHEN length({u}) = 0 THEN '' ELSE "
            f"rpad(substr(string_split({fold}, '|')[1], 1, 4), 4, '0') "
            f"END")
