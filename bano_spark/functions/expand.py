"""Display-form abbreviation re-expansion (C6).

Reproduces the 37-step replace cascade of
bano/sql/export_json_dept_voies_non_rapprochees.sql:66 — 27 anchored
street-type prefixes, 9 in-word title expansions, then quote removal
and curly-apostrophe folding. PG regexp_replace without the 'g' flag
replaces only the FIRST occurrence; the in-word rules reproduce that
with a lazy ^(.*?) capture (anchored prefixes can only match once).
Step order is load-bearing and kept exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

PREFIX_EXPANSIONS: list[tuple[str, str]] = [
    ("IMP", "Impasse"), ("RTE", "Route"), ("ALL", "Allée"), ("PL", "Place"),
    ("PLA", "Place"), ("AV", "Avenue"), ("LOT", "Lotissement"),
    ("RES", "Résidence"), ("CHEM", "Chemin"), ("RLE", "Ruelle"),
    ("BD", "Boulevard"), ("SQ", "Square"), ("PAS", "Passage"),
    ("SEN", "Sentier"), ("CRS", "Cours"), ("TRA", "Traverse"),
    ("MTE", "Montée"), ("RPT", "Rond-point"), ("HAM", "Hameau"),
    ("VLA", "Villa"), ("PROM", "Promenade"), ("ESP", "Esplanade"),
    ("FG", "Faubourg"), ("TSSE", "Terrasse"), ("CTRE", "Centre"),
    ("PASS", "Passerelle"), ("FRM", "Ferme"),
]

WORD_EXPANSIONS: list[tuple[str, str]] = [
    ("GAL", "Général"), ("MAL", "Maréchal"), ("ST", "Saint"),
    ("STE", "Sainte"), ("PDT", "Président"), ("HT", "Haut"),
    ("HTE", "Haute"), ("VX", "Vieux"), ("PTE", "Petite"),
]


def expand_abbrev(col: Column) -> Column:
    c = col
    for abbr, full in PREFIX_EXPANSIONS:
        c = F.regexp_replace(c, f"^{abbr} ", f"{full} ")
    for abbr, full in WORD_EXPANSIONS:
        # first-occurrence-only semantics (PG regexp_replace w/o 'g')
        c = F.regexp_replace(c, f"^((?s:.)*?) {abbr} ", f"$1 {full} ")
    c = F.replace(c, F.lit('"'), F.lit(""))
    c = F.replace(c, F.lit("’"), F.lit("'"))
    return c
