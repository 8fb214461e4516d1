"""End-to-end pipelines: the reference's per-commune loop as ONE
DataFrame job (SURVEY.md §3.1).

`bano process_commune` iterates communes, loading each source with a
per-commune SQL template and folding rows into an in-memory dict
(bano/core.py:281-323). Here the whole country is one declarative plan:

    pages ──extract──> typed records (all sources at once)
          ──normalize─> canonical street keys (vectorized pandas UDF)
          ──cumul────> cumul_adresses-shaped rows
          ──conciliate> priority-joined export rows (export_csv_dept.sql)
          ──csv lines─> unix-dialect export (byte layout of export.py)

Partition pruning on insee/dept replaces the `__com__` template
substitution; the `Adresses` dict becomes groupBy/join aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .functions.normalize import normalize_udf
from .operators import conciliation as conc
from .operators.export import export_csv_lines
from .sources.pages import extract_records

SOURCE_OF_KIND = {"ban": "BAN", "osm": "OSM", "bal": "BAL"}


def pages_to_cumul(pages: DataFrame, normalize: bool = True) -> DataFrame:
    """Extract + normalize: pages -> cumul_adresses-shaped rows.

    FANTOIR-kind pages feed the registry loader (sources.fantoir), not
    the address cumul, so they are filtered here — mirroring the
    reference's per-source load dispatch (core.py:304-313)."""
    recs = extract_records(pages).filter(F.col("kind").isin(*SOURCE_OF_KIND))
    voie = normalize_udf(F.col("nom_voie")) if normalize else F.col("nom_voie")
    # join keys are wrapped non-nullable (coalesce with '') so Catalyst
    # never pushes IsNotNull filters below this projection — with a
    # computed upstream (text parse) that re-inlines the whole
    # expression tree per key (see tiles.tile_x for the same pathology)
    return recs.select(
        F.coalesce(F.col("insee_com"), F.lit("")).alias("insee_com"),
        F.coalesce(F.substring("insee_com", 1, 2), F.lit("")).alias("dept"),
        F.coalesce(F.col("fantoir"), F.lit("")).alias("fantoir"),
        F.upper(F.col("kind")).alias("source"),
        F.coalesce(F.col("numero"), F.lit("")).alias("numero"),
        voie.alias("voie_osm"),
        F.lit(None).cast("string").alias("voie_autre"),
        F.col("code_postal"),
        F.col("x").alias("lon"),
        F.col("y").alias("lat"),
    )


def process_all(pages: DataFrame) -> DataFrame:
    """pages -> conciliation export rows (id, numero, voie, code_post,
    ville, source, lat, lon), ordered by id."""
    return conc.conciliate(pages_to_cumul(pages))


def export_csv(pages: DataFrame) -> DataFrame:
    """pages -> unix-dialect CSV lines (S13), one per address."""
    return export_csv_lines(process_all(pages))
