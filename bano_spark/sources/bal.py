"""BAL / cadastre address CSV loaders (S4).

The reference downloads `adresses-{locales,cadastre}-{dept}.csv.gz`,
skips the header, and COPYs `;`-separated columns with '' as NULL into
pre-declared tables (bano/sources/bal.py:33-65; DDL
sql/create_table_base_osm.sql:61-93). Consumption builds the display
housenumber as TRIM(numero || ' ' || COALESCE(suffixe,''))
(bano/core.py:127).

Spark-first: `spark.read.text` (or any raw-line DataFrame) -> split
projections with explicit schema, '' -> NULL on typed columns. Per-dept
DELETE-then-load idempotency maps to partition overwrite on
commune_code's dept prefix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BAL_LOCALES_COLS = ["cle_interop", "commune_code", "commune_nom", "voie_code",
                    "voie_nom", "numero", "suffixe", "long", "lat", "license"]
_NUMERIC = {"long", "lat"}


def parse_bal_locales(raw: DataFrame, col: str = "raw") -> DataFrame:
    """Raw ;-CSV lines -> typed bal_locales columns ('' -> NULL, floats
    cast; header rows must already be excluded, as in the reference's
    f.readline() skip)."""
    arr = F.split(F.col(col), ";")
    cols = []
    for i, name in enumerate(BAL_LOCALES_COLS):
        c = F.element_at(arr, i + 1)
        c = F.when(c == "", None).otherwise(c)
        if name in _NUMERIC:
            c = c.cast("double")
        cols.append(c.alias(name))
    return raw.select(*cols)


def bal_housenumber(numero: Column, suffixe: Column) -> Column:
    """TRIM(numero || ' ' || COALESCE(suffixe, '')) — bano/core.py:127.
    Plain concat, not concat_ws: PG's || propagates a NULL numero to a
    NULL housenumber, and so does Spark's concat."""
    return F.trim(F.concat(numero, F.lit(" "), F.coalesce(suffixe, F.lit(""))))


BAL_CADASTRE_COLS = ["cle_interop", "uid_adresse", "numero", "suffixe",
                     "pseudo_numero", "voie_nom", "voie_code",
                     "destination_principale", "commune_code", "commune_nom",
                     "source", "long", "lat", "x", "y", "position",
                     "date_der_maj"]
_CAD_TYPES = {"pseudo_numero": "boolean", "long": "double", "lat": "double",
              "x": "double", "y": "double", "date_der_maj": "date"}


def parse_bal_cadastre(raw: DataFrame, col: str = "raw") -> DataFrame:
    """Raw ;-CSV lines -> typed bal_cadastre columns (DDL
    create_table_base_osm.sql:61-78): '' -> NULL, booleans, floats and
    the date_der_maj DATE cast."""
    arr = F.split(F.col(col), ";")
    cols = []
    for i, name in enumerate(BAL_CADASTRE_COLS):
        c = F.element_at(arr, i + 1)
        c = F.when(c == "", None).otherwise(c)
        t = _CAD_TYPES.get(name)
        if t:
            c = c.cast(t)
        cols.append(c.alias(name))
    return raw.select(*cols)


COMMUNES_SUMMARY_COLS = [
    "reg", "dep", "com", "libelle", "population", "id_revision",
    "date_revision", "type_composition", "nb_lieux_dits", "nb_voies",
    "nb_numeros", "nb_numeros_certifies",
    "analyse_adressage_nb_adresses_attendues", "analyse_adressage_ratio",
    "analyse_adressage_deficit_adresses", "composed_at"]
_SUMMARY_TYPES = {"population": "int", "nb_lieux_dits": "int",
                  "nb_voies": "int", "nb_numeros": "int",
                  "nb_numeros_certifies": "int",
                  "analyse_adressage_nb_adresses_attendues": "int",
                  "analyse_adressage_ratio": "double",
                  "analyse_adressage_deficit_adresses": "double"}


def parse_communes_summary(raw: DataFrame, col: str = "raw") -> DataFrame:
    """datagouv communes-summary.csv loader (the last SURVEY §1.2 table;
    ref bano/sources/datagouv_commune_summary.py:32-37 COPYs the
    ,-separated file with '' as NULL into the 16-column table declared
    in sql/create_table_base_bano.sql:139-158). Header rows must
    already be excluded (the reference's csv.readline() skip)."""
    arr = F.split(F.col(col), ",")
    cols = []
    for i, name in enumerate(COMMUNES_SUMMARY_COLS):
        c = F.element_at(arr, i + 1)
        c = F.when(c == "", None).otherwise(c)
        t = _SUMMARY_TYPES.get(name)
        if t:
            c = c.cast(t)
        cols.append(c.alias(name))
    return raw.select(*cols)
