"""Place (lieu-dit) 3-way matching + BAN pseudo-FANTOIR codes.

J12 (bano/core_place.py:49-61, models.py:262-283): OSM places match
FANTOIR lieu-dit records first by explicit fantoir code, else by
normalized name; unmatched become new places. The dict-iteration
nondeterminism of the reference is replaced by explicit ordering.

C10/J17 (bano/sources/ban2fantoir.py:18-33): BAN street names that
match no FANTOIR entry get synthetic codes
f"{insee}b{str(i).ljust(4,'b')}" where i is a deterministic rank of
the name within its commune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.codes import pseudo_fantoir


def match_places(osm: DataFrame, fantoir: DataFrame) -> DataFrame:
    """osm: (insee_com, fantoir, name_norm, name_raw); fantoir:
    (insee_com, fantoir10, name_norm, libelle). Two-stage left join:
    by code first, by normalized name as fallback; match_kind in
    ('code', 'name', 'new')."""
    by_code = fantoir.select(
        F.col("insee_com").alias("fc_insee"), F.col("fantoir10").alias("fc_code"),
        F.col("libelle").alias("fc_libelle"))
    by_name = fantoir.select(
        F.col("insee_com").alias("fn_insee"), F.col("fantoir10").alias("fn_code"),
        F.col("name_norm").alias("fn_name"), F.col("libelle").alias("fn_libelle"))
    # dedup name-keyed side deterministically (lowest code wins)
    w = Window.partitionBy("fn_insee", "fn_name").orderBy("fn_code")
    by_name = by_name.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") == 1).drop("_r")

    j = (
        osm.join(by_code, (osm.insee_com == by_code.fc_insee)
                 & (osm.fantoir == by_code.fc_code), "left")
        .join(by_name, (osm.insee_com == by_name.fn_insee)
              & (osm.name_norm == by_name.fn_name), "left")
    )
    kind = (
        F.when(F.col("fc_code").isNotNull(), "code")
        .when(F.col("fn_code").isNotNull(), "name")
        .otherwise("new")
    )
    return j.select(
        osm.insee_com, osm.name_raw, osm.name_norm,
        F.coalesce("fc_code", "fn_code").alias("fantoir10"),
        F.coalesce("fc_libelle", "fn_libelle").alias("libelle_fantoir"),
        kind.alias("match_kind"),
    )


def ban_pseudo_fantoir(unmatched_names: DataFrame) -> DataFrame:
    """unmatched_names: (insee_com, name_norm) distinct. Assign
    deterministic synthetic codes per commune, ranked by name."""
    d = unmatched_names.select("insee_com", "name_norm").distinct()
    w = Window.partitionBy("insee_com").orderBy("name_norm")
    return d.withColumn("rank_i", F.row_number().over(w)).withColumn(
        "pseudo_fantoir", pseudo_fantoir(F.col("insee_com"), F.col("rank_i")))
