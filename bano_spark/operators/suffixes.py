"""Hamlet-suffix detection (A10).

Reproduces bano/pre_process_suffixe.py:47-81: over a commune's distinct
street names, count trailing 1-word keys (names > 3 words) and trailing
2-word keys (names > 4 words); keep keys seen > 5 times; 2-word keys
win first and blacklist their words; 1-word keys must not be pure
digits nor a blacklisted word.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def build_suffix_zones(points: DataFrame, buffer_m: float, group_cols=("insee_com", "hameau"),
                       x: str = "x", y: str = "y", max_per_street: int | None = None,
                       street_col: str | None = None) -> DataFrame:
    """A7: hamlet points -> buffered union zones.

    The reference buffers <=2 points per street by 0.0003 deg and
    ST_Unions them (pre_process_suffixe.py:25-45). Without a geometry
    library the buffered discs become axis-aligned boxes and the union
    stays an exploded box set — containment tests are 'point in any
    box', which the cell-bucketed join handles exactly like polygons.
    Returns one row per (group, box)."""
    d = points
    if max_per_street and street_col:
        from pyspark.sql import Window

        w = Window.partitionBy(*group_cols, street_col).orderBy(x, y)
        d = d.withColumn("_r", F.row_number().over(w)).filter(
            F.col("_r") <= max_per_street).drop("_r")
    return d.select(
        *group_cols,
        (F.col(x) - buffer_m).alias("bxmin"),
        (F.col(x) + buffer_m).alias("bxmax"),
        (F.col(y) - buffer_m).alias("bymin"),
        (F.col(y) + buffer_m).alias("bymax"),
    )


def detect_suffixes(names: DataFrame, name_col: str = "name",
                    group_col: str = "insee_com") -> DataFrame:
    """-> (group_col, suffixe, n_names). Input rows are made distinct on
    (group, name) first (the reference iterates dict keys)."""
    d = names.select(group_col, name_col).distinct()
    toks = F.split(F.col(name_col), " ")
    n = F.size(toks)

    two = d.filter(n > 4).select(
        group_col,
        F.concat_ws(" ", F.element_at(toks, -2), F.element_at(toks, -1)).alias("suffixe"),
    )
    one = d.filter(n > 3).select(group_col, F.element_at(toks, -1).alias("suffixe"))

    freq2 = two.groupBy(group_col, "suffixe").agg(F.count(F.lit(1)).alias("n_names"))
    freq1 = one.groupBy(group_col, "suffixe").agg(F.count(F.lit(1)).alias("n_names"))

    sel2 = freq2.filter(F.col("n_names") > 5)
    mots = sel2.select(group_col, F.explode(F.split("suffixe", " ")).alias("mot")).distinct()
    sel1 = (
        freq1.filter(F.col("n_names") > 5)
        .filter(~F.col("suffixe").rlike("^[0-9]+$"))
        .join(mots, on=[freq1[group_col] == mots[group_col],
                        freq1["suffixe"] == mots["mot"]], how="left_anti")
    )
    return sel2.unionByName(sel1).orderBy(group_col, "suffixe")


def union_suffix_zones(boxes, keys=("insee_com", "hameau")):
    """A7 exact semantics: union transitively-overlapping buffer boxes
    per (commune, hameau) via the geometry union-find kernel
    (applyInPandas group kernel). Returns per-group zone stats."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    from ..geo.geometry import merge_overlapping_boxes

    key_types = {f.name: f.dataType.simpleString() for f in boxes.schema}
    out_schema = ", ".join(f"{k} {key_types[k]}" for k in keys) + \
        ", n_zones int, total_width double"

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        m = merge_overlapping_boxes(
            pdf[["bxmin", "bymin", "bxmax", "bymax"]].to_numpy())
        row = {k: pdf[k].iloc[0] for k in keys}
        row["n_zones"] = len(m)
        row["total_width"] = float((m[:, 2] - m[:, 0]).sum()) if len(m) else 0.0
        return pd.DataFrame([row])

    return boxes.groupBy(*keys).applyInPandas(merge, out_schema)
