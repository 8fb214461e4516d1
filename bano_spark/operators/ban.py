"""BAN-specific set logic (U4/J10).

rep_b_as_bis: the set of (id_fantoir, numero) whose 'b' repetition
really means 'bis' — i.e. addresses with rep='b' EXCEPT any that also
have siblings rep a/c/d (which would make b a building letter, not
bis). Reference: bano/sql/update_table_rep_b_as_bis.sql.
The join-side expansion b->bis / t->ter / q->quater mirrors
bano/sql/ban_hsnr_nocache.sql:10-25.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def rep_b_as_bis(ban: DataFrame) -> DataFrame:
    key = ["id_fantoir", "numero"]
    b = ban.filter(F.col("rep") == "b").select(*key)
    others = ban.filter(F.col("rep").isin("a", "c", "d")).select(*key)
    # SQL EXCEPT has distinct semantics (subtract == EXCEPT, not EXCEPT ALL)
    return b.subtract(others)


def expand_rep(ban: DataFrame, bis_set: DataFrame) -> DataFrame:
    """Attach display repetition: b->bis (only when in bis_set),
    t->ter, q->quater, else keep the raw letter."""
    marked = ban.join(
        bis_set.withColumn("_is_bis", F.lit(True)), ["id_fantoir", "numero"], "left")
    rep = (
        F.when((F.col("rep") == "b") & F.col("_is_bis"), "bis")
        .when(F.col("rep") == "t", "ter")
        .when(F.col("rep") == "q", "quater")
        .otherwise(F.col("rep"))
    )
    return marked.withColumn("rep_expanded", rep).drop("_is_bis")
