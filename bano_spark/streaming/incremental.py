"""Incremental / streaming path: tile-expiry feed -> dirty communes.

The reference's nightly loop (cron_osm.sh:21-22 + update_manager.py:
26-33) is micro-batch: imposm drops ``*.tiles`` files of expired z16
tiles; the next run folds them into the list of communes to recompute.

Spark-first: the tile files become a Structured Streaming text source;
each micro-batch (Trigger.AvailableNow for the nightly shape, or a
continuous trigger for lower latency) is rasterized against the commune
cover and appends the dirty-INSEE list, which drives partition-pruned
recomputation (plans.lineage.resumable_partition_write)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..geo import tiles as tl
from ..operators.tiling import expired_tiles_to_insee, parse_tile_lines


def expire_feed(spark: SparkSession, tiles_dir: str) -> DataFrame:
    """Streaming DataFrame of (z, x, y) from a directory of tile files
    (lines 'z/x/y', models.py:322-325)."""
    raw = spark.readStream.format("text").load(tiles_dir)
    return parse_tile_lines(raw)


def run_dirty_insee_stream(
    spark: SparkSession,
    tiles_dir: str,
    commune_polys: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    zoom: int = tl.DEFAULT_ZOOM,
):
    """availableNow pass over the expiry feed; each micro-batch writes
    the distinct dirty INSEE list. Returns the finished query."""
    feed = expire_feed(spark, tiles_dir)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        dirty = expired_tiles_to_insee(batch_df, commune_polys, zoom)
        dirty.coalesce(1).write.mode("append").parquet(out_dir)

    q = (
        feed.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def dirty_insee_batch(spark: SparkSession, tiles_dir: str, commune_polys: DataFrame,
                      zoom: int = tl.DEFAULT_ZOOM) -> DataFrame:
    """Batch twin of the stream (the weekly full pass, cron_bano.sh:32-45)."""
    raw = spark.read.format("text").load(tiles_dir)
    return expired_tiles_to_insee(parse_tile_lines(raw), commune_polys, zoom)
