"""Physical table layout (Iceberg stand-in): partitioning + sort order.

The reference tunes Postgres with composite B-tree/GIST indexes,
fillfactor and CLUSTER (sql/create_table_base_bano.sql:46-52,
finalisation.sql:1-6). On a 100 TB lake those become TABLE LAYOUT:

  * partition columns  -> partition pruning (the `__com__` / dept
    template substitution becomes a scan-time PartitionFilter)
  * in-file sort order -> min/max-stat row-group skipping; we sort by
    the z-grid quadkey, a Z-order curve, so spatially close rows land
    in the same row groups (the CLUSTER-on-GIST equivalent)

No Iceberg jars ship in this sandbox, so the writer targets
partitioned parquet with the identical layout semantics; swapping in
`writeTo(...).partitionedBy(...)` is mechanical.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..geo import tiles


def with_quadkey(df: DataFrame, x: str = "x", y: str = "y", zoom: int = 12,
                 out: str = "quadkey") -> DataFrame:
    """Attach the Z-order sort key (Bing quadkey of the point's cell)."""
    return df.withColumn(
        out, tiles.quadkey(tiles.tile_x(F.col(x), zoom),
                           tiles.tile_y(F.col(y), zoom), zoom))


def write_layout(df: DataFrame, path: str, partition_cols: Sequence[str],
                 sort_cols: Sequence[str]) -> None:
    """Partitioned, sorted write: one partition dir per key combo,
    rows sorted within files so column stats prune row groups."""
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_pruned(spark: SparkSession, path: str) -> DataFrame:
    """Read back; filters on partition columns prune directories at
    planning time (visible as PartitionFilters in the scan node)."""
    return spark.read.parquet(path)


def write_bucketed(df: DataFrame, table: str, bucket_cols: Sequence[str],
                   num_buckets: int, sort_cols: Sequence[str] = ()) -> None:
    """Bucketed (and optionally sorted) managed parquet table — the
    co-located-join layout: two tables bucketed the same way join with
    NO Exchange on either side (asserted in tests), which at 100 TB is
    the difference between a metadata-planned merge and reshuffling
    both fact tables. Iceberg equivalent: `bucket(N, col)` partition
    transform."""
    w = (df.write.mode("overwrite").format("parquet")
         .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
