"""Checkpoint/lineage resumability + the tile-expiry streaming path."""

from pathlib import Path

from pyspark.sql import functions as F

from bano_spark import synth
from bano_spark.geo import tiles
from bano_spark.plans.lineage import CheckpointLog, resumable_partition_write
from bano_spark.streaming.incremental import dirty_insee_batch, run_dirty_insee_stream


def test_resumable_write_skips_done(spark, tmp_path):
    log = CheckpointLog(spark, str(tmp_path / "log"))
    out = str(tmp_path / "out")
    df = spark.range(100).withColumn("dept", (F.col("id") % 4).cast("string"))

    first = resumable_partition_write(df, out, "dept", log, "BAN", "load")
    assert first == ["0", "1", "2", "3"]
    # second run: everything already done -> no keys written
    second = resumable_partition_write(df, out, "dept", log, "BAN", "load")
    assert second == []
    # partial resume: pretend dept 2 and 3 were never done
    log2 = CheckpointLog(spark, str(tmp_path / "log2"))
    log2.append([("BAN", "load", "0", 25, 0.0, 1.0, "x"),
                 ("BAN", "load", "1", 25, 0.0, 1.0, "x")])
    third = resumable_partition_write(df, out, "dept", log2, "BAN", "load")
    assert third == ["2", "3"]
    # output still complete
    assert spark.read.parquet(out).count() == 100


def _tile_lines(path: Path, coords):
    path.mkdir(parents=True, exist_ok=True)
    z = tiles.DEFAULT_ZOOM
    (path / "a.tiles").write_text(
        "".join(f"{z}/{tiles.py_tile_x(x, z)}/{tiles.py_tile_y(y, z)}\n"
                for x, y in coords))


def test_streaming_dirty_insee(spark, tmp_path):
    feed = tmp_path / "feed"
    # one tile in 01002, one in the 3rd Paris arrondissement
    _tile_lines(feed, [(synth.REG0 + 15000.0, synth.REGY0 + 50.0),
                       (synth.PARIS0 + 25000.0, synth.REGY0 + 50.0)])
    communes = synth.commune_polygons_df(spark)
    out = tmp_path / "dirty"
    run_dirty_insee_stream(spark, str(feed), communes, str(out), str(tmp_path / "ck"))
    got = sorted(r.insee_com for r in
                 spark.read.parquet(str(out / "*")).collect())
    assert got == ["01002", "75103"]
    # batch twin agrees
    batch = sorted(r.insee_com for r in
                   dirty_insee_batch(spark, str(feed), communes).collect())
    assert batch == got


def test_partitioned_layout_prunes(spark, tmp_path):
    """Filters on the partition column must become scan-time
    PartitionFilters (directory pruning), and the quadkey sort must be
    attached — the Iceberg-layout stand-in (plans/layout.py)."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from bano_spark.plans.layout import read_pruned, with_quadkey, write_layout

    df = spark.range(0, 2000).select(
        F.col("id"),
        F.expr("CASE WHEN id % 2 = 0 THEN '01' ELSE '02' END").alias("dept"),
        (1000003.0 + (F.col("id") % 100) * 1000.0).alias("x"),
        (2000003.0 + (F.col("id") % 90) * 100.0).alias("y"))
    df = with_quadkey(df)
    out = str(tmp_path / "cumul")
    write_layout(df, out, ["dept"], ["quadkey"])

    back = read_pruned(spark, out).filter(F.col("dept") == "01")
    assert back.count() == 1000
    buf = io.StringIO()
    with redirect_stdout(buf):
        back.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    # the dept predicate lands in PartitionFilters, not a post-scan Filter
    pf_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "dept" in pf_line


def test_stateful_running_stats(spark, tmp_path):
    """applyInPandasWithState keeps per-key state across micro-batches:
    two input files processed as separate batches must fold into one
    running (count, sum) per key."""
    import pandas as pd
    from pyspark.sql import functions as F

    from bano_spark.streaming.stateful import run_running_stats_stream

    src = tmp_path / "feed"
    src.mkdir()
    pd.DataFrame({"k": ["a", "a", "b"], "v": [1.0, 2.0, 10.0]}).to_parquet(
        src / "f1.parquet")
    pd.DataFrame({"k": ["a", "b"], "v": [4.0, 20.0]}).to_parquet(
        src / "f2.parquet")
    schema = "k string, v double"
    # one file per trigger => two micro-batches
    feed = (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(str(src)))
    from bano_spark.streaming.stateful import running_commune_stats
    out = running_commune_stats(
        feed.select(F.col("k").alias("key"), F.col("v").alias("value"))
        .groupBy("key"))
    q = (out.writeStream.format("memory").queryName("rs_test")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = {r.key: (r.n_rows, r.sum_value)
            for r in spark.table("rs_test").orderBy("key").collect()
            }  # update mode: last row per key wins; collect dedups below
    final = {}
    for r in spark.table("rs_test").collect():
        prev = final.get(r.key)
        if prev is None or r.n_rows >= prev[0]:
            final[r.key] = (r.n_rows, r.sum_value)
    assert final["a"] == (3, 7.0)
    assert final["b"] == (2, 30.0)


def test_iceberg_surface_guarded(spark):
    """The native-Iceberg adapter (plans/iceberg.py) activates only
    when the catalog jars exist; in this sandbox the probe must report
    False and the parquet stand-ins stay in charge. When jars ARE
    present, exercise the round-trip."""
    from bano_spark.plans import iceberg as I

    if not I.iceberg_available(spark):
        import pytest
        pytest.skip("no Iceberg jars in sandbox — parquet stand-in path "
                    "covered by the lineage/layout/incremental tests")
    df = spark.range(10).withColumn("dept", (F.col("id") % 3).cast("string"))
    I.create_partitioned(df, "local.t_ice", ["dept"])
    I.overwrite_partitions(
        df.filter("dept = '1'").withColumn("id", F.col("id") + 100),
        "local.t_ice")
    ids = I.snapshot_ids(spark, "local.t_ice")
    assert len(ids) >= 2
    inc = I.read_incremental(spark, "local.t_ice", ids[0], ids[-1])
    assert inc.count() > 0
