"""Pages source: determinism + the byte-identical extraction invariant
(BASELINE.json.input_hint) + record parse into the synthetic geography."""

from pyspark.sql import functions as F

from bano_spark import synth
from bano_spark.sources import pages as P


def test_extract_text_byte_identical(spark):
    pg = P.synth_pages(spark, 500, partitions=4)
    bad = P.extract_text(pg).filter(F.col("extracted_text") != F.col("text"))
    assert bad.count() == 0


def test_pages_deterministic(spark):
    a = P.synth_pages(spark, 100, partitions=2).orderBy("url").collect()
    b = P.synth_pages(spark, 100, partitions=7).orderBy("url").collect()
    assert [r.text for r in a] == [r.text for r in b]
    assert [bytes(r.html) for r in a] == [bytes(r.html) for r in b]


def test_sql_generator_identical_to_pandas(spark):
    a = P.synth_pages(spark, 300, partitions=3).orderBy("url").collect()
    b = P.synth_pages_sql(spark, 300, partitions=5).orderBy("url").collect()
    assert [r.text for r in a] == [r.text for r in b]
    assert [bytes(r.html) for r in a] == [bytes(r.html) for r in b]
    assert [r.warc_ts for r in a] == [r.warc_ts for r in b]
    assert [(r.url, r.lang) for r in a] == [(r.url, r.lang) for r in b]


def test_records_land_in_communes(spark):
    pg = P.synth_pages(spark, 400, partitions=4)
    recs = P.extract_records(pg)
    rows = recs.collect()
    assert len(rows) == 400
    xs = {(c[0], c[3], c[5]) for c in synth.COMMUNES}
    for r in rows[:50]:
        # every extracted point must fall inside its declared commune strip
        match = [c for c in synth.COMMUNES if c[0] == r.insee_com][0]
        assert match[3] <= r.x < match[5], (r.insee_com, r.x)
        assert r.fantoir.startswith(r.insee_com)
        assert r.numero.isdigit()


def test_extraction_matches_point_derivation(spark):
    """Extracted coordinates round-trip exactly to the synth formulas."""
    pg = P.synth_pages(spark, 64, partitions=2)
    recs = {r.url: r for r in P.extract_records(pg).collect()}
    import numpy as np

    ids = np.arange(64)
    _, x, y = P._derive_points(ids)
    for i in ids:
        url = f"https://crawl.example/{P.KINDS[i % 4]}/{i:010d}"
        assert recs[url].x == x[i] and recs[url].y == y[i]
