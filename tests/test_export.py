"""Export sinks: CSV quoting parity vs python csv (the reference's
writer), NDJSON byte layout vs the reference f-strings, TTL quirks."""

import csv
import io
import json

from pyspark.sql import functions as F

from bano_spark.operators import export as X


def _py_csv(rows):
    out = []
    for row in rows:
        buf = io.StringIO()
        csv.writer(buf, dialect="unix", quoting=csv.QUOTE_MINIMAL).writerow(row)
        out.append(buf.getvalue()[:-1])  # strip the record terminator
    return out


def test_csv_quote_minimal_parity(spark):
    rows = [
        ("F1-2", "2", "Rue de la Paix", "01000", "Ville", "OSM", "1.5", "2.5"),
        ('F2-3', '3B', 'Rue "des" Lilas', "01000", "Ville, Sud", "O+O", "1", "2"),
        ("F3-4", "4", "A\nB", "", "V", "CAD", "0", "0"),
    ]
    df = spark.createDataFrame(
        rows, ["id", "numero", "voie", "code_post", "ville", "source", "lat", "lon"])
    got = [r.line for r in X.export_csv_lines(df).collect()]
    assert got == _py_csv(rows)


def test_json_voie_line_matches_reference_fstring(spark):
    row = dict(fantoir="010010001X", citycode="01001", type="street",
               name="Rue de la Paix", postcode="01000;01001", lat="45.1",
               lon="5.2", cityname="Bourg", departement="Ain",
               region="ARA", importance="0.1234",
               housenumbers="2$45.1$5.2#4$45.2$5.3")
    df = spark.createDataFrame([tuple(row.values())], list(row.keys()))
    got = X.json_voie_line(df).collect()[0].line
    # rebuild with the reference's own formatting (export.py:160-169)
    pc = row["postcode"].split(";")
    s_h = ",".join(
        f'"{s.split("$")[0]}":{{"lat":{s.split("$")[1]},"lon":{s.split("$")[2]}}}'
        for s in row["housenumbers"].split("#"))
    want = (f'{{"id":"{row["fantoir"]}","citycode":"{row["citycode"]}",'
            f'"type":"{row["type"]}","name":"{row["name"]}",'
            f'"postcode":{json.dumps(pc)},"lat":"{row["lat"]}",'
            f'"lon":"{row["lon"]}","city":"{row["cityname"]}",'
            f'"departement":"{row["departement"]}","region":"{row["region"]}",'
            f'"importance":{row["importance"]},"housenumbers":{{{s_h}}}}}')
    assert got == want


def test_ttl_arrondissement_quirks(spark):
    rows = [
        ("75101-2", "2", "Rue X", "75001", "Paris", "OSM", "48.8", "2.3"),
        ("69381-2", "2", "Rue Y", "69001", "Lyon", "OSM", "45.7", "4.8"),
        ("01001-2", "2", "Rue Z", "01000", "Bourg", "OSM", "46.2", "5.2"),
    ]
    df = spark.createDataFrame(
        rows, ["id", "numero", "voie", "code_post", "ville", "source", "lat", "lon"])
    lines = {r.line.split(">")[0][26:31]: r.line for r in X.ttl_record(df).collect()}
    assert "arrondissementMunicipal/75101" in lines["75101"]
    # Lyon range is empty in the reference -> falls to the quirky else
    assert "commune/69381-2[0:5]" in lines["69381"]
    assert "commune/01001-2[0:5]" in lines["01001"]
