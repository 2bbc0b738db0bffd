"""End-to-end job-runner test: config JSON → download (file:// mirror)
→ transform → NDJSON outputs, the reference user's full workflow.
"""

from __future__ import annotations

import json
import zipfile

from etl_geonames_spark.geonames.job import run


def test_job_end_to_end(spark, tmp_path):
    rows = [
        ["1001", "Amsterdam", "Amsterdam", "", "52.37", "4.89", "P", "PPLA",
         "NL", "", "07", "0363", "", "", "0", "", "", "", ""],
        ["1003", "Berlin", "Berlin", "", "52.52", "13.40", "P", "PPLC",
         "DE", "", "16", "00", "", "", "0", "", "", "", ""],
    ]
    server = tmp_path / "server"
    server.mkdir()
    with zipfile.ZipFile(server / "allCountries.zip", "w") as z:
        z.writestr(
            "allCountries.txt",
            "\n".join("\t".join(r) for r in rows) + "\n",
        )
    (server / "admin1CodesASCII.txt").write_text(
        "NL.07\tNoord-Holland\tNoord-Holland\t2749879\n"
    )
    (server / "admin2Codes.txt").write_text(
        "NL.07.0363\tGemeente Amsterdam\tGemeente Amsterdam\t2759793\n"
    )
    (tmp_path / "extra-uris.json").write_text(
        json.dumps(["http://sws.geonames.org/1003"])
    )
    config = {
        # the reference README's configuration surface (README.md:11-19)
        "countries": ["NL"],
        "types": {"PPL": "hg:Place"},
        "extraUris": str(tmp_path / "extra-uris.json"),
        "baseUrl": f"file://{server}/",
        "envelope": True,
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(config))

    out = run(str(cfg_path), str(tmp_path / "work"), spark=spark)

    pits = spark.read.json(f"{out}/pits")
    # Amsterdam (NL filter) + Berlin (extra-uris override past the filter)
    assert {r["uri"] for r in pits.select("uri").collect()} == {
        "http://sws.geonames.org/1001",
        "http://sws.geonames.org/1003",
    }
    rels = spark.read.json(f"{out}/relations")
    assert rels.filter(
        (rels["from"] == "http://sws.geonames.org/1001")
        & (rels["to"] == "http://sws.geonames.org/2759793")
        & (rels["type"] == "hg:liesIn")
    ).count() == 1
    envelope = spark.read.text(f"{out}/envelope")
    assert envelope.count() == pits.count() + rels.count()

    # dataset card: field-for-field parity with the reference's
    # geonames.dataset.json (id, licensing, and the JSON-LD @context
    # a Histograph-style consumer uses to type the data fields)
    with open(f"{out}/geonames.dataset.json") as f:
        card = json.load(f)
    assert card["id"] == "geonames"
    assert card["license"] == "CC BY 3.0"
    assert card["author"] == "GeoNames"
    assert card["website"] == "http://www.geonames.org/"
    assert card["editor"] == "Histograph"
    ctx = card["@context"]
    assert ctx["gn"] == "http://www.geonames.org/ontology#"
    assert ctx["featureClass"] == {
        "@id": "gn:featureClass",
        "@type": "xsd:string",
    }
    assert ctx["featureCode"] == {
        "@id": "gn:featureCode",
        "@type": "xsd:string",
    }
