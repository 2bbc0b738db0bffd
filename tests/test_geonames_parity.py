"""Reference-parity tests for the geonames pipeline.

One synthetic GeoNames-shaped fixture (FIXTURES.md §B) covering every
semantic branch of the reference's hot path (SURVEY.md §3.3):
prefix-match typing and drops, the exactly-3-codes gate, self-parent
fallback, extra-uris override, the empty-filters quirk, [lon, lat]
coordinate order, and join-miss handling.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_geonames_spark.geonames import (
    GeonamesConfig,
    filters_predicate,
    resolve_type,
    run_pipeline,
    tagged_envelope,
)
from etl_geonames_spark.sources.tsv import read_admin_codes, read_all_countries

# 19 tab-separated columns (geonames.js:24-44); '' = empty field.
FACT_ROWS = [
    # id, name, ascii, alt, lat, lon, fclass, fcode, cc, cc2, a1, a2, a3, a4, pop, elev, dem, tz, mod
    ["1001", "Haarlem", "Haarlem", "", "52.38084", "4.63683", "P", "PPL", "NL", "", "07", "0392", "", "", "150000", "", "2", "Europe/Amsterdam", "2017-01-01"],
    ["2002", "Gemeente Haarlem", "Gemeente Haarlem", "", "52.38", "4.64", "A", "ADM2", "NL", "", "07", "0392", "", "", "", "", "", "", ""],
    ["1003", "TwoCodes", "TwoCodes", "", "52.0", "5.0", "P", "PPL", "NL", "", "07", "", "", "", "", "", "", "", ""],
    ["1004", "FourCodes", "FourCodes", "", "52.1", "5.1", "P", "PPL", "NL", "", "07", "0392", "001", "", "", "", "", "", ""],
    ["1005", "PrefixTyped", "PrefixTyped", "", "52.2", "5.2", "P", "PPLA3", "NL", "", "07", "0392", "", "", "", "", "", "", ""],
    ["1006", "Untyped", "Untyped", "", "52.3", "5.3", "H", "HLL", "NL", "", "07", "0392", "", "", "", "", "", "", ""],
    ["1007", "Berlin", "Berlin", "", "52.52", "13.40", "P", "PPL", "DE", "", "01", "002", "", "", "", "", "", "", ""],
    ["1008", "Brussels", "Brussels", "", "50.85", "4.35", "P", "PPL", "BE", "", "BRU", "21", "", "", "", "", "", "", ""],
    ["1009", "MissParent", "MissParent", "", "52.4", "5.4", "P", "PPL", "NL", "", "07", "9999", "", "", "", "", "", "", ""],
    ["1010", "CapeTownish", "CapeTownish", "", "-33.9258", "-18.4232", "P", "PPL", "NL", "", "", "", "", "", "", "", "", "", ""],
]

ADMIN1_ROWS = [
    ["NL.07", "North Holland", "North Holland", "3003"],
    ["BE.BRU", "Brussels Capital", "Brussels Capital", "4010"],
]
ADMIN2_ROWS = [
    ["NL.07.0392", "Gemeente Haarlem", "Gemeente Haarlem", "2002"],
    ["BE.BRU.21", "Ville de Bruxelles", "Ville de Bruxelles", "4004"],
]

CONFIG = GeonamesConfig(
    types={"PPL": "hg:Place", "PPLA": "hg:PlaceA", "ADM2": "hg:Admin2"},
    filters=[{"countryCode": "NL"}],
    extra_uris=["http://sws.geonames.org/1008"],
)


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("geonames")
    p = {}
    for fname, rows in [
        ("allCountries.txt", FACT_ROWS),
        ("admin1CodesASCII.txt", ADMIN1_ROWS),
        ("admin2Codes.txt", ADMIN2_ROWS),
    ]:
        path = os.path.join(d, fname)
        with open(path, "w", encoding="utf-8") as f:
            f.write("\n".join("\t".join(r) for r in rows) + "\n")
        p[fname] = path
    return p


@pytest.fixture(scope="module")
def outputs(spark, paths):
    fact = read_all_countries(spark, paths["allCountries.txt"])
    a1 = read_admin_codes(spark, paths["admin1CodesASCII.txt"])
    a2 = read_admin_codes(spark, paths["admin2Codes.txt"])
    pits, rels = run_pipeline(fact, a1, a2, CONFIG)
    return pits.collect(), rels.collect()


def test_pit_set(outputs):
    pits, _ = outputs
    uris = sorted(p["uri"] for p in pits)
    base = "http://sws.geonames.org/"
    # 1006 dropped (no type prefix), 1007 dropped (filter + no allowlist),
    # 1008 kept via extra-uris despite failing the filter.
    assert uris == sorted(
        base + i
        for i in ["1001", "2002", "1003", "1004", "1005", "1008", "1009", "1010"]
    )


def test_longest_prefix_type(outputs):
    pits, _ = outputs
    by_uri = {p["uri"].rsplit("/", 1)[-1]: p for p in pits}
    assert by_uri["1001"]["type"] == "hg:Place"
    assert by_uri["1005"]["type"] == "hg:PlaceA"  # PPLA3 → PPLA, not PPL
    assert by_uri["2002"]["type"] == "hg:Admin2"


def test_coordinate_order_lon_lat(outputs):
    pits, _ = outputs
    by_uri = {p["uri"].rsplit("/", 1)[-1]: p for p in pits}
    geom = by_uri["1010"]["geometry"]
    assert geom["type"] == "Point"
    assert geom["coordinates"] == [-18.4232, -33.9258]  # [lon, lat]


def test_data_bag(outputs):
    pits, _ = outputs
    by_uri = {p["uri"].rsplit("/", 1)[-1]: p for p in pits}
    d = by_uri["1001"]["data"]
    assert d["featureClass"] == "P"
    assert d["featureCode"] == "PPL"
    assert d["countryCode"] == "NL"
    assert d["admin1Code"] == "07"
    assert d["admin2Code"] == "0392"
    assert d["admin3Code"] == ""  # empty stays empty, not null


def test_relations(outputs):
    _, rels = outputs
    base = "http://sws.geonames.org/"
    edges = sorted((r["from"], r["to"], r["type"]) for r in rels)
    assert edges == sorted(
        [
            (base + "1001", base + "2002", "hg:liesIn"),
            # self-parent fallback: 2002 IS its own admin2 → admin1 parent
            (base + "2002", base + "3003", "hg:liesIn"),
            (base + "1005", base + "2002", "hg:liesIn"),
            # allowlisted row still joins its own country's admin2
            (base + "1008", base + "4004", "hg:liesIn"),
            # 1003 (2 codes), 1004 (4 codes), 1010 (1 code): gated out
            # 1009: admin2 probe miss → dropped (reference would crash)
        ]
    )


def test_join_miss_drop_is_counted(spark, paths):
    """Default drop mode with an Observation: the 1009 row (admin2 key
    NL.07.9999 has no admin2 entry) is dropped AND counted — metrics
    ride the same action as the output, no extra pass."""
    from pyspark.sql import Observation

    fact = read_all_countries(spark, paths["allCountries.txt"])
    a1 = read_admin_codes(spark, paths["admin1CodesASCII.txt"])
    a2 = read_admin_codes(spark, paths["admin2Codes.txt"])
    obs = Observation("relation_misses")
    _, rels = run_pipeline(fact, a1, a2, CONFIG, observation=obs)
    got = {r["from"].rsplit("/", 1)[-1] for r in rels.collect()}
    assert "1009" not in got
    metrics = obs.get
    assert metrics["a2_misses"] == 1  # exactly the 1009 row
    assert metrics["a1_misses"] == 0
    assert metrics["gated_rows"] == 5  # 1001, 2002, 1005, 1008, 1009


def test_join_miss_fail_mode_raises(spark, paths):
    """on_miss='fail' restores the reference's crash (geonames.js:
    105-107): the job fails on the first admin2 probe miss, naming the
    offending key."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    fact = read_all_countries(spark, paths["allCountries.txt"])
    a1 = read_admin_codes(spark, paths["admin1CodesASCII.txt"])
    a2 = read_admin_codes(spark, paths["admin2Codes.txt"])
    _, rels = run_pipeline(fact, a1, a2, CONFIG, on_miss="fail")
    with pytest.raises((Py4JJavaError, PySparkException)) as exc:
        rels.collect()
    assert "admin2 probe miss for key NL.07.9999" in str(exc.value)


def test_join_miss_fail_mode_clean_data_passes(spark, paths):
    """fail mode is not fail-always: with the miss row filtered out
    upstream, strict mode produces the same edges as drop mode."""
    fact = read_all_countries(spark, paths["allCountries.txt"]).filter(
        F.col("geonameid") != "1009"
    )
    a1 = read_admin_codes(spark, paths["admin1CodesASCII.txt"])
    a2 = read_admin_codes(spark, paths["admin2Codes.txt"])
    _, rels = run_pipeline(fact, a1, a2, CONFIG, on_miss="fail")
    got = sorted(r["from"].rsplit("/", 1)[-1] for r in rels.collect())
    assert got == ["1001", "1005", "1008", "2002"]


def test_empty_filters_quirk(spark, paths):
    """R.any over [] is false ⇒ empty output, even for allowlisted ids
    (geonames.js:243-245)."""
    cfg = GeonamesConfig(
        types=CONFIG.types, filters=[], extra_uris=CONFIG.extra_uris
    )
    fact = read_all_countries(spark, paths["allCountries.txt"])
    a1 = read_admin_codes(spark, paths["admin1CodesASCII.txt"])
    a2 = read_admin_codes(spark, paths["admin2Codes.txt"])
    pits, rels = run_pipeline(fact, a1, a2, cfg)
    assert pits.count() == 0
    assert rels.count() == 0


def test_conjunction_filter(spark, paths):
    """R.whereEq is a conjunction: all pairs must match."""
    fact = read_all_countries(spark, paths["allCountries.txt"])
    pred = filters_predicate([{"countryCode": "NL", "featureClass": "A"}])
    ids = [r["geonameid"] for r in fact.filter(pred).collect()]
    assert ids == ["2002"]


def test_resolve_type_unit(spark):
    df = spark.createDataFrame(
        [("PPLA3",), ("PPL",), ("ADM2",), ("XYZ",), ("P",)], ["code"]
    )
    out = df.select(
        "code", resolve_type(F.col("code"), CONFIG.types).alias("t")
    ).collect()
    got = {r["code"]: r["t"] for r in out}
    assert got == {
        "PPLA3": "hg:PlaceA",
        "PPL": "hg:Place",
        "ADM2": "hg:Admin2",
        "XYZ": None,
        "P": None,
    }


def test_tagged_envelope_roundtrip(spark, paths):
    import json

    fact = read_all_countries(spark, paths["allCountries.txt"])
    a1 = read_admin_codes(spark, paths["admin1CodesASCII.txt"])
    a2 = read_admin_codes(spark, paths["admin2Codes.txt"])
    pits, rels = run_pipeline(fact, a1, a2, CONFIG)
    lines = [json.loads(r["json"]) for r in tagged_envelope(pits, rels).collect()]
    kinds = {line["type"] for line in lines}
    assert kinds == {"pit", "relation"}
    pit = next(l["obj"] for l in lines if l["type"] == "pit")
    assert set(pit) >= {"uri", "name", "type", "geometry", "data"}
    rel = next(l["obj"] for l in lines if l["type"] == "relation")
    assert set(rel) == {"from", "to", "type"}
