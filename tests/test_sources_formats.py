"""File-format robustness: CSV bad-record policies, ORC round-trip,
parquet schema evolution. The reference hard-codes TSV-in/NDJSON-out;
a general engine must land arbitrary formats without crashing on the
damage a 100 TB landing zone always contains."""

from __future__ import annotations

import pytest

from etl_geonames_spark.sources import load_table
from etl_geonames_spark.sources.formats import (
    CORRUPT_COL,
    read_csv,
    read_orc,
    read_parquet_evolved,
    split_corrupt,
    write_orc,
)

CSV_SCHEMA = "id BIGINT, name STRING, score DOUBLE"


@pytest.fixture(scope="module")
def dirty_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("formats") / "dirty.csv"
    p.write_text(
        "id,name,score\n"
        "1,alpha,0.5\n"
        "not_a_number,beta,0.25\n"  # id fails BIGINT
        "2,gamma,0.75\n"
        "3,delta,bad_double\n"  # score fails DOUBLE
        "4,epsilon,1.0\n"
    )
    return str(p)


def test_csv_permissive_quarantines_bad_rows(spark, dirty_csv):
    df = read_csv(spark, dirty_csv, CSV_SCHEMA, mode="PERMISSIVE")
    assert CORRUPT_COL in df.columns
    clean, bad = split_corrupt(df)
    assert clean.count() == 3
    assert sorted(r["name"] for r in clean.collect()) == [
        "alpha", "epsilon", "gamma",
    ]
    # quarantine holds the raw damaged lines for routing/inspection
    bad_lines = sorted(r[CORRUPT_COL] for r in bad.collect())
    assert bad_lines == ["3,delta,bad_double", "not_a_number,beta,0.25"]


def test_csv_dropmalformed_drops_silently(spark, dirty_csv):
    df = read_csv(spark, dirty_csv, CSV_SCHEMA, mode="DROPMALFORMED")
    assert CORRUPT_COL not in df.columns
    assert len(df.collect()) == 3
    # the documented trap: a zero-column count() plan skips parsing,
    # so nothing is malformed and the RAW line count comes back
    assert df.count() == 5


def test_csv_failfast_raises(spark, dirty_csv):
    df = read_csv(spark, dirty_csv, CSV_SCHEMA, mode="FAILFAST")
    with pytest.raises(Exception, match="(?i)malformed"):
        df.collect()


def test_orc_round_trip(spark, sf_dir, tmp_path):
    """ORC write → read preserves rows and schema; scans prune columns
    and push predicates like parquet."""
    src = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    path = str(tmp_path / "docs_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.schema == src.schema
    assert back.count() == src.count()
    assert (
        back.filter(back["doc_id"] < 100).count()
        == src.filter(src["doc_id"] < 100).count()
    )
    plan = (
        back.filter(back["doc_id"] < 100)
        .select("doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)]" in plan


def test_parquet_merge_schema_evolution(spark, sf_dir, tmp_path):
    """v1 writes (doc_id, lang); v2 adds quality. mergeSchema unions
    the footers; v1 rows surface quality as NULL — no rewrite of old
    files, the append-only evolution contract."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    v1 = str(tmp_path / "lineage" / "v1")
    v2 = str(tmp_path / "lineage" / "v2")
    docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang").write.parquet(v1)
    docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", (F.col("n_chars") / 100.0).alias("quality")
    ).write.parquet(v2)
    merged = read_parquet_evolved(spark, v1, v2)
    assert set(merged.columns) == {"doc_id", "lang", "quality"}
    assert merged.count() == docs.count()
    assert (
        merged.filter(F.col("quality").isNull()).count()
        == docs.filter(F.col("doc_id") % 2 == 0).count()
    )


# ---------------------------------------------------------------------------
# Python DataSource: the geonames dump format as a custom connector
# ---------------------------------------------------------------------------

_GN_ROWS = [
    ["1001", "Haarlem", "Haarlem", "", "52.38", "4.63", "P", "PPL", "NL",
     "", "07", "0392", "", "", "150000", "", "2", "Europe/Amsterdam",
     "2017-01-01"],
    ["1007", "Berlin", "Berlin", "", "52.52", "13.40", "P", "PPL", "DE",
     "", "01", "002", "", "", "", "", "", "", ""],
    # embedded quote exercises the no-quote-handling contract
    ['1008', 'Brus"sels', 'Brus"sels', "", "50.85", "4.35", "P", "PPL",
     "BE", "", "BRU", "21", "", "", "", "", "", "", ""],
]


@pytest.fixture(scope="module")
def gn_dump_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("gn_dump")
    (d / "part1.txt").write_text(
        "\n".join("\t".join(r) for r in _GN_ROWS[:2]) + "\n"
    )
    (d / "part2.txt").write_text("\t".join(_GN_ROWS[2]) + "\n")
    return str(d)


def test_geonames_datasource_matches_csv_reader(spark, gn_dump_dir):
    """The Python DataSource and the built-in CSV scan read the same
    dump identically: 19 string columns, empty→NULL, quotes verbatim,
    one partition per file."""
    from etl_geonames_spark.sources.geonames_datasource import (
        register_geonames_source,
    )
    from etl_geonames_spark.sources.tsv import read_all_countries

    register_geonames_source(spark)
    ds = spark.read.format("geonames").load(gn_dump_dir)
    csv = read_all_countries(spark, gn_dump_dir + "/*.txt")
    assert ds.schema == csv.schema
    assert ds.rdd.getNumPartitions() == 2
    assert sorted(map(tuple, ds.collect())) == sorted(map(tuple, csv.collect()))


def test_geonames_datasource_pushes_equality_filter(spark, gn_dump_dir):
    """countryCode = 'NL' is consumed by pushFilters and applied
    vectorized inside the scan: any Spark-side Filter node may keep
    only the isnotnull residual on countryCode — never the equality,
    however a future plan rendering chooses to format it."""
    import re

    from etl_geonames_spark.sources.geonames_datasource import (
        register_geonames_source,
    )

    register_geonames_source(spark)
    flt = (
        spark.read.format("geonames").load(gn_dump_dir)
        .filter("countryCode = 'NL'")
    )
    rows = flt.collect()
    assert [r["geonameid"] for r in rows] == ["1001"]
    plan = flt._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan geonames" in plan
    # Anchor on the Filter operator nodes themselves: collect every
    # countryCode reference inside them and require each one to be an
    # isnotnull residual. Substring checks like `'= NL' not in plan`
    # go stale if equality renders as EqualTo(...)/equal(...); this
    # fails on ANY non-isnotnull countryCode predicate regardless of
    # rendering.
    filter_lines = [
        ln for ln in plan.splitlines() if re.search(r"\bFilter\b", ln)
    ]
    assert filter_lines, "expected the isnotnull residual Filter node"
    for ln in filter_lines:
        assert "countryCode" in ln
        assert re.search(r"isnotnull\(countryCode", ln), ln
        stripped = re.sub(r"isnotnull\(countryCode[^)]*\)", "", ln)
        assert "countryCode" not in stripped, (
            "non-isnotnull countryCode predicate survived Spark-side: "
            + ln
        )


@pytest.fixture(scope="module")
def dirty_ndjson(tmp_path_factory):
    d = tmp_path_factory.mktemp("ndjson")
    p = d / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "alpha"}\n'
        "this line is not json\n"
        '{"doc_id": "not-a-number", "text": "beta"}\n'
        '{"doc_id": 3, "text": "gamma"}\n'
    )
    return str(p)


def test_json_permissive_quarantines_bad_lines(spark, dirty_ndjson):
    from etl_geonames_spark.sources.formats import read_json, split_corrupt

    df = read_json(spark, dirty_ndjson, "doc_id BIGINT, text STRING")
    clean, bad = split_corrupt(df)
    assert {r.doc_id for r in clean.collect()} == {1, 3}
    assert bad.count() == 2  # non-JSON line + type-mismatched doc_id


def test_json_failfast_raises(spark, dirty_ndjson):
    from etl_geonames_spark.sources.formats import read_json

    df = read_json(
        spark, dirty_ndjson, "doc_id BIGINT, text STRING", mode="FAILFAST"
    )
    with pytest.raises(Exception):
        df.collect()


def test_geonames_datasource_writer_roundtrip(spark, gn_dump_dir, tmp_path):
    """Write path of the Python DataSource: read the dump, write it
    back out via format("geonames"), read THAT, and require the exact
    same row multiset — NULL↔empty-field and raw-quote conventions
    must survive a full roundtrip. Also checks the two-phase commit
    left a _SUCCESS marker and no .tmp orphans."""
    import os

    from etl_geonames_spark.sources.geonames_datasource import (
        register_geonames_source,
    )

    register_geonames_source(spark)
    src = spark.read.format("geonames").load(gn_dump_dir)
    out = str(tmp_path / "dump_out")
    src.write.format("geonames").mode("append").save(out)

    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]

    back = spark.read.format("geonames").load(out)
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b and len(a) == 3

    # overwrite replaces, not appends
    src.limit(1).write.format("geonames").mode("overwrite").save(out)
    again = spark.read.format("geonames").load(out)
    assert again.count() == 1


def test_xml_roundtrip_and_bad_record_policy(spark, tmp_path):
    """Native XML source (Spark 4 core): write→read roundtrip
    preserves values and nested structs; a malformed row lands in
    _corrupt_record under PERMISSIVE and vanishes under
    DROPMALFORMED — the same tri-state policy as CSV/JSON."""
    from pyspark.sql import Row

    from etl_geonames_spark.sources.formats import read_xml, write_xml

    df = spark.createDataFrame(
        [
            Row(id=1, name='quo"ted', geo=Row(lat=52.37, lon=4.89)),
            Row(id=2, name="plain & free", geo=Row(lat=40.71, lon=-74.0)),
        ]
    )
    out = str(tmp_path / "xml_out")
    write_xml(df, out, row_tag="place", root_tag="places")
    back = read_xml(spark, out, row_tag="place")
    got = sorted(
        (r["id"], r["name"], r["geo"]["lat"], r["geo"]["lon"])
        for r in back.collect()
    )
    assert got == [
        (1, 'quo"ted', 52.37, 4.89),
        (2, "plain & free", 40.71, -74.0),
    ]

    bad = tmp_path / "bad.xml"
    bad.write_text(
        "<rows><row><id>1</id><name>ok</name></row>"
        "<row><id>not_a_number</id><name>bad</name></row></rows>"
    )
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    perm = read_xml(spark, str(bad), schema=schema)
    rows = perm.collect()
    assert len(rows) == 2
    assert sum(r["_corrupt_record"] is not None for r in rows) == 1
    strict_schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    dropped = read_xml(
        spark, str(bad), schema=strict_schema, mode="DROPMALFORMED"
    )
    assert [r["id"] for r in dropped.collect()] == [1]


def test_tsv_sink_batch_write_and_overwrite(spark, tmp_path):
    """Custom write-only DataSource, batch half: tab-joined lines,
    NULL → empty field, _SUCCESS on commit, no .tmp orphans,
    overwrite replaces rather than appends."""
    from pyspark.sql import Row

    from etl_geonames_spark.sources.tsv_sink import register_tsv_sink

    register_tsv_sink(spark)
    df = spark.createDataFrame(
        [Row(a=1, b="x\ty".replace("\t", " "), c=None),
         Row(a=2, b='quo"te', c=3.5)]
    )
    out = str(tmp_path / "tsv_out")
    df.write.format("tsv_sink").mode("append").save(out)

    import os

    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]
    lines = sorted(
        ln
        for f in os.listdir(out)
        if f.startswith("part-")
        for ln in open(os.path.join(out, f)).read().splitlines()
    )
    assert lines == ["1\tx y\t", '2\tquo"te\t3.5']

    df.limit(1).write.format("tsv_sink").mode("overwrite").save(out)
    lines2 = [
        ln
        for f in os.listdir(out)
        if f.startswith("part-")
        for ln in open(os.path.join(out, f)).read().splitlines()
    ]
    assert len(lines2) == 1


def test_tsv_sink_streaming_epochs_match_batch(spark, sf_dir, tmp_path):
    """Streaming half: drain the events fixture through the custom
    sink with availableNow; the union of epoch files must equal the
    batch projection exactly, and the _epochs log must account for
    every row once (exactly-once bookkeeping)."""
    import os

    from etl_geonames_spark.sources.tsv_sink import register_tsv_sink
    from etl_geonames_spark.streaming.pipeline import read_events_stream

    register_tsv_sink(spark)
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    ev = read_events_stream(spark, sf_dir).select(
        "event_id", "event_type", "user_id"
    )
    q = (
        ev.writeStream.format("tsv_sink")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        ln
        for f in os.listdir(out)
        if f.startswith("part-b")
        for ln in open(os.path.join(out, f)).read().splitlines()
    )
    from etl_geonames_spark.sources import load_table

    exp = sorted(
        f"{r['event_id']}\t{r['event_type']}\t{r['user_id']}"
        for r in load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "user_id")
        .collect()
    )
    assert got == exp
    epochs = open(os.path.join(out, "_epochs")).read().splitlines()
    assert sum(int(ln.split("\t")[1]) for ln in epochs) == len(exp)


def test_tsv_sink_stream_reader_tails_epoch_log(spark, sf_dir, tmp_path):
    """Full custom-connector loop: events → tsv_sink (streaming
    write) → tsv_sink stream READER (offsets = epoch log) → memory
    sink. The re-read multiset must equal the original projection —
    proving offset planning reads every committed epoch exactly
    once and the log (not directory listing) drives visibility."""
    import os

    from etl_geonames_spark.sources.tsv_sink import register_tsv_sink
    from etl_geonames_spark.streaming.pipeline import read_events_stream

    register_tsv_sink(spark)
    out = str(tmp_path / "queue")
    (
        read_events_stream(spark, sf_dir)
        .select("event_id", "event_type", "user_id")
        .writeStream.format("tsv_sink")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck_w"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    assert os.path.exists(os.path.join(out, "_epochs"))

    back = (
        spark.readStream.format("tsv_sink")
        .schema("event_id string, event_type string, user_id string")
        .option("path", out)
        .load()
    )
    q = (
        back.writeStream.format("memory")
        .queryName("tsv_back")
        .option("checkpointLocation", str(tmp_path / "ck_r"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["event_id"], r["event_type"], r["user_id"])
        for r in spark.sql("SELECT * FROM tsv_back").collect()
    )
    from etl_geonames_spark.sources import load_table

    exp = sorted(
        (str(r["event_id"]), r["event_type"], str(r["user_id"]))
        for r in load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "user_id")
        .collect()
    )
    assert got == exp


def test_publish_atomic_writes_manifest_and_promotes(spark, sf_dir, tmp_path):
    """Atomic publish: staging dir never survives, _MANIFEST.json
    checksums every data file, verify_published round-trips, and a
    corrupted byte is caught by the consumer-side check."""
    import json
    import os

    from etl_geonames_spark.sources import load_table
    from etl_geonames_spark.sources.sinks import (
        publish_atomic,
        verify_published,
    )

    df = load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "published")
    m = publish_atomic(df, out)
    assert not os.path.exists(out + ".__staging__")
    assert m["total_rows"] == df.count()
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        assert json.load(f)["files"] == m["files"]
    assert verify_published(out)["ok"]

    # second publish without overwrite refuses and leaves data intact
    import pytest as _pytest

    with _pytest.raises(FileExistsError):
        publish_atomic(df, out)
    assert verify_published(out)["ok"]

    # overwrite republish is atomic and verifiable
    m2 = publish_atomic(df.limit(5), out, overwrite=True)
    assert m2["total_rows"] == 5
    assert verify_published(out)["ok"]

    # corrupt one data file -> verify flags exactly that file
    victim = next(iter(m2["files"]))
    with open(os.path.join(out, victim), "r+b") as f:
        f.seek(4)
        f.write(b"\xde\xad")
    v = verify_published(out)
    assert not v["ok"] and v["bad_files"] == [victim]


def test_incremental_read_processes_only_new_files(spark, tmp_path):
    """Manifest-based incremental ingest: run 1 sees every landed
    file; after commit, run 2 sees ONLY the newly landed file; a
    drained landing zone yields None (no empty-glob Spark job). The
    manifest commit is atomic (temp + rename) and stores relative
    paths."""
    import pandas as pd

    from etl_geonames_spark.sources.incremental import (
        commit_manifest,
        incremental_read,
        read_manifest,
    )

    land = tmp_path / "landing"
    land.mkdir()
    pd.DataFrame({"k": [1, 2]}).to_parquet(land / "a.parquet")
    pd.DataFrame({"k": [3]}).to_parquet(land / "b.parquet")
    manifest = str(tmp_path / "state" / "manifest.json")

    df1, new1 = incremental_read(spark, str(land), manifest)
    assert sorted(new1) == ["a.parquet", "b.parquet"]
    assert df1.count() == 3
    commit_manifest(manifest, new1)

    # nothing new → no DataFrame at all
    df_none, new_none = incremental_read(spark, str(land), manifest)
    assert df_none is None and new_none == []

    # one more file lands → only it is read
    pd.DataFrame({"k": [4, 5]}).to_parquet(land / "c.parquet")
    df2, new2 = incremental_read(spark, str(land), manifest)
    assert new2 == ["c.parquet"]
    assert [r["k"] for r in df2.orderBy("k").collect()] == [4, 5]
    commit_manifest(manifest, new2)
    assert read_manifest(manifest) == {"a.parquet", "b.parquet", "c.parquet"}
