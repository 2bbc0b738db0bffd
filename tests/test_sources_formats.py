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
