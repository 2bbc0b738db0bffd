"""General-purpose file-format surface: CSV with bad-record policies,
ORC, and schema-evolution parquet reads.

The reference hard-codes one format (headerless TSV in, NDJSON out —
geonames.js:69-80, 172); a general engine must ingest whatever lands.
Everything here is a thin, opinionated wrapper over Spark's built-in
sources — all splittable, schema'd, codegen'd scans — with the 100 TB
defaults baked in:

- **Explicit schema always.** Inference is a full extra pass (CSV/JSON)
  or a footer fan-out (parquet mergeSchema) before the real scan.
- **Malformed rows are a POLICY, not a crash.** A 100 TB CSV landing
  zone always contains damage; choose per-job between quarantining
  (PERMISSIVE + corrupt-record column → count/inspect/route), dropping
  (DROPMALFORMED), or failing fast (FAILFAST for contractual inputs).
  This is the same strict-vs-lenient dial as the GeoNames join-miss
  mode (geonames/pipeline.py `on_miss`), applied at the scan.
- **ORC round-trips** for interop with Hive-era lakes: column-pruned,
  predicate-pushdown scans same as parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructType

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    *,
    mode: str = "PERMISSIVE",
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Schema'd CSV scan with an explicit bad-record policy.

    PERMISSIVE appends ``_corrupt_record`` (nullable string) holding
    the raw line for rows that failed the schema — quarantine with
    :func:`split_corrupt`. DROPMALFORMED silently drops them; FAILFAST
    raises on the first one.

    DROPMALFORMED caveat: a bare ``df.count()`` returns the RAW line
    count — zero-column plans skip parsing entirely, so nothing is
    dropped. Any plan that touches a real column (the normal case)
    parses and drops correctly.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if mode.upper() == "PERMISSIVE" and CORRUPT_COL not in schema.names:
        # the corrupt-record column must be part of the declared schema
        # or Spark silently never populates it
        schema = schema.add(CORRUPT_COL, StringType(), True)
    return spark.read.csv(
        path,
        schema=schema,
        mode=mode.upper(),
        header=header,
        sep=sep,
        columnNameOfCorruptRecord=CORRUPT_COL,
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) split of a PERMISSIVE read — route the
    quarantine to a dead-letter sink instead of losing rows silently.

    The cache is REQUIRED, not an optimization: Spark refuses queries
    that reference only the internal corrupt-record column of a live
    CSV scan (SPARK-21610) — materializing first lifts the
    restriction, and the two output branches share the one scan.
    """
    from pyspark.sql import functions as F

    df = df.cache()
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return clean, bad


def write_orc(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """ORC sink (zlib default) — bucketing/partitionBy compose exactly
    as with parquet."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan: column pruning + predicate pushdown, same contract as
    the parquet scans pinned in tests/test_ingest_pruning.py."""
    return spark.read.orc(path)


def read_parquet_evolved(spark: SparkSession, *paths: str) -> DataFrame:
    """Read a parquet lineage whose schema grew over time.

    ``mergeSchema`` unions the footers: columns absent in older files
    surface as NULL. At 100 TB, footer merging across millions of
    files is itself a job — pin the superset schema explicitly once
    known (``spark.read.schema(s).parquet(...)``) and reserve
    mergeSchema for discovery.
    """
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    *,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Schema'd NDJSON scan with the same bad-record policy dial as
    :func:`read_csv` — the engine's own sink format read back as a
    source (round-trip with ``sources.sinks.write_ndjson``), and the
    landing format of most scraped/LLM corpora.

    Same quarantine semantics: PERMISSIVE + ``_corrupt_record`` +
    :func:`split_corrupt` routes unparseable lines to a dead letter;
    DROPMALFORMED drops; FAILFAST raises. Explicit schema always — at
    100 TB, JSON inference is a full extra pass over every byte."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if mode.upper() == "PERMISSIVE" and CORRUPT_COL not in schema.names:
        schema = schema.add(CORRUPT_COL, StringType(), True)
    return spark.read.json(
        path,
        schema=schema,
        mode=mode.upper(),
        columnNameOfCorruptRecord=CORRUPT_COL,
    )


def read_media_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Read a directory of media files through Spark's built-in
    ``binaryFile`` source: one row per file with (path,
    modificationTime, length, content) — the real ingestion path for
    image/audio corpora (each file an opaque binary column, decoded
    downstream by the operators/codecs.py mapInPandas stages).

    At 100 TB: binaryFile parallelizes by file, so millions of small
    media files want a compaction pass into Parquet binary columns
    first (sources/maintenance.compact_parquet — same listing-cost
    argument as small-file Parquet); pathGlobFilter prunes by
    extension at listing time, before any byte is read."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def write_xml(
    df: DataFrame,
    path: str,
    *,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """Write via Spark 4's native XML source (built-in since 4.0 —
    the spark-xml package absorbed into core). One element per row
    under ``rootTag``, nested structs become nested elements."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode(mode)
        .save(path)
    )


def read_xml(
    spark: SparkSession,
    path: str,
    *,
    row_tag: str = "row",
    schema=None,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read XML with the same bad-record policy surface as read_csv:
    PERMISSIVE (corrupt rows → ``_corrupt_record``), DROPMALFORMED,
    or FAILFAST. Attributes surface as ``_attrname`` columns,
    repeated child elements as arrays — XML's answer to schema
    evolution is the same explicit-schema discipline as JSON.

    At 100 TB: XML files split by row boundaries only when the source
    can find ``rowTag`` delimiters — deeply nested single-document
    files do NOT parallelize; shred them to one-document-per-file (or
    convert to Parquet on landing, sources/maintenance) before the
    heavy queries, same argument as the NDJSON-vs-JSON-array rule."""
    reader = spark.read.format("xml").option("rowTag", row_tag).option(
        "mode", mode.upper()
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
