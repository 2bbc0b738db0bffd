"""Sinks.

The reference emits NDJSON through its framework writer
(``tools.writer.writeObjects``, geonames.js:172). Spark's JSON sink
*is* NDJSON (one JSON object per line, one file per partition), so the
engine's sink is a thin, declarative wrapper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_ndjson(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a DataFrame as newline-delimited JSON (geonames.js:172)."""
    df.write.mode(mode).json(path)


def write_ndjson_lines(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a one-string-column DataFrame of pre-serialized JSON lines
    verbatim (text sink). Used with
    :func:`etl_geonames_spark.geonames.tagged_envelope` for byte-level
    parity with the reference's interleaved ``{type, obj}`` stream —
    the JSON sink would double-encode it."""
    df.write.mode(mode).text(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink — the engine's staged-pipeline interchange format.

    ``partition_by`` is the 100 TB lever: partitioning stage outputs
    by their downstream filter keys (e.g. countryCode, event date)
    turns later scans into partition-pruned reads.
    """
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
