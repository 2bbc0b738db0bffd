"""NDJSON source — the read side of the engine's NDJSON sink.

The reference only ever *writes* NDJSON (geonames.js:172); downstream
Histograph reads it. The engine closes the loop so staged pipelines
can consume a previous stage's NDJSON output directly (Spark's JSON
source is newline-delimited by default, splittable, and predicate-
pushdown-capable for top-level columns).

Always pass an explicit schema at scale: schema inference is a full
extra pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_ndjson(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """Read newline-delimited JSON; explicit schema skips the inference
    pass (mandatory at 100 TB, convenient everywhere)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
