"""Parquet table sources for the engine's fixture star schema.

The engine's primary source is Parquet (columnar, splittable,
predicate-pushdown-capable) — the scale-path replacement for the
reference's single 1.7 GB TSV streamed on one thread
(geonames.js:239-242).

One real adapter concern lives here: ``events.parquet`` stores its
event-time column as Parquet ``TIMESTAMP(NANOS)``, which Spark's
vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We read
nanos as int64 (legacy conf) and floor-convert to TIMESTAMP_NTZ at
microsecond precision — the exact truncation Arrow/DuckDB apply, so
downstream comparisons agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_geonames_spark.session import apply_runtime_confs

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Columns stored as Parquet TIMESTAMP(NANOS) per table — loaded as
# int64 nanos and converted. Everything else reads natively.
_NANOS_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame with engine-canonical types.

    Timestamps are TIMESTAMP_NTZ (wall-clock semantics, matching both
    the Parquet metadata `isAdjustedToUTC=false` and DuckDB's
    TIMESTAMP); nano-precision columns are floored to microseconds.
    """
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NANOS_TS_COLS.get(name, []):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            # floor-divide nanos → micros (matches Arrow/DuckDB ns→us
            # truncation), then to NTZ via UTC (identity under the
            # engine's pinned session timezone).
            df = df.withColumn(
                c,
                F.timestamp_micros(F.expr(f"`{c}` div 1000")).cast("timestamp_ntz"),
            )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLE_NAMES}
