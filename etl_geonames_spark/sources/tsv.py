"""Headerless TSV sources (GeoNames dump format).

The reference parses its TSVs by hand — readline → split('\\t') →
zipObj (geonames.js:69-80, 239-242). The engine reads the same files
with Spark's CSV source: splittable, schema'd, and whole-stage
codegen'd, so a 1.7 GB (or 1.7 TB) dump scans in parallel instead of
on one thread.

GeoNames TSVs contain no quoting or escaping; ``quote=''`` disables
quote handling so embedded ``"`` characters pass through verbatim,
matching the reference's naive split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_geonames_spark.schemas import (
    ADMIN_CODE_SCHEMA,
    ALL_COUNTRIES_SCHEMA,
)


def read_all_countries(spark: SparkSession, path: str) -> DataFrame:
    """Scan allCountries.txt (19 string columns, geonames.js:24-44)."""
    return spark.read.csv(
        path,
        sep="\t",
        schema=ALL_COUNTRIES_SCHEMA,
        header=False,
        quote="",
        mode="PERMISSIVE",
    )


def read_admin_codes(spark: SparkSession, path: str) -> DataFrame:
    """Scan an admin-code dimension TSV (geonames.js:69-80).

    The reference drops empty lines with ``.compact()``
    (geonames.js:72); Spark's CSV reader skips blank lines already,
    and the explicit non-null filter documents (and guarantees) the
    same contract.
    """
    df = spark.read.csv(
        path,
        sep="\t",
        schema=ADMIN_CODE_SCHEMA,
        header=False,
        quote="",
        mode="PERMISSIVE",
    )
    return df.filter(F.col("code").isNotNull())
