"""Explicit schemas for the GeoNames-shaped inputs and outputs.

The reference imposes names positionally at parse time with
``R.zipObj`` (geonames.js:74, 242) and keeps everything a string until
explicitly parsed (lat/lon via parseFloat, geonames.js:144-145). The
engine makes the same contract explicit as StructTypes: all-string at
ingest, casts happen in the pipeline where the reference parses.
"""

from __future__ import annotations

from pyspark.sql import types as T

# geonames.js:24-44 — the 19 positional columns of allCountries.txt.
ALL_COUNTRIES_COLUMNS = [
    "geonameid",
    "name",
    "asciiname",
    "alternatenames",
    "latitude",
    "longitude",
    "featureClass",
    "featureCode",
    "countryCode",
    "cc2",
    "admin1Code",
    "admin2Code",
    "admin3Code",
    "admin4Code",
    "population",
    "elevation",
    "dem",
    "timezone",
    "modificationDate",
]

ALL_COUNTRIES_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType(), True) for c in ALL_COUNTRIES_COLUMNS]
)

# geonames.js:46-51 — admin1CodesASCII.txt / admin2Codes.txt columns.
ADMIN_CODE_COLUMNS = ["code", "name", "asciiname", "geonameid"]

ADMIN_CODE_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType(), True) for c in ADMIN_CODE_COLUMNS]
)

# geonames.js:53-59 — the admin-key columns used to derive relations.
ADMIN_KEYS = [
    "countryCode",
    "admin1Code",
    "admin2Code",
    "admin3Code",
    "admin4Code",
]

# geonames.js:137-158 — the nested PIT output record.
PIT_SCHEMA = T.StructType(
    [
        T.StructField("uri", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("type", T.StringType(), False),
        T.StructField(
            "geometry",
            T.StructType(
                [
                    T.StructField("type", T.StringType(), False),
                    T.StructField(
                        "coordinates", T.ArrayType(T.DoubleType()), False
                    ),
                ]
            ),
            False,
        ),
        T.StructField(
            "data",
            T.StructType(
                [
                    T.StructField("featureClass", T.StringType(), True),
                    T.StructField("featureCode", T.StringType(), True),
                    T.StructField("countryCode", T.StringType(), True),
                    T.StructField("cc2", T.StringType(), True),
                    T.StructField("admin1Code", T.StringType(), True),
                    T.StructField("admin2Code", T.StringType(), True),
                    T.StructField("admin3Code", T.StringType(), True),
                    T.StructField("admin4Code", T.StringType(), True),
                ]
            ),
            False,
        ),
    ]
)

# geonames.js:111-117 — the liesIn relation edge.
RELATION_SCHEMA = T.StructType(
    [
        T.StructField("from", T.StringType(), False),
        T.StructField("to", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
    ]
)
