"""PIT-projection queries: the geonames dataflow shape mapped onto the
fixture star schema so the DuckDB oracle can check it end-to-end.

The byte-faithful GeoNames pipeline (nested structs, real admin TSVs)
lives in ``etl_geonames_spark.geonames`` and is pinned by
``tests/test_geonames_parity.py``; these queries re-express the same
dataflow — filter → longest-prefix type → broadcast parent joins →
projection — over customer/nation/region, with the nested outputs
flattened because the correctness gate hashes flat columns.

Analog mapping: customer=place, nation=admin2 dim, region=admin1 dim,
c_mktsegment=featureCode, synthesized lon/lat from acctbal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_geonames_spark.geonames.pipeline import filters_predicate, resolve_type
from etl_geonames_spark.registry import query
from etl_geonames_spark.sources import load_table

BASE = "http://example.org/place/"
NATION_BASE = "http://example.org/nation/"

# prefix-typed segment map (featureCode analog, geonames.js:127-132):
# BUILDING resolves via 'BUILD', AUTOMOBILE via 'AUTO'; FURNITURE and
# HOUSEHOLD have no prefix → untyped → dropped.
_SEGMENT_TYPES = {"BUILD": "hg:Building", "AUTO": "hg:Vehicle", "MACH": "hg:Machine"}

_SEGMENT_CASE = """
    CASE WHEN c_mktsegment LIKE 'BUILD%' THEN 'hg:Building'
         WHEN c_mktsegment LIKE 'AUTO%'  THEN 'hg:Vehicle'
         WHEN c_mktsegment LIKE 'MACH%'  THEN 'hg:Machine'
    END
"""


def _typed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").withColumn(
        "pit_type", resolve_type(F.col("c_mktsegment"), _SEGMENT_TYPES)
    )


@query(
    "project_pit",
    oracle=f"""
    SELECT 'http://example.org/place/' || CAST(c_custkey AS VARCHAR) AS uri,
           c_name AS name, pit_type,
           ROUND((c_acctbal % 360) - 180, 6) AS lon,
           ROUND((c_acctbal % 180) - 90, 6) AS lat,
           c_mktsegment AS data_segment,
           CAST(c_nationkey AS INT) AS data_nationkey
    FROM (SELECT *, {_SEGMENT_CASE} AS pit_type FROM customer) t
    WHERE pit_type IS NOT NULL
    """,
)
def project_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIT projection (geonames.js:137-158): URI concat, typed filter,
    [lon, lat] coordinate pair, property bag — flattened for the
    oracle. Pure projection over a scan; codegen'd end to end."""
    return (
        _typed_customers(spark, sf_dir)
        .filter(F.col("pit_type").isNotNull())
        .select(
            F.concat(F.lit(BASE), F.col("c_custkey").cast("string")).alias("uri"),
            F.col("c_name").alias("name"),
            F.col("pit_type"),
            F.round(F.col("c_acctbal") % 360 - 180, 6).alias("lon"),
            F.round(F.col("c_acctbal") % 180 - 90, 6).alias("lat"),
            F.col("c_mktsegment").alias("data_segment"),
            F.col("c_nationkey").cast("int").alias("data_nationkey"),
        )
    )


@query(
    "rel_liesin",
    oracle=f"""
    SELECT 'http://example.org/place/' || CAST(c_custkey AS VARCHAR) AS src,
           'http://example.org/nation/' || CAST(n_nationkey AS VARCHAR) AS dst,
           'hg:liesIn' AS rel_type
    FROM (SELECT *, {_SEGMENT_CASE} AS pit_type FROM customer) c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE pit_type IS NOT NULL
      AND len(list_filter([c_mktsegment, CAST(c_nationkey AS VARCHAR),
                           CASE WHEN c_acctbal > 0 THEN 'POS' ELSE '' END],
                          x -> x <> '')) = 3
    """,
)
def rel_liesin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """liesIn edge derivation (geonames.js:100-123): exactly-3-codes
    gate (js:104) + broadcast dim probe with drop-on-miss, emitting
    (src, dst, type) edges. The codes array reuses the compaction
    primitive; the nation join is the admin2 probe."""
    codes = F.filter(
        F.array(
            F.col("c_mktsegment"),
            F.col("c_nationkey").cast("string"),
            F.when(F.col("c_acctbal") > 0, F.lit("POS")).otherwise(F.lit("")),
        ),
        lambda x: x != "",
    )
    c = _typed_customers(spark, sf_dir).filter(F.col("pit_type").isNotNull())
    n = load_table(spark, sf_dir, "nation")
    return (
        c.withColumn("_codes", codes)
        .filter(F.size("_codes") == 3)
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"], "inner")
        .select(
            F.concat(F.lit(BASE), F.col("c_custkey").cast("string")).alias("src"),
            F.concat(
                F.lit(NATION_BASE), F.col("n_nationkey").cast("string")
            ).alias("dst"),
            F.lit("hg:liesIn").alias("rel_type"),
        )
    )


@query(
    "pit_pipeline",
    oracle=f"""
    SELECT 'http://example.org/place/' || CAST(c_custkey AS VARCHAR) AS uri,
           c_name AS name, pit_type,
           n_name AS nation_name, r_name AS region_name
    FROM (SELECT *, {_SEGMENT_CASE} AS pit_type FROM customer) c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE pit_type IS NOT NULL
      AND (c_mktsegment = 'BUILDING' OR c_mktsegment = 'MACHINERY'
           OR c_custkey IN (1, 2, 3))
    """,
)
def pit_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship: the reference's whole transform dataflow
    (geonames.js:223-254) in one plan — whereEq-disjunction filter
    with allowlist override → longest-prefix typing with drop →
    two broadcast parent joins → projection. Shuffle-free: scan +
    codegen filter/project + two BroadcastHashJoins."""
    pred = filters_predicate(
        [{"c_mktsegment": "BUILDING"}, {"c_mktsegment": "MACHINERY"}]
    ) | F.col("c_custkey").isin([1, 2, 3])
    c = _typed_customers(spark, sf_dir).filter(pred).filter(
        F.col("pit_type").isNotNull()
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"], "inner")
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"], "left")
        .select(
            F.concat(F.lit(BASE), F.col("c_custkey").cast("string")).alias("uri"),
            F.col("c_name").alias("name"),
            F.col("pit_type"),
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )


def flagship_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nested-struct form of pit_pipeline (the engine's native
    output shape, mirroring PIT_SCHEMA) — used by ``entry()``; the
    oracle-checked queries above are its flattened projections."""
    flat = pit_pipeline(spark, sf_dir)
    return flat.select(
        "uri",
        "name",
        F.col("pit_type").alias("type"),
        F.struct(
            F.lit("Point").alias("type"),
            F.array(F.lit(0.0), F.lit(0.0)).alias("coordinates"),
        ).alias("geometry"),
        F.struct(
            F.col("nation_name").alias("nation"),
            F.col("region_name").alias("region"),
        ).alias("data"),
    )
