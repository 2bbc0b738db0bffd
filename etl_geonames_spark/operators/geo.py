"""Geospatial operators (SURVEY.md §2.14 — engine extension).

The reference is a geocoding ETL: it carries every place's
``[lon, lat]`` through to GeoJSON (geonames.js:142-147) but never
computes a spatial predicate itself — downstream consumers do. A
standalone engine replacing it at 100 TB needs those predicates
in-engine: bounding-box pruning, great-circle distance, space-filling-
curve bucketing for layout, cell-blocked spatial joins, and per-row
nearest-neighbour ranking.

The synthetic testdata has no coordinate columns, so every operator
derives deterministic lat/lon from integer keys with *pure integer/
double arithmetic* that DuckDB replays bit-identically (no RNG, no
engine-specific hash). The geometry math itself is the real thing.

Scale notes (100 TB posture):

- all coordinate derivation and geometry is whole-stage-codegen'd JVM
  expressions — zero Python, zero shuffles beyond the declared join/
  window keys;
- the spatial join is *cell-blocked*: equi-join on a grid cell id
  carries the shuffle (hash partitioned, AQE-skew-safe), the distance
  predicate only refines within a cell — never a nested-loop/cartesian
  plan (pinned in tests/test_plans.py);
- Morton (Z-order) codes are the standard data-layout primitive:
  writing a 100 TB point table sorted by ``morton`` makes bbox scans
  prune to O(touched cells) row groups via parquet min/max stats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_geonames_spark.functions import pin, qround, sql_qround
from etl_geonames_spark.registry import query
from etl_geonames_spark.sources import load_table

# Deterministic synthetic coordinates: key -> (lat, lon) on a 0.01°
# grid. Multiplicative spread by two primes, modulo the degree grid —
# identical BIGINT arithmetic in Spark and DuckDB.
_LAT_SQL = "(((({k}) * 7919) % 18000) / 100.0 - 90.0)"
_LON_SQL = "(((({k}) * 104729) % 36000) / 100.0 - 180.0)"


def _lat(key: Column) -> Column:
    return ((key * 7919) % 18000) / 100.0 - 90.0


def _lon(key: Column) -> Column:
    return ((key * 104729) % 36000) / 100.0 - 180.0


# ---------------------------------------------------------------------------
# bbox filter
# ---------------------------------------------------------------------------


@query(
    "geo_bbox_filter",
    oracle=f"""
    SELECT c_custkey,
           {_LAT_SQL.format(k="c_custkey")} AS lat,
           {_LON_SQL.format(k="c_custkey")} AS lon
    FROM customer
    WHERE {_LAT_SQL.format(k="c_custkey")} BETWEEN -45.0 AND 45.0
      AND {_LON_SQL.format(k="c_custkey")} BETWEEN -90.0 AND 90.0
    """,
)
def geo_bbox_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounding-box containment — the workhorse spatial predicate.

    Two range comparisons on scalar columns: Catalyst pushes both to
    the scan (PushedFilters) and, over a Z-ordered table, parquet
    min/max stats prune whole row groups. At 100 TB this is the
    difference between a full scan and touching ~(box area / cell
    area) of the files.
    """
    c = load_table(spark, sf_dir, "customer")
    lat, lon = _lat(F.col("c_custkey")), _lon(F.col("c_custkey"))
    return (
        c.select("c_custkey", lat.alias("lat"), lon.alias("lon"))
        .where(F.col("lat").between(-45.0, 45.0) & F.col("lon").between(-90.0, 90.0))
    )


# ---------------------------------------------------------------------------
# haversine distance
# ---------------------------------------------------------------------------

# NYPL, 476 5th Ave — the reference project's home institution.
_REF_LAT, _REF_LON = 40.7531, -73.9822


@query(
    "geo_haversine",
    oracle=f"""
    SELECT c_custkey,
           {sql_qround(
               f"2.0 * 6371.0088 * ASIN(SQRT("
               f"  SIN(RADIANS(({_LAT_SQL.format(k='c_custkey')}) - ({_REF_LAT})) / 2)"
               f"  * SIN(RADIANS(({_LAT_SQL.format(k='c_custkey')}) - ({_REF_LAT})) / 2)"
               f"  + COS(RADIANS({_REF_LAT})) * COS(RADIANS({_LAT_SQL.format(k='c_custkey')}))"
               f"  * SIN(RADIANS(({_LON_SQL.format(k='c_custkey')}) - ({_REF_LON})) / 2)"
               f"  * SIN(RADIANS(({_LON_SQL.format(k='c_custkey')}) - ({_REF_LON})) / 2)"
               f"))",
               2,
           )} AS dist_km
    FROM customer
    """,
)
def geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle distance to a fixed point (haversine, mean Earth
    radius 6371.0088 km), rounded to 10 m.

    All-JVM trig inside one codegen stage — a map-only plan with zero
    shuffles, so it streams at scan speed regardless of table size.
    Trig libms can differ by ulps across engines, so the compared
    column is qround'd two decimals (~10 m) — verified stable on the
    deterministic gate data.
    """
    c = load_table(spark, sf_dir, "customer")
    lat, lon = _lat(F.col("c_custkey")), _lon(F.col("c_custkey"))
    dphi = F.radians(lat - F.lit(_REF_LAT)) / 2
    dlmb = F.radians(lon - F.lit(_REF_LON)) / 2
    hav = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(F.lit(_REF_LAT))) * F.cos(F.radians(lat))
        * F.sin(dlmb) * F.sin(dlmb)
    )
    dist = 2.0 * 6371.0088 * F.asin(F.sqrt(hav))
    return c.select("c_custkey", qround(dist, 2).alias("dist_km"))


# ---------------------------------------------------------------------------
# Morton (Z-order) cell codes
# ---------------------------------------------------------------------------

_SPREAD_STEPS = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread(col: Column) -> Column:
    """Interleave zeros between the bits of a 16-bit int (JVM side)."""
    x = col.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def _spread_sql(expr: str) -> str:
    """The DuckDB mirror of :func:`_spread` — same steps, same masks."""
    x = f"(({expr}) & 65535)"
    for shift, mask in _SPREAD_STEPS:
        x = f"((({x}) | (({x}) << {shift})) & {mask})"
    return x


_IX_SQL = f"CAST(LEAST(FLOOR((({_LON_SQL.format(k='c_custkey')}) + 180.0) / 360.0 * 65536.0), 65535) AS BIGINT)"
_IY_SQL = f"CAST(LEAST(FLOOR((({_LAT_SQL.format(k='c_custkey')}) + 90.0) / 180.0 * 65536.0), 65535) AS BIGINT)"


@query(
    "geo_morton_cell",
    oracle=f"""
    SELECT c_custkey,
           (({_spread_sql(_IX_SQL)}) | (({_spread_sql(_IY_SQL)}) << 1)) AS morton
    FROM customer
    """,
)
def geo_morton_cell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit Morton (Z-order) code from 16-bit-quantized lon/lat.

    The space-filling-curve layout primitive: ``df.repartitionByRange
    ("morton").sortWithinPartitions("morton").write...`` clusters
    spatially-near points into the same parquet row groups, so bbox
    predicates (see :func:`geo_bbox_filter`) prune via min/max stats.
    The interleave is four shift-or-mask rounds per axis — pure
    codegen'd integer ops, no shuffle, no UDF.
    """
    c = load_table(spark, sf_dir, "customer")
    lat, lon = _lat(F.col("c_custkey")), _lon(F.col("c_custkey"))
    ix = F.least(F.floor((lon + 180.0) / 360.0 * 65536.0), F.lit(65535)).cast("long")
    iy = F.least(F.floor((lat + 90.0) / 180.0 * 65536.0), F.lit(65535)).cast("long")
    morton = _spread(ix).bitwiseOR(F.shiftleft(_spread(iy), 1))
    return c.select("c_custkey", morton.alias("morton"))


# ---------------------------------------------------------------------------
# cell-blocked spatial join
# ---------------------------------------------------------------------------

_CELL_SQL = (
    "(CAST(FLOOR((({lat}) + 90.0) / 10.0) AS BIGINT) * 36"
    " + CAST(FLOOR((({lon}) + 180.0) / 10.0) AS BIGINT))"
)


def _cell(lat: Column, lon: Column) -> Column:
    return (
        F.floor((lat + 90.0) / 10.0).cast("long") * 36
        + F.floor((lon + 180.0) / 10.0).cast("long")
    )


@query(
    "geo_grid_join",
    oracle=f"""
    WITH c AS (
        SELECT c_custkey,
               {_LAT_SQL.format(k="c_custkey")} AS clat,
               {_LON_SQL.format(k="c_custkey")} AS clon
        FROM customer
    ), s AS (
        SELECT s_suppkey,
               {_LAT_SQL.format(k="s_suppkey")} AS slat,
               {_LON_SQL.format(k="s_suppkey")} AS slon
        FROM supplier
    )
    SELECT c_custkey, s_suppkey,
           {sql_qround("(clat - slat) * (clat - slat) + (clon - slon) * (clon - slon)", 6)} AS dist2
    FROM c JOIN s
      ON {_CELL_SQL.format(lat="clat", lon="clon")} = {_CELL_SQL.format(lat="slat", lon="slon")}
    WHERE (clat - slat) * (clat - slat) + (clon - slon) * (clon - slon) <= 25.0
    """,
)
def geo_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial join by grid-cell blocking: pair customers with
    suppliers in the same 10° cell, refine to squared degree-space
    distance ≤ 25 (≈5° radius inside the cell).

    The 100 TB shape: the *equi-join on cell id* carries the shuffle —
    hash-partitioned, sort-merge/AQE-eligible — and the quadratic
    refinement is confined to one cell's occupants. The plan is pinned
    as a non-cartesian equi-join in tests/test_plans.py. Candidate
    pairs missed across cell borders are out of scope by definition
    (the declared semantics are within-cell neighbours; a border-safe
    variant unions the 9-cell neighbourhood, same plan shape).
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        _lat(F.col("c_custkey")).alias("clat"),
        _lon(F.col("c_custkey")).alias("clon"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        _lat(F.col("s_suppkey")).alias("slat"),
        _lon(F.col("s_suppkey")).alias("slon"),
    )
    dist2 = (F.col("clat") - F.col("slat")) * (F.col("clat") - F.col("slat")) + (
        F.col("clon") - F.col("slon")
    ) * (F.col("clon") - F.col("slon"))
    return (
        c.join(
            s,
            _cell(F.col("clat"), F.col("clon"))
            == _cell(F.col("slat"), F.col("slon")),
        )
        .where(dist2 <= 25.0)
        .select("c_custkey", "s_suppkey", qround(dist2, 6).alias("dist2"))
    )


# ---------------------------------------------------------------------------
# k-nearest-neighbour ranking
# ---------------------------------------------------------------------------


@query(
    "geo_knn",
    oracle=f"""
    WITH pairs AS (
        SELECT c_custkey, s_suppkey,
               (({_LAT_SQL.format(k="c_custkey")}) - ({_LAT_SQL.format(k="s_suppkey")}))
             * (({_LAT_SQL.format(k="c_custkey")}) - ({_LAT_SQL.format(k="s_suppkey")}))
             + (({_LON_SQL.format(k="c_custkey")}) - ({_LON_SQL.format(k="s_suppkey")}))
             * (({_LON_SQL.format(k="c_custkey")}) - ({_LON_SQL.format(k="s_suppkey")})) AS d2
        FROM customer JOIN supplier ON c_nationkey = s_nationkey
    ), ranked AS (
        SELECT c_custkey, s_suppkey, d2,
               ROW_NUMBER() OVER (
                   PARTITION BY c_custkey ORDER BY d2, s_suppkey
               ) AS rank
        FROM pairs
    )
    SELECT c_custkey, s_suppkey, rank, {sql_qround("d2", 6)} AS dist2
    FROM ranked WHERE rank <= 3
    """,
)
def geo_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer 3 nearest suppliers, candidate set blocked by an
    equi-key (same nation) — the scalable kNN recipe.

    The nation equi-join carries the shuffle; the per-customer window
    ranks only that customer's candidates (partitioned window — the
    global-window sweep in tests/test_plans.py forbids anything else).
    Distance is pure degree-space arithmetic, bit-identical across
    engines, so (d2, s_suppkey) ordering — and therefore the row set —
    is deterministic.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        _lat(F.col("c_custkey")).alias("clat"),
        _lon(F.col("c_custkey")).alias("clon"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_nationkey",
        _lat(F.col("s_suppkey")).alias("slat"),
        _lon(F.col("s_suppkey")).alias("slon"),
    )
    d2 = (F.col("clat") - F.col("slat")) * (F.col("clat") - F.col("slat")) + (
        F.col("clon") - F.col("slon")
    ) * (F.col("clon") - F.col("slon"))
    w = Window.partitionBy("c_custkey").orderBy(F.col("d2"), F.col("s_suppkey"))
    return (
        c.join(s, F.col("c_nationkey") == F.col("s_nationkey"))
        .withColumn("d2", d2)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("c_custkey", "s_suppkey", "rank", qround(F.col("d2"), 6).alias("dist2"))
    )


@query(
    "geo_polyline_length",
    oracle=f"""
    WITH pts AS (
      SELECT user_id, ts, event_id,
             {_LAT_SQL.format(k="event_id")} AS lat,
             {_LON_SQL.format(k="event_id")} AS lon
      FROM events
    ),
    seg AS (
      SELECT user_id, lat, lon,
             LAG(lat) OVER w AS plat,
             LAG(lon) OVER w AS plon
      FROM pts
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(COUNT(plat) AS BIGINT) AS n_segments,
           FLOOR(SUM(CASE WHEN plat IS NULL THEN 0.0 ELSE
             2.0 * 6371.0088 * asin(sqrt(
               sin(radians(lat - plat) / 2) * sin(radians(lat - plat) / 2)
               + cos(radians(plat)) * cos(radians(lat))
                 * sin(radians(lon - plon) / 2)
                 * sin(radians(lon - plon) / 2)))
             END) * 100.0 + 0.5) / 100.0 AS path_km
    FROM seg GROUP BY user_id
    """,
)
def geo_polyline_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory length per user: order each user's events by time,
    sum haversine segment distances between consecutive points — the
    GPS-track / movement-analytics aggregate (coordinates derived from
    event ids, same deterministic grid as the rest of the geo module).

    One window pass for the LAGged previous point (single shuffle on
    user_id), then a map-side-combined sum — O(points) work, O(1)
    state per row. Trig ulps across engines are absorbed by the 2-dp
    (≈10 m) qround on the summed length."""
    ev = load_table(spark, sf_dir, "events")
    lat, lon = _lat(F.col("event_id")), _lon(F.col("event_id"))
    pts = ev.select("user_id", "ts", "event_id", lat.alias("lat"), lon.alias("lon"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = pts.select(
        "user_id",
        "lat",
        "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
    )
    dphi = F.radians(F.col("lat") - F.col("plat")) / 2
    dlmb = F.radians(F.col("lon") - F.col("plon")) / 2
    hav = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(F.col("plat"))) * F.cos(F.radians(F.col("lat")))
        * F.sin(dlmb) * F.sin(dlmb)
    )
    dist = F.when(F.col("plat").isNull(), F.lit(0.0)).otherwise(
        2.0 * 6371.0088 * F.asin(F.sqrt(hav))
    )
    return seg.groupBy("user_id").agg(
        F.count("plat").alias("n_segments"),
        qround(F.sum(dist), 2).alias("path_km"),
    )


@query(
    "geo_extent_by_group",
    oracle=f"""
    WITH pts AS (
      SELECT c_nationkey,
             {_LAT_SQL.format(k="c_custkey")} AS lat,
             {_LON_SQL.format(k="c_custkey")} AS lon
      FROM customer
    )
    SELECT c_nationkey,
           MIN(lat) AS lat_min, MAX(lat) AS lat_max,
           MIN(lon) AS lon_min, MAX(lon) AS lon_max,
           FLOOR((MAX(lat) - MIN(lat)) * (MAX(lon) - MIN(lon))
                 * 10000.0 + 0.5) / 10000.0 AS bbox_area_deg2,
           CAST(COUNT(*) AS BIGINT) AS n_points
    FROM pts GROUP BY c_nationkey
    """,
)
def geo_extent_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial extent per group: the bounding box (and its area proxy)
    of each nation's points — the summary a spatial optimizer keeps
    per partition/file (the same min/max stats `cluster_parquet_by`
    materializes in parquet footers, surfaced as a query). Min/max
    are mergeable, so this is ONE map-side-combined hash aggregate;
    the derived-coordinate arithmetic is the module's exact-integer
    grid, so min/max agree bit-for-bit across engines without
    rounding (only the area product is quantized)."""
    c = load_table(spark, sf_dir, "customer")
    lat, lon = _lat(F.col("c_custkey")), _lon(F.col("c_custkey"))
    pts = c.select("c_nationkey", lat.alias("lat"), lon.alias("lon"))
    return pts.groupBy("c_nationkey").agg(
        F.min("lat").alias("lat_min"),
        F.max("lat").alias("lat_max"),
        F.min("lon").alias("lon_min"),
        F.max("lon").alias("lon_max"),
        qround(
            (F.max("lat") - F.min("lat")) * (F.max("lon") - F.min("lon")), 4
        ).alias("bbox_area_deg2"),
        F.count(F.lit(1)).alias("n_points"),
    )


# ---------------------------------------------------------------------------
# geohash encoding
# ---------------------------------------------------------------------------

_GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_PRECISION = 6  # 6 base32 chars = 30 bits (15 lon + 15 lat)

_GH_IX_SQL = (
    "CAST(LEAST(FLOOR(((" + _LON_SQL.format(k="c_custkey") + ") + 180.0)"
    " / 360.0 * 32768.0), 32767) AS BIGINT)"
)
_GH_IY_SQL = (
    "CAST(LEAST(FLOOR(((" + _LAT_SQL.format(k="c_custkey") + ") + 90.0)"
    " / 180.0 * 32768.0), 32767) AS BIGINT)"
)
# lat bits land at even positions, lon at odd — so the MSB (bit 29)
# is lon's top bit, the standard geohash bit order
_GH_CODE_SQL = (
    f"(({_spread_sql(_GH_IY_SQL)}) | (({_spread_sql(_GH_IX_SQL)}) << 1))"
)
_GH_CHARS_SQL = " || ".join(
    f"substr('{_GEOHASH_ALPHABET}',"
    f" CAST((({_GH_CODE_SQL}) >> {25 - 5 * j}) & 31 AS INT) + 1, 1)"
    for j in range(_GH_PRECISION)
)


@query(
    "geo_geohash",
    oracle=f"""
    SELECT c_custkey, ({_GH_CHARS_SQL}) AS geohash
    FROM customer
    """,
)
def geo_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard 6-character geohash (the public base32 cell id of
    Niemeyer's geohash.org scheme): 15-bit quantized lon/lat,
    lon-leading bit interleave (the same _spread rounds as the Morton
    code — geohash IS a Z-order curve with a textual alphabet), five
    bits per character. Prefix-sharing = spatial containment, so
    LIKE 'u09%' predicates prune by cell and the string sorts in
    Z-order — the join/layout key format shared with external geo
    systems, where the integer morton code stays engine-internal.

    Pure codegen'd integer/substring expressions; map-only, no
    shuffle, no UDF — identical arithmetic on both engines."""
    c = load_table(spark, sf_dir, "customer")
    lat, lon = _lat(F.col("c_custkey")), _lon(F.col("c_custkey"))
    return c.select("c_custkey", geohash_col(lat, lon).alias("geohash"))


def geohash_col(lat: Column, lon: Column) -> Column:
    """6-char geohash of (lat, lon) columns — canonical test vectors
    (u4pruy, s00000, 6gkzwg) pinned in tests/test_properties.py, so
    the encoding is checked against the PUBLIC scheme, not merely
    self-consistent with the oracle's identical arithmetic."""
    ix = F.least(
        F.floor((lon + 180.0) / 360.0 * 32768.0), F.lit(32767)
    ).cast("long")
    iy = F.least(
        F.floor((lat + 90.0) / 180.0 * 32768.0), F.lit(32767)
    ).cast("long")
    code = _spread(iy).bitwiseOR(F.shiftleft(_spread(ix), 1))
    parts = [
        F.substring(
            F.lit(_GEOHASH_ALPHABET),
            (
                F.shiftright(code, 25 - 5 * j).bitwiseAND(F.lit(31)) + 1
            ).cast("int"),
            1,
        )
        for j in range(_GH_PRECISION)
    ]
    return F.concat(*parts)


# ---------------------------------------------------------------------------
# point-in-polygon (convex, half-plane test)
# ---------------------------------------------------------------------------

# Fixed convex test polygon (a quadrilateral over Europe-ish lon/lat),
# counter-clockwise. A point is inside a convex CCW polygon iff the
# cross product (B-A) x (P-A) is >= 0 for every edge A->B.
_POLY = [(-10.0, 35.0), (30.0, 35.0), (40.0, 60.0), (-5.0, 65.0)]


def _pip_terms():
    edges = list(zip(_POLY, _POLY[1:] + _POLY[:1]))
    return edges


def _pip_sql(lon_expr: str, lat_expr: str) -> str:
    conds = []
    for (ax, ay), (bx, by) in _pip_terms():
        conds.append(
            f"((({bx}) - ({ax})) * (({lat_expr}) - ({ay}))"
            f" - (({by}) - ({ay})) * (({lon_expr}) - ({ax})) >= 0.0)"
        )
    return " AND ".join(conds)


@query(
    "geo_point_in_polygon",
    oracle=f"""
    SELECT c_custkey,
           ({_pip_sql(_LON_SQL.format(k="c_custkey"),
                      _LAT_SQL.format(k="c_custkey"))}) AS inside
    FROM customer
    """,
)
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-convex-polygon via the half-plane (cross-product sign)
    test: P is inside a CCW convex ring iff (B−A)×(P−A) ≥ 0 for every
    edge — four fused multiply-subtracts per point here, pure codegen'd
    double arithmetic, no trig, no UDF, map-only. The spatial
    predicate behind geofencing and region tagging; for CONCAVE
    polygons swap in ray-casting (odd crossing count) with the same
    map-only shape, and at 100 TB pre-filter with geo_bbox_filter /
    morton pruning so the exact test runs on candidates only."""
    c = load_table(spark, sf_dir, "customer")
    lat, lon = _lat(F.col("c_custkey")), _lon(F.col("c_custkey"))
    cond = F.lit(True)
    for (ax, ay), (bx, by) in _pip_terms():
        cross = (F.lit(bx - ax) * (lat - F.lit(ay))) - (
            F.lit(by - ay) * (lon - F.lit(ax))
        )
        cond = cond & (cross >= 0.0)
    return c.select("c_custkey", cond.alias("inside"))


_PYRAMID_ZOOMS = [16, 8, 4]


@query(
    "geo_tile_pyramid",
    oracle=f"""
    WITH m AS (
        SELECT c_custkey,
               (({_spread_sql(_IX_SQL)})
                | (({_spread_sql(_IY_SQL)}) << 1)) AS morton
        FROM customer
    ),
    z(zoom) AS (VALUES (16), (8), (4))
    SELECT z.zoom, m.morton >> (2 * (16 - z.zoom)) AS tile,
           CAST(COUNT(*) AS BIGINT) AS n_points
    FROM m CROSS JOIN z
    GROUP BY z.zoom, tile
    """,
)
def geo_tile_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-zoom tile aggregation pyramid — the map-rendering /
    spatial-rollup primitive: point counts per Z-order tile at zooms
    16, 8, and 4 in ONE pass. Because Morton codes nest (a zoom-z
    tile is the code right-shifted 2·(16−z) bits), every coarser tile
    is a bit-prefix of the finer one — no re-bucketing, no second
    scan, just integer shifts on the same 32-bit code
    (:func:`geo_morton_cell`).

    The 3-way zoom explode costs 3 map rows per point, then one hash
    aggregate with map-side combine collapses to the tile counts —
    the same Expand-style shape as ROLLUP but with closed-form
    hierarchy keys instead of grouping-set nulls.

    100 TB shape: output is ≤ Σ 4^z tiles (bounded by the grid, not
    the data); pyramids for heat maps write this partitioned by zoom
    and serve reads by tile-range — the Z-order clustering argument
    from geo_morton_cell end-to-end."""
    c = load_table(spark, sf_dir, "customer")
    lat, lon = _lat(F.col("c_custkey")), _lon(F.col("c_custkey"))
    ix = F.least(
        F.floor((lon + 180.0) / 360.0 * 65536.0), F.lit(65535)
    ).cast("long")
    iy = F.least(
        F.floor((lat + 90.0) / 180.0 * 65536.0), F.lit(65535)
    ).cast("long")
    morton = _spread(ix).bitwiseOR(F.shiftleft(_spread(iy), 1))
    return (
        c.select(
            morton.alias("morton"),
            F.explode(
                F.array(*[F.lit(z) for z in _PYRAMID_ZOOMS])
            ).alias("zoom"),
        )
        .select(
            "zoom",
            F.expr("shiftright(morton, 2 * (16 - zoom))").alias("tile"),
        )
        .groupBy("zoom", "tile")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


@query(
    "geo_shoelace_area",
    oracle=f"""
    WITH pts AS (
        SELECT user_id, ts, event_id,
               {_LAT_SQL.format(k="event_id")} AS lat,
               {_LON_SQL.format(k="event_id")} AS lon
        FROM events
    ),
    seg AS (
        SELECT user_id, lat, lon,
               LAG(lat) OVER w AS plat,
               LAG(lon) OVER w AS plon
        FROM pts
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    inner_sum AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               SUM(CASE WHEN plat IS NULL THEN 0.0
                        ELSE plon * lat - lon * plat END) AS s
        FROM seg GROUP BY user_id
    ),
    ends AS (
        SELECT user_id,
               first(lat ORDER BY ts, event_id) AS flat,
               first(lon ORDER BY ts, event_id) AS flon,
               last(lat ORDER BY ts, event_id) AS llat,
               last(lon ORDER BY ts, event_id) AS llon
        FROM pts GROUP BY user_id
    )
    SELECT i.user_id, i.n_points,
           {sql_qround(
               "ABS(i.s + (e.llon * e.flat - e.flon * e.llat)) / 2.0", 4
           )} AS area_deg2
    FROM inner_sum i JOIN ends e ON i.user_id = e.user_id
    """,
)
def geo_shoelace_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shoelace (surveyor's) polygon area of each user's trajectory
    closed into a ring — ½|Σ(xᵢ·yᵢ₊₁ − xᵢ₊₁·yᵢ)| in planar degree
    space (the coverage-footprint metric; multiply by the local
    metric factors for km², or feed true projected coordinates —
    the dataflow is coordinate-system-agnostic).

    The same single-windowed-pass shape as geo_polyline_length: LAG
    pairs consecutive vertices for the running cross-product sum, and
    the ring-closing term comes from arg_min/arg_max endpoint lookups
    (deterministic (ts, event_id) ordering) — one user-keyed exchange
    shared by the window and both aggregates, O(1) state per row.

    100 TB shape: identical — no geometry is ever materialized as an
    object; a polygon with 10⁹ vertices streams through the same
    window."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "ts",
        "event_id",
        _lat(F.col("event_id")).alias("lat"),
        _lon(F.col("event_id")).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = pts.select(
        "user_id",
        "lat",
        "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
    )
    cross = F.when(F.col("plat").isNull(), F.lit(0.0)).otherwise(
        F.col("plon") * F.col("lat") - F.col("lon") * F.col("plat")
    )
    inner = seg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(cross).alias("s"),
    )
    order_key = F.struct("ts", "event_id")
    ends = pts.groupBy("user_id").agg(
        F.min_by("lat", order_key).alias("flat"),
        F.min_by("lon", order_key).alias("flon"),
        F.max_by("lat", order_key).alias("llat"),
        F.max_by("lon", order_key).alias("llon"),
    )
    closure = F.col("llon") * F.col("flat") - F.col("flon") * F.col("llat")
    return inner.join(ends, "user_id").select(
        "user_id",
        "n_points",
        qround(F.abs(F.col("s") + closure) / 2.0, 4).alias("area_deg2"),
    )


@query(
    "geo_bearing_profile",
    oracle=f"""
    WITH pts AS (
      SELECT user_id, ts, event_id,
             {_LAT_SQL.format(k="event_id")} AS lat,
             {_LON_SQL.format(k="event_id")} AS lon
      FROM events
    ),
    seg AS (
      SELECT user_id, lat, lon,
             LAG(lat) OVER w AS plat,
             LAG(lon) OVER w AS plon
      FROM pts
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    b AS (
      SELECT user_id,
             sin(radians(lon - plon)) * cos(radians(lat)) AS by_,
             cos(radians(plat)) * sin(radians(lat))
               - sin(radians(plat)) * cos(radians(lat))
                 * cos(radians(lon - plon)) AS bx
      FROM seg WHERE plat IS NOT NULL
    ),
    u AS (
      SELECT user_id,
             by_ / sqrt(bx * bx + by_ * by_) AS e,
             bx / sqrt(bx * bx + by_ * by_) AS n
      FROM b WHERE bx * bx + by_ * by_ > 0
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           {sql_qround("SUM(e)", 4)} AS sum_east,
           {sql_qround("SUM(n)", 4)} AS sum_north,
           {sql_qround(
               "sqrt(SUM(e) * SUM(e) + SUM(n) * SUM(n)) / COUNT(*)", 4
           )} AS straightness
    FROM u GROUP BY user_id
    """,
)
def geo_bearing_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional trajectory profile: per segment, the initial
    great-circle bearing (atan2 form), accumulated as UNIT VECTORS
    per user — the circular-statistics treatment (mean resultant
    vector), since bearings can't be averaged as scalars (359° and
    1° average to due north, not 180°). `straightness` is the
    resultant length R ∈ [0, 1]: 1 = perfectly consistent heading
    (commuting in a line), → 0 = isotropic wandering. Emitting the
    resultant COMPONENTS instead of the angle sidesteps the ±180°
    wraparound that would make an angle output hash-unstable at the
    grid edge.

    Same single user-window shape as geo_polyline_length (one
    exchange on user_id, LAG, then a map-side-combined vector sum);
    trig ulp noise is absorbed by qround(4). Zero-length segments
    (consecutive events at one grid point) contribute no direction
    and are excluded in both engines."""
    ev = load_table(spark, sf_dir, "events")
    lat, lon = _lat(F.col("event_id")), _lon(F.col("event_id"))
    pts = ev.select(
        "user_id", "ts", "event_id", lat.alias("lat"), lon.alias("lon")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = pts.select(
        "user_id",
        "lat",
        "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
    ).filter(F.col("plat").isNotNull())
    dl = F.radians(F.col("lon") - F.col("plon"))
    by = F.sin(dl) * F.cos(F.radians(F.col("lat")))
    bx = F.cos(F.radians(F.col("plat"))) * F.sin(
        F.radians(F.col("lat"))
    ) - F.sin(F.radians(F.col("plat"))) * F.cos(
        F.radians(F.col("lat"))
    ) * F.cos(dl)
    b = seg.select(
        "user_id", by.alias("by_"), bx.alias("bx")
    ).filter(F.col("bx") * F.col("bx") + F.col("by_") * F.col("by_") > 0)
    norm = F.sqrt(F.col("bx") * F.col("bx") + F.col("by_") * F.col("by_"))
    u = b.select(
        "user_id",
        (F.col("by_") / norm).alias("e"),
        (F.col("bx") / norm).alias("n"),
    )
    return u.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        qround(F.sum("e"), 4).alias("sum_east"),
        qround(F.sum("n"), 4).alias("sum_north"),
        qround(
            F.sqrt(
                F.sum("e") * F.sum("e") + F.sum("n") * F.sum("n")
            )
            / F.count(F.lit(1)),
            4,
        ).alias("straightness"),
    )


# ---------------------------------------------------------------------------
# density-based core-point detection (the DBSCAN building block)
# ---------------------------------------------------------------------------

_DBSCAN_EPS2 = 4.0  # eps = 2° in squared degree space
_DBSCAN_MINPTS = 4  # neighbors required (self excluded)
# 2°-wide cells: eps never spans more than one cell boundary, so the
# 3×3 neighborhood is COMPLETE — the blocked join exactly equals the
# brute-force oracle, unlike geo_grid_join's declared within-cell cut.
_DBSCAN_CELL = 2.0


@query(
    "geo_dbscan_core",
    oracle=f"""
    WITH p AS (
        SELECT c_custkey AS k,
               {_LAT_SQL.format(k="c_custkey")} AS lat,
               {_LON_SQL.format(k="c_custkey")} AS lon
        FROM customer
    )
    SELECT a.k AS c_custkey,
           CAST(COUNT(b.k) AS BIGINT) AS n_neighbors,
           COUNT(b.k) >= {_DBSCAN_MINPTS} AS is_core
    FROM p a JOIN p b
      ON a.k <> b.k
     AND (a.lat - b.lat) * (a.lat - b.lat)
         + (a.lon - b.lon) * (a.lon - b.lon) <= {_DBSCAN_EPS2}
    GROUP BY a.k
    """,
)
def geo_dbscan_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN core-point detection (Ester et al. 1996's first phase):
    count each point's ε-neighbors and flag points with ≥ minPts —
    the density skeleton that seeds cluster expansion. The ORACLE is
    the brute-force O(n²) distance self-join (the semantics); the
    Spark plan is the scale shape: block points into ε-sized grid
    cells, explode each probe point to its 3×3 neighbor cells, and
    equi-join on cell id — with cell = ε no qualifying pair can span
    beyond adjacent cells, so the blocked join is provably COMPLETE,
    not a within-cell approximation. Candidate work is Σ(9·cell
    occupancy), never n²; the cell id hash-partitions the one
    shuffle, and skewed dense cells split under AQE.
    """
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_custkey").alias("k"),
        _lat(F.col("c_custkey")).alias("lat"),
        _lon(F.col("c_custkey")).alias("lon"),
    )
    cx = F.floor((F.col("lat") + 90.0) / _DBSCAN_CELL).cast("long")
    cy = F.floor((F.col("lon") + 180.0) / _DBSCAN_CELL).cast("long")
    # lon spans 360/2 = 180 cells per lat row
    probe = pts.withColumn(
        "probe_cell",
        F.explode(
            F.array(
                *[
                    (cx + dx) * 180 + (cy + dy)
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ),
    )
    home = pts.select(
        F.col("k").alias("bk"),
        F.col("lat").alias("blat"),
        F.col("lon").alias("blon"),
        (
            F.floor((F.col("lat") + 90.0) / _DBSCAN_CELL).cast("long") * 180
            + F.floor((F.col("lon") + 180.0) / _DBSCAN_CELL).cast("long")
        ).alias("home_cell"),
    )
    dist2 = (F.col("lat") - F.col("blat")) * (F.col("lat") - F.col("blat")) + (
        F.col("lon") - F.col("blon")
    ) * (F.col("lon") - F.col("blon"))
    return (
        probe.join(home, F.col("probe_cell") == F.col("home_cell"))
        .filter((F.col("k") != F.col("bk")) & (dist2 <= _DBSCAN_EPS2))
        .groupBy(F.col("k").alias("c_custkey"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_neighbors"))
        .select(
            "c_custkey",
            "n_neighbors",
            (F.col("n_neighbors") >= _DBSCAN_MINPTS).alias("is_core"),
        )
    )


# ---------------------------------------------------------------------------
# point-in-CONCAVE-polygon (ray casting — the even-odd crossing rule)
# ---------------------------------------------------------------------------

# Concave pentagon as (lat, lon) vertices: the middle vertex notches
# inward, so the half-plane test above CANNOT express this region.
# Coordinates sit at ±.005/.015 offsets — OFF the synthetic points'
# 0.01° grid — so no test point lies exactly on an edge and the
# even-odd rule has no boundary ambiguity to disagree about.
_RAY_POLY = [
    (-60.005, -120.005),
    (20.015, -60.005),
    (-10.005, 0.015),
    (70.005, 60.015),
    (-50.005, 150.015),
]


def _ray_terms_sql(lat: str, lon: str) -> str:
    """Unrolled even-odd crossing count: one CASE term per edge, both
    engines evaluating identical fixed-literal arithmetic."""
    terms = []
    n = len(_RAY_POLY)
    for i in range(n):
        y1, x1 = _RAY_POLY[i]
        y2, x2 = _RAY_POLY[(i + 1) % n]
        terms.append(
            f"(CASE WHEN (({y1} > ({lat})) <> ({y2} > ({lat})))"
            f" AND (({lon}) < ({x2} - {x1}) * (({lat}) - {y1})"
            f" / ({y2} - {y1}) + {x1}) THEN 1 ELSE 0 END)"
        )
    return " + ".join(terms)


def _ray_crossings(lat: Column, lon: Column) -> Column:
    total = F.lit(0)
    n = len(_RAY_POLY)
    for i in range(n):
        y1, x1 = _RAY_POLY[i]
        y2, x2 = _RAY_POLY[(i + 1) % n]
        cross = (
            (F.lit(y1) > lat) != (F.lit(y2) > lat)
        ) & (
            lon
            < (F.lit(x2) - F.lit(x1))
            * (lat - F.lit(y1))
            / (F.lit(y2) - F.lit(y1))
            + F.lit(x1)
        )
        total = total + F.when(cross, F.lit(1)).otherwise(F.lit(0))
    return total


@query(
    "geo_point_in_concave_polygon",
    oracle=f"""
    WITH p AS (
        SELECT c_custkey,
               {_LAT_SQL.format(k="c_custkey")} AS lat,
               {_LON_SQL.format(k="c_custkey")} AS lon
        FROM customer
    )
    SELECT c_custkey,
           ({_ray_terms_sql('lat', 'lon')}) % 2 = 1 AS inside
    FROM p
    """,
)
def geo_point_in_concave_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon by RAY CASTING (even-odd crossing rule) — the
    general-polygon membership test geo_point_in_polygon's half-plane
    variant explicitly cannot express: a rightward ray crosses a
    concave ring's boundary an odd number of times iff the point is
    inside, regardless of convexity (Shimrat 1962). The fixture ring
    notches inward, so this query is wrong-by-construction if anyone
    swaps the half-plane test back in.

    Five unrolled crossing tests on a fixed-literal polygon — one
    codegen'd map-only expression, zero shuffles, zero Python,
    identical IEEE arithmetic both engines. Polygon SETS bbox-block
    first (geo_grid_join), then run this per candidate pair.
    """
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        _lat(F.col("c_custkey")).alias("lat"),
        _lon(F.col("c_custkey")).alias("lon"),
    )
    return pts.select(
        "c_custkey",
        (_ray_crossings(F.col("lat"), F.col("lon")) % 2 == 1).alias("inside"),
    )


_VOR_SITES = [(j, (j * 2347 + 911) % 18000, (j * 4967 + 577) % 36000)
              for j in range(8)]

_VOR_SITES_SQL = ", ".join(
    f"({j}, {la}, {lo})" for j, la, lo in _VOR_SITES
)


@query(
    "geo_voronoi_assign",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey,
               (c_custkey * 7919) % 18000 AS ilat,
               (c_custkey * 104729) % 36000 AS ilon
        FROM customer
    ),
    sites(j, slat, slon) AS (VALUES {_VOR_SITES_SQL}),
    a AS (
        SELECT p.c_custkey, s.j,
               CAST((p.ilat - s.slat) * (p.ilat - s.slat)
                    + (p.ilon - s.slon) * (p.ilon - s.slon)
                    AS BIGINT) AS d2
        FROM pts p CROSS JOIN sites s
    ),
    mn AS (SELECT c_custkey, MIN(d2) AS d2 FROM a GROUP BY c_custkey)
    SELECT a.c_custkey, CAST(MIN(a.j) AS INT) AS site,
           CAST(mn.d2 AS BIGINT) AS d2
    FROM a JOIN mn ON mn.c_custkey = a.c_custkey AND a.d2 = mn.d2
    GROUP BY a.c_custkey, mn.d2
    """,
)
def geo_voronoi_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voronoi-cell assignment: every point goes to its nearest of 8
    deterministic sites (squared distance on the INTEGER 0.01° grid —
    exact int64, so the argmin cannot flip cross-engine; ties break
    to the lowest site id on both sides). This is the spatial
    partitioning primitive: the site id is the shard key that
    co-locates spatially-near rows, the geo analog of IVF's coarse
    quantizer (llm_ann_ivf) — at 100 TB the 8 sites become ~10⁴
    k-means sites, same broadcast-and-argmin plan.

    Plan: |sites| is broadcast-tiny; the candidate set per point is
    exactly |sites| (a bounded cross join, never point×point), one
    min aggregate + an equality join-back for the deterministic
    tie-break."""
    pts = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 7919) % 18000).alias("ilat"),
        ((F.col("c_custkey") * 104729) % 36000).alias("ilon"),
    )
    sites = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.lit(la).cast("long").alias("slat"),
                F.lit(lo).cast("long").alias("slon"),
            )
            for j, la, lo in _VOR_SITES
        ]
    )
    a = (
        pts.select("c_custkey", "ilat", "ilon", F.explode(sites).alias("s"))
        .select(
            "c_custkey",
            F.col("s.j").alias("j"),
            (
                (F.col("ilat") - F.col("s.slat"))
                * (F.col("ilat") - F.col("s.slat"))
                + (F.col("ilon") - F.col("s.slon"))
                * (F.col("ilon") - F.col("s.slon"))
            )
            .cast("long")
            .alias("d2"),
        )
        .transform(pin)
    )
    mn = a.groupBy("c_custkey").agg(F.min("d2").alias("d2"))
    return (
        a.join(mn, ["c_custkey", "d2"])
        .groupBy("c_custkey", "d2")
        .agg(F.min("j").cast("int").alias("site"))
        .select("c_custkey", "site", F.col("d2").cast("long").alias("d2"))
    )


@query(
    "geo_trajectory_stats",
    oracle=f"""
    WITH pts AS (
        SELECT user_id, ts, event_id,
               (event_id * 7919) % 18000 AS ilat,
               (event_id * 104729) % 36000 AS ilon
        FROM events
    ),
    rk AS (
        SELECT user_id, ilat, ilon,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM pts
    ),
    steps AS (
        SELECT a.user_id,
               (b.ilat - a.ilat) * (b.ilat - a.ilat)
               + (b.ilon - a.ilon) * (b.ilon - a.ilon) AS d2
        FROM rk a JOIN rk b
          ON b.user_id = a.user_id AND b.rn = a.rn + 1
    ),
    ends AS (
        SELECT f.user_id, f.n,
               (l.ilat - f.ilat) * (l.ilat - f.ilat)
               + (l.ilon - f.ilon) * (l.ilon - f.ilon) AS disp2
        FROM (SELECT * FROM rk WHERE rn = 1) f
        JOIN rk l ON l.user_id = f.user_id AND l.rn = f.n
    ),
    agg AS (
        SELECT user_id, CAST(MAX(d2) AS BIGINT) AS max_step2,
               CAST(COUNT(*) AS BIGINT) AS n_steps
        FROM steps GROUP BY user_id
    )
    SELECT e.user_id, CAST(e.n AS BIGINT) AS n_points,
           COALESCE(a.n_steps, 0) AS n_steps,
           {sql_qround('sqrt(CAST(e.disp2 AS DOUBLE))', 6)}
               AS displacement,
           CASE WHEN a.max_step2 IS NOT NULL
                THEN {sql_qround('sqrt(CAST(a.max_step2 AS DOUBLE))', 6)}
           END AS max_step
    FROM ends e LEFT JOIN agg a ON a.user_id = e.user_id
    """,
)
def geo_trajectory_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trajectory summary over the event stream (coords from
    the deterministic integer grid): point count, step count,
    net displacement (first→last in event-time order), and the
    longest single hop — the teleport detector (a max_step far above
    the displacement flags GPS glitches / account sharing; a
    displacement near zero with many steps flags a commuter loop).

    DETERMINISM BY CONSTRUCTION: every distance is the square root of
    an exact int64 squared distance on the grid — there is no float
    SUM anywhere (a per-segment path-length total would be an
    order-dependent float accumulation; max and endpoints are
    order-free), so both engines agree bit-for-bit before qround.
    Per-user ordering is a partitioned window (rn), consecutive steps
    pair by the rn+1 equi-join — one shuffle on user_id carries the
    window, the self-join, and the aggregate."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "ts",
        "event_id",
        ((F.col("event_id") * 7919) % 18000).alias("ilat"),
        ((F.col("event_id") * 104729) % 36000).alias("ilon"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = Window.partitionBy("user_id")
    rk = pts.select(
        "user_id",
        "ilat",
        "ilon",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    ).transform(pin)
    a, b = rk.alias("a"), rk.alias("b")
    d2 = (F.col("b.ilat") - F.col("a.ilat")) * (
        F.col("b.ilat") - F.col("a.ilat")
    ) + (F.col("b.ilon") - F.col("a.ilon")) * (
        F.col("b.ilon") - F.col("a.ilon")
    )
    steps = a.join(
        b,
        (F.col("b.user_id") == F.col("a.user_id"))
        & (F.col("b.rn") == F.col("a.rn") + 1),
    ).select(F.col("a.user_id").alias("user_id"), d2.alias("d2"))
    agg = steps.groupBy("user_id").agg(
        F.max("d2").cast("long").alias("max_step2"),
        F.count(F.lit(1)).cast("long").alias("n_steps"),
    )
    f = rk.filter(F.col("rn") == 1).select(
        "user_id",
        F.col("ilat").alias("f_lat"),
        F.col("ilon").alias("f_lon"),
        "n",
    )
    l = rk.select(
        F.col("user_id").alias("l_user"),
        F.col("ilat").alias("l_lat"),
        F.col("ilon").alias("l_lon"),
        F.col("rn").alias("l_rn"),
    )
    disp2 = (F.col("l_lat") - F.col("f_lat")) * (
        F.col("l_lat") - F.col("f_lat")
    ) + (F.col("l_lon") - F.col("f_lon")) * (
        F.col("l_lon") - F.col("f_lon")
    )
    ends = f.join(
        l,
        (F.col("l_user") == F.col("user_id"))
        & (F.col("l_rn") == F.col("n")),
    ).select("user_id", "n", disp2.alias("disp2"))
    return ends.join(agg, "user_id", "left").select(
        "user_id",
        F.col("n").cast("long").alias("n_points"),
        F.coalesce(F.col("n_steps"), F.lit(0)).cast("long").alias(
            "n_steps"
        ),
        qround(F.sqrt(F.col("disp2").cast("double")), 6).alias(
            "displacement"
        ),
        F.when(
            F.col("max_step2").isNotNull(),
            qround(F.sqrt(F.col("max_step2").cast("double")), 6),
        ).alias("max_step"),
    )


@query(
    "geo_polygon_centroid",
    oracle=f"""
    WITH pts AS (
        SELECT user_id, ts, event_id,
               CAST((event_id * 7919) % 18000 - 9000 AS BIGINT) AS lat,
               CAST((event_id * 104729) % 36000 - 18000 AS BIGINT) AS lon
        FROM events
    ),
    seg AS (
        SELECT user_id, lat, lon,
               LAG(lat) OVER w AS plat,
               LAG(lon) OVER w AS plon
        FROM pts
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    inner_sum AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               SUM(CASE WHEN plat IS NULL THEN 0
                        ELSE plon * lat - lon * plat END) AS s,
               SUM(CASE WHEN plat IS NULL THEN 0
                        ELSE (plon + lon)
                             * (plon * lat - lon * plat) END) AS sx,
               SUM(CASE WHEN plat IS NULL THEN 0
                        ELSE (plat + lat)
                             * (plon * lat - lon * plat) END) AS sy
        FROM seg GROUP BY user_id
    ),
    ends AS (
        SELECT user_id,
               first(lat ORDER BY ts, event_id) AS flat,
               first(lon ORDER BY ts, event_id) AS flon,
               last(lat ORDER BY ts, event_id) AS llat,
               last(lon ORDER BY ts, event_id) AS llon
        FROM pts GROUP BY user_id
    ),
    closed AS (
        SELECT i.user_id, i.n_points,
               i.s + (e.llon * e.flat - e.flon * e.llat) AS a2,
               i.sx + (e.llon + e.flon)
                   * (e.llon * e.flat - e.flon * e.llat) AS sxc,
               i.sy + (e.llat + e.flat)
                   * (e.llon * e.flat - e.flon * e.llat) AS syc
        FROM inner_sum i JOIN ends e ON i.user_id = e.user_id
    )
    SELECT user_id, n_points,
           CASE WHEN a2 <> 0
                THEN {sql_qround(
                    'CAST(sxc AS DOUBLE) / (300.0 * CAST(a2 AS DOUBLE))',
                    4)}
           END AS centroid_lon,
           CASE WHEN a2 <> 0
                THEN {sql_qround(
                    'CAST(syc AS DOUBLE) / (300.0 * CAST(a2 AS DOUBLE))',
                    4)}
           END AS centroid_lat
    FROM closed
    """,
)
def geo_polygon_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Area-weighted polygon centroid of each user's closed
    trajectory ring — the shoelace centroid
    C = (1/6A)·Σ(vᵢ + vᵢ₊₁)·crossᵢ that labels a coverage footprint
    with its representative point (the map-pin a vertex average gets
    WRONG whenever vertices cluster on one edge). Signed area keeps
    orientation consistent: cx/cy divide by the SIGNED 2A, so a
    clockwise ring yields the same centroid as its reversal.

    Exactly geo_shoelace_area's physical shape (one user-keyed
    window pass + endpoint arg_min/arg_max closing term) with two
    extra running sums in the same aggregate — the marginal cost of
    the centroid over the area is zero additional exchanges. Float
    discipline, strengthened per ADVICE r5: the 2dp grid coords stay
    SCALED INTEGERS (lat·100, lon·100) end-to-end, so every cross
    product and running sum is exact int64 and order-INDEPENDENT —
    no partition-order drift, no qround-boundary risk; only the final
    centroid divides (by 300·a2: 3·2A with the 10²·10⁴ scale
    cancellation), on identical integers in both engines. Per-ring
    term bound ≈ 1.2e13, so ANSI overflow (loud, not silent) needs
    ~10⁶ points in ONE user's ring — cap ring length upstream at that
    scale. A degenerate (zero-signed-area) ring NULLs rather than
    throws under ANSI."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "ts",
        "event_id",
        ((F.col("event_id") * 7919) % 18000 - 9000)
        .cast("long")
        .alias("lat"),
        ((F.col("event_id") * 104729) % 36000 - 18000)
        .cast("long")
        .alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = pts.select(
        "user_id",
        "lat",
        "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
    )
    cross = F.when(F.col("plat").isNull(), F.lit(0).cast("long")).otherwise(
        F.col("plon") * F.col("lat") - F.col("lon") * F.col("plat")
    )
    inner = seg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(cross).alias("s"),
        F.sum(
            F.when(F.col("plat").isNull(), F.lit(0).cast("long")).otherwise(
                (F.col("plon") + F.col("lon"))
                * (F.col("plon") * F.col("lat") - F.col("lon") * F.col("plat"))
            )
        ).alias("sx"),
        F.sum(
            F.when(F.col("plat").isNull(), F.lit(0).cast("long")).otherwise(
                (F.col("plat") + F.col("lat"))
                * (F.col("plon") * F.col("lat") - F.col("lon") * F.col("plat"))
            )
        ).alias("sy"),
    )
    order_key = F.struct("ts", "event_id")
    ends = pts.groupBy("user_id").agg(
        F.min_by("lat", order_key).alias("flat"),
        F.min_by("lon", order_key).alias("flon"),
        F.max_by("lat", order_key).alias("llat"),
        F.max_by("lon", order_key).alias("llon"),
    )
    close_cross = (
        F.col("llon") * F.col("flat") - F.col("flon") * F.col("llat")
    )
    a2 = F.col("s") + close_cross
    sxc = F.col("sx") + (F.col("llon") + F.col("flon")) * close_cross
    syc = F.col("sy") + (F.col("llat") + F.col("flat")) * close_cross
    joined = inner.join(ends, "user_id").select(
        "user_id",
        F.col("n_points").cast("long").alias("n_points"),
        a2.alias("a2"),
        sxc.alias("sxc"),
        syc.alias("syc"),
    )
    den = F.lit(300.0) * F.col("a2").cast("double")
    return joined.select(
        "user_id",
        "n_points",
        F.when(
            F.col("a2") != 0,
            qround(F.col("sxc").cast("double") / den, 4),
        ).alias("centroid_lon"),
        F.when(
            F.col("a2") != 0,
            qround(F.col("syc").cast("double") / den, 4),
        ).alias("centroid_lat"),
    )


_KDE_CELL = 500       # 5-degree cells on the x100 integer grid
_KDE_H2 = 750 * 750   # Epanechnikov bandwidth h = 7.5 deg (x100)


@query(
    "geo_kde_grid",
    oracle=f"""
    WITH pts AS (
        SELECT CAST((c_custkey * 7919) % 18000 AS BIGINT) AS slat,
               CAST((c_custkey * 104729) % 36000 AS BIGINT) AS slon
        FROM customer
    ),
    cells AS (
        SELECT slat // {_KDE_CELL} AS ca, slon // {_KDE_CELL} AS cb,
               CAST(COUNT(*) AS BIGINT) AS n_in_cell
        FROM pts GROUP BY 1, 2
    ),
    n AS (SELECT CAST(SUM(n_in_cell) AS BIGINT) AS total FROM cells),
    contrib AS (
        SELECT p.slat // {_KDE_CELL} + d.da AS ca,
               p.slon // {_KDE_CELL} + d.db AS cb,
               p.slat, p.slon
        FROM pts p,
             (SELECT a.da, b.db
              FROM (VALUES (-1), (0), (1)) a(da),
                   (VALUES (-1), (0), (1)) b(db)) d
    ),
    w AS (
        SELECT c.ca, c.cb, c.n_in_cell,
               CAST(SUM(GREATEST(CAST(0 AS BIGINT), {_KDE_H2}
                   - ((c.ca * {_KDE_CELL} + {_KDE_CELL // 2} - k.slat)
                      * (c.ca * {_KDE_CELL} + {_KDE_CELL // 2} - k.slat)
                      + (c.cb * {_KDE_CELL} + {_KDE_CELL // 2} - k.slon)
                        * (c.cb * {_KDE_CELL} + {_KDE_CELL // 2}
                           - k.slon))))
                   AS BIGINT) AS kde
        FROM cells c JOIN contrib k ON k.ca = c.ca AND k.cb = c.cb
        GROUP BY c.ca, c.cb, c.n_in_cell
    )
    SELECT w.ca AS cell_lat, w.cb AS cell_lon, w.n_in_cell, w.kde,
           {sql_qround(
               'w.kde / (CAST(n.total AS DOUBLE) * ' + str(_KDE_H2)
               + ')', 9)} AS density
    FROM w, n
    """,
)
def geo_kde_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kernel density estimate over a spatial grid — the heat-map /
    hotspot layer: density at each OCCUPIED 5° cell's center under an
    Epanechnikov kernel (bandwidth 7.5°), computed with the grid-join
    scale pattern — each point contributes only to its 3×3 cell
    neighborhood (which exactly covers the kernel's support: a point
    two cells away sits ≥ 7.5° from the center, where the kernel is
    0), so the shuffle is ONE cell-keyed hash join of 9×points
    against the occupied-cell list, never points × cells (the naive
    KDE) and never points² (pairwise KDE).

    All-integer core, the geo_polygon_centroid discipline: the x100
    scaled grid keeps coordinates, cell centers, squared distances
    and the un-normalized Epanechnikov terms max(0, h² − d²) exact
    int64 (per-point term ≤ 5.6e5; int64 overflow needs ~1.6e13
    points in one cell's neighborhood); coordinates stay SHIFTED
    non-negative so integer division means the same thing in both
    engines (Spark `div` truncates toward zero, DuckDB `//` floors —
    they agree only for non-negative operands). The grand total
    re-aggregates from the cell table (global-anchor discipline);
    density divides once at emit, qround(9).

    100 TB shape: one fact-scale cell count, one 9-way map-side
    explode joined on the cell key, cell-sized output."""
    pts = load_table(spark, sf_dir, "customer").select(
        ((F.col("c_custkey") * 7919) % 18000)
        .cast("long")
        .alias("slat"),
        ((F.col("c_custkey") * 104729) % 36000)
        .cast("long")
        .alias("slon"),
    )
    cells = (
        pts.groupBy(
            F.expr(f"slat div {_KDE_CELL}").alias("ca"),
            F.expr(f"slon div {_KDE_CELL}").alias("cb"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_in_cell"))
        .transform(pin)
    )
    total = cells.agg(F.sum("n_in_cell").cast("long").alias("total"))
    offsets = F.expr(
        "array(-1, 0, 1)"
    )
    contrib = pts.select(
        "slat",
        "slon",
        F.explode(offsets).alias("da"),
    ).select(
        "slat",
        "slon",
        (F.expr(f"slat div {_KDE_CELL}") + F.col("da")).alias("ca"),
        F.explode(offsets).alias("db"),
    ).select(
        "slat",
        "slon",
        "ca",
        (F.expr(f"slon div {_KDE_CELL}") + F.col("db")).alias("cb"),
    )
    cx = F.col("ca") * _KDE_CELL + _KDE_CELL // 2
    cy = F.col("cb") * _KDE_CELL + _KDE_CELL // 2
    d2 = (cx - F.col("slat")) * (cx - F.col("slat")) + (
        cy - F.col("slon")
    ) * (cy - F.col("slon"))
    w = (
        cells.join(contrib, ["ca", "cb"])
        .groupBy("ca", "cb", "n_in_cell")
        .agg(
            F.sum(
                F.greatest(F.lit(0).cast("long"), F.lit(_KDE_H2) - d2)
            )
            .cast("long")
            .alias("kde")
        )
    )
    return w.crossJoin(F.broadcast(total)).select(
        F.col("ca").alias("cell_lat"),
        F.col("cb").alias("cell_lon"),
        "n_in_cell",
        "kde",
        qround(
            F.col("kde")
            / (F.col("total").cast("double") * F.lit(float(_KDE_H2))),
            9,
        ).alias("density"),
    )


_HEX_SIZE = 4.0  # axial hex size in degrees
_SQRT3_3 = 0.5773502691896258  # sqrt(3)/3 as a literal: no libm call,
#                                both engines see the identical double


@query(
    "geo_hexbin",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey,
             {_LAT_SQL.format(k="c_custkey")} AS lat,
             {_LON_SQL.format(k="c_custkey")} AS lon
      FROM customer
    ),
    ax AS (
      SELECT c_custkey, lat, lon,
             ({_SQRT3_3} * lon - lat / 3.0) / {_HEX_SIZE} AS aq,
             (2.0 * lat / 3.0) / {_HEX_SIZE} AS ar
      FROM pts
    ),
    rr AS (
      SELECT c_custkey, lat, lon, aq, ar,
             FLOOR(aq + 0.5) AS rx,
             FLOOR(-aq - ar + 0.5) AS ry,
             FLOOR(ar + 0.5) AS rz
      FROM ax
    ),
    fx AS (
      SELECT c_custkey, lat, lon,
             CAST(CASE
               WHEN ABS(rx - aq) > ABS(ry - (-aq - ar))
                    AND ABS(rx - aq) > ABS(rz - ar) THEN -ry - rz
               ELSE rx END AS BIGINT) AS hq,
             CAST(CASE
               WHEN ABS(rx - aq) > ABS(ry - (-aq - ar))
                    AND ABS(rx - aq) > ABS(rz - ar) THEN rz
               WHEN ABS(ry - (-aq - ar)) > ABS(rz - ar) THEN rz
               ELSE -rx - ry END AS BIGINT) AS hr
      FROM rr
    )
    SELECT hq, hr, CAST(COUNT(*) AS BIGINT) AS n_points,
           MIN(lat) AS min_lat, MAX(lat) AS max_lat,
           MIN(lon) AS min_lon, MAX(lon) AS max_lon
    FROM fx GROUP BY hq, hr
    """,
)
def geo_hexbin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hexagonal binning of the customer point cloud (pointy-top
    axial coordinates + cube rounding — the H3/d3-hexbin tessellation
    recipe): hexagons are the density-map cell shape cartography
    actually uses because every neighbor shares an edge at equal
    center distance, unlike the square cells of geo_grid_join /
    geo_kde_grid whose diagonal neighbors sit √2 farther. Emits one
    row per occupied hex with its population and bbox — the
    choropleth/density layer feeding a tile renderer.

    Cross-engine float discipline: axial q = (√3/3·lon − lat/3)/s,
    r = (2/3·lat)/s with √3/3 as a shared LITERAL (no libm), cube
    rounding via floor(v + 0.5) (identical half-up on both engines —
    never round(), whose half-even/half-away conventions differ),
    and the tie-fix comparisons run on bit-identical doubles, so
    every branch resolves the same way in both engines. Outputs are
    integers plus MIN/MAX of exact inputs — no float sums at all.

    Scale: map-side coordinate arithmetic + ONE hash aggregate keyed
    by (hq, hr) — the same partition-by-cell story as geo_grid_join;
    at 100 TB the hex id is the shuffle key and density skew (urban
    hexes) is the usual salting candidate."""
    c = load_table(spark, sf_dir, "customer")
    lat, lon = _lat(F.col("c_custkey")), _lon(F.col("c_custkey"))
    ax = c.select(
        "c_custkey",
        lat.alias("lat"),
        lon.alias("lon"),
    ).select(
        "c_custkey",
        "lat",
        "lon",
        ((F.lit(_SQRT3_3) * F.col("lon") - F.col("lat") / F.lit(3.0))
         / F.lit(_HEX_SIZE)).alias("aq"),
        ((F.lit(2.0) * F.col("lat") / F.lit(3.0)) / F.lit(_HEX_SIZE)).alias(
            "ar"
        ),
    )
    rr = ax.select(
        "c_custkey",
        "lat",
        "lon",
        "aq",
        "ar",
        F.floor(F.col("aq") + F.lit(0.5)).alias("rx"),
        F.floor(-F.col("aq") - F.col("ar") + F.lit(0.5)).alias("ry"),
        F.floor(F.col("ar") + F.lit(0.5)).alias("rz"),
    )
    dx = F.abs(F.col("rx") - F.col("aq"))
    dy = F.abs(F.col("ry") - (-F.col("aq") - F.col("ar")))
    dz = F.abs(F.col("rz") - F.col("ar"))
    fx = rr.select(
        "lat",
        "lon",
        F.when((dx > dy) & (dx > dz), -F.col("ry") - F.col("rz"))
        .otherwise(F.col("rx"))
        .cast("long")
        .alias("hq"),
        F.when((dx > dy) & (dx > dz), F.col("rz"))
        .when(dy > dz, F.col("rz"))
        .otherwise(-F.col("rx") - F.col("ry"))
        .cast("long")
        .alias("hr"),
    )
    return fx.groupBy("hq", "hr").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.min("lat").alias("min_lat"),
        F.max("lat").alias("max_lat"),
        F.min("lon").alias("min_lon"),
        F.max("lon").alias("max_lon"),
    )


_VW_AREA2_T = 75_000_000  # keep interior points with 2*area >= this
#                           (median effective area on the fixture grid)


@query(
    "geo_polyline_simplify",
    oracle=f"""
    WITH pts AS (
      SELECT user_id,
             (event_id * 7919) % 18000 AS ilat,
             (event_id * 104729) % 36000 AS ilon,
             LEAD((event_id * 7919) % 18000, 1) OVER w AS lat1,
             LEAD((event_id * 104729) % 36000, 1) OVER w AS lon1,
             LEAD((event_id * 7919) % 18000, 2) OVER w AS lat2,
             LEAD((event_id * 104729) % 36000, 2) OVER w AS lon2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tri AS (
      SELECT user_id,
             CASE WHEN lat2 IS NOT NULL THEN
               CAST(ABS((lat1 - ilat) * (lon2 - ilon)
                        - (lat2 - ilat) * (lon1 - ilon)) AS BIGINT)
             END AS a2
      FROM pts
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(COUNT(a2) AS BIGINT) AS n_interior,
           CAST(COALESCE(SUM(CASE WHEN a2 >= {_VW_AREA2_T}
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_kept_interior,
           CAST(LEAST(COUNT(*), 2)
                + COALESCE(SUM(CASE WHEN a2 >= {_VW_AREA2_T}
                                    THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_out
    FROM tri GROUP BY user_id
    """,
)
def geo_polyline_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass Visvalingam-Whyatt polyline simplification census per
    user trajectory: an interior point survives iff TWICE the area of
    the triangle it forms with its ordered neighbors clears the
    threshold — the effective-area criterion map renderers use to
    thin GPS tracks before tiling (small-area points are visually
    collinear). One pass (no iterative re-evaluation after removal)
    is the streaming-friendly variant: it upper-bounds the iterative
    algorithm's retained set and needs no sequential state.

    ALL-INTEGER geometry (the geo_trajectory_stats discipline): the
    cross product (b−a)×(c−a) on the scaled 0.01° int grid is exact
    int64, so the keep predicate is an integer comparison — no
    float-boundary retention flips. Endpoints (≤ 2 per trajectory)
    are always kept; n_out = kept interior + endpoints. Each row's
    neighbor pair comes from lead(·,1)/lead(·,2) over the SAME
    user-partitioned window (round-7 review: the original two
    rn-shifted self-joins + checkpoint paid two extra exchanges for
    what one window pass provides — unlike geo_trajectory_stats'
    first-to-last pairing, everything here is adjacent-neighbor).

    100 TB shape: ONE user-partitioned window shuffle carries the
    ordering, both leads, and the per-user aggregate — never a
    global sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ilat = ((F.col("event_id") * 7919) % 18000).alias("ilat")
    ilon = ((F.col("event_id") * 104729) % 36000).alias("ilon")
    pts = ev.select("user_id", "ts", "event_id", ilat, ilon).select(
        "user_id",
        "ilat",
        "ilon",
        F.lead("ilat", 1).over(w).alias("lat1"),
        F.lead("ilon", 1).over(w).alias("lon1"),
        F.lead("ilat", 2).over(w).alias("lat2"),
        F.lead("ilon", 2).over(w).alias("lon2"),
    )
    a2 = F.when(
        F.col("lat2").isNotNull(),
        F.abs(
            (F.col("lat1") - F.col("ilat"))
            * (F.col("lon2") - F.col("ilon"))
            - (F.col("lat2") - F.col("ilat"))
            * (F.col("lon1") - F.col("ilon"))
        ).cast("long"),
    )
    tri = pts.select("user_id", a2.alias("a2"))
    kept = F.coalesce(
        F.sum(F.when(F.col("a2") >= _VW_AREA2_T, 1).otherwise(0)),
        F.lit(0),
    )
    return tri.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.count("a2").cast("long").alias("n_interior"),
        kept.cast("long").alias("n_kept_interior"),
        (F.least(F.count(F.lit(1)), F.lit(2)) + kept)
        .cast("long")
        .alias("n_out"),
    )
