"""Reshape, error-safe arithmetic, and mergeable-sketch operators
(engine extension — SURVEY.md §2 additions).

The reference's output shape is fixed NDJSON (geonames.js:151-163);
an analytics engine also needs wide↔long reshaping (unpivot/melt),
positional flattening (posexplode), ANSI-safe try_* arithmetic
(Spark 4 runs ANSI mode ON — engine code must not throw on bad rows),
and mergeable sketches — the 100 TB aggregation currency: a sketch
per partition/group merges associatively, so rollups never rescan.

Dialect notes: DuckDB UNPIVOT is statement-syntax (not a function);
zipped ``unnest`` of equal-length lists replays posexplode; DuckDB
``TRY_CAST`` mirrors Spark's, and guarded CASE replays try_divide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_geonames_spark.functions import pin, qround, spread, sql_qround
from etl_geonames_spark.registry import query
from etl_geonames_spark.sources import load_table


@query(
    "fn_unpivot",
    oracle="""
    UNPIVOT (
        SELECT o_orderkey,
               ROUND(o_totalprice, 2) AS price,
               CAST(o_custkey AS DOUBLE) AS custkey
        FROM orders
    ) ON price, custkey INTO NAME measure VALUE val
    """,
)
def fn_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt: each order row becomes one row per measure —
    the inverse of agg_pivot. Map-only (Expand node, no shuffle);
    output is 2× input rows but narrower, the standard trade for
    measure-generic downstream aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.col("o_custkey").cast("double").alias("custkey"),
    ).unpivot("o_orderkey", ["price", "custkey"], "measure", "val")


@query(
    "fn_posexplode",
    oracle="""
    SELECT doc_id,
           unnest(generate_series(0, len(str_split(text, ' ')) - 1))
               AS pos,
           unnest(str_split(text, ' ')) AS word
    FROM documents
    """,
)
def fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional flatten: 1→N with the element index preserved —
    what sequence-order-sensitive consumers (n-gram windows, token
    position features) need that plain explode loses. Map-only
    Generate node, no shuffle. The oracle zips two equal-length
    unnests (DuckDB zips parallel unnests positionally)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " "))
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.col("col").alias("word"),
    )


@query(
    "fn_try_arith",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {sql_qround(
               "CASE WHEN l_quantity = 25 THEN NULL "
               "ELSE l_extendedprice / (l_quantity - 25) END", 4)}
               AS price_per_offset,
           TRY_CAST(CASE WHEN l_orderkey % 2 = 0
                         THEN CAST(l_orderkey AS VARCHAR)
                         ELSE 'x' || CAST(l_orderkey AS VARCHAR)
                    END AS BIGINT) AS parsed_key
    FROM lineitem
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic surface: Spark 4 runs ANSI mode ON, so
    division by zero / bad casts THROW unless routed through try_* —
    this is the engine's row-level error-tolerance contract (bad rows
    yield NULL, the job survives). try_divide hits a real zero
    denominator (quantity=25) and try_cast a non-numeric string.

    qround on the ratio (repo working-notes invariant); NULLs pass through
    qround as NULL on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        qround(
            F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25),
            4,
        ).alias("price_per_offset"),
        F.try_to_number(
            F.when(
                F.col("l_orderkey") % 2 == 0,
                F.col("l_orderkey").cast("string"),
            ).otherwise(
                F.concat(F.lit("x"), F.col("l_orderkey").cast("string"))
            ),
            F.lit("999999999999"),
        )
        .cast("long")
        .alias("parsed_key"),
    )


@query("agg_sketch_hll")  # sketch binary → rows-only; accuracy pinned in pytest
def agg_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level mergeable HLL rollup (Apache DataSketches, Spark 4
    built-ins): sketch customer keys per NATION, then UNION the
    nation sketches up to REGION and estimate — the rollup never
    rescans the fact table. That mergeability is the whole point at
    100 TB: partial sketches travel in the shuffle (bytes, not rows),
    and any higher grouping level is a cheap sketch-union away.
    Accuracy vs exact distinct counts is pinned in
    tests/test_sketches.py (rows-only at the driver: sketch estimates
    are engine-specific, DuckDB's HLL differs by design)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    per_nation = cust.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sk")
    )
    return (
        per_nation.join(
            F.broadcast(nation),
            per_nation["c_nationkey"] == nation["n_nationkey"],
        )
        .groupBy("n_regionkey")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(
                "approx_customers"
            )
        )
        .select("n_regionkey", "approx_customers")
    )


@query("agg_sketch_kll")  # sketch binary → rows-only; accuracy pinned in pytest
def agg_sketch_kll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level mergeable KLL quantile rollup (Apache DataSketches,
    Spark 4 built-ins) — the sketch sibling of agg_sketch_hll for
    ORDER statistics: sketch l_extendedprice per return flag, then
    MERGE the flag sketches into an ALL row and query p50/p95 from
    both levels. Like HLL, the rollup never rescans the fact table —
    partial sketches (KB each, fixed size) travel the shuffle, so a
    100 TB quantile-by-anything cube is one pass + cheap merges.
    Contrast percentile_approx which also merges but can't be stored /
    re-merged across queries as a column. Accuracy vs exact
    percentiles is pinned in tests/test_sketches.py (rows-only at the
    driver: sketch estimates are engine-specific by design)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        F.kll_sketch_agg_double("l_extendedprice").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    flag_rows = per_flag.select(
        "l_returnflag",
        F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.5)).alias("p50"),
        F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.95)).alias("p95"),
        "n",
    )
    all_row = per_flag.agg(
        F.kll_merge_agg_double("sk").alias("sk"),
        F.sum("n").alias("n"),
    ).select(
        F.lit("ALL").alias("l_returnflag"),
        F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.5)).alias("p50"),
        F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.95)).alias("p95"),
        "n",
    )
    return flag_rows.unionByName(all_row)


@query(
    "fn_explode_outer",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(str_split(text, ' '), w -> len(w) > 8) AS longs
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           unnest(CASE WHEN len(longs) = 0 THEN [NULL] ELSE longs END)
             AS long_word
    FROM t
    """,
)
def fn_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving 1→N flatten (`explode_outer`): documents whose
    filtered array is EMPTY survive as a single NULL row instead of
    vanishing — the left-join semantics of lateral expansion, and the
    difference between "no attributes" and "row silently dropped" in
    an entity-expansion pipeline (plain explode is an inner join
    against the array). DuckDB has no outer unnest; the oracle
    substitutes the documented `[NULL]`-sentinel rewrite, which is
    exactly how explode_outer is defined."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    longs = F.filter(
        F.split("text", " "), lambda w: F.length(w) > F.lit(8)
    )
    return docs.select(
        "doc_id", F.explode_outer(longs).alias("long_word")
    )


## Count-min sketch (exact-replay construction)
#
_CMS_P = 2_147_483_647  # 2^31 - 1, the minhash family's prime
_CMS_W = 256
_CMS_PARAMS = [
    (i, 2 * i * 1_000_003 + 1, i * 998_244_353 + 12_345) for i in range(4)
]
_CMS_PROBES = [1, 7, 42, 999, 123456]


def _cms_cells_sql(table: str, key: str) -> str:
    """DuckDB twin of :func:`cms_cells` — params VALUES + the counter
    CTE body over ``table.key``, shared by agg_sketch_cms and
    join_size_cms_estimate so an _CMS_PARAMS/_CMS_W change can never
    drift one oracle (the Python side already shares cms_cells)."""
    params = ", ".join(
        f"({i}, CAST({a} AS BIGINT), CAST({b} AS BIGINT))"
        for i, a, b in _CMS_PARAMS
    )
    return f"""params(i, a, b) AS (VALUES {params}),
    cells AS (
        SELECT p.i,
               ((p.a * t.{key} + p.b) % {_CMS_P}) % {_CMS_W} AS c,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM {table} t, params p GROUP BY 1, 2
    )"""


def cms_cells(df: DataFrame, key: str) -> DataFrame:
    """(i, c, n) counter cells of the count-min sketch over ``df[key]``
    — the mergeable form: cells from disjoint batches SUM to the
    cells of the union (additive counters), which is what
    streaming_cms_maintenance exploits. Shared by the batch query
    below and the streaming maintenance path so the two can never
    hash different cells."""
    depth = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.lit(a).cast("bigint").alias("a"),
                F.lit(b).cast("bigint").alias("b"),
            )
            for i, a, b in _CMS_PARAMS
        ]
    )
    return (
        df.select(F.col(key).alias("k"), F.explode(depth).alias("d"))
        .select(
            F.col("d.i").alias("i"),
            (
                ((F.col("d.a") * F.col("k") + F.col("d.b")) % _CMS_P)
                % _CMS_W
            ).alias("c"),
        )
        .groupBy("i", "c")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "agg_sketch_cms",
    oracle=f"""
    WITH {_cms_cells_sql('orders', 'o_custkey')},
    probes(k) AS (VALUES {", ".join(
        f"(CAST({k} AS BIGINT))" for k in _CMS_PROBES
    )}),
    truth AS (
        SELECT p.k, CAST(COUNT(o.o_custkey) AS BIGINT) AS true_count
        FROM probes p LEFT JOIN orders o ON o.o_custkey = p.k
        GROUP BY p.k
    ),
    est AS (
        SELECT p.k, MIN(c.n) AS cms_estimate
        FROM probes p JOIN params d ON TRUE
        JOIN cells c ON c.i = d.i
          AND c.c = ((d.a * p.k + d.b) % {_CMS_P}) % {_CMS_W}
        GROUP BY p.k
    )
    SELECT t.k AS probe_key, t.true_count, e.cms_estimate
    FROM truth t JOIN est e ON t.k = e.k
    """,
)
def agg_sketch_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch, built and probed entirely in relational ops —
    the frequency-estimation sketch completing the family (HLL =
    cardinality, KLL = quantiles, bitmap = exact distinct, CMS =
    per-key counts). The sketch is the d×w counter table itself:
    explode each key through d universal hashes ((a·x+b) mod P mod w
    — the minhash family, so both engines replay it bit-identically),
    ONE hash aggregate builds all rows, and a probe's estimate is the
    MIN over its d cells. Unlike Spark's opaque-binary
    count_min_sketch(), every intermediate here is inspectable and
    the DuckDB oracle replays construction AND probing exactly —
    estimates are deterministic, not sampled, so this gets a full
    value-hash check where the HLL/KLL entries are rows-only.

    Output exposes the CMS contract: estimate ≥ true count always,
    within εN with probability 1−δ (ε = e/w ≈ 0.011, δ = e^-d ≈
    0.018); tests/test_sketches.py pins both bounds.

    100 TB shape: the d-way explode costs d× map rows but the
    aggregate is map-side combined into ≤ d·w cells — a 4 KB
    mergeable summary crossing the shuffle regardless of input size,
    the same argument as agg_bitmap_distinct; probes broadcast
    against it."""
    depth = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.lit(a).cast("bigint").alias("a"),
                F.lit(b).cast("bigint").alias("b"),
            )
            for i, a, b in _CMS_PARAMS
        ]
    )
    orders = load_table(spark, sf_dir, "orders")
    cells = cms_cells(orders, "o_custkey")
    probes = spark.createDataFrame(
        [(int(k),) for k in _CMS_PROBES], "k bigint"
    )
    probe_cells = probes.select(
        "k", F.explode(depth).alias("d")
    ).select(
        "k",
        F.col("d.i").alias("i"),
        (
            ((F.col("d.a") * F.col("k") + F.col("d.b")) % _CMS_P) % _CMS_W
        ).alias("c"),
    )
    est = (
        probe_cells.join(F.broadcast(cells), ["i", "c"])
        .groupBy("k")
        .agg(F.min("n").alias("cms_estimate"))
    )
    truth = (
        probes.alias("p")
        .join(
            orders.select(F.col("o_custkey").alias("k")).alias("o"),
            "k",
            "left",
        )
        .groupBy("k")
        .agg(F.count(F.col("o.k")).alias("true_count"))
    )
    return truth.join(est, "k").select(
        F.col("k").alias("probe_key"), "true_count", "cms_estimate"
    )


_KMV_K = 64
_KMV_P = 2_147_483_647  # 2^31 − 1, the hash grid


@query(
    "agg_sketch_kmv",
    oracle=f"""
    WITH d AS (
        SELECT DISTINCT event_type, user_id,
               (user_id * 1103515245 + 12345) % {_KMV_P} AS h
        FROM events
    ),
    r AS (
        SELECT event_type, h,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY h, user_id) AS rn
        FROM d
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(MAX(CASE WHEN rn = {_KMV_K} THEN h END) AS BIGINT)
               AS kth_hash,
           CASE WHEN COUNT(*) >= {_KMV_K}
                THEN CAST({_KMV_K - 1} AS DOUBLE) * {_KMV_P}
                     / MAX(CASE WHEN rn = {_KMV_K} THEN h END)
                ELSE CAST(COUNT(*) AS DOUBLE) END AS est_distinct
    FROM r GROUP BY event_type
    """,
)
def agg_sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct sketch, the third mergeable
    sketch next to HLL/KLL — and unlike those, fully differentially
    checkable: the hash is the deterministic LCG both engines replay,
    so the sketch *construction itself* is oracle-verified, not just
    its accuracy. Estimator: D̂ = (k−1)·P/h₍k₎ (Bar-Yossef et al.
    2002) with the exact-count fallback below k.

    Mergeability is the scale story: the k smallest hashes of a union
    are the k smallest of the combined bottom-k sets, so partial
    sketches combine associatively in the shuffle (k values per
    group, never the distinct set). Here: distinct-pair aggregate →
    per-group bottom-k via a type-partitioned rank window → one
    max-filter aggregate. All-integer until the single estimator
    division.
    """
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.select("event_type", "user_id")
        .distinct()
        .withColumn(
            "h",
            F.pmod(
                F.col("user_id") * F.lit(1103515245) + F.lit(12345),
                F.lit(_KMV_P),
            ),
        )
    )
    w = Window.partitionBy("event_type").orderBy("h", "user_id")
    r = d.withColumn("rn", F.row_number().over(w))
    kth = F.max(F.when(F.col("rn") == _KMV_K, F.col("h")))
    return r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        kth.cast("long").alias("kth_hash"),
        F.when(
            F.count(F.lit(1)) >= _KMV_K,
            F.lit(float(_KMV_K - 1)) * F.lit(_KMV_P) / kth,
        )
        .otherwise(F.count(F.lit(1)).cast("double"))
        .alias("est_distinct"),
    )


def kmv_bottomk(df: DataFrame) -> DataFrame:
    """The KMV sketch STATE for a (event_type, user_id) stream: the
    ≤ k smallest deterministic hashes per group, with their members.
    Factored out of :func:`agg_sketch_kmv` so streaming maintenance
    (streaming/pipeline.streaming_kmv_maintenance) runs the identical
    expressions per micro-batch: bottom-k of a union of bottom-k sets
    equals bottom-k of the union (dedupe on the member first — the
    same user hashes identically in every batch), which is what makes
    the sketch exactly mergeable rather than approximately."""
    d = (
        df.select("event_type", "user_id")
        .distinct()
        .withColumn(
            "h",
            F.pmod(
                F.col("user_id") * F.lit(1103515245) + F.lit(12345),
                F.lit(_KMV_P),
            ),
        )
    )
    w = Window.partitionBy("event_type").orderBy("h", "user_id")
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= _KMV_K)
        .drop("_rn")
    )


def kmv_estimate(sketch: DataFrame) -> DataFrame:
    """Distinct-count estimates from a :func:`kmv_bottomk` snapshot:
    below k members the snapshot IS the distinct set (exact count);
    at k, D̂ = (k−1)·P/h₍k₎. Matches agg_sketch_kmv's estimator
    column-for-column on (event_type, kth_hash, est_distinct)."""
    c = F.count(F.lit(1))
    kth = F.max("h")
    return sketch.groupBy("event_type").agg(
        F.when(c >= _KMV_K, kth).cast("long").alias("kth_hash"),
        F.when(
            c >= _KMV_K, F.lit(float(_KMV_K - 1)) * F.lit(_KMV_P) / kth
        )
        .otherwise(c.cast("double"))
        .alias("est_distinct"),
    )


_KMV_SET_K = 64

_POLY_TEXT_HASH_SQL = """list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(generate_series(1, len(text)),
                           i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
                   (acc, c) -> (acc * 31 + c) % 1000003)"""


@query(
    "agg_kmv_setops",
    oracle=f"""
    WITH d AS (
        SELECT DISTINCT CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS grp,
               {_POLY_TEXT_HASH_SQL} AS h
        FROM documents
    ),
    rk AS (
        SELECT grp, h,
               ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
        FROM d
    ),
    sk AS (SELECT grp, h FROM rk WHERE rn <= {_KMV_SET_K}),
    per AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_in_sketch,
               CAST(MAX(h) AS BIGINT) AS kth
        FROM sk GROUP BY grp
    ),
    du AS (SELECT DISTINCT h FROM d),
    ru AS (
        SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM du
    ),
    su AS (SELECT h FROM ru WHERE rn <= {_KMV_SET_K}),
    uni AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_u,
               CAST(MAX(su.h) AS BIGINT) AS kth_u,
               CAST(SUM(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_both
        FROM su
        LEFT JOIN (SELECT h FROM sk WHERE grp = 0) a ON a.h = su.h
        LEFT JOIN (SELECT h FROM sk WHERE grp = 1) b ON b.h = su.h
    ),
    est AS (
        SELECT
          COALESCE(
            (SELECT CASE WHEN n_in_sketch >= {_KMV_SET_K}
                         THEN CAST({_KMV_SET_K - 1} AS DOUBLE) * 1000003 / kth
                         ELSE CAST(n_in_sketch AS DOUBLE) END
             FROM per WHERE grp = 0), 0.0) AS est_a,
          COALESCE(
            (SELECT CASE WHEN n_in_sketch >= {_KMV_SET_K}
                         THEN CAST({_KMV_SET_K - 1} AS DOUBLE) * 1000003 / kth
                         ELSE CAST(n_in_sketch AS DOUBLE) END
             FROM per WHERE grp = 1), 0.0) AS est_b,
          CASE WHEN n_u >= {_KMV_SET_K}
               THEN CAST({_KMV_SET_K - 1} AS DOUBLE) * 1000003 / kth_u
               ELSE CAST(n_u AS DOUBLE) END AS est_union,
          CASE WHEN n_u > 0
               THEN CAST(n_both AS DOUBLE) / n_u END AS jacc
        FROM uni
    )
    SELECT {sql_qround('est_a', 6)} AS est_a,
           {sql_qround('est_b', 6)} AS est_b,
           {sql_qround('est_union', 6)} AS est_union,
           {sql_qround('jacc', 6)} AS jaccard_est,
           {sql_qround('jacc * est_union', 6)} AS est_intersection
    FROM est
    """,
)
def agg_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-operation estimates between the English and
    non-English distinct-text sets: per-set cardinality, union
    cardinality from the MERGED sketch (bottom-k of a union is the
    bottom-k of the combined bottom-k sets — the mergeability that
    makes KMV a shuffle-friendly sketch), Jaccard from the fraction
    of merged-sketch members present in BOTH per-set sketches
    (Bar-Yossef et al. 2002; Beyer et al. 2007 for the set-op forms),
    and |A∩B| ≈ J·|A∪B| by inclusion. THE sketch-algebra a dedup
    pipeline uses to price cross-source overlap at 100 TB before
    running any pairwise comparison — three k-row tables answer it.

    Construction is oracle-checked end-to-end (deterministic Horner
    poly-hash of the text, exact bottom-k both engines — the
    agg_sketch_kmv discipline, extended to set algebra). The union
    rank routes through ``distributed_rank`` (range exchange +
    broadcast offsets), respecting the no-global-window contract;
    per-set bottom-k uses the set-partitioned window, whose state is
    sketch-sized at any corpus scale. Sub-k sets fall back to exact
    counts (both engines, identically)."""
    from etl_geonames_spark.operators.curation import poly_hash
    from etl_geonames_spark.operators.relational import distributed_rank

    docs = load_table(spark, sf_dir, "documents")
    d = (
        spread(docs, "doc_id")
        .select(
            F.when(F.col("lang") == "en", F.lit(0))
            .otherwise(F.lit(1))
            .alias("grp"),
            poly_hash(F.col("text")).alias("h"),
        )
        .distinct()
        .transform(pin)
    )
    w = Window.partitionBy("grp").orderBy("h")
    sk = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_SET_K)
        .select("grp", "h")
        .transform(pin)
    )
    # aggregate-form per-side stats: an aggregate over an EMPTY
    # filtered sketch still yields its one row (count 0 →
    # exact-count fallback 0.0), where a groupBy row for the missing
    # side would vanish and drop the whole report (oracle COALESCEs
    # its scalar subqueries to the same 0.0)
    a_stats = sk.filter(F.col("grp") == 0).agg(
        F.count(F.lit(1)).cast("long").alias("n_in_sketch"),
        F.max("h").cast("long").alias("kth"),
    )
    b_stats = sk.filter(F.col("grp") == 1).agg(
        F.count(F.lit(1)).cast("long").alias("n_in_sketch"),
        F.max("h").cast("long").alias("kth"),
    )
    du = d.select("h").distinct()
    su = (
        distributed_rank(du, ["h"])
        .filter(F.col("_grn") <= _KMV_SET_K)
        .select("h")
    )
    a_sk = sk.filter(F.col("grp") == 0).select(F.col("h").alias("ha"))
    b_sk = sk.filter(F.col("grp") == 1).select(F.col("h").alias("hb"))
    uni = (
        su.join(F.broadcast(a_sk), su["h"] == a_sk["ha"], "left")
        .join(F.broadcast(b_sk), su["h"] == b_sk["hb"], "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_u"),
            F.max("h").cast("long").alias("kth_u"),
            F.sum(
                F.when(
                    F.col("ha").isNotNull() & F.col("hb").isNotNull(), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_both"),
        )
    )

    def _est(n_col, kth_col):
        return F.when(
            n_col >= _KMV_SET_K,
            F.lit(float(_KMV_SET_K - 1)) * F.lit(1000003) / kth_col,
        ).otherwise(n_col.cast("double"))

    pa = a_stats.select(
        _est(F.col("n_in_sketch"), F.col("kth")).alias("est_a")
    )
    pb = b_stats.select(
        _est(F.col("n_in_sketch"), F.col("kth")).alias("est_b")
    )
    est_union = _est(F.col("n_u"), F.col("kth_u"))
    jacc = F.when(
        F.col("n_u") > 0, F.col("n_both").cast("double") / F.col("n_u")
    )
    return (
        uni.crossJoin(F.broadcast(pa))
        .crossJoin(F.broadcast(pb))
        .select(
            qround(F.col("est_a"), 6).alias("est_a"),
            qround(F.col("est_b"), 6).alias("est_b"),
            qround(est_union, 6).alias("est_union"),
            qround(jacc, 6).alias("jaccard_est"),
            qround(jacc * est_union, 6).alias("est_intersection"),
        )
    )


_HH_SHARDS = 4
_HH_K = 8


def hh_shard_counts(docs: DataFrame) -> DataFrame:
    """(shard, word, cnt) over a documents frame — the ADDITIVE state
    of the heavy-hitters certificate (counts sum over disjoint doc
    batches), shared by agg_heavy_hitters and the streaming
    maintenance so the two can never count differently."""
    return (
        docs.select(
            (F.col("doc_id") % _HH_SHARDS).alias("shard"),
            F.explode(F.split("text", " ")).alias("word"),
        )
        .filter(F.col("word") != "")
        .groupBy("shard", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def hh_certificate(c: DataFrame) -> DataFrame:
    """Derive the [lower, upper] heavy-hitters certificate from a
    (shard, word, cnt) count table (see agg_heavy_hitters)."""
    wr = Window.partitionBy("shard").orderBy(
        F.col("cnt").desc(), F.col("word")
    )
    r = c.withColumn("rnk", F.row_number().over(wr)).transform(pin)
    kept = r.filter(F.col("rnk") <= _HH_K).select("shard", "word", "cnt")
    bound = r.groupBy("shard").agg(
        F.coalesce(
            F.max(F.when(F.col("rnk") > _HH_K, F.col("cnt"))),
            F.lit(0).cast("long"),
        ).alias("b")
    )
    cands = kept.select("word").distinct()
    grid = (
        cands.crossJoin(F.broadcast(bound))
        .join(kept, ["shard", "word"], "left")
    )
    return grid.groupBy("word").agg(
        F.sum(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
        .cast("long")
        .alias("lower_bound"),
        F.sum(F.coalesce(F.col("cnt"), F.col("b")))
        .cast("long")
        .alias("upper_bound"),
    )


@query(
    "agg_heavy_hitters",
    oracle=f"""
    WITH w AS (
      SELECT doc_id % {_HH_SHARDS} AS shard,
             unnest(str_split(text, ' ')) AS word
      FROM documents
    ),
    c AS (
      SELECT shard, word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM w WHERE word <> '' GROUP BY shard, word
    ),
    r AS (
      SELECT shard, word, cnt,
             ROW_NUMBER() OVER (PARTITION BY shard
                                ORDER BY cnt DESC, word) AS rnk
      FROM c
    ),
    kept AS (SELECT shard, word, cnt FROM r WHERE rnk <= {_HH_K}),
    bound AS (
      SELECT shard,
             COALESCE(MAX(CASE WHEN rnk > {_HH_K} THEN cnt END),
                      0) AS b
      FROM r GROUP BY shard
    ),
    cands AS (SELECT DISTINCT word FROM kept),
    grid AS (
      SELECT cands.word, bound.shard, bound.b, kept.cnt
      FROM cands
      CROSS JOIN bound
      LEFT JOIN kept ON kept.shard = bound.shard
                    AND kept.word = cands.word
    )
    SELECT word,
           CAST(SUM(COALESCE(cnt, 0)) AS BIGINT) AS lower_bound,
           CAST(SUM(COALESCE(cnt, b)) AS BIGINT) AS upper_bound
    FROM grid GROUP BY word
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable heavy-hitters CERTIFICATE (the SpaceSaving /
    Misra-Gries merge discipline, Agarwal et al. 2013 "Mergeable
    Summaries"): each of 4 data shards keeps only its
    local top-8 words (_HH_SHARDS/_HH_K) plus one residual bound b_s = the largest
    DROPPED local count; merging yields, for every surviving
    candidate, a deterministic interval [Σ reported counts,
    Σ reported counts + Σ b_s over non-reporting shards] that
    provably contains the true corpus frequency (pinned in
    tests/test_sketches.py against exact counts). This is the
    communication-bounded form of top-k: per shard only k+1 numbers
    cross the wire however large the shard — the certificate a
    100 TB vocabulary census sends instead of its full count table.

    Deterministic end to end: shard = doc_id mod 4, local
    rank ties break on the word, integer counts throughout; the
    interval WIDTH is the honest price of the compression (it shrinks
    as k grows). Windows partition by shard — never global."""
    docs = load_table(spark, sf_dir, "documents")
    return hh_certificate(hh_shard_counts(docs))


@query(
    "join_size_cms_estimate",
    oracle=f"""
    WITH {_cms_cells_sql('lineitem', 'l_partkey')},
    dots AS (
        SELECT i, CAST(SUM(n * n) AS BIGINT) AS dot_f2
        FROM cells GROUP BY i
    ),
    est AS (SELECT CAST(MIN(dot_f2) AS BIGINT) AS est_f2 FROM dots),
    ex AS (
        SELECT CAST(SUM(f * f) AS BIGINT) AS exact_f2 FROM (
            SELECT CAST(COUNT(*) AS BIGINT) AS f
            FROM lineitem GROUP BY l_partkey) t
    )
    SELECT d.i, d.dot_f2, e.est_f2, x.exact_f2,
           {sql_qround(
               'e.est_f2 / CAST(x.exact_f2 AS DOUBLE) - 1.0', 6)}
               AS rel_overestimate
    FROM dots d, est e, ex x
    """,
)
def join_size_cms_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join size (second frequency moment F₂ = Σₖ f(k)²)
    estimated from the count-min sketch's row dot products (the
    AMS/CM inner-product estimator, Alon-Matias-Szegedy 1996 /
    Cormode-Muthukrishnan 2005): per depth row i, Σ_c n(i,c)² counts
    every true pair plus hash collisions, so each dot is an
    OVERESTIMATE and the min over the d rows is the estimate — the
    join-size oracle an optimizer consults BEFORE paying for a skewed
    self-join (l_partkey here; the same two-sketch dot prices any
    equi-join). Joins the price-it-first census family
    (llm_dedup_band_stats, profile_skew, agg_heavy_hitters,
    llm_minhash_band_tuning) with the classic sketch guarantee:
    dot ≥ F₂ always (collisions only add — pinned in the invariant
    test), E[dot] ≤ F₂ + N²/w.

    Everything is exact int64 (cells via the shared cms_cells
    expressions — bit-identical on both engines; dots and the exact
    F₂ are integer sums); the one double is the reported relative
    overestimate, qround(6). Int64 bound: a cell of n rows adds n² —
    at ~3e9 rows per cell the square overflows and ANSI throws
    LOUDLY; widen w (or shard the sketch by key range and sum the
    dots — they're additive) long before that.

    100 TB shape: the sketch build is the usual d-way map explode
    into ≤ d·w mergeable cells; the exact-F₂ pass (one keyed count +
    one 1-row Σf²) exists here to GRADE the estimate and is exactly
    the expensive thing the sketch replaces in production."""
    cells = cms_cells(
        load_table(spark, sf_dir, "lineitem"), "l_partkey"
    )
    dots = cells.groupBy("i").agg(
        F.sum(F.col("n") * F.col("n")).cast("long").alias("dot_f2")
    ).transform(pin)
    est = dots.agg(F.min("dot_f2").cast("long").alias("est_f2"))
    exact = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
        .agg(
            F.sum(F.col("f") * F.col("f")).cast("long").alias("exact_f2")
        )
    )
    return (
        dots.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(exact))
        .select(
            "i",
            "dot_f2",
            "est_f2",
            "exact_f2",
            qround(
                F.col("est_f2") / F.col("exact_f2").cast("double")
                - F.lit(1.0),
                6,
            ).alias("rel_overestimate"),
        )
    )
