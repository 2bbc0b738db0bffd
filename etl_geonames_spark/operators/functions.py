"""Scalar function surface (SURVEY.md §2.7, §2.9).

Every scalar the reference applies per-row in JS (parseFloat, string
concat/replace/slice, truthy-map lookup, array compaction) re-expressed
as built-in JVM expressions — whole-stage-codegen'd, never a Python
UDF. Plus the date/JSON/math built-ins the reference never needed but
any analytics engine must have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_geonames_spark.functions import qround
from etl_geonames_spark.geonames.pipeline import resolve_type
from etl_geonames_spark.registry import query
from etl_geonames_spark.sources import load_table


@query(
    "fn_cast_double",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS qty_reparsed
    FROM lineitem
    """,
)
def fn_cast_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    """string → double parse (parseFloat, geonames.js:144-145). try_cast
    yields null on garbage where parseFloat yields NaN — same rows
    survive for well-formed input."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("string").try_cast("double").alias("qty_reparsed"),
    )


@query(
    "fn_concat_ws",
    oracle="""
    SELECT c_custkey,
           CONCAT_WS('.', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS composite_key
    FROM customer
    """,
)
def fn_concat_ws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Separator join building composite lookup keys (codes.join('.'),
    geonames.js:105,108)."""
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat_ws(
            ".", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")
        ).alias("composite_key"),
    )


@query(
    "fn_concat",
    oracle="""
    SELECT c_custkey,
           'http://sws.geonames.org/' || CAST(c_custkey AS VARCHAR) AS uri
    FROM customer
    """,
)
def fn_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URI construction by prefix concat (baseUri + geonameid,
    geonames.js:113-114, 138)."""
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat(
            F.lit("http://sws.geonames.org/"), F.col("c_custkey").cast("string")
        ).alias("uri"),
    )


@query(
    "fn_replace",
    oracle="""
    SELECT c_custkey, REPLACE(c_name, 'Customer#', '') AS bare_id
    FROM customer
    """,
)
def fn_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal substring replace (URI → bare id, geonames.js:235)."""
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("")).alias("bare_id"),
    )


from etl_geonames_spark.operators.brand_map import _BRAND_CASE, _BRAND_TYPES


@query(
    "fn_prefix_match",
    oracle=f"""
    SELECT p_partkey, p_brand, {_BRAND_CASE} AS brand_family
    FROM part
    """,
)
def fn_prefix_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix map match (geonames.js:127-132) as a fixed-depth
    COALESCE chain — nulls preserved for misses (the unfiltered form
    of filter_typed)."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        resolve_type(F.col("p_brand"), _BRAND_TYPES).alias("brand_family"),
    )


@query(
    "fn_array_compact",
    oracle="""
    SELECT o_orderkey,
           array_to_string(
             list_filter([o_orderstatus, o_orderpriority,
                          CASE WHEN o_totalprice > 300000 THEN 'BIG' ELSE '' END],
                         x -> x <> ''), '.') AS codes,
           len(list_filter([o_orderstatus, o_orderpriority,
                            CASE WHEN o_totalprice > 300000 THEN 'BIG' ELSE '' END],
                           x -> x <> '')) AS n_codes
    FROM orders
    """,
)
def fn_array_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array of non-empty values (R.filter(R.identity, ...),
    geonames.js:103) — the codes-array primitive behind the
    exactly-3-codes relation gate."""
    arr = F.filter(
        F.array(
            F.col("o_orderstatus"),
            F.col("o_orderpriority"),
            F.when(F.col("o_totalprice") > 300000, F.lit("BIG")).otherwise(
                F.lit("")
            ),
        ),
        lambda x: x != "",
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.array_join(arr, ".").alias("codes"),
        F.size(arr).cast("bigint").alias("n_codes"),
    )


@query(
    "fn_map_lookup",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CASE c_mktsegment
             WHEN 'BUILDING' THEN 'b'
             WHEN 'AUTOMOBILE' THEN 'a'
             WHEN 'MACHINERY' THEN 'm'
           END AS segment_code
    FROM customer
    """,
)
def fn_map_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal-map lookup (config.types[x] / extraUris[x],
    geonames.js:130, 181) via create_map — broadcast-free constant
    lookup, null on miss."""
    m = F.create_map(
        F.lit("BUILDING"), F.lit("b"),
        F.lit("AUTOMOBILE"), F.lit("a"),
        F.lit("MACHINERY"), F.lit("m"),
    )
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        m[F.col("c_mktsegment")].alias("segment_code"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           CAST(CEIL(l_quantity / 7) AS BIGINT) AS qty_ceil7,
           FLOOR((SQRT(l_extendedprice)) * 1000000.0 + 0.5) / 1000000.0 AS price_sqrt,
           FLOOR((LN(l_extendedprice)) * 1000000.0 + 0.5) / 1000000.0 AS price_ln
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math built-ins (the reference's only math is parseFloat; an
    engine needs the full surface). Transcendentals rounded to 6dp —
    libm implementations may differ in the last ulp across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # 4dp = the true decimal grid of a 2dp×2dp product: rounding at
        # the value's own grid never sits on a half-boundary, so Spark's
        # decimal-repr ROUND and DuckDB's binary ROUND agree.
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "net_price"
        ),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_ceil7"),
        qround(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        qround(F.log("l_extendedprice"), 6).alias("price_ln"),
    )


@query(
    "fn_date_trunc",
    oracle="""
    SELECT date_trunc('month', o_orderdate) AS order_month,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY 1
    """,
)
def fn_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar truncation + aggregation — the partition-key pattern for
    time-organized 100 TB data (write partitioned by month, prune on
    read)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "fn_string_ops",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           LOWER(p_name) AS name_lower,
           TRIM(p_type) AS type_trim,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           SUBSTRING(p_name, 1, 5) AS name_head,
           CAST(length(p_name) AS INT) AS name_len,
           (p_type LIKE '%BRASS%') AS is_brass
    FROM part
    """,
)
def fn_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core string surface: case, trim, pad, substring, length, LIKE."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_name").alias("name_lower"),
        F.trim("p_type").alias("type_trim"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.length("p_name").cast("int").alias("name_len"),
        F.col("p_type").like("%BRASS%").alias("is_brass"),
    )


@query(
    "fn_regexp",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
           regexp_replace(c_name, '[0-9]', 'x', 'g') AS name_masked,
           regexp_matches(c_name, '^Customer') AS is_customer
    FROM customer
    """,
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction / replacement / match — JVM-side regex, still
    codegen'd (the reference's string surgery was plain replace;
    geonames.js:235)."""
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.regexp_replace("c_name", "[0-9]", "x").alias("name_masked"),
        F.col("c_name").rlike("^Customer").alias("is_customer"),
    )


@query(
    "fn_null_ops",
    oracle="""
    SELECT s_suppkey,
           COALESCE(NULLIF(s_name, ''), 'unknown') AS name_or_default,
           (s_acctbal IS NULL) AS bal_missing,
           IFNULL(NULLIF(s_acctbal, 0.0), -1.0) AS bal_or_flag
    FROM supplier
    """,
)
def fn_null_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling surface: coalesce, nullif, is-null, ifnull —
    the tools for the reference's truthy/empty-string conventions."""
    return load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.coalesce(F.nullif(F.col("s_name"), F.lit("")), F.lit("unknown")).alias(
            "name_or_default"
        ),
        F.isnull("s_acctbal").alias("bal_missing"),
        F.ifnull(F.nullif(F.col("s_acctbal"), F.lit(0.0)), F.lit(-1.0)).alias(
            "bal_or_flag"
        ),
    )


@query(
    "fn_date_extract",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS d,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date
    FROM orders
    """,
)
def fn_date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar field extraction + interval arithmetic."""
    o = F.col("o_orderdate")
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year(o).cast("int").alias("y"),
        F.month(o).cast("int").alias("m"),
        F.dayofmonth(o).cast("int").alias("d"),
        F.quarter(o).cast("int").alias("q"),
        (o + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
    )


@query(
    "fn_variant_get",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_via_variant
    FROM events
    """,
)
def fn_variant_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse once into the
    binary variant encoding, then typed path extraction — at scale this
    beats per-access string re-parsing (get_json_object) whenever more
    than one field is read."""
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.try_variant_get(
            F.parse_json(F.col("props")), "$.k", "bigint"
        ).alias("k_via_variant"),
    )


@query(
    "fn_json_extract",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from a string column (the events.props
    property bag)."""
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.get_json_object(F.col("props"), "$.k").try_cast("bigint").alias("k_value"),
    )


@query(
    "fn_higher_order",
    oracle="""
    SELECT vec_id,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           FLOOR(list_sum(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE)))) * 10000.0 + 0.5)
             / 10000.0 AS l1_norm,
           FLOOR(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                 * 10000.0 + 0.5) / 10000.0 AS sq_norm,
           FLOOR(list_max(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE)))) * 1000000.0 + 0.5)
             / 1000000.0 AS linf_norm
    FROM embeddings
    """,
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions — transform/filter/aggregate with
    lambdas, fully JVM-side (codegen'd NewInstance loops, no Python).
    The same primitives the cosine/dedup paths build on, exercised
    standalone: count-if, L1/L2^2 via sequential-fold aggregate
    (matching DuckDB's list_sum order), and max via array_max."""
    emb = load_table(spark, sf_dir, "embeddings")
    absd = F.transform("embedding", lambda x: F.abs(x.cast("double")))
    sq = F.transform(
        "embedding", lambda x: x.cast("double") * x.cast("double")
    )
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, x: acc + x
    )
    return emb.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0))
        .cast("bigint")
        .alias("n_pos"),
        qround(fold(absd), 4).alias("l1_norm"),
        qround(fold(sq), 4).alias("sq_norm"),
        qround(F.array_max(absd), 6).alias("linf_norm"),
    )


@query(
    "fn_bit_ops",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, 1431655765) AS toggled,
           o_orderkey << 2 AS shl2,
           o_orderkey >> 3 AS shr3,
           CAST(bit_count(o_orderkey) AS INT) AS popcount
    FROM orders WHERE o_orderkey < 1000
    """,
)
def fn_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface: and/or/xor, shifts, popcount — the
    flag-mask idiom (packed feature flags, bitmap memberships). All
    codegen'd JVM intrinsics; the filter pushes to the scan."""
    k = F.col("o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(k < 1000)
        .select(
            "o_orderkey",
            k.bitwiseAND(F.lit(255)).alias("low_byte"),
            k.bitwiseOR(F.lit(4096)).alias("with_flag"),
            k.bitwiseXOR(F.lit(1431655765)).alias("toggled"),
            F.shiftleft(k, 2).alias("shl2"),
            F.shiftright(k, 3).alias("shr3"),
            F.bit_count(k).alias("popcount"),
        )
    )


@query(
    "fn_levenshtein",
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           CAST(levenshtein(a.n_name, b.n_name) AS INT) AS dist
    FROM nation a JOIN nation b ON a.n_name < b.n_name
    WHERE levenshtein(a.n_name, b.n_name) <= 6
    """,
)
def fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy pair matching on a dimension — the
    reconciliation idiom (near-identical entity names). The self-join
    is a broadcast theta join: fine on a dim, and at fact scale the
    pattern is the same join *blocked* by a cheap equi key first
    (soundex bucket / length band / first-k prefix) so levenshtein only
    runs inside blocks. Spark also has the early-exit threshold form
    ``levenshtein(l, r, k)`` (returns -1 past k) which bounds the DP to
    a 2k-wide band — use it when k << len.
    """
    nation = load_table(spark, sf_dir, "nation").select("n_name")
    a = nation.select(F.col("n_name").alias("name_a"))
    b = nation.select(F.col("n_name").alias("name_b"))
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(F.broadcast(b), F.col("name_a") < F.col("name_b"))
        .filter(dist <= 6)
        .select("name_a", "name_b", dist.alias("dist"))
    )


@query(
    "fn_array_setops",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_slice(str_split(text, ' '), 1, 12) AS a,
             list_slice(str_split(text, ' '), 7, 18) AS b
      FROM documents WHERE len(str_split(text, ' ')) >= 18
    )
    SELECT doc_id,
           COALESCE(array_to_string(list_sort(list_distinct(a || b)), ','), '') AS u,
           COALESCE(array_to_string(list_sort(list_distinct(list_intersect(a, b))), ','), '') AS i,
           COALESCE(array_to_string(list_sort(list_distinct(list_filter(a, x -> NOT list_contains(b, x)))), ','), '') AS e,
           CAST(len(list_distinct(a || b)) AS INT) AS n_union
    FROM toks
    """,
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (union / intersect / except) over token
    slices — the collection vocabulary for shingle/feature overlap.
    All JVM codegen'd, map-only, zero shuffle. Results are
    ``array_sort``-ed on BOTH engines: Spark's set functions preserve
    first-appearance order while DuckDB's list_* have their own, so
    unsorted output would hash-mismatch despite equal sets (the same
    trap as FP accumulation order, in array form). The sorted sets
    are emitted comma-joined — canonical scalar serialization the
    differential driver can hash.
    """
    toks = F.split("text", " ")
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.size(F.split("text", " ")) >= 18)
        .select(
            "doc_id",
            F.slice(toks, 1, 12).alias("a"),
            F.slice(toks, 7, 12).alias("b"),
        )
    )
    return docs.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_union("a", "b")), ",").alias("u"),
        F.array_join(
            F.array_sort(F.array_intersect("a", "b")), ","
        ).alias("i"),
        F.array_join(F.array_sort(F.array_except("a", "b")), ",").alias("e"),
        F.size(F.array_union("a", "b")).alias("n_union"),
    )


@query(
    "fn_collation",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE lower(c_mktsegment) = 'building'
    """,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (new in Spark 4): UTF8_LCASE makes
    case-insensitivity a property of the comparison itself instead of
    a lower() wrapped around every operand — at scale that matters
    because collation-aware equality stays sargable and hash-joinable
    where expression-wrapped keys can defeat stats and pushdown.
    DuckDB mirrors with the lower() form (its NOCASE collation has
    different ICU semantics; ASCII fixture data makes them agree).

    First runtime (non-constant-folded) collation use loads the ICU
    machinery once per session (~seconds) — a known fixed cost, see
    the repo working notes (CLAUDE.md)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.filter(
        F.expr("collate(c_mktsegment, 'UTF8_LCASE') = 'BuIlDiNg'")
    ).select("c_custkey", "c_mktsegment")


@query(
    "fn_xml_roundtrip",
    oracle="""
    SELECT o_orderkey,
           '<order><k>' || CAST(o_orderkey AS VARCHAR) || '</k><p>'
             || o_orderpriority || '</p></order>' AS xml,
           o_orderkey AS k_parsed,
           o_orderpriority AS p_parsed
    FROM orders WHERE o_orderkey < 100
    """,
)
def fn_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML parse surface (new in Spark 4): construct a deterministic
    XML payload per row, parse it back with ``from_xml`` against an
    explicit struct schema, and surface the extracted fields. The
    oracle verifies the extraction against the source columns directly
    — DuckDB has no XML type, so correctness is the roundtrip identity
    (parsed field ≡ original value), which is exactly what an XML
    ingest must guarantee. Map-only; the typical 100 TB use is a raw
    XML column landed from an upstream feed, parsed once at ingest."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < 100
    )
    xml = F.concat(
        F.lit("<order><k>"),
        F.col("o_orderkey").cast("string"),
        F.lit("</k><p>"),
        F.col("o_orderpriority"),
        F.lit("</p></order>"),
    )
    parsed = F.from_xml(xml, "k BIGINT, p STRING")
    return orders.select(
        "o_orderkey",
        xml.alias("xml"),
        parsed.getField("k").alias("k_parsed"),
        parsed.getField("p").alias("p_parsed"),
    )


@query(
    "fn_aes_roundtrip",
    oracle="""
    SELECT c_custkey, c_name AS name_roundtrip
    FROM customer WHERE c_custkey < 200
    """,
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption (`aes_encrypt`/`aes_decrypt`): the PII-
    at-rest primitive — encrypt on write, decrypt on authorized read,
    keys supplied per job, ciphertext opaque to everything between.
    ECB mode here because the oracle needs determinism (production
    uses GCM, whose random IV makes ciphertext non-reproducible by
    design). DuckDB has no AES, so correctness is the roundtrip
    identity decrypt(encrypt(x)) ≡ x — the property an encrypted
    column must guarantee. Map-only, JVM intrinsics (AES-NI)."""
    key = F.lit("0123456789abcdef")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") < 200
    )
    ct = F.aes_encrypt(F.col("c_name"), key, F.lit("ECB"))
    pt = F.aes_decrypt(ct, key, F.lit("ECB")).cast("string")
    return cust.select("c_custkey", pt.alias("name_roundtrip"))


@query(
    "fn_date_arith",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 3 MONTH AS plus_3m,
           date_trunc('month', o_orderdate) + INTERVAL 1 MONTH
             - INTERVAL 1 DAY AS month_end,
           CAST(date_diff('day', o_orderdate,
                          TIMESTAMP '1996-01-01') AS BIGINT)
             AS days_to_1996
    FROM orders WHERE o_orderkey < 500
    """,
)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic beyond extract/trunc: month-shifted dates
    (calendar-aware — adding 3 months to Nov 30 lands Feb 28/29, not a
    fixed 90 days), end-of-month via trunc+interval (the dialect-
    portable form of last_day), and signed day differences. All
    interval arithmetic on both engines; pure map stage."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        (d + F.expr("INTERVAL 3 MONTH")).alias("plus_3m"),
        (
            F.date_trunc("month", d)
            + F.expr("INTERVAL 1 MONTH")
            - F.expr("INTERVAL 1 DAY")
        ).alias("month_end"),
        F.datediff(F.lit("1996-01-01").cast("date"), d.cast("date"))
        .cast("bigint")
        .alias("days_to_1996"),
    )


@query(
    "fn_crypto_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_hex,
           sha256(text) AS sha256_hex
    FROM documents WHERE doc_id < 500
    """,
)
def fn_crypto_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic content digests (md5 / sha2-256, hex): the
    cross-system content-addressing primitive — manifests, cache keys,
    and exact-dedup fingerprints that must agree with OTHER engines,
    which the engine-internal xxhash64 (used on dedup hot paths for
    speed) deliberately does not. Standard algorithms, so Spark and
    DuckDB agree byte-for-byte with no rounding discipline needed.
    Map-only JVM intrinsics."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return docs.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2("text", 256).alias("sha256_hex"),
    )


@query(
    "fn_surrogate_key",
    oracle="""
    WITH h AS (
      SELECT o_orderkey, md5('ord|' || CAST(o_orderkey AS VARCHAR)) AS hx
      FROM orders WHERE o_orderkey < 300
    )
    SELECT o_orderkey,
           substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-'
             || substr(hx, 13, 4) || '-' || substr(hx, 17, 4) || '-'
             || substr(hx, 21, 12) AS sk
    FROM h
    """,
)
def fn_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate key: UUID-shaped id derived from an
    md5 of the namespaced natural key (the UUIDv3 idea) — stable
    across runs, engines, and systems, unlike `uuid()`/`monotonically_
    increasing_id()` which mint different ids every execution and
    silently break incremental joins against yesterday's output.
    Map-only string ops over the digest."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    hx = F.md5(F.concat(F.lit("ord|"), F.col("o_orderkey").cast("string")))
    sk = F.concat_ws(
        "-",
        F.substring(hx, 1, 8),
        F.substring(hx, 9, 4),
        F.substring(hx, 13, 4),
        F.substring(hx, 17, 4),
        F.substring(hx, 21, 12),
    )
    return o.select("o_orderkey", sk.alias("sk"))


@query(
    "fn_printf",
    oracle="""
    SELECT o_orderkey,
           printf('ORD-%08d/%s', o_orderkey, o_orderstatus) AS order_code,
           printf('%.2f', o_totalprice) AS price_str
    FROM orders WHERE o_orderkey < 300
    """,
)
def fn_printf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style formatting (`format_string` / `printf`): padded
    business keys and fixed-width renderings — the export/labeling
    formatter. The %.2f case is deliberate: printf formatting is
    round-half-EVEN on both JVMs and C libs for floats, so the
    rendered strings agree where naive decimal math might not.
    Map-only."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    return o.select(
        "o_orderkey",
        F.format_string(
            "ORD-%08d/%s", F.col("o_orderkey"), F.col("o_orderstatus")
        ).alias("order_code"),
        F.format_string("%.2f", F.col("o_totalprice")).alias("price_str"),
    )


@query(
    "fn_base64_roundtrip",
    oracle="""
    SELECT doc_id,
           base64(encode(text)) AS b64,
           text AS decoded
    FROM documents WHERE doc_id < 200
    """,
)
def fn_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base64 encode + decode roundtrip — the binary-in-text transport
    for NDJSON/CSV payload columns (the multimodal tables ship bytes
    this way).

    Dialect trap pinned here: Spark's ``base64`` emits RFC 2045 MIME
    with a CRLF every 76 chars; DuckDB's is unwrapped RFC 4648. The
    newline strip makes the encodings byte-equal (same alphabet and
    padding otherwise) — strip BEFORE comparing or hashing base64
    across systems. ``unbase64`` accepts both forms, so the decode
    side needs no normalization."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    b64 = F.regexp_replace(
        F.base64(F.col("text").cast("binary")), "[\\r\\n]", ""
    )
    return docs.select(
        "doc_id",
        b64.alias("b64"),
        F.unbase64(F.base64(F.col("text").cast("binary")))
        .cast("string")
        .alias("decoded"),
    )


_CIDR_BLOCKS = [
    # (name, network-as-int for a.b.0.0, prefix_len)
    ("corp-east", 10, 0, 15),   # 10.0.0.0/15
    ("corp-west", 10, 2, 15),   # 10.2.0.0/15
    ("vpn", 10, 64, 10),        # 10.64.0.0/10
    ("guest", 10, 128, 9),      # 10.128.0.0/9
    ("lab", 10, 0, 8),          # 10.0.0.0/8 (catch-all, shortest)
]


@query(
    "fn_ip_cidr",
    oracle=f"""
    WITH ips AS (
        SELECT user_id,
               '10.' || CAST((user_id * 7) % 256 AS VARCHAR) || '.'
                     || CAST((user_id * 13) % 256 AS VARCHAR) || '.'
                     || CAST(user_id % 256 AS VARCHAR) AS ip
        FROM (SELECT DISTINCT user_id FROM events)
    ),
    parsed AS (
        SELECT user_id, ip,
               CAST(str_split(ip, '.')[1] AS BIGINT) * 16777216
             + CAST(str_split(ip, '.')[2] AS BIGINT) * 65536
             + CAST(str_split(ip, '.')[3] AS BIGINT) * 256
             + CAST(str_split(ip, '.')[4] AS BIGINT) AS ip_int
        FROM ips
    ),
    blocks(net_name, net_int, prefix_len) AS (VALUES {", ".join(
        f"('{n}', CAST({(a * 16777216) + (b * 65536)} AS BIGINT), {p})"
        for n, a, b, p in _CIDR_BLOCKS
    )}),
    m AS (
        SELECT p.user_id, p.ip, b.net_name, b.prefix_len
        FROM parsed p JOIN blocks b
          ON p.ip_int // CAST(pow(2, 32 - b.prefix_len) AS BIGINT)
             = b.net_int // CAST(pow(2, 32 - b.prefix_len) AS BIGINT)
    )
    SELECT user_id, ip,
           max_by(net_name, prefix_len) AS net_name,
           CAST(MAX(prefix_len) AS INT) AS prefix_len
    FROM m GROUP BY user_id, ip
    """,
)
def fn_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IP parsing + LONGEST-PREFIX CIDR classification — the network
    enrichment every access-log pipeline needs: dotted-quad → 32-bit
    int by pure string/arithmetic expressions (no UDF), then match
    against a routing-table dim where an IP inside several nested
    blocks takes the MOST SPECIFIC one (max prefix_len — the same
    longest-prefix-wins contract as the reference's featureCode
    matching, geonames.js:94-99, applied to networks). IPs are
    synthesized deterministically from user ids in both engines (the
    fixture has no IP column); the /8 catch-all guarantees every IP
    classifies.

    Match = integer right-shift equality (ip >> (32−len) == net >>
    (32−len), stated as floor-division so both engines run identical
    arithmetic), then one argmax aggregate picks the winning block.

    100 TB shape: the routing table broadcasts (real ones are ≤ 1M
    rows); candidate matches are ≤ blocks-per-IP (nesting depth, ~2-3)
    so the argmax aggregate is near-free; the fact side never
    shuffles — classification is scan-side."""
    ev = load_table(spark, sf_dir, "events").select("user_id").distinct()
    ip = F.concat(
        F.lit("10."),
        ((F.col("user_id") * 7) % 256).cast("string"),
        F.lit("."),
        ((F.col("user_id") * 13) % 256).cast("string"),
        F.lit("."),
        (F.col("user_id") % 256).cast("string"),
    )
    parts = F.split(F.col("ip"), "\\.")
    ip_int = (
        parts.getItem(0).cast("long") * 16777216
        + parts.getItem(1).cast("long") * 65536
        + parts.getItem(2).cast("long") * 256
        + parts.getItem(3).cast("long")
    )
    parsed = ev.select("user_id", ip.alias("ip")).select(
        "user_id", "ip", ip_int.alias("ip_int")
    )
    blocks = spark.createDataFrame(
        [
            (n, (a * 16777216) + (b * 65536), p)
            for n, a, b, p in _CIDR_BLOCKS
        ],
        "net_name string, net_int long, prefix_len int",
    )
    shift = F.pow(F.lit(2.0), 32 - F.col("prefix_len")).cast("long")
    m = parsed.join(
        F.broadcast(blocks),
        F.floor(F.col("ip_int") / shift) == F.floor(F.col("net_int") / shift),
    )
    return m.groupBy("user_id", "ip").agg(
        F.max_by("net_name", "prefix_len").alias("net_name"),
        F.max("prefix_len").cast("int").alias("prefix_len"),
    )


@query(
    "fn_date_edge",
    oracle="""
    SELECT o_orderkey,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d')
               AS plus_month,
           CAST(EXTRACT(doy FROM o_orderdate) AS INT) AS day_of_year,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS quarter,
           CAST(EXTRACT(day FROM last_day(o_orderdate)) AS INT)
               AS days_in_month,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          last_day(o_orderdate)) AS INT)
               AS days_to_month_end
    FROM orders WHERE o_orderkey % 7 = 0
    """,
)
def fn_date_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar edge arithmetic: month-end, add-a-month (BOTH engines
    clamp Jan 31 + 1 month → Feb 28/29 — the convention this query
    pins cross-engine, because a naive +30d breaks every billing
    cutoff), day-of-year, quarter, days-in-month, and
    days-to-month-end — the date kit behind retention cohorts and
    fiscal rollups. All map-only catalyst date intrinsics (codegen,
    no shuffle); ISO week numbers are deliberately EXCLUDED — Spark
    and DuckDB agree on ISO weeks but not on week-of-year near year
    boundaries under non-ISO settings, so the contract sticks to
    convention-free fields. Dates emit as ISO strings (the driver's
    canonicalizer and the DATE/TIMESTAMP pandas mismatch both argue
    for scalar serialization)."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 7 == 0
    )
    return o.select(
        "o_orderkey",
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias(
            "month_end"
        ),
        F.date_format(F.add_months("o_orderdate", 1), "yyyy-MM-dd").alias(
            "plus_month"
        ),
        F.dayofyear("o_orderdate").cast("int").alias("day_of_year"),
        F.quarter("o_orderdate").cast("int").alias("quarter"),
        F.dayofmonth(F.last_day("o_orderdate"))
        .cast("int")
        .alias("days_in_month"),
        F.datediff(F.last_day("o_orderdate"), F.col("o_orderdate"))
        .cast("int")
        .alias("days_to_month_end"),
    )
