"""The SQL-string interface: the engine's second front door.

Every DataFrame operator in this package has an equivalent through
``spark.sql`` over registered views — same Catalyst plans, same
physical execution. These queries prove the SQL surface end-to-end
with TPC-H-shaped analytics (multi-join star queries, correlated
IN-subquery with HAVING, GROUPING SETS) whose oracles are nearly
verbatim the same SQL run by DuckDB.

Scale notes: identical to the DataFrame forms — Catalyst sees one
logical plan either way. Join order here is left to the optimizer
(CBO + AQE), which is the point: declarative SQL means the 100 TB
plan improves with statistics, not code changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_geonames_spark.registry import query
from etl_geonames_spark.sources import load_table
from etl_geonames_spark.sources.tables import TABLE_NAMES


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the fixture tables as temp views for spark.sql use."""
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


@query(
    "sql_tpch_q3",
    oracle="""
    SELECT l_orderkey,
           CAST(FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5)
                 / 10000.0 AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1996-03-15'
      AND l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY l_orderkey, o_orderdate
    """,
)
def sql_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority, adapted to the fixture columns):
    segment filter → 3-way join → grouped revenue."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT l_orderkey,
               CAST(FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5)
                 / 10000.0 AS DOUBLE) AS revenue,
               o_orderdate
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP_NTZ '1996-03-15'
          AND l_shipdate > TIMESTAMP_NTZ '1996-03-15'
        GROUP BY l_orderkey, o_orderdate
    """)


@query(
    "sql_tpch_q5",
    oracle="""
    SELECT n_name, CAST(FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5)
                 / 10000.0 AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def sql_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): 6-table star join with a
    same-nation constraint. The two dims broadcast; the fact joins
    shuffle on their keys — all optimizer-chosen."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT n_name, CAST(FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5)
                 / 10000.0 AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP_NTZ '1996-01-01'
          AND o_orderdate < TIMESTAMP_NTZ '1997-01-01'
        GROUP BY n_name
    """)


@query(
    "sql_tpch_q18",
    oracle="""
    SELECT c_name, o_orderkey, o_totalprice,
           ROUND(SUM(l_quantity), 2) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, o_orderkey, o_totalprice
    """,
)
def sql_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): IN-subquery with HAVING —
    planned as a left-semi join against the pre-aggregated subquery."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT c_name, o_orderkey, o_totalprice,
               ROUND(SUM(l_quantity), 2) AS total_qty
        FROM customer, orders, lineitem
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        GROUP BY c_name, o_orderkey, o_totalprice
    """)


@query(
    "sql_tpch_q6",
    oracle="""
    SELECT FLOOR(SUM(l_extendedprice * l_discount) * 10000.0 + 0.5) / 10000.0
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def sql_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan + pushed
    predicates + global agg — the query whose entire cost IS the scan,
    i.e. the purest test of pushdown and column pruning."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT CAST(FLOOR(SUM(l_extendedprice * l_discount) * 10000.0 + 0.5)
                    / 10000.0 AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP_NTZ '1996-01-01'
          AND l_shipdate < TIMESTAMP_NTZ '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """)


@query(
    "sql_tpch_q12",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """,
)
def sql_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes/priority): join + conditional
    counting via SUM(CASE...)."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT l_returnflag,
               SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS high_line_count,
               SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS low_line_count
        FROM orders, lineitem
        WHERE o_orderkey = l_orderkey
          AND l_shipdate >= TIMESTAMP_NTZ '1996-01-01'
          AND l_shipdate < TIMESTAMP_NTZ '1997-01-01'
        GROUP BY l_returnflag
    """)


@query(
    "sql_tpch_q14",
    oracle="""
    SELECT FLOOR(
             100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0 END)
                    / SUM(l_extendedprice * (1 - l_discount))
             * 1000000.0 + 0.5) / 1000000.0 AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def sql_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): fact ⋈ broadcast dim + conditional
    ratio aggregate."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT CAST(FLOOR(
                 100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END)
                        / SUM(l_extendedprice * (1 - l_discount))
                 * 1000000.0 + 0.5) / 1000000.0 AS DOUBLE) AS promo_revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP_NTZ '1996-09-01'
          AND l_shipdate < TIMESTAMP_NTZ '1996-10-01'
    """)


@query(
    "sql_tpch_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def sql_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): correlated EXISTS — planned
    as a left-semi join, never a per-row subquery execution."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP_NTZ '1996-01-01'
          AND o_orderdate < TIMESTAMP_NTZ '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
    """)


@query(
    "sql_tpch_q16",
    oracle="""
    SELECT p_brand, p_type, COUNT(DISTINCT s_suppkey) AS supplier_cnt
    FROM part, lineitem, supplier
    WHERE p_partkey = l_partkey AND l_suppkey = s_suppkey
      AND p_brand <> 'Brand#1'
      AND p_size IN (5, 10, 15, 20)
      AND s_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type
    """,
)
def sql_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier counting): NOT-IN subquery (null-aware
    anti join) + distinct aggregation over a 3-way join."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT p_brand, p_type, COUNT(DISTINCT s_suppkey) AS supplier_cnt
        FROM part, lineitem, supplier
        WHERE p_partkey = l_partkey AND l_suppkey = s_suppkey
          AND p_brand <> 'Brand#1'
          AND p_size IN (5, 10, 15, 20)
          AND s_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type
    """)


@query(
    "sql_tpch_q19",
    oracle="""
    SELECT FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5)
             / 10000.0 AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
            AND l_quantity >= 1 AND l_quantity <= 30)
        OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
            AND l_quantity >= 10 AND l_quantity <= 40))
    """,
)
def sql_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): disjunction of conjunctive
    range predicates across BOTH join sides — the optimizer must split
    the single-side conjuncts out of the OR to push them below the
    join."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT CAST(FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 10000.0
                          + 0.5) / 10000.0 AS DOUBLE) AS revenue
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                AND l_quantity >= 1 AND l_quantity <= 30)
            OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
                AND l_quantity >= 10 AND l_quantity <= 40))
    """)


@query(
    "sql_tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) t GROUP BY c_count
    """,
)
def sql_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): LEFT JOIN with an
    extra join-side predicate (NOT a post-filter — customers with zero
    matching orders must survive with count 0) + double aggregation."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT c_count, COUNT(*) AS custdist FROM (
          SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o
            ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey
        ) t GROUP BY c_count
    """)


@query(
    "sql_tpch_q17",
    oracle="""
    SELECT CAST(FLOOR(SUM(l_extendedprice) / 7.0 * 10000.0 + 0.5) / 10000.0
                AS DOUBLE) AS avg_yearly
    FROM lineitem l, part p
    WHERE p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#2'
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = p.p_partkey)
    """,
)
def sql_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): correlated SCALAR
    subquery — Catalyst de-correlates it into an aggregate + join, not
    a per-row re-execution."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT CAST(FLOOR(SUM(l_extendedprice) / 7.0 * 10000.0 + 0.5)
                    / 10000.0 AS DOUBLE) AS avg_yearly
        FROM lineitem l, part p
        WHERE p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#2'
          AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                              WHERE l2.l_partkey = p.p_partkey)
    """)


@query(
    "sql_tpch_q22",
    oracle="""
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(FLOOR(SUM(c_acctbal) * 100.0 + 0.5) / 100.0 AS DOUBLE)
             AS totacctbal
    FROM (
      SELECT CAST(c_nationkey % 10 AS INT) AS cntrycode, c_acctbal
      FROM customer c
      WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                         WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey)
    ) t GROUP BY cntrycode
    """,
)
def sql_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-sales opportunity): uncorrelated scalar
    subquery in a filter + NOT EXISTS anti join + derived grouping
    key."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT cntrycode, COUNT(*) AS numcust,
               CAST(FLOOR(SUM(c_acctbal) * 100.0 + 0.5) / 100.0 AS DOUBLE)
                 AS totacctbal
        FROM (
          SELECT CAST(c_nationkey % 10 AS INT) AS cntrycode, c_acctbal
          FROM customer c
          WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                             WHERE c_acctbal > 0.0)
            AND NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_custkey = c.c_custkey)
        ) t GROUP BY cntrycode
    """)


@query(
    "sql_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind rollup/cube) —
    one Expand + single aggregate, not three scans."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)
