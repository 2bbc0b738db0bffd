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
from pyspark.sql import functions as F

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


# ---------------------------------------------------------------------------
# Remaining TPC-H query shapes (completing 22/22 coverage). The fixture
# schema has no partsupp table and lineitem lacks commitdate/receiptdate,
# so Q2/Q9/Q11/Q20 bridge part->supplier through lineitem and Q21 defines
# "late" as shipping >60 days after the order date; every shape's defining
# plan feature (correlated MIN, two-sided nation pairing, ratio-of-sums
# market share, HAVING vs scalar subquery, grouped-IN, double-correlated
# EXISTS/NOT EXISTS) is preserved.
# ---------------------------------------------------------------------------


@query(
    "sql_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5)
             / 10000.0 AS sum_disc_price,
           FLOOR(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))
                 * 10000.0 + 0.5) / 10000.0 AS sum_charge,
           FLOOR((AVG(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
           FLOOR((AVG(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS avg_price,
           FLOOR((AVG(l_discount)) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary): the canonical scan + grouped
    aggregate. One partial-agg map-side pass, |groups| rows shuffled —
    the same plan contract tests/test_plans.py pins for agg_group."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               CAST(FLOOR(SUM(l_extendedprice * (1 - l_discount))
                          * 10000.0 + 0.5) / 10000.0 AS DOUBLE)
                 AS sum_disc_price,
               CAST(FLOOR(SUM(l_extendedprice * (1 - l_discount)
                              * (1 + l_tax)) * 10000.0 + 0.5) / 10000.0
                    AS DOUBLE) AS sum_charge,
               CAST(FLOOR((AVG(l_quantity)) * 10000.0 + 0.5) / 10000.0
                    AS DOUBLE) AS avg_qty,
               CAST(FLOOR((AVG(l_extendedprice)) * 10000.0 + 0.5) / 10000.0
                    AS DOUBLE) AS avg_price,
               CAST(FLOOR((AVG(l_discount)) * 10000.0 + 0.5) / 10000.0
                    AS DOUBLE) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP_NTZ '2001-09-01'
        GROUP BY l_returnflag, l_linestatus
    """)


@query(
    "sql_tpch_q2",
    oracle="""
    SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM part, lineitem, supplier, nation, region
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND p_size = 5 AND p_type = 'STANDARD'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND s_acctbal = (SELECT MIN(s2.s_acctbal)
                       FROM lineitem l2, supplier s2, nation n2, region r2
                       WHERE l2.l_partkey = p_partkey
                         AND s2.s_suppkey = l2.l_suppkey
                         AND s2.s_nationkey = n2.n_nationkey
                         AND n2.n_regionkey = r2.r_regionkey
                         AND r2.r_name = 'EUROPE')
    """,
)
def sql_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): correlated scalar MIN
    over a multi-table join, equality-matched back to the outer row.
    Adapted: part->supplier bridged via lineitem (no partsupp table),
    min acctbal stands in for min supplycost; raw-column equality is
    bit-exact on both engines (no arithmetic on the compared value)."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
        FROM part, lineitem, supplier, nation, region
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND p_size = 5 AND p_type = 'STANDARD'
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
          AND s_acctbal = (SELECT MIN(s2.s_acctbal)
                           FROM lineitem l2, supplier s2, nation n2, region r2
                           WHERE l2.l_partkey = p_partkey
                             AND s2.s_suppkey = l2.l_suppkey
                             AND s2.s_nationkey = n2.n_nationkey
                             AND n2.n_regionkey = r2.r_regionkey
                             AND r2.r_name = 'EUROPE')
    """)


@query(
    "sql_tpch_q7",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           FLOOR(SUM(volume) * 10000.0 + 0.5) / 10000.0 AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier, lineitem, orders, customer, nation n1, nation n2
          WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
            AND c_custkey = o_custkey
            AND s_nationkey = n1.n_nationkey
            AND c_nationkey = n2.n_nationkey
            AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01') shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def sql_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): two broadcast-able nation dims
    joined under a cross-pair disjunction, revenue per year. The
    nation filter disjunction cannot be pushed to either scan alone —
    the optimizer must keep it above both dimension joins."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT supp_nation, cust_nation, l_year,
               CAST(FLOOR(SUM(volume) * 10000.0 + 0.5) / 10000.0 AS DOUBLE)
                 AS revenue
        FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
                     l_extendedprice * (1 - l_discount) AS volume
              FROM supplier, lineitem, orders, customer,
                   nation n1, nation n2
              WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
                AND c_custkey = o_custkey
                AND s_nationkey = n1.n_nationkey
                AND c_nationkey = n2.n_nationkey
                AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                  OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
                AND l_shipdate >= TIMESTAMP_NTZ '1996-01-01'
                AND l_shipdate < TIMESTAMP_NTZ '1998-01-01') shipping
        GROUP BY supp_nation, cust_nation, l_year
    """)


@query(
    "sql_tpch_q8",
    oracle="""
    SELECT o_year,
           FLOOR((SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                  / SUM(volume)) * 1000000.0 + 0.5) / 1000000.0 AS mkt_share
    FROM (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS nation
          FROM part, supplier, lineitem, orders, customer,
               nation n1, nation n2, region
          WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
            AND l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n1.n_nationkey
            AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
            AND s_nationkey = n2.n_nationkey
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1998-01-01'
            AND p_type = 'PROMO') all_nations
    GROUP BY o_year
    """,
)
def sql_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): 8-table star join, conditional
    ratio-of-sums per year. Ratio is qround'd (floor-form) — the
    rounding invariant for non-grid-aligned values."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o_year,
               CAST(FLOOR((SUM(CASE WHEN nation = 'NATION_3'
                                    THEN volume ELSE 0 END) / SUM(volume))
                          * 1000000.0 + 0.5) / 1000000.0 AS DOUBLE)
                 AS mkt_share
        FROM (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
                     l_extendedprice * (1 - l_discount) AS volume,
                     n2.n_name AS nation
              FROM part, supplier, lineitem, orders, customer,
                   nation n1, nation n2, region
              WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
                AND l_orderkey = o_orderkey AND o_custkey = c_custkey
                AND c_nationkey = n1.n_nationkey
                AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
                AND s_nationkey = n2.n_nationkey
                AND o_orderdate >= TIMESTAMP_NTZ '1996-01-01'
                AND o_orderdate < TIMESTAMP_NTZ '1998-01-01'
                AND p_type = 'PROMO') all_nations
        GROUP BY o_year
    """)


@query(
    "sql_tpch_q9",
    oracle="""
    SELECT nation, o_year,
           FLOOR(SUM(amount) * 10000.0 + 0.5) / 10000.0 AS sum_profit
    FROM (SELECT n_name AS nation,
                 CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
                 l_extendedprice * (1 - l_discount)
                   - 0.1 * p_retailprice * l_quantity AS amount
          FROM part, supplier, lineitem, orders, nation
          WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
            AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
            AND p_name LIKE '%widget%') profit
    GROUP BY nation, o_year
    """,
)
def sql_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): LIKE-filtered part dim,
    profit = revenue - cost per (nation, year). Adapted: cost proxy is
    0.1 * p_retailprice * quantity (no partsupp.ps_supplycost); the
    substring filter on the part name and the 5-table join shape are
    the plan features that matter."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT nation, o_year,
               CAST(FLOOR(SUM(amount) * 10000.0 + 0.5) / 10000.0 AS DOUBLE)
                 AS sum_profit
        FROM (SELECT n_name AS nation,
                     CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
                     l_extendedprice * (1 - l_discount)
                       - 0.1 * p_retailprice * l_quantity AS amount
              FROM part, supplier, lineitem, orders, nation
              WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
                AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
                AND p_name LIKE '%widget%') profit
        GROUP BY nation, o_year
    """)


@query(
    "sql_tpch_q10",
    oracle="""
    SELECT c_custkey, c_name,
           FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5)
             / 10000.0 AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def sql_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned items): top-20 customers by lost revenue —
    join + group + TakeOrdered top-k (no global sort materialized).
    c_custkey tiebreak keeps the LIMIT edge deterministic; ORDER BY
    resolves the *rounded* alias so both engines rank identical
    values."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT c_custkey, c_name,
               CAST(FLOOR(SUM(l_extendedprice * (1 - l_discount))
                          * 10000.0 + 0.5) / 10000.0 AS DOUBLE) AS revenue,
               c_acctbal, n_name
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP_NTZ '1996-01-01'
          AND o_orderdate < TIMESTAMP_NTZ '1996-04-01'
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """)


@query(
    "sql_tpch_q11",
    oracle="""
    SELECT l_partkey,
           FLOOR(SUM(l_extendedprice * l_quantity) * 10000.0 + 0.5)
             / 10000.0 AS part_value
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_name = 'NATION_5'
    GROUP BY l_partkey
    HAVING SUM(l_extendedprice * l_quantity) > (
      SELECT SUM(l_extendedprice * l_quantity) * 0.001
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = 'NATION_5')
    """,
)
def sql_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): grouped value vs an
    uncorrelated scalar-subquery threshold in HAVING — the subquery
    plans as a one-row broadcast, not a per-group re-scan. Adapted:
    part value flows through lineitem (no partsupp)."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT l_partkey,
               CAST(FLOOR(SUM(l_extendedprice * l_quantity)
                          * 10000.0 + 0.5) / 10000.0 AS DOUBLE)
                 AS part_value
        FROM lineitem, supplier, nation
        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name = 'NATION_5'
        GROUP BY l_partkey
        HAVING SUM(l_extendedprice * l_quantity) > (
          SELECT SUM(l_extendedprice * l_quantity) * 0.001
          FROM lineitem, supplier, nation
          WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
            AND n_name = 'NATION_5')
    """)


@query(
    "sql_tpch_q15",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name,
           FLOOR(total_revenue * 10000.0 + 0.5) / 10000.0 AS total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def sql_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): CTE referenced twice — once as the
    join input, once reduced to a scalar MAX. The argmax-by-equality
    compares each engine's own aggregate against its own max, so
    accumulation-order noise cannot flip membership."""
    register_views(spark, sf_dir)
    return spark.sql("""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP_NTZ '1996-01-01'
            AND l_shipdate < TIMESTAMP_NTZ '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name,
               CAST(FLOOR(total_revenue * 10000.0 + 0.5) / 10000.0 AS DOUBLE)
                 AS total_revenue
        FROM supplier, revenue
        WHERE s_suppkey = supplier_no
          AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """)


@query(
    "sql_tpch_q20",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'small%')
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(l_quantity) > 50)
      AND s_nationkey = n_nationkey AND n_name = 'NATION_7'
    """,
)
def sql_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (part promotion): nested IN — the inner IN
    prunes parts by prefix, the outer IN carries a grouped HAVING.
    Both plan as semi-joins; the grouped subquery aggregates before
    joining (no row explosion). Adapted: availability threshold reads
    shipped quantity off lineitem (no partsupp.ps_availqty)."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT s_name, s_acctbal
        FROM supplier, nation
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE 'small%')
              AND l_shipdate >= TIMESTAMP_NTZ '1996-01-01'
              AND l_shipdate < TIMESTAMP_NTZ '1997-01-01'
            GROUP BY l_suppkey, l_partkey
            HAVING SUM(l_quantity) > 50)
          AND s_nationkey = n_nationkey AND n_name = 'NATION_7'
    """)


@query(
    "sql_tpch_q21",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
      AND s_nationkey = n_nationkey AND n_name = 'NATION_9'
    GROUP BY s_name
    """,
)
def sql_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): EXISTS +
    NOT EXISTS, both correlated on the order key — a semi join stacked
    on an anti join over the same fact. Adapted: "late" is shipping
    >60 days after the order date (no commitdate/receiptdate); the
    inner NOT EXISTS re-joins orders so its correlation stays a pure
    equality (planner-friendly on both engines)."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier, lineitem l1, orders, nation
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          JOIN orders o3
                            ON o3.o_orderkey = l3.l_orderkey
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o3.o_orderdate
                                                + INTERVAL 60 DAY)
          AND s_nationkey = n_nationkey AND n_name = 'NATION_9'
        GROUP BY s_name
    """)


@query(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE chain AS (
      SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth
      FROM customer
      UNION ALL
      SELECT node, cur // 10, depth + 1 FROM chain WHERE cur > 0
    )
    SELECT node, CAST(MAX(depth) AS INT) AS depth_to_root
    FROM chain GROUP BY node
    """,
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, new in Spark 4): walk each
    customer up a derived parent chain (parent = key div 10 — a
    deterministic tree the fixture schema lacks) and report the depth
    to the root.

    The recursion is the genuine iterate-until-empty dataflow —
    Spark's recursive CTE re-plans each step on the previous step's
    output, the SQL-level cousin of the engine's
    :func:`~etl_geonames_spark.operators.llm.connected_components`
    loop. Termination is value-driven (cur > 0), depth ≤ 6 at any
    fixture scale since keys are < 10^7. The per-step plan is a
    map-only projection — the single shuffle is the final group-by."""
    register_views(spark, sf_dir)
    return spark.sql("""
        WITH RECURSIVE chain AS (
          SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth
          FROM customer
          UNION ALL
          SELECT node, cur DIV 10, depth + 1 FROM chain WHERE cur > 0
        )
        SELECT node, CAST(MAX(depth) AS INT) AS depth_to_root
        FROM chain GROUP BY node
    """)


@query(
    "sql_lateral_topk",
    oracle="""
    SELECT n.n_name, c.c_name, c.c_acctbal
    FROM nation n,
    LATERAL (
      SELECT c_name, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 2
    ) c
    """,
)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT: top-2
    customers by balance per nation — per-group top-k in pure SQL,
    identical text on both engines.

    Catalyst de-correlates this into a window-rank over the customer
    side rather than running the subquery per outer row; the
    DataFrame twin is the `row_number ≤ k` pattern used throughout
    (`llm_tfidf_top_terms`, `geo_knn`). Deterministic under the
    (balance, name) tie-break."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT n.n_name, c.c_name, c.c_acctbal
        FROM nation n,
        LATERAL (
          SELECT c_name, c_acctbal FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2
        ) c
    """)


@query(
    "sql_pivot",
    oracle="""
    SELECT o_orderpriority,
           FLOOR(COALESCE(SUM(CASE WHEN o_orderstatus = 'O'
                                   THEN o_totalprice END), 0.0)
                 * 100.0 + 0.5) / 100.0 AS sum_o,
           FLOOR(COALESCE(SUM(CASE WHEN o_orderstatus = 'F'
                                   THEN o_totalprice END), 0.0)
                 * 100.0 + 0.5) / 100.0 AS sum_f,
           FLOOR(COALESCE(SUM(CASE WHEN o_orderstatus = 'P'
                                   THEN o_totalprice END), 0.0)
                 * 100.0 + 0.5) / 100.0 AS sum_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def sql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIVOT clause (explicit value list — the scalable form: an
    implicit list would need a blocking distinct scan to discover
    columns). Same Expand+aggregate plan as the DataFrame
    `agg_pivot`; DuckDB's PIVOT dialect differs, so the oracle uses
    the CASE-aggregation desugaring, which is also exactly what
    Catalyst lowers PIVOT to."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderpriority,
               CAST(FLOOR(COALESCE(o, 0.0) * 100.0 + 0.5) / 100.0
                    AS DOUBLE) AS sum_o,
               CAST(FLOOR(COALESCE(f, 0.0) * 100.0 + 0.5) / 100.0
                    AS DOUBLE) AS sum_f,
               CAST(FLOOR(COALESCE(p, 0.0) * 100.0 + 0.5) / 100.0
                    AS DOUBLE) AS sum_p
        FROM (SELECT o_orderpriority, o_orderstatus, o_totalprice FROM orders)
        PIVOT (SUM(o_totalprice)
               FOR o_orderstatus IN ('O' AS o, 'F' AS f, 'P' AS p))
    """)


@query(
    "sql_window_clause",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER w AS rn,
           CAST(FLOOR(SUM(o_totalprice) OVER wf * 100.0 + 0.5) / 100.0
                AS DOUBLE) AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def sql_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named WINDOW clause: one spec shared by several functions —
    beyond syntax hygiene, a single named spec guarantees both
    functions land in ONE Window node over ONE exchange (divergent
    inline specs can silently double the shuffles). Identical text on
    both engines (Spark accepts named-window REFERENCES only — no
    inline frame extension of a named spec — so the framed variant is
    its own named window); the running sum pins its frame explicitly
    because default frames with ORDER BY are RANGE-to-current, which
    double-counts ties."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER w AS rn,
               CAST(FLOOR(SUM(o_totalprice) OVER wf * 100.0 + 0.5) / 100.0
                    AS DOUBLE) AS running_total
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """)


@query(
    "sql_filter_clause",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_all,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
             AS n_finished,
           CAST(FLOOR(COALESCE(SUM(o_totalprice)
                  FILTER (WHERE o_orderstatus = 'F'), 0.0)
                * 100.0 + 0.5) / 100.0 AS DOUBLE) AS finished_total
    FROM orders GROUP BY o_orderpriority
    """,
)
def sql_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard-SQL FILTER clause on aggregates — per-aggregate
    predicates in one pass over one scan (the declarative form of the
    CASE-WHEN-inside-SUM idiom the TPC-H Q12/pivot queries desugar
    to). Identical text on both engines; Catalyst compiles it to the
    same conditional-aggregate plan, so there is no second scan no
    matter how many FILTERed aggregates the query stacks."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_all,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
                 AS n_finished,
               CAST(FLOOR(COALESCE(SUM(o_totalprice)
                      FILTER (WHERE o_orderstatus = 'F'), 0.0)
                    * 100.0 + 0.5) / 100.0 AS DOUBLE) AS finished_total
        FROM orders GROUP BY o_orderpriority
    """)


@query(
    "sql_relational_division",
    oracle="""
    SELECT CAST(o_custkey AS BIGINT) AS custkey FROM orders
    GROUP BY o_custkey
    HAVING COUNT(DISTINCT o_orderpriority) =
        (SELECT COUNT(DISTINCT o_orderpriority) FROM orders)
    """,
)
def sql_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division ("for all"): customers whose orders span
    EVERY order priority that exists anywhere. The one classic
    relational-algebra operator with no SQL keyword — Codd's ÷ —
    expressed the scalable way: count-distinct per group compared to
    a global count-distinct scalar, instead of the textbook
    double-NOT-EXISTS (which plans as two correlated anti-joins and
    re-probes the divisor per group).

    Identical text on both engines. Catalyst runs the scalar subquery
    once, broadcasts the single value into the HAVING predicate, and
    the whole query is one map-side-combined aggregate on o_custkey —
    a single shuffle at any scale. The double-NOT-EXISTS phrasing
    would instead shuffle orders × priorities twice."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT CAST(o_custkey AS BIGINT) AS custkey FROM orders
        GROUP BY o_custkey
        HAVING COUNT(DISTINCT o_orderpriority) =
            (SELECT COUNT(DISTINCT o_orderpriority) FROM orders)
    """)


@query(
    "sql_session_variables",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(FLOOR(AVG(o_totalprice) * 100.0 + 0.5) / 100.0
                AS DOUBLE) AS avg_price
    FROM orders
    WHERE o_totalprice >= 150000.0 AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL session variables (DECLARE / SET VAR): the query's
    thresholds live in typed session state instead of string-spliced
    literals — the parameterization path for SQL-first pipelines
    (dbt-style) where the same text runs at many thresholds.
    EXECUTE IMMEDIATE (also 4.0) is the dynamic-SQL sibling;
    sql_parameterized covers the API-level binding.

    Variables constant-fold at plan time, so the physical plan is
    IDENTICAL to the literal query — the filter still pushes into the
    parquet scan; there is no runtime lookup. The oracle inlines the
    same constants, proving exactly that.
    """
    register_views(spark, sf_dir)
    spark.sql(
        "DECLARE OR REPLACE VARIABLE price_floor DOUBLE DEFAULT 0.0"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE status STRING DEFAULT 'O'")
    spark.sql("SET VAR price_floor = 150000.0")
    return spark.sql("""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(FLOOR(AVG(o_totalprice) * 100.0 + 0.5) / 100.0
                    AS DOUBLE) AS avg_price
        FROM orders
        WHERE o_totalprice >= price_floor AND o_orderstatus = status
        GROUP BY o_orderpriority
    """)


@query(
    "sql_parameterized",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000.0
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (named parameter markers + args dict, Spark
    4): values bind server-side as typed literals, never by string
    concatenation — the SQL-injection-proof API surface every
    programmatic caller should use.

    Binding happens before optimization, so pushdown/top-k planning
    see real literals: this plans the same TakeOrderedAndProject over
    a filtered scan as the inlined text (which is exactly what the
    oracle runs)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_orderpriority = :prio AND o_totalprice > :floor
        ORDER BY o_totalprice DESC, o_orderkey LIMIT :k
        """,
        args={"prio": "1-URGENT", "floor": 200000.0, "k": 15},
    )


@query(
    "sql_group_by_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(FLOOR(SUM(o_totalprice) * 100.0 + 0.5) / 100.0
                AS DOUBLE) AS total
    FROM orders GROUP BY ALL
    """,
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (Spark 4 + DuckDB, identical text): every
    non-aggregate select item becomes a grouping key — the
    column-drift-proof form for wide reporting queries (add a
    dimension to the SELECT and the grouping follows; no silently
    wrong aggregate when someone forgets to extend GROUP BY).
    Resolves at analysis time to an ordinary hash aggregate — the
    physical plan is byte-identical to the explicit-keys query."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(FLOOR(SUM(o_totalprice) * 100.0 + 0.5) / 100.0
                    AS DOUBLE) AS total
        FROM orders GROUP BY ALL
    """)


@query(
    "sql_distinct_on",
    oracle="""
    SELECT DISTINCT ON (o_custkey)
           CAST(o_custkey AS BIGINT) AS custkey, o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_custkey, o_totalprice DESC, o_orderkey
    """,
)
def sql_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-dialect mapping row: DuckDB/Postgres ``DISTINCT ON``
    (first row per key in ORDER BY order) has NO Spark keyword — the
    engine expresses the identical semantics as max_by over a
    comparison-ordered struct (price DESC, orderkey ASC encoded as
    (price, -orderkey) so one MAX captures the full tie-break chain),
    which Catalyst runs as ONE map-side-combined hash aggregate.
    That beats the textbook row_number()-over-window translation: no
    per-key sort, no window state — the dedup_latest_per_key argmax
    trick applied to dialect migration.

    The -orderkey trick needs orderkey ≥ 0 (true by fixture
    contract); general keys would pack a struct of
    (price, negated-or-inverted key) per component."""
    orders = load_table(spark, sf_dir, "orders")
    best = F.max(
        F.struct(
            F.col("o_totalprice").alias("p"),
            (-F.col("o_orderkey")).alias("nk"),
        )
    )
    return (
        orders.groupBy(F.col("o_custkey").cast("bigint").alias("custkey"))
        .agg(best.alias("b"))
        .select(
            "custkey",
            (-F.col("b.nk")).alias("o_orderkey"),
            F.col("b.p").alias("o_totalprice"),
        )
    )


@query(
    "sql_qualify",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey
           ) AS INT) AS rk
    FROM customer
    QUALIFY rk <= 3
    """,
)
def sql_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-dialect mapping row: the ``QUALIFY`` clause
    (DuckDB/Snowflake/BigQuery — filter on a window result without a
    derived table) has no Spark keyword; the engine expresses the
    identical semantics as window → filter, which Catalyst plans as
    the same single per-key sort the QUALIFY engines run. The oracle
    side uses DuckDB's native QUALIFY so the mapping itself is what
    the differential check verifies.

    Top-3 customers by account balance per market segment;
    deterministic tie-break on custkey.

    100 TB shape: rank-then-filter per segment shuffles once on the
    partition key; a hot segment goes through distributed_rank (the
    whitelisted range-repartition recipe) — never a global window.
    """
    from pyspark.sql.window import Window

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).cast("int").alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


@query(
    "sql_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts AS p_ts, c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def sql_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF-JOIN dialect mapping, differentially checked against
    DuckDB's NATIVE ``ASOF JOIN`` (the same move as sql_qualify: the
    oracle runs the real dialect feature, so the Spark decomposition
    is verified against the dialect's own semantics, not our reading
    of it). Use case: last-touch attribution — each purchase joins
    the latest prior click of the same user.

    Spark has no ASOF keyword; the mapping is equi-join on the user
    key + inequality ``c.ts <= p.ts``, then one max aggregate per
    purchase (argmax-free because only the matched timestamp is
    emitted — ties at the same ts collapse identically in both
    engines). The join stays a hash/SMJ equi-join on user_id with the
    range predicate as a post-join filter; per-user match fan-out is
    bounded by that user's click history, and the aggregate is
    map-side combined. Purchases with no prior click drop (inner
    ASOF).
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    return (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") <= F.col("p_ts")),
        )
        .groupBy("event_id", "user_id", "p_ts")
        .agg(F.max("c_ts").alias("click_ts"))
    )
