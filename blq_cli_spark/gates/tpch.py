"""Core relational gate queries (joins + aggregations) over the driver's
TPC-H-ish star schema.

These exercise SURVEY.md §2 operators J1/J2 (equi-joins, broadcast dims),
A1-A7 (grouped/filtered aggs), O1/O2 (top-k), P2/P10 (predicates that must
push down to the parquet scan).

Scale notes (100 TB): every join here either broadcasts the dimension side
(region/nation/customer at TPC-H ratios) or shuffles on the join key with
AQE handling skew; aggregations are partial (map-side combine) by
construction since we use built-in hash aggregates. Filters on scan columns
push to the parquet reader (verify: PushedFilters in .explain).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from blq_cli_spark.gates.registry import gate
from blq_cli_spark.sources.tables import table


@gate(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 2)                                        AS avg_qty,
           round(avg(l_extendedprice), 2)                                   AS avg_price,
           round(avg(l_discount), 2)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: scan-filter-aggregate, the map-side
    combine showcase (reference grouped-agg surface: src/blq/query.py:460-534)."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@gate(
    "q3_top_unshipped_orders",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '2000-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '2000-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: selective dim filter -> join -> grouped top-k.

    customer is the small side at TPC-H ratios -> broadcast it; the
    orders⋈lineitem join shuffles on the order key. Top-k compiles to
    TakeOrderedAndProject (distributed heap, no global sort)."""
    cutoff = F.lit("2000-03-15 00:00:00").cast("timestamp")
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@gate(
    "q5_region_revenue",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped multi-join: region/nation broadcast (tiny dims), the
    fact-side joins shuffle on their keys; the c_nationkey=s_nationkey
    residual rides on the supplier join."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@gate(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped pure scan-filter-agg; every predicate is
    parquet-pushable (P2/P10 in SURVEY.md §2.2)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.02, 0.06))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@gate(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           n_name, c_mktsegment
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name, c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped: join fact to customers + nation, top-20 by grouped
    revenue (reference by-file/by-fingerprint top-10 summaries, A13)."""
    lo = F.lit("1996-10-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_mktsegment")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name", "c_mktsegment")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@gate(
    "q4_priority_semi",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    GROUP BY o_orderpriority
    """,
)
def q4_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped: EXISTS semi-join then grouped count — orders with
    at least one lineitem shipped >90 days after ordering, by priority.
    left_semi keeps orders single-copy (no fan-out, no distinct needed);
    the join shuffles on orderkey, the count is map-side combinable."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@gate(
    "q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 280
    )
    SELECT o.o_orderkey, CAST(o.o_custkey AS BIGINT) AS custkey,
           round(o.o_totalprice, 2) AS totalprice, big.total_qty
    FROM big JOIN orders o ON o.o_orderkey = big.l_orderkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped: aggregate-then-join top-k. The HAVING filter
    runs on the aggregated (small) side BEFORE the join — at 100 TB the
    join input shrinks from |lineitem| to |qualifying orders|; top-k is
    TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 280)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .select(
            "o_orderkey",
            F.col("o_custkey").cast("long").alias("custkey"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(20)
    )


@gate(
    "q7_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                           AND TIMESTAMP '1996-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped bilateral shipping volume: the two-role dimension
    pattern — nation joins in TWICE (supplier side and customer side),
    both broadcast; the disjunctive nation-pair filter runs after both
    dims attach. Fact joins shuffle on their keys; year extraction +
    grouped sum are codegen'd. At 100 TB the only big shuffles are
    lineitem⋈orders and orders⋈customer — both key-partitioned."""
    n = table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1995-01-01 00:00:00", "1996-12-31 00:00:00")
    )
    joined = (
        table(spark, sf_dir, "supplier")
        .join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(table(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(table(spark, sf_dir, "customer"), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
    )


@gate(
    "q12_priority_by_status",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped conditional-count pivot: one equi-join keyed on
    orderkey, then CASE-WHEN counts inside a single grouped aggregate —
    two logical metrics, one shuffle. The shipdate range filter pushes
    to the lineitem scan, shrinking the join's build input first."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@gate(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promo share: join to the part dimension, then a
    ratio of two conditional sums in ONE aggregate pass (no second scan,
    no self-join). The month filter cuts lineitem before the join; part
    joins key-partitioned (it grows with SF, so it is not assumed
    broadcastable — AQE may still elect broadcast at small SF)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(table(spark, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
                / F.sum(disc),
                4,
            ).alias("promo_revenue")
        )
    )


@gate(
    "q19_brand_size_quantity",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_brand_size_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive predicate join: OR-of-ANDs mixing
    columns from BOTH sides. Catalyst extracts the common single-side
    conjuncts (p_size <= 35, l_quantity <= 30, the brand IN-set) and
    pushes them below the join as scan filters, leaving only the cross-
    side residual on the join — the predicate-decomposition pattern that
    keeps a 100 TB scan from feeding unfilterable rows into the shuffle."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#2") & s.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#3") & s.between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@gate(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped scalar-subquery-max: aggregate per-supplier
    revenue, keep the row(s) equal to the GLOBAL max.

    Form choice matters at 100 TB: the naive scalar-subquery
    (`revenue.agg(max)` joined back) makes Catalyst expand the revenue
    pipeline TWICE — two full lineitem scans, no exchange reuse
    (verified in test_plan_quality). Instead the max rides a global
    window over the ALREADY-AGGREGATED revenue table: its input is
    supplier-cardinality (6000x smaller than lineitem at TPC-H ratios),
    so the single-partition window costs MBs while the fact table is
    scanned exactly once."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    from pyspark.sql import Window

    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    mx = F.max("total_revenue").over(Window.partitionBy())
    return (
        revenue.withColumn("_mx", mx)
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(
            F.broadcast(table(spark, sf_dir, "supplier")),
            F.col("s_suppkey") == F.col("supplier_no"),
        )
        .select("s_suppkey", "s_name", F.round("total_revenue", 2).alias("total_revenue"))
    )


@gate(
    "q22_dormant_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped: global-scalar-average filter + ANTI join —
    above-average-balance customers with no RECENT order (dormant),
    counted per nation. The average is a broadcast one-row aggregate;
    the anti join shuffles on custkey and keeps customers single-copy
    (no fan-out). The recency predicate pushes to the orders scan, so
    at 100 TB the anti join's build side is only the recent slice
    pre-projected to the join key."""
    cust = table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("_a")
    )
    orders_keys = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("_a"))
        .join(orders_keys, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@gate(
    "q8_market_share",
    oracle="""
    WITH all_nations AS (
      SELECT strftime(o_orderdate, '%Y')                     AS o_year,
             l_extendedprice * (1 - l_discount)              AS volume,
             n2.n_name                                       AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey  = l_partkey
      JOIN supplier ON s_suppkey  = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
      JOIN nation n1 ON c_nationkey  = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey  = n2.n_nationkey
      WHERE r_name = 'AMERICA'
        AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped national market share: the deepest join tree in the
    suite (lineitem ⋈ part ⋈ supplier ⋈ orders ⋈ customer ⋈ nation×2 ⋈
    region) with a conditional-ratio aggregate on top.

    100 TB shape: every dimension (part-filtered, supplier, customer,
    nation both roles, region) broadcasts; the only shuffles are the
    lineitem⋈orders equi-join and the final tiny per-year aggregate.
    The selective p_type filter lands on the part scan BEFORE its
    broadcast, so the fact table is pruned by the smallest dim first.
    (Reference join surface: src/blq/bird_schema.sql:357-359, diff/ratio
    aggregation pattern: src/blq/schema.sql:261-283.)"""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .select(
            F.date_format("o_orderdate", "yyyy").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@gate(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT OUTER JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped order-count distribution: LEFT OUTER join with a
    predicate ON THE JOIN (not a filter — customers with zero qualifying
    orders must survive with count 0), then a second aggregation over the
    first's result (histogram of counts).

    100 TB shape: orders pre-filters and pre-projects to o_custkey before
    the join; count(o_orderkey) counts non-null matches only. The first
    agg shuffles on custkey; the histogram input is customer-cardinality
    and re-aggregates map-side to ~100 distinct counts. (Reference
    left-join+agg surface: src/blq/bird_schema.sql:433-465.)"""
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@gate(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND p_size < 10
      AND l_quantity < (
        SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = part.p_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped correlated scalar subquery (per-part average):
    revenue from orders of less than 20% of a part's average quantity.

    The correlated `avg per partkey` decorrelates to a WINDOW average
    over the part key instead of a grouped-agg-plus-join-back: the
    naive decorrelation scans lineitem twice (once raw, once for the
    avg — the two subtrees differ, so no exchange reuse), while the
    window form scans it ONCE and shuffles the brand-filtered slice
    once on l_partkey (per-part groups are bounded — one part's
    lineitems — so the window state is tiny at any corpus size). The
    brand/size filter prunes part BEFORE broadcast; at 100 TB the agg
    input is a 1/25-brand slice, not the whole fact table.
    (Correlated-subquery surface in the reference: suppression
    subselects, src/blq/services/query.py:299-302; single-scan
    precedent: q15 above.)"""
    from pyspark.sql import Window

    part = (
        table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#3") & (F.col("p_size") < 10))
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # per-part avg over ALL lineitems of the surviving parts (the
    # correlated subquery ranges over lineitem unfiltered by quantity)
    slice_li = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).drop(
        "p_partkey"
    )
    cap = (F.avg("l_quantity").over(Window.partitionBy("l_partkey")) * 0.2).alias(
        "_qty_cap"
    )
    return (
        slice_li.withColumn("_qty_cap", cap)
        .filter(F.col("l_quantity") < F.col("_qty_cap"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@gate(
    "q21_waiting_suppliers",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL 365 DAY
    )
    SELECT s_name, count(*) AS numwait
    FROM late l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_2'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  JOIN orders o2 ON o2.o_orderkey = l2.l_orderkey
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND o2.o_orderstatus = 'F'
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped "suppliers who kept orders waiting": for finished
    orders, suppliers from one nation who were the ONLY late supplier on
    a multi-supplier order. (Adapted lateness predicate — this schema has
    no commit/receipt dates, so late = shipped >365 days after the order
    date.)

    100 TB form choice: the textbook EXISTS/NOT-EXISTS pair compiles to
    a semi join + anti join with non-equi residuals — three shuffles of
    the fact table. Instead the per-order supplier sets ride ONE window
    over the order key (distinct-supplier count and distinct-LATE-
    supplier count as collect_set sizes — suppliers-per-order is bounded
    by the order's line count, so the set state is tiny at any corpus
    size): one lineitem scan, one fact shuffle, no fan-out. A qualifying
    row is a late line in a multi-supplier order whose late-supplier
    set is exactly {itself}. The oracle proves the window form equals
    the EXISTS form."""
    from pyspark.sql import Window

    orders_f = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    w = Window.partitionBy("l_orderkey")
    rows = (
        li.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "_late",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAY")
            ).cast("int"),
        )
        .withColumn("_n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "_n_late",
            F.size(
                F.collect_set(F.when(F.col("_late") == 1, F.col("l_suppkey"))).over(w)
            ),
        )
    )
    lone_late = rows.filter(
        (F.col("_late") == 1) & (F.col("_n_supp") > 1) & (F.col("_n_late") == 1)
    ).select("l_orderkey", "l_suppkey")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    return (
        lone_late.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )

@gate(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             round(min(l_extendedprice / l_quantity), 4) AS supplycost
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supplycost
    FROM (
      SELECT c.suppkey, c.supplycost, s_acctbal, s_name, n_name,
             p_partkey, p_name,
             min(supplycost) OVER (PARTITION BY partkey) AS best
      FROM cost c
      JOIN part     ON p_partkey = partkey
      JOIN supplier ON s_suppkey = suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE p_size = 15 AND p_type = 'PROMO' AND r_name = 'AMERICA'
    )
    WHERE supplycost = best
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 10
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped minimum-cost supplier per part. (Adapted: this
    schema has no partsupp table, so the part↔supplier cost relation is
    derived from lineitem — supply cost = the minimum observed unit price
    per (part, supplier) pair; region scoping rides supplier→nation→
    region as in the original.)

    100 TB form choice: the original's correlated MIN subquery over the
    region-scoped partsupp decorrelates to a WINDOW min over the part key
    on the already-joined slice — one scan, no join-back (q15/q17
    precedent). The selective part filter (one size × one type) joins the
    fact table BEFORE the per-pair aggregation, so at scale the groupBy
    sees a thousandth of lineitem, not all of it; every dimension
    broadcasts. (Reference min-per-group surface: latest-run resolution,
    src/blq/services/query.py:167-189.)"""
    from pyspark.sql import Window

    part = (
        table(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "PROMO"))
        .select("p_partkey", "p_name")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    cost = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey", "p_name")
        .agg(
            F.round(
                F.min(F.col("l_extendedprice") / F.col("l_quantity")), 4
            ).alias("supplycost")
        )
    )
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    best = F.min("supplycost").over(Window.partitionBy("l_partkey"))
    return (
        cost.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .withColumn("_best", best)
        .filter(F.col("supplycost") == F.col("_best"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            "supplycost",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(10)
    )


@gate(
    "q9_product_type_profit",
    oracle="""
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
      SELECT n_name AS nation, strftime(o_orderdate, '%Y') AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.6 * p_retailprice * l_quantity AS amount
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped product-type profit by nation and year. (Adapted:
    no partsupp → cost side of the profit expression uses the part's
    retail price, `0.6 * p_retailprice * l_quantity`, in place of
    `ps_supplycost * l_quantity`; the name-substring part filter, the
    five-way join, and the nation×year rollup are the original shape.)

    100 TB shape: part (name-filtered), supplier, and nation broadcast;
    orders⋈lineitem is the one fact-fact shuffle; the final agg is tiny
    (25 nations × 7 years). The `%red%` substring filter cannot push to
    a parquet row-group but DOES prune part before its broadcast, so the
    fact slice is cut by the broadcast hash join's build side — the same
    plan a column-pruned partsupp variant would produce. (Reference
    multi-join rollup surface: src/blq/bird_schema.sql:357-366.)"""
    li = table(spark, sf_dir, "lineitem")
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.6) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.date_format("o_orderdate", "yyyy").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@gate(
    "q11_important_stock",
    oracle="""
    WITH value AS (
      SELECT l_partkey AS partkey,
             round(sum(l_quantity * p_retailprice), 2) AS val
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT partkey, val
    FROM (SELECT partkey, val, sum(val) OVER () AS total FROM value)
    WHERE val > total * 0.002
    ORDER BY val DESC, partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped "important stock" value concentration: per-part
    flow value for one nation's suppliers, keeping parts whose value
    exceeds a fixed fraction of the nation's total. (Adapted: no
    partsupp → value = sum over lineitem of quantity × part retail
    price; the scalar-subquery-threshold shape is the original.)

    100 TB form choice: the original's scalar subquery (`> SELECT
    sum(...) * fraction`) would scan and aggregate the fact slice TWICE
    — the window-over-empty-frame form (`sum(val) OVER ()`) computes the
    global total on the ALREADY-AGGREGATED per-part table (bounded by
    |part|, not |lineitem|), so the fact is scanned once (q15
    precedent, asserted there in test_plan_quality). The single-
    partition window is safe because its input is dimension-sized."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    val = (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.round(F.sum(F.col("l_quantity") * F.col("p_retailprice")), 2).alias(
                "val"
            )
        )
    )
    total = F.sum("val").over(Window.partitionBy())
    return (
        val.withColumn("_total", total)
        .filter(F.col("val") > F.col("_total") * 0.002)
        .select("partkey", "val")
        .orderBy(F.desc("val"), "partkey")
    )


@gate(
    "q16_supplier_relationship",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#9'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped supplier-relationship count: distinct suppliers
    per (brand, type, size) bucket, excluding one brand, a type prefix,
    and a denylisted supplier set. (Adapted: the part↔supplier relation
    comes from lineitem instead of partsupp, and the "complaints"
    denylist is suppliers with negative account balance — the reference
    schema carries no comment text.)

    100 TB shape: the denylist NOT IN compiles to a broadcast
    LEFT-ANTI join (keys are non-null by construction, so anti ≡ NOT
    IN); part prunes on brand/type/size BEFORE its broadcast; the only
    fact shuffle is the partial_agg→distinct-count exchange on the
    grouped keys. count(DISTINCT) goes through Spark's two-phase
    expand/agg, which partial-aggregates map-side. (Reference
    suppression-denylist surface: src/blq/services/query.py:299-302.)"""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    bad_supp = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@gate(
    "q20_promotion_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey AS suppkey, l_partkey AS partkey,
             sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                       AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
                      THEN l_quantity ELSE 0 END) AS qty_1997,
             sum(l_quantity) AS qty_all
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
      GROUP BY l_suppkey, l_partkey
    )
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_5'
      AND s_suppkey IN (SELECT suppkey FROM shipped
                        WHERE qty_1997 > 0.3 * qty_all)
    ORDER BY s_name
    """,
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped "who can promote this part line": suppliers in
    one nation whose 1997 shipments of prefix-named parts dominate their
    all-time shipments of that part. (Adapted: no partsupp.ps_availqty →
    the original's `availqty > 0.5 × shipped` correlated threshold
    becomes `1997 shipped > 0.3 × all-time shipped` — still a correlated
    comparison of two aggregates over the same group.)

    100 TB form choice: the original nests IN(IN(correlated-scalar)) —
    the textbook plan re-scans lineitem for every (part, supplier)
    group. Here BOTH aggregates ride one conditional-sum pass
    (`sum(CASE WHEN in-window)` vs `sum(*)`) over the prefix-pruned
    slice: one scan, one shuffle on the group key, then a broadcast
    SEMI join into the supplier dimension. The `small%` prefix filter
    prunes part before its broadcast. (Reference semi-join surface:
    running-commands filter, src/blq/services/query.py:210-231.)"""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    in_1997 = (
        F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    qualified = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in_1997, F.col("l_quantity")).otherwise(0.0)).alias(
                "qty_1997"
            ),
            F.sum("l_quantity").alias("qty_all"),
        )
        .filter(F.col("qty_1997") > F.col("qty_all") * 0.3)
        .select("l_suppkey")
        .distinct()
    )
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(qualified),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
