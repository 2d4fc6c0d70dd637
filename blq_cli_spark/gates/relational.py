"""Gate queries for the filter / join / set-op operator families.

Maps SURVEY.md §2.2 (P2/P3/P5/P6/P7 predicate forms), §2.3 (J2 left join +
agg, J4 full-outer diff, J5 anti join, J6/J7 range joins, semi joins),
§2.7 (U1-U3 set ops) onto the driver tables.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from blq_cli_spark.gates.registry import gate
from blq_cli_spark.sources.tables import table

# --- filters (P-family) -----------------------------------------------------


@gate(
    "p_in_and_eq_filter",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderstatus <> 'P'
    GROUP BY o_orderstatus, o_orderpriority
    """,
)
def p_in_and_eq_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 kwargs-DSL forms: IN-list + != (reference filter compiler
    src/blq/query.py:235-296)."""
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH") & (F.col("o_orderstatus") != "P"))
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@gate(
    "p_ilike_pattern",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_retailprice
    FROM part
    WHERE p_name ILIKE '%widget%' AND p_size >= 10
    """,
)
def p_ilike_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 `%pat%` -> ILIKE (reference src/blq/query.py:283) + numeric range."""
    return (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").ilike("%widget%") & (F.col("p_size") >= 10))
        .select("p_partkey", "p_name", "p_brand", "p_retailprice")
    )


@gate(
    "p_exclude_invert",
    oracle="""
    SELECT c_nationkey, count(*) AS n_customers
    FROM customer
    WHERE NOT (c_mktsegment IN ('BUILDING', 'AUTOMOBILE') OR c_acctbal < 0)
    GROUP BY c_nationkey
    """,
)
def p_exclude_invert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 exclude = NOT(cond) (reference src/blq/query.py:298-313) and the
    filter-DSL `-v` inversion (query_cmd.py:253-254)."""
    cond = F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE") | (F.col("c_acctbal") < 0)
    return (
        table(spark, sf_dir, "customer")
        .filter(~cond)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@gate(
    "p_case_insensitive_eq",
    oracle="""
    SELECT count(*) AS n
    FROM documents
    WHERE lower(lang) = lower('EN') AND source LIKE 'src1%'
    """,
)
def p_case_insensitive_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 `-i` case-insensitive equality (reference query_cmd.py:143,164) +
    LIKE prefix (P7)."""
    return (
        table(spark, sf_dir, "documents")
        .filter((F.lower(F.col("lang")) == F.lower(F.lit("EN"))) & F.col("source").like("src1%"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- joins (J-family) -------------------------------------------------------


@gate(
    "j2_left_join_counts",
    oracle="""
    SELECT n_name,
           count(c_custkey)                                       AS n_customers,
           CAST(count(*) FILTER (WHERE c_acctbal > 5000) AS BIGINT) AS n_rich
    FROM nation
    LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def j2_left_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: dimension LEFT JOIN fact + filtered counts, preserving groups with
    zero matches (reference blq_load_runs, bird_schema.sql:433-465).

    Scale form: aggregate the fact FIRST (map-side-combinable groupBy on
    the join key), then LEFT-join the per-key counts onto the dimension
    with the counts side broadcast — the counts table is at most
    |dimension| rows, and broadcasting the RIGHT side of a left join is
    the only legal build side (a broadcast hint on the preserved side is
    ignored with a warning and silently degrades to a shuffle join,
    which is exactly what an earlier revision of this gate did)."""
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    counts = cust.groupBy("c_nationkey").agg(
        F.count("c_custkey").alias("_n_customers"),
        F.sum(F.when(F.col("c_acctbal") > 5000, 1).otherwise(0)).alias("_n_rich"),
    )
    return (
        nation.join(
            F.broadcast(counts), nation.n_nationkey == counts.c_nationkey, "left"
        )
        .select(
            "n_name",
            F.coalesce("_n_customers", F.lit(0).cast("long")).alias("n_customers"),
            F.coalesce("_n_rich", F.lit(0).cast("long")).alias("n_rich"),
        )
    )


@gate(
    "j4_full_outer_diff",
    oracle="""
    WITH d1 AS (
      SELECT event_type, count(*) AS n1 FROM events
      WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-06 00:00:00'
      GROUP BY event_type
    ),
    d2 AS (
      SELECT event_type, count(*) AS n2 FROM events
      WHERE ts >= TIMESTAMP '2024-01-06 00:00:00' AND ts < TIMESTAMP '2024-01-07 00:00:00'
      GROUP BY event_type
    )
    SELECT COALESCE(d1.event_type, d2.event_type) AS event_type,
           COALESCE(n1, 0) AS n1, COALESCE(n2, 0) AS n2,
           COALESCE(n2, 0) - COALESCE(n1, 0) AS delta
    FROM d1 FULL OUTER JOIN d2 ON d1.event_type = d2.event_type
    """,
)
def j4_full_outer_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: run-diff by group = FULL OUTER JOIN + COALESCE + delta
    (reference blq_diff, bird_schema.sql:677-706)."""
    ev = table(spark, sf_dir, "events")

    def day(d0: str, d1: str, alias: str) -> DataFrame:
        return (
            ev.filter(
                (F.col("ts") >= F.lit(d0).cast("timestamp"))
                & (F.col("ts") < F.lit(d1).cast("timestamp"))
            )
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    d1 = day("2024-01-05 00:00:00", "2024-01-06 00:00:00", "n1")
    d2 = day("2024-01-06 00:00:00", "2024-01-07 00:00:00", "n2")
    joined = d1.join(d2, "event_type", "full_outer")
    return joined.select(
        F.col("event_type"),
        F.coalesce("n1", F.lit(0)).alias("n1"),
        F.coalesce("n2", F.lit(0)).alias("n2"),
        (F.coalesce("n2", F.lit(0)) - F.coalesce("n1", F.lit(0))).alias("delta"),
    )


@gate(
    "j5_anti_join",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j5_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/J8: anti join — customers with no orders (reference blq_running
    NOT EXISTS, bird_schema.sql:640-652; fingerprint 'new' set, J8)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@gate(
    "j_semi_join",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
    )
    """,
)
def j_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3-style semi join: suppliers with at least one near-max-quantity item
    (reference 'unchanged fingerprints' intersection, services/query.py:397)."""
    supp = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return supp.join(li, supp.s_suppkey == li.l_suppkey, "left_semi").select("s_suppkey", "s_name")


@gate(
    "j7_range_join_buckets",
    oracle="""
    WITH buckets(lo, hi, label) AS (
      VALUES (0.0, 50000.0, 'small'), (50000.0, 200000.0, 'medium'),
             (200000.0, 100000000.0, 'large')
    )
    SELECT label, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders JOIN buckets ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY label
    """,
)
def j7_range_join_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: non-equi interval join against a tiny in-memory ranges table
    (reference mark-range join, bird_schema.sql:797-808). Compiles to
    BroadcastNestedLoopJoin — correct choice because one side is tiny."""
    orders = table(spark, sf_dir, "orders")
    buckets = spark.createDataFrame(
        [(0.0, 50000.0, "small"), (50000.0, 200000.0, "medium"), (200000.0, 100000000.0, "large")],
        "lo double, hi double, label string",
    )
    return (
        orders.join(
            F.broadcast(buckets),
            (orders.o_totalprice >= buckets.lo) & (orders.o_totalprice < buckets.hi),
        )
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


# --- set ops (U-family) -----------------------------------------------------


@gate(
    "u1_union_all",
    oracle="""
    SELECT 'urgent' AS bucket, o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000
    UNION ALL
    SELECT 'low' AS bucket, o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders WHERE o_orderpriority = '5-LOW' AND o_totalprice > 300000
    """,
)
def u1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: UNION ALL of two tagged selects (reference completed∪pending,
    bird_schema.sql:519-556). unionByName guards column-order drift."""
    orders = table(spark, sf_dir, "orders")

    def side(prio: str, tag: str) -> DataFrame:
        return (
            orders.filter((F.col("o_orderpriority") == prio) & (F.col("o_totalprice") > 300000))
            .select(
                F.lit(tag).alias("bucket"),
                "o_orderkey",
                F.round("o_totalprice", 2).alias("totalprice"),
            )
        )

    return side("1-URGENT", "urgent").unionByName(side("5-LOW", "low"))


@gate(
    "u2_except_distinct",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def u2_except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: set difference — customers active in 1995 but not 1996
    (reference fixed-fingerprints set algebra, services/query.py:392-397)."""
    orders = table(spark, sf_dir, "orders")

    def year(y: int) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01 00:00:00").cast("timestamp"))
        ).select("o_custkey")

    return year(1995).subtract(year(1996))


@gate(
    "u3_intersect",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def u3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: intersection — customers active in both years (reference
    'unchanged' fingerprints, services/query.py:397)."""
    orders = table(spark, sf_dir, "orders")

    def year(y: int) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01 00:00:00").cast("timestamp"))
        ).select("o_custkey")

    return year(1995).intersect(year(1996))
