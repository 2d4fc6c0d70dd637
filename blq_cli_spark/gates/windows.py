"""Gate queries for the window-function family (SURVEY.md §2.5) and the
sort/limit/offset family (§2.6).

W1 global row_number (run_serial), W2 latest-per-group QUALIFY, lag-based
gap detection (A12), O1-O4 order/limit/offset/order-by-expression.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from blq_cli_spark.gates.registry import gate
from blq_cli_spark.sources.tables import table


@gate(
    "w1_global_serial",
    oracle="""
    SELECT event_id,
           ROW_NUMBER() OVER (ORDER BY ts, event_id) AS serial
    FROM events
    QUALIFY serial <= 100
    """,
)
def w1_global_serial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: global ROW_NUMBER over timestamp — the reference's run_serial
    (bird_schema.sql:288-295). Single-partition window; correctness oracle
    only. At 100 TB the serial is assigned at INGEST (stored column,
    SURVEY.md §4.1) and this window formulation is never executed."""
    w = Window.orderBy("ts", "event_id")
    return (
        table(spark, sf_dir, "events")
        .select("event_id", F.row_number().over(w).alias("serial"))
        .filter(F.col("serial") <= 100)
    )


@gate(
    "w2_latest_per_group",
    oracle="""
    SELECT user_id, event_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def w2_latest_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: latest-per-group QUALIFY pattern (reference
    blq_load_source_status, bird_schema.sql:518-574). Shuffles once on the
    partition key; scales linearly."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        )
    )


@gate(
    "w_lag_gap_stats",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events WHERE event_type = 'error'
    )
    SELECT user_id,
           count(gap_us) AS n_gaps,
           round(avg(gap_us) / 1000000, 3) AS avg_gap_s,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us
    FROM g GROUP BY user_id HAVING count(gap_us) > 0
    """,
)
def w_lag_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12's regression-gap detection via lag() (reference fingerprint
    occurrence stats, src/blq/commands/events.py:585-648)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .withColumn("gap_us", us - F.lag(us).over(w))
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.round(F.avg("gap_us") / 1000000, 3).alias("avg_gap_s"),
            F.max("gap_us").alias("max_gap_us"),
        )
        .filter(F.col("n_gaps") > 0)
    )


@gate(
    "w_topn_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderkey, round(o_totalprice, 2) AS totalprice, rn
    FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rn <= 3
    """,
)
def w_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 variant: top-3 orders per market segment — join + partitioned
    window with unique tie-break."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "c_mktsegment",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rn",
        )
    )


@gate(
    "o2_global_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def o2_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: global order+limit -> TakeOrderedAndProject (distributed top-k
    heap, no full sort). Reference recent-N pattern (bird_schema.sql:592-605)."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


@gate(
    "o3_limit_offset",
    oracle="""
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders
    ORDER BY o_orderdate DESC, o_orderkey DESC
    LIMIT 5 OFFSET 10
    """,
)
def o3_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: LIMIT/OFFSET — the reference's `~N` relative-ref resolution
    (src/blq/services/refs.py:174-195)."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .offset(10)
        .limit(5)
        .select("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"))
    )


@gate(
    "o4_order_by_expression",
    oracle="""
    SELECT n_nationkey, n_name, abs(n_nationkey - 12) AS dist
    FROM nation
    ORDER BY abs(n_nationkey - 12) DESC, n_nationkey
    LIMIT 10
    """,
)
def o4_order_by_expression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: ORDER BY expression (reference ORDER BY ABS(delta) DESC,
    bird_schema.sql:706)."""
    return (
        table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", F.abs(F.col("n_nationkey") - 12).alias("dist"))
        .orderBy(F.desc("dist"), "n_nationkey")
        .limit(10)
    )


@gate(
    "w_cumulative_user_value",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id, event_id,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 4) AS running_total
    FROM events
    WHERE user_id < 50
    """,
)
def w_cumulative_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame (rowsBetween unboundedPreceding..current): per-user
    running total over event time — the only frame spec family not yet
    gated. Partitioned by user_id: parallel across users, ordered within."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        F.col("user_id").cast("long").alias("user_id"),
        "event_id",
        F.round(F.sum("value").over(w), 4).alias("running_total"),
    )


@gate(
    "w_rank_distributions",
    oracle="""
    SELECT o_orderkey,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def w_rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / percent_rank / cume_dist):
    per-customer price quartiles and rank fractions — one keyed window,
    shared sort, deterministic tiebreak on the order key."""
    orders = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )
