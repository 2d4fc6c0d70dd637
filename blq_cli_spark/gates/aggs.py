"""Gate queries for the aggregation operator family (SURVEY.md §2.4).

A1 grouped count, A2 filtered count, A3 filtered distinct count, A4
min/max/sum/avg, A5 named agg expressions, A6 value_counts/top-k, A7
HAVING, A9 first/any_value, A10 list-agg -> JSON, A11 global scalars.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from blq_cli_spark.gates.registry import gate
from blq_cli_spark.sources.tables import table


@gate(
    "a6_value_counts",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY n DESC, event_type
    """,
)
def a6_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: value_counts — the reference's `.aggregate(col, COUNT(*))`
    (src/blq/query.py:471-484)."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "event_type")
    )


@gate(
    "a2_filtered_counts",
    oracle="""
    SELECT user_id,
           count(*) AS total,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)    AS errors,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchases,
           round(sum(value) FILTER (WHERE event_type = 'purchase'), 2)     AS purchase_value
    FROM events
    GROUP BY user_id
    """,
)
def a2_filtered_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: COUNT(*) FILTER (WHERE ...) per group — the error/warning counts
    pattern of blq_load_runs (bird_schema.sql:454-457)."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("errors"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("purchases"),
            F.round(F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))), 2).alias(
                "purchase_value"
            ),
        )
    )


@gate(
    "a3_filtered_distinct_count",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT user_id) FILTER (WHERE value > 50) AS BIGINT) AS n_users_highvalue
    FROM events
    GROUP BY event_type
    """,
)
def a3_filtered_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: filtered COUNT(DISTINCT ...) — unique-error counts
    (bird_schema.sql:458-459). At 100 TB swap to approx_count_distinct."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct(F.when(F.col("value") > 50, F.col("user_id"))).alias(
                "n_users_highvalue"
            ),
        )
    )


@gate(
    "a4_minmax_stats",
    oracle="""
    SELECT o_orderstatus,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price,
           round(avg(o_totalprice), 2) AS avg_price,
           strftime(min(o_orderdate), '%Y-%m-%d') AS first_order,
           strftime(max(o_orderdate), '%Y-%m-%d') AS last_order
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def a4_minmax_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: grouped MIN/MAX/AVG incl. timestamp min/max (reference run
    roll-up, src/blq/schema.sql:61-77)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_order"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_order"),
        )
    )


@gate(
    "a7_having",
    oracle="""
    SELECT p_brand, count(*) AS n, round(avg(p_retailprice), 2) AS avg_price
    FROM part
    GROUP BY p_brand
    HAVING count(*) >= 80 AND avg(p_retailprice) > 1000
    """,
)
def a7_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: GROUP BY + HAVING (reference blq_summary, schema.sql:193-203).
    HAVING = filter-after-agg in the DataFrame algebra."""
    return (
        table(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("p_retailprice"), 2).alias("avg_price"))
        .filter((F.col("n") >= 80) & (F.col("avg_price") > 1000))
    )


@gate(
    "a10_collect_json",
    oracle="""
    SELECT c_mktsegment,
           to_json(list_sort(list(DISTINCT c_nationkey))) AS nations_json,
           count(*) AS n
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def a10_collect_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: list aggregation serialized to JSON (reference
    to_json(list(struct ...)), bird_schema.sql:748-768). The list is sorted
    in both engines — collect order is nondeterministic by design."""
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.to_json(F.sort_array(F.collect_set("c_nationkey"))).alias("nations_json"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@gate(
    "a11_global_scalars",
    oracle="""
    SELECT count(*) AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           round(sum(o_totalprice), 2) AS total_value,
           round(COALESCE(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'X'), 0), 2) AS missing_total,
           CAST(max(o_orderkey) AS BIGINT) AS max_orderkey
    FROM orders
    """,
)
def a11_global_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: global scalar aggregates with COALESCE-to-zero null handling
    (reference storage counters, src/blq/storage.py:245-252,724-731)."""
    return table(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        F.round(
            F.coalesce(F.sum(F.when(F.col("o_orderstatus") == "X", F.col("o_totalprice"))), F.lit(0.0)),
            2,
        ).alias("missing_total"),
        F.max("o_orderkey").alias("max_orderkey"),
    )


@gate(
    "a13_top10_by_group",
    oracle="""
    SELECT lang, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang, source
    ORDER BY n_docs DESC, lang, source
    LIMIT 10
    """,
)
def a13_top10_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: by-group top-10 summary (reference by-file/by-fingerprint
    summaries, serve.py:1502-1545)."""
    return (
        table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy(F.desc("n_docs"), "lang", "source")
        .limit(10)
    )


@gate(
    "a_rollup_hierarchy",
    oracle="""
    SELECT event_type,
           CAST(user_id % 10 AS BIGINT) AS user_bucket,
           count(*) AS n,
           round(sum(value), 4) AS total,
           CAST(grouping(event_type) * 2 + grouping(user_id % 10) AS BIGINT) AS gid
    FROM events
    GROUP BY ROLLUP (event_type, user_id % 10)
    """,
)
def a_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP (event_type -> user bucket -> grand total) in
    one pass — Spark executes the grouping-sets expansion with partial
    aggregation per level, no extra scans (vs running three GROUP BYs).
    grouping_id disambiguates rolled-up NULLs from data NULLs."""
    ev = table(spark, sf_dir, "events").withColumn(
        "user_bucket", (F.col("user_id") % 10).cast("long")
    )
    return (
        ev.rollup("event_type", "user_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .select("event_type", "user_bucket", "n", "total", "gid")
    )


@gate(
    "a_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events
    GROUP BY event_type
    """,
)
def a_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped exact percentiles (p50/p95/p99 of event value) — the
    duration-latency summary every log store needs. Exact percentile
    matches DuckDB's quantile_cont (linear interpolation); at 100 TB
    swap in approx_percentile, which is one pass + mergeable sketches
    instead of a per-group sort."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )
