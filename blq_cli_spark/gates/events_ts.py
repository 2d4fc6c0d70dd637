"""Gate queries for the time-series / streaming-shaped operator family
(SURVEY.md §2.10 + north-star time-windowed aggregations).

The reference has no true streaming engine; these are the batch-equivalent
semantics of tumbling windows, sessionization, and error-rate-over-time
(docs/schema.md:364-371). The same logic runs under Structured Streaming
by swapping read→readStream (see blq_cli_spark/streaming/)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from blq_cli_spark.gates.registry import gate
from blq_cli_spark.sources.tables import table


@gate(
    "ts_tumbling_window",
    oracle="""
    SELECT strftime(CAST(date_trunc('hour', ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS wstart,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window aggregation via window() — the Structured
    Streaming windowed-agg shape (watermark-ready)."""
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("wstart"),
            "event_type",
            "n",
            "total_value",
        )
    )


@gate(
    "ts_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id,
           CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min inactivity gap starts a new session — lag +
    conditional sum. Streaming equivalent: session_window(ts, '30 minutes')."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    flagged = table(spark, sf_dir, "events").withColumn(
        "new_session",
        F.when(
            ((us - F.lag(us).over(w)) > 1800 * 1000 * 1000) | F.lag(F.col("ts")).over(w).isNull(),
            1,
        ).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )


@gate(
    "ts_error_rate_by_day",
    oracle="""
    SELECT strftime(CAST(date_trunc('day', ts) AS TIMESTAMP), '%Y-%m-%d') AS day,
           count(*) AS n_total,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_errors,
           round(CAST(count(*) FILTER (WHERE event_type = 'error') AS DOUBLE) / count(*), 4) AS error_rate
    FROM events
    GROUP BY 1
    """,
)
def ts_error_rate_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: error-rate-over-time (reference docs/schema.md:364-371)."""
    errors = F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            errors.alias("n_errors"),
            F.round(errors.cast("double") / F.count(F.lit(1)), 4).alias("error_rate"),
        )
    )


@gate(
    "ts_topk_active_users",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_seen
    FROM events
    GROUP BY user_id
    ORDER BY n_events DESC, user_id
    LIMIT 10
    """,
)
def ts_topk_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k entities by activity — recent-N/history pattern
    (bird_schema.sql:624-637)."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
        )
        .orderBy(F.desc("n_events"), "user_id")
        .limit(10)
    )


@gate(
    "x_salted_agg",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(sum(value), 4) AS total,
           round(min(value), 4) AS lo,
           round(max(value), 4) AS hi
    FROM events
    GROUP BY event_type
    """,
)
def x_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-stage aggregation (operators/skew.salted_agg):
    hot grouping keys are split across 16 salt partials, then merged —
    results are identical to a plain GROUP BY (which is the oracle).
    Note sum(value) merges partial doubles in a different order than a
    single-stage sum; rounding to 4 decimals absorbs the ~1e-12 drift."""
    from blq_cli_spark.operators import skew

    ev = table(spark, sf_dir, "events")
    out = skew.salted_agg(
        ev,
        ["event_type"],
        {
            "n": F.count(F.lit(1)),
            "total": F.sum("value"),
            "lo": F.min("value"),
            "hi": F.max("value"),
        },
        salt=16,
    )
    return out.select(
        "event_type",
        "n",
        F.round("total", 4).alias("total"),
        F.round("lo", 4).alias("lo"),
        F.round("hi", 4).alias("hi"),
    )


@gate(
    "x_asof_attribution",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, event_id AS purchase_id
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, ts AS click_ts, max(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT purchase_id, CAST(p.user_id AS BIGINT) AS user_id, click_id,
           CAST(date_diff('second', click_ts, p.ts) AS BIGINT) AS gap_s
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
)
def x_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (last-touch attribution): each purchase matched to the
    user's most recent click at or before it. Spark lacks a native as-of
    join; operators/asof.py runs it as one keyed window over a tagged
    union — one shuffle, no join node (oracle: DuckDB's native ASOF
    LEFT JOIN). Right side deduped to one click per (user, ts) so tie
    handling is deterministic in both engines."""
    from blq_cli_spark.operators.asof import asof_join

    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .withColumn("click_ts", F.col("ts"))
        .select("user_id", "ts", "click_id", "click_ts")
    )
    joined = asof_join(
        purchases, clicks, key_col="user_id", ts_col="ts",
        right_value_cols=["click_id", "click_ts"],
    )
    return joined.select(
        "purchase_id",
        F.col("user_id").cast("long").alias("user_id"),
        "click_id",
        (
            (F.unix_timestamp("ts") - F.unix_timestamp("click_ts")).cast("long")
        ).alias("gap_s"),
    )
