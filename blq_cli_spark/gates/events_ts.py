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


@gate(
    "ts_funnel_conversion",
    oracle="""
    WITH step1 AS (
      SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t1
      FROM events GROUP BY user_id
    ),
    step2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN step1 s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts > s.t1
      GROUP BY e.user_id
    ),
    step3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN step2 s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s.t2
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM step1 WHERE t1 IS NOT NULL) AS n_view,
           (SELECT count(*) FROM step2) AS n_view_click,
           (SELECT count(*) FROM step3) AS n_full_funnel
    """,
)
def ts_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): users whose steps
    occur in strict timestamp order. Three conditional window-mins over
    ONE user partitioning — the shuffle happens once and the second and
    third passes reuse it (contrast the oracle's three joins, which an
    engine without partitioning reuse pays for). At 100 TB this is one
    keyed exchange of (user, type, ts) projections."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    with_t1 = ev.withColumn("t1", t1)
    t2 = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")), F.col("ts"))
    ).over(w)
    with_t2 = with_t1.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")), F.col("ts")
        )
    ).over(w)
    per_user = (
        with_t2.withColumn("t3", t3)
        .groupBy("user_id")
        .agg(F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3"))
    )
    return per_user.agg(
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_view_click"),
        F.count("t3").alias("n_full_funnel"),
    )


@gate(
    "ts_cohort_retention",
    oracle="""
    WITH peru AS (
      SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events
    ),
    firstw AS (SELECT user_id, min(wk) AS cohort FROM peru GROUP BY user_id),
    activity AS (
      SELECT DISTINCT p.user_id, f.cohort, p.wk
      FROM peru p JOIN firstw f ON p.user_id = f.user_id
    )
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', cohort, wk) / 7 AS INTEGER) AS week_offset,
           count(*) AS n_users
    FROM activity GROUP BY 1, 2
    """,
)
def ts_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-seen week,
    counted in each later week they were active — the standard retention
    triangle. First-seen week is a window min over the user partition
    (no self-join); the distinct + grouped count shuffle on small
    derived keys. All week math is date_trunc-aligned so Spark and
    DuckDB agree exactly."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("wk")
    )
    w = Window.partitionBy("user_id")
    act = (
        ev.withColumn("cohort", F.min("wk").over(w))
        .select("user_id", "cohort", "wk")
        .distinct()
    )
    return (
        act.groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("wk", "cohort") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@gate(
    "ts_anomaly_days",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) FILTER (event_type = 'error') AS n_errors
      FROM events GROUP BY 1
    ),
    scored AS (
      SELECT day, n_errors,
             avg(n_errors) OVER w AS mu,
             stddev_samp(n_errors) OVER w AS sigma
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(n_errors AS BIGINT) AS n_errors,
           round((n_errors - mu) / sigma, 4) AS zscore
    FROM scored
    WHERE sigma IS NOT NULL AND sigma > 0
      AND abs((n_errors - mu) / sigma) >= 1.5
    """,
)
def ts_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed anomaly detection: days whose error count deviates >=
    1.5 sigma from the TRAILING 7-day baseline (strictly preceding
    frame, so a spike never suppresses its own alert). The window input
    is the per-day aggregate — tiny at any corpus scale — so the
    ordered frame costs nothing even though the raw events table is
    100 TB; the heavy lifting is one map-side-combinable daily count."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"))
        .agg(F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"))
    )
    w = Window.orderBy("day").rowsBetween(-7, -1)
    scored = daily.select(
        "day",
        "n_errors",
        F.avg("n_errors").over(w).alias("mu"),
        F.stddev_samp("n_errors").over(w).alias("sigma"),
    )
    z = (F.col("n_errors") - F.col("mu")) / F.col("sigma")
    return (
        scored.filter(F.col("sigma").isNotNull() & (F.col("sigma") > 0) & (F.abs(z) >= 1.5))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n_errors").cast("long").alias("n_errors"),
            F.round(z, 4).alias("zscore"),
        )
    )


@gate(
    "ts_error_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events WHERE event_type = 'error'
    ),
    islands AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS island
      FROM days
    ),
    streaks AS (
      SELECT user_id, island, count(*) AS len
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
           count(*) AS n_streaks
    FROM streaks GROUP BY user_id
    """,
)
def ts_error_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's longest run of CONSECUTIVE days
    with at least one error, plus how many distinct streaks. The classic
    island key (day minus row_number-as-days) turns consecutiveness into
    an equality group — one user-keyed window then two keyed aggs, all
    on the distinct (user, day) table which is bounded by users x days
    regardless of raw event volume."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "island", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "island").agg(F.count(F.lit(1)).alias("len"))
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )
