"""Gate queries for the scalar-function surface (SURVEY.md §2.8).

F1 substring/concat, F2 split_part, F3 LIKE/LOWER, F4 regex match, F7 CASE
ladders, F8-F11 date/time arithmetic, F12 ABS, F13 COALESCE, F16 to_json,
F17 JSON path access, F20/F21 content hashing / fingerprints.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from blq_cli_spark.gates.registry import gate
from blq_cli_spark.sources.tables import table


@gate(
    "f_string_suite",
    oracle="""
    SELECT doc_id,
           substr(text, 1, 40)                       AS head40,
           upper(lang)                               AS lang_uc,
           source || ':' || lang                     AS src_lang,
           length(text)                              AS n_len,
           split_part(source, 'c', 2)                AS src_num,
           CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END AS mentions_spark,
           md5(text)                                 AS content_hash
    FROM documents
    WHERE doc_id < 100
    """,
)
def f_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F3/F7/F20: substring, concat ||, upper/lower, split_part, CASE,
    md5 content hash (reference display refs bird_schema.sql:304-312;
    content addressing bird.py:1304-1360 — hash parity not required, md5
    used as the portable opaque key)."""
    return (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.substring("text", 1, 40).alias("head40"),
            F.upper("lang").alias("lang_uc"),
            F.concat_ws(":", "source", "lang").alias("src_lang"),
            F.length("text").alias("n_len"),
            F.split_part(F.col("source"), F.lit("c"), F.lit(2)).alias("src_num"),
            F.when(F.col("text").like("%spark%"), 1).otherwise(0).alias("mentions_spark"),
            F.md5("text").alias("content_hash"),
        )
    )


@gate(
    "f_datetime_suite",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S')                       AS ts_s,
           CAST(strftime(ts, '%Y') AS INTEGER)                     AS y,
           CAST(strftime(ts, '%m') AS INTEGER)                     AS mo,
           CAST(strftime(ts, '%d') AS INTEGER)                     AS d,
           CAST(strftime(ts, '%H') AS INTEGER)                     AS h,
           epoch_us(ts)                                            AS e_us,
           strftime(ts + INTERVAL 1 DAY, '%Y-%m-%d %H:%M:%S')      AS ts_plus_1d,
           strftime(CAST(date_trunc('hour', ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_hour
    FROM events
    WHERE user_id <= 3
    """,
)
def f_datetime_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8/F9/F10: timestamp parts, epoch micros, interval arithmetic,
    date_trunc (reference age/elapsed math, bird_schema.sql:509-513, F10
    completed_at reconstruction :319)."""
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id") <= 3)
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            F.year("ts").alias("y"),
            F.month("ts").alias("mo"),
            F.dayofmonth("ts").alias("d"),
            F.hour("ts").alias("h"),
            F.unix_micros(F.col("ts")).alias("e_us"),
            F.date_format(F.col("ts") + F.expr("INTERVAL 1 DAY"), "yyyy-MM-dd HH:mm:ss").alias(
                "ts_plus_1d"
            ),
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("ts_hour"),
        )
    )


@gate(
    "f_case_coalesce",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'finished' ELSE 'pending' END AS status_label,
           CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END AS size_bucket,
           COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'unspecified') AS priority
    FROM orders
    WHERE o_orderkey <= 500
    """,
)
def f_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/F13: CASE ladders + COALESCE/NULLIF (reference status badge
    bird_schema.sql:423-430, status CASE :399-404)."""
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderstatus") == "O", "open")
            .when(F.col("o_orderstatus") == "F", "finished")
            .otherwise("pending")
            .alias("status_label"),
            F.when(F.col("o_totalprice") < 50000, "small")
            .when(F.col("o_totalprice") < 200000, "medium")
            .otherwise("large")
            .alias("size_bucket"),
            F.coalesce(
                F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")), F.lit("unspecified")
            ).alias("priority"),
        )
    )


@gate(
    "f_json_extract",
    oracle="""
    SELECT CAST(props->>'$.k' AS INTEGER) % 10 AS k_mod,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def f_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17: JSON path access on an open-ended metadata column (reference
    extension_data->'sandbox'->>'network', bird_schema.sql:866-883)."""
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        table(spark, sf_dir, "events")
        .groupBy((k % 10).alias("k_mod"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@gate(
    "f_regexp_grep",
    oracle="""
    SELECT doc_id,
           regexp_matches(text, '(?i)(spark|stream)')          AS has_kw,
           len(regexp_extract_all(text, 'data'))               AS n_data,
           regexp_extract(text, '([a-z]+) (join|merge)', 1)    AS word_before_join
    FROM documents
    WHERE doc_id < 50
    """,
)
def f_regexp_grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F5: regex match / extract / extract_all (reference log grep
    bird_schema.sql:833-838, partition extraction schema.sql:45-46)."""
    return (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.col("text").rlike("(?i)(spark|stream)").alias("has_kw"),
            F.size(F.regexp_extract_all(F.col("text"), F.lit("data"), 0)).alias("n_data"),
            F.regexp_extract(F.col("text"), "([a-z]+) (join|merge)", 1).alias("word_before_join"),
        )
    )


@gate(
    "f_struct_json",
    oracle="""
    SELECT n_name,
           to_json(struct_pack(nationkey := n_nationkey, regionkey := n_regionkey)) AS info_json
    FROM nation
    WHERE n_regionkey <= 2
    """,
)
def f_struct_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14/F16: struct literal -> JSON (reference parsed-ref struct
    bird_schema.sql:717-720; to_json(list(struct)) :748-768)."""
    return (
        table(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") <= 2)
        .select(
            "n_name",
            F.to_json(
                F.struct(
                    F.col("n_nationkey").alias("nationkey"),
                    F.col("n_regionkey").alias("regionkey"),
                )
            ).alias("info_json"),
        )
    )
