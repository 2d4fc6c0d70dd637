"""Gate queries for the context/line operators (W4/F23/F15/J6) plus the
query-surface patterns P9 (default-to-latest), A8 (GROUP BY ALL), O6
(count-before-limit).

The documents table stands in for raw output: each word is a "line" —
giving the same (id, line_number, line) relation shape the reference's
parse_lines produces (bird_schema.sql:797-850).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from blq_cli_spark.gates.registry import gate
from blq_cli_spark.operators import context as ctx_ops
from blq_cli_spark.sources.tables import table


def _doc_lines(spark: SparkSession, sf_dir: str, max_doc: int) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < max_doc)
    return ctx_ops.text_to_lines(docs, id_col="doc_id", text_col="text", sep=" ")


_LINES_SQL = """
    tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id < {max_doc}),
    lines AS (
      SELECT doc_id AS id, i AS line_number, t[i] AS line
      FROM tok, unnest(range(1, len(t) + 1)) AS u(i)
    )
"""


@gate(
    "w4_grep_context",
    oracle=f"""
    WITH {_LINES_SQL.format(max_doc=100)},
    matches AS (
      SELECT id, line_number FROM lines WHERE regexp_matches(line, '(?i)^join$')
    )
    SELECT l.id, l.line_number, l.line,
           regexp_matches(l.line, '(?i)^join$') AS is_match
    FROM lines l
    WHERE EXISTS (
      SELECT 1 FROM matches m
      WHERE m.id = l.id AND l.line_number BETWEEN m.line_number - 2 AND m.line_number + 2
    )
    """,
)
def w4_grep_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grep-with-context: the oracle uses the reference's J6 range
    semi-join form (bird_schema.sql:840-850); the Spark side uses the W4
    window form (max(is_match) over rowsBetween(-ctx,+ctx)) — one shuffle,
    no nested loop — proving the two formulations equivalent."""
    lines = _doc_lines(spark, sf_dir, 100)
    return ctx_ops.grep_with_context(lines, "^join$", ctx=2, ignore_case=True)


@gate(
    "f23_linespec_selection",
    oracle=f"""
    WITH {_LINES_SQL.format(max_doc=20)}
    SELECT id, line_number, line FROM lines
    WHERE line_number BETWEEN 2 AND 4
       OR line_number BETWEEN 8 AND 10
       OR line_number = 15
    """,
)
def f23_linespec_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-spec selection "3 +/-1, 8-10, 15" compiled to a predicate
    (reference parse_lines spec grammar, serve.py:1385-1400)."""
    lines = _doc_lines(spark, sf_dir, 20)
    return ctx_ops.select_lines(lines, "3 +/-1, 8-10, 15")


@gate(
    "f15_explode_token_counts",
    oracle=f"""
    WITH {_LINES_SQL.format(max_doc=1000000)}
    SELECT line AS token, count(*) AS n
    FROM lines GROUP BY line
    ORDER BY n DESC, token
    LIMIT 20
    """,
)
def f15_explode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15 unnest/explode: top-20 token frequencies across the corpus
    (reference unnest(list-of-struct), bird_schema.sql:797-800)."""
    lines = _doc_lines(spark, sf_dir, 1000000)
    return (
        lines.groupBy(F.col("line").alias("token"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )


@gate(
    "p9_default_to_latest",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM events
    WHERE date_trunc('day', ts) = (SELECT max(date_trunc('day', ts)) FROM events)
    GROUP BY event_type
    """,
)
def p9_default_to_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: no-explicit-run filter defaults to the latest run — here the
    latest day (reference services/query.py:288-293): scalar-subquery max
    broadcast back as a join."""
    ev = table(spark, sf_dir, "events").withColumn("day", F.date_trunc("day", "ts"))
    latest = ev.agg(F.max("day").alias("day"))
    return (
        ev.join(F.broadcast(latest), "day")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@gate(
    "a8_group_by_all",
    oracle="""
    SELECT event_type,
           strftime(CAST(date_trunc('day', ts) AS TIMESTAMP), '%Y-%m-%d') AS day,
           count(*) AS n,
           round(sum(value), 2) AS total
    FROM events
    WHERE user_id <= 20
    GROUP BY ALL
    """,
)
def a8_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: GROUP BY ALL (reference blq_sandbox_summary,
    bird_schema.sql:862-888) — grouping keys enumerated explicitly in the
    DataFrame algebra."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    return ev.groupBy(
        "event_type", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))


@gate(
    "o6_count_before_limit",
    oracle="""
    SELECT
      (SELECT count(*) FROM orders WHERE o_orderstatus = 'O') AS total_count,
      (SELECT to_json(list(k)) FROM (
         SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'O'
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 5
      )) AS page_json
    """,
)
def o6_count_before_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6: total count with the same WHERE + the limited page in one
    result (reference count-before-limit, services/query.py:306-316)."""
    filtered = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    total = filtered.agg(F.count(F.lit(1)).alias("total_count"))
    page = (
        filtered.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(5)
        .agg(F.to_json(F.collect_list("o_orderkey")).alias("page_json"))
    )
    return total.crossJoin(page)
