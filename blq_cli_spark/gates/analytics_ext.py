"""Round-4 analytics-extension gates: sliding windows, grouping sets,
pivot, interval range frames, TF-IDF term ranking, deterministic
stratified sampling.

These widen the §2.4/§2.5/§2.10 families plus the training-data-pipeline
surface. Registered AFTER the driver's 50-gate window (registry.
DRIVER_ORDER) — the local parity suite (tests/test_gate_parity.py)
hash-checks each one against DuckDB at sf0.001/sf0.01.

Cross-engine determinism rules applied throughout (registry docstring):
aggregate doubles rounded at output, window starts rendered as strings,
every ranking ordered by a unique tie-break key, and scores that feed a
rank are *rational* arithmetic on integer counts (one IEEE division is
bit-deterministic across engines; `ln()` is not).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from blq_cli_spark.gates.registry import gate
from blq_cli_spark.sources.tables import table


@gate(
    "ts_sliding_window",
    oracle="""
    WITH e AS (
        SELECT (epoch_us(ts) // 1000000) AS ep, event_type, value FROM events
    ),
    w AS (
        SELECT (ep // 1800) * 1800 AS ws, event_type, value FROM e
        UNION ALL
        SELECT (ep // 1800) * 1800 - 1800 AS ws, event_type, value FROM e
    )
    SELECT strftime(to_timestamp(ws), '%Y-%m-%d %H:%M:%S') AS wstart,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM w GROUP BY 1, 2
    """,
)
def ts_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes — the overlapping-window
    Structured Streaming shape (each event lands in exactly 2 windows).
    The oracle expands the same semantics as a union of the two
    phase-shifted 30-minute bucketings: window start floor(t/30m)*30m
    and that minus 30m both contain t. Spark's window() aligns slides to
    the epoch, matching the floor arithmetic exactly."""
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("wstart"),
            "event_type",
            "n",
            "total_value",
        )
    )


@gate(
    "a_grouping_sets",
    oracle="""
    SELECT coalesce(o_orderpriority, '(all)') AS priority,
           coalesce(o_orderstatus, '(all)') AS status,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
    """,
)
def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — arbitrary aggregation lattice beyond ROLLUP/CUBE
    (A-family extension; DataFrame.groupingSets is Spark 4 native, one
    shuffle with partial aggregation exactly like a plain groupBy).
    Both grouping columns are non-null in the data, so coalesce labels
    the super-aggregate rows unambiguously."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            "n_orders",
            "total_price",
        )
    )


@gate(
    "a_pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority AS priority,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial
    FROM orders GROUP BY 1
    """,
)
def a_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list — with values pinned, Spark
    compiles it to one pass of conditional aggregates (no extra
    distinct-values job, no second shuffle), which is exactly the
    oracle's FILTER form and the only pivot shape that scales."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .select(
            "priority",
            F.coalesce("O", F.lit(0)).alias("n_open"),
            F.coalesce("F", F.lit(0)).alias("n_filled"),
            F.coalesce("P", F.lit(0)).alias("n_partial"),
        )
    )


@gate(
    "w_range_frame_hourly",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS n_last_hour
    FROM events WHERE user_id <= 5
    """,
)
def w_range_frame_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a time interval: per-user trailing 1-hour event
    count (W-family extension — value-range frames vs the usual row
    frames). Ordered on epoch microseconds in BOTH engines so frame
    boundaries and peer groups are identical; RANGE includes peers, so
    exact-timestamp ties agree by construction."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") <= 5)
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id", "user_id", F.count(F.lit(1)).over(w).alias("n_last_hour")
    )


@gate(
    "x_tfidf_top_terms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lower(t) AS term
        FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
              FROM documents)
        WHERE length(t) > 2
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               tf.tf * (n.n_docs + 1) / (df.df + 1) AS score
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, round(score, 6) AS score, rnk
    FROM (SELECT *, row_number() OVER (
              PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
          FROM scored)
    WHERE rnk <= 3
    """,
)
def x_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 distinguishing terms per document by TF-IDF-style weight
    (training-data keyword extraction). Two shuffles at scale: tf
    groupBy(doc, term) and df groupBy(term). The tf⋈df join is left to
    AQE: both sides are already hash-partitioned on term so the shuffle
    join co-locates for free, and AQE broadcasts when df is small —
    forcing broadcast would be wrong at 100 TB, where vocabulary
    cardinality is unbounded. Only the one-row corpus-size scalar is
    broadcast unconditionally.

    score = tf * (N+1)/(df+1) — a RATIONAL idf surrogate, monotone in
    the classic ln((N+1)/(df+1)) but bit-identical across engines (one
    IEEE division on integers; ln() differs in ulps between libm and
    the JVM and would flip equal-score rank ties)."""
    docs = table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"),
        )
        .filter(F.length("t") > 2)
        .select("doc_id", F.lower("t").alias("term"))
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.select(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.col("tf") * (F.col("n_docs") + 1) / (F.col("df") + 1))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "df", F.round("score", 6).alias("score"), "rnk")
    )


@gate(
    "x_stratified_sample",
    oracle="""
    SELECT lang,
           count(*) AS n_total,
           count(*) FILTER (
               WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
           ) AS n_sampled
    FROM documents GROUP BY 1
    """,
)
def x_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~1/8 stratified sample audit per language stratum:
    membership = first md5 hex nibble of the doc id in {0,1} — stable
    across engines, runs, AND cluster sizes (unlike df.sample, whose
    output depends on partitioning), so a training-data split computed
    this way is reproducible and joinable anywhere. One aggregation
    pass; the sample predicate is a pure column expression that also
    serves as the row-level filter for materializing the split."""
    docs = table(spark, sf_dir, "documents")
    member = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(member, 1)).alias("n_sampled"),
    )


@gate(
    "w_rank_family",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority AS priority,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM orders
    WHERE o_orderkey <= 2000
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def w_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family (dense_rank / ntile /
    percent_rank / cume_dist) in one windowed pass — W-family breadth.
    Every function shares ONE window spec, so Spark evaluates them all
    in a single sort+window operator (one shuffle); the o_orderkey
    tie-break makes ranks deterministic across engines."""
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
    )
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            F.col("o_orderpriority").alias("priority"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
    )


@gate(
    "f_fuzzy_levenshtein",
    oracle="""
    SELECT doc_id,
           levenshtein(lower(substr(trim(text), 1, 16)), 'training data') AS dist
    FROM documents
    WHERE doc_id < 100
    """,
)
def f_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (F-family breadth; the cheap
    string-similarity primitive for near-dup triage and typo-tolerant
    lookup). Pure JVM expression — identical DP algorithm in both
    engines, so integer distances match exactly."""
    return (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.levenshtein(
                F.lower(F.substring(F.trim(F.col("text")), 1, 16)),
                F.lit("training data"),
            ).alias("dist"),
        )
    )


@gate(
    "f_array_suite",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                                    AS n_words,
           array_to_string(list_slice(string_split(text, ' '), 1, 3), '-') AS first3,
           CAST(list_contains(string_split(text, ' '), 'the') AS INTEGER)  AS has_the,
           len(list_distinct(string_split(text, ' ')))                     AS n_uniq,
           list_sort(string_split(text, ' '))[1]                           AS w_min
    FROM documents
    WHERE doc_id < 200
    """,
)
def f_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface (F-family breadth): split, size, slice +
    join, membership, distinct-count, sort/element_at — the collection
    algebra behind token pipelines (reference F15 explode is the
    row-generating half; this is the stay-in-one-row half). All JVM
    expressions inside whole-stage codegen; no UDF."""
    words = F.split(F.col("text"), " ")
    return (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.size(words).alias("n_words"),
            F.array_join(F.slice(words, 1, 3), "-").alias("first3"),
            F.array_contains(words, "the").cast("int").alias("has_the"),
            F.size(F.array_distinct(words)).alias("n_uniq"),
            F.element_at(F.array_sort(words), 1).alias("w_min"),
        )
    )


@gate(
    "a_unpivot_metrics",
    oracle="""
    WITH wide AS (
        SELECT l_returnflag,
               round(sum(l_quantity), 2)      AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_price,
               round(avg(l_discount), 4)      AS avg_disc
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, metric, value FROM wide
    UNPIVOT (value FOR metric IN (sum_qty, sum_price, avg_disc))
    """,
)
def a_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (A-family breadth): wide per-group metrics to
    (group, metric, value) long form — the report/export shape. Native
    DataFrame.unpivot (Spark 3.4+): a per-row Expand, no shuffle beyond
    the aggregation's own."""
    wide = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        )
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "avg_disc"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@gate(
    "a_corr_stats",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 3) + 0.0  AS qty_price_corr,
           round(stddev_samp(l_quantity), 3) + 0.0            AS qty_sd,
           round(var_samp(l_discount), 3) + 0.0               AS disc_var,
           round(covar_samp(l_quantity, l_tax), 3) + 0.0      AS qty_tax_cov
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics (A-family breadth): grouped Pearson
    correlation, sample stddev/variance, sample covariance — data-quality
    profiling primitives. Single-pass partial aggregation in both
    engines; rounded to 3 decimals because summation ORDER differs
    across partitionings (values are O(1)-magnitude, so 1e-3 is far
    above the accumulated ulp drift). `+ 0.0` canonicalizes IEEE -0.0
    (round(-1e-4, 3) is -0.0 in one engine, 0.0 in the other; adding
    +0.0 maps both to +0.0)."""
    zero = F.lit(0.0)
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            (F.round(F.corr("l_quantity", "l_extendedprice"), 3) + zero).alias("qty_price_corr"),
            (F.round(F.stddev_samp("l_quantity"), 3) + zero).alias("qty_sd"),
            (F.round(F.var_samp("l_discount"), 3) + zero).alias("disc_var"),
            (F.round(F.covar_samp("l_quantity", "l_tax"), 3) + zero).alias("qty_tax_cov"),
        )
    )
