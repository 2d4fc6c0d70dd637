"""Approximate sketches — the 100 TB path for cardinality and quantiles.

Exact countDistinct shuffles every distinct value; exact percentiles
sort the column. At corpus scale both are replaced by fixed-size
mergeable sketches (HyperLogLog++ / an approximate quantile summary),
which Spark implements natively — these wrappers pin the idioms, the
error contracts, and the exact/approx swap points used elsewhere in the
repo (the exact forms stay the DuckDB-oracle-checkable gates; sketches
are engine-specific by value, so their tests assert ERROR BOUNDS
against the exact answer instead of hash equality).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def distinct_counts(
    df: DataFrame, group_cols: list[str], value_col: str, rsd: float = 0.05
) -> DataFrame:
    """Per-group approximate distinct counts (HyperLogLog++; `rsd` is the
    target relative standard deviation). One map-side-combinable shuffle
    carrying a fixed-size sketch per group — vs exact countDistinct's
    expand + full distinct-value shuffle. Columns: group cols +
    `approx_distinct`."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias("approx_distinct")
    )


def quantile_summary(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probabilities: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate quantiles (Greenwald-Khanna-style summary;
    rank error <= 1/accuracy). Output: group cols + one `p{N}` column
    per requested probability."""
    qs = F.percentile_approx(
        value_col, F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
    )
    out = df.groupBy(*group_cols).agg(qs.alias("_qs"))
    for i, p in enumerate(probabilities):
        out = out.withColumn(f"p{int(p * 100)}", F.col("_qs")[i])
    return out.drop("_qs")


def frequent_terms(
    df: DataFrame,
    value_col: str,
    k: int = 20,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> list[tuple[str, int]]:
    """Approximate top-k frequent values via Count-Min Sketch (Spark's
    native `count_min_sketch` aggregate: one pass, fixed-size mergeable
    state — the heavy-hitter primitive when an exact groupBy's
    distinct-key shuffle is the bottleneck). `eps` bounds relative
    overcount, `confidence` the probability of that bound.

    Candidate selection: CMS estimates frequency only for QUERIED
    values, so candidates come from a bounded per-partition local top-k
    (a globally heavy value is heavy in at least one partition — the
    same local+merge argument as similarity.cosine_topk), then the
    sketch scores each candidate. Driver holds the sketch (KB-scale) +
    candidate list (O(k * partitions)) — never the value distribution.

    Returns [(value, estimated_count)] sorted desc; CMS never
    undercounts, so true heavy hitters cannot be pushed out by
    estimation error."""
    from pyspark.sql import Window

    spark = df.sparkSession
    raw = df.select(
        F.count_min_sketch(
            F.col(value_col), F.lit(float(eps)), F.lit(float(confidence)),
            F.lit(int(seed)),
        ).alias("s")
    ).collect()[0]["s"]
    cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(raw))
    # bounded candidate set: per-partition local counts, top 4k each
    part_counts = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid", value_col)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    w = Window.partitionBy("_pid").orderBy(F.desc("_n"), F.asc(value_col))
    candidates = [
        r[value_col]
        for r in part_counts.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= 4 * k)
        .select(value_col)
        .distinct()
        .collect()
        if r[value_col] is not None
    ]
    scored = sorted(
        ((c, int(cms.estimateCount(c))) for c in candidates),
        key=lambda t: (-t[1], t[0]),
    )
    return scored[:k]
