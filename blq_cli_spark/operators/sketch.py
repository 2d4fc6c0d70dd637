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
