"""Skew-mitigation utilities for hot keys at 100 TB.

AQE's skew-join splitting (enabled in session.py) covers sort-merge joins;
these helpers cover the remaining cases:

- salted two-stage aggregation: a groupBy on a key where one value holds
  a large fraction of all rows (e.g. fingerprint of a spammy error, or
  the empty-language bucket) bottlenecks a single reducer. Salting splits
  the hot key across `salt` partial groups, then re-aggregates — the
  classic partial/final split made explicit.

- salted broadcast-side replication join: when the build side is small
  but the probe side's join key is skewed and the join must shuffle,
  replicate the build side per salt instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation with a random salt on the first stage.

    `aggs` maps output name -> SUM-decomposable first-stage aggregate
    (count/sum/min/max). Stage 1 groups by keys+salt (splits hot keys
    across reducers); stage 2 merges partials by keys:
    count -> sum of partial counts, sum -> sum, min -> min, max -> max.
    """
    salted = df.withColumn("_salt", (F.rand(seed=0) * salt).cast("int"))
    stage1 = salted.groupBy(*keys, "_salt").agg(
        *[c.alias(f"_p_{name}") for name, c in aggs.items()]
    )
    mergers = []
    for name, col in aggs.items():
        expr_str = col._jc.toString() if hasattr(col, "_jc") else ""
        partial = F.col(f"_p_{name}")
        if expr_str.lower().startswith("min"):
            mergers.append(F.min(partial).alias(name))
        elif expr_str.lower().startswith("max"):
            mergers.append(F.max(partial).alias(name))
        else:  # count and sum both merge by summing partials
            mergers.append(F.sum(partial).alias(name))
    return stage1.groupBy(*keys).agg(*mergers)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side's key, replicate the
    small side across all salt values, join on (key, salt). Use when the
    small side is too big to broadcast outright but the big side's key
    distribution is heavily skewed."""
    spark = big.sparkSession
    salts = spark.range(salt).select(F.col("id").cast("int").alias("_salt"))
    big_s = big.withColumn("_salt", (F.rand(seed=0) * salt).cast("int"))
    small_r = small.crossJoin(salts)
    out = big_s.join(small_r, [on, "_salt"], how)
    return out.drop("_salt")
