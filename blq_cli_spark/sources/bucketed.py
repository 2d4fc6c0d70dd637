"""Bucketed-table helpers: shuffle-free co-located joins.

At 100 TB the dominant cost of a repeated equi-join is re-shuffling the
same fact table on the same key every run. Spark's bucketed tables fix
the partitioning AT REST: `bucketBy(n, key)` + `sortBy(key)` writes
each bucket as its own file set, and a join of two tables bucketed on
the join key with the same bucket count needs NO Exchange on either
side — the scan itself satisfies the join's distribution requirement
(verified in tests/test_bucketed.py against the physical plan).

Use for: dimension-conformed fact joins that recur (events x
invocations at store scale), persisted LSH signature state probed every
ingest batch (join key band_key), any join whose key is stable across
runs. The write costs one shuffle ONCE; every subsequent join reads
pre-partitioned data.

Bucketed writes go through the session catalog (`saveAsTable` — plain
`parquet(path)` cannot record bucket metadata); reads are
`spark.table(name)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int,
    mode: str = "overwrite",
) -> None:
    """Persist `df` bucketed (and sorted) by `key` into the catalog as
    `table`. One shuffle now; zero shuffles for every later equi-join
    on `key` against a co-bucketed table."""
    keys = [key] if isinstance(key, str) else list(key)
    (
        df.repartition(buckets, *keys)  # one up-front shuffle, then at rest
        .write.mode(mode)
        .format("parquet")
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key. With
    equal bucket counts the physical plan contains no Exchange — the
    join runs bucket-by-bucket off the scans."""
    on_keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on_keys, how)
