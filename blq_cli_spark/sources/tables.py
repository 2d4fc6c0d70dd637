"""Driver-testdata table loaders.

Mirrors the reference's parquet scan surface (S1/S6 in SURVEY.md §2.1:
src/blq/schema.sql:41-52, src/blq/query.py:115-137) for the driver's
deterministic tables. Partition discovery / mergeSchema are native Spark;
these are single-file tables so a plain read suffices — predicate pushdown
and column pruning still apply (verify with .explain: PushedFilters /
ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table.

    The events table stores TIMESTAMP(NANOS) which Spark's parquet reader
    rejects; we read nanos as long (legacy conf) and rebuild a microsecond
    timestamp (matching DuckDB's ns->us truncation). Session timezone is
    pinned to UTC so naive-timestamp rendering is engine-independent."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        import pyspark.sql.functions as F

        # integer division: double division loses ulps at 1e18 ns scale
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view, enabling the spark.sql surface
    (reference's raw-SQL path, src/blq/storage.py:560-582)."""
    for t in TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)
