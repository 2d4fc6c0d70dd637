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

    The events table's on-disk timestamp layout has shifted across driver
    releases: TIMESTAMP(NANOS) (read nanos-as-long and rebuild), then
    timestamp[us] with no tz, which Spark 4 surfaces as TIMESTAMP_NTZ.
    Downstream operators use `F.unix_micros` / window functions that
    require TIMESTAMP, so normalize every layout to TIMESTAMP here, at the
    one load boundary. Session timezone is pinned to UTC, so the NTZ ->
    LTZ cast is value-preserving (wall clock == instant) and rendering is
    engine-independent (matches DuckDB's naive-timestamp view)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        import pyspark.sql.functions as F

        # integer division: double division loses ulps at 1e18 ns scale
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return normalize_ntz(df)


def normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast every TIMESTAMP_NTZ column to TIMESTAMP (LTZ).

    With the session timezone pinned to UTC the cast is a metadata-only
    reinterpretation (no value change), and it keeps the whole operator
    surface on the one timestamp type `unix_micros` & friends accept.
    Applied per-column via select so Catalyst still prunes/pushes down."""
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if not ntz_cols:
        return df
    import pyspark.sql.functions as F

    return df.select(
        *[
            F.col(c).cast("timestamp").alias(c) if c in ntz_cols else F.col(c)
            for c in df.columns
        ]
    )


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view, enabling the spark.sql surface
    (reference's raw-SQL path, src/blq/storage.py:560-582)."""
    for t in TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)
