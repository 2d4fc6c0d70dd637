"""Local replica of the driver's Spark-vs-DuckDB differential check:
run a gate query in Spark and its oracle SQL in DuckDB over the same
parquet tables, then compare row count, column names, and
order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from blq_cli_spark.sources.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        norm = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                norm.append("<null>")
            elif isinstance(v, float):
                norm.append(f"{v!r}")
            elif isinstance(v, bool):
                norm.append(str(bool(v)))
            else:
                norm.append(str(v))
        rows.append(tuple(norm))
    return sorted(rows)


def compare(spark_df, oracle_df) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    s_cols, o_cols = sorted(spark_df.columns), sorted(oracle_df.columns)
    if s_cols != o_cols:
        problems.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count differs: spark={len(spark_df)} oracle={len(oracle_df)}")
    s_rows, o_rows = _normalize(spark_df), _normalize(oracle_df)
    if s_rows != o_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:5]
        extra_s = [r for r in s_rows if r not in set(o_rows)][:3]
        extra_o = [r for r in o_rows if r not in set(s_rows)][:3]
        problems.append(
            f"values differ; first aligned diffs={diffs} spark-only={extra_s} oracle-only={extra_o}"
        )
    return problems


def run_gate(spark, name: str, sf_dir: str) -> list[str]:
    from blq_cli_spark.gates import oracles, queries

    fn = queries()[name]
    spark_pdf = fn(spark, sf_dir).toPandas()
    sql = oracles().get(name)
    if sql is None:
        return [] if len(spark_pdf) >= 0 else ["spark query failed"]
    con = duck_connection(sf_dir)
    try:
        oracle_pdf = con.sql(sql).df()
    finally:
        con.close()
    return compare(spark_pdf, oracle_pdf)
