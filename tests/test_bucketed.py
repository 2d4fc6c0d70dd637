"""Bucketed co-located joins: the at-rest partitioning must eliminate
the join's shuffle — asserted on the physical plan, not just claimed."""

from __future__ import annotations

import contextlib
import io

import pytest

from blq_cli_spark.sources import bucketed


@pytest.fixture()
def two_tables(spark, tmp_path_factory):
    a = spark.range(0, 10_000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(0, 10_000).selectExpr("id AS k", "id * 3 AS vb")
    bucketed.write_bucketed(a, "bkt_a", "k", 8)
    bucketed.write_bucketed(b, "bkt_b", "k", 8)
    yield "bkt_a", "bkt_b"
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_cobucketed_join_has_no_exchange(spark, two_tables):
    la, lb = two_tables
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = bucketed.bucketed_join(spark, la, lb, "k")
        plan = _plan(out)
        tree = plan.split("\n\n")[0]
        assert "Exchange" not in tree, tree
        assert "SortMergeJoin" in tree or "ShuffledHashJoin" in tree, tree
        # and the result is correct
        assert out.count() == 10_000
        row = out.filter("k = 7").collect()[0]
        assert (row["va"], row["vb"]) == (14, 21)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_unbucketed_same_join_shuffles_both_sides(spark, two_tables):
    """Control: the identical join over plain parquet reads shuffles —
    the bucketed layout is what removes the exchanges."""
    la, _ = two_tables
    a = spark.table(la)
    plain = a.selectExpr("k", "va AS v1")
    other = a.selectExpr("k", "va AS v2")
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # a temp view over a bucketed scan KEEPS bucketing; force a
        # non-bucketed layout by round-tripping through plain parquet
        import tempfile

        d = tempfile.mkdtemp(prefix="unbkt_")
        plain.write.mode("overwrite").parquet(f"{d}/a")
        other.write.mode("overwrite").parquet(f"{d}/b")
        p1 = spark.read.parquet(f"{d}/a")
        p2 = spark.read.parquet(f"{d}/b")
        plan = _plan(p1.join(p2, "k"))
        tree = plan.split("\n\n")[0]
        assert "Exchange" in tree, tree
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
