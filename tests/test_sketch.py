"""Approximate sketches: error bounds against the exact answers on the
driver tables (values are engine-specific, so bounds — not hashes)."""

from __future__ import annotations

import pyspark.sql.functions as F

from blq_cli_spark.operators import sketch
from blq_cli_spark.sources.tables import table

SF = "/root/testdata/sf0.01"


def test_distinct_counts_within_rsd(spark):
    li = table(spark, SF, "lineitem")
    approx = {
        (r["l_returnflag"],): r["approx_distinct"]
        for r in sketch.distinct_counts(li, ["l_returnflag"], "l_orderkey").collect()
    }
    exact = {
        (r["l_returnflag"],): r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        rel_err = abs(approx[k] - exact[k]) / exact[k]
        assert rel_err < 0.15, f"{k}: {rel_err:.3f}"  # 3x the 5% target rsd


def test_quantile_summary_rank_error(spark):
    li = table(spark, SF, "lineitem")
    got = sketch.quantile_summary(li, ["l_returnflag"], "l_extendedprice").collect()
    n_groups = li.select("l_returnflag").distinct().count()
    assert len(got) == n_groups
    for r in got:
        assert r["p50"] <= r["p90"] <= r["p99"]  # monotone by construction
        # p50 must sit near the true median: check via rank position
        grp = li.filter(F.col("l_returnflag") == r["l_returnflag"])
        n = grp.count()
        below = grp.filter(F.col("l_extendedprice") <= r["p50"]).count()
        assert abs(below / n - 0.5) < 0.02  # rank error way under 2%


def test_frequent_terms_cms_matches_exact_topk(spark):
    """CMS heavy hitters: top-k set and ORDER match the exact groupBy
    answer on a skewed distribution; estimates never undercount."""
    import pyspark.sql.functions as F

    from blq_cli_spark.operators import sketch

    # zipf-ish: value v_i appears (40 - i)^2 times
    rows = [(f"v{i:02d}",) for i in range(40) for _ in range((40 - i) ** 2)]
    df = spark.createDataFrame(rows, "term string").repartition(8)
    got = sketch.frequent_terms(df, "term", k=10)
    exact = {
        r["term"]: r["n"]
        for r in df.groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert [t for t, _ in got] == sorted(exact, key=lambda t: -exact[t])[:10]
    assert all(est >= exact[t] for t, est in got)  # CMS never undercounts
    assert all(est <= exact[t] * 1.05 for t, est in got)  # eps-tight here
