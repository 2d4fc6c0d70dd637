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


def test_bloom_no_false_negatives_and_bounded_fpr(spark):
    """Membership contract: every inserted value probes True; the
    false-positive rate on a disjoint set stays within ~3x the
    analytic (1 - e^(-kn/m))^k."""
    import math

    from blq_cli_spark.operators import sketch

    n, m, k = 2000, 1 << 14, 4
    members = spark.range(n).selectExpr("concat('doc-', id) AS h")
    b = sketch.bloom_build(members, "h", m_bits=m, k_hashes=k)
    assert (
        sketch.bloom_might_contain(members, "h", b)
        .filter("NOT might_contain")
        .count()
        == 0
    )
    others = spark.range(n).selectExpr("concat('other-', id) AS h")
    fp = (
        sketch.bloom_might_contain(others, "h", b)
        .filter("might_contain")
        .count()
    )
    expected = (1 - math.exp(-k * n / m)) ** k
    assert fp / n <= 3 * expected + 0.01, (fp, expected)


def test_bloom_merge_is_union(spark):
    from blq_cli_spark.operators import sketch

    a_df = spark.range(500).selectExpr("concat('a-', id) AS h")
    b_df = spark.range(500).selectExpr("concat('b-', id) AS h")
    a = sketch.bloom_build(a_df, "h", m_bits=1 << 14, k_hashes=4)
    b = sketch.bloom_build(b_df, "h", m_bits=1 << 14, k_hashes=4)
    m = sketch.bloom_merge(a, b)
    both = a_df.union(b_df)
    assert (
        sketch.bloom_might_contain(both, "h", m)
        .filter("NOT might_contain")
        .count()
        == 0
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sketch.bloom_merge(a, sketch.bloom_build(b_df, "h", m_bits=1 << 13))


def test_bloom_filter_new_keeps_only_definite_misses(spark):
    """The incremental exact-dedup fast path: survivors are guaranteed
    unseen (no member ever passes), columns ride through unchanged."""
    from blq_cli_spark.operators import sketch

    seen = spark.range(1000).selectExpr("concat('doc-', id) AS h", "id AS extra")
    b = sketch.bloom_build(seen, "h", m_bits=1 << 15, k_hashes=4)
    batch = spark.range(500, 1500).selectExpr("concat('doc-', id) AS h", "id AS extra")
    out = sketch.bloom_filter_new(batch, "h", b)
    kept = {r["h"] for r in out.collect()}
    # members 500-999 must all be dropped; 1000-1499 survive minus FPs
    assert not any(int(h.split("-")[1]) < 1000 for h in kept)
    assert len(kept) >= 450
    assert out.columns == ["h", "extra"]


def test_bloom_probe_plan_is_jvm_broadcast(spark):
    """The probe must be a broadcast of the fixed-size word array plus
    pure column arithmetic — no Python, no shuffle of the probed side."""
    import contextlib
    import io

    from blq_cli_spark.operators import sketch

    members = spark.range(100).selectExpr("concat('doc-', id) AS h")
    b = sketch.bloom_build(members, "h", m_bits=1 << 12, k_hashes=2)
    df = sketch.bloom_might_contain(
        spark.range(100).selectExpr("concat('x-', id) AS h"), "h", b
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # no Python EXECUTION in the probe (the one-row local word-array scan
    # carries an applySchemaToPythonRDD provenance label; that's driver-
    # side construction, not per-row Python)
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "PythonUDF"):
        assert node not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") - tree.count("BroadcastExchange") == 0, tree
