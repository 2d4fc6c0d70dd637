"""PMI collocation extraction (text.pmi_pairs) — DuckDB hash parity
runs via the registered gate x_pmi_pairs (tests/test_gate_parity.py)."""

from __future__ import annotations

import math

from blq_cli_spark.operators import text as text_ops
from tests.test_plan_quality import plan_of


def test_pmi_hand_computed(spark):
    # 'new york' always together; 'the'/'dog' common but independent
    rows = [
        (1, "new york new york the dog"),
        (2, "the dog new york"),
        (3, "dog the new york"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["w1"], r["w2"]): r
        for r in text_ops.pmi_pairs(df, top_k=10, min_count=2).collect()
    }
    assert ("new", "york") in got
    r = got[("new", "york")]
    # counts: 'new'=4, 'york'=4, pair=4; N_tok=14, N_big=11
    assert r["n_pair"] == 4
    want = math.log((4 * 14.0 * 14.0) / ((11.0 * 4) * 4))
    assert abs(r["pmi"] - round(want, 6)) < 1e-9
    # the collocation outranks the independent pair
    ranked = sorted(got.values(), key=lambda x: -x["pmi"])
    assert (ranked[0]["w1"], ranked[0]["w2"]) == ("new", "york")


def test_pmi_min_count_prunes(spark):
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "x y")], "doc_id long, text string"
    )
    got = text_ops.pmi_pairs(df, top_k=10, min_count=2).collect()
    pairs = {(r["w1"], r["w2"]) for r in got}
    assert ("a", "b") in pairs and ("x", "y") not in pairs


def test_pmi_plan_topk_and_no_corpus_broadcast(spark):
    df = spark.createDataFrame(
        [(i, "w%d w%d" % (i % 5, (i + 1) % 5)) for i in range(50)],
        "doc_id long, text string",
    )
    plan = plan_of(text_ops.pmi_pairs(df, top_k=10, min_count=2))
    assert "TakeOrderedAndProject" in plan


def test_cli_corpus_pmi(tmp_path, capsys):
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="test-cli-pmi")
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, "san francisco bay area code", "web") for i in range(6)],
        "doc_id long, text string, source string",
    ).write.parquet(src)
    assert main(["corpus", "pmi", "--input", src]) == 0
    assert "pmi" in capsys.readouterr().out


def test_zipf_fit_recovers_planted_exponent(spark):
    """A corpus synthesized with freq(rank) = C * rank^-1.2 must fit
    slope ~= -1.2 with r2 ~= 1."""
    rows = []
    doc = 0
    for r in range(1, 101):
        n = max(1, int(round(1000 * r ** -1.2)))
        for _ in range(n):
            rows.append((doc, f"w{r:03d}"))
            doc += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = text_ops.zipf_fit(df, top_k=100).first()
    assert got["n_types"] == 100
    assert abs(got["slope"] + 1.2) < 0.02
    assert got["r2"] > 0.99  # integer-rounded counts flatten the tail
    assert got["intercept"] > 0


def test_cli_corpus_zipf(tmp_path, capsys):
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="test-cli-zipf")
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, "the the the quick fox", "web") for i in range(4)],
        "doc_id long, text string, source string",
    ).write.parquet(src)
    assert main(["corpus", "zipf", "--input", src]) == 0
    assert "slope" in capsys.readouterr().out


def test_pmi_scan_count_bounded(spark, tmp_path):
    """Regression: the naive form scanned the corpus FIVE times (unigram
    table re-derived per join role + per grand total). The restructured
    plan reads the input at most 3 times (totals, vocabulary, bigrams)."""
    import re

    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, "w%d w%d w%d" % (i % 7, (i + 1) % 7, (i + 2) % 7))
         for i in range(200)],
        "doc_id long, text string",
    ).write.parquet(src)
    out = text_ops.pmi_pairs(spark.read.parquet(src), top_k=20, min_count=2)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"FileScan parquet", plan)) <= 3
