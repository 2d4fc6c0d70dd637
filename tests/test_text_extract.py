"""Raw-text ingest prep: text.strip_html + text.normalize_text and
their corpus action / pipeline-stage / CLI wiring. DuckDB hash parity
for both runs via the registered gates (x_html_extract,
x_normalize_text — tests/test_gate_parity.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from blq_cli_spark.operators import corpus as corpus_ops
from blq_cli_spark.operators import text as text_ops
from tests.test_plan_quality import plan_of

HTML = (
    '<html><head><style>p {color: red}</style></head><body>'
    '<h1>Head &amp;amp; tail &lt;x&gt;</h1>\n'
    '<p class="x">one  two</p><!-- multi\nline comment -->'
    '<script type="text/javascript">var x = 1 < 2;</script></body></html>'
)


def test_strip_html_hand_case(spark):
    df = spark.createDataFrame([(1, HTML)], "doc_id long, text string")
    got = df.select(text_ops.strip_html(F.col("text")).alias("c")).first()["c"]
    # style/script payloads gone, comment gone, entities decoded exactly
    # once (&amp;amp; -> &amp;, not &), whitespace collapsed
    assert got == "Head &amp; tail <x> one two"


def test_strip_html_is_pure_projection(spark):
    df = spark.createDataFrame([(1, HTML)], "doc_id long, text string")
    plan = plan_of(df.select(text_ops.strip_html(F.col("text")).alias("c")))
    assert "Exchange" not in plan
    assert "mapInPandas" not in plan.lower()


def test_normalize_text_composes_and_scrubs(spark):
    rows = [
        (1, "café list"),          # decomposed -> composed
        (2, "a\x07b\x00c"),               # control bytes stripped
        (3, "  x \t\n y  "),              # whitespace collapsed + trimmed
        (4, None),                         # null rides through
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["norm_text"]
        for r in text_ops.normalize_text(df).collect()
    }
    assert got[1] == "café list"
    assert got[2] == "abc"
    assert got[3] == "x y"
    assert got[4] is None


def test_normalize_inplace_keeps_columns_and_avoids_shuffle(spark):
    df = spark.createDataFrame(
        [(1, "café", "web", 7), (2, "ok", "books", 8)],
        "doc_id long, text string, source string, extra long",
    )
    out = text_ops.normalize_text(df, inplace=True)
    assert out.columns == df.columns
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["text"] == "café" and rows[1]["extra"] == 7
    assert rows[2]["source"] == "books"
    assert "Exchange" not in plan_of(out)


def test_corpus_actions_extract_and_normalize(spark):
    df = spark.createDataFrame(
        [(1, "<p>hi &amp; bye</p>", "web"), (2, "café", "web")],
        "doc_id long, text string, source string",
    )
    ex = corpus_ops.run_action(df, "extract")
    assert ex.columns == df.columns
    assert ex.filter(F.col("doc_id") == 1).first()["text"] == "hi & bye"
    nm = corpus_ops.run_action(df, "normalize")
    assert nm.filter(F.col("doc_id") == 2).first()["text"] == "café"


def test_pipeline_extract_then_normalize_stage(spark):
    df = spark.createDataFrame(
        [(1, "<b>café</b>", "web"), (2, "<i>plain</i>", "web")],
        "doc_id long, text string, source string",
    )
    out = corpus_ops.pipeline(
        df, [{"op": "extract"}, {"op": "normalize"}]
    )
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    assert rows == {1: "café", 2: "plain"}


def test_cli_corpus_extract(tmp_path, capsys):
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="test-cli-extract")
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "<p>alpha &lt;tag&gt;</p>", "web")],
        "doc_id long, text string, source string",
    ).write.parquet(src)
    outp = str(tmp_path / "clean.parquet")
    assert main(["corpus", "extract", "--input", src, "--output", outp]) == 0
    got = spark.read.parquet(outp).first()["text"]
    assert got == "alpha <tag>"


def test_cli_corpus_normalize_nfkc(tmp_path, capsys):
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="test-cli-normalize")
    src = str(tmp_path / "docs.parquet")
    # NFKC folds the ligature U+FB01 to 'fi'; NFC leaves it alone
    spark.createDataFrame(
        [(1, "ﬁle", "web")], "doc_id long, text string, source string",
    ).write.parquet(src)
    outp = str(tmp_path / "norm.parquet")
    assert main(["corpus", "normalize", "--input", src, "--output", outp,
                 "--form", "NFKC"]) == 0
    assert spark.read.parquet(outp).first()["text"] == "file"


def test_serve_corpus_extract_dispatch(tmp_path, spark):
    from blq_cli_spark import serve
    from blq_cli_spark.sources.store import LogStore

    st = LogStore(spark, str(tmp_path / "exstore"))
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "<p>hi &amp; bye</p>", "web")],
        "doc_id long, text string, source string",
    ).write.parquet(src)
    resp = serve.dispatch(st, "corpus", {"action": "extract", "input": src})
    assert resp["ok"], resp
    assert resp["result"]["rows"][0]["text"] == "hi & bye"
