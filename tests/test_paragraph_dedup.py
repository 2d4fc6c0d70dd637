"""Dolma-style first-occurrence paragraph dedup
(quality.dedup_paragraphs) — DuckDB hash parity runs via the registered
gate x_dedup_paragraphs (tests/test_gate_parity.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from blq_cli_spark.operators import corpus as corpus_ops
from blq_cli_spark.operators import quality
from tests.test_plan_quality import plan_of


def _docs(spark):
    rows = [
        (1, "alpha one\nshared para\nbeta one"),
        (2, "shared para\ngamma two"),        # loses 'shared para' to doc 1
        (3, "  shared   para \ndelta three"),  # ws-normalized copy also drops
        (4, "shared para"),                    # nothing left
        (5, ""),                               # empty doc
        (6, None),                             # null doc
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_first_occurrence_wins(spark):
    got = {
        r["id"]: r for r in quality.dedup_paragraphs(_docs(spark)).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5, 6}
    assert got[1]["clean_text"] == "alpha one\nshared para\nbeta one"
    assert (got[1]["n_paragraphs"], got[1]["n_kept"]) == (3, 3)
    assert got[2]["clean_text"] == "gamma two"
    assert (got[2]["n_paragraphs"], got[2]["n_kept"]) == (2, 1)
    assert got[3]["clean_text"] == "delta three"
    assert got[4] and (got[4]["n_kept"], got[4]["clean_text"]) == (0, "")
    assert (got[5]["n_paragraphs"], got[5]["clean_text"]) == (0, "")
    assert (got[6]["n_paragraphs"], got[6]["clean_text"]) == (0, "")


def test_partitioning_invariance(spark):
    base = quality.dedup_paragraphs(_docs(spark)).collect()
    rep = quality.dedup_paragraphs(_docs(spark).repartition(7)).collect()
    key = lambda rows: sorted((r["id"], r["n_kept"], r["clean_text"]) for r in rows)
    assert key(base) == key(rep)


def test_no_window_in_plan(spark):
    """The first-occurrence table must be a map-side-combinable
    aggregate, NOT a window over the paragraph hash — a million-copy
    boilerplate paragraph would pile into one window partition."""
    plan = plan_of(quality.dedup_paragraphs(_docs(spark)))
    assert "Window" not in plan


def test_pipeline_stage_and_action(spark):
    df = spark.createDataFrame(
        [(1, "keep me\ndup para", "web"), (2, "dup para\nmine two", "web")],
        "doc_id long, text string, source string",
    )
    out = corpus_ops.pipeline(df, [{"op": "dedup-paragraphs"}])
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    assert rows == {1: "keep me\ndup para", 2: "mine two"}
    act = corpus_ops.run_action(df, "dedup-paragraphs")
    assert act.filter(F.col("id") == 2).first()["n_kept"] == 1


def test_cli_dedup_paragraphs(tmp_path, capsys):
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="test-cli-paradedup")
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "a\nb", "web"), (2, "b\nc", "web")],
        "doc_id long, text string, source string",
    ).write.parquet(src)
    assert main(["corpus", "dedup-paragraphs", "--input", src]) == 0
    assert "n_kept" in capsys.readouterr().out


GOOD_LINE = "This synthetic line carries enough words to pass."


def test_c4_line_rules_hand_case(spark):
    text = "\n".join([
        GOOD_LINE,
        "short punct.",                                  # word floor
        "A javascript flavored line would pass if not dropped.",
        "this long line has no terminal punctuation at all",
        'He said "come back tomorrow" and left quietly."',  # quote end ok
        "curly { brace template line with enough words here.",
    ])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = quality.c4_line_rules(df).first()
    assert (r["n_lines"], r["n_kept"]) == (6, 2)
    assert r["clean_text"].splitlines() == [
        GOOD_LINE, 'He said "come back tomorrow" and left quietly."',
    ]


def test_c4_pipeline_stage_no_join_and_stream_allowed(spark):
    df = spark.createDataFrame(
        [(1, GOOD_LINE + "\nnoise line no punct", "web")],
        "doc_id long, text string, source string",
    )
    out = corpus_ops.pipeline(df, [{"op": "c4-lines"}])
    assert out.first()["text"] == GOOD_LINE
    assert "Join" not in plan_of(out)
    from blq_cli_spark.streaming import curation

    # pure projection -> replay-safe in the streaming sink
    assert curation.curation_sink("o", "s", [{"op": "c4-lines"}])


def test_cli_c4_lines(tmp_path, capsys):
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="test-cli-c4")
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, GOOD_LINE + "\nbad line", "web")],
        "doc_id long, text string, source string",
    ).write.parquet(src)
    assert main(["corpus", "c4-lines", "--input", src]) == 0
    assert "n_kept" in capsys.readouterr().out


def test_write_clustered_file_ranges_disjoint(spark, tmp_path):
    """Range clustering must give each parquet file a narrow doc_id
    range (parquet min/max footer stats -> file-level skipping)."""
    import glob

    import pyarrow.parquet as pq

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(1000)], "doc_id long, text string"
    ).repartition(13)  # scrambled input
    out = str(tmp_path / "clustered")
    corpus_ops.write_clustered(df, out, "doc_id", n_files=4)
    spans = []
    for f in glob.glob(f"{out}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo = min(md.row_group(i).column(0).statistics.min
                 for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(0).statistics.max
                 for i in range(md.num_row_groups))
        spans.append((lo, hi))
    spans.sort()
    assert len(spans) >= 3
    # each file covers a narrow slice, and slices don't interleave
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2
    # read-back with a range filter is correct
    got = spark.read.parquet(out).filter("doc_id < 100").count()
    assert got == 100


def test_cli_cluster_by(tmp_path, capsys):
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="test-cli-cluster")
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, "some text value here", "web") for i in range(50)],
        "doc_id long, text string, source string",
    ).write.parquet(src)
    outp = str(tmp_path / "scored")
    assert main(["corpus", "tokens", "--input", src, "--output", outp,
                 "--cluster-by", "id", "--output-partitions", "2"]) == 0
    assert "range-clustered by id" in capsys.readouterr().out
    assert spark.read.parquet(outp).count() == 50


def test_run_action_text_validation_exempts_membership_ops(spark):
    import pytest as _pytest

    no_text = spark.createDataFrame(
        [(1, "web"), (2, "books")], "doc_id long, source string"
    )
    # membership ops work without a text column
    assert corpus_ops.run_action(
        no_text, "mix", rates={"web": 1.0}
    ).count() == 1
    assert corpus_ops.run_action(no_text, "shuffle").count() == 2
    # text ops fail with the column inventory
    with _pytest.raises(ValueError, match="use --text-col"):
        corpus_ops.run_action(no_text, "profile")


def test_gopher_line_rules_hand_case(spark):
    bullet_doc = "\n".join(["- a"] * 19 + ["text line"])      # 95% bullets
    ellipsis_doc = "\n".join(["cut off..."] * 2 + ["ok", "…"])  # 75% ellipsis
    clean_doc = "regular line\nanother regular line."
    df = spark.createDataFrame(
        [(1, bullet_doc), (2, ellipsis_doc), (3, clean_doc)],
        "doc_id long, text string",
    )
    got = {r["id"]: r for r in quality.gopher_line_rules(df).collect()}
    assert not got[1]["bullet_ok"] and got[1]["ellipsis_ok"]
    assert got[2]["bullet_ok"] and not got[2]["ellipsis_ok"]
    assert got[3]["passes"]
    assert got[1]["bullet_ratio"] == 0.95
    assert got[2]["ellipsis_ratio"] == 0.75
    assert not got[1]["passes"] and not got[2]["passes"]
    assert "Exchange" not in plan_of(quality.gopher_line_rules(df))


def test_pipeline_gopher_lines_stage(spark):
    df = spark.createDataFrame(
        [(1, "\n".join(["- x"] * 10), "web"), (2, "fine line.", "web")],
        "doc_id long, text string, source string",
    )
    out = corpus_ops.pipeline(df, [{"op": "gopher-lines"}])
    assert [r["doc_id"] for r in out.collect()] == [2]
