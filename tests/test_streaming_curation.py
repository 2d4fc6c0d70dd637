"""Continuous curation ingest (streaming/curation.py): the stateless
pipeline stages run per micro-batch, outputs are effectively-once under
batch replay, and stateful stage specs are rejected up front."""

from __future__ import annotations

import json as _json

import pytest
import pyspark.sql.functions as F

from blq_cli_spark.streaming import curation

GOOD = ("the quick brown fox jumps over the lazy dog and then the dog "
        "sleeps while the fox runs away into the green forest again")
BAD = "@@@ ### $$$"  # fails gopher (too short, symbols)


def test_stream_curation_ingest_end_to_end(spark, tmp_path):
    d = tmp_path / "crawl_in"
    d.mkdir()
    (d / "b1.jsonl").write_text(
        _json.dumps({"doc_id": 1, "text": f"<p>{GOOD}</p>"}) + "\n"
        + _json.dumps({"doc_id": 2, "text": BAD})
    )
    outp = str(tmp_path / "curated")
    stats = str(tmp_path / "stats")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema("doc_id long, text string").json(str(d))
    persisted_before = len(spark.sparkContext._jsc.getPersistentRDDs())
    q = curation.stream_curation_ingest(stream, outp, stats, ckpt)
    q.processAllAvailable()
    # second batch arrives after the first committed
    (d / "b2.jsonl").write_text(
        _json.dumps({"doc_id": 3, "text": f"<b>{GOOD} once more</b>"})
    )
    q.processAllAvailable()
    q.stop()

    rows = {r["doc_id"]: r for r in spark.read.parquet(outp).collect()}
    assert set(rows) == {1, 3}              # gopher dropped doc 2
    assert rows[1]["text"] == GOOD          # markup stripped, ws collapsed
    srows = sorted(
        (r["n_in"], r["n_kept"])
        for r in spark.read.parquet(stats).collect()
    )
    assert srows == [(1, 1), (2, 1)]
    # no per-batch persistence leaks: the sink persists `kept` for the
    # count+write and must release it before the batch commits — on a
    # days-long ingest a leaked block per micro-batch is unbounded
    # executor-memory growth
    assert (
        len(spark.sparkContext._jsc.getPersistentRDDs()) == persisted_before
    )


def test_curation_sink_replay_is_noop(spark, tmp_path):
    outp = str(tmp_path / "curated")
    stats = str(tmp_path / "stats")
    sink = curation.curation_sink(outp, stats, [{"op": "extract"}])
    b = spark.createDataFrame(
        [(1, f"<p>{GOOD}</p>")], "doc_id long, text string"
    )
    sink(b, 0)
    n_out = spark.read.parquet(outp).count()
    n_stats = spark.read.parquet(stats).count()
    sink(b, 0)  # full replay: nothing changes
    assert spark.read.parquet(outp).count() == n_out
    assert spark.read.parquet(stats).count() == n_stats
    # partial-failure replay: output committed, stats did not
    import shutil

    shutil.rmtree(stats)
    sink(b, 0)
    assert spark.read.parquet(outp).count() == n_out  # no double docs
    srow = spark.read.parquet(stats).first()
    assert (srow["n_in"], srow["n_kept"]) == (1, 1)


def test_curation_sink_rejects_stateful_stages(tmp_path):
    with pytest.raises(ValueError, match="not replay-safe"):
        curation.curation_sink("o", "s", [{"op": "dedup"}])
    with pytest.raises(ValueError, match="not replay-safe"):
        curation.curation_sink("o", "s", [{"op": "sample", "n": 5}])
    with pytest.raises(ValueError, match="persistent-state"):
        curation.curation_sink(
            "o", "s", [{"op": "exact-dedup", "history": "h"}]
        )


def test_cli_corpus_stream_once(tmp_path, capsys):
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="test-cli-stream")
    d = tmp_path / "feed"
    d.mkdir()
    (d / "b1.jsonl").write_text(
        _json.dumps({"doc_id": 1, "text": f"<p>{GOOD}</p>"}) + "\n"
        + _json.dumps({"doc_id": 2, "text": BAD})
    )
    outp = str(tmp_path / "curated")
    stats = str(tmp_path / "stats")
    ckpt = str(tmp_path / "ckpt")
    assert main(["corpus", "stream", "--input", str(d), "--output", outp,
                 "--stats", stats, "--checkpoint", ckpt]) == 0
    err = capsys.readouterr().err
    assert "2 in, 1 kept" in err
    assert spark.read.parquet(outp).first()["text"] == GOOD
    # usage errors
    assert main(["corpus", "stream", "--input", str(d)]) == 2


def test_cli_corpus_stream_with_classify_stage(tmp_path, capsys):
    """--stages resolves classify weights json paths like the batch
    pipeline verb does."""
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="test-cli-stream-classify")
    d = tmp_path / "feed2"
    d.mkdir()
    (d / "b.jsonl").write_text(_json.dumps({"doc_id": 1, "text": GOOD}))
    # all-zero weights -> sigmoid 0.5 everywhere; threshold 0.4 keeps all
    wpath = tmp_path / "w.json"
    wpath.write_text(_json.dumps([0.0] * 65))
    spath = tmp_path / "stages.json"
    spath.write_text(_json.dumps(
        [{"op": "classify", "weights": str(wpath), "threshold": 0.4}]
    ))
    outp, stats, ckpt = (str(tmp_path / x) for x in ("o", "s", "c"))
    assert main(["corpus", "stream", "--input", str(d), "--output", outp,
                 "--stats", stats, "--checkpoint", ckpt,
                 "--stages", str(spath)]) == 0
    assert "1 in, 1 kept" in capsys.readouterr().err
