"""BPE tokenizer induction (operators/tokenizer.py): merge learning
matches the canonical Sennrich walk-through, the distributed encode
matches the driver-side rule word-for-word under any partitioning, and
the corpus phase keeps the scale shape (TakeOrdered top-K, no shuffle
in the encode pass)."""

from __future__ import annotations

import contextlib
import io
import json

from blq_cli_spark.operators import tokenizer as tok

SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_bpe_train_matches_sennrich_example():
    # arXiv:1508.07909 §3.2 walk-through: es, est, est</w>, lo, low
    merges = tok.bpe_train(SENNRICH, n_merges=5)
    assert merges == [
        ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"),
    ]
    ranks = {p: i for i, p in enumerate(merges)}
    assert tok.encode_word("lowest", ranks) == ["low", "est</w>"]
    assert tok.encode_word("low", ranks) == ["low", "</w>"]
    assert tok.encode_word("unseen", ranks) == ["u", "n", "s", "e", "e", "n", "</w>"]


def test_bpe_train_deterministic_and_exhausts():
    # asking for more merges than exist stops cleanly; reruns identical
    a = tok.bpe_train([("ab", 2)], n_merges=100)
    b = tok.bpe_train([("ab", 2)], n_merges=100)
    assert a == b == [("a", "b"), ("ab", "</w>")]
    assert tok.bpe_train([], n_merges=5) == []


def test_encode_word_concat_roundtrip():
    merges = tok.bpe_train(SENNRICH, n_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("low", "lowest", "newest", "wide", "xyz"):
        pieces = tok.encode_word(w, ranks)
        assert "".join(pieces) == w + tok.END


def test_word_frequencies_topk_tiebreak(spark):
    docs = spark.createDataFrame(
        [(1, "b b a a c"), (2, "  "), (3, None)],
        "doc_id long, text string",
    )
    got = [(r["word"], r["n"])
           for r in tok.word_frequencies(docs, top_k=2).collect()]
    assert got == [("a", 2), ("b", 2)]  # count desc, word asc; c cut
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        tok.word_frequencies(docs, top_k=2).explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_bpe_encode_matches_driver_rule_any_partitioning(spark):
    rows = [(i, f"low lower newest widest w{i % 5}") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = tok.bpe_train(SENNRICH, n_merges=8)
    ranks = {p: i for i, p in enumerate(merges)}
    expect = {}
    for i, text in rows:
        pieces = [p for w in text.split() for p in tok.encode_word(w, ranks)]
        expect[i] = (len(text.split()), len(pieces))
    for df in (docs, docs.repartition(13)):
        got = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
               for r in tok.bpe_encode(df, merges).collect()}
        assert got == expect
    # with_tokens carries the pieces themselves
    row = (tok.bpe_encode(docs.limit(1), merges, with_tokens=True)
           .collect()[0])
    assert row["bpe_tokens"][:2] == ["low", "</w>"]
    # null text encodes to zero tokens, row preserved
    nulls = spark.createDataFrame([(9, None)], "doc_id long, text string")
    r = tok.bpe_encode(nulls, merges).collect()[0]
    assert (r["n_words"], r["n_bpe_tokens"]) == (0, 0)


def test_bpe_encode_plan_no_shuffle(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        tok.bpe_encode(docs, [("a", "b")]).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan  # one linear Arrow-batched pass


def test_bpe_fertility_learned_vocab(spark):
    docs = spark.createDataFrame(
        [(1, "low low newest", "en"), (2, "qqq zzz", "xx")],
        "doc_id long, text string, lang string",
    )
    merges = tok.bpe_train(SENNRICH, n_merges=5)
    got = {r["lang"]: r for r in tok.bpe_fertility(docs, merges).collect()}
    # en: low -> [low, </w>] x2, newest -> [n, e, w, est</w>] = 8 / 3 words
    assert got["en"]["n_words"] == 3 and got["en"]["n_subwords"] == 8
    assert got["en"]["fertility"] == round(8 / 3, 6)
    # xx: wholly unseen chars fall back to char-level (4+4 pieces)
    assert got["xx"]["n_subwords"] == 8 and got["xx"]["fertility"] == 4.0


def test_train_tokenizer_end_to_end(spark):
    docs = spark.createDataFrame(
        [(i, "low lower newest widest") for i in range(20)],
        "doc_id long, text string",
    )
    merges = tok.train_tokenizer(docs, n_merges=5, top_k_words=100)
    assert merges[:3] == [("e", "s"), ("es", "t"), ("est", "</w>")]


def test_cli_train_encode_roundtrip(tmp_path, capsys):
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="test-cli-tok")
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, "low lower newest widest", "en") for i in range(10)],
        "doc_id long, text string, lang string",
    ).write.parquet(src)
    mpath = str(tmp_path / "merges.json")

    assert main(["corpus", "train-tokenizer", "--input", src,
                 "--merges", mpath, "--n-merges", "5"]) == 0
    saved = json.loads(open(mpath).read())
    assert saved[:2] == [["e", "s"], ["es", "t"]]
    capsys.readouterr()

    assert main(["corpus", "encode", "--input", src,
                 "--merges", mpath]) == 0
    out = capsys.readouterr().out
    assert "n_bpe_tokens" in out

    assert main(["corpus", "bpe-fertility", "--input", src,
                 "--merges", mpath]) == 0
    assert "fertility" in capsys.readouterr().out

    # encode without --merges is an exit-code-2 usage error
    assert main(["corpus", "encode", "--input", src]) == 2


def test_cli_encode_with_tokens(tmp_path, capsys):
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="test-cli-tok2")
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "low low")], "doc_id long, text string"
    ).write.parquet(src)
    mpath = str(tmp_path / "m.json")
    assert main(["corpus", "train-tokenizer", "--input", src,
                 "--merges", mpath, "--n-merges", "3"]) == 0
    capsys.readouterr()
    assert main(["corpus", "encode", "--input", src, "--merges", mpath,
                 "--with-tokens"]) == 0
    assert "bpe_tokens" in capsys.readouterr().out
