"""Unit tests for operators/quality.py: repetition signals, PII
redaction, benchmark decontamination — crafted inputs with hand-computed
expectations (the gate suite covers the DuckDB parity side)."""

from __future__ import annotations

import pyspark.sql.functions as F

from blq_cli_spark.operators import quality


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_profile_hand_computed(spark):
    df = _docs(
        spark,
        [
            (1, "spam spam spam spam"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "go stop go stop go"),
        ],
    )
    out = {
        r["id"]: r
        for r in quality.repetition_profile(df).collect()
    }
    # doc 1: all four tokens identical; all 3 bigrams and 2 trigrams dup'd
    assert out[1]["n_tokens"] == 4
    assert out[1]["top_token_ratio"] == 1.0
    assert out[1]["dup_2gram_ratio"] == 1.0
    assert out[1]["dup_3gram_ratio"] == 1.0
    # doc 2: no repetition anywhere
    assert out[2]["top_token_ratio"] == 0.2
    assert out[2]["dup_2gram_ratio"] == 0.0
    assert out[2]["dup_3gram_ratio"] == 0.0
    # doc 3: "go" 3/5 tokens; bigrams: [go stop, stop go, go stop, stop go]
    # -> all 4 dup'd; trigrams: [go stop go, stop go stop, go stop go]
    # -> "go stop go" x2 dup'd of 3 total
    assert out[3]["top_token_ratio"] == 0.6
    assert out[3]["dup_2gram_ratio"] == 1.0
    assert out[3]["dup_3gram_ratio"] == round(2 / 3, 6)


def test_repetition_profile_short_doc_null_ratios(spark):
    # a 2-token doc has no trigrams: dup_3gram_ratio must be NULL (no
    # rows), never a fabricated zero — same as the SQL oracle's semantics
    out = quality.repetition_profile(_docs(spark, [(1, "only two")])).collect()[0]
    assert out["n_tokens"] == 2
    assert out["dup_3gram_ratio"] is None


def test_pii_redaction_and_counts(spark):
    df = _docs(
        spark,
        [
            (
                1,
                "mail bob.smith+x@corp.example.org or admin@host.io, "
                "server 192.168.0.17, call +44 20 7946 0958 now",
            ),
            (2, "no pii here at all"),
        ],
    )
    out = {r["id"]: r for r in quality.pii_profile(df).collect()}
    assert out[1]["n_emails"] == 2
    assert out[1]["n_ipv4"] == 1
    assert out[1]["n_phones"] == 1
    red = out[1]["redacted"]
    assert "<EMAIL>" in red and "<IPV4>" in red and "<PHONE>" in red
    assert "bob.smith" not in red and "192.168" not in red and "7946" not in red
    assert out[2]["redacted"] == "no pii here at all"
    assert out[2]["n_emails"] == out[2]["n_ipv4"] == out[2]["n_phones"] == 0


def test_decontaminate_flags_overlap_and_broadcasts(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    corpus = _docs(
        spark,
        [
            # copies a 5-token span of the benchmark -> two distinct 4-grams
            (1, "intro text then quick brown fox jumps over and outro"),
            (2, "completely unrelated words in this document body here"),
        ],
    )
    hits = quality.decontaminate(corpus, bench, n=4)
    rows = {r["id"]: r for r in hits.collect()}
    assert set(rows) == {1}
    assert rows[1]["n_gram_hits"] == 2
    assert rows[1]["n_bench_docs"] == 1
    # the benchmark side must broadcast: the corpus never shuffles pre-join
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_repetition_profile_no_python_in_plan(spark):
    df = _docs(spark, [(1, "a b c a b c")])
    plan = (
        quality.repetition_profile(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_redact_pii_is_pure_projection(spark):
    df = _docs(spark, [(1, "x@y.io")])
    plan = quality.pii_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: scan-bound at any scale


def test_subword_token_count_bpe_pretokenization(spark):
    from blq_cli_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [(1, "can't stop won't stop (v2.0)")], "doc_id long, text string"
    )
    n = df.select(text_ops.subword_token_count(F.col("text")).alias("n")).collect()[0]["n"]
    # can|'|t|stop|won|'|t|stop|(|v|2|.|0|) -> 14
    assert n == 14


def test_winnow_fingerprints_shared_run_guarantee(spark):
    """Winnowing guarantee: two docs sharing a run of >= k+w-1 tokens
    (here 3+4-1 = 6) share at least one fingerprint; disjoint docs
    share none."""
    from blq_cli_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta unique1 tail1"),
            (2, "head2 alpha beta gamma delta epsilon zeta other2"),
            (3, "totally different words appear in this one here"),
        ],
        "doc_id long, text string",
    )
    fps = text_ops.winnow_fingerprints(df, k=3, w=4)
    by_doc = {
        i: {r["fp"] for r in fps.filter(F.col("id") == i).collect()} for i in (1, 2, 3)
    }
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3])
    # short doc (< k tokens) yields no fingerprints, not a crash
    short = spark.createDataFrame([(9, "too short")], "doc_id long, text string")
    assert text_ops.winnow_fingerprints(short, k=3, w=4).count() == 0


def test_remove_repeated_spans_hand_computed(spark):
    # span_tokens=3: doc 1 & 2 share the boilerplate span "a b c";
    # doc 3 is entirely its own content; doc 4 is ALL boilerplate.
    df = _docs(
        spark,
        [
            (1, "a b c x y z"),
            (2, "a b c p q r"),
            (3, "u v w m n o"),
            (4, "a b c"),
        ],
    )
    out = {
        r["id"]: r
        for r in quality.remove_repeated_spans(df, span_tokens=3, min_docs=2).collect()
    }
    assert out[1]["n_spans"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["clean_text"] == "x y z"
    assert out[2]["clean_text"] == "p q r"
    assert out[3]["n_kept"] == 2 and out[3]["clean_text"] == "u v w m n o"
    # fully-boilerplate doc survives as a row with empty text
    assert out[4]["n_spans"] == 1 and out[4]["n_kept"] == 0
    assert out[4]["clean_text"] == ""


def test_remove_repeated_spans_within_doc_repeat_survives(spark):
    # a span repeated WITHIN one doc is not cross-document boilerplate
    df = _docs(spark, [(1, "a b c a b c"), (2, "x y z w v u")])
    out = {
        r["id"]: r
        for r in quality.remove_repeated_spans(df, span_tokens=3, min_docs=2).collect()
    }
    assert out[1]["clean_text"] == "a b c a b c"
    assert out[1]["n_kept"] == 2


def test_remove_repeated_spans_count_join_not_hint_broadcast(spark):
    """The span-count table is corpus-derived and unbounded: the join
    back must not carry an unconditional broadcast hint (same contract
    as unigram_logprob's vocabulary join)."""
    df = _docs(spark, [(1, "a b c"), (2, "d e f")])
    plan = quality.remove_repeated_spans(df)._jdf.queryExecution().optimizedPlan().toString()
    import re

    joins = [ln for ln in plan.splitlines() if "Join" in ln]
    assert joins, plan
    assert not any("broadcast" in ln.lower() for ln in joins), joins


def test_remove_repeated_spans_no_python_in_plan(spark):
    df = _docs(spark, [(1, "a b c"), (2, "d e f")])
    out = quality.remove_repeated_spans(df)
    import io, contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "EvalPython" not in plan and "MapInPandas" not in plan, plan


def test_gopher_rules_hand_computed(spark):
    df = _docs(
        spark,
        [
            # 12 tokens, all alpha, has stopwords -> passes
            (1, "the quick brown fox jumps over the lazy dog in a field"),
            # too short
            (2, "too short"),
            # symbol spam: many # marks
            (3, "# # # # # # # # # the price of it is in the box now ok"),
            # numeric soup: alpha ratio fails
            (4, "1 2 3 4 5 6 7 8 9 10 the of a to in is it and more"),
        ],
    )
    out = {r["id"]: r for r in quality.gopher_rules(df).collect()}
    assert out[1]["passes"]
    assert not out[2]["token_count_ok"] and not out[2]["passes"]
    assert not out[3]["symbol_ratio_ok"] and not out[3]["passes"]
    assert not out[4]["alpha_word_ratio_ok"] and not out[4]["passes"]
    assert out[4]["stopwords_ok"]


def test_gopher_rules_zero_shuffle_zero_python(spark):
    df = _docs(spark, [(1, "a b c"), (2, "d e f")])
    out = quality.gopher_rules(df)
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree, tree
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_bigram_logprob_prefers_common_sequences(spark):
    """A doc made of the corpus's dominant bigram scores higher than a
    doc of the same tokens in an order never seen elsewhere."""
    df = _docs(
        spark,
        [
            (1, "go stop go stop go stop"),
            (2, "go stop go stop go stop"),
            (3, "go stop go stop go stop"),
            (4, "stop stop go go stop go"),
        ],
    )
    out = {r["id"]: r for r in quality.bigram_logprob(df).collect()}
    assert out[1]["n_bigrams"] == 5
    assert out[1]["avg_logprob"] == out[2]["avg_logprob"] == out[3]["avg_logprob"]
    assert out[1]["avg_logprob"] > out[4]["avg_logprob"]


def test_bigram_logprob_joins_not_hint_broadcast(spark):
    df = _docs(spark, [(1, "a b c"), (2, "b c d")])
    plan = (
        quality.bigram_logprob(df)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    joins = [ln for ln in plan.splitlines() if "Join" in ln]
    # exactly one broadcast hint: the single-row grand total
    assert sum("broadcast" in ln.lower() for ln in joins) <= 1, joins


def test_remove_repeated_spans_matches_across_whitespace_kinds(spark):
    """Tab/newline-separated boilerplate must match its space-separated
    twin (real web text regression from review)."""
    df = _docs(
        spark,
        [
            (1, "subscribe to\nour newsletter\textra words one two"),
            (2, "subscribe to our newsletter other body text here"),
        ],
    )
    out = {r["id"]: r for r in
           quality.remove_repeated_spans(df, span_tokens=4, min_docs=2).collect()}
    # the shared 4-token boilerplate span is detected despite \n and \t
    assert out[1]["n_kept"] < out[1]["n_spans"]
    assert not out[1]["clean_text"].startswith("subscribe")
    assert "\n" not in out[1]["clean_text"] and "\t" not in out[1]["clean_text"]


def test_chunk_documents_windows_and_edges(spark):
    """Hand-computed chunk boundaries: overlap windows, short docs give
    one chunk, empty docs give none, and the chunk set reassembles the
    document (every token appears in some chunk)."""
    from blq_cli_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),  # 10 tokens
            (2, "a b"),                              # short -> one chunk
            (3, "   "),                              # empty -> no chunks
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, size=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # stride 3: 10 tokens -> 1 + ceil(6/3) = 3 chunks
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["chunk_text"] for r in c1] == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9",
    ]
    assert [r["n_chunk_tokens"] for r in c1] == [4, 4, 4]
    assert [r["chunk_text"] for r in by_doc[2]] == ["a b"]
    assert 3 not in by_doc
    # ragged tail: 5 tokens, size 4, stride 3 -> second chunk is short
    tail = chunk_documents(
        spark.createDataFrame([(9, "x0 x1 x2 x3 x4")], "doc_id long, text string"),
        size=4, overlap=1,
    ).collect()
    assert sorted((r["chunk_idx"], r["chunk_text"]) for r in tail) == [
        (0, "x0 x1 x2 x3"), (1, "x3 x4"),
    ]


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest

    from blq_cli_spark.operators.text import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(docs, size=4, overlap=4)
    with _pytest.raises(ValueError):
        chunk_documents(docs, size=4, overlap=-1)


def test_chunk_documents_plan_no_shuffle_no_python(spark):
    """Chunking is a projection + generator: zero Exchange, zero Python
    in the plan."""
    import contextlib
    import io

    from blq_cli_spark.operators.text import chunk_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = chunk_documents(docs, size=32, overlap=8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_chunk_documents_matches_python_model_grid(spark):
    """Exhaustive grid (doc lengths 0..24 x several size/overlap combos)
    against a direct Python reference model — boundary arithmetic has no
    room to drift."""
    import math

    from blq_cli_spark.operators.text import chunk_documents

    def model(n, size, overlap):
        stride = size - overlap
        if n == 0:
            return []
        nc = 1 + math.ceil(max(0, n - size) / stride)
        toks = [f"t{j}" for j in range(n)]
        return [
            (i, " ".join(toks[i * stride : i * stride + size]))
            for i in range(nc)
        ]

    docs = spark.createDataFrame(
        [(n, " ".join(f"t{j}" for j in range(n))) for n in range(0, 25)],
        "doc_id long, text string",
    )
    for size, overlap in [(1, 0), (4, 0), (4, 1), (4, 3), (7, 2), (30, 5)]:
        got = {}
        for r in chunk_documents(docs, size=size, overlap=overlap).collect():
            got.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk_text"]))
        for n in range(0, 25):
            expect = model(n, size, overlap)
            assert sorted(got.get(n, [])) == expect, (n, size, overlap)


def test_perplexity_buckets_ccnet_terciles(spark):
    """Per-language terciles of the unigram score: common-token docs
    score high (head = bucket 2), rare-token docs low (tail = 0);
    buckets are per-language and near-equal-sized."""
    from blq_cli_spark.operators.quality import perplexity_buckets

    # 9 docs in one lang: three made of very common tokens, three mixed,
    # three of unique tokens -> clean tercile separation
    common = "the the the the"
    rows = []
    for i in range(3):
        rows.append((i, common, "en"))
    for i in range(3, 6):
        rows.append((i, f"the the u{i} u{i}x", "en"))
    for i in range(6, 9):
        rows.append((i, f"q{i}a q{i}b q{i}c q{i}d", "en"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["id"]: r["ppl_bucket"] for r in perplexity_buckets(docs).collect()}
    assert all(out[i] == 2 for i in range(3)), out        # head
    assert all(out[i] == 1 for i in range(3, 6)), out     # middle
    assert all(out[i] == 0 for i in range(6, 9)), out     # tail

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_buckets"):
        perplexity_buckets(docs, n_buckets=1)


def test_perplexity_buckets_null_lang_and_empty_text_survive(spark):
    """min_bucket=0 semantics: token-less docs land in the tail (bucket
    0, NULL score) and NULL lang is its own stratum — no row silently
    disappears."""
    from blq_cli_spark.operators.quality import perplexity_buckets

    docs = spark.createDataFrame(
        [
            (1, "the the the the", "en"),
            (2, "the the zq zqx", "en"),
            (3, "", "en"),                     # token-less -> tail
            (4, "the the the the", None),      # null lang stratum
            (5, "ab cd ef gh", None),
        ],
        "doc_id long, text string, lang string",
    )
    out = {r["id"]: r for r in perplexity_buckets(docs, n_buckets=2).collect()}
    assert set(out) == {1, 2, 3, 4, 5}  # every doc has a row
    assert out[3]["ppl_bucket"] == 0 and out[3]["avg_logprob"] is None
    assert out[3]["n_tokens"] == 0
    assert out[4]["lang"] is None and out[5]["lang"] is None
    # the null-lang stratum buckets among itself: common-token doc 4
    # above unique-token doc 5
    assert out[4]["ppl_bucket"] == 1 and out[5]["ppl_bucket"] == 0


def test_decontaminate_multi_attributes_benchmarks(spark):
    from blq_cli_spark.operators import quality

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "one two three four five"),
         (3, "totally clean words here now")],
        "doc_id long, text string",
    )
    benches = {
        "bench_a": spark.createDataFrame(
            [(100, "alpha beta gamma delta zeta")], "doc_id long, text string"
        ),
        "bench_b": spark.createDataFrame(
            [(200, "one two three four nine")], "doc_id long, text string"
        ),
    }
    got = {
        (r["id"], r["benchmark"]): r["n_gram_hits"]
        for r in quality.decontaminate_multi(corpus, benches, n=4).collect()
    }
    assert got == {(1, "bench_a"): 1, (2, "bench_b"): 1}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no benchmarks"):
        quality.decontaminate_multi(corpus, {})


def test_cli_decontaminate_multi(tmp_path, capsys):
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="test-cli-deconmulti")
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon", "web")],
        "doc_id long, text string, source string",
    ).write.parquet(src)
    b1 = str(tmp_path / "mmlu.parquet")
    spark.createDataFrame(
        [(9, "alpha beta gamma delta", "b")],
        "doc_id long, text string, source string",
    ).write.parquet(b1)
    b2 = str(tmp_path / "gsm.parquet")
    spark.createDataFrame(
        [(8, "unrelated benchmark words entirely", "b")],
        "doc_id long, text string, source string",
    ).write.parquet(b2)
    assert main(["corpus", "decontaminate", "--input", src,
                 "--benchmark", f"{b1},{b2}"]) == 0
    out = capsys.readouterr().out
    assert "mmlu" in out and "benchmark" in out
