"""Corpus-prep funnel: per-stage counts are monotone, the materialized
survivor set matches the funnel's sample stage, and the whole thing is
deterministic across invocations."""

from __future__ import annotations

import pyspark.sql.functions as F

from blq_cli_spark.operators import corpus
from blq_cli_spark.sources.tables import table

SF = "/root/testdata/sf0.001"


def test_funnel_monotone_and_complete(spark):
    docs = table(spark, SF, "documents")
    rows = {r["stage"]: r for r in corpus.funnel_stats(docs).collect()}
    assert list(corpus.STAGES) == sorted(rows, key=lambda s: rows[s]["stage_idx"])
    counts = [rows[s]["n_docs"] for s in corpus.STAGES]
    assert counts[0] == docs.count()
    assert all(a >= b for a, b in zip(counts, counts[1:]))  # cumulative filters
    assert counts[-1] > 0  # the sample stage keeps something at sf0.001


def test_materialize_matches_sample_stage(spark):
    docs = table(spark, SF, "documents")
    stats = {r["stage"]: r["n_docs"] for r in corpus.funnel_stats(docs).collect()}
    out = corpus.materialize(docs)
    assert out.count() == stats["sample"]
    # survivors are actual source rows (semi-join preserves schema)
    assert out.columns == docs.columns
    # deterministic: same ids every run
    ids1 = {r["doc_id"] for r in out.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in corpus.materialize(docs).select("doc_id").collect()}
    assert ids1 == ids2


def test_funnel_knobs_change_stages_only_downstream(spark):
    docs = table(spark, SF, "documents")
    loose = {r["stage"]: r["n_docs"] for r in corpus.funnel_stats(docs, min_tokens=1).collect()}
    tight = {r["stage"]: r["n_docs"] for r in corpus.funnel_stats(docs, min_tokens=50).collect()}
    assert loose["raw"] == tight["raw"]  # raw unaffected by knobs
    assert loose["min_tokens"] >= tight["min_tokens"]
    assert loose["sample"] >= tight["sample"]


def test_inverted_index_matches_direct_search(spark, tmp_path):
    from blq_cli_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [
            (1, "spark scan join join"),
            (2, "join scan"),
            (3, "spark spark join scan window"),
            (4, "window only here"),
        ],
        "doc_id long, text string",
    )
    terms = ["spark", "join", "scan"]
    direct = {
        r["doc_id"]: r["score"]
        for r in text_ops.search_all_terms(docs, terms).collect()
    }
    # materialize partitioned by term (the pruning layout), search the index
    path = str(tmp_path / "invidx")
    text_ops.build_inverted_index(docs).write.partitionBy("term").parquet(path)
    idx = spark.read.parquet(path)
    via_index = {
        r["doc_id"]: r["score"]
        for r in text_ops.search_index(idx, terms).collect()
    }
    assert direct == via_index == {1: 4, 3: 4}
    # the index scan prunes to the query terms' partitions
    plan = idx.filter(idx.term.isin(*terms))._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_neardup_dedup_end_to_end(spark):
    """Composed pipeline: LSH pairs -> components -> representatives.
    Three exact-ish duplicate groups collapse to one kept doc each; the
    kept doc is the highest-quality member."""
    from blq_cli_spark.operators import corpus

    body = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through a long meadow of example text for dedup"
    )
    docs = spark.createDataFrame(
        [
            (1, body),
            (2, body),                      # exact dup of 1
            (3, body + " trailing extra"),  # near dup of 1
            (10, "a completely different document about spark shuffles "
                 "and the partitioning of large distributed joins today"),
            (11, "short unique"),
        ],
        "doc_id long, text string",
    )
    kept = corpus.neardup_dedup(docs)
    ids = sorted(r["doc_id"] for r in kept.collect())
    # group {1,2,3} -> one survivor; 10 and 11 untouched
    assert len(ids) == 3 and 10 in ids and 11 in ids
    assert len({1, 2, 3} & set(ids)) == 1
    assert set(kept.columns) == {"doc_id", "text"}


def test_mix_sources_deterministic_and_rate_bounded(spark):
    from blq_cli_spark.operators import corpus

    docs = spark.createDataFrame(
        [(i, f"s{i % 2}") for i in range(2000)], "doc_id long, source string"
    )
    rates = {"s0": 0.25, "s1": 1.0}
    kept = corpus.mix_sources(docs, rates)
    counts = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # rate 1.0 keeps EVERY row (threshold 'g' sorts above all hex)
    assert counts["s1"] == 1000
    # rate 0.25 keeps ~64/256 of rows — binomial(1000, .25): wide bounds
    assert 175 <= counts["s0"] <= 325
    # deterministic: a second evaluation yields the identical id set
    ids1 = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in corpus.mix_sources(docs, rates).select("doc_id").collect())
    assert ids1 == ids2


def test_mix_sources_unknown_source_uses_default_rate(spark):
    from blq_cli_spark.operators import corpus

    docs = spark.createDataFrame(
        [(i, "unknown") for i in range(100)], "doc_id long, source string"
    )
    assert corpus.mix_sources(docs, {"s0": 1.0}).count() == 0  # default 0.0
    assert corpus.mix_sources(docs, {}, default_rate=1.0).count() == 100


def test_neardup_dedup_simhash_method(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "completely different text with other words entirely"),
        ],
        "doc_id long, text string",
    )
    kept = corpus.neardup_dedup(docs, method="simhash")
    ids = {r["doc_id"] for r in kept.collect()}
    assert 3 in ids and len(ids & {1, 2}) == 1  # identical pair collapsed
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown dedup method"):
        corpus.neardup_dedup(docs, method="nope")


def test_pipeline_composes_stages_end_to_end(spark):
    """One declarative spec: rule filter -> boilerplate rewrite -> exact
    dedup -> fuzzy dedup. Planted spam, shared boilerplate, and
    duplicates each fall out at the right stage."""
    from blq_cli_spark.operators import corpus as corpus_ops

    boiler = "subscribe to our newsletter for more updates and offers today"
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} the quick brown fox jumps over the lazy dog again", "web"),
            (2, f"{boiler} a completely different body of useful text is here", "web"),
            # exact duplicate of 1
            (3, f"{boiler} the quick brown fox jumps over the lazy dog again", "web"),
            # too short -> gopher kills it
            (4, "tiny", "web"),
        ],
        "doc_id long, text string, source string",
    )
    out, audit = corpus_ops.pipeline(
        docs,
        [
            {"op": "gopher"},
            {"op": "exact-dedup"},
            {"op": "clean-spans", "span_tokens": 10, "min_docs": 2},
        ],
        audit=True,
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    # doc 4 gone (rules), doc 3 gone (exact dup of 1 — deduped BEFORE
    # span cleaning so duplicate mass doesn't mark its own content as
    # boilerplate), shared boilerplate prefix stripped from survivors
    assert set(rows) == {1, 2}
    assert not rows[1]["text"].startswith("subscribe")
    assert rows[1]["text"].endswith("again")
    # schema preserved through every stage
    assert set(rows[1].asDict()) == {"doc_id", "text", "source"}
    assert [a["op"] for a in audit] == ["gopher", "exact-dedup", "clean-spans"]
    assert audit[0]["rows"] == 3 and audit[-1]["rows"] == 2


def test_pipeline_classify_and_decontaminate_stages(spark):
    from blq_cli_spark.operators import classifier, corpus as corpus_ops

    pos = spark.createDataFrame(
        [(i, "careful analysis research evidence the method") for i in range(20)],
        "doc_id long, text string",
    )
    neg = spark.createDataFrame(
        [(100 + i, "buy click free winner casino pills") for i in range(20)],
        "doc_id long, text string",
    )
    w = classifier.train_text_classifier(pos, neg, dim=64, iters=10)
    bench = spark.createDataFrame(
        [(1, "held out benchmark question text appears here")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "careful analysis research evidence the method works"),
            (2, "buy click free winner casino pills now"),
            (3, "careful research on held out benchmark question text appears here"),
        ],
        "doc_id long, text string",
    )
    out = corpus_ops.pipeline(
        docs,
        [
            {"op": "classify", "weights": w, "threshold": 0.5},
            {"op": "decontaminate", "benchmark": bench, "n": 4},
        ],
    )
    assert {r["doc_id"] for r in out.collect()} == {1}


def test_pipeline_unknown_op_raises(spark):
    from blq_cli_spark.operators import corpus as corpus_ops

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown op"):
        corpus_ops.pipeline(docs, [{"op": "nope"}])


def test_pack_sequences_matches_naive_cumsum_and_partitioning_invariant(spark):
    """The distributed prefix-sum must equal the naive single-window
    cumsum, and be identical under different input partitionings."""
    import random

    from blq_cli_spark.operators import corpus as corpus_ops

    rng = random.Random(9)
    rows = [(i, " ".join("w" for _ in range(rng.randint(1, 40)))) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out1 = {r["id"]: r for r in
            corpus_ops.pack_sequences(docs, capacity_tokens=100, id_buckets=16).collect()}
    out2 = {r["id"]: r for r in
            corpus_ops.pack_sequences(docs.repartition(32), capacity_tokens=100,
                                      id_buckets=5).collect()}
    # naive reference
    acc = 0
    for i, text in rows:
        n = len(text.split())
        assert out1[i]["n_tokens"] == n
        assert out1[i]["offset"] == acc, i
        assert out1[i]["bin"] == acc // 100
        assert out2[i]["offset"] == acc
        acc += n
    # bins fill to capacity: every bin except possibly the last sees
    # at least `capacity` tokens pass through it
    n_bins = max(r["bin"] for r in out1.values()) + 1
    assert n_bins == (acc + 99) // 100 or n_bins <= (acc // 100) + 1


def test_pack_sequences_no_single_partition_global_window(spark):
    """The plan must not contain a global (empty-partition-spec) window:
    the whole point is the range-split prefix sum."""
    import contextlib, io

    from blq_cli_spark.operators import corpus as corpus_ops

    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(50)], "doc_id long, text string"
    )
    out = corpus_ops.pack_sequences(docs)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Window" in plan
    # a global window shows as 'Window [...], [id ASC...]' with a
    # SinglePartition exchange feeding it; our window partitions by _rng
    assert "_rng" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_pack_sequences_precomputed_tokens_col(spark):
    from blq_cli_spark.operators import corpus as corpus_ops

    # nt deliberately DIFFERS from token_count(text) ("a b c" -> 3) so a
    # regression to re-tokenizing would fail, not pass by coincidence
    docs = spark.createDataFrame(
        [(i, "a b c", 5) for i in range(10)], "doc_id long, text string, nt long"
    )
    out = {r["id"]: r for r in
           corpus_ops.pack_sequences(docs, capacity_tokens=10, tokens_col="nt").collect()}
    assert out[0]["n_tokens"] == 5
    assert out[0]["offset"] == 0 and out[9]["offset"] == 45
    assert out[9]["bin"] == 4


def test_temperature_rates_flatten_small_sources(spark):
    from blq_cli_spark.operators import corpus as corpus_ops

    docs = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        "doc_id long, source string",
    )
    natural = corpus_ops.temperature_rates(docs, alpha=1.0)
    assert abs(natural["big"] - 1.0) < 1e-9 and abs(natural["small"] - 1.0) < 1e-9
    flat = corpus_ops.temperature_rates(docs, alpha=0.5)
    # alpha<1 up-weights the small source: it keeps everything while the
    # big source is sampled down
    assert flat["small"] == 1.0
    assert flat["big"] < 0.5
    # composes with mix_sources: kept counts follow the rates
    kept = corpus_ops.mix_sources(docs, flat)
    counts = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["small"] == 100
    assert counts["big"] < 550


def test_pipeline_dedup_stage_incremental_signatures(spark, tmp_path):
    """A pipeline dedup stage with a signatures path dedups batch 2
    against batch 1's persisted state — the continuous-ingest form of
    the declarative pipeline."""
    from blq_cli_spark.operators import corpus as corpus_ops

    body = ("the quick brown fox jumps over the lazy dog and keeps going "
            "through the meadow of shared example text for dedup")
    sig = str(tmp_path / "sigs.parquet")
    b1 = spark.createDataFrame(
        [(1, body), (2, "totally different first-batch document body here")],
        "doc_id long, text string",
    )
    out1 = corpus_ops.pipeline(b1, [{"op": "dedup", "signatures": sig}])
    assert {r["doc_id"] for r in out1.collect()} == {1, 2}
    b2 = spark.createDataFrame(
        [(10, body + " extra"), (11, "a brand new unique second-batch text")],
        "doc_id long, text string",
    )
    out2 = corpus_ops.pipeline(b2, [{"op": "dedup", "signatures": sig}])
    # 10 matches batch 1's stored doc -> dropped; 11 survives
    assert {r["doc_id"] for r in out2.collect()} == {11}


def test_pipeline_select_stage_keeps_doc_schema(spark):
    """A `select` stage resamples toward the target and keeps the docs
    schema (semi-join on id), so it composes with downstream stages."""
    import pyspark.sql.functions as F

    from blq_cli_spark.operators import corpus as corpus_ops

    rows = [(i, "def class import return yield " * 3, "code") for i in range(8)]
    rows += [(i, "the quick brown fox jumps over " * 3, "web") for i in range(8, 40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    target = docs.filter(F.col("source") == "code")
    out = corpus_ops.pipeline(docs, [{"op": "select", "target": target, "n": 10}])
    assert out.columns == docs.columns
    got = out.collect()
    assert len(got) == 10
    assert sum(1 for r in got if r["source"] == "code") >= 6


def test_exact_dedup_against_history_incremental(spark, tmp_path):
    """Batch-over-batch exact dedup with the Bloom fast path: batch 1
    seeds the state; batch 2 drops exact copies of batch 1 AND its own
    in-batch copies; the result equals a full recompute over both
    batches; state survives for batch 3."""
    import os

    from blq_cli_spark.operators import corpus as corpus_ops

    hist = str(tmp_path / "exact_state")
    os.makedirs(hist)
    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta"), (3, "alpha beta gamma")],
        "doc_id long, text string",
    )
    out1 = corpus_ops.exact_dedup_against_history(b1, hist)
    assert {r["doc_id"] for r in out1.collect()} == {1, 2}  # 3 is an in-batch dup
    assert os.path.exists(f"{hist}/bloom.json")

    b2 = spark.createDataFrame(
        [
            (10, "alpha beta gamma"),        # dup of stored doc 1
            (11, "eta theta iota"),          # new
            (12, "  alpha   beta gamma  "),  # dup modulo whitespace norm
            (13, "eta theta iota"),          # in-batch dup of 11
        ],
        "doc_id long, text string",
    )
    out2 = corpus_ops.exact_dedup_against_history(b2, hist)
    assert {r["doc_id"] for r in out2.collect()} == {11}

    b3 = spark.createDataFrame(
        [(20, "eta theta iota"), (21, "kappa lambda mu")],
        "doc_id long, text string",
    )
    out3 = corpus_ops.exact_dedup_against_history(b3, hist)
    assert {r["doc_id"] for r in out3.collect()} == {21}
    # schema rides through unchanged
    assert out3.columns == ["doc_id", "text"]


def test_training_shuffle_matches_naive_global_rank(spark):
    """The distributed hex-prefix-bucket rank must equal the naive
    ROW_NUMBER-over-everything order, under any partitioning and any
    bucket count."""
    import hashlib

    from blq_cli_spark.operators import corpus as corpus_ops

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(400)], "doc_id long, text string"
    )
    naive = sorted(
        range(400),
        key=lambda i: (hashlib.md5(f"{i}\x1f3".encode()).hexdigest(), i),
    )
    expect = {i: r for r, i in enumerate(naive)}
    for df, buckets in [(docs, 64), (docs.repartition(17), 5), (docs, 1)]:
        got = {
            r["id"]: r["shuffle_rank"]
            for r in corpus_ops.training_shuffle(
                df, seed=3, rank_buckets=buckets
            ).collect()
        }
        assert got == expect, buckets


def test_training_shuffle_seed_changes_order_and_is_dense(spark):
    from blq_cli_spark.operators import corpus as corpus_ops

    docs = spark.createDataFrame(
        [(i, "x") for i in range(100)], "doc_id long, text string"
    )
    a = {r["id"]: r["shuffle_rank"]
         for r in corpus_ops.training_shuffle(docs, seed=0).collect()}
    b = {r["id"]: r["shuffle_rank"]
         for r in corpus_ops.training_shuffle(docs, seed=1).collect()}
    assert sorted(a.values()) == list(range(100))  # dense 0..n-1
    assert sorted(b.values()) == list(range(100))
    assert a != b  # a different seed is a different permutation


def test_training_shuffle_no_single_partition_window(spark):
    """The rank window must partition by the hash-prefix bucket — never
    a global SinglePartition sort."""
    import contextlib, io

    from blq_cli_spark.operators import corpus as corpus_ops

    docs = spark.createDataFrame(
        [(i, "x") for i in range(50)], "doc_id long, text string"
    )
    out = corpus_ops.training_shuffle(docs)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Window" in plan
    assert "_bkt" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_training_shuffle_empty_input(spark):
    from blq_cli_spark.operators import corpus as corpus_ops

    docs = spark.createDataFrame([], "doc_id long, text string")
    out = corpus_ops.training_shuffle(docs)
    assert out.columns == ["id", "shuffle_key", "shuffle_rank"]
    assert out.count() == 0


def test_stratified_sample_matches_naive_per_source_rank(spark):
    """Distributed per-(source, bucket) rank == naive per-source
    ROW_NUMBER, under different partitionings and bucket counts, with
    EXACT per-source counts."""
    import hashlib
    from collections import defaultdict

    from blq_cli_spark.operators import corpus as corpus_ops

    rows = [(i, f"d{i}", ["web", "books", "code"][i % 3]) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    by_src = defaultdict(list)
    for i, _, src in rows:
        by_src[src].append(i)
    expect = {}
    for src, ids in by_src.items():
        order = sorted(
            ids, key=lambda i: (hashlib.md5(f"{i}\x1f3".encode()).hexdigest(), i)
        )
        for r, i in enumerate(order[:7]):
            expect[i] = r
    for df, buckets in [(docs, 64), (docs.repartition(13), 4), (docs, 1)]:
        got = {
            r["doc_id"]: r["sample_rank"]
            for r in corpus_ops.stratified_sample(
                df, 7, seed=3, rank_buckets=buckets
            ).collect()
        }
        assert got == expect, buckets


def test_stratified_sample_schema_rides_through_and_counts_exact(spark):
    from blq_cli_spark.operators import corpus as corpus_ops

    docs = spark.createDataFrame(
        [(i, f"d{i}", "only", i * 2) for i in range(50)],
        "doc_id long, text string, source string, extra long",
    )
    out = corpus_ops.stratified_sample(docs, 5)
    assert out.columns == ["doc_id", "text", "source", "extra", "sample_rank"]
    assert out.count() == 5
    # asking for more than a source has keeps everything
    assert corpus_ops.stratified_sample(docs, 500).count() == 50


def test_stratified_sample_plan_no_per_source_global_window(spark):
    """The window must partition by (source, _bkt) and the base offsets
    must arrive via a broadcast join — never one task per source."""
    import contextlib, io

    from blq_cli_spark.operators import corpus as corpus_ops

    docs = spark.createDataFrame(
        [(i, "x", f"s{i % 3}") for i in range(60)],
        "doc_id long, text string, source string",
    )
    out = corpus_ops.stratified_sample(docs, 5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Window" in plan
    assert "_bkt" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_stratified_sample_empty_input(spark):
    from blq_cli_spark.operators import corpus as corpus_ops

    docs = spark.createDataFrame([], "doc_id long, text string, source string")
    out = corpus_ops.stratified_sample(docs, 5)
    assert out.count() == 0
    assert "sample_rank" in out.columns


def test_upsample_sources_fractional_epochs(spark):
    """rate 2.5 -> two guaranteed copies + ~half get a third; rate < 1
    selects exactly the same rows mix_sources(rate) selects; epoch is a
    dense 0-based copy index."""
    import hashlib

    from blq_cli_spark.operators import corpus as corpus_ops

    rows = [(i, f"d{i}", ["a", "b", "c"][i % 3]) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = corpus_ops.upsample_sources(
        docs, {"a": 2.5, "b": 1.0, "c": 0.5}, default_rate=0.0
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    frac = lambda i, t: hashlib.md5(str(i).encode()).hexdigest()[:2] < t
    for i, _, src in rows:
        epochs = sorted(by_doc.get(i, []))
        if src == "a":
            assert epochs == ([0, 1, 2] if frac(i, "80") else [0, 1]), i
        elif src == "b":
            assert epochs == [0], i
        else:
            assert epochs == ([0] if frac(i, "80") else []), i
    # rate<1 agrees with mix_sources row-for-row
    mixed = {r["doc_id"] for r in corpus_ops.mix_sources(
        docs.filter("source = 'c'"), {"c": 0.5}).collect()}
    assert {i for i, eps in by_doc.items() if i % 3 == 2 and eps} == mixed


def test_upsample_sources_plan_no_corpus_shuffle(spark):
    import contextlib, io

    from blq_cli_spark.operators import corpus as corpus_ops

    docs = spark.createDataFrame(
        [(i, "x", "a") for i in range(20)], "doc_id long, text string, source string"
    )
    out = corpus_ops.upsample_sources(docs, {"a": 3.0})
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, plan
    # the only exchange is the broadcast of the rate dim
    assert "Exchange hashpartitioning" not in plan, plan
    assert out.columns == ["doc_id", "text", "source", "epoch"]


def test_pipeline_sample_stage_exact_budget_keeps_schema(spark):
    from blq_cli_spark.operators import corpus as corpus_ops

    docs = spark.createDataFrame(
        [(i, f"d{i}", f"s{i % 2}", i) for i in range(40)],
        "doc_id long, text string, source string, extra long",
    )
    out = corpus_ops.pipeline(docs, [{"op": "sample", "n": 3}])
    assert out.columns == docs.columns  # semi-join: schema rides through
    counts = {r["source"]: r["count"]
              for r in out.groupBy("source").count().collect()}
    assert counts == {"s0": 3, "s1": 3}


def test_stratified_sample_null_source_is_its_own_stratum(spark):
    from blq_cli_spark.operators import corpus as corpus_ops

    docs = spark.createDataFrame(
        [(i, "x", "a" if i < 10 else None) for i in range(20)],
        "doc_id long, text string, source string",
    )
    out = corpus_ops.stratified_sample(docs, 4)
    counts = {r["source"]: r["count"]
              for r in out.groupBy("source").count().collect()}
    assert counts == {"a": 4, None: 4}


def test_tokenizer_fertility_hand_computed(spark):
    from blq_cli_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [
            (1, "hello world", "en"),        # 2 words, 2 subwords
            (2, "don't stop", "en"),         # 2 words, 4 subwords (don ' t stop)
            (3, "a1b2", "de"),               # 1 word, 4 subwords (a 1 b 2)
        ],
        "doc_id long, text string, lang string",
    )
    out = {r["lang"]: r for r in text_ops.tokenizer_fertility(docs).collect()}
    assert out["en"]["n_docs"] == 2
    assert out["en"]["n_words"] == 4 and out["en"]["n_subwords"] == 6
    assert out["en"]["fertility"] == 1.5
    assert out["de"]["n_words"] == 1 and out["de"]["n_subwords"] == 4
    assert out["de"]["fertility"] == 4.0


def test_write_training_shards_global_order_replayed(spark, tmp_path):
    """Reading shard files in filename order replays the exact global
    permutation: each file is internally rank-ordered and file ranges
    are contiguous."""
    import glob
    import hashlib

    import pyarrow.parquet as pq

    from blq_cli_spark.operators import corpus as corpus_ops

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(200)], "doc_id long, text string"
    )
    path = str(tmp_path / "shards")
    corpus_ops.write_training_shards(docs, path, shards=4, seed=3)
    files = sorted(glob.glob(path + "/part-*.parquet"))
    assert len(files) == 4
    replayed = []
    for f in files:
        t = pq.read_table(f).to_pylist()
        ranks = [r["shuffle_rank"] for r in t]
        assert ranks == sorted(ranks)  # internally ordered
        replayed.extend(t)
    assert [r["shuffle_rank"] for r in replayed] == list(range(200))
    # and the permutation is the md5(id, seed) order
    naive = sorted(
        range(200),
        key=lambda i: (hashlib.md5(f"{i}\x1f3".encode()).hexdigest(), i),
    )
    assert [r["doc_id"] for r in replayed] == naive


def test_pipeline_buckets_stage_drops_tail(spark):
    """CCNet keep stage: tail-bucket (gibberish-scored) docs fall out,
    schema rides through."""
    from blq_cli_spark.operators import corpus as corpus_ops

    common = "the quick brown fox jumps over the lazy dog"
    rows = [(i, common, "en", "web") for i in range(6)]
    # three gibberish docs: all-unique tokens -> lowest unigram scores
    rows += [(i, f"zq{i}a zq{i}b zq{i}c zq{i}d zq{i}e zq{i}f zq{i}g zq{i}h zq{i}i",
              "en", "web") for i in range(6, 9)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = corpus_ops.pipeline(docs, [{"op": "buckets", "min_bucket": 1}])
    assert out.columns == docs.columns
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == set(range(6))  # gibberish tail dropped


def test_write_training_shards_rejects_rank_collision(spark, tmp_path):
    import pytest as _pytest

    from blq_cli_spark.operators import corpus as corpus_ops

    docs = spark.createDataFrame(
        [(1, "x", 0)], "doc_id long, text string, shuffle_rank long"
    )
    with _pytest.raises(ValueError, match="shuffle_rank"):
        corpus_ops.write_training_shards(docs, str(tmp_path / "s"))


def test_pipeline_buckets_stage_min_bucket_zero_keeps_everything(spark):
    from blq_cli_spark.operators import corpus as corpus_ops

    docs = spark.createDataFrame(
        [(1, "the the the", "en"), (2, "", None), (3, "zq zr zs", "en")],
        "doc_id long, text string, lang string",
    )
    out = corpus_ops.pipeline(docs, [{"op": "buckets", "min_bucket": 0}])
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 3}


def test_packing_report_hand_computed(spark):
    from blq_cli_spark.operators import corpus as corpus_ops

    # ids in order, 6 tokens each, capacity 10: offsets 0,6,12,18 ->
    # bins 0,0,1,1; fills: bin0=12, bin1=12 (greedy overflow counts
    # toward the bin the offset lands in)
    docs = spark.createDataFrame(
        [(i, "a b c d e f") for i in range(4)], "doc_id long, text string"
    )
    r = corpus_ops.packing_report(docs, capacity_tokens=10).collect()[0]
    assert r["n_bins"] == 2 and r["n_docs"] == 4 and r["total_tokens"] == 24
    assert r["mean_fill_ratio"] == 1.2 and r["min_fill_ratio"] == 1.2
    assert r["full_bin_share"] == 1.0


def test_token_budget_sample_matches_naive_cumsum(spark):
    """Distributed per-(source, bucket) token prefix == naive per-source
    cumulative window; budgets bind per source; partitioning-invariant."""
    import hashlib
    from collections import defaultdict

    from blq_cli_spark.operators import corpus as corpus_ops

    rows = [
        (i, " ".join("w" for _ in range((i % 7) + 1)), ["a", "b"][i % 2])
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    by_src = defaultdict(list)
    for i, text, src in rows:
        by_src[src].append((i, len(text.split())))
    expect = {}
    for src, members in by_src.items():
        order = sorted(
            members,
            key=lambda m: (hashlib.md5(f"{m[0]}\x1f5".encode()).hexdigest(), m[0]),
        )
        acc = 0
        for i, n in order:
            if acc < 40:
                expect[i] = (n, acc)
            acc += n
    for df, buckets in [(docs, 64), (docs.repartition(11), 3)]:
        got = {
            r["doc_id"]: (r["n_tokens"], r["tokens_before"])
            for r in corpus_ops.token_budget_sample(
                df, 40, seed=5, rank_buckets=buckets
            ).collect()
        }
        assert got == expect, buckets
    # budget larger than any source keeps everything
    assert corpus_ops.token_budget_sample(docs, 10**9).count() == 200


def test_token_budget_sample_plan_and_schema(spark):
    import contextlib, io

    from blq_cli_spark.operators import corpus as corpus_ops

    docs = spark.createDataFrame(
        [(i, "a b c", f"s{i % 2}", i) for i in range(40)],
        "doc_id long, text string, source string, extra long",
    )
    out = corpus_ops.token_budget_sample(docs, 20)
    assert out.columns == ["doc_id", "text", "source", "extra",
                           "n_tokens", "tokens_before"]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Window" in plan and "_bkt" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_write_training_shards_plan_range_partitioned(spark, tmp_path):
    """The shard write's distribution is a rank range partitioning (the
    ordered-shard contract), never a single-task global sort."""
    from blq_cli_spark.operators import corpus as corpus_ops

    docs = spark.createDataFrame(
        [(i, "x") for i in range(100)], "doc_id long, text string"
    )
    path = str(tmp_path / "s")
    corpus_ops.write_training_shards(docs, path, shards=4)
    # the written layout proves the plan: 4 files, contiguous rank ranges
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(path + "/part-*.parquet"))
    assert len(files) == 4
    prev_hi = -1
    for f in files:
        ranks = [r["shuffle_rank"] for r in pq.read_table(f).to_pylist()]
        assert ranks == sorted(ranks)
        assert min(ranks) == prev_hi + 1
        prev_hi = max(ranks)
    assert prev_hi == 99


def test_leakage_safe_split_quarantines_shared_runs(spark):
    """A train doc sharing a >= k+w-1 token run with a valid doc is
    quarantined; unrelated train docs stay 'train'; short docs never
    quarantine."""
    import hashlib

    from blq_cli_spark.operators import corpus as corpus_ops

    # find ids whose md5 nibble puts them in valid vs train
    valid_ids = [i for i in range(100)
                 if hashlib.md5(str(i).encode()).hexdigest()[0] in "01"]
    train_ids = [i for i in range(100)
                 if hashlib.md5(str(i).encode()).hexdigest()[0] not in "01"]
    v, t1, t2, t3 = valid_ids[0], train_ids[0], train_ids[1], train_ids[2]
    shared = "alpha beta gamma delta epsilon zeta eta theta iota"
    docs = spark.createDataFrame(
        [
            (v, f"intro words here {shared} outro tail"),
            (t1, f"totally different prefix {shared} and more text"),  # leaks
            (t2, "no overlap at all with anything else in this corpus today"),
            (t3, "tiny doc"),  # too short to fingerprint
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["split"]
           for r in corpus_ops.leakage_safe_split(docs).collect()}
    assert out[v] == "valid"
    assert out[t1] == "quarantined"
    assert out[t2] == "train"
    assert out[t3] == "train"


def test_token_budget_and_pack_null_text_costs_zero(spark):
    """Null-text docs cost 0 tokens instead of poisoning the per-bucket
    SUM with null (an all-null group total would TypeError the
    driver-side prefix scan)."""
    from blq_cli_spark.operators import corpus as corpus_ops

    docs = spark.createDataFrame(
        [(1, None, "a"), (2, None, "a"), (3, "x y z", "b")],
        "doc_id long, text string, source string",
    )
    got = {r["doc_id"]: (r["n_tokens"], r["tokens_before"])
           for r in corpus_ops.token_budget_sample(docs, 10, rank_buckets=2)
           .collect()}
    assert got[1] == (0, got[1][1]) and got[2][0] == 0 and got[3][0] == 3
    assert len(got) == 3  # zero-cost docs never exhaust the budget

    packed = {r["id"]: (r["n_tokens"], r["bin"])
              for r in corpus_ops.pack_sequences(docs, capacity_tokens=2)
              .collect()}
    assert packed[1][0] == 0 and packed[2][0] == 0 and packed[3][0] == 3


def test_shard_manifest_tiles_and_checksums(spark, tmp_path):
    """Manifest rows tile ranks 0..n-1 in filename order; the
    order-insensitive checksum is recomputable from ids alone; token
    totals ride along when a text column exists."""
    import pyspark.sql.functions as F

    from blq_cli_spark.operators import corpus as corpus_ops

    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(100)], "doc_id long, text string"
    )
    path = str(tmp_path / "shards")
    corpus_ops.write_training_shards(docs, path, shards=4)
    man = corpus_ops.shard_manifest(spark, path).collect()
    assert len(man) == 4
    prev = -1
    for r in man:  # ordered by shard filename == rank order by contract
        assert r["rank_lo"] == prev + 1
        assert r["n_rows"] == r["rank_hi"] - r["rank_lo"] + 1
        assert r["n_tokens"] == 3 * r["n_rows"]
        prev = r["rank_hi"]
    assert prev == 99
    # checksum: engine-portable sum of 60-bit md5(id) prefixes
    expect = docs.select(
        F.sum(
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                   16, 10).cast("decimal(38,0)")
        ).alias("s")
    ).collect()[0]["s"]
    assert sum(r["content_checksum"] for r in man) == expect
    # not-a-shard-dir is a clear error
    plain = str(tmp_path / "plain")
    docs.write.parquet(plain)
    try:
        corpus_ops.shard_manifest(spark, plain)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "shuffle_rank" in str(e)


def test_cli_shard_manifest(tmp_path, capsys):
    from blq_cli_spark.cli import main
    from blq_cli_spark.operators import corpus as corpus_ops
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="test-cli-manifest")
    docs = spark.createDataFrame(
        [(i, "x y") for i in range(40)], "doc_id long, text string"
    )
    path = str(tmp_path / "shards")
    corpus_ops.write_training_shards(docs, path, shards=2)
    assert main(["corpus", "shard-manifest", "--input", path]) == 0
    out = capsys.readouterr().out
    assert "content_checksum" in out and "rank_lo" in out


def test_leakage_safe_split_plan_no_single_partition(spark):
    import contextlib, io

    from blq_cli_spark.operators import corpus as corpus_ops

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in range(50)],
        "doc_id long, text string",
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        corpus_ops.leakage_safe_split(docs).explain("formatted")
    plan = buf.getvalue()
    assert "SinglePartition" not in plan, plan
