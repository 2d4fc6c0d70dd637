"""Quality-classifier units: planted separable corpus -> held-out
accuracy, determinism, filter composition, bounded driver traffic."""

from __future__ import annotations

import random

import pytest

from blq_cli_spark.operators import classifier

GOOD = ["insight", "article", "research", "carefully", "explains", "method",
        "evidence", "analysis", "结论", "theory"]
SPAM = ["buy", "click", "winner", "free", "casino", "pills", "offer",
        "limited", "prize", "subscribe"]
FILLER = [f"w{i}" for i in range(50)]


def _mk(rng, vocab, n_docs, start_id):
    rows = []
    for i in range(n_docs):
        words = [rng.choice(vocab) for _ in range(8)] + [
            rng.choice(FILLER) for _ in range(8)
        ]
        rng.shuffle(words)
        rows.append((start_id + i, " ".join(words)))
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(3)
    pos = _mk(rng, GOOD, 120, 0)
    neg = _mk(rng, SPAM, 120, 1000)
    schema = "doc_id long, text string"
    return (
        spark.createDataFrame(pos[:100], schema),
        spark.createDataFrame(neg[:100], schema),
        spark.createDataFrame(pos[100:] + neg[100:], schema),  # held out
    )


def test_classifier_separates_held_out(spark, corpus):
    pos, neg, held = corpus
    w = classifier.train_text_classifier(pos, neg, dim=128, iters=30)
    assert len(w) == 129
    scores = {r["id"]: r["score"] for r in classifier.classifier_score(held, w).collect()}
    correct = sum(
        1 for i, s in scores.items() if (s >= 0.5) == (i < 1000)
    )
    assert correct / len(scores) >= 0.95, correct / len(scores)


def test_classifier_deterministic(spark, corpus):
    pos, neg, _ = corpus
    w1 = classifier.train_text_classifier(pos, neg, dim=64, iters=5)
    w2 = classifier.train_text_classifier(pos, neg, dim=64, iters=5)
    assert w1 == w2


def test_quality_filter_composition(spark, corpus):
    pos, neg, held = corpus
    w = classifier.train_text_classifier(pos, neg, dim=128, iters=30)
    kept = classifier.quality_filter(held, w).collect()
    ids = {r["doc_id"] for r in kept}
    # kept docs keep their full row; mostly positives survive
    assert set(kept[0].asDict()) == {"doc_id", "text"}
    pos_held = {r["doc_id"] for r in held.collect() if r["doc_id"] < 1000}
    assert len(ids & pos_held) / len(pos_held) >= 0.9
    assert len(ids - pos_held) <= 0.1 * len(pos_held)


def test_score_plan_is_projection_only(spark, corpus):
    """Scoring must not shuffle: the plan has no Exchange at all."""
    import contextlib
    import io

    _, _, held = corpus
    df = classifier.classifier_score(held, [0.0] * 65)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree, tree


def test_threshold_sweep_hand_computed(spark):
    """4 docs, 2 positive: at 0.5 keep {0.9+, 0.5} -> precision 1/2,
    recall 1/2; null label counts as negative."""
    from blq_cli_spark.operators import classifier as classifier_ops

    scored = spark.createDataFrame(
        [(0.9, True), (0.5, None), (0.4, True), (0.1, False)],
        "score double, label boolean",
    )
    rows = {r["threshold"]: r
            for r in classifier_ops.threshold_sweep(
                scored, thresholds=[0.5, 0.95]).collect()}
    r5 = rows[0.5]
    assert r5["n_kept"] == 2 and r5["keep_rate"] == 0.5
    assert r5["precision"] == 0.5 and r5["recall"] == 0.5
    r95 = rows[0.95]
    assert r95["n_kept"] == 0 and r95["precision"] is None
    assert r95["recall"] == 0.0


def test_threshold_sweep_plan_single_pass(spark):
    import contextlib, io

    from blq_cli_spark.operators import classifier as classifier_ops

    scored = spark.createDataFrame([(0.5, True)], "score double, label boolean")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        classifier_ops.threshold_sweep(scored).explain("formatted")
    plan = buf.getvalue()
    # one generate + one aggregate; no joins anywhere
    assert "Join" not in plan, plan


def test_cli_sweep(tmp_path, capsys):
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="test-cli-sweep")
    src = str(tmp_path / "scored.parquet")
    spark.createDataFrame(
        [(i, i / 10.0, i % 2 == 0) for i in range(10)],
        "doc_id long, score double, label boolean",
    ).write.parquet(src)
    assert main(["corpus", "sweep", "--input", src,
                 "--thresholds", "[0.3, 0.7]"]) == 0
    out = capsys.readouterr().out
    assert "precision" in out and "recall" in out
    assert main(["corpus", "sweep", "--input", src,
                 "--thresholds", "notjson"]) == 2
    assert main(["corpus", "sweep", "--input", src,
                 "--thresholds", "[]"]) == 2
