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


# --- trained language-ID (round 6) -------------------------------------------

_LANG_SENTENCES = {
    "en": [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "she said that the weather would be fine for the whole weekend",
        "a small library of useful functions makes every project easier",
        "they walked through the old town and talked about their plans",
        "reading books in the evening is one of my favourite things",
        "the committee will discuss the proposal during the next meeting",
        "there is nothing better than a warm cup of tea in winter",
        "the students finished their homework before the lecture started",
    ],
    "de": [
        "der schnelle braune fuchs springt ueber den faulen hund am fluss",
        "sie sagte dass das wetter am ganzen wochenende schoen sein wuerde",
        "eine kleine bibliothek nuetzlicher funktionen erleichtert jedes projekt",
        "sie gingen durch die altstadt und sprachen ueber ihre plaene",
        "abends buecher zu lesen ist eine meiner liebsten beschaeftigungen",
        "der ausschuss wird den vorschlag in der naechsten sitzung besprechen",
        "es gibt nichts besseres als eine warme tasse tee im winter",
        "die studenten beendeten ihre hausaufgaben vor beginn der vorlesung",
    ],
    "fr": [
        "le rapide renard brun saute par dessus le chien paresseux pres de la riviere",
        "elle a dit que le temps serait beau pendant tout le weekend",
        "une petite bibliotheque de fonctions utiles facilite chaque projet",
        "ils ont marche dans la vieille ville et parle de leurs projets",
        "lire des livres le soir est une de mes activites preferees",
        "le comite discutera de la proposition lors de la prochaine reunion",
        "il n y a rien de mieux qu une tasse de the chaud en hiver",
        "les etudiants ont termine leurs devoirs avant le debut du cours",
    ],
    "es": [
        "el rapido zorro marron salta sobre el perro perezoso junto al rio",
        "ella dijo que el tiempo seria bueno durante todo el fin de semana",
        "una pequena biblioteca de funciones utiles facilita cada proyecto",
        "caminaron por el casco antiguo y hablaron de sus planes",
        "leer libros por la noche es una de mis actividades favoritas",
        "el comite discutira la propuesta en la proxima reunion",
        "no hay nada mejor que una taza de te caliente en invierno",
        "los estudiantes terminaron sus deberes antes de empezar la clase",
    ],
}


def _langid_fixture(spark):
    train_rows, test_rows = [], []
    for lang, sents in _LANG_SENTENCES.items():
        for i, s in enumerate(sents):
            (train_rows if i < 6 else test_rows).append((f"{lang}{i}", s, lang))
    schema = "doc_id string, text string, lang string"
    return (
        spark.createDataFrame(train_rows, schema),
        spark.createDataFrame(test_rows, schema),
    )


def test_langid_trained_accuracy_floor(spark):
    """Char-bigram naive Bayes on REAL multilingual text: held-out
    accuracy must clear 7/8 (distinct European languages are an easy
    regime for character bigrams — a regression here means the model or
    scoring math broke, not that the task got hard)."""
    from blq_cli_spark.operators import classifier as clf

    train, test = _langid_fixture(spark)
    model = clf.langid_train(train, top_k=150)
    pred = {r["id"]: r["lang_pred"] for r in clf.langid_predict(test, model).collect()}
    truth = {r["doc_id"]: r["lang"] for r in test.collect()}
    acc = sum(pred[k] == truth[k] for k in truth) / len(truth)
    assert acc >= 7 / 8, (acc, pred, truth)


def test_langid_model_bounded_and_deterministic(spark):
    from blq_cli_spark.operators import classifier as clf

    train, _ = _langid_fixture(spark)
    m1 = clf.langid_train(train, top_k=50)
    # bounded by construction: <= n_langs * (top_k + 1) rows
    assert m1.count() <= 4 * 51
    # exactly one floor row per language
    floors = m1.filter(m1.gram.isNull()).groupBy("lang").count().collect()
    assert len(floors) == 4 and all(r["count"] == 1 for r in floors)
    # deterministic under repartitioning (top-K tie-break on gram text)
    m2 = clf.langid_train(train.repartition(7), top_k=50)

    def rows(m):
        return sorted((r["lang"], r["gram"] or "", r["logp"]) for r in m.collect())

    assert rows(m1) == rows(m2)


def test_langid_score_floor_path(spark):
    """A document of grams the model has never seen scores exactly
    n_grams * floor for every language (the unmatched branch)."""
    from blq_cli_spark.operators import classifier as clf

    train, _ = _langid_fixture(spark)
    model = clf.langid_train(train, top_k=50)
    floors = {r["lang"]: r["logp"] for r in model.filter(model.gram.isNull()).collect()}
    weird = spark.createDataFrame(
        [("x1", "~~~###@@@", "xx")], "doc_id string, text string, lang string"
    )
    rows = clf.langid_score(weird, model).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["n_matched"] == 0
        assert abs(r["score"] - r["n_grams"] * floors[r["lang"]]) < 1e-6
