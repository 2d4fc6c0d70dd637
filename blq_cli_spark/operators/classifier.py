"""Model-based quality classifier over text columns.

The GPT-3 / CCNet-style corpus filter: train a linear classifier to
separate a high-quality reference corpus (positives) from the raw
corpus (negatives), then score every document and keep the high-scoring
slice. Features are the hashing-trick n-gram vectors from
text.text_embeddings (no vocabulary, no fit pass, identical on any
executor), so the whole pipeline is deterministic and engine-portable.

Training is full-batch logistic regression with the same distributed
cost model as clustering.kmeans_fit:

- the weight vector (dim+1 floats) is the ONLY driver state and
  broadcasts into the Arrow kernel each round;
- each round is one pass over the (persisted) feature table: every
  batch emits a partial gradient sum + loss + count, the k x n_batches
  partials reduce with one small posexplode/groupBy, and only dim+1
  sums come back to the driver;
- features are computed ONCE and persisted — iterations re-read
  columnar features, not raw text.

Scoring (classifier_score) is a stateless distributed projection:
sigmoid(w . x + b) per document, no shuffle, no driver traffic.

Iterative fixpoint -> no DuckDB-oracle gate (same rationale as
clustering / streaming); tests/test_classifier.py trains on a planted
separable corpus and asserts held-out accuracy, determinism, and
bounded driver traffic.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from blq_cli_spark.operators.text import text_embeddings


def _featurize(df: DataFrame, dim: int, id_col: str, text_col: str) -> DataFrame:
    # unigram hashing (n=1): the fastText-style bag — bigrams are too
    # sparse to transfer between train and held-out documents
    return text_embeddings(df, dim=dim, n=1, id_col=id_col, text_col=text_col)


def train_text_classifier(
    positives: DataFrame,
    negatives: DataFrame,
    dim: int = 256,
    iters: int = 30,
    lr: float = 2.0,
    l2: float = 1e-4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[float]:
    """Fit logistic-regression weights separating `positives` from
    `negatives`. Returns dim+1 floats (weights + trailing bias) —
    broadcast-sized model state at any corpus size."""
    pos = _featurize(positives, dim, id_col, text_col).select(
        F.col("embedding").alias("x"), F.lit(1.0).alias("y")
    )
    neg = _featurize(negatives, dim, id_col, text_col).select(
        F.col("embedding").alias("x"), F.lit(0.0).alias("y")
    )
    feats = pos.unionByName(neg).persist()
    try:
        n_total = feats.count()  # also materializes the persisted features
        w = np.zeros(dim + 1, dtype=np.float64)
        for _ in range(iters):
            wb = w.copy()

            def grad_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    if not len(pdf):
                        continue
                    X = np.stack(pdf["x"].to_numpy()).astype(np.float64)
                    y = pdf["y"].to_numpy()
                    z = X @ wb[:-1] + wb[-1]
                    p = 1.0 / (1.0 + np.exp(-z))
                    err = p - y
                    g = np.concatenate([X.T @ err, [err.sum()]])
                    yield pd.DataFrame({"g": [g.tolist()], "cnt": [len(pdf)]})

            partials = feats.mapInPandas(grad_kernel, "g array<double>, cnt long")
            sums = (
                partials.select(F.posexplode("g").alias("idx", "val"))
                .groupBy("idx")
                .agg(F.sum("val").alias("s"))
                .collect()
            )  # dim+1 rows — bounded
            g = np.zeros(dim + 1)
            for r in sums:
                g[r["idx"]] = r["s"]
            g /= n_total
            g[:-1] += l2 * w[:-1]
            w -= lr * g
        return [float(x) for x in w]
    finally:
        feats.unpersist()


def classifier_score(
    df: DataFrame,
    weights: list[float],
    dim: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document with a trained classifier: (id, score) with
    score = sigmoid(w . features + b). Stateless projection — the model
    broadcasts inside the kernel, nothing shuffles."""
    w = np.asarray(weights, dtype=np.float64)
    d = dim if dim is not None else len(w) - 1
    feats = _featurize(df, d, id_col, text_col)

    def score_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            z = X @ w[:-1] + w[-1]
            yield pd.DataFrame(
                {"id": pdf[id_col], "score": 1.0 / (1.0 + np.exp(-z))}
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return feats.mapInPandas(score_kernel, f"id {id_type}, score double")


def quality_filter(
    df: DataFrame,
    weights: list[float],
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep documents the classifier scores above `threshold` — the
    corpus-filter composition (score -> semi-join back on id, documents
    keep all their columns and never fan out)."""
    keep = classifier_score(df, weights, id_col=id_col, text_col=text_col).filter(
        F.col("score") >= threshold
    )
    return df.join(keep.select(F.col("id").alias(id_col)), id_col, "left_semi")


def threshold_sweep(
    scored: DataFrame,
    thresholds: list[float] | None = None,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Operating-point sweep for a quality classifier: per candidate
    threshold, the keep rate and (against a labeled holdout) precision
    and recall — the table that decides a corpus filter's cutoff before
    it burns a training run. Null labels count as negative (an unlabeled
    doc cannot claim credit).

    Returns (threshold, n_kept, keep_rate, precision, recall), rounded
    to 6 decimals; precision is NULL when nothing is kept and recall is
    NULL when there are no positives.

    Scale shape: ONE pass — a bounded |thresholds|-times fan-out of the
    scored table (explode of a literal array, the repetition_profile 3x
    precedent) into a groupBy on the |thresholds|-sized key. No joins,
    no corpus-derived broadcasts; the scored input is (id, score, label),
    not the text."""
    ths = sorted(set(float(t) for t in (thresholds or
                                        [i / 10 for i in range(1, 10)])))
    lab = F.coalesce(F.col(label_col).cast("boolean"), F.lit(False))
    kept = F.col(score_col) >= F.col("threshold")
    return (
        scored.select(
            F.col(score_col),
            lab.alias("_lab"),
            F.explode(F.array(*[F.lit(t) for t in ths])).alias("threshold"),
        )
        .groupBy("threshold")
        .agg(
            F.sum(kept.cast("long")).alias("n_kept"),
            F.round(F.avg(kept.cast("double")), 6).alias("keep_rate"),
            F.round(
                F.sum((kept & F.col("_lab")).cast("long"))
                / F.nullif(F.sum(kept.cast("long")), F.lit(0)), 6
            ).alias("precision"),
            F.round(
                F.sum((kept & F.col("_lab")).cast("long"))
                / F.nullif(F.sum(F.col("_lab").cast("long")), F.lit(0)), 6
            ).alias("recall"),
        )
        .orderBy("threshold")
    )


# --- trained language-ID (round 6) -------------------------------------------


def langid_train(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    n: int = 2,
    top_k: int = 200,
) -> DataFrame:
    """Train a char-n-gram naive-Bayes language profile, fully
    distributed (the trained twin of text.language_id's stopword
    heuristic — VERDICT r5 ask #6).

    Model = one row per (lang, gram) for each language's top_k most
    frequent lowercase character n-grams with add-one-smoothed log
    probability, plus one floor row per language (gram NULL) carrying
    the unseen-gram log probability. The model is BOUNDED BY CONSTRUCTION at
    n_langs x (top_k + 1) rows — the classifier.py discipline — so
    broadcasting it at scoring time is legitimate (this is not a
    corpus-sized corpus-derived broadcast).

    Scale shape: explode n-grams (bounded fan-out: one per character),
    one (lang, gram) count shuffle (map-side combinable), top-K per
    language via a window over lang partitions whose input is already
    aggregated counts. Ties at the top-K boundary break on gram text so
    the model is deterministic and engine-portable."""
    grams = df.select(
        F.col(lang_col).alias("lang"),
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length(lower({text_col})) - {n - 1}, 0)),"
                f" i -> substring(lower({text_col}), i, {n}))"
            )
        ).alias("gram"),
    )
    counts = grams.groupBy("lang", "gram").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("gram"))
    top = counts.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") <= top_k
    )
    totals = counts.groupBy("lang").agg(F.sum("c").alias("_total"))
    model = (
        top.join(totals, "lang")
        .select(
            "lang",
            "gram",
            F.round(
                F.log((F.col("c") + 1.0) / (F.col("_total") + F.lit(float(top_k + 1)))),
                6,
            ).alias("logp"),
        )
    )
    floors = (
        totals.select(
            "lang",
            F.lit(None).cast("string").alias("gram"),
            F.round(
                F.log(1.0 / (F.col("_total") + F.lit(float(top_k + 1)))), 6
            ).alias("logp"),
        )
    )
    return model.unionByName(floors)


def langid_score(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Per-document per-language naive-Bayes log score against a
    langid_train model: sum of matched-gram log probabilities plus the
    language floor for every unmatched gram occurrence. Returns
    (id, lang, score, n_grams, n_matched) — argmax/confusion is the
    caller's one extra max_by (langid_predict).

    Scale shape: doc-gram counts shuffle once on (id, gram); the model
    side broadcasts (bounded langs x (top_k+1) rows); the per-(id,lang)
    rollup is map-side combinable. No corpus-sized broadcast, no
    driver traffic."""
    doc_grams = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.expr(
                    f"transform(sequence(1, greatest(length(lower({text_col})) - {n - 1}, 0)),"
                    f" i -> substring(lower({text_col}), i, {n}))"
                )
            ).alias("gram"),
        )
        .groupBy("id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    gram_rows = model.filter(F.col("gram").isNotNull())
    floor_rows = model.filter(F.col("gram").isNull()).select(
        "lang", F.col("logp").alias("_floor")
    )
    totals = doc_grams.groupBy("id").agg(F.sum("c").alias("_g"))
    matched = (
        doc_grams.join(F.broadcast(gram_rows), "gram")
        .groupBy("id", "lang")
        .agg(
            F.sum(F.col("c") * F.col("logp")).alias("_s"),
            F.sum("c").alias("_m"),
        )
    )
    return totals.crossJoin(F.broadcast(floor_rows)).join(
        matched, ["id", "lang"], "left_outer"
    ).select(
        "id",
        "lang",
        F.round(
            F.coalesce(F.col("_s"), F.lit(0.0))
            + (F.col("_g") - F.coalesce(F.col("_m"), F.lit(0))) * F.col("_floor"),
            6,
        ).alias("score"),
        F.col("_g").alias("n_grams"),
        F.coalesce(F.col("_m"), F.lit(0)).alias("n_matched"),
    )


def langid_predict(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """(id, lang_pred): argmax language per document, ties broken on
    language name for determinism."""
    scores = langid_score(df, model, text_col, id_col, n)
    return scores.groupBy("id").agg(
        F.max_by(
            "lang", F.struct(F.col("score"), F.col("lang"))
        ).alias("lang_pred")
    )
