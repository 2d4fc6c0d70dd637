"""Distributed k-means clustering over embedding columns.

Spherical Lloyd's iterations with the Spark-native cost model:

- centroids are k x dim — always driver/broadcast-sized state;
- each iteration is ONE corpus pass: an Arrow-batched mapInPandas kernel
  assigns every vector to its argmax-dot centroid AND emits per-batch
  partial sums (cell, count, sum-vector), so the shuffle carries
  k x n_batches partial rows instead of the corpus;
- partials reduce with a tiny groupBy (k*dim summed elements) and only
  that k x dim result is collected to the driver to form the next
  centroid matrix — the corpus itself is never collected;
- convergence stops on max centroid shift < tol.

This is the whole-corpus upgrade of `similarity.ivf_train_centroids`
(which trains on a bounded driver sample): same spherical objective,
but the assignment statistics come from every row, so centroids track
the true density at any scale. Use it to train IVF cells, or use
`assign` directly for SemDeDup-style cluster partitioning
(cluster-then-dedup-within-cluster).

Not SQL-expressible (iterative fixpoint), so there is no DuckDB-oracle
gate; tests/test_clustering.py verifies recovery of planted clusters,
monotone convergence, and that no corpus-sized data reaches the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from blq_cli_spark.operators.similarity import (
    _prime_gemm,
    _to_matrix,
    ivf_train_centroids,
)


def _partial_kernel(C: np.ndarray, id_col: str, vec_col: str):
    """Per-batch: argmax-dot assignment + per-cell partial (count, sum)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _prime_gemm()
        for pdf in batches:
            if not len(pdf):
                continue
            M = _to_matrix(pdf[vec_col])
            assign = np.argmax(M @ C.T, axis=1)
            cells = np.unique(assign)
            yield pd.DataFrame(
                {
                    "cell": cells.astype(np.int64),
                    "cnt": [int((assign == c).sum()) for c in cells],
                    "vsum": [M[assign == c].sum(axis=0).tolist() for c in cells],
                }
            )

    return kernel


def kmeans_fit(
    corpus: DataFrame,
    k: int,
    iters: int = 10,
    tol: float = 1e-4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_sample_rows: int = 4096,
) -> list[list[float]]:
    """Train k spherical centroids on the WHOLE corpus.

    Initialization is the bounded-sample k-means++-lite trainer
    (ivf_train_centroids, one driver sample); every Lloyd's round after
    that is distributed. Returns unit-norm centroids as plain lists
    (broadcast-sized: k x dim floats)."""
    C = np.asarray(
        ivf_train_centroids(
            corpus,
            k,
            iters=1,
            sample_rows=init_sample_rows,
            seed=seed,
            id_col=id_col,
            vec_col=vec_col,
        ),
        dtype=np.float64,
    )
    dim = C.shape[1]
    for _ in range(iters):
        partials = corpus.select(id_col, vec_col).mapInPandas(
            _partial_kernel(C, id_col, vec_col),
            "cell long, cnt long, vsum array<double>",
        ).persist()  # two consumers below; without it the assignment
        # kernel would re-run over the whole corpus per consumer
        # (one pass per iteration is the module's stated cost model)
        # reduce the k x n_batches partial rows: element sums via one
        # small posexplode (k * batches * dim elements, corpus-independent)
        sums = (
            partials.select("cell", F.posexplode("vsum").alias("idx", "val"))
            .groupBy("cell", "idx")
            .agg(F.sum("val").alias("s"))
        )
        counts = partials.groupBy("cell").agg(F.sum("cnt").alias("n"))
        sum_rows = sums.collect()  # k x dim rows — bounded
        cnt_rows = {r["cell"]: r["n"] for r in counts.collect()}  # k rows
        partials.unpersist()
        newC = C.copy()
        acc = np.zeros((k, dim))
        for r in sum_rows:
            acc[r["cell"], r["idx"]] = r["s"]
        for c, n in cnt_rows.items():
            if n > 0:
                newC[c] = acc[c] / n
        norms = np.linalg.norm(newC, axis=1, keepdims=True)
        newC = newC / np.maximum(norms, 1e-12)
        shift = float(np.max(np.linalg.norm(newC - C, axis=1)))
        C = newC
        if shift < tol:
            break
    return [[float(x) for x in row] for row in C]


def kmeans_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest (argmax cosine) centroid.

    Pure distributed projection: the centroid matrix broadcasts inside
    the Arrow kernel; output is (id, cell, sim). Feed the result to a
    per-cell operator (within-cluster near-dup, per-cell stats) — the
    cell key is the partitioner."""
    C = np.asarray(centroids, dtype=np.float64)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _prime_gemm()
        for pdf in batches:
            if not len(pdf):
                continue
            M = _to_matrix(pdf[vec_col])
            norms = np.maximum(np.linalg.norm(M, axis=1), 1e-12)
            dots = (M / norms[:, None]) @ C.T
            assign = np.argmax(dots, axis=1)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "cell": assign.astype(np.int64),
                    "sim": dots[np.arange(len(pdf)), assign],
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        kernel, "id long, cell long, sim double"
    )
