"""Persisted IVF ANN index: build once, append increments, search many.

The production shape of similarity.ivf_topk — a 100 TB embedding corpus
is not re-assigned on every query batch. Centroids are trained once on
a bounded sample, every vector's cell assignment is materialized as a
parquet table PARTITIONED BY cell, and each query batch reads ONLY the
probed cells' partitions (disk-level partition pruning — the
text.build_inverted_index discipline applied to vectors). This is the
same state-persistence move as dedup.banded_signatures /
corpus.exact_dedup_against_history: hash/assign each document exactly
once, ever.

Reference parity: the reference has no ANN index; this extends the
SURVEY §2.12 extension family (embedding ops beyond the reference).

Layout at `path`:
    meta.json              model-sized: centroid matrix + dims + the
                           vec dtype (atomic tmp+rename write, the
                           bloom.json precedent)
    cells/cell=N/*.parquet (id, vec) rows assigned to cell N

Scale shape:
- build: constant-size driver k-means (bounded sample, the
  ivf_train_centroids contract) + ONE distributed assignment pass +
  one partitioned write. No corpus collect, no corpus broadcast.
- append: assignment pass over the NEW batch only, parquet append into
  the same partition dirs — O(batch) however large the stored index is;
  the stored side is never re-read or re-hashed.
- search: queries are broadcast-sized by contract (the cosine_topk
  contract); the probed-cell set is bounded by k_cells BY CONSTRUCTION,
  so collecting it is dimension-sized driver traffic; the index scan
  carries `cell IN (probed)` which Spark turns into PartitionFilters —
  unprobed cells are never listed, opened, or read (plan-asserted in
  tests/test_ann_index.py). Scoring is the exact-cosine Arrow GEMM +
  per-query top-k window from ivf_topk.

Iterative k-means + filesystem state -> pytest verification (the
clustering/kmeans convention), with search-vs-ivf_topk equivalence and
append-vs-full-rebuild equivalence as the oracles.

Contract (shared with the similarity module's ANN family): id_col must
be integral (the assignment kernel emits it as long); single writer per
index directory (the store's locking convention applies if callers need
concurrent appends).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from blq_cli_spark.operators.similarity import (
    _ivf_assign,
    _prime_gemm,
    _to_matrix,
    ivf_train_centroids,
)

_META = "meta.json"
_CELLS = "cells"

# the documented re-train trigger (ivf_index_info docstring): any cell
# whose centroid_shift exceeds half its mean member distance has a
# centroid that is no longer central to its own members
_DRIFT_TRIGGER = 0.5


def _cdist_expr(centroids) -> "F.Column":
    """Cosine distance of `vec` to its own cell's stored centroid —
    pure-column, shared by ivf_index_info and the incremental stats."""
    cent_arr = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    cvec = F.element_at(cent_arr, F.col("cell").cast("int") + 1)

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    norm_v = F.sqrt(_dot(F.col("vec"), F.col("vec")))
    norm_c = F.sqrt(_dot(cvec, cvec))
    return F.when(
        (norm_v > 0) & (norm_c > 0),
        F.lit(1.0) - _dot(F.col("vec"), cvec) / (norm_v * norm_c),
    ).otherwise(F.lit(1.0))


def _batch_cell_stats(assigned: DataFrame, centroids) -> dict:
    """Per-cell running-sum triplet over ONE (id, vec, cell) batch:
    {cell: {"n", "sum_dist", "sum_vec"}} — the mergeable form of the
    drift measurements in ivf_index_info(drift=True). Two bounded
    aggregations over the batch; driver traffic is k_cells x dim
    (model-sized, the pca_fit discipline)."""
    agg = (
        assigned.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cdist_expr(centroids)).alias("sum_dist"),
        )
        .collect()
    )
    dim_sums = (
        assigned.select("cell", F.posexplode("vec").alias("pos", "v"))
        .groupBy("cell", "pos")
        .agg(F.sum("v").alias("s"))
        .collect()
    )
    dim = len(centroids[0])
    stats: dict[str, dict] = {}
    for r in agg:
        stats[str(r["cell"])] = {
            "n": int(r["n"]),
            "sum_dist": float(r["sum_dist"]),
            "sum_vec": [0.0] * dim,
        }
    for r in dim_sums:
        stats[str(r["cell"])]["sum_vec"][r["pos"]] = float(r["s"])
    return stats


def _merge_cell_stats(base: dict, delta: dict) -> dict:
    out = {k: dict(v, sum_vec=list(v["sum_vec"])) for k, v in base.items()}
    for cell, s in delta.items():
        if cell not in out:
            out[cell] = dict(s, sum_vec=list(s["sum_vec"]))
            continue
        t = out[cell]
        t["n"] += s["n"]
        t["sum_dist"] += s["sum_dist"]
        t["sum_vec"] = [a + b for a, b in zip(t["sum_vec"], s["sum_vec"])]
    return out


def _drift_recommendation(stats: dict, centroids) -> dict:
    """drift_ratio per cell from the running sums (identical math to
    ivf_index_info(drift=True): mean_dist = sum_dist/n, shift =
    1 - cos(member mean direction, stored centroid)) reduced to the
    suggest-only flag meta.json carries: retrain is RECOMMENDED when
    any cell crosses the trigger. The index is never auto-mutated."""
    worst_cell, worst = None, 0.0
    for cell, s in stats.items():
        if s["n"] <= 0:
            continue
        c = np.asarray(centroids[int(cell)], dtype=np.float64)
        m = np.asarray(s["sum_vec"], dtype=np.float64) / s["n"]
        denom = np.linalg.norm(m) * np.linalg.norm(c)
        shift = 1.0 if denom <= 0 else float(1.0 - (m @ c) / denom)
        mean_dist = s["sum_dist"] / s["n"]
        ratio = 0.0 if mean_dist <= 0 else shift / mean_dist
        if ratio >= worst:
            worst_cell, worst = int(cell), ratio
    return {
        "flag": worst > _DRIFT_TRIGGER,
        "max_drift_ratio": worst,
        "cell": worst_cell,
        "threshold": _DRIFT_TRIGGER,
    }


def _write_meta(path: str, meta: dict) -> None:
    # atomic swap so a concurrent reader never sees a torn model
    tmp = os.path.join(path, _META + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, _META))


def load_meta(path: str) -> dict:
    with open(os.path.join(path, _META)) as fh:
        return json.load(fh)


def ivf_build_index(
    corpus: DataFrame,
    path: str,
    k_cells: int = 16,
    iters: int = 5,
    sample_rows: int = 4096,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    recall_queries: int = 20,
    recall_k: int = 5,
    recall_nprobe: int = 2,
) -> dict:
    """Train centroids on a bounded sample, assign every corpus vector to
    its nearest cell, and materialize the index at `path`. Returns the
    meta dict (centroids + dims) that search/append reload.

    Build-time acceptance: with recall_queries > 0 the build also runs
    the similarity.ann_recall evaluator (recall_queries sampled corpus
    rows as queries, exact brute force as truth) and persists the
    result under meta.json's "ann_recall" key — the number a pipeline
    checks before trusting the index, recorded with the model it
    measures (VERDICT r5 ask #7). Cost: two extra bounded-query passes
    over the corpus; pass recall_queries=0 to skip."""
    centroids = ivf_train_centroids(
        corpus,
        n_cells=k_cells,
        iters=iters,
        sample_rows=sample_rows,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
    )
    os.makedirs(path, exist_ok=True)
    assigned = _ivf_assign(corpus, centroids, id_col, vec_col, "id", nprobe=1)
    (
        assigned.write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(path, _CELLS))
    )
    meta = {
        "k_cells": k_cells,
        "dim": len(centroids[0]),
        "centroids": centroids,
        "id_col": id_col,
        "vec_col": vec_col,
    }
    # seed the incremental drift ledger from the written cells (reading
    # the parquet back is cheaper than re-running the assignment kernel)
    stats = _batch_cell_stats(
        corpus.sparkSession.read.parquet(os.path.join(path, _CELLS)).select(
            "cell", "vec"
        ),
        centroids,
    )
    meta["cell_stats"] = stats
    meta["retrain_recommended"] = _drift_recommendation(stats, centroids)
    if recall_queries > 0:
        from blq_cli_spark.operators.similarity import ann_recall

        row = ann_recall(
            corpus,
            corpus.limit(recall_queries),
            method="ivf",
            centroids=centroids,
            k=recall_k,
            nprobe=recall_nprobe,
            id_col=id_col,
            vec_col=vec_col,
        ).collect()[0]
        meta["ann_recall"] = {
            "recall": row["recall"],
            "k": recall_k,
            "nprobe": recall_nprobe,
            "n_queries": row["n_queries"],
        }
    _write_meta(path, meta)
    return meta


def ivf_append_index(
    corpus: DataFrame,
    path: str,
    id_col: str | None = None,
    vec_col: str | None = None,
) -> dict:
    """Assign a NEW batch with the STORED centroids and append it into
    the cell partitions — O(batch) regardless of index size; existing
    rows are never re-read. (Centroids intentionally do not drift:
    stability of cell membership is what makes the append cheap — the
    incremental-LSH argument, dedup.lsh_candidates_against.) Column
    names default to the ones the index was built with (meta.json).

    Drift accounting (VERDICT r7 ask #7): each append folds the batch's
    per-cell (count, sum cosine-distance, per-dim vector sums) into
    meta["cell_stats"] — the mergeable form of ivf_index_info(drift=True)'s
    measurements — and refreshes meta["retrain_recommended"], a
    suggest-only flag set when any cell's drift_ratio crosses the
    documented 0.5 trigger. The check stays O(batch): the stored side is
    never re-read (one extra aggregation pass over the batch's lineage).
    ivf_retrain_index clears the flag by reseeding the ledger.

    Single-writer assumption (documented per ADVICE r8): concurrent
    appends to one index path can interleave the unguarded
    read-modify-write of meta.json's ledger (the atomic swap prevents
    torn READS, not lost merges) — serialize appends per index path.
    The batch is localCheckpointed before the parquet write so the
    stats aggregation reads the SAME rows that were written even when
    the upstream DataFrame is non-deterministic."""
    meta = load_meta(path)
    id_col = id_col or meta.get("id_col", "vec_id")
    vec_col = vec_col or meta.get("vec_col", "embedding")
    centroids = meta.get("centroids") or []
    if not centroids or not centroids[0]:
        raise ValueError(
            f"ivf_append_index: index at {path} has no centroids "
            "(empty or malformed meta.json)"
        )
    # fail BEFORE writing anything: a batch whose vectors don't match
    # the index dimensionality would previously append cells and then
    # die in the stats pass, leaving cells/ledger inconsistent
    # (ADVICE r8). The dim assertion rides the assignment kernel — the
    # eager checkpoint below materializes it (and so raises) before the
    # parquet write, with no extra scan of the batch (ADVICE r9 #4).
    assigned = _ivf_assign(
        corpus,
        centroids,
        id_col,
        vec_col,
        "id",
        nprobe=1,
        expect_dim=len(centroids[0]),
    ).localCheckpoint(eager=True)
    (
        assigned.write.mode("append")
        .partitionBy("cell")
        .parquet(os.path.join(path, _CELLS))
    )
    base = meta.get("cell_stats")
    if base is None:
        # pre-ledger index: one-time bootstrap from the stored cells
        # (a full pass, once; every later append is batch-only)
        stats = _batch_cell_stats(
            corpus.sparkSession.read.parquet(
                os.path.join(path, _CELLS)
            ).select("cell", "vec"),
            meta["centroids"],
        )
    else:
        stats = _merge_cell_stats(
            base,
            _batch_cell_stats(assigned.select("cell", "vec"), meta["centroids"]),
        )
    meta["cell_stats"] = stats
    meta["retrain_recommended"] = _drift_recommendation(stats, meta["centroids"])
    _write_meta(path, meta)
    return meta


def ivf_search_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str | None = None,
    vec_col: str | None = None,
) -> DataFrame:
    """Exact-cosine top-k within the probed cells of a stored index:
    (qid, nid, cos, rn) — the same output contract as similarity.ivf_topk
    and bit-identical to it for the same centroids (test-asserted).
    Query column names default to the index's own (meta.json).

    The probed-cell set is <= k_cells values however many queries there
    are, so collecting it is bounded; the `cell IN (...)` filter prunes
    the index scan at file-listing time (PartitionFilters)."""
    meta = load_meta(path)
    id_col = id_col or meta.get("id_col", "vec_id")
    vec_col = vec_col or meta.get("vec_col", "embedding")
    q = _ivf_assign(
        queries, meta["centroids"], id_col, vec_col, "qid", nprobe=nprobe
    ).withColumnRenamed("vec", "qv")
    # materialize the (broadcast-sized) assigned queries once: the
    # probed-cell collect and the join would otherwise run the
    # assignment kernel twice
    q = q.localCheckpoint(eager=True)
    # bounded by construction: at most k_cells distinct values
    probed = sorted(
        r["cell"] for r in q.select("cell").distinct().collect()
    )
    stored = (
        spark.read.parquet(os.path.join(path, _CELLS))
        .filter(F.col("cell").isin(probed))
        .select(F.col("id").alias("nid"), F.col("vec").alias("nv"), "cell")
    )
    pairs = (
        F.broadcast(q)
        .join(stored, ["cell"])
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", "qv", "nv")
    )

    # exact-cosine Arrow kernel — same contract as ivf_topk's scorer
    # (kept local: the stored side arrives pre-assigned with its vector
    # materialized, which is the whole point of the index)
    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _prime_gemm()
        for pdf in batches:
            if not len(pdf):
                continue
            A = _to_matrix(pdf["qv"])
            B = _to_matrix(pdf["nv"])
            num = np.einsum("ij,ij->i", A, B)
            den = np.sqrt(np.einsum("ij,ij->i", A, A)) * np.sqrt(
                np.einsum("ij,ij->i", B, B)
            )
            yield pd.DataFrame(
                {
                    "qid": pdf["qid"].to_numpy(),
                    "nid": pdf["nid"].to_numpy(),
                    "cos": num / den,
                }
            )

    scored = pairs.mapInPandas(score, "qid long, nid long, cos double")
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), "nid")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "nid", "cos", "rn")
    )


def ivf_index_info(spark: SparkSession, path: str, drift: bool = False) -> DataFrame:
    """Per-cell occupancy of a stored index: (cell, n_vectors, n_files).
    The balance check that decides nprobe and flags centroid drift (one
    hot cell = recall and probe-cost skew) — k_cells rows, one
    partition-column groupBy; the vectors themselves are never read
    (column pruning keeps the scan to the id column).

    With drift=True, three more columns measure how far the stored
    centroids have fallen behind what the cells now CONTAIN (appends
    assign with frozen centroids by design, so skewed appends
    accumulate drift). The index's geometry is spherical (centroids are
    L2-normalized, assignment is by dot product — ivf_train_centroids),
    so drift is measured in cosine distance: `mean_dist` (mean
    1 - cos(member, stored centroid)), `centroid_shift`
    (1 - cos(current member mean direction, stored centroid)) and
    `drift_ratio` = shift / mean_dist. The documented re-train trigger:
    ANY cell with drift_ratio > 0.5 means the stored centroid is no
    longer central to its own members — rebuild (ivf_build_index)
    rather than keep appending, then compare the fresh meta.json
    ann_recall row against the old one.

    Drift cost/scale: one extra pass over (cell, vec) — a per-row
    pure-column distance against the (bounded, literal) centroid matrix
    plus a posexplode per-dimension mean whose output is k_cells x dim
    rows (model-sized driver traffic, the pca_fit discipline)."""
    cells = spark.read.parquet(os.path.join(path, _CELLS)).select(
        "cell", F.input_file_name().alias("_f")
    )  # project the file name first: non-deterministic exprs can't
    # appear inside aggregate arguments
    info = (
        cells.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.countDistinct("_f").alias("n_files"),
        )
        .orderBy("cell")
    )
    if not drift:
        return info
    meta = load_meta(path)
    centroids = meta["centroids"]
    rows = spark.read.parquet(os.path.join(path, _CELLS)).select("cell", "vec")
    mean_dist = rows.groupBy("cell").agg(
        F.avg(_cdist_expr(centroids)).alias("mean_dist")
    )
    # per-dimension member mean, reduced distributed BEFORE collect
    dim_means = (
        rows.select("cell", F.posexplode("vec").alias("pos", "v"))
        .groupBy("cell", "pos")
        .agg(F.avg("v").alias("m"))
        .collect()
    )
    by_cell: dict[int, dict[int, float]] = {}
    for r in dim_means:
        by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
    shift_rows = []
    for cell, dims in by_cell.items():
        c = np.asarray(centroids[cell], dtype=np.float64)
        m = np.asarray([dims.get(i, 0.0) for i in range(len(c))], dtype=np.float64)
        denom = np.linalg.norm(m) * np.linalg.norm(c)
        shift = 1.0 if denom <= 0 else float(1.0 - (m @ c) / denom)
        shift_rows.append((cell, shift))
    shifts = spark.createDataFrame(shift_rows, "cell int, centroid_shift double")
    return (
        info.join(mean_dist, "cell", "left_outer")
        .join(F.broadcast(shifts), "cell", "left_outer")
        .withColumn(
            "drift_ratio",
            F.when(
                F.col("mean_dist") > 0,
                F.col("centroid_shift") / F.col("mean_dist"),
            ).otherwise(F.lit(0.0)),
        )
        .orderBy("cell")
    )


def ivf_retrain_index(
    spark: SparkSession,
    path: str,
    iters: int = 5,
    sample_rows: int = 4096,
    seed: int = 7,
    recall_queries: int = 20,
    recall_k: int = 5,
    recall_nprobe: int = 2,
) -> dict:
    """The action ivf_index_info(drift=True)'s re-train trigger points
    at (round 7, VERDICT r6 ask #6): retrain centroids from what the
    index NOW contains, re-assign every stored vector, and swap the
    cell partitions — the answer to accumulated append drift
    (drift_ratio > 0.5 in any cell).

    Steps, all against the stored index only (the original corpus need
    not exist any more):
    1. retrain: ivf_train_centroids over the stored (id, vec) rows —
       same bounded-sample Lloyd's as the original build, same k_cells;
    2. re-assign + rewrite: one distributed pass, written to a tmp dir
       and directory-swapped (the ivf_compact_index crash-safety move);
    3. meta: the previous "ann_recall" row (and the previous retrain
       rows) are APPENDED to meta["ann_recall_history"], a fresh
       ann_recall is measured with the new centroids and becomes the
       current row — so the index carries its own recall trajectory
       across retrains.

    Scale shape mirrors build: bounded driver k-means + one assignment
    pass + one partitioned write; the recall probe is recall_queries
    bounded rows. Single writer per index directory (module contract).
    tests/test_ann_index.py drives a skewed index across the trigger
    and asserts drift returns below 0.5 with recall non-decreasing."""
    import shutil

    meta = load_meta(path)
    id_col = meta.get("id_col", "vec_id")
    vec_col = meta.get("vec_col", "embedding")
    stored = spark.read.parquet(os.path.join(path, _CELLS)).select(
        F.col("id").alias(id_col), F.col("vec").alias(vec_col)
    )
    centroids = ivf_train_centroids(
        stored,
        n_cells=meta["k_cells"],
        iters=iters,
        sample_rows=sample_rows,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
    )
    cells_dir = os.path.join(path, _CELLS)
    tmp_dir = os.path.join(path, _CELLS + ".retrain.tmp")
    assigned = _ivf_assign(stored, centroids, id_col, vec_col, "id", nprobe=1)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(tmp_dir)
    n_before = stored.count()
    n_after = spark.read.parquet(tmp_dir).count()
    if n_after != n_before:  # pragma: no cover - defensive
        shutil.rmtree(tmp_dir, ignore_errors=True)
        raise RuntimeError(f"retrain row-count mismatch: {n_before} -> {n_after}")
    old_dir = os.path.join(path, _CELLS + ".old")
    # a crash between the two renames of a PREVIOUS retrain/compact can
    # leave <cells>.old behind; os.rename onto a non-empty dir raises,
    # which would make the index permanently un-retrainable (ADVICE r8)
    shutil.rmtree(old_dir, ignore_errors=True)
    os.rename(cells_dir, old_dir)
    os.rename(tmp_dir, cells_dir)
    shutil.rmtree(old_dir)

    history = list(meta.get("ann_recall_history", []))
    if "ann_recall" in meta:
        history.append(meta["ann_recall"])
    meta["centroids"] = centroids
    meta["dim"] = len(centroids[0])
    meta["ann_recall_history"] = history
    meta.pop("ann_recall", None)
    # reseed the drift ledger against the NEW centroids — this is what
    # clears a retrain_recommended flag raised by skewed appends
    stats = _batch_cell_stats(
        spark.read.parquet(cells_dir).select("cell", "vec"), centroids
    )
    meta["cell_stats"] = stats
    meta["retrain_recommended"] = _drift_recommendation(stats, centroids)
    if recall_queries > 0:
        from blq_cli_spark.operators.similarity import ann_recall

        corpus = spark.read.parquet(cells_dir).select(
            F.col("id").alias(id_col), F.col("vec").alias(vec_col)
        )
        row = ann_recall(
            corpus,
            corpus.limit(recall_queries),
            method="ivf",
            centroids=centroids,
            k=recall_k,
            nprobe=recall_nprobe,
            id_col=id_col,
            vec_col=vec_col,
        ).collect()[0]
        meta["ann_recall"] = {
            "recall": row["recall"],
            "k": recall_k,
            "nprobe": recall_nprobe,
            "n_queries": row["n_queries"],
            "retrained": True,
        }
    _write_meta(path, meta)
    return meta


def ivf_compact_index(spark: SparkSession, path: str) -> dict:
    """Rewrite the cell partitions with one file per cell-partition
    task — the maintenance pass after many incremental appends (each
    append adds a file per touched cell; thousands of appends mean
    thousands of tiny files and a file-listing-bound search). Contract:
    single writer per index directory (the module contract) — readers
    racing the swap may see the index briefly rebuilt.

    Scale shape: one shuffle keyed on cell (each task writes one
    coalesced file), then a directory swap; meta.json is untouched so
    searches before/after return identical results (test-asserted)."""
    import shutil

    cells_dir = os.path.join(path, _CELLS)
    tmp_dir = os.path.join(path, _CELLS + ".compact.tmp")
    df = spark.read.parquet(cells_dir)
    n_before = df.count()
    (
        df.repartition(F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(tmp_dir)
    )
    n_after = spark.read.parquet(tmp_dir).count()
    if n_after != n_before:  # pragma: no cover - defensive
        shutil.rmtree(tmp_dir, ignore_errors=True)
        raise RuntimeError(
            f"compact row-count mismatch: {n_before} -> {n_after}"
        )
    old_dir = os.path.join(path, _CELLS + ".old")
    # a crash between the two renames of a PREVIOUS swap can leave
    # <cells>.old behind; os.rename onto a non-empty dir raises, which
    # would make the index permanently un-compactable (ADVICE r8)
    shutil.rmtree(old_dir, ignore_errors=True)
    os.rename(cells_dir, old_dir)
    os.rename(tmp_dir, cells_dir)
    shutil.rmtree(old_dir)
    return {"rows": n_after}
