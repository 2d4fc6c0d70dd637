"""Persisted IVF ANN index (operators/ann_index.py): search over a
stored index must equal the in-memory ivf_topk for the same centroids,
appends must be equivalent to indexing everything up front, and the
search scan must prune unprobed cell partitions at file-listing time."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from blq_cli_spark.operators import ann_index, similarity
from tests.test_plan_quality import plan_of


def _vectors(n, dim=6, seed=1):
    rng = np.random.default_rng(seed)
    # a few loose clusters so cells are meaningful
    centers = rng.normal(size=(4, dim)) * 3
    return [
        (i, (centers[i % 4] + rng.normal(size=dim) * 0.3).tolist())
        for i in range(n)
    ]


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _key(rows):
    return sorted((r["qid"], r["rn"], r["nid"], round(r["cos"], 9)) for r in rows)


def test_index_search_matches_ivf_topk(spark, tmp_path):
    corpus = _df(spark, _vectors(80))
    queries = _df(spark, _vectors(5, seed=2))
    idx = str(tmp_path / "ivf_idx")

    meta = ann_index.ivf_build_index(corpus, idx, k_cells=4, iters=4)
    got = ann_index.ivf_search_index(
        spark, idx, queries, k=3, nprobe=2
    ).collect()
    want = similarity.ivf_topk(
        corpus, queries, meta["centroids"], k=3, nprobe=2
    ).collect()
    assert _key(got) == _key(want) and len(got) == 15


def test_index_append_equals_full_index(spark, tmp_path):
    rows = _vectors(60, seed=3)
    batch1, batch2 = rows[:40], rows[40:]
    queries = _df(spark, _vectors(4, seed=4))

    inc = str(tmp_path / "inc_idx")
    ann_index.ivf_build_index(_df(spark, batch1), inc, k_cells=4, iters=4)
    ann_index.ivf_append_index(_df(spark, batch2), inc)
    got = ann_index.ivf_search_index(spark, inc, queries, k=3, nprobe=2).collect()

    # reference: the SAME centroids (trained on batch1's sample) applied
    # to the full corpus in one shot — append must not change results
    meta = ann_index.load_meta(inc)
    want = similarity.ivf_topk(
        _df(spark, rows), queries, meta["centroids"], k=3, nprobe=2
    ).collect()
    assert _key(got) == _key(want)
    # results actually include appended-batch neighbors
    assert any(r["nid"] >= 40 for r in got)


def test_index_search_prunes_cell_partitions(spark, tmp_path):
    corpus = _df(spark, _vectors(80, seed=5))
    idx = str(tmp_path / "prune_idx")
    ann_index.ivf_build_index(corpus, idx, k_cells=4, iters=4)
    queries = _df(spark, _vectors(1, seed=6))
    out = ann_index.ivf_search_index(spark, idx, queries, k=3, nprobe=1)
    plan = plan_of(out)
    assert "PartitionFilters" in plan and "cell" in plan
    # nprobe=1 with one query probes exactly one of the 4 cells; the
    # executed scan must not read the other three partitions
    probed = out.select(F.countDistinct("nid")).first()[0]
    per_cell = (
        spark.read.parquet(f"{idx}/cells").groupBy("cell").count().collect()
    )
    assert probed <= max(r["count"] for r in per_cell)


def test_cli_index_roundtrip(tmp_path, capsys):
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="test-cli-annindex")
    src = str(tmp_path / "emb.parquet")
    _df(spark, _vectors(50, seed=7)).write.parquet(src)
    idx = str(tmp_path / "idx")

    assert main(["embeddings", "index-build", "--input", src,
                 "--index", idx, "--k-cells", "4"]) == 0
    assert main(["embeddings", "index-search", "--input", src,
                 "--index", idx, "-k", "3", "--nprobe", "2",
                 "--n-queries", "2"]) == 0
    assert "qid" in capsys.readouterr().out
    # usage error: no --index
    assert main(["embeddings", "index-search", "--input", src]) == 2


def test_serve_index_dispatch(tmp_path, spark):
    from blq_cli_spark import serve
    from blq_cli_spark.sources.store import LogStore

    st = LogStore(spark, str(tmp_path / "annstore"))
    src = str(tmp_path / "emb.parquet")
    _df(spark, _vectors(40, seed=8)).write.parquet(src)
    idx = str(tmp_path / "sidx")

    r1 = serve.dispatch(st, "embeddings", {
        "action": "index-build", "input": src, "index": idx, "k_cells": 4,
    })
    assert r1["ok"] and r1["result"]["k_cells"] == 4
    r2 = serve.dispatch(st, "embeddings", {
        "action": "index-search", "input": src, "index": idx,
        "k": 3, "n_queries": 2,
    })
    assert r2["ok"] and len(r2["result"]["rows"]) == 6


def test_index_search_no_queries_and_empty_build_guard(spark, tmp_path):
    corpus = _df(spark, _vectors(30, seed=9))
    idx = str(tmp_path / "edge_idx")
    ann_index.ivf_build_index(corpus, idx, k_cells=4, iters=2)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert ann_index.ivf_search_index(spark, idx, empty, k=3).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty corpus"):
        ann_index.ivf_build_index(empty, str(tmp_path / "e2"), k_cells=2)


def test_index_info_and_compact_preserve_search(spark, tmp_path):
    """Three appends fragment the cell files; compact coalesces to one
    file per cell and search results are identical before/after."""
    import glob

    rows = _vectors(90, seed=10)
    idx = str(tmp_path / "frag_idx")
    ann_index.ivf_build_index(_df(spark, rows[:30]), idx, k_cells=4, iters=3)
    ann_index.ivf_append_index(_df(spark, rows[30:60]), idx)
    ann_index.ivf_append_index(_df(spark, rows[60:]), idx)

    info = {r["cell"]: r for r in ann_index.ivf_index_info(spark, idx).collect()}
    assert sum(r["n_vectors"] for r in info.values()) == 90
    assert any(r["n_files"] > 1 for r in info.values())  # fragmented

    queries = _df(spark, _vectors(4, seed=11))
    before = _key(ann_index.ivf_search_index(spark, idx, queries, k=3).collect())
    res = ann_index.ivf_compact_index(spark, idx)
    assert res["rows"] == 90
    after_info = ann_index.ivf_index_info(spark, idx).collect()
    assert all(r["n_files"] == 1 for r in after_info)
    assert not glob.glob(f"{idx}/cells.old") and not glob.glob(f"{idx}/cells.compact.tmp")
    after = _key(ann_index.ivf_search_index(spark, idx, queries, k=3).collect())
    assert before == after


def test_cli_index_info_and_compact(tmp_path, capsys):
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="test-cli-idxinfo")
    src = str(tmp_path / "emb.parquet")
    _df(spark, _vectors(40, seed=12)).write.parquet(src)
    idx = str(tmp_path / "idx")
    assert main(["embeddings", "index-build", "--input", src,
                 "--index", idx, "--k-cells", "4"]) == 0
    assert main(["embeddings", "index-info", "--input", src,
                 "--index", idx]) == 0
    assert "n_vectors" in capsys.readouterr().out
    assert main(["embeddings", "index-compact", "--input", src,
                 "--index", idx]) == 0
    assert "compacted index (40 vectors)" in capsys.readouterr().err


def test_build_persists_ann_recall_row(spark, tmp_path):
    corpus = _df(spark, _vectors(80))
    idx = str(tmp_path / "ivf_recall")
    meta = ann_index.ivf_build_index(
        corpus, idx, k_cells=4, iters=4, recall_queries=10, recall_k=3
    )
    stored = ann_index.load_meta(idx)
    for m in (meta, stored):
        rr = m["ann_recall"]
        assert rr["n_queries"] == 10 and rr["k"] == 3 and rr["nprobe"] == 2
        assert 0.0 <= rr["recall"] <= 1.0
    # opt-out leaves meta without the row
    idx2 = str(tmp_path / "ivf_norecall")
    ann_index.ivf_build_index(corpus, idx2, k_cells=4, iters=4, recall_queries=0)
    assert "ann_recall" not in ann_index.load_meta(idx2)


def test_drift_detection_after_skewed_appends(spark, tmp_path):
    """Appends assign with FROZEN centroids by design; a skewed append
    (every new vector far from any training cluster) must show up as
    drift_ratio > 0.5 on the cells that absorbed it, while a fresh
    index over well-clustered data stays comfortably below — the
    documented re-train trigger."""
    corpus = _df(spark, _vectors(80))
    idx = str(tmp_path / "ivf_drift")
    ann_index.ivf_build_index(corpus, idx, k_cells=4, iters=4, recall_queries=0)

    healthy = {
        r["cell"]: r for r in ann_index.ivf_index_info(spark, idx, drift=True).collect()
    }
    assert all(r["drift_ratio"] < 0.5 for r in healthy.values()), healthy
    assert all(r["centroid_shift"] >= 0.0 for r in healthy.values())

    # skewed batch: a tight far-away cluster, 3x the original corpus
    rng = np.random.default_rng(9)
    far = [
        (1000 + i, (np.full(6, 25.0) + rng.normal(size=6) * 0.1).tolist())
        for i in range(240)
    ]
    ann_index.ivf_append_index(_df(spark, far), idx)

    drifted = {
        r["cell"]: r for r in ann_index.ivf_index_info(spark, idx, drift=True).collect()
    }
    assert any(r["drift_ratio"] > 0.5 for r in drifted.values()), drifted
    # occupancy columns still present and consistent
    assert sum(r["n_vectors"] for r in drifted.values()) == 320
    # plain info (drift=False) is unchanged in shape
    plain = ann_index.ivf_index_info(spark, idx).columns
    assert plain == ["cell", "n_vectors", "n_files"]


def test_retrain_after_drift_trigger(spark, tmp_path):
    """Round-7 lifecycle closure (VERDICT r6 ask #6): a skewed index
    crosses the documented drift_ratio > 0.5 trigger; index-retrain
    retrains centroids FROM THE INDEX CONTENTS, rewrites the cells, and
    afterwards (a) every cell is back under the trigger, (b) recall is
    non-decreasing vs the pre-drift build, (c) the old ann_recall row is
    preserved in meta['ann_recall_history'], and (d) search still
    returns exact ivf_topk results for the new centroids."""
    corpus = _df(spark, _vectors(80))
    idx = str(tmp_path / "ivf_retrain")
    built = ann_index.ivf_build_index(
        corpus, idx, k_cells=4, iters=4, recall_queries=12
    )
    recall_before = built["ann_recall"]["recall"]

    rng = np.random.default_rng(9)
    far = [
        (1000 + i, (np.full(6, 25.0) + rng.normal(size=6) * 0.1).tolist())
        for i in range(240)
    ]
    ann_index.ivf_append_index(_df(spark, far), idx)
    drifted = ann_index.ivf_index_info(spark, idx, drift=True).collect()
    assert any(r["drift_ratio"] > 0.5 for r in drifted), drifted

    meta = ann_index.ivf_retrain_index(spark, idx, iters=4, recall_queries=12)

    after = ann_index.ivf_index_info(spark, idx, drift=True).collect()
    assert all(r["drift_ratio"] < 0.5 for r in after), after
    assert sum(r["n_vectors"] for r in after) == 320  # nothing lost
    # recall non-decreasing (the far cluster is tight: cells now fit)
    assert meta["ann_recall"]["recall"] >= recall_before
    assert meta["ann_recall"]["retrained"] is True
    # history carries the pre-retrain row
    hist = meta["ann_recall_history"]
    assert len(hist) == 1 and hist[0]["recall"] == recall_before
    # the persisted meta agrees with the returned one
    disk = ann_index.load_meta(idx)
    assert disk["ann_recall"] == meta["ann_recall"]
    assert disk["ann_recall_history"] == hist

    # search over the retrained index == in-memory ivf_topk on the new
    # centroids (the build-time equivalence, re-proven post-retrain)
    queries = _df(spark, _vectors(5, seed=2))
    got = ann_index.ivf_search_index(spark, idx, queries, k=3, nprobe=2).collect()
    all_rows = corpus.unionByName(_df(spark, far))
    want = similarity.ivf_topk(
        all_rows, queries, disk["centroids"], k=3, nprobe=2
    ).collect()
    assert _key(got) == _key(want)


def test_retrain_twice_accumulates_history(spark, tmp_path):
    corpus = _df(spark, _vectors(60))
    idx = str(tmp_path / "ivf_hist")
    ann_index.ivf_build_index(corpus, idx, k_cells=4, iters=3, recall_queries=8)
    ann_index.ivf_retrain_index(spark, idx, iters=3, recall_queries=8)
    meta = ann_index.ivf_retrain_index(spark, idx, iters=3, recall_queries=8)
    assert len(meta["ann_recall_history"]) == 2
    assert meta["ann_recall_history"][1]["retrained"] is True


def test_retrain_and_compact_survive_stale_old_dir(spark, tmp_path):
    """ADVICE r8: a crash between the two renames of a previous swap
    leaves <cells>.old behind; os.rename onto a non-empty dir raises,
    which made the index permanently un-retrainable/un-compactable.
    Both verbs must clear the leftover and complete."""
    import os

    corpus = _df(spark, _vectors(60))
    idx = str(tmp_path / "ivf_stale_old")
    ann_index.ivf_build_index(corpus, idx, k_cells=4, iters=3)
    old = os.path.join(idx, "cells.old")
    os.makedirs(os.path.join(old, "cell=0"))
    open(os.path.join(old, "cell=0", "leftover.parquet"), "w").write("x")
    meta = ann_index.ivf_retrain_index(spark, idx, iters=2)
    assert len(meta["centroids"]) == 4
    assert not os.path.exists(old)
    os.makedirs(os.path.join(old, "cell=1"))
    open(os.path.join(old, "cell=1", "leftover.parquet"), "w").write("x")
    out = ann_index.ivf_compact_index(spark, idx)
    assert out["rows"] == 60
    assert not os.path.exists(old)
    got = ann_index.ivf_search_index(spark, idx, _df(spark, _vectors(5)), k=3)
    assert got.count() > 0


def test_retrain_recommended_flag_lifecycle(spark, tmp_path):
    """VERDICT r7 ask #7: append folds the batch's per-cell running
    sums into meta['cell_stats'] (O(batch) — the stored side is never
    re-read) and records a suggest-only retrain_recommended flag.
    Skewed appends flip it, ivf_retrain_index clears it, and the
    ledger's drift agrees with the full-scan
    ivf_index_info(drift=True) measurement."""
    import json
    import os

    corpus = _df(spark, _vectors(80))
    idx = str(tmp_path / "ivf_flag")
    meta = ann_index.ivf_build_index(
        corpus, idx, k_cells=4, iters=4, recall_queries=0
    )
    rec = meta["retrain_recommended"]
    assert rec["flag"] is False and rec["threshold"] == 0.5
    assert ann_index.load_meta(idx)["retrain_recommended"]["flag"] is False

    # a benign append keeps the flag down
    rng = np.random.default_rng(5)
    near = _vectors(20, seed=11)
    meta = ann_index.ivf_append_index(
        _df(spark, [(500 + i, v) for i, (_, v) in enumerate(near)]), idx
    )
    assert meta["retrain_recommended"]["flag"] is False

    # a skewed append (tight far-away cluster, 3x corpus) raises it
    far = [
        (1000 + i, (np.full(6, 25.0) + rng.normal(size=6) * 0.1).tolist())
        for i in range(240)
    ]
    meta = ann_index.ivf_append_index(_df(spark, far), idx)
    rec = meta["retrain_recommended"]
    assert rec["flag"] is True
    assert rec["max_drift_ratio"] > rec["threshold"]
    assert ann_index.load_meta(idx)["retrain_recommended"]["flag"] is True

    # the incremental ledger reproduces the full-scan measurement
    info = {
        r["cell"]: r
        for r in ann_index.ivf_index_info(spark, idx, drift=True).collect()
    }
    worst_scan = max(r["drift_ratio"] for r in info.values())
    assert abs(rec["max_drift_ratio"] - worst_scan) < 1e-6
    assert abs(info[rec["cell"]]["drift_ratio"] - rec["max_drift_ratio"]) < 1e-6

    # retrain reseeds the ledger against the new centroids -> flag clears
    ann_index.ivf_retrain_index(spark, idx, iters=4, recall_queries=0)
    disk = ann_index.load_meta(idx)
    assert disk["retrain_recommended"]["flag"] is False
    assert sum(s["n"] for s in disk["cell_stats"].values()) == 340

    # pre-ledger index (older meta.json): append bootstraps the ledger
    # from the stored cells once, then flags normally
    mp = os.path.join(idx, "meta.json")
    with open(mp) as fh:
        legacy = json.load(fh)
    legacy.pop("cell_stats")
    legacy.pop("retrain_recommended")
    with open(mp, "w") as fh:
        json.dump(legacy, fh)
    meta = ann_index.ivf_append_index(
        _df(spark, [(2000, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0])]), idx
    )
    assert "cell_stats" in meta and "retrain_recommended" in meta
    assert sum(s["n"] for s in meta["cell_stats"].values()) == 341


def test_append_dim_guard_fails_pre_write_no_extra_scan(spark, tmp_path):
    """Round 10 (ADVICE r9 #4): the append dim check rides the
    assignment kernel — a mismatched batch fails BEFORE any cell is
    written (cells and ledger unchanged), and an empty/malformed
    centroid list raises a clear ValueError instead of IndexError."""
    import glob
    import json
    import os

    import pytest

    idx = str(tmp_path / "dim_idx")
    rows = _vectors(40)
    ann_index.ivf_build_index(_df(spark, rows), idx, k_cells=3)
    before_meta = ann_index.load_meta(idx)
    before_files = sorted(glob.glob(os.path.join(idx, "cells", "**"), recursive=True))

    bad = spark.createDataFrame(
        [(9999, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="!= index dim"):
        ann_index.ivf_append_index(bad, idx)
    # nothing written, ledger untouched
    after_files = sorted(glob.glob(os.path.join(idx, "cells", "**"), recursive=True))
    assert after_files == before_files
    assert ann_index.load_meta(idx) == before_meta

    # malformed meta: empty centroids -> explicit ValueError
    mp = os.path.join(idx, "meta.json")
    with open(mp) as fh:
        meta = json.load(fh)
    meta["centroids"] = []
    with open(mp, "w") as fh:
        json.dump(meta, fh)
    with pytest.raises(ValueError, match="no centroids"):
        ann_index.ivf_append_index(_df(spark, rows[:1]), idx)
