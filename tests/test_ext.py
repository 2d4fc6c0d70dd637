"""Annotator pipeline (ext.py): builtins, row annotators, side-table merge."""

from __future__ import annotations

import json

import pytest

from blq_cli_spark import ext
from blq_cli_spark.sources.store import LogStore
from tests.fixtures_blq import make_runs_and_events


@pytest.fixture()
def store(spark, tmp_path):
    st = LogStore(spark, str(tmp_path / "bird"))
    runs, events = make_runs_and_events()
    by_run: dict[str, list] = {}
    for ev in events:
        by_run.setdefault(ev["invocation_id"], []).append(ev)
    for run in runs:
        st.append_run(run, by_run.get(run["id"], []))
    return st


def test_annotation_display_validation():
    with pytest.raises(ValueError):
        ext.Annotation("a", "t", "banner", {})
    a = ext.Annotation("a", "t", "inline", {"x": 1})
    assert a.to_dict()["data"] == {"x": 1}


def test_builtin_annotators_registered():
    assert {"fingerprint_count", "first_seen"} <= set(ext.annotators())


def test_run_annotators_and_merge(store):
    n = ext.run_annotators(store, ["fingerprint_count", "first_seen"])
    assert n > 0
    assert store.table("annotations").count() == n

    flat = ext.events_annotated(store)
    annotated = flat.filter(flat.annotations.isNotNull()).collect()
    assert annotated
    parsed = json.loads(annotated[0]["annotations"])
    assert all(a["annotator"] in ("fingerprint_count", "first_seen") for a in parsed)
    # first_seen payload carries is_new + first_serial
    fs = [a for r in annotated for a in json.loads(r["annotations"]) if a["ann_type"] == "first_seen"]
    assert fs and {"first_serial", "is_new"} <= set(json.loads(fs[0]["data"]))


def test_row_annotator_distributed(store):
    def long_message(rec: dict) -> ext.Annotation | None:
        msg = rec.get("message") or ""
        if len(msg) > 20:
            return ext.Annotation("long_message", "length", "hidden", {"n_chars": len(msg)})
        return None

    ext.register_row_annotator("long_message", long_message)
    try:
        n = ext.run_annotators(store, ["long_message"])
        rows = store.table("annotations").filter("annotator = 'long_message'").collect()
        assert len(rows) == n > 0
        assert all(json.loads(r["data"])["n_chars"] > 20 for r in rows)
    finally:
        ext._ROW_ANNOTATORS.pop("long_message", None)


def test_failing_annotator_skipped(store):
    def boom(df):
        raise RuntimeError("bad plugin")

    ext.register_annotator("boom", boom)
    try:
        n = ext.run_annotators(store, ["boom", "fingerprint_count"])
        assert n > 0  # fingerprint_count still ran
        assert store.table("annotations").filter("annotator = 'boom'").count() == 0
    finally:
        ext._DF_ANNOTATORS.pop("boom", None)


def test_discover_no_entry_points_ok():
    assert ext.discover() == []
