"""LogStore ingest + the blq macro/view library, with DuckDB differential
checks for the load_runs / attempts-status semantics."""

from __future__ import annotations

import datetime as dt

import duckdb
import pyspark.sql.functions as F
import pytest

from blq_cli_spark.operators import views
from blq_cli_spark.sources.store import LogStore
from tests.fixtures_blq import BASE_TS, make_attempts_and_outcomes, make_runs_and_events


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bird"))
    st = LogStore(spark, root)
    runs, events = make_runs_and_events()
    by_run: dict[str, list] = {}
    for ev in events:
        by_run.setdefault(ev["invocation_id"], []).append(ev)
    for run in runs:
        st.append_run(run, by_run.get(run["id"], []), output=f"log for {run['id']}\n" * 3)
    for att in make_attempts_and_outcomes()[0]:
        st.start_attempt(att)
    for out in make_attempts_and_outcomes()[1]:
        st.complete_attempt(out["attempt_id"], out)
    return st


def test_roundtrip_counts(store):
    assert store.runs().count() == 8
    assert store.events().count() > 8 * 5
    assert store.attempts().count() == 4
    assert store.outcomes().count() == 2


def test_events_flat_join_and_refs(store):
    flat = store.events_flat()
    assert flat.count() == store.events().count()  # inner join loses nothing
    row = flat.filter((F.col("run_serial") == 1) & (F.col("event_index") == 1)).collect()[0]
    assert row["ref"] == "tag1:1:1"
    untagged = flat.filter(F.col("tag").isNull()).collect()
    assert untagged and all(r["ref"].startswith("~") for r in untagged)
    located = flat.filter(F.col("ref_file").isNotNull() & F.col("ref_line").isNotNull()).first()
    assert located["loc"].startswith(located["ref_file"] + ":")


def test_load_runs_counts_match_duckdb(store):
    """Differential: our pre-aggregate-then-join formulation must equal the
    reference's LEFT-JOIN-then-GROUP (bird_schema.sql:433-465) run by
    DuckDB on the same parquet."""
    got = {
        r["run_serial"]: (r["n_events"], r["n_errors"], r["n_warnings"], r["n_unique_errors"])
        for r in store.runs_loaded().collect()
    }
    con = duckdb.connect()
    oracle = con.sql(
        f"""
        SELECT i.run_serial,
               count(e.id) AS n_events,
               CAST(count(*) FILTER (WHERE e.severity = 'error') AS BIGINT) AS n_errors,
               CAST(count(*) FILTER (WHERE e.severity = 'warning') AS BIGINT) AS n_warnings,
               CAST(count(DISTINCT e.fingerprint) FILTER (WHERE e.severity = 'error') AS BIGINT)
                 AS n_unique_errors
        FROM read_parquet('{store.root}/runs/*/*.parquet', hive_partitioning=true) i
        LEFT JOIN read_parquet('{store.root}/events/*/*.parquet', hive_partitioning=true) e
          ON e.invocation_id = i.id
        GROUP BY i.run_serial
        """
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in oracle} == got


def test_attempt_status_three_way(store):
    byid = {r["id"]: r["status"] for r in store.attempts_loaded().collect()}
    assert byid == {
        "att-1": "completed",
        "att-2": "orphaned",
        "att-3": "pending",
        "att-4": "pending",
    }
    running_ids = {r["id"] for r in views.running(store.attempts(), store.outcomes()).collect()}
    assert running_ids == {"att-3", "att-4"}


def test_source_status_latest_per_source(store):
    rows = {r["source_name"]: r for r in store.source_status().collect()}
    # pending attempts are newer than completed runs only for their source
    # if started_at > run timestamp; our attempts start before runs ->
    # every source shows its latest completed run
    runs = store.runs_loaded().collect()
    for src in {r["source_name"] for r in runs}:
        latest = max((r for r in runs if r["source_name"] == src), key=lambda r: r["timestamp"])
        assert rows[src]["started_at"] == latest["timestamp"]


def test_errors_topk_and_json(store):
    flat = store.events_flat()
    top = views.errors(flat, n=5).collect()
    assert len(top) == 5
    assert all(r["severity"] == "error" for r in top)
    serials = [r["run_serial"] for r in top]
    assert serials == sorted(serials, reverse=True)
    js = views.errors_json(flat, n=3).collect()[0]["errors_json"]
    assert js.startswith("[") and js.count('"severity"') == 3


def test_diff_fingerprints_new_fixed_unchanged(store):
    flat = store.events_flat()
    d = views.diff_fingerprints(flat, 2, 3)
    by_change = {
        r["fingerprint"]: r["change"] for r in d.collect()
    }
    # run2 picks fp_pool[2:8]+fp_000, run3 picks fp_pool[3:9]
    assert by_change["fp_002"] == "fixed"
    assert by_change["fp_000"] == "fixed"
    assert by_change["fp_008"] == "new"
    assert by_change["fp_003"] == "unchanged"


def test_fingerprint_regression_gap(store):
    stats = {r["fingerprint"]: r for r in views.fingerprint_stats(store.events_flat()).collect()}
    # fp_000 occurs in runs 1,2 then 6,7,8 -> gap of 4 -> reappeared
    assert stats["fp_000"]["reappeared"] is True
    assert stats["fp_000"]["max_gap"] == 4
    assert stats["fp_003"]["reappeared"] is False


def test_diff_by_group_delta(store):
    d = views.diff_by_group(store.events_flat(), 1, 2).collect()
    assert all(r["delta"] == r["count2"] - r["count1"] for r in d)
    assert sum(r["count1"] for r in d) == store.events_flat().filter("run_serial = 1").count()


def test_summary_and_sandbox(store):
    s = views.summary(store.events_flat()).collect()
    assert all(r["errors"] > 0 or r["warnings"] > 0 for r in s)
    latest = views.summary(store.events_flat(), latest_only=True).collect()
    assert {(r["tool_name"], r["category"]) for r in latest} <= {
        (r["tool_name"], r["category"]) for r in s
    }
    sb = {(r["network"], r["filesystem"]): r["n_runs"] for r in
          views.sandbox_summary(store.runs()).collect()}
    assert sb[("on", "rw")] == 4 and sb[("off", "rw")] == 4


def test_blob_inline_threshold_and_gc(store):
    small = store.write_output("inv-x", "tiny content", date=dt.date(2026, 3, 2))
    assert small["storage_type"] == "inline"
    assert store.read_output(small["storage_ref"]) == b"tiny content"
    big = store.write_output("inv-y", "B" * 5000, date=dt.date(2026, 3, 2))
    assert big["storage_type"] == "blob"
    assert store.read_output(big["storage_ref"]) == b"B" * 5000
    # same content -> same blob file (dedup), different output row
    again = store.write_output("inv-z", "B" * 5000, date=dt.date(2026, 3, 2))
    assert again["storage_ref"] == big["storage_ref"]
    assert store.cleanup_orphaned_blobs() == 0  # everything referenced


def test_orphan_sweep(store):
    now = BASE_TS + dt.timedelta(hours=1)
    swept = store.sweep_orphans(max_age_seconds=60, now=now)
    assert swept == 2  # att-3, att-4 were pending and old
    byid = {r["id"]: r["status"] for r in store.attempts_loaded().collect()}
    assert byid["att-3"] == "orphaned" and byid["att-4"] == "orphaned"


def test_v1_extra_views(store):
    flat = store.events_flat()
    f = views.files(flat)
    rows = f.collect()
    assert rows
    assert all(r["total"] >= r["errors"] + r["warnings"] for r in rows)
    # per-file filter matches groupBy accounting
    top = rows[0]
    fe = views.file_events(flat, top["ref_file"])
    assert fe.count() == top["total"]
    ec = views.errors_compact(flat, n=5)
    got = ec.collect()
    assert len(got) <= 5
    assert set(ec.columns) == {"ref", "loc", "message", "tool_name"}


def test_compact_preserves_data(spark, tmp_path):
    st = LogStore(spark, str(tmp_path / "bird"))
    d = dt.date(2026, 3, 1)
    for i in range(5):  # five appends -> five files in one partition
        st.append_run(
            {"cmd": f"c{i}", "timestamp": dt.datetime.combine(d, dt.time(10, i)),
             "date": d, "source_name": "build", "exit_code": 0},
            [{"severity": "error", "message": f"m{i}", "event_type": "diagnostic"}],
        )
    before = st.events().orderBy("message").collect()
    part_dir = tmp_path / "bird" / "events" / f"date={d}"
    n_files_before = len([f for f in part_dir.iterdir() if f.suffix == ".parquet"])
    assert n_files_before == 5
    removed = st.compact("events")
    assert removed == 4
    n_files_after = len([f for f in part_dir.iterdir() if f.suffix == ".parquet"])
    assert n_files_after == 1
    after = st.events().orderBy("message").collect()
    assert [r["message"] for r in after] == [r["message"] for r in before]
    assert all(r["date"] == d for r in after)  # partition col survives
    # idempotent
    assert st.compact("events") == 0


def test_python_api_ergonomics(spark, tmp_path, monkeypatch):
    """Reference python-api.md:37-70 surface: open/query/run_events/
    latest_run/event/has_data/sql."""
    import os

    from tests.fixtures_blq import make_runs_and_events

    root = tmp_path / "proj" / ".bird-spark"
    st = LogStore(spark, str(root))
    assert not st.has_data()
    runs, events = make_runs_and_events()
    by_run: dict[str, list] = {}
    for ev in events:
        by_run.setdefault(ev["invocation_id"], []).append(ev)
    for run in runs:
        st.append_run(run, by_run.get(run["id"], []))
    assert st.has_data()
    assert st.latest_run() == len(runs)

    # open(): explicit, env, walk-up
    assert LogStore.open(str(root), spark).root == str(root)
    monkeypatch.setenv("BLQ_SPARK_STORE", str(root))
    assert LogStore.open(spark=spark).root == str(root)
    monkeypatch.delenv("BLQ_SPARK_STORE")
    sub = tmp_path / "proj" / "src" / "deep"
    sub.mkdir(parents=True)
    monkeypatch.chdir(sub)
    assert LogStore.open(spark=spark).root == str(root)

    # fluent query surface
    n_err = st.query().filter(severity="error").count()
    assert n_err > 0
    assert st.run_events(1).count() >= 1
    ev = st.event(1, 1)
    assert ev is not None and ev["run_serial"] == 1
    assert st.event(1, 9999) is None

    # sql with macro expansion
    got = st.sql("SELECT count(*) AS n FROM blq_errors(100)").collect()[0]["n"]
    assert got == min(n_err, 100)


def test_schema_version_marker_and_write_gate(spark, tmp_path):
    """Semver write-compat contract (reference docs/schema-stability.md):
    first write stamps the version; a different MAJOR refuses writes but
    keeps reads working."""
    import pytest as _pytest

    from blq_cli_spark import schemas as _schemas

    st = LogStore(spark, str(tmp_path / "vstore"))
    assert st.schema_version() is None
    st.start_attempt({"cmd": "x"})
    assert st.schema_version() == _schemas.SCHEMA_VERSION

    # same-major minor bump still writes
    (tmp_path / "vstore" / "schema_version").write_text("2.0.0")
    st.start_attempt({"cmd": "y"})

    # different major: writes refuse, reads still fine
    (tmp_path / "vstore" / "schema_version").write_text("3.0.0")
    with _pytest.raises(RuntimeError, match="migrate"):
        st.start_attempt({"cmd": "z"})
    assert st.attempts().count() == 2
