"""Incremental rollup maintenance (continuous-aggregate pattern):
maintenance touches only new closed dates, the serving view equals a
full raw aggregation at every point, and the new-date scan is
partition-pruned."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from blq_cli_spark.operators import rollup
from blq_cli_spark.sources.store import LogStore
from tests.fixtures_blq import make_runs_and_events

TODAY = dt.date(2026, 8, 13)


@pytest.fixture()
def store(spark, tmp_path):
    st = LogStore(spark, str(tmp_path / "s"))
    runs, events = make_runs_and_events()
    by_run: dict[str, list] = {}
    for ev in events:
        by_run.setdefault(ev["invocation_id"], []).append(ev)
    for run in runs:
        st.append_run(run, by_run.get(run["id"], []))
    return st


def _full_raw(st):
    rows = rollup._aggregate(st.events(), st.runs()).collect()
    return {
        (r["date"], r["source_name"], r["severity"], r["tool_name"]):
        (r["n_events"], r["n_fingerprints"])
        for r in rows
    }


def test_maintain_is_incremental_and_idempotent(store):
    n1 = rollup.maintain(store, today=TODAY)
    assert n1 == 1  # fixture events land on one date (2026-03-01)
    assert rollup.maintain(store, today=TODAY) == 0  # nothing new
    # new closed date arrives -> exactly one more date rolled
    store.append_run(
        {"cmd": "x", "source_name": "late", "timestamp": dt.datetime(2026, 8, 1, 9)},
        events=[{"severity": "error", "fingerprint": "fp_x", "tool_name": "gcc",
                 "event_type": "diagnostic", "message": "m"}],
    )
    assert rollup.maintain(store, today=TODAY) == 1
    assert rollup.maintain(store, today=TODAY) == 0


def test_open_date_never_rolled(store):
    store.append_run(
        {"cmd": "y", "source_name": "today", "timestamp": dt.datetime.combine(TODAY, dt.time(9))},
        events=[{"severity": "warning", "fingerprint": "fp_y", "tool_name": "gcc",
                 "event_type": "diagnostic", "message": "m"}],
    )
    rollup.maintain(store, today=TODAY)
    rolled_dates = {r["date"] for r in rollup.rollup_table(store).collect()}
    assert TODAY not in rolled_dates  # still-appending date stays raw


def test_timeseries_equals_full_raw_aggregation(store):
    # before any rollup
    assert _view(store) == _full_raw(store)
    rollup.maintain(store, today=TODAY)
    # after rollup (all closed)
    assert _view(store) == _full_raw(store)
    # with a mix of rolled + open data
    store.append_run(
        {"cmd": "z", "source_name": "today", "timestamp": dt.datetime.combine(TODAY, dt.time(10))},
        events=[{"severity": "error", "fingerprint": "fp_z", "tool_name": "tsc",
                 "event_type": "diagnostic", "message": "m"}],
    )
    assert _view(store) == _full_raw(store)


def _view(st):
    rows = rollup.timeseries(st, today=TODAY).collect()
    return {
        (r["date"], r["source_name"], r["severity"], r["tool_name"]):
        (r["n_events"], r["n_fingerprints"])
        for r in rows
    }


def test_maintain_scan_is_partition_pruned(store):
    """The events scan for a maintenance pass must push the date filter
    into partition pruning (PartitionFilters in the parquet scan)."""
    rollup.maintain(store, today=TODAY)
    store.append_run(
        {"cmd": "x", "source_name": "late", "timestamp": dt.datetime(2026, 8, 1, 9)},
        events=[{"severity": "error", "fingerprint": "fp_q", "tool_name": "gcc",
                 "event_type": "diagnostic", "message": "m"}],
    )
    ev = store.events().filter(F.col("date").isin([dt.date(2026, 8, 1)]))
    plan = ev._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "2026-08-01" in plan
