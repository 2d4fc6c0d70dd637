"""Incremental rollup maintenance — the continuous-aggregate pattern
(hypertable-style): keep a small pre-aggregated table alongside the raw
events and serve time-series queries from it, re-aggregating only the
dates that are not rolled up yet.

Why this matters at 100 TB: severity/tool trend queries are run
constantly (status dashboards, `errors -n`, CI comparisons) and each one
re-scans the raw fact table without this. The rollup table is
~|dates| x |sources| x |severities| rows — dimension-scale — and
maintenance work is proportional to NEW data only:

- `maintain()` lists raw `date=` partitions not yet present in the
  rollup layout (directory listing, no data read), aggregates exactly
  those partitions (partition-pruned scan), and appends the result.
  Re-running it is O(new dates); a crash mid-append leaves whole
  missing dates, which the next run re-lists — idempotent because each
  rolled date is written exactly once and dates are only rolled CLOSED
  (date < today), never while still appending.
- `timeseries()` serves [rollup for closed dates] UNION [raw
  aggregation for unrolled dates] — the standard real-time continuous
  aggregate view: always correct, never re-scans history.
"""

from __future__ import annotations

import datetime as _dt
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

ROLLUP_TABLE = "rollup_severity_daily"

_KEYS = ("source_name", "severity", "tool_name")


def _dates_on_disk(root: str, table: str) -> set[str]:
    path = os.path.join(root, table)
    if not os.path.isdir(path):
        return set()
    return {
        d[5:] for d in os.listdir(path) if d.startswith("date=") and d[5:]
    }


def _aggregate(events: DataFrame, runs: DataFrame) -> DataFrame:
    """The rolled shape: one row per (date, source, severity, tool)."""
    ev = events.join(
        F.broadcast(runs.select(F.col("id").alias("invocation_id"), "source_name")),
        "invocation_id",
        "left",
    )
    return ev.groupBy("date", *[F.col(k) for k in _KEYS]).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("fingerprint").alias("n_fingerprints"),
    )


def maintain(store, today: _dt.date | None = None) -> int:
    """Roll up every CLOSED raw date (< today) that isn't rolled yet.
    Returns the number of dates rolled. Partition pruning: the scan
    filter is on the hive `date` column, so only new partitions are
    read (asserted in tests via the explain plan)."""
    today = today or _dt.date.today()
    raw = _dates_on_disk(store.root, "events")
    done = _dates_on_disk(store.root, ROLLUP_TABLE)
    todo = sorted(d for d in raw - done if d < today.isoformat())
    if not todo:
        return 0
    events = store.events().filter(F.col("date").isin([_dt.date.fromisoformat(d) for d in todo]))
    out = _aggregate(events, store.runs())
    out.write.mode("append").partitionBy("date").parquet(
        os.path.join(store.root, ROLLUP_TABLE)
    )
    return len(todo)


def rollup_table(store) -> DataFrame:
    path = os.path.join(store.root, ROLLUP_TABLE)
    if not os.path.isdir(path) or not any(
        f for f in os.listdir(path) if not f.startswith(".")
    ):
        schema = ("date date, source_name string, severity string, tool_name string,"
                  " n_events long, n_fingerprints long")
        return store.spark.createDataFrame([], schema)
    return store.spark.read.parquet(path)


def timeseries(store, today: _dt.date | None = None) -> DataFrame:
    """Severity/tool counts per day served rollup-first: closed, rolled
    dates come from the rollup table; anything newer (or not yet rolled)
    is aggregated from raw — correct at every instant, and the raw side
    scans only the unrolled partitions (partition-pruned anti-set)."""
    today = today or _dt.date.today()
    done = _dates_on_disk(store.root, ROLLUP_TABLE)
    rolled = rollup_table(store)
    if done:
        done_dates = [_dt.date.fromisoformat(d) for d in sorted(done)]
        fresh_raw = store.events().filter(~F.col("date").isin(done_dates))
    else:
        fresh_raw = store.events()
    fresh = _aggregate(fresh_raw, store.runs())
    cols = ["date", *_KEYS, "n_events", "n_fingerprints"]
    return rolled.select(cols).unionByName(fresh.select(cols))
