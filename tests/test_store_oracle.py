"""Differential oracle for the STORE macro library: the driver's static
tables can't exercise LogStore views, so this suite writes a real store
and checks `load_runs` / `load_events` against DuckDB SQL over the same
parquet files — the store macros get the same engine-vs-engine evidence
the gate catalog gives the driver tables."""

from __future__ import annotations

import os

import duckdb
import pytest

from blq_cli_spark.sources.store import LogStore
from tests.fixtures_blq import make_runs_and_events


@pytest.fixture(scope="module")
def seeded(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("oracle_store") / "bird")
    st = LogStore(spark, root)
    runs, events = make_runs_and_events()
    by_run: dict[str, list] = {}
    for ev in events:
        by_run.setdefault(ev["invocation_id"], []).append(ev)
    for run in runs:
        st.append_run(run, by_run.get(run["id"], []))
    con = duckdb.connect()
    for t in ("runs", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
            f"'{os.path.join(root, t)}/*/*.parquet', hive_partitioning=1)"
        )
    return st, con


def test_load_runs_counts_match_duckdb(seeded):
    st, con = seeded
    got = {
        r["id"]: (
            r["n_events"], r["n_errors"], r["n_warnings"],
            r["n_unique_errors"], r["badge"],
        )
        for r in st.runs_loaded().collect()
    }
    want = {
        row[0]: tuple(row[1:])
        for row in con.execute(
            """
            SELECT r.id,
                   coalesce(c.n_events, 0), coalesce(c.n_errors, 0),
                   coalesce(c.n_warnings, 0), coalesce(c.n_unique, 0),
                   CASE WHEN r.exit_code IS NULL THEN '?'
                        WHEN r.exit_code = 0 THEN 'ok'
                        WHEN r.exit_code < 0 THEN 'killed'
                        ELSE 'fail' END AS badge
            FROM runs r
            LEFT JOIN (
              SELECT invocation_id,
                     count(*) AS n_events,
                     count(*) FILTER (severity = 'error') AS n_errors,
                     count(*) FILTER (severity = 'warning') AS n_warnings,
                     count(DISTINCT fingerprint)
                       FILTER (severity = 'error') AS n_unique
              FROM events GROUP BY invocation_id
            ) c ON c.invocation_id = r.id
            """
        ).fetchall()
    }
    assert got == want and len(got) == 8


def test_load_events_run_serial_mapping_matches_duckdb(seeded):
    st, con = seeded
    got = {
        (r["id"], r["run_serial"], r["source_name"])
        for r in st.events_flat().select("id", "run_serial", "source_name").collect()
    }
    want = set(
        con.execute(
            """
            SELECT e.id, r.run_serial, r.source_name
            FROM events e JOIN runs r ON e.invocation_id = r.id
            """
        ).fetchall()
    )
    assert got == want and got


def test_load_attempts_status_matches_duckdb(spark, tmp_path):
    from tests.fixtures_blq import make_attempts_and_outcomes

    st = LogStore(spark, str(tmp_path / "bird_att"))
    attempts, outcomes = make_attempts_and_outcomes()
    for att in attempts:
        st.start_attempt(att)
    for out in outcomes:
        st.complete_attempt(out["attempt_id"], out)
    got = {
        r["id"]: (r["status"], r["badge"])
        for r in st.attempts_loaded().select("id", "status", "badge").collect()
    }
    con = duckdb.connect()
    root = st.root if hasattr(st, "root") else str(tmp_path / "bird_att")
    for t in ("attempts", "outcomes"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
            f"'{os.path.join(root, t)}/*/*.parquet', hive_partitioning=1)"
        )
    want = {
        row[0]: (row[1], row[2])
        for row in con.execute(
            """
            SELECT a.id,
                   CASE WHEN o.attempt_id IS NULL THEN 'pending'
                        WHEN o.exit_code IS NULL THEN 'orphaned'
                        ELSE 'completed' END AS status,
                   CASE WHEN o.exit_code IS NULL THEN '?'
                        WHEN o.exit_code = 0 THEN 'ok'
                        WHEN o.exit_code < 0 THEN 'killed'
                        ELSE 'fail' END AS badge
            FROM attempts a LEFT JOIN outcomes o ON o.attempt_id = a.id
            """
        ).fetchall()
    }
    assert got == want and len(got) == len(attempts)
    assert set(got.values()) >= {("pending", "?"), ("completed", "ok")}


def test_concurrent_writers_lose_nothing_and_match_duckdb(spark, tmp_path):
    """VERDICT r4 ask #5: N parallel append_run writers against ONE store.
    Unsynchronized Spark append jobs share `_temporary` staging and lose
    writes (measured 9/32 lost before the store-write lock); with the
    lock every row must land exactly once, and the runs⋈events view must
    still match DuckDB over the same files."""
    import threading

    root = str(tmp_path / "bird_concurrent")
    n_threads, n_runs = 6, 3
    errs: list = []

    def writer(t: int) -> None:
        try:
            st = LogStore(spark, root)  # own instance: separate serial cache
            for i in range(n_runs):
                st.append_run(
                    {"cmd": f"cmd-{t}-{i}", "exit_code": i % 2},
                    events=[
                        {"severity": "error" if i % 2 else "info",
                         "message": f"msg-{t}-{i}"}
                    ],
                    output=f"output-{t}-{i}",
                )
        except Exception as e:  # surfaced below; a thread must not die silently
            errs.append(repr(e))

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs

    st = LogStore(spark, root)
    expected = n_threads * n_runs
    assert st.runs().count() == expected
    assert st.runs().select("id").distinct().count() == expected
    assert st.events().count() == expected
    # run_serial is issued from the durable counter under the same lock:
    # unique AND gapless across all concurrent writers
    serials = sorted(r["run_serial"] for r in st.runs().select("run_serial").collect())
    assert serials == list(range(1, expected + 1)), serials[:40]

    con = duckdb.connect()
    for t in ("runs", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
            f"'{os.path.join(root, t)}/*/*.parquet', hive_partitioning=1)"
        )
    got = {
        (r["id"], r["n_events"], r["n_errors"], r["badge"])
        for r in st.runs_loaded()
        .select("id", "n_events", "n_errors", "badge")
        .collect()
    }
    want = set(
        con.execute(
            """
            SELECT r.id, coalesce(c.n, 0), coalesce(c.n_err, 0),
                   CASE WHEN r.exit_code = 0 THEN 'ok' ELSE 'fail' END
            FROM runs r
            LEFT JOIN (
              SELECT invocation_id, count(*) AS n,
                     count(*) FILTER (severity = 'error') AS n_err
              FROM events GROUP BY invocation_id
            ) c ON c.invocation_id = r.id
            """
        ).fetchall()
    )
    assert got == want and len(got) == expected
    # the write lock is released afterwards, not leaked
    assert not os.path.exists(os.path.join(root, "locks", "store-write.lock"))


def test_store_write_lock_foreign_holder_and_stale_reclaim(spark, tmp_path, monkeypatch):
    """Cross-process half of the append serialization: a LIVE foreign
    holder of the store-write lock blocks appends (bounded wait ->
    LockHeldError), and a DEAD holder's lock is reclaimed transparently."""
    from blq_cli_spark.sources import locks as locks_mod
    from blq_cli_spark.sources import store as store_mod

    st = LogStore(spark, str(tmp_path / "locked_store"))
    st.append_run({"cmd": "first"}, events=[])
    locks_dir = os.path.join(st.root, "locks")

    monkeypatch.setattr(store_mod, "_WRITE_LOCK_WAIT_S", 0.5)
    # live holder (this PID counts as alive) -> append must give up
    locks_mod.acquire_lock(locks_dir, "store-write", "att-1", "other-writer")
    with pytest.raises(locks_mod.LockHeldError):
        st.append_run({"cmd": "blocked"}, events=[])
    locks_mod.release_lock(locks_dir, "store-write")
    st.append_run({"cmd": "after-release"}, events=[])

    # dead holder -> reclaimed without error
    locks_mod.acquire_lock(locks_dir, "store-write", "att-2", "crashed", pid=999_999_999)
    st.append_run({"cmd": "after-stale"}, events=[])
    assert st.runs().count() == 3
