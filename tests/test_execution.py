"""run_command (S9 write path) + migrate_from_export (S14)."""

from __future__ import annotations

import sys

import pyspark.sql.functions as F

from blq_cli_spark.sources.execution import migrate_from_export, run_command
from blq_cli_spark.sources.store import LogStore

GCC_SCRIPT = r"""
import sys
print("main.c:10:5: error: expected ';' before 'return'")
print("util.c:3:1: warning: unused variable 'x'", file=sys.stderr)
sys.exit(2)
"""


def test_run_command_full_lifecycle(spark, tmp_path):
    st = LogStore(spark, str(tmp_path / "bird"))
    run = run_command(
        st, [sys.executable, "-c", GCC_SCRIPT], source_name="build", tag="ci"
    )
    assert run["exit_code"] == 2
    assert run["run_serial"] == 1
    assert run["duration_ms"] >= 0

    # attempt + outcome recorded, nothing pending
    att = st.attempts_loaded().collect()
    assert len(att) == 1 and att[0]["status"] == "completed"

    # events parsed from the captured output (gcc-style)
    evs = st.events().orderBy("event_index").collect()
    sevs = [e["severity"] for e in evs]
    assert "error" in sevs and "warning" in sevs
    assert any(e["ref_file"] == "main.c" and e["ref_line"] == 10 for e in evs)

    # output stored + readable back
    out_row = st.outputs().collect()[0]
    content = st.read_output(out_row["storage_ref"]).decode()
    assert "expected ';'" in content

    # flat view joins up
    flat = st.events_flat().filter(F.col("run_serial") == 1)
    assert flat.count() == len(evs)


def test_run_command_success_and_serial_increment(spark, tmp_path):
    st = LogStore(spark, str(tmp_path / "bird"))
    r1 = run_command(st, [sys.executable, "-c", "print('ok')"], source_name="s")
    r2 = run_command(st, [sys.executable, "-c", "print('ok')"], source_name="s")
    assert (r1["exit_code"], r2["exit_code"]) == (0, 0)
    assert r2["run_serial"] == r1["run_serial"] + 1


def test_migrate_from_export_roundtrip(spark, tmp_path):
    src = LogStore(spark, str(tmp_path / "src"))
    run_command(src, [sys.executable, "-c", GCC_SCRIPT], source_name="build")
    root = str(tmp_path / "global")
    src.sync_to(root, hostname="h1", namespace="ns", project="p")

    dst = LogStore(spark, str(tmp_path / "dst"))
    n = migrate_from_export(dst, root)
    assert n == 1
    assert dst.runs().count() == 1
    assert dst.events().count() == src.events().count()
    # idempotent: second migrate is a no-op
    assert migrate_from_export(dst, root) == 0


def test_registered_command_resolution(spark, tmp_path):
    from blq_cli_spark.sources import store as store_mod

    st = LogStore(spark, str(tmp_path / "bird"))
    store_mod.register_command(
        st, "lint", [sys.executable, "-c", "print('a.py:1:1: F401 x imported but unused')"],
        fmt="ruff", tag="nightly",
    )
    assert "lint" in store_mod.registered_commands(st)
    run = run_command(st, ["lint"])
    assert run["exit_code"] == 0
    assert run["source_name"] == "lint" and run["tag"] == "nightly"
    evs = st.events().collect()
    assert len(evs) == 1 and evs[0]["tool_name"] == "ruff"
    assert store_mod.unregister_command(st, "lint") is True
    assert store_mod.unregister_command(st, "lint") is False


def test_suppression_lists(spark, tmp_path):
    from blq_cli_spark.sources import store as store_mod

    st = LogStore(spark, str(tmp_path / "bird"))
    store_mod.suppress_fingerprint(st, "fp_global")
    store_mod.suppress_fingerprint(st, "fp_build", command="build")
    store_mod.suppress_fingerprint(st, "fp_global")  # idempotent
    assert store_mod.suppressed_fingerprints(st) == ["fp_global"]
    assert set(store_mod.suppressed_fingerprints(st, "build")) == {"fp_global", "fp_build"}


# --- command locks (reference locks.py + execution.py:324-350) ---------------


def test_lock_module_acquire_release_stale(tmp_path):
    import pytest

    from blq_cli_spark.sources import locks

    d = tmp_path / "locks"
    lk = locks.acquire_lock(d, "build", "att1", "make all")
    assert locks.read_lock(d, "build").pid == lk.pid
    # live holder blocks a second acquirer
    with pytest.raises(locks.LockHeldError) as exc:
        locks.acquire_lock(d, "build", "att2", "make all")
    assert "build" in str(exc.value)
    # other names are independent
    locks.acquire_lock(d, "test", "att3", "pytest")
    locks.release_lock(d, "build")
    assert locks.read_lock(d, "build") is None
    # dead-PID lock is reclaimed transparently
    (d / "stale.lock").write_text(
        '{"lock_name": "stale", "pid": 999999999, "attempt_id": "x", '
        '"command": "c", "acquired_at": 0.0}'
    )
    lk2 = locks.acquire_lock(d, "stale", "att4", "cmd")
    assert lk2.attempt_id == "att4"
    # corrupt lock file is also reclaimed
    (d / "bad.lock").write_text("not json")
    assert locks.acquire_lock(d, "bad", "att5", "cmd").attempt_id == "att5"
    # cleanup drops only dead/corrupt locks
    (d / "dead.lock").write_text(
        '{"lock_name": "dead", "pid": 999999999, "attempt_id": "x", '
        '"command": "c", "acquired_at": 0.0}'
    )
    cleaned = locks.cleanup_stale_locks(d)
    assert "dead" in cleaned and "test" not in cleaned


def test_lock_wait_succeeds_after_release(tmp_path):
    import threading
    import time as _time

    from blq_cli_spark.sources import locks

    d = tmp_path / "locks"
    locks.acquire_lock(d, "deploy", "att1", "deploy")
    t = threading.Timer(0.5, locks.release_lock, (d, "deploy"))
    t.start()
    try:
        got = locks.acquire_lock_wait(d, "deploy", "att2", "deploy", timeout=5.0)
        assert got.attempt_id == "att2"
    finally:
        t.cancel()


def test_run_command_lock_held_leaves_no_pending_attempt(spark, tmp_path):
    import pytest

    from blq_cli_spark.sources import locks

    st = LogStore(spark, str(tmp_path / "bird"))
    locks.acquire_lock(str(tmp_path / "bird" / "locks"), "build", "other", "make")
    with pytest.raises(locks.LockHeldError):
        run_command(
            st, [sys.executable, "-c", "print('hi')"], lock_name="build"
        )
    # the blocked run must not leave a pending attempt row behind
    assert st.attempts().count() == 0
    locks.release_lock(str(tmp_path / "bird" / "locks"), "build")
    run = run_command(st, [sys.executable, "-c", "print('hi')"], lock_name="build")
    assert run["exit_code"] == 0
    # lock released after the run completes
    assert locks.read_lock(str(tmp_path / "bird" / "locks"), "build") is None


def test_exit_code_reason_lookup():
    from blq_cli_spark.sources.execution import exit_code_reason, status_reason

    assert exit_code_reason("pytest", 5) == "No tests collected"
    assert exit_code_reason("pytest-unit", 5) == "No tests collected"  # prefix
    assert exit_code_reason("ruff-check", 1) == "Lint violations found"
    assert exit_code_reason("pytest", 99) is None
    assert exit_code_reason("unknown-tool", 1) is None
    assert exit_code_reason(None, 1) is None
    # status reasons: timeout wins; silent non-zero explains itself
    assert status_reason(None, 0, 0, "pytest", True) == "Command timed out"
    assert status_reason(5, 0, 0, "pytest", False) == "No tests collected"
    assert "Non-zero exit code (7)" in status_reason(7, 0, 0, "mystery", False)
    assert status_reason(1, 3, 0, "pytest", False) is None  # self-evident
    assert status_reason(0, 0, 0, "pytest", False) is None


def test_silent_failure_gets_synthetic_exit_event(spark, tmp_path):
    """A non-zero exit with no parsed diagnostics surfaces a synthetic
    info event explaining why (reference execution.py:599-601)."""
    st = LogStore(spark, str(tmp_path / "bird"))
    run = run_command(
        st, [sys.executable, "-c", "import sys; sys.exit(5)"],
        source_name="pytest-unit",
    )
    assert run["exit_code"] == 5
    evs = st.events().collect()
    assert len(evs) == 1
    ev = evs[0]
    assert ev["severity"] == "info" and ev["code"] == "exit_5"
    assert ev["message"] == "No tests collected"
    assert ev["fingerprint"]
    # a run WITH parsed errors gets no synthetic event
    run2 = run_command(
        st, [sys.executable, "-c",
             "import sys; print('src/a.c:1:1: error: boom'); sys.exit(1)"],
        source_name="gcc-build", fmt="gcc",
    )
    evs2 = st.events().filter(F.col("invocation_id") == run2["id"]).collect()
    assert len(evs2) == 1 and evs2[0]["severity"] == "error"
