"""Multi-host store semantics: two concurrent writer PROCESSES share
one store root (unique gapless serial reservation through the O_EXCL
write lock + durable counter), and remote-host locks behave as leases
(never reclaimed by PID liveness from another host, reclaimed after
REMOTE_LEASE_TTL_S)."""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

import pytest

from blq_cli_spark.sources import locks as locks_mod
from blq_cli_spark.sources.store import reserve_serials_standalone

_WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
from blq_cli_spark.sources.store import reserve_serials_standalone
root, n = sys.argv[1], int(sys.argv[2])
out = [reserve_serials_standalone(root, 1) for _ in range(n)]
print(",".join(map(str, out)))
"""


def test_two_process_serial_stress(tmp_path):
    """Two real OS processes hammer the same counter: the union of
    reserved serials must be exactly 1..2N — no duplicates, no gaps —
    which is the cross-host ingest correctness contract (each process
    stands in for a writer host on a shared filesystem)."""
    root = str(tmp_path / "store")
    os.makedirs(root)
    with open(os.path.join(root, "run_serial"), "w") as fh:
        fh.write("0")
    n = 60
    script = _WORKER.format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, root, str(n)],
            stdout=subprocess.PIPE, text=True,
        )
        for _ in range(2)
    ]
    serials: list[int] = []
    for p in procs:
        out, _ = p.communicate(timeout=120)
        assert p.returncode == 0
        serials.extend(int(s) for s in out.strip().split(","))
    assert sorted(serials) == list(range(1, 2 * n + 1))
    # counter file holds the high-water mark
    with open(os.path.join(root, "run_serial")) as fh:
        assert int(fh.read()) == 2 * n


def _write_lock_file(locks_dir, name, *, hostname, pid, age_s):
    os.makedirs(locks_dir, exist_ok=True)
    payload = {
        "lock_name": name,
        "pid": pid,
        "attempt_id": "a1",
        "command": "remote build",
        "acquired_at": time.time() - age_s,
        "hostname": hostname,
    }
    with open(os.path.join(locks_dir, f"{name}.lock"), "w") as fh:
        json.dump(payload, fh)


def test_remote_lock_is_a_lease(tmp_path, monkeypatch):
    locks_dir = str(tmp_path / "locks")
    dead_pid = 2 ** 22 + 12345  # beyond default pid_max: dead locally

    # a FRESH lock from another host must hold even though its PID does
    # not exist on this host (PID liveness is meaningless cross-host)
    _write_lock_file(locks_dir, "deploy", hostname="other-host",
                     pid=dead_pid, age_s=5)
    with pytest.raises(locks_mod.LockHeldError):
        locks_mod.acquire_lock(locks_dir, "deploy", "a2", "local try")

    # ...until its lease expires
    _write_lock_file(locks_dir, "deploy", hostname="other-host",
                     pid=dead_pid, age_s=locks_mod.REMOTE_LEASE_TTL_S + 1)
    got = locks_mod.acquire_lock(locks_dir, "deploy", "a3", "local try")
    assert got.hostname == socket.gethostname()
    locks_mod.release_lock(locks_dir, "deploy")

    # same-host dead PID: immediate reclaim (exact, no lease wait)
    _write_lock_file(locks_dir, "build", hostname=socket.gethostname(),
                     pid=dead_pid, age_s=1)
    got = locks_mod.acquire_lock(locks_dir, "build", "a4", "local try")
    assert got.attempt_id == "a4"
    locks_mod.release_lock(locks_dir, "build")

    # pre-round-6 lock file (no hostname key): treated as local
    path = os.path.join(locks_dir, "old.lock")
    with open(path, "w") as fh:
        json.dump({"lock_name": "old", "pid": dead_pid, "attempt_id": "a5",
                   "command": "legacy", "acquired_at": time.time()}, fh)
    got = locks_mod.acquire_lock(locks_dir, "old", "a6", "local try")
    assert got.attempt_id == "a6"


def test_cleanup_stale_respects_remote_leases(tmp_path):
    locks_dir = str(tmp_path / "locks")
    dead_pid = 2 ** 22 + 54321
    _write_lock_file(locks_dir, "fresh-remote", hostname="other-host",
                     pid=dead_pid, age_s=5)
    _write_lock_file(locks_dir, "stale-remote", hostname="other-host",
                     pid=dead_pid, age_s=locks_mod.REMOTE_LEASE_TTL_S + 1)
    _write_lock_file(locks_dir, "dead-local", hostname=socket.gethostname(),
                     pid=dead_pid, age_s=5)
    cleaned = locks_mod.cleanup_stale_locks(locks_dir)
    assert sorted(cleaned) == ["dead-local", "stale-remote"]


def test_standalone_reserve_matches_store_counter(tmp_path):
    root = str(tmp_path / "store")
    os.makedirs(root)
    with open(os.path.join(root, "run_serial"), "w") as fh:
        fh.write("41")
    assert reserve_serials_standalone(root, 1) == 42
    assert reserve_serials_standalone(root, 3) == 43  # 43..45 reserved
    assert reserve_serials_standalone(root, 1) == 46

def test_standalone_reserve_requires_counter_file(tmp_path):
    """A pre-counter store may already hold runs; seeding from 0 would
    silently re-issue serial 1. The standalone path must refuse instead
    (the Spark path seeds from max(run_serial) and is the safe first
    writer)."""
    root = str(tmp_path / "store")
    os.makedirs(root)
    with pytest.raises(FileNotFoundError, match="counter file absent"):
        reserve_serials_standalone(root, 1)
    # and it must not have created/initialized the counter as a side effect
    assert not os.path.exists(os.path.join(root, "run_serial"))


def test_release_is_payload_verified(tmp_path):
    """A holder releasing AFTER its lock was legitimately reclaimed and
    re-granted must not destroy the new holder's lock: release_lock
    verifies the file still carries the releasing holder's own payload
    (the round-7 reviewer-found race; the old release unlinked blind)."""
    locks_dir = tmp_path / "locks"
    # an expired remote holder's lock...
    _write_lock_file(str(locks_dir), "job", hostname="other-host",
                     pid=2 ** 22 + 11111,
                     age_s=locks_mod.REMOTE_LEASE_TTL_S + 1)
    expired = locks_mod.read_lock(locks_dir, "job")
    # ...is reclaimed and re-granted to a fresh local holder
    fresh = locks_mod.acquire_lock(locks_dir, "job", "a-new", "regrant")
    # the overdue original holder now releases with ITS payload: no-op
    locks_mod.release_lock(locks_dir, "job", expired)
    survivor = locks_mod.read_lock(locks_dir, "job")
    assert survivor is not None and survivor.attempt_id == "a-new"
    # the actual holder's verified release does remove it
    locks_mod.release_lock(locks_dir, "job", fresh)
    assert locks_mod.read_lock(locks_dir, "job") is None
    # legacy unverified release stays available (caller asserts ownership)
    locks_mod.acquire_lock(locks_dir, "job", "a2", "x")
    locks_mod.release_lock(locks_dir, "job")
    assert locks_mod.read_lock(locks_dir, "job") is None


def test_acquire_reclaims_stale_under_guard(tmp_path):
    """Stale locks (expired remote lease / corrupt payload) are
    reclaimed inside the per-name mutation guard during acquire."""
    locks_dir = tmp_path / "locks"
    _write_lock_file(str(locks_dir), "job", hostname="other-host",
                     pid=2 ** 22 + 22222,
                     age_s=locks_mod.REMOTE_LEASE_TTL_S + 1)
    got = locks_mod.acquire_lock(locks_dir, "job", "a1", "reclaim")
    assert got.attempt_id == "a1"
    locks_mod.release_lock(locks_dir, "job", got)
    # corrupt lock file: also reclaimed
    (locks_dir / "bad.lock").write_text("{not json")
    got = locks_mod.acquire_lock(locks_dir, "bad", "a2", "reclaim")
    assert got.attempt_id == "a2"


def test_no_double_grant_at_lease_expiry(tmp_path):
    """Ask r7-8: a remote holder's lease expires and SIX local
    contenders race through the reclaim window simultaneously, many
    rounds. Exactly one may win each round. Under the round-6 unlink
    protocol two contenders could both reclaim (B's unlink removing A's
    freshly linked live lock) — the rename-to-grave protocol makes the
    arbiter atomic."""
    import threading

    locks_dir = str(tmp_path / "locks")
    dead_pid = 2 ** 22 + 33333
    rounds, contenders = 25, 6
    for rnd in range(rounds):
        _write_lock_file(locks_dir, "deploy", hostname="other-host",
                         pid=dead_pid,
                         age_s=locks_mod.REMOTE_LEASE_TTL_S + 1)
        winners: list[str] = []
        errs: list[BaseException] = []
        barrier = threading.Barrier(contenders)

        def contend(tag: str) -> None:
            barrier.wait()
            try:
                got = locks_mod.acquire_lock(
                    locks_dir, "deploy", tag, "expiry race")
                winners.append(got.attempt_id)
            except locks_mod.LockHeldError:
                pass
            except BaseException as exc:  # pragma: no cover - diagnostics
                errs.append(exc)

        threads = [
            threading.Thread(target=contend, args=(f"r{rnd}c{i}",))
            for i in range(contenders)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert not errs, errs
        assert len(winners) == 1, f"round {rnd}: double grant {winners}"
        held = locks_mod.read_lock(locks_dir, "deploy")
        assert held is not None and held.attempt_id == winners[0]
        locks_mod.release_lock(locks_dir, "deploy")


def test_two_process_serial_stress_across_expiry(tmp_path):
    """The two-process gapless-serial stress, but the write lock starts
    as an EXPIRED remote lease so the very first grants must travel the
    reclaim path — serials stay unique and gapless across the boundary."""
    root = str(tmp_path / "store")
    os.makedirs(os.path.join(root, "locks"))
    with open(os.path.join(root, "run_serial"), "w") as fh:
        fh.write("0")
    _write_lock_file(
        os.path.join(root, "locks"), "store-write", hostname="other-host",
        pid=2 ** 22 + 44444, age_s=locks_mod.REMOTE_LEASE_TTL_S + 1)
    n = 40
    script = _WORKER.format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, root, str(n)],
            stdout=subprocess.PIPE, text=True,
        )
        for _ in range(2)
    ]
    serials: list[int] = []
    for p in procs:
        out, _ = p.communicate(timeout=120)
        assert p.returncode == 0
        serials.extend(int(s) for s in out.strip().split(","))
    assert sorted(serials) == list(range(1, 2 * n + 1))


def test_cleanup_sweeps_orphan_guard_files(tmp_path):
    """ADVICE r8: the per-name flock sidecars used to accumulate
    forever (one hidden file per lock name ever used). cleanup removes
    guards whose lock is gone and keeps those of live locks."""
    locks_dir = tmp_path / "locks"
    a = locks_mod.acquire_lock(locks_dir, "done", "a1", "c")
    locks_mod.release_lock(locks_dir, "done", a)
    live = locks_mod.acquire_lock(locks_dir, "live", "a2", "c")
    assert (locks_dir / ".done.guard").exists()
    assert (locks_dir / ".live.guard").exists()
    locks_mod.cleanup_stale_locks(locks_dir)
    assert not (locks_dir / ".done.guard").exists()
    assert (locks_dir / ".live.guard").exists()  # lock still held
    assert locks_mod.read_lock(locks_dir, "live").attempt_id == "a2"
    locks_mod.release_lock(locks_dir, "live", live)
    locks_mod.cleanup_stale_locks(locks_dir)
    assert list(locks_dir.glob(".*.guard")) == []


def test_guard_unlink_race_with_contenders(tmp_path):
    """A cleaner sweeping guard files CONCURRENTLY with contenders must
    never allow two holders: a waiter queued on an inode the cleaner
    unlinked re-verifies identity after acquiring and retries on the
    fresh file (the _guard inode check). Serial correctness is asserted
    via a counter file mutated inside the lock."""
    import threading

    locks_dir = tmp_path / "locks"
    counter = tmp_path / "counter.txt"
    counter.write_text("0")
    stop = threading.Event()
    errs: list[BaseException] = []

    def cleaner() -> None:
        while not stop.is_set():
            try:
                locks_mod.cleanup_stale_locks(locks_dir)
            except BaseException as exc:  # pragma: no cover
                errs.append(exc)

    def worker(tag: str) -> None:
        for i in range(40):
            try:
                got = locks_mod.acquire_lock_wait(
                    locks_dir, "ctr", f"{tag}-{i}", "inc", timeout=30
                )
                n = int(counter.read_text())
                counter.write_text(str(n + 1))
                locks_mod.release_lock(locks_dir, "ctr", got)
            except BaseException as exc:  # pragma: no cover
                errs.append(exc)
                return

    threads = [threading.Thread(target=cleaner)] + [
        threading.Thread(target=worker, args=(f"w{i}",)) for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads[1:]:
        t.join(timeout=120)
    stop.set()
    threads[0].join(timeout=30)
    assert not errs, errs
    assert int(counter.read_text()) == 4 * 40
