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
