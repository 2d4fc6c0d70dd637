"""Per-command execution locks.

The reference serializes concurrent runs of the same *command* with named
JSON lock files + PID liveness (src/blq/locks.py:34-180; used by
commands/execution.py:324-350 with --lock/--no-lock/--wait-lock). The
STORE itself needs no lock here — parquet appends are naturally
multi-writer (see sources/store.py) — but "don't run two `deploy`s at
once" is a workflow contract independent of storage, so it carries over.

Differences from the reference (deliberate):
- acquisition is ATOMIC (os.O_CREAT|O_EXCL) instead of exists()-then-
  write, so two simultaneous acquirers cannot both think they won;
- stale reclaim unlinks the dead holder's file and retries the atomic
  create, racing safely against other reclaimers.

Multi-host semantics (round 6): lock files record the holder's
HOSTNAME. PID liveness is only meaningful on the holder's own host, so
stale detection is two-tier:
- same host (or a pre-round-6 lock file without a hostname): reclaim
  when the PID is dead — immediate, exact;
- different host: the lock is a LEASE — reclaim only once its
  acquired_at age exceeds REMOTE_LEASE_TTL_S (default 600 s; a remote
  run legitimately longer than the TTL should be serialized with
  --wait-lock rather than relying on reclaim-protection).

Shared-filesystem caveats (documented contract): O_CREAT|O_EXCL and
same-directory os.replace() are atomic on local POSIX filesystems and
on NFSv3+; NFSv2 (no atomic exclusive create) is NOT supported. Clock
skew between hosts shortens/extends remote leases by the skew — keep
REMOTE_LEASE_TTL_S an order of magnitude above expected skew.
tests/test_multihost_store.py stress-tests two concurrent writer
PROCESSES against one store root (unique gapless serials) and the
remote-lease reclaim ladder.
"""

from __future__ import annotations

import json
import os
import socket
import time
from dataclasses import asdict, dataclass
from pathlib import Path

# remote holders are leases: reclaimable only after this many seconds
REMOTE_LEASE_TTL_S = 600.0


@dataclass
class CommandLock:
    lock_name: str
    pid: int
    attempt_id: str
    command: str
    acquired_at: float
    hostname: str = ""  # "" = pre-round-6 lock file (treated as local)


class LockHeldError(RuntimeError):
    def __init__(self, held_by: CommandLock) -> None:
        self.held_by = held_by
        age = time.time() - held_by.acquired_at
        super().__init__(
            f"lock '{held_by.lock_name}' held by PID {held_by.pid} "
            f"(command={held_by.command!r}, age={age:.1f}s)"
        )


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def _lock_path(locks_dir: str | Path, name: str) -> Path:
    return Path(locks_dir) / f"{name}.lock"


def read_lock(locks_dir: str | Path, name: str) -> CommandLock | None:
    """Peek at a lock without acquiring. None if absent/corrupt."""
    try:
        data = json.loads(_lock_path(locks_dir, name).read_text())
        kwargs = {
            k: data[k]
            for k in CommandLock.__dataclass_fields__
            if k in data
        }
        return CommandLock(**kwargs)
    except (OSError, ValueError, KeyError, TypeError):
        return None


def _holder_alive(lock: CommandLock) -> bool:
    """Same-host holders: exact PID liveness. Remote holders: lease —
    alive until REMOTE_LEASE_TTL_S after acquisition (PID numbers mean
    nothing across hosts on a shared filesystem)."""
    if lock.hostname in ("", socket.gethostname()):
        return _pid_alive(lock.pid)
    return (time.time() - lock.acquired_at) < REMOTE_LEASE_TTL_S


def _parse_lock_text(text: str) -> CommandLock | None:
    try:
        data = json.loads(text)
        kwargs = {
            k: data[k]
            for k in CommandLock.__dataclass_fields__
            if k in data
        }
        return CommandLock(**kwargs)
    except (ValueError, KeyError, TypeError):
        return None


def _reclaim_stale(locks_dir: Path, name: str, observed: CommandLock | None) -> bool:
    """Reclaim the lock file at `name` that was OBSERVED stale, without
    ever unlinking the shared lock path blind.

    Two layers make this race-free:

    1. Reclaimers (only reclaimers — the acquire fast path stays a
       single lock-free os.link) serialize per lock name on an flock()
       sidecar file, so at most ONE reclaimer mutates the path at a
       time. flock is per-open-file-description (excludes threads of
       the same process too) and is emulated over NFSv4 by modern
       Linux — matching the module's NFS contract.
    2. Inside the critical section the lock file is RE-READ: if it is
       now a live holder (a contender linked a fresh lock between our
       caller's read and our turn in the queue), we raise LockHeldError
       without touching it. Only a still-stale file is removed, via
       atomic rename-to-grave + payload verification (belt and braces:
       if the payload under the rename is a live holder after all —
       possible only if an expired holder released and a fresh holder
       linked within the read→rename window, behavior the lease
       contract already excludes — it is restored).

    The round-6 protocol unlinked the shared path directly; two
    contenders that both read the same stale lock could interleave so
    that B's unlink removed A's freshly linked LIVE lock — a double
    grant (caught by tests/test_multihost_store.py::
    test_no_double_grant_at_lease_expiry).

    Returns True when the stale file is gone and the caller may retry
    its link; False when the path was already gone. Raises
    LockHeldError when a live holder turned up instead."""
    import fcntl
    import uuid as _uuid

    path = _lock_path(locks_dir, name)
    sidecar = locks_dir / f".{name}.reclaim"
    with open(sidecar, "a+") as guard:
        fcntl.flock(guard.fileno(), fcntl.LOCK_EX)
        # re-verify under the guard: the world may have moved on while
        # we queued behind another reclaimer
        current = read_lock(locks_dir, name)
        if current is None and not path.exists():
            return False  # another reclaimer won; re-race the link
        if current is not None and _holder_alive(current):
            raise LockHeldError(current)
        grave = locks_dir / f".{name}.{_uuid.uuid4().hex}.stale"
        try:
            os.rename(path, grave)
        except FileNotFoundError:
            return False
        try:
            buried = _parse_lock_text(grave.read_text())
        except OSError:
            buried = None
        if buried is not None and _holder_alive(buried):
            # read→rename interleaving with a release+relink: restore.
            # Under the guard no other reclaimer runs, and a fresh
            # linker cannot have claimed the path (it was occupied
            # until our rename an instant ago), so the link holds.
            try:
                os.link(grave, path)
            except FileExistsError:
                pass
            try:
                grave.unlink()
            except FileNotFoundError:
                pass
            raise LockHeldError(buried)
        try:
            grave.unlink()
        except FileNotFoundError:
            pass
        return True


def acquire_lock(
    locks_dir: str | Path,
    name: str,
    attempt_id: str,
    command: str,
    pid: int | None = None,
) -> CommandLock:
    """Atomically acquire `name`; reclaim if the holder is stale
    (same-host dead PID, or remote lease expired — _holder_alive).

    Acquisition is LINK-BASED: the payload is written to a unique temp
    file first, then hard-linked to the lock path — the link is the
    atomic claim, and a visible lock file therefore ALWAYS carries its
    full payload. (The previous O_CREAT|O_EXCL + write-after protocol
    had a torn window: a contender reading the not-yet-written file saw
    it as corrupt and reclaimed a LIVE lock — the two-process serial
    stress test caught two writers both claiming serial 1. link() is
    also atomic on NFSv3+, matching the module's multi-host contract.)

    Raises LockHeldError when a live process holds it."""
    import uuid as _uuid

    locks_dir = Path(locks_dir)
    locks_dir.mkdir(parents=True, exist_ok=True)
    path = _lock_path(locks_dir, name)
    lock = CommandLock(
        name, pid or os.getpid(), attempt_id, command, time.time(),
        hostname=socket.gethostname(),
    )
    payload = json.dumps(asdict(lock))
    tmp = locks_dir / f".{name}.{_uuid.uuid4().hex}.tmp"
    tmp.write_text(payload)
    try:
        for _ in range(8):  # bounded reclaim retries under contention
            try:
                os.link(tmp, path)
                return lock
            except FileExistsError:
                existing = read_lock(locks_dir, name)
                if existing is not None and _holder_alive(existing):
                    raise LockHeldError(existing)
                # genuinely stale (dead/lease-expired holder) or a
                # corrupt file from a pre-link-protocol crash: reclaim
                # via atomic rename-to-grave (never unlink the shared
                # path — see _reclaim_stale) and re-race the link
                _reclaim_stale(locks_dir, name, existing)
        raise LockHeldError(read_lock(locks_dir, name) or lock)
    finally:
        try:
            tmp.unlink()
        except FileNotFoundError:
            pass


def acquire_lock_wait(
    locks_dir: str | Path,
    name: str,
    attempt_id: str,
    command: str,
    timeout: float,
    poll: float = 0.2,
) -> CommandLock:
    """--wait-lock semantics (reference execution.py:329-347): retry until
    `timeout` seconds, then propagate LockHeldError."""
    deadline = time.time() + timeout
    while True:
        try:
            return acquire_lock(locks_dir, name, attempt_id, command)
        except LockHeldError:
            if time.time() >= deadline:
                raise
            time.sleep(min(poll, max(deadline - time.time(), 0.01)))


def release_lock(locks_dir: str | Path, name: str) -> None:
    try:
        _lock_path(locks_dir, name).unlink()
    except FileNotFoundError:
        pass


def cleanup_stale_locks(locks_dir: str | Path) -> list[str]:
    """Drop every lock whose holder PID is gone; returns reclaimed names."""
    locks_dir = Path(locks_dir)
    if not locks_dir.is_dir():
        return []
    cleaned = []
    for path in sorted(locks_dir.glob("*.lock")):
        lock = read_lock(locks_dir, path.stem)
        if lock is None or not _holder_alive(lock):
            try:
                if _reclaim_stale(locks_dir, path.stem, lock):
                    cleaned.append(path.stem)
            except LockHeldError:
                pass  # a fresh live lock raced in; leave it alone
    return cleaned
