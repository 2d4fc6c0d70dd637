"""Per-command execution locks.

The reference serializes concurrent runs of the same *command* with named
JSON lock files + PID liveness (src/blq/locks.py:34-180; used by
commands/execution.py:324-350 with --lock/--no-lock/--wait-lock). The
STORE itself needs no lock here — parquet appends are naturally
multi-writer (see sources/store.py) — but "don't run two `deploy`s at
once" is a workflow contract independent of storage, so it carries over.

Differences from the reference (deliberate):
- every MUTATION of a lock path (acquire, stale reclaim, release,
  cleanup) serializes on a per-name flock guard (_guard), so the
  check-then-act sequences are atomic against each other — no unlink
  can ever hit another holder's freshly linked live lock;
- the payload is hard-linked into place from a temp file, so a visible
  lock file always carries its full JSON (readers need no guard);
- release verifies the payload still matches the releasing holder's
  own lock before unlinking (a holder releasing after lease expiry
  must not destroy a reclaimed-and-regranted lock).

Multi-host semantics (round 6): lock files record the holder's
HOSTNAME. PID liveness is only meaningful on the holder's own host, so
stale detection is two-tier:
- same host (or a pre-round-6 lock file without a hostname): reclaim
  when the PID is dead — immediate, exact;
- different host: the lock is a LEASE — reclaim only once its
  acquired_at age exceeds REMOTE_LEASE_TTL_S (default 600 s; a remote
  run legitimately longer than the TTL should be serialized with
  --wait-lock rather than relying on reclaim-protection).

Shared-filesystem caveats (documented contract): hard links and
same-directory renames are atomic on local POSIX filesystems and on
NFSv3+, and Linux emulates flock over NFSv4 via POSIX locks; NFSv2 is
NOT supported. Clock skew between hosts shortens/extends remote leases
by the skew — keep REMOTE_LEASE_TTL_S an order of magnitude above
expected skew.
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
        return _parse_lock_text(_lock_path(locks_dir, name).read_text())
    except OSError:
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


def _guard(locks_dir: Path, name: str):
    """Per-lock-name mutation guard: an flock(LOCK_EX) on a sidecar
    file. EVERY mutation of the lock path (acquire's existence check +
    link, stale reclaim, release, cleanup) runs inside it, so the
    check-then-act sequences are atomic with respect to each other.
    Readers (read_lock) stay guard-free — the link protocol guarantees
    a visible lock file always carries its full payload.

    flock is per-open-file-description (it excludes threads of the same
    process, unlike fcntl/lockf's per-process records) and is emulated
    over NFSv4 by modern Linux, matching the module's NFS contract. A
    crashed holder's flock releases automatically with its fd, so the
    guard adds no liveness hazard.

    History: round 6 unlinked the shared path directly on reclaim — two
    contenders that both read the same stale lock could interleave so
    one removed the other's freshly linked LIVE lock (double grant; the
    6-contender lease-expiry stress test reproduces it). A first round-7
    fix serialized only RECLAIMERS, which still allowed an unguarded
    release/acquire to interleave with a reclaim's rename-and-restore
    (reviewer-found). Guarding every mutator closes the whole family.

    The sidecar is REMOVABLE (round 8, ADVICE r7: one permanent hidden
    file per lock name ever used — cleanup_stale_locks now unlinks
    guards whose lock is gone). Unlinking a file others may flock is
    only safe with identity re-verification: after acquiring the flock,
    re-stat the PATH and compare inodes with the held fd — a waiter
    that was queued on an inode the cleaner unlinked detects the swap
    and retries on the fresh file, so two holders can never coexist on
    different inodes of the same name."""
    import fcntl
    from contextlib import contextmanager

    @contextmanager
    def _held():
        locks_dir.mkdir(parents=True, exist_ok=True)
        gpath = locks_dir / f".{name}.guard"
        while True:
            with open(gpath, "a+") as fh:
                fcntl.flock(fh.fileno(), fcntl.LOCK_EX)
                try:
                    st = os.stat(gpath)
                except FileNotFoundError:
                    continue  # unlinked while we waited: retry fresh
                if st.st_ino != os.fstat(fh.fileno()).st_ino:
                    continue  # replaced while we waited: retry fresh
                yield
                return

    return _held()


def acquire_lock(
    locks_dir: str | Path,
    name: str,
    attempt_id: str,
    command: str,
    pid: int | None = None,
) -> CommandLock:
    """Atomically acquire `name`; reclaim if the holder is stale
    (same-host dead PID, or remote lease expired — _holder_alive).

    Acquisition is LINK-BASED under the per-name guard: the payload is
    written to a unique temp file first, then hard-linked to the lock
    path — a visible lock file therefore ALWAYS carries its full
    payload (the round-6 fix for the torn O_CREAT|O_EXCL window), and
    the guard makes the liveness check + stale unlink + link sequence
    atomic against concurrent acquirers, releasers, and cleaners.

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
        with _guard(locks_dir, name):
            existing = read_lock(locks_dir, name)
            if existing is not None and _holder_alive(existing):
                raise LockHeldError(existing)
            # stale (dead/lease-expired holder) or corrupt: safe to
            # unlink under the guard — no other mutator can interleave
            try:
                path.unlink()
            except FileNotFoundError:
                pass
            os.link(tmp, path)
            return lock
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


def release_lock(
    locks_dir: str | Path, name: str, lock: CommandLock | None = None
) -> None:
    """Release `name`. When the caller passes the CommandLock it
    acquired, the unlink happens only if the file still carries THAT
    payload — a holder releasing after its lease expired (and the lock
    was legitimately reclaimed and re-granted) must not destroy the new
    holder's lock. Without `lock`, the legacy unconditional unlink (the
    caller asserts ownership)."""
    locks_dir = Path(locks_dir)
    with _guard(locks_dir, name):
        if lock is not None:
            current = read_lock(locks_dir, name)
            if current is None or asdict(current) != asdict(lock):
                return  # not ours any more; leave the new holder alone
        try:
            _lock_path(locks_dir, name).unlink()
        except FileNotFoundError:
            pass


def cleanup_stale_locks(locks_dir: str | Path) -> list[str]:
    """Drop every lock whose holder PID is gone; returns reclaimed names.

    Also sweeps the `.{name}.guard` flock sidecars of locks that no
    longer exist (ADVICE r7: they accumulated forever, one per lock
    name ever used). The unlink happens while HOLDING that guard's
    exclusive flock; concurrent mutators re-verify the path inode after
    acquiring (see _guard), so a waiter queued on the unlinked inode
    retries on the fresh file instead of running unserialized."""
    locks_dir = Path(locks_dir)
    if not locks_dir.is_dir():
        return []
    cleaned = []
    for path in sorted(locks_dir.glob("*.lock")):
        name = path.stem
        with _guard(locks_dir, name):
            lock = read_lock(locks_dir, name)  # re-read under the guard
            if path.exists() and (lock is None or not _holder_alive(lock)):
                try:
                    path.unlink()
                    cleaned.append(name)
                except FileNotFoundError:
                    pass
    for gpath in sorted(locks_dir.glob(".*.guard")):
        name = gpath.name[1 : -len(".guard")]
        with _guard(locks_dir, name):
            if not _lock_path(locks_dir, name).exists():
                try:
                    gpath.unlink()
                except FileNotFoundError:
                    pass
    return cleaned
