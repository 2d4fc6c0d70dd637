"""Watch mode (ST3): file-change -> debounce -> re-run command.

Reference: src/blq/commands/watch_cmd.py:95-165 (DebounceHandler) and
:168-302 (WatchController) — FS events, a 500 ms debounce timer,
include/exclude patterns, and an idle/running/queued state machine so a
change landing mid-run queues exactly one follow-up run.

This port polls mtimes instead of using OS file events (no watchdog
dependency in the container); the debounce + queue-next semantics are
identical. Pure driver-side orchestration — the data plane is
execution.run_command's parse/append path.
"""

from __future__ import annotations

import fnmatch
import os
import time
from typing import Callable


def scan_mtimes(
    root: str,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
) -> dict[str, float]:
    """Snapshot path->mtime for files under root matching the patterns."""
    include = include or ["*"]
    exclude = exclude or []
    out: dict[str, float] = {}
    for dirpath, dirnames, filenames in os.walk(root):
        # never descend into VCS/store internals
        dirnames[:] = [d for d in dirnames if d not in {".git", ".bird", ".bird-spark"}]
        for fn in filenames:
            rel = os.path.relpath(os.path.join(dirpath, fn), root)
            if not any(fnmatch.fnmatch(rel, p) or fnmatch.fnmatch(fn, p) for p in include):
                continue
            if any(fnmatch.fnmatch(rel, p) or fnmatch.fnmatch(fn, p) for p in exclude):
                continue
            try:
                out[rel] = os.stat(os.path.join(dirpath, fn)).st_mtime
            except OSError:
                continue
    return out


class WatchController:
    """idle/running/queued state machine with debounce (reference
    watch_cmd.py:168-302). `poll()` is called by the loop; injection of
    `runner` and `clock` keeps it unit-testable without sleeping."""

    def __init__(
        self,
        root: str,
        runner: Callable[[], object],
        include: list[str] | None = None,
        exclude: list[str] | None = None,
        debounce_s: float = 0.5,
        clock: Callable[[], float] = time.monotonic,
    ) -> None:
        self.root = root
        self.runner = runner
        self.include = include
        self.exclude = exclude
        self.debounce_s = debounce_s
        self.clock = clock
        self.state = "idle"
        self.runs = 0
        self._snapshot = scan_mtimes(root, include, exclude)
        self._pending_since: float | None = None

    def _changed(self) -> bool:
        now_snap = scan_mtimes(self.root, self.include, self.exclude)
        changed = now_snap != self._snapshot
        self._snapshot = now_snap
        return changed

    def poll(self) -> bool:
        """One tick: detect changes, debounce, fire the runner. Returns
        True if a run was executed this tick."""
        if self._changed() and self.state != "queued":
            self._pending_since = self.clock()
        fire = False
        if self.state == "queued":
            fire = True
        elif self._pending_since is not None:
            if self.clock() - self._pending_since >= self.debounce_s:
                fire = True
        if fire:
            self._pending_since = None
            self.state = "running"
            try:
                self.runner()
                self.runs += 1
            finally:
                # changes that landed while the command ran queue exactly
                # one follow-up (no debounce — they already waited)
                self.state = "queued" if self._changed() else "idle"
            return True
        return False

    def loop(self, interval_s: float = 0.5, max_runs: int | None = None) -> None:
        while max_runs is None or self.runs < max_runs:
            self.poll()
            time.sleep(interval_s)
