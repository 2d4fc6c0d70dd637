"""Deterministic blq-native fixtures (FIXTURES.md family A): runs with
overlapping fingerprint sets across consecutive runs (diff/regression
tests), attempts with pending/orphaned/completed mix, outputs with
duplicate content."""

from __future__ import annotations

import datetime as dt
import random

BASE_TS = dt.datetime(2026, 3, 1, 12, 0, 0)

TOOLS = [("gcc", "compile"), ("pytest", "test"), ("mypy", "typecheck"), ("eslint", "lint")]
SOURCES = ["build", "test", "lint", "typecheck"]
FILES = [f"src/mod_{i}.py" for i in range(12)] + [None]


def make_runs_and_events(n_runs: int = 8, seed: int = 7):
    rng = random.Random(seed)
    runs, events = [], []
    # fingerprint pool; each run draws an overlapping subset -> new/fixed/
    # unchanged sets between consecutive runs, incl. a reappearing one
    fp_pool = [f"fp_{i:03d}" for i in range(30)]
    for serial in range(1, n_runs + 1):
        ts = BASE_TS + dt.timedelta(hours=serial)
        run_id = f"run-{serial:04d}"
        tool, category = TOOLS[serial % len(TOOLS)]
        runs.append(
            {
                "id": run_id,
                "run_serial": serial,
                "session_id": "sess-1",
                "timestamp": ts,
                "duration_ms": None if serial % 5 == 0 else 1000 * serial,
                "cwd": "/w",
                "cmd": f"make target{serial}",
                "executable": "make",
                "pid": 100 + serial,
                "exit_code": 0 if serial % 3 == 0 else 1,
                "client_id": "blq-shell",
                "hostname": "host-a" if serial % 2 else "host-b",
                "username": "dev",
                "tag": None if serial % 4 == 0 else f"tag{serial % 3}",
                "source_name": SOURCES[serial % len(SOURCES)],
                "source_type": "run",
                "environment": {"PATH": "/bin"},
                "platform": "linux",
                "arch": "x86_64",
                "git_commit": f"{'ab' * 20}"[:40],
                "git_branch": "main" if serial % 2 else "feature-x",
                "git_dirty": serial % 2 == 0,
                "ci": None,
                "extension_data": '{"sandbox": {"network": "%s", "filesystem": "rw"}}'
                % ("on" if serial % 2 else "off"),
                "date": ts.date(),
            }
        )
        # overlapping fingerprints: window over the pool + jitter;
        # fp_000 appears in runs 1-2 and again in 6+ (reappearance gap)
        picks = fp_pool[serial : serial + 6]
        if serial <= 2 or serial >= 6:
            picks.append("fp_000")
        n_ev = len(picks)
        for idx, fp in enumerate(picks, start=1):
            sev = "error" if idx % 3 else "warning"
            events.append(
                {
                    "id": f"ev-{serial:04d}-{idx:03d}",
                    "invocation_id": run_id,
                    "event_index": idx,
                    "client_id": "blq-shell",
                    "hostname": "host-a",
                    "event_type": "diagnostic" if idx % 4 else "test_result",
                    "severity": sev,
                    "ref_file": rng.choice(FILES),
                    "ref_line": rng.choice([None, rng.randint(1, 2000)]),
                    "ref_column": rng.choice([None, 0, rng.randint(1, 120)]),
                    "message": f"{'x' * 250}" if idx == 1 else f"issue {fp} in run {serial}",
                    "code": rng.choice([None, "E0308", "W0611"]),
                    "rule": rng.choice([None, "no-unused-vars"]),
                    "tool_name": tool,
                    "category": category,
                    "test_name": f"test_{idx}" if idx % 4 == 0 else None,
                    "fingerprint": fp,
                    "log_line_start": idx * 3,
                    "log_line_end": idx * 3 + 1,
                    "context": None,
                    "metadata": '{"k": %d}' % idx if idx % 2 else None,
                    "format_used": tool,
                    "date": ts.date(),
                }
            )
    return runs, events


def make_attempts_and_outcomes():
    """pending (no outcome), orphaned (NULL exit), completed — plus an
    old pending one for the orphan sweep."""
    t0 = BASE_TS
    attempts = [
        {"id": "att-1", "started_at": t0, "cmd": "make a", "source_name": "build",
         "source_type": "run", "hostname": "h", "date": t0.date()},
        {"id": "att-2", "started_at": t0 + dt.timedelta(minutes=1), "cmd": "make b",
         "source_name": "test", "source_type": "run", "hostname": "h", "date": t0.date()},
        {"id": "att-3", "started_at": t0 + dt.timedelta(minutes=2), "cmd": "make c",
         "source_name": "lint", "source_type": "run", "hostname": "h", "date": t0.date()},
        {"id": "att-4", "started_at": t0 + dt.timedelta(minutes=3), "cmd": "make d",
         "source_name": "build", "source_type": "run", "hostname": "h", "date": t0.date()},
    ]
    outcomes = [
        {"attempt_id": "att-1", "completed_at": t0 + dt.timedelta(seconds=30),
         "duration_ms": 30000, "exit_code": 0, "signal": None, "timeout": False,
         "date": t0.date()},
        {"attempt_id": "att-2", "completed_at": t0 + dt.timedelta(minutes=2),
         "duration_ms": None, "exit_code": None, "signal": None, "timeout": False,
         "date": t0.date()},
        # att-3, att-4: pending (no outcome rows)
    ]
    return attempts, outcomes
