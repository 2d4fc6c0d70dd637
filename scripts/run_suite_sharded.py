#!/usr/bin/env python
"""Run the test suite sharded by FILE across N pytest processes.

The canonical gate stays the serial `python -m pytest tests/ -q` (one
session, the ordering the driver/judge measures). This is the
developer loop: the suite is embarrassingly parallel at file
granularity (every module builds its fixtures from the static sf
parquet or tmp dirs; the only shared global is the per-process Spark
session, and each shard gets its own), so N=4 shards on 32 CPUs cut
the ~35-minute wall to roughly a quarter at identical coverage.
pytest-xdist is not in the container; this is the same shard-by-file
pattern the fuzz_deep campaign uses.

Usage: python scripts/run_suite_sharded.py [N_SHARDS] [extra pytest args]
Exit code is non-zero if any shard fails; per-shard tails are printed.

Shards are balanced by measured file cost (a coarse built-in table of
the known heavy files; unlisted files count 40 —
the measured average of the small modules), not file count, so one
shard doesn't end up with all the Spark-heavy modules.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# coarse relative costs (seconds, from a serial --durations run); the
# balancer only needs ordering, not precision
COSTS = {
    "test_ann_index.py": 113, "test_gate_parity.py": 300,
    "test_streaming.py": 120, "test_streaming_curation.py": 60,
    "test_logparse_fast.py": 150, "test_logparse_auto.py": 120,
    "test_logparse_fuzz.py": 90, "test_dedup.py": 110,
    "test_similarity.py": 120, "test_store_oracle.py": 90,
    "test_multihost_store.py": 80, "test_plan_quality.py": 90,
    "test_corpus.py": 90, "test_quality.py": 70, "test_tokenizer.py": 50,
    "test_multimodal.py": 60, "test_cli_lifecycle.py": 60,
    "test_serve.py": 60, "test_watch.py": 45, "test_property.py": 45,
}


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 4
    extra = sys.argv[2:] if len(sys.argv) > 1 and sys.argv[1].isdigit() else sys.argv[1:]
    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    # greedy longest-processing-time assignment
    shards: list[list[str]] = [[] for _ in range(n)]
    loads = [0.0] * n
    for f in sorted(files, key=lambda f: -COSTS.get(os.path.basename(f), 40)):
        i = loads.index(min(loads))
        shards[i].append(f)
        loads[i] += COSTS.get(os.path.basename(f), 40)

    cpus = max(2, (os.cpu_count() or 8) // n)
    procs = []
    logs = []
    t0 = time.time()
    for i, shard in enumerate(shards):
        if not shard:
            continue
        log = tempfile.NamedTemporaryFile(
            mode="w", prefix=f"suite_shard{i}_", suffix=".log", delete=False
        )
        logs.append(log.name)
        env = dict(
            os.environ,
            BLQ_TEST_MASTER=f"local[{cpus}]",
            BLQ_TEST_SHUFFLE=os.environ.get("BLQ_TEST_SHUFFLE", "4"),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "pytest", "-q", *extra, *shard],
                cwd=REPO, stdout=log, stderr=subprocess.STDOUT, env=env,
            )
        )
        print(f"shard {i}: {len(shard)} files (est {loads[i]:.0f}s) -> {log.name}")
    rcs = [p.wait() for p in procs]
    wall = time.time() - t0
    ok = True
    for i, (rc, log) in enumerate(zip(rcs, logs)):
        with open(log) as fh:
            tail = fh.read().strip().splitlines()
        summary = tail[-1] if tail else "(empty)"
        print(f"shard {i}: exit {rc} — {summary}")
        # rc 5 = no tests collected (an all-deselected shard) is fine
        if rc not in (0, 5):
            ok = False
            print("\n".join(tail[-15:]))
    print(f"total wall: {wall:.0f}s across {len(procs)} shards")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
