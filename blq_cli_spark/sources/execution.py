"""Process execution + ingest: the `blq run` write path (S9).

Reference flow (src/blq/commands/execution.py:232-650 + storage write path
storage.py:397-495): write an attempt start-record, spawn the subprocess
with output teed to `live/{attempt_id}/combined.log` (so in-flight runs
are queryable via the live-tail readers in streaming/live.py), then on
exit write the outcome, parse the captured output into events, and append
the completed run + events + content-addressed output blob.

All of this is driver-side orchestration by design — it mirrors the
reference exactly and the data plane (parse -> append -> query) is the
distributed part. On a cluster the run executes wherever the CLI runs;
only the parquet appends land on shared storage.
"""

from __future__ import annotations

import datetime as dt
import getpass
import json
import os
import platform as _platform
import shutil
import socket
import subprocess
import uuid

from blq_cli_spark import ext as ext_mod
from blq_cli_spark.sources import logparse
from blq_cli_spark.sources.store import LogStore


class LocalExecutor:
    """Default pluggable executor (reference src/blq/ext/local_executor.py:22):
    subprocess lifecycle — spawn with output teed to
    `spec.live_dir/combined.log` (live-tail readers poll it), timeout
    kill, child-rusage metrics. Terminal stage of the
    prepare -> execute -> collect pipeline (ext.Executor protocol);
    registered under the name 'local' at import."""

    name = "local"

    def execute(self, spec: ext_mod.CommandSpec) -> ext_mod.ExecutionResult:
        started = dt.datetime.now()
        os.makedirs(spec.live_dir, exist_ok=True)
        live_log = os.path.join(spec.live_dir, "combined.log")
        timed_out = False
        ru_before = _child_rusage()
        with open(live_log, "wb") as sink:
            proc = subprocess.Popen(
                spec.argv,
                cwd=spec.cwd,
                stdout=sink,
                stderr=subprocess.STDOUT,
                preexec_fn=spec.preexec,
                env=spec.env,
            )
            pid = proc.pid
            try:
                exit_code = proc.wait(timeout=spec.timeout)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
                exit_code, timed_out = None, True
        metrics = _rusage_metrics(ru_before)
        completed = dt.datetime.now()
        with open(live_log, "rb") as fh:
            output = fh.read().decode("utf-8", errors="replace")
        return ext_mod.ExecutionResult(
            exit_code=exit_code,
            output=output,
            started_at=started,
            completed_at=completed,
            duration_ms=int((completed - started).total_seconds() * 1000),
            timeout=timed_out,
            pid=pid,
            metrics=metrics or {},
        )


ext_mod.register_executor(LocalExecutor())


def _child_rusage():
    """Snapshot of cumulative waited-children rusage (None where the
    resource module is unavailable, e.g. non-POSIX)."""
    try:
        import resource

        return resource.getrusage(resource.RUSAGE_CHILDREN)
    except Exception:
        return None


def _rusage_metrics(before) -> dict | None:
    """Child resource metrics in the extension_data layout sandbox
    suggest/tighten/profile aggregate ($.metrics.memory_peak_bytes /
    cpu_usage_usec — reference records the same keys from its sandbox
    runner). CPU is the delta over the run's children; memory peak is
    ru_maxrss (kilobytes on Linux) of the largest waited child — an
    upper bound if this process ran bigger children earlier."""
    after = _child_rusage()
    if before is None or after is None:
        return None
    cpu_usec = int(
        ((after.ru_utime + after.ru_stime) - (before.ru_utime + before.ru_stime))
        * 1_000_000
    )
    return {
        "memory_peak_bytes": int(after.ru_maxrss) * 1024,
        "cpu_usage_usec": max(cpu_usec, 0),
    }


def _git_context(cwd: str) -> dict:
    """Best-effort git commit/branch/dirty (reference collects the same
    trio for every invocation)."""
    def _run(args: list[str]) -> str | None:
        try:
            out = subprocess.run(
                ["git", *args], cwd=cwd, capture_output=True, text=True, timeout=5
            )
            return out.stdout.strip() if out.returncode == 0 else None
        except (OSError, subprocess.TimeoutExpired):
            return None

    commit = _run(["rev-parse", "HEAD"])
    branch = _run(["rev-parse", "--abbrev-ref", "HEAD"])
    status = _run(["status", "--porcelain"])
    return {
        "git_commit": commit,
        "git_branch": branch,
        "git_dirty": bool(status) if status is not None else None,
    }


def run_command(
    store: LogStore,
    cmd: list[str],
    source_name: str | None = None,
    fmt: str = "auto",
    tag: str | None = None,
    timeout: float | None = None,
    cwd: str | None = None,
    keep_live: bool = False,
    lock_name: str | None = None,
    wait_lock: float | None = None,
    sandbox=None,
    executor=None,
    extensions=None,
) -> dict:
    """Execute `cmd`, capture combined output, parse, and store the run.

    Returns the stored run row dict (with exit_code, run_serial, ...).
    The live log at `<root>/live/<attempt_id>/combined.log` exists for
    the duration of the run (ST1 readers can poll it) and is removed on
    completion unless keep_live.

    A single-element cmd naming a registered command (reference
    core.py:1080-1214) resolves to its stored argv/format/tag.

    `lock_name` serializes concurrent runs under that name (reference
    execution.py:324-350): raise LockHeldError if a live holder exists,
    or poll up to `wait_lock` seconds for it to free.

    `sandbox` (preset name | dict | SandboxSpec | None) ENFORCES the
    spec on the child via sandbox_enforce.wrap_command (bwrap isolation
    when installed, POSIX rlimits for memory/cpu always, clean degrade
    otherwise — reference engine ladder, src/blq_sandbox/engines.py:
    40-60). A registered single-element command with a stored sandbox
    spec is enforced automatically; the spec's timeout tightens the
    caller's. The run row records declared-vs-actually-enforced under
    extension_data.sandbox.

    `executor` (name | ext.Executor | None) injects the terminal stage
    of the reference's extension pipeline (ext/__init__.py:81-85,
    local_executor.py:22): None -> the registered LocalExecutor.
    `extensions` is an ordered iterable of ext.Extension (or registered
    names) whose prepare() rewrites the CommandSpec before execution;
    collectors they register run post-execution in reverse, and their
    store() hooks run after the run row is appended (collect-phase
    failures are tolerated, the reference pipeline.py:33-36 contract)."""
    from blq_cli_spark.sources import locks as locks_mod
    from blq_cli_spark.sources import store as store_mod

    if len(cmd) == 1:
        reg = store_mod.registered_commands(store).get(cmd[0])
        if reg:
            source_name = source_name or cmd[0]
            fmt = reg.get("fmt") or fmt
            tag = tag or reg.get("tag")
            if sandbox is None:
                sandbox = reg.get("sandbox")
            cmd = reg["argv"]
    cwd = cwd or os.getcwd()

    spec = None
    if sandbox is not None:
        from blq_cli_spark import sandbox as sandbox_mod

        spec = sandbox_mod.resolve(sandbox)
        if spec is not None and spec.timeout is not None:
            timeout = spec.timeout if timeout is None else min(timeout, spec.timeout)

    # Lock BEFORE persisting the attempt (reference order,
    # execution.py:300-350): a LockHeldError must leave no pending row.
    attempt_id = str(uuid.uuid4())
    locks_dir = os.path.join(store.root, "locks")
    held = None
    if lock_name:
        if wait_lock is not None:
            held = locks_mod.acquire_lock_wait(
                locks_dir, lock_name, attempt_id, " ".join(cmd), wait_lock
            )
        else:
            held = locks_mod.acquire_lock(
                locks_dir, lock_name, attempt_id, " ".join(cmd)
            )
    try:
        return _execute_and_store(
            store, cmd, attempt_id, source_name, fmt, tag, timeout, cwd, keep_live,
            spec=spec, executor=executor, extensions=extensions,
        )
    finally:
        if lock_name:
            # payload-verified: if the lease expired mid-run and the
            # lock was reclaimed, this must not unlink the new holder's
            locks_mod.release_lock(locks_dir, lock_name, held)


def _execute_and_store(
    store, cmd, attempt_id, source_name, fmt, tag, timeout, cwd, keep_live,
    spec=None, executor=None, extensions=None,
) -> dict:
    started = dt.datetime.now()
    attempt = store.start_attempt(
        {
            "id": attempt_id,
            "started_at": started,
            "cmd": " ".join(cmd),
            "cwd": cwd,
            "source_name": source_name,
            "source_type": "run",
            "hostname": socket.gethostname(),
        }
    )

    live_dir = os.path.join(store.root, "live", attempt["id"])

    exec_argv, preexec, sandbox_info = list(cmd), None, None
    if spec is not None:
        from blq_cli_spark import sandbox_enforce

        exec_argv, preexec, sandbox_info = sandbox_enforce.wrap_command(
            cmd, spec, workspace=cwd, cwd=cwd, attempt_id=attempt["id"]
        )

    # the reference pipeline: CommandSpec -> Extension.prepare() ->
    # Executor.execute() -> Collector.collect() (ext/__init__.py:1-5)
    cspec = ext_mod.CommandSpec(
        argv=exec_argv,
        command=" ".join(exec_argv),
        original_command=" ".join(cmd),
        command_name=source_name or cmd[0],
        attempt_id=attempt["id"],
        workspace=cwd,
        cwd=cwd,
        live_dir=live_dir,
        timeout=timeout,
        preexec=preexec,
    )
    if sandbox_info:
        cspec.extension_data["sandbox"] = sandbox_info
    exts = [
        ext_mod.get_extension(e) if isinstance(e, str) else e
        for e in (extensions or [])
    ]
    for e in exts:
        cspec = e.prepare(cspec)
    if executor is None:
        executor = ext_mod.get_executor("local")
    elif isinstance(executor, str):
        executor = ext_mod.get_executor(executor)

    result = executor.execute(cspec)
    attempt_pid = result.pid
    exit_code, timed_out = result.exit_code, result.timeout
    metrics = result.metrics

    # collectors registered during prepare run in REVERSE, tolerant
    # (reference pipeline.py:33-36)
    for coll in reversed(cspec.collectors):
        try:
            coll.collect(cspec, result)
        except Exception as e:  # noqa: BLE001 — collect failures must not kill the run
            import sys as _sys

            print(f"ext: collector failed: {e}", file=_sys.stderr)

    completed = result.completed_at
    duration_ms = int((completed - started).total_seconds() * 1000)
    store.complete_attempt(
        attempt["id"],
        {
            "completed_at": completed,
            "duration_ms": duration_ms,
            "exit_code": exit_code,
            "timeout": timed_out,
        },
    )

    output = result.output
    events = logparse.parse_content(output, fmt)
    format_used = events[0]["format_used"] if events else None

    # silent failure -> synthetic exit event (reference execution.py:599-601)
    n_err = sum(1 for e in events if e.get("severity") == "error")
    n_warn = sum(1 for e in events if e.get("severity") == "warning")
    reason = status_reason(exit_code, n_err, n_warn, source_name, timed_out)
    if reason and exit_code and not n_err and not n_warn:
        ev = synthetic_exit_event(source_name, exit_code, reason)
        ev["event_index"] = len(events) + 1
        events.append(ev)

    run = store.append_run(
        {
            "id": attempt["id"],  # run id == attempt id, like the reference
            "timestamp": started,
            "duration_ms": duration_ms,
            "cwd": cwd,
            "cmd": " ".join(cmd),
            "executable": cmd[0],
            "pid": attempt_pid,
            "exit_code": exit_code,
            "format_hint": fmt if fmt != "auto" else format_used,
            "hostname": socket.gethostname(),
            "username": getpass.getuser(),
            "tag": tag,
            "source_name": source_name,
            "source_type": "run",
            "platform": _platform.system().lower(),
            "arch": _platform.machine(),
            "extension_data": _ext_data(metrics, cspec.extension_data),
            **_git_context(cwd),
        },
        events=events,
        output=output,
    )
    # extension store() hooks, forward order, tolerant like collect
    for e in exts:
        try:
            e.store(cspec, result, store)
        except Exception as err:  # noqa: BLE001
            import sys as _sys

            print(f"ext: extension {e.name!r} store failed: {err}", file=_sys.stderr)
    if not keep_live:
        shutil.rmtree(live_dir, ignore_errors=True)
    return run


def _ext_data(metrics, extension_data) -> str | None:
    ext = {}
    if metrics:
        ext["metrics"] = metrics
    ext.update(extension_data or {})
    return json.dumps(ext) if ext else None


def migrate_from_export(store: LogStore, export_root: str) -> int:
    """S14-style migration: re-ingest a hive-partitioned events export
    (the sync_to layout, or any parquet tree with the flat-events columns)
    into this store's runs/events tables.

    Two distributed jobs total, however many runs the export holds
    (reference migrate.py:30-140 does the same v1-parquet -> BIRD
    transform in one INSERT..SELECT per table):

    1. new events = export anti-joined against existing run ids,
       conformed to EVENTS_SCHEMA and appended in one write.
    2. run rows derived from those events by groupBy(invocation_id),
       serials reassigned from this store's max (ordered by exported
       serial then timestamp, so relative order survives), conformed to
       RUNS_SCHEMA and appended in one write.

    No per-run driver loop and no collect of event rows anywhere."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from blq_cli_spark import schemas

    flat = (
        store.spark.read.option("mergeSchema", "true")
        .option("basePath", export_root)
        .parquet(export_root)
    )

    def conform(df, schema, keep_serial: bool = True):
        cols = []
        for f in schema.fields:
            if f.name in df.columns and (keep_serial or f.name != "run_serial"):
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return df.select(cols)

    new_events = flat.join(
        F.broadcast(store.runs().select(F.col("id").alias("invocation_id"))),
        "invocation_id",
        "left_anti",
    )
    run_src_cols = [
        c for c in flat.columns if c in {f.name for f in schemas.RUNS_SCHEMA.fields}
    ]
    # run rows re-derived from their events; exported run_serial only
    # seeds the ordering — actual serials continue this store's sequence
    # (the block is reserved below, once the new-run count is known)
    order_cols = [F.col("_src_serial").asc_nulls_last()]
    if "timestamp" in flat.columns:
        order_cols.append(F.col("timestamp"))
    order_cols.append(F.col("invocation_id"))
    # global window, but over the runs dimension (one row per run) — the
    # same scale class as next_serial itself, not a fact-table window
    w = Window.orderBy(*order_cols)
    new_runs = (
        new_events.groupBy("invocation_id")
        .agg(
            *[
                F.first(c, ignorenulls=True).alias(c)
                for c in run_src_cols
                if c not in ("invocation_id", "run_serial")
            ],
            F.first("run_serial", ignorenulls=True).alias("_src_serial")
            if "run_serial" in flat.columns
            else F.lit(None).cast("bigint").alias("_src_serial"),
        )
        .withColumn("id", F.col("invocation_id"))
    )
    # an export tree may lack a timestamp column entirely — conform()
    # null-fills missing schema fields, so the date backfill must not
    # reference timestamp unconditionally
    def _backfill_date(df: DataFrame) -> DataFrame:
        if "timestamp" in df.columns:
            return df.withColumn("date", F.to_date("timestamp"))
        return df.withColumn("date", F.lit(None).cast("date"))

    if "date" not in run_src_cols:
        new_runs = _backfill_date(new_runs)
    n = new_runs.count()
    if not n:
        return 0
    # reserve the whole serial block at once (durable counter, unique
    # across concurrent writers) and hold the store-write lock over the
    # append jobs — same staging-collision discipline as LogStore._append
    base = store.reserve_serials(n)
    new_runs = new_runs.withColumn(
        "run_serial", F.row_number().over(w) + F.lit(base)
    )
    with store._write_lock():
        conform(new_runs, schemas.RUNS_SCHEMA).write.mode("append").partitionBy(
            "date"
        ).parquet(store._path("runs"))
        ev = new_events
        if "date" not in ev.columns:
            ev = _backfill_date(ev)
        conform(ev, schemas.EVENTS_SCHEMA).write.mode("append").partitionBy(
            "date"
        ).parquet(store._path("events"))
    return n


# -- exit-code reasons (reference WELL_KNOWN_EXIT_CODES, commands/core.py:334,
# and _compute_status_reason / synthetic exit events, execution.py:58-110) ----

# Public tool facts: what each non-zero exit code means for common tools.
EXIT_CODE_REASONS: dict[str, dict[int, str]] = {
    "pytest": {1: "Tests failed", 2: "Interrupted", 3: "Internal error",
               4: "Usage error", 5: "No tests collected"},
    "ruff": {1: "Lint violations found", 2: "Fatal error"},
    "mypy": {1: "Type errors found", 2: "Fatal error"},
    "cargo": {101: "Build/test failed"},
    "make": {2: "Errors encountered"},
    "go": {1: "Build/test failed", 2: "Usage error"},
    "npm": {1: "Generic failure"},
    "tsc": {1: "Type errors found"},
    "eslint": {1: "Lint violations found", 2: "Fatal error"},
    "black": {1: "Files would be reformatted", 123: "Internal error"},
    "flake8": {1: "Violations found"},
    "gcc": {1: "Compilation errors"},
    "rustc": {1: "Compilation errors"},
}


def exit_code_reason(source_name: str | None, exit_code: int) -> str | None:
    """Human-readable meaning of a tool's exit code: exact source-name
    match first, then prefix ('pytest-unit' -> 'pytest')."""
    if not source_name:
        return None
    if source_name in EXIT_CODE_REASONS:
        return EXIT_CODE_REASONS[source_name].get(exit_code)
    for tool, codes in EXIT_CODE_REASONS.items():
        if source_name.startswith(tool):
            return codes.get(exit_code)
    return None


def status_reason(
    exit_code: int | None,
    n_errors: int,
    n_warnings: int,
    source_name: str | None,
    timed_out: bool,
) -> str | None:
    """Why did this run 'fail'? Only answered when it is NOT self-evident
    (no parsed errors/warnings but a non-zero exit)."""
    if timed_out:
        return "Command timed out"
    if exit_code and n_errors == 0 and n_warnings == 0:
        return (
            exit_code_reason(source_name, exit_code)
            or f"Non-zero exit code ({exit_code}) with no errors detected"
        )
    return None


def synthetic_exit_event(source_name: str | None, exit_code: int, reason: str) -> dict:
    """Info-level event surfacing a silent non-zero exit, so `blq events`
    shows WHY a run failed even when the parser found nothing."""
    import hashlib

    fp = hashlib.md5(f"{source_name}:exit_{exit_code}".encode()).hexdigest()[:16]
    return {
        "event_index": 1,
        "event_type": "exit",
        "severity": "info",
        "message": reason,
        "code": f"exit_{exit_code}",
        "tool_name": source_name,
        "fingerprint": fp,
        "format_used": "synthetic",
    }
