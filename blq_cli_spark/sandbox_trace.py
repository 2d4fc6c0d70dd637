"""Syscall-trace profiling: strace text -> access patterns -> sandbox spec.

Reference capability: src/blq_sandbox/strace_parser.py (openat/access/
execve/connect/clone extraction, write-flag classification, directory
rollups) + src/blq_sandbox/profile.py:33 run_profile (wrap the command
in strace, parse the output, degrade when strace is absent). This
container has no strace — exactly the situation the reference's runner
handles by returning None — so the RUNNER degrades identically while
the parser, summaries, and spec suggestion are fully real and tested
on fixture traces.

Spark-first shape: the parser is a pure-column pipeline (posexplode
lines -> regexp rules -> typed access rows), so a FLEET of trace files
— one per CI run across a synced store — parses distributed with zero
Python execution and rolls up per-source with one map-side-combinable
groupBy. A single local trace goes through the same operators on a
one-row DataFrame.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from blq_cli_spark.sandbox import SandboxSpec

# strace line shapes (public format): every rule is Java-regex-safe
_OPENAT = r'openat\([^,]+,\s*"([^"]+)",\s*([^)]+)\)\s*=\s*(-?\d+)'
_ACCESS = r'access\("([^"]+)",[^)]*\)\s*=\s*(-?\d+)'
_EXECVE = r'execve\("([^"]+)"'
_CONNECT4 = (
    r'connect\([^,]+,\s*\{sa_family=AF_INET,.*?sin_port=htons\((\d+)\),'
    r'.*?sin_addr=inet_addr\("([^"]+)"\).*?=\s*(-?\d+)'
)
_CONNECT6 = (
    r'connect\([^,]+,\s*\{sa_family=AF_INET6,.*?sin6_port=htons\((\d+)\),'
    r'.*?inet_pton\(AF_INET6,\s*"([^"]+)".*?=\s*(-?\d+)'
)
_CLONE = r"\bclone3?\("
_WRITE_FLAGS = r"O_WRONLY|O_RDWR|O_CREAT|O_APPEND|O_TRUNC"

_ACCESS_DDL = (
    "source_id string, kind string, path string, port int, addr string,"
    " success boolean"
)


def parse_strace_df(
    df: DataFrame, id_col: str = "source_id", content_col: str = "content"
) -> DataFrame:
    """(source_id, strace text) -> typed access rows
    (kind in open_read/open_write/access/execve/connect/clone).
    Pure-column: explode lines, evaluate every rule per line, explode
    the tagged matches — the logparse_fast discipline, zero Python."""
    line = F.col("line")

    def _null(t):
        return F.lit(None).cast(t)

    def row(kind, path=None, port=None, addr=None, success=None):
        return F.struct(
            F.lit(kind).alias("kind"),
            (path if path is not None else _null("string")).alias("path"),
            (port if port is not None else _null("int")).cast("int").alias("port"),
            (addr if addr is not None else _null("string")).alias("addr"),
            (success if success is not None else _null("boolean")).alias("success"),
        )

    x = F.regexp_extract
    open_write = x(line, _OPENAT, 2).rlike(_WRITE_FLAGS)
    # openat needs a conditional kind, so build its struct explicitly
    openat_row = F.struct(
        F.when(open_write, "open_write").otherwise("open_read").alias("kind"),
        x(line, _OPENAT, 1).alias("path"),
        _null("int").alias("port"),
        _null("string").alias("addr"),
        (x(line, _OPENAT, 3).cast("int") >= 0).alias("success"),
    )
    rules = [
        (line.rlike(_OPENAT), openat_row),
        (
            line.rlike(_ACCESS),
            row("access", path=x(line, _ACCESS, 1),
                success=x(line, _ACCESS, 2).cast("int") >= 0),
        ),
        (
            line.rlike(_EXECVE),
            row("execve", path=x(line, _EXECVE, 1), success=F.lit(True)),
        ),
        (
            line.rlike(_CONNECT4),
            row("connect", port=x(line, _CONNECT4, 1),
                addr=x(line, _CONNECT4, 2),
                success=x(line, _CONNECT4, 3).cast("int") >= 0),
        ),
        (
            line.rlike(_CONNECT6),
            row("connect", port=x(line, _CONNECT6, 1),
                addr=x(line, _CONNECT6, 2),
                success=x(line, _CONNECT6, 3).cast("int") >= 0),
        ),
        (line.rlike(_CLONE), row("clone", success=F.lit(True))),
    ]
    lines = df.select(
        F.col(id_col).alias("source_id"),
        F.explode(
            F.split(F.coalesce(F.col(content_col), F.lit("")), r"\r\n|\r|\n")
        ).alias("line"),
    )
    arr = F.array(*[F.when(cond, r) for cond, r in rules])
    return lines.select(
        "source_id", F.explode(F.array_compact(arr)).alias("a")
    ).select(
        "source_id",
        F.col("a.kind").alias("kind"),
        F.col("a.path").alias("path"),
        F.col("a.port").alias("port"),
        F.col("a.addr").alias("addr"),
        F.col("a.success").alias("success"),
    )


def _dirname(c):
    d = F.regexp_replace(c, r"/[^/]*$", "")
    return F.when(d == "", "/").otherwise(d)


def strace_summary(access: DataFrame) -> DataFrame:
    """Per-source access profile: one map-side-combinable groupBy over
    the parsed rows — (has_network, loopback_only, has_writes, n_spawns,
    read_dirs, write_dirs, endpoints)."""
    ok = F.col("success")
    is_conn = (F.col("kind") == "connect") & ok
    is_write = (F.col("kind") == "open_write") & ok
    is_read = F.col("kind").isin("open_read", "access", "execve") & ok
    loopback = F.col("addr").startswith("127.") | (F.col("addr") == "::1")
    return access.groupBy("source_id").agg(
        F.max(is_conn).alias("has_network"),
        F.coalesce(F.min(F.when(is_conn, loopback)), F.lit(True)).alias(
            "loopback_only"
        ),
        F.max(is_write).alias("has_writes"),
        F.sum((F.col("kind") == "clone").cast("int")).alias("n_spawns"),
        F.sort_array(
            F.collect_set(F.when(is_read, _dirname(F.col("path"))))
        ).alias("read_dirs"),
        F.sort_array(
            F.collect_set(F.when(is_write, _dirname(F.col("path"))))
        ).alias("write_dirs"),
        F.sort_array(
            F.collect_set(
                F.when(is_conn, F.concat_ws(":", F.col("addr"), F.col("port")))
            )
        ).alias("endpoints"),
    )


def spec_from_summary(summary: dict, workspace: str | None = None) -> SandboxSpec:
    """Observed access profile -> tightest spec that still admits it
    (the reference's suggest-from-profile shape): no successful connect
    -> network none (loopback-only -> localhost); no successful write
    -> filesystem readonly; writes confined to the workspace ->
    workspace_only, else scoped_write; processes isolated (bwrap's pid
    namespace still allows the observed child spawns)."""
    if not summary.get("has_network"):
        network = "none"
    elif summary.get("loopback_only"):
        network = "localhost"
    else:
        network = "unrestricted"
    write_dirs = list(summary.get("write_dirs") or [])
    if not summary.get("has_writes"):
        filesystem = "readonly"
    elif workspace and all(
        d == workspace or d.startswith(workspace.rstrip("/") + "/")
        for d in write_dirs
    ):
        filesystem = "workspace_only"
    else:
        filesystem = "scoped_write"
    return SandboxSpec(network=network, filesystem=filesystem, processes="isolated")


def strace_available() -> bool:
    return shutil.which("strace") is not None


def run_strace_profile(
    spark, cmd: list[str], timeout: float = 60.0, cwd: str | None = None
):
    """Run `cmd` under strace and return (summary_row_dict, spec) — or
    None when strace is absent (the reference runner's degrade,
    profile.py:52-56; the rusage-based degraded profiling in
    sandbox.profile_runs remains the fallback evidence source)."""
    if not strace_available():
        return None
    with tempfile.NamedTemporaryFile(suffix=".strace", delete=False) as tmp:
        out_path = tmp.name
    try:
        trace_cmd = [
            "strace", "-f", "-qq",
            "-e", "trace=openat,access,execve,connect,clone,clone3",
            "-o", out_path, "--",
        ] + list(cmd)
        try:
            subprocess.run(trace_cmd, timeout=timeout, capture_output=True)
        except subprocess.TimeoutExpired:
            pass  # parse whatever strace managed to write
        with open(out_path, errors="replace") as fh:
            text = fh.read()
        df = spark.createDataFrame(
            [(" ".join(cmd), text)], "source_id string, content string"
        )
        rows = strace_summary(parse_strace_df(df)).collect()
        if not rows:
            return None
        summary = rows[0].asDict()
        return summary, spec_from_summary(summary, workspace=cwd or os.getcwd())
    finally:
        try:
            os.unlink(out_path)
        except FileNotFoundError:
            pass
