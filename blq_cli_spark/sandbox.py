"""Sandbox spec management: the reference's per-command sandbox surface
(reference src/blq/commands/sandbox_cmd.py:13-330, src/blq_sandbox/spec.py
presets/grade) re-expressed over the Spark store.

The spec itself is driver-side config (a dict in the store config JSON,
one per registered command); everything *observational* — suggesting and
tightening specs from run history — is a Spark aggregation over the runs
table (`extension_data` JSON metrics + duration), so it scales to a
synced multi-project store exactly like every other query here.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

NETWORK_VALUES = ("none", "localhost", "unrestricted")
FILESYSTEM_VALUES = ("readonly", "workspace_only", "scoped_write", "unrestricted")
PROCESSES_VALUES = ("isolated", "visible")


@dataclass
class SandboxSpec:
    """One command's sandbox constraints (reference spec.py:100-126).

    Only the dimensions the query surface needs: resource numbers are
    plain ints (bytes / seconds) — rendering is the CLI's job."""

    network: str = "unrestricted"
    filesystem: str = "unrestricted"
    timeout: int | None = None
    memory: int | None = None
    cpu: int | None = None
    processes: str = "visible"
    paths_readable: list[str] = field(default_factory=list)
    paths_hidden: list[str] = field(default_factory=list)

    def __post_init__(self) -> None:
        if self.network not in NETWORK_VALUES:
            raise ValueError(f"network must be one of {NETWORK_VALUES}")
        if self.filesystem not in FILESYSTEM_VALUES:
            raise ValueError(f"filesystem must be one of {FILESYSTEM_VALUES}")
        if self.processes not in PROCESSES_VALUES:
            raise ValueError(f"processes must be one of {PROCESSES_VALUES}")

    @property
    def grade(self) -> str:
        """World-coupling grade: sealed < pinhole < scoped < broad < open
        (reference spec.py:128-141)."""
        if self.network == "unrestricted" and self.filesystem == "unrestricted":
            return "open"
        if self.network != "none":
            return "broad"
        if self.filesystem in ("workspace_only", "scoped_write"):
            return "scoped"
        if self.filesystem == "readonly":
            return "pinhole"
        return "sealed"

    def to_dict(self) -> dict:
        d = asdict(self)
        return {k: v for k, v in d.items() if v not in (None, [], "unrestricted", "visible")}

    def matching_preset(self) -> str | None:
        for name, preset in PRESETS.items():
            if preset == self:
                return name
        return None


PRESETS: dict[str, SandboxSpec] = {
    # the reference's design-doc preset table (spec.py:277-318)
    "readonly": SandboxSpec("none", "readonly", 30, 256 << 20, 15, "isolated"),
    "test": SandboxSpec("none", "readonly", 60, 512 << 20, 30, "isolated"),
    "build": SandboxSpec("none", "workspace_only", 300, 2 << 30, 120, "isolated"),
    "integration": SandboxSpec("localhost", "workspace_only", 600, 4 << 30, 300),
    "unrestricted": SandboxSpec(timeout=1800),
    "none": SandboxSpec(),
}


def resolve(value) -> SandboxSpec | None:
    """Preset name | dict | SandboxSpec | None -> SandboxSpec | None
    (reference resolve_sandbox, spec.py:326-350)."""
    if value is None or isinstance(value, SandboxSpec):
        return value
    if isinstance(value, str):
        if value not in PRESETS:
            raise ValueError(
                f"unknown sandbox preset {value!r} (valid: {', '.join(sorted(PRESETS))})"
            )
        return PRESETS[value]
    if isinstance(value, dict):
        return SandboxSpec(**value)
    raise ValueError(f"cannot resolve sandbox spec from {type(value).__name__}")


# -- config CRUD (driver-side; specs live with the command registry) ----------


def get_spec(store, command: str):
    """Raw spec value (preset name or dict) for a registered command."""
    from blq_cli_spark.sources import store as store_mod

    cmd = store_mod.registered_commands(store).get(command)
    if cmd is None:
        raise KeyError(command)
    return cmd.get("sandbox")


def set_spec(store, command: str, value) -> None:
    from blq_cli_spark.sources import store as store_mod

    resolve(value)  # validate before persisting
    cfg = store_mod._load_config(store)
    if command not in cfg.get("commands", {}):
        raise KeyError(command)
    cfg["commands"][command]["sandbox"] = value
    store_mod._save_config(store, cfg)


def unset_spec(store, command: str) -> bool:
    from blq_cli_spark.sources import store as store_mod

    cfg = store_mod._load_config(store)
    if command not in cfg.get("commands", {}):
        raise KeyError(command)
    existed = cfg["commands"][command].pop("sandbox", None) is not None
    store_mod._save_config(store, cfg)
    return existed


# -- observed metrics (Spark side) --------------------------------------------


def observed_metrics(runs: DataFrame, source_name: str) -> DataFrame:
    """Aggregate resource observations for one command's runs (reference
    cmd_sandbox_suggest's SQL over invocations⟕outcomes,
    sandbox_cmd.py:114-152): run count, peak memory/cpu from the
    extension_data JSON metrics, max wall time. A single filtered
    aggregation — filter pushes to the runs scan, JSON extraction is
    JVM-side `get_json_object`."""
    return (
        runs.filter(F.col("source_name") == source_name)
        .select(
            F.get_json_object("extension_data", "$.metrics.memory_peak_bytes")
            .cast("long")
            .alias("mem"),
            F.get_json_object("extension_data", "$.metrics.cpu_usage_usec")
            .cast("long")
            .alias("cpu_usec"),
            F.col("duration_ms"),
        )
        .agg(
            F.count(F.lit(1)).alias("run_count"),
            F.max("mem").alias("max_memory_bytes"),
            F.max("cpu_usec").alias("max_cpu_usec"),
            F.max("duration_ms").alias("max_duration_ms"),
        )
    )


def profile_runs(runs: DataFrame, source_name: str, last_n: int = 20) -> DataFrame:
    """Per-run resource profile for `sandbox profile` — the portable
    degraded mode of the reference's strace profiler (cli.py:1359,
    blq_sandbox/profile.py): no strace in this runtime, so the evidence
    is each run's RECORDED rusage metrics (run_command stamps
    $.metrics.* into extension_data at execution time) plus wall time
    and exit code. Most-recent `last_n` runs; the filter and JSON
    extraction stay JVM-side, the sort is a bounded top-k."""
    return (
        runs.filter(F.col("source_name") == source_name)
        .select(
            "run_serial",
            F.date_format("timestamp", "yyyy-MM-dd HH:mm:ss").alias("started"),
            "exit_code",
            "duration_ms",
            F.get_json_object("extension_data", "$.metrics.memory_peak_bytes")
            .cast("long")
            .alias("memory_peak_bytes"),
            F.get_json_object("extension_data", "$.metrics.cpu_usage_usec")
            .cast("long")
            .alias("cpu_usec"),
        )
        .orderBy(F.desc("run_serial"))
        .limit(last_n)
    )


def suggest_spec(runs: DataFrame, source_name: str) -> tuple[dict, dict] | None:
    """(observed, suggested-spec-dict) with the reference's headroom rules
    (2x memory, 2x cpu, 3x wall-clock timeout; sandbox_cmd.py:154-205),
    or None when the command has no runs."""
    row = observed_metrics(runs, source_name).first()
    if row is None or row["run_count"] == 0:
        return None
    observed = {k: row[k] for k in row.asDict()}
    suggested: dict = {
        "network": "none",
        "filesystem": "readonly",
        "processes": "isolated",
    }
    if row["max_memory_bytes"] is not None:
        suggested["memory"] = int(row["max_memory_bytes"]) * 2
    if row["max_cpu_usec"] is not None:
        suggested["cpu"] = max(1, int(row["max_cpu_usec"] * 2 / 1_000_000))
    if row["max_duration_ms"] is not None:
        suggested["timeout"] = max(1, int(row["max_duration_ms"] * 3 / 1000))
    return observed, suggested


def tighten_spec(store, runs: DataFrame, command: str) -> dict | None:
    """Write the suggested spec onto the command, keeping any explicitly
    stricter existing dimensions (reference cmd_sandbox_tighten,
    sandbox_cmd.py:278-330). Returns the written spec dict, or None when
    there's no run evidence to tighten from."""
    got = suggest_spec(runs, command)
    if got is None:
        return None
    _, suggested = got
    current = get_spec(store, command)
    if current is not None:
        cur = resolve(current).to_dict()
        # keep existing tighter resource bounds (numbers: smaller = tighter)
        for key in ("memory", "cpu", "timeout"):
            if key in cur and key in suggested:
                suggested[key] = min(cur[key], suggested[key])
        for key in ("paths_readable", "paths_hidden"):
            if cur.get(key):
                suggested[key] = cur[key]
    set_spec(store, command, suggested)
    return suggested


def fmt_size(n: int | None) -> str:
    if n is None:
        return "-"
    for unit, div in (("g", 1 << 30), ("m", 1 << 20), ("k", 1 << 10)):
        if n >= div:
            return f"{n / div:.1f}{unit}".replace(".0", "")
    return str(n)


# -- MCP integration (reference mcp_cmd.py:132-190) ---------------------------

MCP_SERVER_KEY = "blq-spark"
MCP_MARKER = "managed-by: blq-spark"


def ensure_mcp_config(path: str, store_root: str, force: bool = False) -> bool:
    """Merge a blq-spark server entry into `.mcp.json`, preserving other
    servers. Returns True when the file changed. Refuses to overwrite a
    foreign (unmarked) blq-spark entry unless force — same marker-safety
    rule as the git-hook installer (blq_cli_spark/hooks.py)."""
    import os

    cfg: dict = {}
    if os.path.isfile(path):
        with open(path) as fh:
            try:
                cfg = json.load(fh)
            except ValueError as e:
                raise ValueError(f"{path} is not valid JSON: {e}") from e
    servers = cfg.setdefault("mcpServers", {})
    entry = {
        "command": "python",
        "args": ["-m", "blq_cli_spark.cli", "--store", store_root, "serve"],
        "_comment": MCP_MARKER,
    }
    existing = servers.get(MCP_SERVER_KEY)
    if existing == entry:
        return False
    if existing is not None and existing.get("_comment") != MCP_MARKER and not force:
        raise ValueError(
            f"{path} already has a foreign {MCP_SERVER_KEY!r} entry (use --force)"
        )
    servers[MCP_SERVER_KEY] = entry
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(cfg, fh, indent=2, sort_keys=True)
        fh.write("\n")
    os.replace(tmp, path)
    return True
